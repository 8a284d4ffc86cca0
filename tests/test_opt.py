"""Packed Adam (train/opt.py) vs optax.adam: exact-semantics parity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mipnerf_pl_tpu.train.opt import packed_adam
from mipnerf_pl_tpu.train.schedule import mip_lr_decay


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        'dense': {'kernel': jnp.asarray(rng.normal(size=(9, 7))
                                        .astype(np.float32)),
                  'bias': jnp.asarray(rng.normal(size=(7,))
                                      .astype(np.float32))},
        'head': jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32)),
    }


def _run(tx, params, n_steps=6, seed=1):
    rng = np.random.default_rng(seed)
    state = tx.init(params)
    for _ in range(n_steps):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape)
                                  .astype(np.float32)), params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_packed_adam_matches_optax_with_schedule():
    sched = mip_lr_decay(5e-4, 5e-6, 100, 10, 0.01)
    p_ref = _run(optax.adam(learning_rate=sched), _tree())
    p_pack = _run(packed_adam(learning_rate=sched), _tree())
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_pack)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)


def test_packed_adam_matches_optax_const_lr():
    p_ref = _run(optax.adam(learning_rate=1e-3), _tree(seed=5), seed=6)
    p_pack = _run(packed_adam(learning_rate=1e-3), _tree(seed=5), seed=6)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_pack)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)


def test_packed_adam_jittable_and_donatable():
    params = _tree(seed=9)
    tx = packed_adam(learning_rate=1e-3)
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.tree.map(jnp.ones_like, params)
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    p1, s1 = step(params, state)
    assert int(s1['count']) == 1
    assert jax.tree.structure(p1) == jax.tree.structure(params)
