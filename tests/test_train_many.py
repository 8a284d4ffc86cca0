"""Tests for the scanned multi-step trainer (lax.scan over K steps)."""

import jax
import jax.numpy as jnp
import numpy as np

from mipnerf_pl_tpu.train.system import MipNeRFSystem
from tests.helpers import make_blender_scene, tiny_hparams


def _stacked_batches(system, scene, K):
    system.setup(scene, 'blender', prefetch=0, steps_per_call=K)
    return next(system.batcher)


def test_train_many_matches_single_steps(tmp_path):
    """One K-scan must produce the same params as K single steps with
    per-step keys folded from the global step (up to XLA reassociation
    noise between the two compilations)."""
    scene = make_blender_scene(str(tmp_path / 's'), n_frames=2, size=8)
    hp = tiny_hparams()
    K = 4

    sys_a = MipNeRFSystem(hp)
    rays_stack, pixels_stack = _stacked_batches(sys_a, scene, K)
    base_key = jax.random.PRNGKey(7)

    # Path A: scanned.
    state_a = sys_a.init_state()
    train_many = sys_a.make_train_many(donate=False)
    state_a, aux = train_many(state_a, rays_stack, pixels_stack, base_key)
    assert aux['loss'].shape == (K,)

    # Path B: K independent single steps.
    sys_b = MipNeRFSystem(hp)
    state_b = sys_b.init_state()
    step_fn = sys_b.make_train_step(donate=False)
    from mipnerf_pl_tpu.rays import Rays
    for i in range(K):
        rays_i = Rays(*[np.asarray(f)[i] for f in rays_stack])
        pixels_i = np.asarray(pixels_stack)[i]
        key_i = jax.random.fold_in(base_key, int(state_b['step']))
        state_b, _ = step_fn(state_b, rays_i, pixels_i, key_i)

    assert int(state_a['step']) == int(state_b['step']) == K
    for a, b in zip(jax.tree.leaves(state_a['params']),
                    jax.tree.leaves(state_b['params'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-8)


def test_train_many_loss_decreases(tmp_path):
    scene = make_blender_scene(str(tmp_path / 's'), n_frames=2, size=8)
    hp = tiny_hparams()
    system = MipNeRFSystem(hp)
    system.setup(scene, 'blender', prefetch=0, steps_per_call=20)
    state = system.init_state()
    train_many = system.make_train_many(donate=False)
    key = jax.random.PRNGKey(0)

    rays, pixels = next(system.batcher)
    state, aux1 = train_many(state, rays, pixels, key)
    rays, pixels = next(system.batcher)
    state, aux2 = train_many(state, rays, pixels, key)
    assert float(jnp.mean(aux2['loss'])) < float(jnp.mean(aux1['loss']))
    assert int(state['step']) == 40


def test_fit_uses_multi_step(tmp_path):
    """fit() with steps_per_call > 1 still produces exact max_steps."""
    scene = make_blender_scene(str(tmp_path / 's'), n_frames=2, size=8)
    hp = tiny_hparams()
    hp['train.steps_per_call'] = 5
    hp['val.check_interval'] = 10
    system = MipNeRFSystem(hp)
    state = system.fit(scene, 'blender', str(tmp_path / 'out'),
                       max_steps=20, verbose=False)
    assert int(state['step']) == 20
