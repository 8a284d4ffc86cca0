#!/usr/bin/env python
"""Decompose the train step's 45 ms: time nested prefixes of the step.

Each stage is a K=25 lax.scan whose body depends on a per-iteration folded
key (so nothing is loop-invariant-hoisted), timed with the perf_step.py
methodology (fetch-scalar sync, double warmup for donated executables).

Stages:
  sample0   stratified sampling + cast_rays (level 0 producer)
  ipe0      sample0 + integrated_pos_enc + viewdir pos_enc
  mlp_fwd   MLP forward alone on a fixed encode (both levels' worth: 2x)
  mlp_bwd   MLP value+grad alone (2x)
  fwd       full 2-level model forward
  loss      forward + losses
  grad      value_and_grad(loss)
  step      grad + adam update (the real train step)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 25
B = 3072
N = 128


def timed(name, fn, *args):
    import jax
    out = None
    for _ in range(2):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    n_calls = 4
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = time.perf_counter() - t0
    print(f'{name:10s} {dt / (n_calls * K) * 1e3:8.2f} ms/step', flush=True)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

    from mipnerf_pl_tpu.config import default
    from mipnerf_pl_tpu.ops.math import integrated_pos_enc, pos_enc
    from mipnerf_pl_tpu.ops.sampling import sample_along_rays
    from mipnerf_pl_tpu.rays import Rays
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hparams = default()
    hparams['train.compute_dtype'] = 'bfloat16'
    system = MipNeRFSystem(hparams)
    model = system.model

    rng = np.random.default_rng(0)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((B, 1), np.float32)
    rays = Rays(origins=jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32) * 0.1),
                directions=jnp.asarray(d), viewdirs=jnp.asarray(d),
                radii=jnp.asarray(ones * 0.005), lossmult=jnp.asarray(ones),
                near=jnp.asarray(ones * 2.0), far=jnp.asarray(ones * 6.0))
    pixels = jnp.asarray(rng.uniform(size=(B, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def scan(body):
        @jax.jit
        def run(*args):
            def f(carry, i):
                k = jax.random.fold_in(key, i)
                return carry + body(k, *args), None
            tot, _ = jax.lax.scan(f, jnp.zeros(()), jnp.arange(K))
            return tot
        return run

    # -- producer chain -----------------------------------------------------
    def _sample0(k):
        t, (means, covs) = sample_along_rays(
            k, rays.origins, rays.directions, rays.radii, N,
            rays.near, rays.far, True, False, 'cone')
        return jnp.sum(means) + jnp.sum(covs) + jnp.sum(t)
    timed('sample0', scan(lambda k: _sample0(k)))

    def _ipe0(k):
        t, mc = sample_along_rays(
            k, rays.origins, rays.directions, rays.radii, N,
            rays.near, rays.far, True, False, 'cone')
        enc = integrated_pos_enc(mc, 0, 16)
        venc = pos_enc(rays.viewdirs, 0, 4, True)
        return jnp.sum(enc) + jnp.sum(venc) + jnp.sum(t)
    timed('ipe0', scan(lambda k: _ipe0(k)))

    # -- MLP alone (2 levels' worth) ---------------------------------------
    enc0 = jnp.asarray(rng.normal(size=(B, N, 96)).astype(np.float32))
    venc0 = jnp.asarray(rng.normal(size=(B, 27)).astype(np.float32))
    mlp_params = model.mlp_params_for_probe() if hasattr(
        model, 'mlp_params_for_probe') else None
    params = model.init(jax.random.PRNGKey(0), rays, key, False, True)

    from mipnerf_pl_tpu.models.mlp import MLP
    mlp = MLP(compute_dtype=jnp.bfloat16)
    mp = mlp.init(jax.random.PRNGKey(0), enc0, venc0)

    def _mlp_fwd(k, mp):
        tot = jnp.zeros(())
        for i in range(2):
            e = enc0 + jax.random.fold_in(k, i)[0].astype(jnp.float32) * 0.0
            rgb, dens = mlp.apply(mp, e, venc0)
            tot = tot + jnp.sum(rgb) + jnp.sum(dens)
        return tot
    timed('mlp_fwd', scan(_mlp_fwd), mp)

    def _mlp_loss(mp_, e):
        rgb, dens = mlp.apply(mp_, e, venc0)
        return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2)

    def _mlp_bwd(k, mp):
        tot = jnp.zeros(())
        for i in range(2):
            e = enc0 + jax.random.fold_in(k, i)[0].astype(jnp.float32) * 0.0
            val, g = jax.value_and_grad(_mlp_loss)(mp, e)
            tot = tot + val + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return tot
    timed('mlp_bwd', scan(_mlp_bwd), mp)

    # -- full model ---------------------------------------------------------
    def _fwd(k, params):
        ret = model.apply(params, rays, k, True, True)
        return sum(jnp.sum(l.rgb) + jnp.sum(l.distance) for l in ret)
    timed('fwd', scan(_fwd), params)

    def _loss(k, params):
        loss, _ = system.loss_fn(params, rays, pixels, k)
        return loss
    timed('loss', scan(_loss), params)

    def _grad(k, params):
        (loss, _), g = jax.value_and_grad(system.loss_fn, has_aux=True)(
            params, rays, pixels, k)
        return loss + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
    timed('grad', scan(_grad), params)

    # -- the real train step (scanned trainer) ------------------------------
    from mipnerf_pl_tpu.parallel.mesh import stacked_batch_sharding
    sh = stacked_batch_sharding(system.mesh)
    rays_s = jax.tree.map(lambda x: jax.device_put(
        np.broadcast_to(np.asarray(x)[None], (K, *x.shape)).copy(), sh), rays)
    pixels_s = jax.device_put(
        np.broadcast_to(np.asarray(pixels)[None], (K, B, 3)).copy(), sh)
    state = system.init_state()
    train_many = system.make_train_many(donate=True)

    def _step(state):
        s, aux = train_many(state, rays_s, pixels_s, key)
        return aux['loss']
    for _ in range(2):
        state, aux = train_many(state, rays_s, pixels_s, key)
        float(np.asarray(aux['loss'][-1]))
    n_calls = 4
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, aux = train_many(state, rays_s, pixels_s, key)
    float(np.asarray(aux['loss'][-1]))
    dt = time.perf_counter() - t0
    print(f'{"step":10s} {dt / (n_calls * K) * 1e3:8.2f} ms/step', flush=True)


if __name__ == '__main__':
    main()
