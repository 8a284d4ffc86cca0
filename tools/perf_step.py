#!/usr/bin/env python
"""Time the K-step scanned trainer at the lego workload shape.

Usage: python tools/perf_step.py [key value ...]
e.g.   python tools/perf_step.py nerf.mlp_backend pallas train.batch_size 6144

Prints ms/step and rays/s/chip.  Benchmarking rules for the tunneled TPU
(see DESIGN.md §1): sync by fetching a scalar (block_until_ready is
unreliable on the plugin), warm up twice (donated-buffer executables
recompile once on the second call), persistent compile cache on.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

    from mipnerf_pl_tpu.config import default, merge_from_list
    from mipnerf_pl_tpu.parallel.mesh import stacked_batch_sharding
    from mipnerf_pl_tpu.rays import Rays
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hparams = default()
    hparams['train.compute_dtype'] = 'bfloat16'
    if len(sys.argv) > 1:
        merge_from_list(hparams, sys.argv[1:])

    system = MipNeRFSystem(hparams)
    batch_size = int(hparams['train.batch_size'])
    K = 25

    rng = np.random.default_rng(0)
    d = rng.normal(size=(batch_size, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((batch_size, 1), np.float32)
    rays = Rays(origins=rng.normal(size=(batch_size, 3)).astype(np.float32) * 0.1,
                directions=d, viewdirs=d, radii=ones * 0.005, lossmult=ones,
                near=ones * 2.0, far=ones * 6.0)
    sh = stacked_batch_sharding(system.mesh)
    rays = jax.tree.map(
        lambda x: jax.device_put(
            np.broadcast_to(x[None], (K, *x.shape)).copy(), sh), rays)
    pixels = jax.device_put(
        np.broadcast_to(rng.uniform(size=(batch_size, 3)).astype(np.float32)[None],
                        (K, batch_size, 3)).copy(), sh)

    state = system.init_state()
    key = jax.random.PRNGKey(0)
    train_many = system.make_train_many(donate=True)

    t_c = time.perf_counter()
    for _ in range(2):   # compile + donation-aliased recompile
        state, aux = train_many(state, rays, pixels, key)
        float(np.asarray(aux['loss'][-1]))
    compile_s = time.perf_counter() - t_c

    n_calls = 4
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, aux = train_many(state, rays, pixels, key)
    float(np.asarray(aux['loss'][-1]))
    dt = time.perf_counter() - t0

    ms_per_step = dt / (n_calls * K) * 1e3
    rays_per_sec = n_calls * K * batch_size / dt / system.mesh.devices.size
    overrides = ' '.join(sys.argv[1:]) or '(defaults)'
    print(f'{overrides}: {ms_per_step:.2f} ms/step  '
          f'{rays_per_sec:,.0f} rays/s/chip  '
          f'(B={batch_size}, warmup {compile_s:.0f}s, '
          f'loss={float(np.asarray(aux["loss"][-1])):.4f})')


if __name__ == '__main__':
    main()
