#!/usr/bin/env python
"""Benchmark: training-step throughput (rays/sec/chip) on the lego workload.

Runs the EXACT reference training workload shape — batch 3072 rays, 128
samples x 2 levels through the shared 8x256 MLP (configs/lego.yaml:5,20-21,
38-39), Adam + MipLRDecay, masked MSE + distloss — on synthetic rays (no
dataset dependency) and prints one JSON line.

vs_baseline: the reference PyTorch impl trains lego at roughly 10k rays/sec
on a single modern CUDA GPU (300k steps x 3072 rays in ~1 day per the
upstream README's training recipe; no hardware stated, see BASELINE.md) —
that estimate is the denominator.
"""

import json
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 10_000.0  # estimated A100 PyTorch baseline (see above)


def main():
    import jax

    from mipnerf_pl_tpu.config import default
    from mipnerf_pl_tpu.train.system import MipNeRFSystem
    from mipnerf_pl_tpu.rays import Rays

    hparams = default()
    hparams['train.compute_dtype'] = 'bfloat16'
    system = MipNeRFSystem(hparams)
    n_chips = system.mesh.devices.size
    batch_size = int(hparams['train.batch_size'])

    rng = np.random.default_rng(0)
    d = rng.normal(size=(batch_size, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((batch_size, 1), np.float32)
    rays = Rays(origins=rng.normal(size=(batch_size, 3)).astype(np.float32) * 0.1,
                directions=d, viewdirs=d, radii=ones * 0.005, lossmult=ones,
                near=ones * 2.0, far=ones * 6.0)
    rays = jax.tree.map(
        lambda x: jax.device_put(x, system.batch_sharding), rays)
    pixels = jax.device_put(
        rng.uniform(size=(batch_size, 3)).astype(np.float32),
        system.batch_sharding)

    state = system.init_state()
    key = jax.random.PRNGKey(0)

    # Warmup / compile.
    state, aux = system.train_step(state, rays, pixels, key)
    jax.block_until_ready(aux['loss'])

    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, aux = system.train_step(state, rays, pixels,
                                       jax.random.fold_in(key, i))
    jax.block_until_ready(aux['loss'])
    dt = time.perf_counter() - t0

    rays_per_sec = n_steps * batch_size / dt
    rays_per_sec_chip = rays_per_sec / n_chips
    print(json.dumps({
        'metric': 'train_rays_per_sec_per_chip',
        'value': round(rays_per_sec_chip, 1),
        'unit': 'rays/s/chip',
        'vs_baseline': round(rays_per_sec_chip / REFERENCE_RAYS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
