#!/usr/bin/env python
"""Capture a device trace of one steady-state K-step dispatch at the lego
workload shape, for tools/xplane_summary.py.

Usage: python tools/trace_step.py --trace_dir /tmp/trace [key value ...]
Then:  python tools/xplane_summary.py /tmp/trace/plugins/profile/*/\\
           *.xplane.pb --group --top 40

Same measurement discipline as tools/perf_step.py (warm up twice so the
donated-buffer executable is steady-state before tracing).
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trace_dir', default='/tmp/trace_step')
    ap.add_argument('--k', type=int, default=25)
    ap.add_argument('opts', nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax
    from mipnerf_pl_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from mipnerf_pl_tpu.config import default, merge_from_list
    from mipnerf_pl_tpu.parallel.mesh import stacked_batch_sharding
    from mipnerf_pl_tpu.rays import Rays
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hparams = default()
    hparams['train.compute_dtype'] = 'bfloat16'
    if args.opts:
        merge_from_list(hparams, args.opts)

    system = MipNeRFSystem(hparams)
    batch_size = int(hparams['train.batch_size'])
    K = args.k

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

    for _ in range(2):   # compile + donation-aliased recompile
        state, aux = train_many(state, rays, pixels, key)
        float(np.asarray(aux['loss'][-1]))

    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        state, aux = train_many(state, rays, pixels, key)
        float(np.asarray(aux['loss'][-1]))
    dt = time.perf_counter() - t0
    print(f'traced one dispatch: {dt / K * 1e3:.2f} ms/step x {K} steps')
    pbs = glob.glob(os.path.join(args.trace_dir, 'plugins', 'profile',
                                 '*', '*.xplane.pb'))
    print('xplane:', pbs[-1] if pbs else 'NOT WRITTEN')


if __name__ == '__main__':
    main()
