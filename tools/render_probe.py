#!/usr/bin/env python
"""Decompose the full-image render's 4.1 s/frame: where does forward-only
time go?  (Train fwd+bwd is 28.4 ms / 3072 rays; the render measures
~19.8 ms / 3072 rays for FORWARD ONLY — ~3x off the expected fwd:train
ratio.)  Stages measured at the 800x800 / chunk-8192 shape:

  device_only     render_chunks_scanned + block_until_ready (no host fetch)
  full            render_image (adds the 4-output np.asarray fetch)
  fwd_chunk       ONE chunk's bare eval-model forward, jitted (x79 = the
                  irreducible model cost at this chunk size)
  fetch           the host fetch alone (device_get of the 4 stacked outputs)

Usage: python tools/render_probe.py [key value ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, n=3, warm=2):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    return (time.perf_counter() - t0) / n, out


def main():
    import mipnerf_pl_tpu  # noqa: F401
    from mipnerf_pl_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from mipnerf_pl_tpu.config import default, merge_from_list
    from mipnerf_pl_tpu.rays import Rays, rays_chunks
    from mipnerf_pl_tpu.rays import namedtuple_map
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hparams = default()
    hparams['train.compute_dtype'] = 'bfloat16'
    hparams['nerf.mlp_backend'] = 'pallas_lean_save'
    if len(sys.argv) > 1:
        merge_from_list(hparams, sys.argv[1:])

    h = w = int(os.environ.get('RENDER_BENCH_RES', '800'))
    system = MipNeRFSystem(hparams)
    state = system.init_state()
    params = state['params']

    rng = np.random.default_rng(0)
    d = rng.normal(size=(h, w, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((h, w, 1), np.float32)
    rays = Rays(origins=(rng.normal(size=(h, w, 3)) * 0.1).astype(np.float32),
                directions=d, viewdirs=d, radii=ones * 0.005,
                lossmult=ones, near=ones * 2.0, far=ones * 6.0)
    report = {'chunk': int(hparams['val.chunk_size']), 'res': h,
              'val_backend': str(hparams.get('val.mlp_backend', 'auto'))}

    # full: the production render_image (device + fetch + slice).
    dt, _ = _timeit(lambda: system.render_image(params, rays))
    report['full_s'] = round(dt, 3)

    # device_only: the same stacked-chunk scan, block on device.
    chunk = int(hparams['val.chunk_size'])
    chunks, n_valid = rays_chunks(rays, chunk)
    stack = Rays(*[np.stack([np.asarray(getattr(c, f)) for c in chunks])
                   for f in Rays._fields])
    from mipnerf_pl_tpu.parallel.mesh import put_global
    stack_dev = namedtuple_map(
        lambda x: put_global(x, system.stacked_sharding), stack)
    key = jax.random.PRNGKey(0)

    def device_only():
        outs = system.render_chunks_scanned()(params, stack_dev, key)
        jax.block_until_ready(outs)
        return outs

    dt, outs = _timeit(device_only)
    report['device_only_s'] = round(dt, 3)
    report['n_chunks'] = int(stack.origins.shape[0])

    # fetch: host transfer of the 4 stacked outputs.
    dt, _ = _timeit(lambda: jax.device_get(outs))
    report['fetch_s'] = round(dt, 3)
    report['fetch_mb'] = round(sum(np.asarray(o).nbytes for o in
                                   jax.device_get(outs)) / 1e6, 1)

    # fwd_chunk: one chunk's bare model forward (the eval model), jitted.
    one = namedtuple_map(lambda x: x[0], stack_dev)

    @jax.jit
    def fwd(params, rays, key):
        return system.eval_model.apply(params, rays, key, False,
                                       bool(hparams['val.white_bkgd']))

    def fwd_chunk():
        out = fwd(params, one, key)
        jax.block_until_ready(out)
        return out

    dt, _ = _timeit(fwd_chunk, n=5)
    report['fwd_chunk_ms'] = round(dt * 1e3, 2)
    report['fwd_extrapolated_s'] = round(dt * report['n_chunks'], 3)
    print(json.dumps(report), flush=True)


if __name__ == '__main__':
    main()
