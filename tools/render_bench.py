#!/usr/bin/env python
"""Measure full-image render time (sec/frame) at 800x800 across eval
backends and chunk sizes — the evidence base for the `val.mlp_backend`
default (reference analog: eval.py's chunked inference,
/root/reference/eval.py:49-78).

Usage: python tools/render_bench.py [key value ...]
e.g.   python tools/render_bench.py val.mlp_backend pallas_lean val.chunk_size 32768

RENDER_BENCH_PATH=camera (default) times the on-device camera->rays path
(`system.render_camera`, ~100 B/frame host->device — what eval/validate/
render_video use); RENDER_BENCH_PATH=rays times the materialized-bundle
path (`system.render_image`, ~60 B/ray — what the reference ships,
eval.py:49-78).

Prints one JSON line: {"sec_per_frame": ..., "rays_per_sec": ...,
"val_backend": ..., "chunk": ...}.  Methodology as perf_step.py (warm up
2 frames — the first compiles — then time 3).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import mipnerf_pl_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS choice)
    from mipnerf_pl_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from mipnerf_pl_tpu.config import default, merge_from_list
    from mipnerf_pl_tpu.rays import Rays
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hparams = default()
    hparams['train.compute_dtype'] = 'bfloat16'
    hparams['nerf.mlp_backend'] = 'pallas_lean_save'   # production training
    if len(sys.argv) > 1:
        merge_from_list(hparams, sys.argv[1:])

    h = w = int(os.environ.get('RENDER_BENCH_RES', '800'))
    system = MipNeRFSystem(hparams)
    state = system.init_state()

    path = os.environ.get('RENDER_BENCH_PATH', 'camera')
    if path == 'camera':
        # On-device ray generation: a synthetic pinhole camera (no dataset
        # dependency) — only pose/intrinsics cross the link per frame.
        from mipnerf_pl_tpu.ops.camera import Camera, pix2cam_from_focal
        focal = 0.5 * w / np.tan(0.5 * 0.6911)
        c2w = np.array([[1, 0, 0, 0], [0, 0, -1, -4], [0, 1, 0, 0]],
                       np.float32)
        cam = Camera(c2w=c2w, pix2cam=pix2cam_from_focal(w, h, focal),
                     near=np.float32(2.0), far=np.float32(6.0),
                     lossmult=np.float32(1.0))
        render = lambda: system.render_camera(state['params'], cam, h, w,
                                              need_coarse=False)
    else:
        # Materialized full-image ray bundle (reference-style shipping).
        rng = np.random.default_rng(0)
        d = rng.normal(size=(h, w, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        ones = np.ones((h, w, 1), np.float32)
        rays = Rays(
            origins=(rng.normal(size=(h, w, 3)) * 0.1).astype(np.float32),
            directions=d, viewdirs=d, radii=ones * 0.005,
            lossmult=ones, near=ones * 2.0, far=ones * 6.0)
        render = lambda: system.render_image(state['params'], rays,
                                             need_coarse=False)

    for _ in range(2):   # compile + steady-state warmup
        out = render()
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = render()
    del out
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        'metric': 'render_sec_per_frame',
        'sec_per_frame': round(dt, 3),
        'rays_per_sec': round(h * w / dt, 1),
        'resolution': h,
        'path': path,
        'val_backend': str(hparams.get('val.mlp_backend', 'auto')),
        'chunk': int(hparams['val.chunk_size']),
    }), flush=True)


if __name__ == '__main__':
    main()
