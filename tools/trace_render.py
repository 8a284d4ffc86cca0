#!/usr/bin/env python
"""Capture a device trace of one full-image render dispatch (the eval/video
hot path, reference analog /root/reference/eval.py:49-78) for
tools/xplane_summary.py.

Usage: python tools/trace_render.py --trace_dir /tmp/trace_render \
           [key value ...]
Then:  python tools/xplane_summary.py /tmp/trace_render/plugins/profile/*/\\
           *.xplane.pb --group --top 40

Same measurement discipline as tools/trace_step.py (two warmup frames so
the compiled executable is steady-state before tracing).
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
    ap.add_argument('--trace_dir', default='/tmp/trace_render')
    ap.add_argument('--res', type=int, default=800)
    ap.add_argument('opts', nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax
    from mipnerf_pl_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from mipnerf_pl_tpu.config import default, merge_from_list
    from mipnerf_pl_tpu.ops.camera import Camera, pix2cam_from_focal
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hparams = default()
    hparams['train.compute_dtype'] = 'bfloat16'
    hparams['nerf.mlp_backend'] = 'pallas_lean_save'
    if args.opts:
        merge_from_list(hparams, args.opts)

    h = w = args.res
    system = MipNeRFSystem(hparams)
    state = system.init_state()

    focal = 0.5 * w / np.tan(0.5 * 0.6911)
    c2w = np.array([[1, 0, 0, 0], [0, 0, -1, -4], [0, 1, 0, 0]], np.float32)
    cam = Camera(c2w=c2w, pix2cam=pix2cam_from_focal(w, h, focal),
                 near=np.float32(2.0), far=np.float32(6.0),
                 lossmult=np.float32(1.0))

    render = lambda: system.render_camera(state['params'], cam, h, w,
                                          need_coarse=False)
    for _ in range(2):
        render()
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        render()
    dt = time.perf_counter() - t0
    print(f'traced one frame: {dt:.3f} s '
          f'(backend={system.hparams.get("val.mlp_backend")!r}, '
          f'chunk={system.val_chunk_size})')
    pbs = glob.glob(os.path.join(args.trace_dir, 'plugins', 'profile',
                                 '*', '*.xplane.pb'))
    print('xplane:', pbs[-1] if pbs else 'NOT WRITTEN')


if __name__ == '__main__':
    main()
