#!/usr/bin/env python
"""Unbounded-360 end-to-end smoke: synthetic LLFF capture -> real360 train
-> eval, one command.  Pins the COMPILED path of the 360 ops (full-cov
icosahedral IPE, inverse-depth sampling + flip-resample, contraction) on
whatever backend is live — the unit suite only exercises them on CPU.

  python tools/real360_smoke.py --out /tmp/real360_smoke --steps 2000
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    print('+', ' '.join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO, **kw)
    print(f'  ({time.time() - t0:.0f} s)', flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', required=True)
    p.add_argument('--steps', type=int, default=2000)
    p.add_argument('--size', type=int, default=64)
    p.add_argument('--n_images', type=int, default=16)
    p.add_argument('opts', nargs=argparse.REMAINDER,
                   help='extra hparams forwarded to train.py')
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    sys.path.insert(0, REPO)
    from mipnerf_pl_tpu.data.synthetic import make_llff_sphere_capture

    capture = os.path.join(args.out, 'capture')
    if not os.path.exists(os.path.join(capture, 'poses_bounds.npy')):
        print(f'generating LLFF capture at {args.size}px', flush=True)
        make_llff_sphere_capture(capture, n_images=args.n_images,
                                 size=args.size)

    run([sys.executable, 'train.py',
         '--data_path', capture, '--out_dir', args.out,
         '--dataset_name', 'real360',
         '--config', 'configs/real360.yaml',
         '--max_steps', str(args.steps),
         'exp_name', 'real360_smoke',
         'data.factor', '1',
         'train.compute_dtype', 'bfloat16',
         'val.check_interval', str(args.steps),
         'val.sample_num', '1',
         'optimizer.max_steps', str(args.steps),
         'optimizer.lr_delay_steps', '500'] + args.opts)

    run([sys.executable, 'eval.py',
         '--ckpt', os.path.join(args.out, 'ckpt', 'real360_smoke'),
         '--data', capture, '--out_dir', args.out,
         '--scale', '1', '--white_bkgd', 'False', '--no_video'])


if __name__ == '__main__':
    main()
