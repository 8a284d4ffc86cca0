#!/usr/bin/env python
"""Distortion-loss on/off ablation on the hard synthetic scene.

Trains the full lego-config model twice — once with the reference's
`loss.distloss_mult 0.01` (hardcoded 0.01 in the reference training step,
/root/reference/models/nerf_system.py loss assembly) and once with the
regularizer disabled — then evaluates both on the same multi-scale test
pyramid.  Companion to tools/ablation.py (IPE/multi-scale sign checks);
this one supplies the distloss on/off acceptance row (ACCEPTANCE.md).

Usage:
  python tools/distloss_ablation.py --out /tmp/distloss --steps 10000 \
      [extra hparams forwarded to both runs]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd):
    print('+', ' '.join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def per_scale(out_dir, name, n_down):
    """Read eval.py's per-image psnrs/ssims and bucket by scale."""
    edir = os.path.join(out_dir, 'test', name)
    psnrs = np.atleast_1d(np.loadtxt(os.path.join(edir, 'psnrs.txt')))
    ssims = np.atleast_1d(np.loadtxt(os.path.join(edir, 'ssims.txt')))
    return (psnrs.reshape(-1, n_down).mean(0), ssims.reshape(-1, n_down).mean(0))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', required=True)
    p.add_argument('--steps', type=int, default=10000)
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--n_down', type=int, default=4, choices=[1, 2, 4])
    p.add_argument('--skip_train', nargs='*', default=[])
    p.add_argument('opts', nargs=argparse.REMAINDER)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    sys.path.insert(0, REPO)
    from mipnerf_pl_tpu.data.synthetic import make_sphere_scene

    scene_dir = os.path.join(args.out, 'scene_src', 'hard')
    if not os.path.exists(os.path.join(scene_dir, 'transforms_test.json')):
        print(f'generating hard synthetic scene at {args.size}px', flush=True)
        make_sphere_scene(scene_dir, n_train=48, n_val=4, n_test=8,
                          size=args.size, scene='hard', supersample=2)
    blender_root = os.path.dirname(scene_dir.rstrip('/'))

    multi_dir = os.path.join(args.out, 'multiscale')
    data_dir = os.path.join(multi_dir, 'hard')
    if not os.path.exists(os.path.join(data_dir, 'metadata.json')):
        run([sys.executable, 'convert_blender_data.py',
             '--blender_dir', blender_root, '--object_name', 'hard',
             '--out_dir', multi_dir, '--n_down', str(args.n_down)])

    variants = [
        ('distloss_on', ['loss.distloss_mult', '0.01']),
        ('distloss_off', ['loss.distloss_mult', '0.0']),
    ]
    common = ['train.compute_dtype', 'bfloat16',
              'val.check_interval', str(args.steps),
              'val.sample_num', '2',
              'optimizer.max_steps', str(args.steps)]
    for name, extra in variants:
        if name in args.skip_train:
            continue
        run([sys.executable, 'train.py',
             '--data_path', data_dir, '--out_dir', args.out,
             '--dataset_name', 'multi_blender',
             '--max_steps', str(args.steps),
             'exp_name', name] + common + extra + args.opts)

    for name, _ in variants:
        run([sys.executable, 'eval.py',
             '--ckpt', os.path.join(args.out, 'ckpt', name),
             '--data', data_dir, '--out_dir', args.out,
             '--dataset_name', 'multi_blender',
             '--scale', str(args.n_down), '--no_video'])

    rows = {name: per_scale(args.out, name, args.n_down)
            for name, _ in variants}
    scale_names = ['full res', '1/2 res', '1/4 res', '1/8 res'][:args.n_down]

    lines = [
        '# Distortion-loss on/off — hard scene, full lego config',
        '',
        f'Steps: {args.steps} per variant  |  generated: '
        f'{time.strftime("%Y-%m-%d %H:%M:%S")}',
        '',
        '| Scale | distloss=0.01 PSNR | distloss=0 PSNR | distloss=0.01 SSIM '
        '| distloss=0 SSIM |',
        '|---|---|---|---|---|',
    ]
    for i, sn in enumerate(scale_names):
        lines.append(
            f'| {sn} | {rows["distloss_on"][0][i]:.3f} '
            f'| {rows["distloss_off"][0][i]:.3f} '
            f'| {rows["distloss_on"][1][i]:.4f} '
            f'| {rows["distloss_off"][1][i]:.4f} |')
    lines.append(
        f'| **average** | **{rows["distloss_on"][0].mean():.3f}** '
        f'| **{rows["distloss_off"][0].mean():.3f}** '
        f'| **{rows["distloss_on"][1].mean():.4f}** '
        f'| **{rows["distloss_off"][1].mean():.4f}** |')

    report = '\n'.join(lines) + '\n'
    out_md = os.path.join(args.out, 'DISTLOSS.md')
    with open(out_md, 'w') as f:
        f.write(report)
    with open(os.path.join(args.out, 'distloss.json'), 'w') as f:
        json.dump({n: {'psnr': rows[n][0].tolist(),
                       'ssim': rows[n][1].tolist()} for n in rows}, f,
                  indent=1)
    print(report)
    print(f'wrote {out_md}')


if __name__ == '__main__':
    main()
