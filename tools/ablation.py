#!/usr/bin/env python
"""Mip-NeRF behavior ablations on the hard synthetic scene, one command.

Trains three variants on the high-frequency 'hard' scene (textured spheres
over a checkered ground disk, data/synthetic.py) and evaluates every one on
the SAME multi-scale test pyramid:

  multi_ipe   multi-scale train, integrated PE            (the mip-NeRF recipe)
  multi_pe    multi-scale train, disable_integration=True (classic NeRF PE;
              reference switch models/mip_nerf.py:211-212)
  single_ipe  single-scale (full-res) train, IPE          (no lossmult; the
              reference README.md:6-56 single-vs-multi comparison)

The claims being tested (the anti-aliasing behavior mip-NeRF exists for):
  * IPE beats PE at the coarse scales (cone footprint must pay);
  * multi-scale training beats single-scale-trained eval on the pyramid
    (lossmult must pay).

Artifacts: <out>/ABLATION.md with the per-scale PSNR/SSIM table and
sign-check verdicts, plus standard train/eval outputs per variant.

  python tools/ablation.py --out /tmp/ablation --steps 20000
"""

import argparse
import json
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


def per_scale(out_dir, exp_name, n_down):
    import numpy as np
    exp_dir = os.path.join(out_dir, 'test', exp_name)
    psnr = np.atleast_1d(np.loadtxt(os.path.join(exp_dir, 'psnrs.txt')))
    ssim = np.atleast_1d(np.loadtxt(os.path.join(exp_dir, 'ssims.txt')))
    return (psnr.reshape(-1, n_down).mean(axis=0),
            ssim.reshape(-1, n_down).mean(axis=0))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', required=True)
    p.add_argument('--steps', type=int, default=20000)
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--n_down', type=int, default=4, choices=[1, 2, 4],
                   help='pyramid levels; must be an eval.py --scale choice '
                        '(validated HERE so a bad value cannot burn hours '
                        'of training before the eval stage rejects it)')
    p.add_argument('--skip_train', nargs='*', default=[],
                   help='variant names to reuse existing checkpoints for')
    p.add_argument('opts', nargs=argparse.REMAINDER,
                   help='extra hparams forwarded to every train.py run')
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
        # (name, dataset_name, train data dir, extra train opts)
        ('multi_ipe', 'multi_blender', data_dir, []),
        ('multi_pe', 'multi_blender', data_dir,
         ['nerf.disable_integration', 'True']),
        ('single_ipe', 'blender', scene_dir, []),
    ]

    common = ['train.compute_dtype', 'bfloat16',
              'val.check_interval', str(args.steps),
              'val.sample_num', '2',
              'optimizer.max_steps', str(args.steps)]
    for name, dataset_name, train_dir, extra in variants:
        if name in args.skip_train:
            continue
        run([sys.executable, 'train.py',
             '--data_path', train_dir, '--out_dir', args.out,
             '--dataset_name', dataset_name,
             '--max_steps', str(args.steps),
             'exp_name', name] + common + extra + args.opts)

    # Evaluate EVERY variant on the same multi-scale pyramid test set.
    for name, _, _, _ in variants:
        run([sys.executable, 'eval.py',
             '--ckpt', os.path.join(args.out, 'ckpt', name),
             '--data', data_dir, '--out_dir', args.out,
             '--dataset_name', 'multi_blender',
             '--scale', str(args.n_down), '--no_video'])

    rows = {name: per_scale(args.out, name, args.n_down)
            for name, _, _, _ in variants}
    scale_names = ['full res', '1/2 res', '1/4 res', '1/8 res'][:args.n_down]

    # Sign checks at the coarse scales (where the cone footprint is big).
    coarse = slice(args.n_down // 2, args.n_down)
    ipe_delta = rows['multi_ipe'][0][coarse] - rows['multi_pe'][0][coarse]
    ms_delta = rows['multi_ipe'][0][coarse] - rows['single_ipe'][0][coarse]
    checks = [
        ('IPE beats PE at coarse scales',
         float(ipe_delta.mean()), bool((ipe_delta > 0).all())),
        ('multi-scale training beats single-scale at coarse scales',
         float(ms_delta.mean()), bool((ms_delta > 0).all())),
    ]

    lines = [
        '# Ablations — mip-NeRF behavior on the hard synthetic scene',
        '',
        f'Scene: `{scene_dir}` (textured spheres + checkered ground; '
        f'{args.size}px, 2x supersampled GT)',
        f'Steps: {args.steps} per variant  |  eval: same {args.n_down}-scale '
        f'test pyramid  |  generated: {time.strftime("%Y-%m-%d %H:%M:%S")}',
        '',
        '| Scale | multi+IPE PSNR | multi+PE PSNR | single+IPE PSNR '
        '| multi+IPE SSIM | multi+PE SSIM | single+IPE SSIM |',
        '|---|---|---|---|---|---|---|',
    ]
    for i, sname in enumerate(scale_names):
        lines.append(
            f'| {sname} '
            f'| {rows["multi_ipe"][0][i]:.3f} | {rows["multi_pe"][0][i]:.3f} '
            f'| {rows["single_ipe"][0][i]:.3f} '
            f'| {rows["multi_ipe"][1][i]:.4f} | {rows["multi_pe"][1][i]:.4f} '
            f'| {rows["single_ipe"][1][i]:.4f} |')
    lines += ['', '## Sign checks', '']
    for desc, delta, ok in checks:
        lines.append(f'- {desc}: mean coarse-scale PSNR delta '
                     f'**{delta:+.3f} dB** — {"PASS" if ok else "FAIL"}')
    report = '\n'.join(lines) + '\n'
    out_md = os.path.join(args.out, 'ABLATION.md')
    with open(out_md, 'w') as f:
        f.write(report)
    with open(os.path.join(args.out, 'ablation.json'), 'w') as f:
        json.dump({name: {'psnr': r[0].tolist(), 'ssim': r[1].tolist()}
                   for name, r in rows.items()}
                  | {'checks': [{'desc': d, 'delta': x, 'pass': ok}
                                for d, x, ok in checks],
                     'steps': args.steps, 'size': args.size}, f, indent=1)
    print(report, flush=True)
    print(f'wrote {out_md}', flush=True)


if __name__ == '__main__':
    main()
