#!/usr/bin/env python
"""Quality-parity acceptance harness: convert -> train -> eval -> summarize
in ONE command, emitting the BASELINE.md comparison table.

  python tools/acceptance.py --steps 50000 --out /tmp/acceptance
  python tools/acceptance.py --blender_scene /data/nerf_synthetic/lego \
      --steps 300000 --out /tmp/acceptance_lego

With no --blender_scene it generates the built-in synthetic sphere scene
(data/synthetic.py) at --size px, so the full multi-scale pipeline runs
end-to-end with zero downloads; point --blender_scene at a real
NeRF-synthetic scene directory (transforms_{split}.json + PNGs) to produce
the true BASELINE parity table (reference README.md:40-51 regime).

Artifacts: <out>/ACCEPTANCE.md with the per-scale PSNR/SSIM table vs the
BASELINE targets, plus the standard train/eval outputs under <out>.
Reference analog: README results table produced by eval.py:92-96 +
utils/metrics.py:129-155.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# BASELINE.md per-scale targets (lego multi-scale @ 300k steps).
BASELINE_PSNR = [34.412, 35.640, 36.074, 35.482]
BASELINE_SSIM = [0.9719, 0.9843, 0.9897, 0.9912]
BASELINE_AVG = (35.402, 0.9843)


def run(cmd, **kw):
    print('+', ' '.join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO, **kw)
    print(f'  ({time.time() - t0:.0f} s)', flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--blender_scene', default=None,
                   help='single-scale Blender scene dir; default: generate '
                        'the synthetic sphere scene')
    p.add_argument('--out', required=True)
    p.add_argument('--steps', type=int, default=50000)
    p.add_argument('--size', type=int, default=256,
                   help='synthetic scene resolution (ignored with '
                        '--blender_scene)')
    p.add_argument('--scene', default='spheres', choices=['spheres', 'hard'],
                   help="built-in synthetic scene: 'spheres' (easy, "
                        "saturates ~45 PSNR) or 'hard' (textured, "
                        "aliasing-prone — the regime the BASELINE targets "
                        "live in)")
    p.add_argument('--n_down', type=int, default=4,
                   help='multi-scale pyramid levels (= eval scale buckets)')
    p.add_argument('--val_interval', type=int, default=10000)
    p.add_argument('--skip_train', action='store_true',
                   help='reuse an existing checkpoint in --out')
    p.add_argument('opts', nargs=argparse.REMAINDER,
                   help='extra hparams forwarded to train.py')
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    scene_dir = args.blender_scene
    if scene_dir is None:
        sys.path.insert(0, REPO)
        from mipnerf_pl_tpu.data.synthetic import make_sphere_scene
        scene_dir = os.path.join(args.out, 'scene_src', args.scene)
        if not os.path.exists(os.path.join(scene_dir,
                                           'transforms_test.json')):
            print(f'generating synthetic {args.scene!r} scene at '
                  f'{args.size}px', flush=True)
            make_sphere_scene(scene_dir, n_train=48, n_val=4, n_test=8,
                              size=args.size, scene=args.scene)
    scene_name = os.path.basename(scene_dir.rstrip('/'))
    blender_root = os.path.dirname(scene_dir.rstrip('/'))

    # 1. convert: single-scale Blender -> multi-scale metadata.json pyramid.
    multi_dir = os.path.join(args.out, 'multiscale')
    data_dir = os.path.join(multi_dir, scene_name)
    if not os.path.exists(os.path.join(data_dir, 'metadata.json')):
        run([sys.executable, 'convert_blender_data.py',
             '--blender_dir', blender_root, '--object_name', scene_name,
             '--out_dir', multi_dir, '--n_down', str(args.n_down)])

    exp_name = f'acceptance_{scene_name}'
    # 2. train the full lego config on the multi-scale data.
    if not args.skip_train:
        run([sys.executable, 'train.py',
             '--data_path', data_dir, '--out_dir', args.out,
             '--dataset_name', 'multi_blender',
             '--max_steps', str(args.steps),
             'exp_name', exp_name,
             'train.compute_dtype', 'bfloat16',
             'val.check_interval', str(args.val_interval),
             'optimizer.max_steps', str(max(args.steps, 1)),
             ] + args.opts)

    # 3. eval every test image into the per-scale buckets.
    ckpt_dir = os.path.join(args.out, 'ckpt', exp_name)
    run([sys.executable, 'eval.py', '--ckpt', ckpt_dir,
         '--data', data_dir, '--out_dir', args.out,
         '--scale', str(args.n_down), '--no_video'])

    # 4. summarize into the BASELINE comparison table.
    from mipnerf_pl_tpu.utils.metrics import summarize_results
    import numpy as np
    summary = summarize_results(args.out, [exp_name], args.n_down)
    exp_dir = os.path.join(args.out, 'test', exp_name)
    psnr = np.atleast_1d(np.loadtxt(os.path.join(exp_dir, 'psnrs.txt')))
    ssim = np.atleast_1d(np.loadtxt(os.path.join(exp_dir, 'ssims.txt')))
    psnr_s = psnr.reshape(-1, args.n_down).mean(axis=0)
    ssim_s = ssim.reshape(-1, args.n_down).mean(axis=0)
    mse = 10.0 ** (-psnr_s.mean() / 10.0)
    avg_psnr = psnr_s.mean()
    avg_ssim = ssim_s.mean()

    is_lego = 'lego' in scene_name.lower()
    scale_names = ['full res', '1/2 res', '1/4 res', '1/8 res'][:args.n_down]
    lines = [
        '# Acceptance — multi-scale quality vs BASELINE',
        '',
        f'Scene: `{scene_dir}`'
        + ('' if is_lego else ' (synthetic sphere stand-in; BASELINE targets '
           'are for the real lego scene and are shown for reference only)'),
        f'Steps: {args.steps}  |  eval buckets: {args.n_down}  |  '
        f'generated: {time.strftime("%Y-%m-%d %H:%M:%S")}',
        '',
        '| Scale | PSNR | SSIM | BASELINE PSNR (lego@300k) | BASELINE SSIM |',
        '|---|---|---|---|---|',
    ]
    for i, name in enumerate(scale_names):
        bp = f'{BASELINE_PSNR[i]:.3f}' if i < len(BASELINE_PSNR) else '-'
        bs = f'{BASELINE_SSIM[i]:.4f}' if i < len(BASELINE_SSIM) else '-'
        lines.append(f'| {name} | {psnr_s[i]:.3f} | {ssim_s[i]:.4f} '
                     f'| {bp} | {bs} |')
    lines += [
        f'| **average** | **{avg_psnr:.3f}** | **{avg_ssim:.4f}** '
        f'| {BASELINE_AVG[0]:.3f} | {BASELINE_AVG[1]:.4f} |',
        '',
        f'`summarize_results` line: `{summary}`',
        '',
    ]
    # Validation trajectory (written by the fit loop): plateau evidence.
    hist = os.path.join(args.out, 'logs', exp_name, 'val_history.csv')
    if os.path.exists(hist):
        rows = [l.strip().split(',') for l in open(hist)][1:]
        lines += ['## Validation trajectory', '',
                  '| step | val PSNR |', '|---|---|']
        lines += [f'| {r[0]} | {float(r[2]):.2f} |' for r in rows]
        lines.append('')
    report = '\n'.join(lines)
    out_md = os.path.join(args.out, 'ACCEPTANCE.md')
    with open(out_md, 'w') as f:
        f.write(report)
    with open(os.path.join(args.out, 'acceptance.json'), 'w') as f:
        json.dump({'psnr_per_scale': psnr_s.tolist(),
                   'ssim_per_scale': ssim_s.tolist(),
                   'psnr_avg': float(avg_psnr), 'ssim_avg': float(avg_ssim),
                   'mse_avg': float(mse), 'steps': args.steps,
                   'scene': scene_dir}, f, indent=1)
    print(report, flush=True)
    print(f'wrote {out_md}', flush=True)


if __name__ == '__main__':
    main()
