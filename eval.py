#!/usr/bin/env python
"""Eval CLI — same public flags and artifacts as reference eval.py.

Renders the test split from a checkpoint (hparams restored from the
checkpoint directory, parity with load_from_checkpoint), computes per-image
PSNR/SSIM, writes psnrs.txt / ssims.txt, optionally dumps images into
per-scale directories, generates orbit videos, and prints the
'PSNR | SSIM | Average' summary (reference eval.py:26-96).
"""

import argparse
import os

parser = argparse.ArgumentParser()
parser.add_argument("--ckpt", help="Path to ckpt directory.")
parser.add_argument("--data", help="Path to data.")
parser.add_argument("--out_dir", help="Output directory.", type=str,
                    required=True)
parser.add_argument("--chunk_size", help="Chunk size for render.", type=int,
                    default=12288)
def _str2bool(v):
    return str(v).lower() not in ('false', '0', 'no')


parser.add_argument("--white_bkgd", help="Use white background.",
                    type=_str2bool, default=True)
parser.add_argument('--save_image', help='whether save predicted image',
                    action='store_true')
parser.add_argument('--summa_only', help='Only summarize results',
                    action='store_true')
parser.add_argument('--scale', help='eval scale', type=int, required=True,
                    choices=[1, 2, 4])
parser.add_argument('--base_size', help='source image size', type=int,
                    nargs=2, default=[800, 800])
parser.add_argument('--no_video', help='skip video generation',
                    action='store_true')
parser.add_argument('--dataset_name', default=None,
                    help='override the checkpoint-recorded dataset type '
                         '(e.g. eval a single-scale-trained model on a '
                         'multi_blender pyramid for ablations)')


def main(args):
    import numpy as np

    from mipnerf_pl_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from mipnerf_pl_tpu.data.datasets import dataset_dict
    from mipnerf_pl_tpu.train.ckpt import load_hparams, restore_for_eval
    from mipnerf_pl_tpu.train.system import MipNeRFSystem
    from mipnerf_pl_tpu.utils.metrics import eval_errors
    from mipnerf_pl_tpu.utils.vis import save_images

    hparams = load_hparams(args.ckpt)
    exp_name = hparams['exp_name']
    if args.summa_only:
        return [exp_name]

    system = MipNeRFSystem(hparams)
    # Reference parity (eval.py:61): the CLI's --white_bkgd drives the
    # render compositing (dataset compositing still follows the ckpt hparams).
    system.white_bkgd = bool(args.white_bkgd)
    _, state = restore_for_eval(args.ckpt, system.abstract_eval_state())

    dataset_name = getattr(args, 'dataset_name', None)
    # data.factor follows the checkpoint hparams, as in training
    # (train/system.py setup) — a real360 capture trained at factor 1 must
    # eval from images_1, not the class default images_4.
    extra = {}
    factor = hparams.get('data.factor')
    if factor is not None and str(factor) != 'None':
        extra['factor'] = int(factor)
    test_dataset = dataset_dict[dataset_name or hparams['dataset_name']](
        data_dir=args.data, split='test',
        white_bkgd=hparams['val.white_bkgd'],
        batch_type=hparams['val.batch_type'], **extra)

    for i in range(args.scale):
        os.makedirs(os.path.join(args.out_dir, 'test', exp_name, str(2 ** i)),
                    exist_ok=True)

    psnr_values, ssim_values = [], []
    n = -1
    for idx in range(len(test_dataset)):
        if idx % args.scale == 0:
            n += 1
        rays, rgb_gt = test_dataset[idx]
        # On-device ray generation (~100 B/frame host->device instead of
        # the materialized bundle); rays stay as the metrics mask source.
        try:
            cam, (ch, cw) = test_dataset.camera(idx)
            out = system.render_camera(state['params'], cam, ch, cw,
                                       chunk_size=args.chunk_size,
                                       need_coarse=False)
        except NotImplementedError:
            out = system.render_image(state['params'], rays,
                                      chunk_size=args.chunk_size,
                                      need_coarse=False)
        height, width = out['fine_rgb'].shape[:2]
        psnr_val, ssim_val = eval_errors(
            out['fine_rgb'][None], np.asarray(rgb_gt[..., :3])[None])
        psnr_values.append(float(psnr_val))
        ssim_values.append(float(ssim_val))
        print(f'image {idx}: psnr={psnr_values[-1]:.3f} '
              f'ssim={ssim_values[-1]:.4f}', flush=True)
        if args.save_image:
            out_path = os.path.join(args.out_dir, 'test', exp_name,
                                    str(int(args.base_size[0] / width)))
            save_images(out['fine_rgb'], out['distance'], out['acc'],
                        out_path, n)

    exp_dir = os.path.join(args.out_dir, 'test', exp_name)
    with open(os.path.join(exp_dir, 'psnrs.txt'), 'w') as f:
        f.write(' '.join([str(v) for v in psnr_values]))
    with open(os.path.join(exp_dir, 'ssims.txt'), 'w') as f:
        f.write(' '.join([str(v) for v in ssim_values]))
    if args.save_image and not args.no_video:
        from render_video import generate_video
        generate_video(exp_dir)
    return [exp_name]


if __name__ == '__main__':
    args = parser.parse_args()
    scenes = main(args)
    from mipnerf_pl_tpu.utils.metrics import summarize_results
    print('PSNR | SSIM | Average')
    print(summarize_results(args.out_dir, scenes,
                            1 if args.scale == 1 else args.scale))
