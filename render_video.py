#!/usr/bin/env python
"""Spheric-orbit video render CLI — parity with reference render_video.py.

Renders 120 orbit poses at `--scale` pyramid levels from a checkpoint and
writes per-scale rgb/dist/acc frames plus looping .mov videos.
"""

import argparse
import glob
import os


def _write_video(path: str, frames, fps: int) -> None:
    """imageio/ffmpeg when available, else cv2 mp4v (no pip installs)."""
    try:
        import imageio
        imageio.mimwrite(path, frames, fps=fps, quality=10)
        return
    except Exception:
        pass
    import cv2
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                             (w, h))
    assert writer.isOpened(), f'cv2.VideoWriter failed for {path}'
    for f in frames:
        if f.ndim == 2:
            f = f[..., None].repeat(3, -1)
        writer.write(cv2.cvtColor(f[..., :3], cv2.COLOR_RGB2BGR))
    writer.release()


def generate_video(image_path: str, fps: int = 40) -> None:
    """Assemble video_{scale}.mov per scale dir from *_rgb.png frames,
    forward + reversed loop (reference render_video.py:156-179)."""
    import numpy as np
    from PIL import Image

    scale_dirs = [s for s in os.listdir(image_path)
                  if os.path.isdir(os.path.join(image_path, s))]
    for i in range(len(scale_dirs)):
        images = glob.glob(os.path.join(image_path, str(2 ** i), '*_rgb.png'))
        if not images:
            continue
        images.sort()
        imgs = [np.array(Image.open(f)).astype(np.uint8) for f in images]
        imgs += imgs[::-1]
        filename = f'video_{2 ** i}.mov'
        _write_video(os.path.join(image_path, str(2 ** i), filename),
                     imgs, fps)
        print(f'generate video in '
              f'{os.path.join(image_path, str(2 ** i), filename)}')


def run_render(args):
    import numpy as np

    from mipnerf_pl_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from mipnerf_pl_tpu.data.render_path import spheric_render_cameras
    from mipnerf_pl_tpu.train.ckpt import load_hparams, restore_for_eval
    from mipnerf_pl_tpu.train.system import MipNeRFSystem
    from mipnerf_pl_tpu.utils.vis import save_images

    hparams = load_hparams(args.ckpt)
    exp_name = hparams['exp_name']
    system = MipNeRFSystem(hparams)
    system.white_bkgd = bool(args.white_bkgd)
    _, state = restore_for_eval(args.ckpt, system.abstract_eval_state())

    for i in range(args.scale):
        os.makedirs(os.path.join(args.out_dir, 'render_spheric', exp_name,
                                 str(2 ** i)), exist_ok=True)

    focal = 0.5 * args.base_size[0] / np.tan(0.5 * args.camera_angle_x)
    all_cams = spheric_render_cameras(focal, args.base_size, args.scale,
                                      n_poses=args.n_poses)
    nums = len(all_cams) // args.scale

    for idx, (cam, (h, w)) in enumerate(all_cams):
        out = system.render_camera(state['params'], cam, h, w,
                                   chunk_size=args.chunk_size,
                                   need_coarse=False)
        width = out['fine_rgb'].shape[1]
        out_path = os.path.join(args.out_dir, 'render_spheric', exp_name,
                                str(int(args.base_size[0] / width)))
        save_images(out['fine_rgb'], out['distance'], out['acc'],
                    out_path, idx % nums)
        print(f'rendered frame {idx + 1}/{len(all_cams)}', flush=True)
    generate_video(os.path.join(args.out_dir, 'render_spheric', exp_name))


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", help="Path to ckpt directory.")
    parser.add_argument("--out_dir", help="Output directory.", type=str,
                        required=True)
    parser.add_argument("--chunk_size", type=int, default=12288)
    parser.add_argument("--white_bkgd",
                        type=lambda v: str(v).lower() not in
                        ('false', '0', 'no'), default=True)
    parser.add_argument("--render_images_dir", type=str, default=None,
                        help="already rendered image directory.")
    parser.add_argument('--scale', help='number of scales', type=int,
                        required=True)
    parser.add_argument('--base_size', type=int, nargs=2, default=[800, 800])
    parser.add_argument('--camera_angle_x', type=float,
                        default=0.6911112070083618)
    parser.add_argument('--n_poses', type=int, default=120)
    parser.add_argument('--gen_video_only', action='store_true')
    args = parser.parse_args()
    if not args.gen_video_only:
        run_render(args)
    else:
        assert args.render_images_dir is not None, \
            'with --gen_video_only you must pass --render_images_dir'
        generate_video(args.render_images_dir)
