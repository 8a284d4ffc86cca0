"""Camera frustum visualizer.

Parity: reference utils/visualize_cameras.py — draws the camera frusta of a
Blender / multi-scale dataset plus an optional spheric render path.  The
reference renders interactively with open3d (not in this image); here the
same frustum linesets are drawn with matplotlib 3-D and saved to a PNG,
which also works headless.  The reference's broken `"-- "` argparse flag
(utils/visualize_cameras.py:203, can never set args.multi_scale) is fixed
as a proper `--multi_scale` flag.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional, Tuple

import numpy as np


def get_camera_frustum(img_size, focal, c2w, frustum_length: float = 0.5):
    """5 frustum corner points (world) + the 8 line segments between them."""
    w, h = img_size
    half_w = frustum_length * (w / 2.0) / focal
    half_h = frustum_length * (h / 2.0) / focal
    # OpenGL camera: -z forward.
    points_cam = np.array([
        [0.0, 0.0, 0.0],
        [-half_w, half_h, -frustum_length],
        [half_w, half_h, -frustum_length],
        [half_w, -half_h, -frustum_length],
        [-half_w, -half_h, -frustum_length],
    ])
    lines = np.array([[0, i] for i in range(1, 5)]
                     + [[i, i + 1] for i in range(1, 4)] + [[4, 1]])
    c2w = np.asarray(c2w)
    r, t = c2w[:3, :3], c2w[:3, 3]
    points_world = points_cam @ r.T + t
    return points_world, lines


def plot_frustums(ax, frusta: List[Tuple[np.ndarray, np.ndarray]], color):
    for points, lines in frusta:
        for a, b in lines:
            ax.plot(*zip(points[a], points[b]), color=color, linewidth=0.7)


def load_blender_cameras(data_dir: str, split: str = 'train'):
    """(img_size, focal, [c2w]) from transforms_{split}.json."""
    with open(os.path.join(data_dir, f'transforms_{split}.json')) as f:
        meta = json.load(f)
    # Probe one image for its size.
    from PIL import Image
    first = os.path.join(data_dir, meta['frames'][0]['file_path'] + '.png')
    with Image.open(first) as im:
        w, h = im.size
    focal = 0.5 * w / np.tan(0.5 * float(meta['camera_angle_x']))
    c2ws = [np.array(fr['transform_matrix']) for fr in meta['frames']]
    return (w, h), focal, c2ws


def load_multicam_cameras(data_dir: str, split: str = 'train'):
    """Per-image ((w, h), focal, c2w) triples from metadata.json."""
    with open(os.path.join(data_dir, 'metadata.json')) as f:
        meta = json.load(f)[split]
    out = []
    for i in range(len(meta['file_path'])):
        out.append(((meta['width'][i], meta['height'][i]),
                    meta['focal'][i], np.array(meta['cam2world'][i])))
    return out


def visualize_cameras(camera_sets, out_path: str,
                      sphere_radius: float = 1.0,
                      spheric_path: bool = False,
                      frustum_length: float = 0.5):
    """Render colored camera sets (+ optional spheric orbit) to a PNG.

    Args:
      camera_sets: list of (color, [( (w,h), focal, c2w ), ...]).
      out_path: output PNG path.
      spheric_path: additionally draw the 120-pose orbit used by
        render_video (radius 4, reference render_video.py:31).
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(111, projection='3d')

    for color, cams in camera_sets:
        frusta = [get_camera_frustum(size, focal, c2w, frustum_length)
                  for size, focal, c2w in cams]
        plot_frustums(ax, frusta, color)

    if spheric_path:
        from mipnerf_pl_tpu.utils.vis import create_spheric_poses
        poses = create_spheric_poses(4.0)
        frusta = [get_camera_frustum((800, 800), 1111.0, np.vstack(
            [p, [0, 0, 0, 1]]), frustum_length) for p in poses]
        plot_frustums(ax, frusta, 'red')

    # Unit sphere wireframe for scale (reference draws an o3d sphere).
    u = np.linspace(0, 2 * np.pi, 24)
    v = np.linspace(0, np.pi, 12)
    x = sphere_radius * np.outer(np.cos(u), np.sin(v))
    y = sphere_radius * np.outer(np.sin(u), np.sin(v))
    z = sphere_radius * np.outer(np.ones_like(u), np.cos(v))
    ax.plot_wireframe(x, y, z, color='gray', alpha=0.2, linewidth=0.3)

    ax.set_box_aspect([1, 1, 1])
    fig.savefig(out_path, dpi=120, bbox_inches='tight')
    plt.close(fig)
    return out_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_dir', required=True)
    parser.add_argument('--out', default='cameras.png')
    parser.add_argument('--split', default='train')
    parser.add_argument('--multi_scale', action='store_true',
                        help='dataset is a multi-scale metadata.json dir')
    parser.add_argument('--spheric_path', action='store_true',
                        help='also draw the render_video orbit')
    args = parser.parse_args()

    if args.multi_scale:
        cams = load_multicam_cameras(args.data_dir, args.split)
    else:
        size, focal, c2ws = load_blender_cameras(args.data_dir, args.split)
        cams = [(size, focal, c2w) for c2w in c2ws]
    path = visualize_cameras([('green', cams)], args.out,
                             spheric_path=args.spheric_path)
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
