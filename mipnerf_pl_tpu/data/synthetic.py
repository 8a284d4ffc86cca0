"""Synthetic multi-view-consistent scene generation (no dataset downloads).

Renders analytic sphere scenes to the Blender transforms_{split}.json layout
so the full train/eval/render stack can be exercised — and its convergence
validated (PSNR climbing into the high 20s within a few thousand steps) —
without the NeRF-synthetic data on disk.  This replaces nothing in the
reference; it's this framework's built-in CI / quality-smoke data source.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

CAMERA_ANGLE_X = 0.6911112070083618  # matches NeRF-synthetic

DEFAULT_SPHERES: List[Tuple[np.ndarray, float, np.ndarray]] = [
    (np.array([0.0, 0.0, 0.0]), 0.7, np.array([0.9, 0.2, 0.2])),
    (np.array([0.9, 0.0, 0.3]), 0.35, np.array([0.2, 0.8, 0.3])),
    (np.array([-0.6, 0.7, -0.2]), 0.3, np.array([0.2, 0.3, 0.9])),
]


def render_sphere_view(c2w: np.ndarray, size: int,
                       spheres: Optional[Sequence] = None,
                       focal: Optional[float] = None) -> np.ndarray:
    """Analytically ray-trace shaded spheres: returns [H, W, 4] RGBA."""
    spheres = DEFAULT_SPHERES if spheres is None else spheres
    focal = focal or 0.5 * size / np.tan(0.5 * CAMERA_ANGLE_X)
    x, y = np.meshgrid(np.arange(size) + 0.5, np.arange(size) + 0.5,
                       indexing='xy')
    cam_dirs = np.stack([(x - size / 2) / focal, -(y - size / 2) / focal,
                         -np.ones_like(x)], -1)
    dirs = cam_dirs @ c2w[:3, :3].T
    o = c2w[:3, 3]

    rgba = np.zeros((size, size, 4), np.float32)
    tmin = np.full((size, size), np.inf)
    light = np.array([0.5, 0.5, 0.7])
    for c, r, col in spheres:
        oc = o - c
        b = np.sum(dirs * oc, -1)
        dd = np.sum(dirs * dirs, -1)
        disc = b * b - dd * (np.dot(oc, oc) - r * r)
        hit = disc > 0
        t = (-b - np.sqrt(np.maximum(disc, 0))) / dd
        closer = hit & (t > 0) & (t < tmin)
        tmin = np.where(closer, t, tmin)
        pt = o + dirs * t[..., None]
        nrm = (pt - c) / r
        shade = 0.4 + 0.6 * np.clip(nrm @ light, 0, 1)
        for k in range(3):
            rgba[..., k] = np.where(closer, col[k] * shade, rgba[..., k])
        rgba[..., 3] = np.where(closer, 1.0, rgba[..., 3])
    return np.clip(rgba, 0, 1)


def make_sphere_scene(root: str, n_train: int = 24, n_val: int = 2,
                      n_test: int = 2, size: int = 64,
                      radius: float = 4.0) -> str:
    """Write a Blender-layout scene of analytic spheres (orbit cameras)."""
    from PIL import Image

    from mipnerf_pl_tpu.utils.vis import create_spheric_poses

    os.makedirs(root, exist_ok=True)
    for split, n in (('train', n_train), ('val', n_val), ('test', n_test)):
        # stride val/test around the orbit so views differ from train
        poses = create_spheric_poses(radius, n_poses=max(n * 3, n_train))
        stride = max(1, len(poses) // max(n, 1))
        poses = poses[::stride][:n]
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i, p in enumerate(poses):
            c2w = np.eye(4)
            c2w[:3, :4] = p
            rgba = render_sphere_view(c2w, size)
            Image.fromarray((rgba * 255).astype(np.uint8)).save(
                os.path.join(root, split, f'r_{i}.png'))
            frames.append({'file_path': f'{split}/r_{i}',
                           'transform_matrix': c2w.tolist()})
        with open(os.path.join(root, f'transforms_{split}.json'), 'w') as f:
            json.dump({'camera_angle_x': CAMERA_ANGLE_X, 'frames': frames}, f)
    return root
