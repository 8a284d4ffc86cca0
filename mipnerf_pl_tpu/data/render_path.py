"""Synthetic render-path ray generation (spheric orbit, multi-scale).

Parity: reference render_video.py:19-112 (`RenderGen`) — 120 orbit poses on
a spheric path at `scales` resolution levels, rays built through per-scale
pix2cam intrinsics.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from mipnerf_pl_tpu.data.datasets import pixel_radii
from mipnerf_pl_tpu.rays import Rays
from mipnerf_pl_tpu.utils.vis import create_spheric_poses


def spheric_render_cameras(base_focal: float, base_size: Tuple[int, int],
                           scales: int = 1, radius: float = 4.0,
                           n_poses: int = 120, near: float = 2.0,
                           far: float = 6.0):
    """Camera-form twin of `spheric_render_rays`: per-frame (Camera, (h, w))
    for the on-device ray path (ops/camera.py), scale-major order.

    ~100 bytes/frame crosses the host->device link instead of the full ray
    bundle; numerically pinned against spheric_render_rays in
    tests/test_camera.py.
    """
    from mipnerf_pl_tpu.ops.camera import Camera, fold_pixel_center
    cam2world = create_spheric_poses(radius, n_poses)

    out = []
    for i in range(scales):
        w = int(base_size[0] / 2 ** i)
        h = int(base_size[1] / 2 ** i)
        focal = base_focal / 2 ** i
        fx = fy = focal
        cx, cy = w * 0.5, h * 0.5
        pix2cam = fold_pixel_center(np.array([
            [1.0 / fx, 0.0, -cx / fx],
            [0.0, -1.0 / fy, cy / fy],
            [0.0, 0.0, -1.0],
        ], dtype=np.float32))
        for c2w in cam2world:
            cam = Camera(c2w=c2w[:3, :4].astype(np.float32),
                         pix2cam=pix2cam, near=np.float32(near),
                         far=np.float32(far), lossmult=np.float32(1.0))
            out.append((cam, (h, w)))
    return out


def spheric_render_rays(base_focal: float, base_size: Tuple[int, int],
                        scales: int = 1, radius: float = 4.0,
                        n_poses: int = 120, near: float = 2.0,
                        far: float = 6.0) -> List[Rays]:
    """Build per-frame Rays for a spheric orbit at `scales` pyramid levels.

    Returns a list of length `scales * n_poses` ordered scale-major (all
    full-res frames first), each entry an [H, W, ...] Rays — matching the
    reference's RenderGen ordering.
    """
    cam2world = create_spheric_poses(radius, n_poses)

    all_rays: List[Rays] = []
    for i in range(scales):
        w = int(base_size[0] / 2 ** i)
        h = int(base_size[1] / 2 ** i)
        focal = base_focal / 2 ** i
        fx = fy = focal
        cx, cy = w * 0.5, h * 0.5
        pix2cam = np.array([
            [1.0 / fx, 0.0, -cx / fx],
            [0.0, -1.0 / fy, cy / fy],
            [0.0, 0.0, -1.0],
        ], dtype=np.float32)

        x, y = np.meshgrid(np.arange(w, dtype=np.float32) + 0.5,
                           np.arange(h, dtype=np.float32) + 0.5,
                           indexing='xy')
        pixel_dirs = np.stack([x, y, np.ones_like(x)], axis=-1)
        camera_dirs = pixel_dirs @ pix2cam[:3, :3].T

        for c2w in cam2world:
            c2w = c2w.astype(np.float32)
            directions = (camera_dirs @ c2w[:3, :3].T).astype(np.float32)
            origins = np.broadcast_to(c2w[:3, -1], directions.shape).copy()
            viewdirs = directions / np.linalg.norm(directions, axis=-1,
                                                   keepdims=True)
            ones = np.ones_like(origins[..., :1])
            all_rays.append(Rays(
                origins=origins,
                directions=directions,
                viewdirs=viewdirs.astype(np.float32),
                radii=pixel_radii(directions),
                lossmult=ones,
                near=ones * near,
                far=ones * far))
    return all_rays
