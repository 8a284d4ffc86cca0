"""Visualization utilities (L5): depth colormaps, image saving, camera paths.

Parity targets (reference file:line):
  * visualize_depth (JET colormap)  reference utils/vis.py:75-89
  * save_images / save_image        reference utils/vis.py:46-72
  * create_spiral_poses             reference utils/vis.py:124-156
  * create_spheric_poses            reference utils/vis.py:159-198
  * gen_render_path (pose interp)   reference utils/vis.py:92-121
  * stack_rgb                       reference utils/vis.py:201-207
  * vis_lr (lr curve plot)          reference utils/vis.py:17-43

All functions are numpy-native (no torch/torchvision): images are float
arrays in [0, 1], HWC (or HW for scalar maps).
"""

from __future__ import annotations

import os

import numpy as np


def normalize(v):
    """Normalize a vector."""
    return v / np.linalg.norm(v)


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
            * 255).astype(np.uint8)


def visualize_depth(depth, cmap=None) -> np.ndarray:
    """Scalar map -> JET-colormapped RGB float image [H, W, 3] in [0, 1]."""
    import cv2
    x = np.asarray(depth, dtype=np.float32)
    x = np.squeeze(x)
    x = np.nan_to_num(x)
    mi, ma = np.min(x), np.max(x)
    x = (x - mi) / max(ma - mi, 1e-8)
    x8 = (255 * x).astype(np.uint8)
    colored = cv2.applyColorMap(x8, cv2.COLORMAP_JET if cmap is None else cmap)
    return cv2.cvtColor(colored, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def save_image(img: np.ndarray, save_path: str) -> None:
    """Save an HWC (or HW) float image in [0, 1] as PNG."""
    from PIL import Image
    arr = to_uint8(np.squeeze(np.asarray(img)))
    Image.fromarray(arr).save(save_path)


def save_images(rgb, dist, acc, out_dir: str, idx: int) -> None:
    """Write {idx:05d}_{rgb,dist,acc}.png — same artifact names as the
    reference (utils/vis.py:66-72)."""
    os.makedirs(out_dir, exist_ok=True)
    rgb = np.asarray(rgb)
    if rgb.ndim == 4:
        rgb = rgb[0]
    save_image(rgb, os.path.join(out_dir, f'{idx:05d}_rgb.png'))
    save_image(visualize_depth(dist), os.path.join(out_dir, f'{idx:05d}_dist.png'))
    save_image(visualize_depth(acc), os.path.join(out_dir, f'{idx:05d}_acc.png'))


def stack_rgb(rgb_gt, coarse_rgb, fine_rgb) -> np.ndarray:
    """(GT, coarse, fine) -> [3, 3, H, W] stack for TensorBoard add_images."""
    def chw(x):
        x = np.squeeze(np.asarray(x))
        return np.transpose(x, (2, 0, 1))
    return np.stack([chw(rgb_gt), chw(coarse_rgb), chw(fine_rgb)])


# --------------------------------------------------------------------------
# Camera path generation
# --------------------------------------------------------------------------

def create_spiral_poses(radii, focus_depth, n_poses: int = 120) -> np.ndarray:
    """Spiral path of [n_poses, 3, 4] camera-to-world matrices (LLFF-style)."""
    poses_spiral = []
    for t in np.linspace(0, 4 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = normalize(center - np.array([0, 0, -focus_depth]))
        y_ = np.array([0, 1, 0])
        x = normalize(np.cross(y_, z))
        y = np.cross(z, x)
        poses_spiral.append(np.stack([x, y, z, center], 1))
    return np.stack(poses_spiral, 0)


def create_spheric_poses(radius: float, n_poses: int = 120) -> np.ndarray:
    """Circular orbit around +z looking 36 degrees downwards: [n, 3, 4]."""

    def spheric_pose(theta, phi, radius):
        trans_t = lambda t: np.array([
            [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]])
        rot_phi = lambda phi: np.array([
            [1, 0, 0, 0],
            [0, np.cos(phi), -np.sin(phi), 0],
            [0, np.sin(phi), np.cos(phi), 0],
            [0, 0, 0, 1]])
        rot_theta = lambda th: np.array([
            [np.cos(th), 0, -np.sin(th), 0],
            [0, 1, 0, 0],
            [np.sin(th), 0, np.cos(th), 0],
            [0, 0, 0, 1]])
        c2w = rot_theta(theta) @ rot_phi(phi) @ trans_t(radius)
        c2w = np.array([[-1, 0, 0, 0], [0, 0, 1, 0],
                        [0, 1, 0, 0], [0, 0, 0, 1]]) @ c2w
        return c2w[:3]

    return np.stack([
        spheric_pose(th, -np.pi / 5, radius)
        for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]
    ], 0)


def gen_render_path(c2ws: np.ndarray, n_views: int = 30) -> np.ndarray:
    """Interpolate between keyframe poses (Euler-angle lerp), [*, 4, 4]."""
    from scipy.spatial.transform import Rotation as R
    n = len(c2ws)
    rotvec, positions = [], []
    rotvec_interp, positions_interp = [], []
    weight = np.linspace(1.0, 0.0, n_views // 3, endpoint=False).reshape(-1, 1)
    for i in range(n):
        r = R.from_matrix(c2ws[i, :3, :3])
        euler = r.as_euler('xyz', degrees=True).reshape(1, 3)
        if i:
            mask = np.abs(euler - rotvec[0]) > 180
            euler[mask] += 360.0
        rotvec.append(euler)
        positions.append(c2ws[i, :3, 3:].reshape(1, 3))
        if i:
            rotvec_interp.append(weight * rotvec[i - 1] + (1 - weight) * rotvec[i])
            positions_interp.append(
                weight * positions[i - 1] + (1 - weight) * positions[i])
    rotvec_interp.append(weight * rotvec[-1] + (1 - weight) * rotvec[0])
    positions_interp.append(weight * positions[-1] + (1 - weight) * positions[0])

    c2ws_render = []
    angles = np.concatenate(rotvec_interp)
    pos = np.concatenate(positions_interp)
    for rv, p in zip(angles, pos):
        c2w = np.eye(4)
        c2w[:3, :3] = R.from_euler('xyz', rv, degrees=True).as_matrix()
        c2w[:3, 3:] = p.reshape(3, 1)
        c2ws_render.append(c2w.copy())
    return np.stack(c2ws_render)


def vis_lr(lr_fn, max_steps: int, out_path: str = None):
    """Plot a learning-rate schedule on log-log axes."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    steps = np.arange(1, max_steps, max(1, max_steps // 10000))
    lrs = [float(lr_fn(s)) for s in steps]
    plt.figure()
    plt.plot(steps, lrs)
    plt.xscale('log')
    plt.yscale('log')
    if out_path:
        plt.savefig(out_path)
    plt.close()
