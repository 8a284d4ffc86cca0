"""Convention tests for the pose utilities (data/poses.py, utils/vis.py).

These pin the *behavioral contracts* of the LLFF/NeRF pose conventions:
orbit radius and elevation, look-at targets, right-handed orthonormal
bases, and the world normalizations (recenter -> identity average pose;
spherify -> focus point at origin, up along +z).
"""

import numpy as np

from mipnerf_pl_tpu.data import poses as P
from mipnerf_pl_tpu.utils import vis


def _random_pose_cloud(n=20, seed=3):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(n, 3))
    pos = pos / np.linalg.norm(pos, axis=-1, keepdims=True) * 4.0
    pos[:, 2] = np.abs(pos[:, 2]) + 1.0       # cameras above the plane
    fwd = pos + rng.normal(size=(n, 3)) * 0.05  # looking outward from origin
    fwd /= np.linalg.norm(fwd, axis=-1, keepdims=True)
    up_hint = np.array([0.0, 0.0, 1.0]) + rng.normal(size=(n, 3)) * 0.02
    right = np.cross(up_hint, fwd)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    up = np.cross(fwd, right)
    hwf = np.broadcast_to(np.array([60.0, 80.0, 50.0])[:, None], (n, 3, 1))
    return np.concatenate([np.stack([right, up, fwd, pos], -1), hwf], -1)


def _assert_orthonormal(rot, det=1.0):
    eye = np.broadcast_to(np.eye(3), rot.shape)
    np.testing.assert_allclose(rot @ np.swapaxes(rot, -1, -2), eye,
                               atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(rot), det, atol=1e-6)


def test_spheric_poses_conventions():
    radius, n = 4.0, 16
    poses = vis.create_spheric_poses(radius, n_poses=n)
    assert poses.shape == (n, 3, 4)
    centers = poses[..., 3]
    # Orbit: constant distance `radius` from the origin, constant height
    # radius*sin(pi/5), planar ring radius radius*cos(pi/5).
    np.testing.assert_allclose(np.linalg.norm(centers, axis=-1), radius,
                               atol=1e-6)
    np.testing.assert_allclose(centers[:, 2], radius * np.sin(np.pi / 5),
                               atol=1e-6)
    # Cameras look at the origin: -z axis (forward view dir) toward -center.
    view_dir = -poses[..., 2]
    np.testing.assert_allclose(
        view_dir, -centers / radius, atol=1e-6)
    _assert_orthonormal(poses[..., :3])


def test_spiral_poses_conventions():
    radii = np.array([1.0, 2.0, 0.5])
    poses = vis.create_spiral_poses(radii, focus_depth=4.0, n_poses=12)
    assert poses.shape == (12, 3, 4)
    centers = poses[..., 3]
    # Per-axis envelope set by radii.
    assert np.all(np.abs(centers) <= radii + 1e-6)
    # Every camera looks at (0, 0, -focus_depth).
    to_focus = np.array([0.0, 0.0, -4.0]) - centers
    to_focus /= np.linalg.norm(to_focus, axis=-1, keepdims=True)
    np.testing.assert_allclose(-poses[..., 2], to_focus, atol=1e-6)


def test_gen_render_path_closed_loop():
    key = vis.create_spheric_poses(3.0, n_poses=5)
    k44 = np.concatenate(
        [key, np.broadcast_to(np.eye(4)[3:], (5, 1, 4))], 1)
    out = vis.gen_render_path(k44, n_views=12)
    # 5 segments (incl. wrap-around) x 12//3 steps each.
    assert out.shape == (20, 4, 4)
    # First frame is exactly the first keyframe; path returns toward it.
    np.testing.assert_allclose(out[0], k44[0], atol=1e-6)
    _assert_orthonormal(out[:, :3, :3])


def test_recenter_poses_identity_average():
    poses = _random_pose_cloud()
    out = P.recenter_poses(poses)
    assert out.shape == poses.shape
    np.testing.assert_array_equal(out[..., 4], poses[..., 4])  # hwf kept
    # After recentering, the average camera IS the world frame.
    avg = P.average_pose(out)
    np.testing.assert_allclose(avg[:, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(avg[:, 3], 0.0, atol=1e-6)
    _assert_orthonormal(out[:, :3, :3])


def test_focus_point_least_squares():
    # Cameras all looking exactly at a known point -> focus recovers it.
    target = np.array([0.3, -0.2, 0.6])
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(12, 3)) * 3.0
    fwd = pos - target
    fwd /= np.linalg.norm(fwd, axis=-1, keepdims=True)
    right = np.cross([0.0, 0.0, 1.0], fwd)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    up = np.cross(fwd, right)
    poses = np.stack([right, up, fwd, pos], -1)
    np.testing.assert_allclose(P.focus_point(poses), target, atol=1e-8)


def test_spherify_poses_centers_focus():
    poses = _random_pose_cloud()
    out = P.spherify_poses(poses)
    assert out.shape == poses.shape
    # hwf column comes from the first pose, broadcast.
    np.testing.assert_array_equal(
        out[..., 4], np.broadcast_to(poses[0, :, 4], (len(poses), 3)))
    # The mutual focus point is now the origin, and the average camera
    # offset points along +z (the spherify up-axis convention).
    np.testing.assert_allclose(P.focus_point(out[..., :4]), 0.0, atol=1e-6)
    mean_dir = out[:, :3, 3].mean(0)
    mean_dir /= np.linalg.norm(mean_dir)
    np.testing.assert_allclose(mean_dir, [0.0, 0.0, 1.0], atol=1e-6)
    _assert_orthonormal(out[:, :3, :3])
