"""Tests for visualization utilities and the camera visualizer."""

import os

import numpy as np

from mipnerf_pl_tpu.utils import vis
from mipnerf_pl_tpu.utils.visualize_cameras import (get_camera_frustum,
                                                    load_blender_cameras,
                                                    visualize_cameras)
from tests.helpers import make_blender_scene


def test_visualize_depth_range():
    depth = np.linspace(0, 5, 64).reshape(8, 8)
    img = vis.visualize_depth(depth)
    assert img.shape == (8, 8, 3)
    assert img.min() >= 0 and img.max() <= 1


def test_save_images(tmp_path):
    rgb = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    dist = np.random.default_rng(1).uniform(size=(8, 8)).astype(np.float32)
    acc = np.ones((8, 8), np.float32)
    vis.save_images(rgb, dist, acc, str(tmp_path), 3)
    for suffix in ('rgb', 'dist', 'acc'):
        assert os.path.exists(tmp_path / f'00003_{suffix}.png')


def test_spheric_poses_orbit():
    poses = vis.create_spheric_poses(4.0, n_poses=8)
    assert poses.shape == (8, 3, 4)
    # Camera centers lie on a circle (constant distance from the axis).
    centers = poses[:, :, 3]
    dists = np.linalg.norm(centers, axis=-1)
    np.testing.assert_allclose(dists, dists[0], rtol=1e-6)


def test_spiral_poses():
    poses = vis.create_spiral_poses(np.array([1.0, 1.0, 0.5]), 4.0,
                                    n_poses=12)
    assert poses.shape == (12, 3, 4)
    # Rotation columns are orthonormal.
    for p in poses:
        r = p[:, :3]
        np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-6)


def test_gen_render_path():
    poses = vis.create_spheric_poses(4.0, n_poses=4)
    c2ws = np.tile(np.eye(4), (4, 1, 1))
    c2ws[:, :3, :4] = poses
    out = vis.gen_render_path(c2ws, n_views=9)
    assert out.shape[1:] == (4, 4)
    assert len(out) >= 9


def test_stack_rgb():
    img = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    stack = vis.stack_rgb(img, img, img)
    assert stack.shape == (3, 3, 8, 8)


def test_camera_frustum_geometry():
    c2w = np.eye(4)
    points, lines = get_camera_frustum((16, 16), 20.0, c2w, 0.5)
    assert points.shape == (5, 3)
    assert lines.shape == (8, 2)
    np.testing.assert_allclose(points[0], 0.0, atol=1e-9)  # apex at origin
    assert np.all(points[1:, 2] < 0)                        # -z forward


def test_visualize_cameras_writes_png(tmp_path):
    scene = make_blender_scene(str(tmp_path / 's'), n_frames=3, size=8)
    size, focal, c2ws = load_blender_cameras(scene)
    cams = [(size, focal, c2w) for c2w in c2ws]
    out = visualize_cameras([('green', cams)], str(tmp_path / 'cams.png'),
                            spheric_path=True)
    assert os.path.getsize(out) > 1000


def test_export_html_interactive_viewer(tmp_path):
    from mipnerf_pl_tpu.utils.visualize_cameras import export_html
    scene = make_blender_scene(str(tmp_path / 's'), n_frames=3, size=8)
    size, focal, c2ws = load_blender_cameras(scene)
    cams = [(size, focal, c2w) for c2w in c2ws]
    out = export_html([('#4caf50', cams)], str(tmp_path / 'cams.html'),
                      spheric_path=True)
    html = open(out).read()
    assert html.startswith('<!DOCTYPE html>')
    # Embedded segment data: 8 segments per frustum, 3 cams + 120 orbit
    # poses + the wireframe sphere — all self-contained (no external src).
    assert html.count('"#4caf50"') == 3 * 8
    assert html.count('"red"') == 120 * 8
    assert 'src=' not in html
    assert os.path.getsize(out) > 10000


def test_vis_lr_plot(tmp_path):
    from mipnerf_pl_tpu.train.schedule import mip_lr_decay
    fn = mip_lr_decay(5e-4, 5e-6, 10000, 250, 0.01)
    vis.vis_lr(fn, 10000, str(tmp_path / 'lr.png'))
    assert os.path.exists(tmp_path / 'lr.png')
