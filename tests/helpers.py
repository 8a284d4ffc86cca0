"""Shared test fixtures: tiny synthetic Blender scenes on disk."""

import json
import os

import numpy as np
from PIL import Image


def make_blender_scene(root: str, n_frames: int = 3, size: int = 16,
                       splits=('train', 'val', 'test'), seed: int = 0):
    """Write a minimal NeRF-synthetic-format scene: RGBA PNGs with a centered
    disk, plus transforms_{split}.json with orbit poses."""
    from mipnerf_pl_tpu.utils.vis import create_spheric_poses

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    camera_angle_x = 0.6911112070083618

    for split in splits:
        poses = create_spheric_poses(4.0, n_poses=n_frames)
        frames = []
        img_dir = os.path.join(root, split)
        os.makedirs(img_dir, exist_ok=True)
        for i in range(n_frames):
            yy, xx = np.mgrid[0:size, 0:size]
            r2 = (xx - size / 2) ** 2 + (yy - size / 2) ** 2
            disk = (r2 < (size / 4) ** 2).astype(np.float32)
            rgba = np.zeros((size, size, 4), np.float32)
            color = rng.uniform(0.3, 0.9, size=3)
            rgba[..., :3] = disk[..., None] * color
            rgba[..., 3] = disk
            Image.fromarray((rgba * 255).astype(np.uint8)).save(
                os.path.join(img_dir, f'r_{i}.png'))
            pose44 = np.eye(4, dtype=np.float64)
            pose44[:3, :4] = poses[i]
            frames.append({'file_path': f'{split}/r_{i}',
                           'transform_matrix': pose44.tolist()})
        with open(os.path.join(root, f'transforms_{split}.json'), 'w') as f:
            json.dump({'camera_angle_x': camera_angle_x, 'frames': frames}, f)
    return root


def tiny_hparams(**overrides):
    """Small-model hparams for fast CPU tests (full dotted-key schema)."""
    import yaml
    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'configs', 'default.yaml')
    from mipnerf_pl_tpu.config import load
    hp = load(cfg_path)
    hp.update({
        'exp_name': 'test',
        'train.batch_size': 64,
        'nerf.num_samples': 8,
        'nerf.max_deg_point': 4,
        'nerf.deg_view': 2,
        'nerf.mlp.net_depth': 2,
        'nerf.mlp.net_width': 16,
        'nerf.mlp.net_width_condition': 8,
        'val.chunk_size': 128,
        'val.sample_num': 1,
        'val.check_interval': 50,
        'optimizer.max_steps': 100,
        'optimizer.lr_delay_steps': 0,
    })
    hp.update(overrides)
    return hp


def random_rays(batch_size: int = 16, seed: int = 0):
    from mipnerf_pl_tpu.rays import Rays
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(batch_size, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((batch_size, 1), np.float32)
    return Rays(
        origins=rng.normal(size=(batch_size, 3)).astype(np.float32),
        directions=d,
        viewdirs=d,
        radii=ones * 0.01,
        lossmult=ones,
        near=ones * 2.0,
        far=ones * 6.0)
