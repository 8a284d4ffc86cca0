"""Datasets (L3): host-side numpy image loading and ray generation.

Behavioural parity targets (reference file:line):
  * Rays container / BaseDataset   reference datasets/datasets.py:13-83
  * Multicam (multi-scale)         reference datasets/datasets.py:86-168
  * Blender (single-scale)         reference datasets/datasets.py:171-263
  * RealData360 (LLFF/COLMAP)      reference datasets/datasets.py:266-474
    — and unlike the reference, RealData360 is registered in
    `dataset_dict` (upstream leaves it unreachable, SURVEY.md §2 row
    "RealData360").

TPU-first design notes:
  * No torch DataLoader: rays are precomputed once into flat numpy arrays
    (the reference does the same via `_flatten`) and training batches are
    gathered host-side by `sample_batch`, then shipped to the device mesh by
    the prefetching pipeline (`data/pipeline.py`).  One process, zero
    worker-IPC — the TPU input path is host RAM -> device HBM DMA.
  * Batches are sampled with replacement from the flattened ray pool using a
    seeded numpy Generator (the reference shuffles an epoch permutation; at
    64M rays per scene and 3k-ray batches the two are statistically
    indistinguishable, and with-replacement keeps the sampler stateless).
"""

from __future__ import annotations

import json
import os
import struct
from os import path
from typing import List, Optional

import numpy as np
from PIL import Image

from mipnerf_pl_tpu.data.poses import recenter_poses, spherify_poses
from mipnerf_pl_tpu.rays import Rays, namedtuple_map


def _load_image(fname: str) -> np.ndarray:
    with open(fname, 'rb') as f:
        return np.array(Image.open(f), dtype=np.float32) / 255.0


def _alpha_composite(image: np.ndarray, white_bkgd: bool) -> np.ndarray:
    """RGBA -> RGB; optionally composite onto white."""
    if image.shape[-1] == 4:
        if white_bkgd:
            image = image[..., :3] * image[..., -1:] + (1.0 - image[..., -1:])
        else:
            image = image[..., :3] * image[..., -1:]
    return image[..., :3]


def pixel_radii(directions: np.ndarray) -> np.ndarray:
    """Base radius of each pixel's cone from x-neighbor direction distance.

    `dx * 2 / sqrt(12)`: half the neighbor distance widened to the radius of
    a disc with the pixel's footprint variance (reference
    datasets/datasets.py:151-158).
    """
    dx = np.sqrt(np.sum((directions[:-1, :, :] - directions[1:, :, :]) ** 2, -1))
    dx = np.concatenate([dx, dx[-2:-1, :]], 0)
    return (dx * 2 / np.sqrt(12))[..., None].astype(np.float32)


class BaseDataset:
    """Base class: subclasses implement _load_renderings/_generate_rays."""

    def __init__(self, data_dir: str, split: str, white_bkgd: bool = True,
                 batch_type: str = 'all_images', factor: int = 0):
        self.near = 2.0
        self.far = 6.0
        self.split = split
        self.data_dir = data_dir
        self.white_bkgd = white_bkgd
        self.batch_type = batch_type
        self.factor = factor
        self.images: List[np.ndarray] = []
        self.rays: Optional[Rays] = None
        self.n_examples = 1

    # -- split initialization ------------------------------------------------
    def _init_split(self):
        self._load_renderings()
        self._generate_rays()
        if self.split == 'train':
            assert self.batch_type == 'all_images', (
                'training requires batch_type=all_images (flattened rays)')
            self.images = self._flatten(self.images)
            self.rays = namedtuple_map(self._flatten, self.rays)
        else:
            assert self.batch_type == 'single_image', (
                'val/test require batch_type=single_image')

    def _flatten(self, x):
        x = [y.reshape([-1, y.shape[-1]]) for y in x]
        if self.batch_type == 'all_images':
            x = np.concatenate(x, axis=0)
        return x

    def _generate_rays(self):
        raise NotImplementedError

    def _load_renderings(self):
        raise NotImplementedError

    # -- access ---------------------------------------------------------------
    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        rays = Rays(*[getattr(self.rays, k)[index] for k in Rays._fields])
        return rays, self.images[index]

    @property
    def num_rays(self) -> int:
        assert self.split == 'train'
        return self.images.shape[0]

    def camera(self, index):
        """(Camera, (h, w)) for on-device ray generation (ops/camera.py).

        The TPU-native render path: ~100 bytes of pose/intrinsics cross the
        host->device link instead of the ~60 bytes/ray materialized bundle
        (38 MB/frame at 800px).  Subclasses fold their grid/axis conventions
        into `Camera.pix2cam`; parity with the host `_generate_rays` is
        pinned in tests/test_camera.py.
        """
        raise NotImplementedError

    def sample_batch(self, rng: np.random.Generator, batch_size: int):
        """Gather a random ray batch (train split only).

        Uses the native fused multi-field gather (native/gather.cpp) when
        built — one pass over the index vector for all 8 arrays — with a
        numpy fancy-indexing fallback.
        """
        idx = rng.integers(0, self.num_rays, size=(batch_size,))
        from mipnerf_pl_tpu.native.gather import gather_multi
        fields = list(self.rays) + [self.images]
        gathered = gather_multi(fields, idx)
        return Rays(*gathered[:-1]), gathered[-1]


class Multicam(BaseDataset):
    """Multi-scale dataset driven by metadata.json (pix2cam per image).

    Parity: reference datasets/datasets.py:86-168.
    """

    def __init__(self, data_dir, split='train', white_bkgd=True,
                 batch_type='all_images', factor=0):
        # factor accepted for ctor uniformity; multi-scale data carries its
        # own per-image resolutions, so a requested downsample cannot apply.
        if factor:
            import warnings
            warnings.warn(
                f'Multicam ignores data.factor={factor}: multi-scale data '
                'carries per-image resolutions in metadata.json',
                stacklevel=2)
        super().__init__(data_dir, split, white_bkgd, batch_type)
        self._init_split()

    def _load_renderings(self):
        with open(os.path.join(self.data_dir, 'metadata.json'), 'r') as fp:
            self.meta = json.load(fp)[self.split]
        self.meta = {k: np.array(self.meta[k]) for k in self.meta}
        images = []
        for relative_path in self.meta['file_path']:
            image = _load_image(os.path.join(self.data_dir, relative_path))
            images.append(_alpha_composite(image, self.white_bkgd))
        self.images = images
        self.n_examples = len(self.images)

    def _generate_rays(self):
        pix2cam = self.meta['pix2cam'].astype(np.float32)
        cam2world = self.meta['cam2world'].astype(np.float32)
        width = self.meta['width'].astype(np.float32)
        height = self.meta['height'].astype(np.float32)

        def res2grid(w, h):
            return np.meshgrid(
                np.arange(w, dtype=np.float32) + 0.5,   # pixel centers
                np.arange(h, dtype=np.float32) + 0.5,
                indexing='xy')

        xy = [res2grid(w, h) for w, h in zip(width, height)]
        pixel_dirs = [np.stack([x, y, np.ones_like(x)], axis=-1) for x, y in xy]
        camera_dirs = [v @ p2c[:3, :3].T for v, p2c in zip(pixel_dirs, pix2cam)]
        directions = [(v @ c2w[:3, :3].T).copy()
                      for v, c2w in zip(camera_dirs, cam2world)]
        origins = [np.broadcast_to(c2w[:3, -1], v.shape).copy()
                   for v, c2w in zip(directions, cam2world)]
        viewdirs = [v / np.linalg.norm(v, axis=-1, keepdims=True)
                    for v in directions]

        def per_image_scalar(key):
            return [np.broadcast_to(self.meta[key][i],
                                    origins[i][..., :1].shape).astype(np.float32)
                    for i in range(len(self.images))]

        self.rays = Rays(
            origins=origins,
            directions=directions,
            viewdirs=viewdirs,
            radii=[pixel_radii(v) for v in directions],
            lossmult=per_image_scalar('lossmult'),
            near=per_image_scalar('near'),
            far=per_image_scalar('far'))

    def camera(self, index):
        from mipnerf_pl_tpu.ops.camera import Camera, fold_pixel_center
        return Camera(
            c2w=self.meta['cam2world'][index][:3, :4].astype(np.float32),
            pix2cam=fold_pixel_center(self.meta['pix2cam'][index]),
            near=np.float32(self.meta['near'][index]),
            far=np.float32(self.meta['far'][index]),
            lossmult=np.float32(self.meta['lossmult'][index]),
        ), (int(self.meta['height'][index]), int(self.meta['width'][index]))


class Blender(BaseDataset):
    """Single-scale NeRF-synthetic dataset (transforms_{split}.json).

    Parity: reference datasets/datasets.py:171-263 (incl. the factor=2
    half-resolution INTER_AREA downsample path).
    """

    def __init__(self, data_dir, split='train', white_bkgd=True,
                 batch_type='all_images', factor=0):
        super().__init__(data_dir, split, white_bkgd, batch_type, factor)
        self._init_split()

    def _load_renderings(self):
        with open(path.join(self.data_dir,
                            f'transforms_{self.split}.json'), 'r') as fp:
            meta = json.load(fp)
        images, cams = [], []
        for frame in meta['frames']:
            fname = os.path.join(self.data_dir, frame['file_path'] + '.png')
            image = _load_image(fname)
            if self.factor == 2:
                import cv2
                h, w = [hw // 2 for hw in image.shape[:2]]
                image = cv2.resize(image, (w, h), interpolation=cv2.INTER_AREA)
            elif self.factor > 0:
                raise ValueError(
                    f'Blender supports factor 0 or 2, got {self.factor}')
            cams.append(np.array(frame['transform_matrix'], dtype=np.float32))
            images.append(_alpha_composite(image, self.white_bkgd))
        self.images = images
        self.h, self.w = images[0].shape[:2]
        self.camtoworlds = cams
        camera_angle_x = float(meta['camera_angle_x'])
        self.focal = 0.5 * self.w / np.tan(0.5 * camera_angle_x)
        self.n_examples = len(self.images)

    def _generate_rays(self):
        x, y = np.meshgrid(np.arange(self.w, dtype=np.float32),
                           np.arange(self.h, dtype=np.float32), indexing='xy')
        # OpenGL camera: -z forward, +y up; pixel centers at +0.5.
        camera_dirs = np.stack(
            [(x - self.w * 0.5 + 0.5) / self.focal,
             -(y - self.h * 0.5 + 0.5) / self.focal,
             -np.ones_like(x)], axis=-1)
        directions = [(camera_dirs @ c2w[:3, :3].T).copy()
                      for c2w in self.camtoworlds]
        origins = [np.broadcast_to(c2w[:3, -1], v.shape).copy()
                   for v, c2w in zip(directions, self.camtoworlds)]
        viewdirs = [v / np.linalg.norm(v, axis=-1, keepdims=True)
                    for v in directions]

        def const(val):
            return [np.full_like(origins[i][..., :1], val)
                    for i in range(len(self.images))]

        self.rays = Rays(
            origins=origins,
            directions=directions,
            viewdirs=viewdirs,
            radii=[pixel_radii(v) for v in directions],
            lossmult=const(1.0),
            near=const(self.near),
            far=const(self.far))

    def camera(self, index):
        from mipnerf_pl_tpu.ops.camera import Camera, pix2cam_from_focal
        return Camera(
            c2w=np.asarray(self.camtoworlds[index][:3, :4], np.float32),
            pix2cam=pix2cam_from_focal(self.w, self.h, self.focal),
            near=np.float32(self.near), far=np.float32(self.far),
            lossmult=np.float32(1.0),
        ), (self.h, self.w)


class RealData360(BaseDataset):
    """LLFF-style real captures: poses_bounds.npy + COLMAP binary intrinsics.

    Parity: reference datasets/datasets.py:266-474; registered in
    `dataset_dict` (the reference never registers it).
    """

    def __init__(self, data_dir, split='train', white_bkgd=True,
                 batch_type='all_images', factor=4):
        super().__init__(data_dir, split, white_bkgd, batch_type, factor)
        self._init_split()

    def _load_renderings(self):
        suffix = f'_{self.factor}' if self.factor > 0 else ''
        imgdir = path.join(self.data_dir, 'images' + suffix)
        if not path.exists(imgdir):
            raise ValueError(f'Image folder {imgdir} does not exist.')
        imgfiles = [path.join(imgdir, f) for f in sorted(os.listdir(imgdir))
                    if f.lower().endswith(('.jpg', '.png'))]
        images = np.stack([_load_image(f) for f in imgfiles], axis=-1)

        with open(path.join(self.data_dir, 'poses_bounds.npy'), 'rb') as fp:
            poses_arr = np.load(fp)
        poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
        bds = poses_arr[:, -2:].transpose([1, 0])
        if poses.shape[-1] != images.shape[-1]:
            raise RuntimeError(
                f'{images.shape[-1]} images vs {poses.shape[-1]} poses')

        poses[:2, 4, :] = np.array(images.shape[:2]).reshape([2, 1])
        poses[2, 4, :] = poses[2, 4, :] / max(self.factor, 1)
        # LLFF [down right back] -> [right up back] axis fix.
        poses = np.concatenate(
            [poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
        poses = np.moveaxis(poses, -1, 0).astype(np.float32)
        images = np.moveaxis(images, -1, 0)
        bds = np.moveaxis(bds, -1, 0).astype(np.float32)

        poses = recenter_poses(poses)
        poses = spherify_poses(poses)
        i_test = np.arange(images.shape[0])[::8]
        indices = (np.array([i for i in range(images.shape[0]) if i not in i_test])
                   if self.split == 'train' else i_test)
        self.images = list(images[indices])
        poses = poses[indices]
        self.bds = bds[indices]
        self._read_camera()
        self.K[:2, :] /= max(self.factor, 1)
        self.K_inv = np.linalg.inv(self.K)
        self.K_inv[1:, :] *= -1
        self.camtoworlds = poses[:, :3, :4]
        self.h, self.w = self.images[0].shape[:2]
        self.n_examples = len(self.images)

    # COLMAP model_id -> (name, num_params); intrinsics layouts differ.
    _COLMAP_MODELS = {
        0: ('SIMPLE_PINHOLE', 3),   # f, cx, cy
        1: ('PINHOLE', 4),          # fx, fy, cx, cy
        2: ('SIMPLE_RADIAL', 4),    # f, cx, cy, k
        3: ('RADIAL', 5),           # f, cx, cy, k1, k2
        4: ('OPENCV', 8),           # fx, fy, cx, cy, k1, k2, p1, p2
    }

    def _read_camera(self):
        # COLMAP cameras.bin: num_cameras, then per camera
        # (camera_id i32, model_id i32, width u64, height u64, params f64...).
        with open(path.join(self.data_dir, 'sparse', '0', 'cameras.bin'),
                  'rb') as fid:
            struct.unpack('<Q', fid.read(8))
            _, model_id, _, _ = struct.unpack('<iiQQ', fid.read(24))
            if model_id not in self._COLMAP_MODELS:
                raise ValueError(f'unsupported COLMAP camera model id '
                                 f'{model_id}')
            name, n_params = self._COLMAP_MODELS[model_id]
            params = struct.unpack('<' + 'd' * n_params,
                                   fid.read(8 * n_params))
            if name in ('SIMPLE_PINHOLE', 'SIMPLE_RADIAL', 'RADIAL'):
                fx = fy = params[0]
                cx, cy = params[1], params[2]
                distortion = params[3:]
            else:  # PINHOLE / OPENCV
                fx, fy, cx, cy = params[:4]
                distortion = params[4:]
            if any(abs(d) > 1e-12 for d in distortion):
                import warnings
                warnings.warn(
                    f'COLMAP {name} distortion {distortion} ignored — '
                    'undistort images first for accurate rays')
            self.K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])

    def _generate_rays(self):
        x, y = np.meshgrid(np.arange(self.w, dtype=np.float32) + 0.5,
                           np.arange(self.h, dtype=np.float32) + 0.5,
                           indexing='xy')
        pixel_dirs = np.stack([x, y, np.ones_like(x)], axis=-1)
        camera_dirs = pixel_dirs @ self.K_inv.T.astype(np.float32)
        directions = [(camera_dirs @ c2w[:3, :3].T).copy()
                      for c2w in self.camtoworlds]
        origins = [np.broadcast_to(c2w[:3, -1], v.shape).copy()
                   for v, c2w in zip(directions, self.camtoworlds)]
        viewdirs = [v / np.linalg.norm(v, axis=-1, keepdims=True)
                    for v in directions]

        def per_image_scalar(vals):
            return [np.full_like(origins[i][..., :1], vals[i])
                    for i in range(len(self.images))]

        self.rays = Rays(
            origins=origins,
            directions=directions,
            viewdirs=viewdirs,
            radii=[pixel_radii(v) for v in directions],
            lossmult=[np.ones_like(o[..., :1]) for o in origins],
            near=per_image_scalar(self.bds[:, 0]),
            far=per_image_scalar(self.bds[:, 1]))

    def camera(self, index):
        from mipnerf_pl_tpu.ops.camera import Camera, fold_pixel_center
        return Camera(
            c2w=np.asarray(self.camtoworlds[index][:3, :4], np.float32),
            pix2cam=fold_pixel_center(self.K_inv.astype(np.float32)),
            near=np.float32(self.bds[index, 0]),
            far=np.float32(self.bds[index, 1]),
            lossmult=np.float32(1.0),
        ), (self.h, self.w)

dataset_dict = {
    'blender': Blender,
    'multi_blender': Multicam,
    'real360': RealData360,
}
