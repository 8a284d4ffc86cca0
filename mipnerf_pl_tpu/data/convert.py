"""Multi-scale dataset generator (offline tool).

Produces the multi-scale NeRF layout consumed by `Multicam`
(data contract: reference datasets/convert_blender_data.py:40-117): a
2x box-filter image pyramid per source image plus one `metadata.json`
with per-entry camera intrinsics as `pix2cam` matrices.

Contract kept exactly (the dataset and eval bucketing depend on it):
  * metadata.json keys per split: file_path, cam2world, width, height,
    focal, label, near, far, lossmult, pix2cam;
  * entry order is image-major, scale-minor (eval.py groups every
    `--scale` consecutive entries into one resolution bucket);
  * lossmult = 4^level, focal halves per level, near/far = 2/6.

Implementation is this framework's own: the pyramid is computed
vectorized over the whole image stack of a split at once, and pix2cam is
obtained by building the forward camera->pixel matrix for the Blender
camera convention and inverting it with numpy, rather than hand-writing
the inverse entries.
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

NEAR, FAR = 2.0, 6.0
SPLITS = ('train', 'val', 'test')


def load_renderings(data_dir: str, split: str) -> dict:
    """One split of a Blender scene as stacked arrays.

    Returns {'images': [N, H, W, C] float32 in [0, 1],
             'camtoworlds': [N, 4, 4], 'focal': float}.
    """
    with open(os.path.join(data_dir, f'transforms_{split}.json'), 'r') as fp:
        meta = json.load(fp)
    frames = meta['frames']
    images = np.stack([
        np.asarray(Image.open(os.path.join(data_dir,
                                           fr['file_path'] + '.png')),
                   dtype=np.float32) / 255.0
        for fr in frames])
    camtoworlds = np.stack([np.asarray(fr['transform_matrix'], np.float64)
                            for fr in frames])
    width = images.shape[2]
    focal = 0.5 * width / np.tan(0.5 * float(meta['camera_angle_x']))
    return {'images': images, 'camtoworlds': camtoworlds, 'focal': focal}


def image_pyramid(stack: np.ndarray, n_levels: int) -> list:
    """2x box-filter pyramid, vectorized over the whole [N, H, W, C] stack.

    Level 0 is the input; each subsequent level averages 2x2 blocks.
    """
    levels = [stack]
    for _ in range(n_levels - 1):
        n, h, w, c = levels[-1].shape
        levels.append(levels[-1]
                      .reshape(n, h // 2, 2, w // 2, 2, c)
                      .mean(axis=(2, 4)))
    return levels


def pix2cam_matrix(focal: float, width: int, height: int) -> np.ndarray:
    """Inverse intrinsics for the Blender camera convention.

    The forward map takes a camera-space direction (x right, y up,
    looking down -z) to homogeneous pixel coordinates with y growing
    downward; pix2cam is its matrix inverse, applied to pixel-center
    coordinates (u + 0.5, v + 0.5, 1) by the ray generators.
    """
    cam2pix = np.array([
        [focal, 0.0, -0.5 * width],
        [0.0, -focal, -0.5 * height],
        [0.0, 0.0, -1.0],
    ])
    return np.linalg.inv(cam2pix)


def convert_to_nerfdata(basedir: str, newdir: str, n_down: int) -> None:
    """Convert one Blender scene into the multi-scale layout."""
    os.makedirs(newdir, exist_ok=True)
    metadata = {}
    for split in SPLITS:
        data = load_renderings(basedir, split)
        imgdir = f'images_{split}'
        os.makedirs(os.path.join(newdir, imgdir), exist_ok=True)

        pyramid = image_pyramid(data['images'], n_down)
        entries = []
        for i in range(len(data['images'])):
            for level, stack in enumerate(pyramid):
                img = stack[i]
                fname = f'{imgdir}/{i:03d}_d{level}.png'
                Image.fromarray(
                    (img * 255.0).astype(np.uint8)).save(
                        os.path.join(newdir, fname))
                height, width = img.shape[:2]
                focal = data['focal'] / 2.0 ** level
                entries.append({
                    'file_path': fname,
                    'cam2world': data['camtoworlds'][i].tolist(),
                    'width': width,
                    'height': height,
                    'focal': focal,
                    'label': level,
                    'near': NEAR,
                    'far': FAR,
                    'lossmult': 4.0 ** level,
                    'pix2cam': pix2cam_matrix(focal, width, height).tolist(),
                })

        # Columnar layout (lists per key), as the Multicam loader expects.
        metadata[split] = {k: [e[k] for e in entries] for k in entries[0]}

    with open(os.path.join(newdir, 'metadata.json'), 'w') as fp:
        json.dump(metadata, fp, indent=4)
