"""Multi-scale dataset generator (offline tool).

Parity: reference datasets/convert_blender_data.py:10-117 — box-downsample
each Blender image `n_down` times, write the pyramid plus a metadata.json
holding per-image pix2cam/cam2world/width/height/lossmult(=4^j)/near/far.
"""

from __future__ import annotations

import json
import os
from os import path

import numpy as np
from PIL import Image


def load_renderings(data_dir: str, split: str) -> dict:
    """Load images + cameras for one split of a Blender scene."""
    with open(path.join(data_dir, f'transforms_{split}.json'), 'r') as fp:
        meta = json.load(fp)
    images, cams = [], []
    for frame in meta['frames']:
        fname = os.path.join(data_dir, frame['file_path'] + '.png')
        with open(fname, 'rb') as imgin:
            images.append(np.array(Image.open(imgin), dtype=np.float32) / 255.0)
        cams.append(frame['transform_matrix'])
    ret = {
        'images': np.stack(images, axis=0),
        'camtoworlds': np.stack(cams, axis=0),
    }
    w = ret['images'].shape[2]
    camera_angle_x = float(meta['camera_angle_x'])
    ret['focal'] = 0.5 * w / np.tan(0.5 * camera_angle_x)
    return ret


def down2(img: np.ndarray) -> np.ndarray:
    """2x box downsample."""
    sh = img.shape
    return np.mean(np.reshape(img, [sh[0] // 2, 2, sh[1] // 2, 2, -1]), (1, 3))


def convert_to_nerfdata(basedir: str, newdir: str, n_down: int) -> None:
    """Convert one Blender scene into the multi-scale layout."""
    os.makedirs(newdir, exist_ok=True)
    bigmeta = {}
    for split in ('train', 'val', 'test'):
        data = load_renderings(basedir, split)
        imgdir = f'images_{split}'
        os.makedirs(os.path.join(newdir, imgdir), exist_ok=True)

        meta = {k: [] for k in ('file_path', 'cam2world', 'width', 'height',
                                'focal', 'label', 'near', 'far', 'lossmult')}
        f = data['focal']
        for i, img in enumerate(data['images']):
            for j in range(n_down):
                fname = f'{imgdir}/{i:03d}_d{j}.png'
                meta['file_path'].append(fname)
                with open(os.path.join(newdir, fname), 'wb') as imgout:
                    Image.fromarray(np.uint8(img * 255)).save(imgout)
                meta['width'].append(img.shape[1])
                meta['height'].append(img.shape[0])
                meta['focal'].append(f / 2 ** j)
                meta['cam2world'].append(data['camtoworlds'][i].tolist())
                meta['lossmult'].append(4.0 ** j)
                meta['label'].append(j)
                meta['near'].append(2.0)
                meta['far'].append(6.0)
                img = down2(img)

        fx = np.array(meta['focal'])
        fy = np.array(meta['focal'])
        cx = np.array(meta['width']) * 0.5
        cy = np.array(meta['height']) * 0.5
        arr0 = np.zeros_like(cx)
        arr1 = np.ones_like(cx)
        k_inv = np.array([
            [arr1 / fx, arr0, -cx / fx],
            [arr0, -arr1 / fy, cy / fy],
            [arr0, arr0, -arr1],
        ])
        meta['pix2cam'] = np.moveaxis(k_inv, -1, 0).tolist()
        bigmeta[split] = meta

    with open(os.path.join(newdir, 'metadata.json'), 'w') as f:
        json.dump(bigmeta, f, ensure_ascii=False, indent=4)
