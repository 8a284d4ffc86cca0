"""Tests for the RealData360 (LLFF/COLMAP) loader on a synthetic capture."""

import os
import struct

import numpy as np
import pytest

from mipnerf_pl_tpu.data.datasets import RealData360


def make_llff_capture(root: str, n_images: int = 10, size: int = 8,
                      model_id: int = 1, params=None):
    """Synthetic LLFF-style capture: images_1/, poses_bounds.npy, and a
    COLMAP sparse/0/cameras.bin with the given camera model."""
    from PIL import Image

    from mipnerf_pl_tpu.utils.vis import create_spheric_poses

    os.makedirs(os.path.join(root, 'images_1'), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_images):
        img = (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, 'images_1', f'{i:03d}.png'))

    # poses_bounds: [N, 17] = 3x5 pose (rot|trans|hwf) + near/far.
    poses = create_spheric_poses(4.0, n_poses=n_images)
    rows = []
    focal = 10.0
    for p in poses:
        hwf = np.array([size, size, focal]).reshape(3, 1)
        # LLFF convention stores [down, right, back]: invert the loader's
        # [r1, -r0, rest] shuffle so round-trip lands on `poses`.
        m = np.concatenate([p, hwf], axis=1)          # [3, 5]
        llff = np.concatenate([-m[:, 1:2], m[:, 0:1], m[:, 2:]], axis=1)
        rows.append(np.concatenate([llff.reshape(-1), [2.0, 6.0]]))
    np.save(os.path.join(root, 'poses_bounds.npy'), np.stack(rows))

    os.makedirs(os.path.join(root, 'sparse', '0'), exist_ok=True)
    if params is None:
        params = [focal, focal, size / 2, size / 2]   # PINHOLE
    with open(os.path.join(root, 'sparse', '0', 'cameras.bin'), 'wb') as f:
        f.write(struct.pack('<Q', 1))
        f.write(struct.pack('<iiQQ', 1, model_id, size, size))
        f.write(struct.pack('<' + 'd' * len(params), *params))
    return root


def test_real360_loads_and_generates_rays(tmp_path):
    root = make_llff_capture(str(tmp_path / 'cap'))
    ds = RealData360(root, split='train', batch_type='all_images', factor=1)
    # 10 images, every 8th held out for test -> 8 train images.
    assert ds.num_rays == 8 * 8 * 8
    assert np.all(np.isfinite(ds.rays.origins))
    norms = np.linalg.norm(ds.rays.viewdirs, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert np.all(ds.rays.radii > 0)

    test_ds = RealData360(root, split='test', batch_type='single_image',
                          factor=1)
    rays, img = test_ds[0]
    assert img.shape == (8, 8, 3)
    assert rays.origins.shape == (8, 8, 3)


def test_real360_simple_radial_camera(tmp_path):
    """SIMPLE_RADIAL (f, cx, cy, k) must parse f into both fx and fy —
    regression for the blind PINHOLE unpack."""
    root = make_llff_capture(str(tmp_path / 'cap'), model_id=2,
                             params=[10.0, 4.0, 4.0, 0.0])
    ds = RealData360(root, split='train', batch_type='all_images', factor=1)
    # K was [[f,0,cx],[0,f,cy],[0,0,1]] before the factor division.
    assert ds.K[0, 0] == ds.K[1, 1]
    assert np.all(np.isfinite(ds.rays.directions))


def test_real360_radial_distortion_warns(tmp_path):
    root = make_llff_capture(str(tmp_path / 'cap'), model_id=2,
                             params=[10.0, 4.0, 4.0, 0.1])
    with pytest.warns(UserWarning, match='distortion'):
        RealData360(root, split='train', batch_type='all_images', factor=1)


def test_real360_unknown_model_raises(tmp_path):
    root = make_llff_capture(str(tmp_path / 'cap'), model_id=9,
                             params=[10.0, 4.0, 4.0, 0.0])
    with pytest.raises(ValueError, match='unsupported COLMAP'):
        RealData360(root, split='train', batch_type='all_images', factor=1)


def test_real360_trains_unbounded(tmp_path):
    """End-to-end: the real360 loader feeds the unbounded model."""
    import jax

    from mipnerf_pl_tpu.train.system import MipNeRFSystem
    from tests.helpers import tiny_hparams

    root = make_llff_capture(str(tmp_path / 'cap'))
    hp = tiny_hparams()
    hp.update({'nerf.unbounded': True, 'train.white_bkgd': False,
               'val.white_bkgd': False, 'data.factor': 1,
               'loss.disable_multiscale_loss': True})
    system = MipNeRFSystem(hp)
    system.setup(root, 'real360', prefetch=0)
    state = system.init_state()
    rays, pixels = next(system.batcher)
    state, aux = system.train_step(state, rays, pixels, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux['loss']))


def test_llff_sphere_capture_roundtrip(tmp_path):
    """The synthetic LLFF capture (data/synthetic.py) loads through
    RealData360 with finite geometry and non-trivial image content."""
    from mipnerf_pl_tpu.data.synthetic import make_llff_sphere_capture

    root = make_llff_sphere_capture(str(tmp_path / 'cap'), n_images=9,
                                    size=16, scene='spheres')
    ds = RealData360(root, split='train', batch_type='all_images', factor=1)
    assert np.all(np.isfinite(ds.rays.origins))
    np.testing.assert_allclose(
        np.linalg.norm(ds.rays.viewdirs, axis=-1), 1.0, atol=1e-5)
    imgs = ds.images.reshape(-1, 3)
    assert imgs.max() > 0.2           # spheres rendered, not blank
    assert imgs.min() < 0.1           # black background kept
