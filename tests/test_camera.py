"""On-device camera ray generation (ops/camera.py) parity tests.

Every dataset's `camera(i)` + `camera_rays` must reproduce the host
`_generate_rays` numpy path (up to f32 re-association), and the system's
`render_camera` must match `render_image` on the same weights — the camera
path replaces the materialized-ray transfer in val/eval/render_video
(reference analog of what it replaces: datasets/datasets.py:130-263 ray
materialization + eval.py:49-78 per-chunk shipping).
"""

import numpy as np
import pytest

from mipnerf_pl_tpu.data.convert import convert_to_nerfdata
from mipnerf_pl_tpu.data.datasets import Blender, Multicam, RealData360
from mipnerf_pl_tpu.ops.camera import camera_rays
from tests.helpers import make_blender_scene, tiny_hparams
from tests.test_real360 import make_llff_capture

SIZE, N_FRAMES = 16, 3


@pytest.fixture(scope='module')
def blender_root(tmp_path_factory):
    return make_blender_scene(str(tmp_path_factory.mktemp('cam_scene')),
                              n_frames=N_FRAMES, size=SIZE)


@pytest.fixture(scope='module')
def multi_root(tmp_path_factory, blender_root):
    out = str(tmp_path_factory.mktemp('cam_multi'))
    convert_to_nerfdata(blender_root, out, n_down=2)
    return out


def assert_rays_match(dev_rays, host_rays, atol=2e-5):
    for field in dev_rays._fields:
        a = np.asarray(getattr(dev_rays, field))
        b = np.asarray(getattr(host_rays, field))
        assert a.shape == b.shape, (field, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=atol, rtol=1e-5,
                                   err_msg=field)


def test_blender_camera_parity(blender_root):
    ds = Blender(blender_root, split='val', batch_type='single_image')
    for i in range(len(ds)):
        cam, (h, w) = ds.camera(i)
        host, _ = ds[i]
        assert_rays_match(camera_rays(cam, h, w), host)


def test_multicam_camera_parity(multi_root):
    ds = Multicam(multi_root, split='val', batch_type='single_image')
    for i in range(len(ds)):
        cam, (h, w) = ds.camera(i)
        host, _ = ds[i]
        assert_rays_match(camera_rays(cam, h, w), host)


def test_real360_camera_parity(tmp_path):
    root = make_llff_capture(str(tmp_path / 'cap'))
    ds = RealData360(root, split='test', batch_type='single_image', factor=1)
    for i in range(len(ds)):
        cam, (h, w) = ds.camera(i)
        host, _ = ds[i]
        assert_rays_match(camera_rays(cam, h, w), host)


def test_render_path_camera_parity():
    from mipnerf_pl_tpu.data.render_path import (spheric_render_cameras,
                                                 spheric_render_rays)
    host = spheric_render_rays(10.0, (8, 8), scales=2, n_poses=3)
    cams = spheric_render_cameras(10.0, (8, 8), scales=2, n_poses=3)
    assert len(host) == len(cams)
    for host_rays, (cam, (h, w)) in zip(host, cams):
        assert_rays_match(camera_rays(cam, h, w), host_rays)


def test_render_camera_matches_render_image(blender_root):
    """The fused camera->rays->chunks->model render must reproduce the
    materialized-rays render (same params/key; val.randomized=False)."""
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hp = tiny_hparams()
    hp['val.chunk_size'] = 64   # 16x16 = 4 chunks, no padding
    system = MipNeRFSystem(hp)
    state = system.init_state()
    ds = Blender(blender_root, split='val', batch_type='single_image')
    rays, _ = ds[0]
    cam, (h, w) = ds.camera(0)
    out_rays = system.render_image(state['params'], rays)
    out_cam = system.render_camera(state['params'], cam, h, w)
    for k in out_rays:
        # atol 1e-3: host- and device-generated rays differ at float
        # rounding level (~1e-7 in directions), which the deg-16 encode
        # amplifies ~2^16x into the sin args; the eval model's fused
        # in-kernel decode adds its own ~1e-6 (kernels/mlp.py
        # _fast_exp/_fast_sin).  1e-3 on [0, 1] rgb is still sub-visible.
        np.testing.assert_allclose(out_cam[k], out_rays[k], atol=1e-3,
                                   err_msg=k)


def test_render_camera_padding(blender_root):
    """Chunk size that does not divide h*w: padded tail must be sliced away
    and the valid region must match the unpadded render."""
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hp = tiny_hparams()
    hp['val.chunk_size'] = 96   # 256 = 2*96 + 64 -> 3 chunks, pad 32
    system = MipNeRFSystem(hp)
    state = system.init_state()
    ds = Blender(blender_root, split='val', batch_type='single_image')
    cam, (h, w) = ds.camera(0)
    out_pad = system.render_camera(state['params'], cam, h, w)
    out_exact = system.render_camera(state['params'], cam, h, w,
                                     chunk_size=64)
    # Different chunking => different per-chunk fold_in keys; with
    # val.randomized=False the outputs must still agree.
    for k in out_pad:
        np.testing.assert_allclose(out_pad[k], out_exact[k], atol=2e-4,
                                   err_msg=k)
    assert out_pad['fine_rgb'].shape == (h, w, 3)


def test_validate_uses_camera_path(blender_root, monkeypatch):
    """validate() must route through render_camera when the dataset
    provides cameras (and the metrics must stay finite)."""
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hp = tiny_hparams()
    system = MipNeRFSystem(hp)
    system.setup(blender_root, 'blender', prefetch=0)
    state = system.init_state()
    calls = {'camera': 0}
    orig = MipNeRFSystem.render_camera

    def spy(self, *a, **kw):
        calls['camera'] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(MipNeRFSystem, 'render_camera', spy)
    loss, psnr = system.validate(state, num_images=1)
    assert calls['camera'] == 1
    assert np.isfinite(loss) and np.isfinite(psnr)
