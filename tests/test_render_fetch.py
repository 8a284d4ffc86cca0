"""Render output packing: f16 fetch dtype + need_coarse channel selection.

The full-image render casts its outputs to `val.fetch_dtype` (default
float16) inside the jit and drops the coarse rgb when the caller doesn't
need it (eval.py / render_video.py), so the dropped/downcast channels never
cross the device->host link (train/system.py `_pack_outputs`).  These tests
pin (a) the packed path's numerics against a float32 fetch and (b) the
returned key sets/shapes (reference analog of the chunked inference path:
/root/reference/eval.py:49-78)."""

import numpy as np
import pytest

from mipnerf_pl_tpu.train.system import MipNeRFSystem
from tests.helpers import make_blender_scene, tiny_hparams


@pytest.fixture(scope='module')
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp('scene') / 'lego'
    make_blender_scene(str(root), n_frames=2, size=16)
    return str(root)


@pytest.fixture(scope='module')
def systems(scene):
    sys16 = MipNeRFSystem(tiny_hparams())
    sys16.setup(scene, 'blender', prefetch=0)
    sys32 = MipNeRFSystem(tiny_hparams(**{'val.fetch_dtype': 'float32'}))
    sys32.setup(scene, 'blender', prefetch=0)
    state = sys16.init_state()
    return sys16, sys32, state


def test_f16_fetch_matches_f32(systems):
    sys16, sys32, state = systems
    rays, _ = sys16.val_dataset[0]
    out16 = sys16.render_image(state['params'], rays)
    out32 = sys32.render_image(state['params'], rays)
    assert out16['fine_rgb'].dtype == np.float32  # host side is f32 again
    # f16 quantization on [0,1]-ish values: abs error <= 2^-11 * |x| plus
    # subnormal floor — far below any metric-visible level.
    for k in ('coarse_rgb', 'fine_rgb', 'acc'):
        np.testing.assert_allclose(out16[k], out32[k], atol=2e-3)
    np.testing.assert_allclose(out16['distance'], out32['distance'],
                               rtol=1e-3, atol=1e-3)


def test_f16_psnr_unchanged(systems):
    """PSNR computed from the f16-fetched render equals the f32 one to
    reported (0.01 dB) precision."""
    sys16, sys32, state = systems
    rays, gt = sys16.val_dataset[0]
    gt = np.asarray(gt[..., :3])
    p = []
    for s in (sys16, sys32):
        out = s.render_image(state['params'], rays)
        p.append(-10 * np.log10(np.mean((out['fine_rgb'] - gt) ** 2)))
    assert abs(p[0] - p[1]) < 0.01, p


def test_need_coarse_false_drops_channel(systems):
    sys16, _, state = systems
    rays, _ = sys16.val_dataset[0]
    out = sys16.render_image(state['params'], rays, need_coarse=False)
    assert set(out) == {'fine_rgb', 'distance', 'acc'}
    assert out['fine_rgb'].shape == (16, 16, 3)
    assert out['distance'].shape == (16, 16)
    full = sys16.render_image(state['params'], rays, need_coarse=True)
    assert set(full) == {'coarse_rgb', 'fine_rgb', 'distance', 'acc'}
    # Same fine result whether or not coarse is fetched.
    np.testing.assert_array_equal(out['fine_rgb'], full['fine_rgb'])


def test_camera_path_need_coarse(systems):
    sys16, _, state = systems
    cam, (h, w) = sys16.val_dataset.camera(0)
    out = sys16.render_camera(state['params'], cam, h, w, need_coarse=False)
    assert set(out) == {'fine_rgb', 'distance', 'acc'}
    assert out['fine_rgb'].shape == (h, w, 3)
    assert np.all(np.isfinite(out['fine_rgb']))
