"""Tests for the data layer: Blender/Multicam loaders, ray generation,
multi-scale conversion, batch sampling, render paths."""

import numpy as np
import pytest

from mipnerf_pl_tpu.data.convert import convert_to_nerfdata, image_pyramid
from mipnerf_pl_tpu.data.datasets import Blender, Multicam, dataset_dict
from mipnerf_pl_tpu.data.pipeline import TrainBatcher
from mipnerf_pl_tpu.data.render_path import spheric_render_rays
from mipnerf_pl_tpu.rays import Rays, rays_chunks
from tests.helpers import make_blender_scene

SIZE, N_FRAMES = 16, 3


@pytest.fixture(scope='module')
def blender_root(tmp_path_factory):
    return make_blender_scene(str(tmp_path_factory.mktemp('scene')),
                              n_frames=N_FRAMES, size=SIZE)


@pytest.fixture(scope='module')
def multi_root(tmp_path_factory, blender_root):
    out = str(tmp_path_factory.mktemp('multi'))
    convert_to_nerfdata(blender_root, out, n_down=2)
    return out


def test_blender_train_flattened(blender_root):
    ds = Blender(blender_root, split='train')
    assert ds.num_rays == N_FRAMES * SIZE * SIZE
    assert ds.rays.origins.shape == (ds.num_rays, 3)
    assert ds.images.shape == (ds.num_rays, 3)
    # viewdirs unit-norm, radii positive, near/far defaults
    norms = np.linalg.norm(ds.rays.viewdirs, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert np.all(ds.rays.radii > 0)
    assert np.all(ds.rays.near == 2.0) and np.all(ds.rays.far == 6.0)


def test_blender_val_single_image(blender_root):
    ds = Blender(blender_root, split='val', batch_type='single_image')
    rays, img = ds[0]
    assert img.shape == (SIZE, SIZE, 3)
    assert rays.origins.shape == (SIZE, SIZE, 3)
    # Each image's origins are constant (one camera).
    assert np.ptp(rays.origins.reshape(-1, 3), axis=0).max() < 1e-6


def test_blender_white_bkgd(blender_root):
    ds_white = Blender(blender_root, split='val', batch_type='single_image',
                       white_bkgd=True)
    ds_black = Blender(blender_root, split='val', batch_type='single_image',
                       white_bkgd=False)
    _, img_w = ds_white[0]
    _, img_b = ds_black[0]
    # Background pixels (alpha=0): white vs black.
    assert img_w[0, 0].min() > 0.99
    assert img_b[0, 0].max() < 0.01


def test_ray_directions_through_pixel_centers(blender_root):
    """Center pixel's camera ray ~ -z axis of the camera (OpenGL)."""
    ds = Blender(blender_root, split='val', batch_type='single_image')
    rays, _ = ds[0]
    c2w = ds.camtoworlds[0]
    center_dir = rays.directions[SIZE // 2, SIZE // 2]
    # Camera-space dir of the center pixel ~ (+eps, -eps, -1); world = R @ d.
    want = c2w[:3, :3] @ np.array([0.5 / ds.focal, -0.5 / ds.focal, -1.0])
    np.testing.assert_allclose(center_dir, want, atol=1e-5)


def test_image_pyramid_box_filter():
    stack = np.arange(32, dtype=np.float32).reshape(2, 4, 4, 1)
    levels = image_pyramid(stack, 2)
    assert levels[0] is stack
    assert levels[1].shape == (2, 2, 2, 1)
    assert levels[1][0, 0, 0, 0] == (0 + 1 + 4 + 5) / 4
    assert levels[1][1, 0, 0, 0] == (16 + 17 + 20 + 21) / 4


def test_multicam_dataset(multi_root):
    ds = Multicam(multi_root, split='train')
    # 2 scales x N_FRAMES images; rays flattened over all pyramid levels.
    expected = N_FRAMES * (SIZE * SIZE + (SIZE // 2) ** 2)
    assert ds.num_rays == expected
    # lossmult: 1 for full res, 4 for half res.
    assert set(np.unique(ds.rays.lossmult)) == {1.0, 4.0}


def test_multicam_val(multi_root):
    ds = Multicam(multi_root, split='val', batch_type='single_image')
    rays, img = ds[0]
    assert img.shape[0] in (SIZE, SIZE // 2)
    assert rays.origins.shape[:2] == img.shape[:2]


def test_sample_batch_deterministic(blender_root):
    ds = Blender(blender_root, split='train')
    r1, p1 = ds.sample_batch(np.random.default_rng(0), 32)
    r2, p2 = ds.sample_batch(np.random.default_rng(0), 32)
    np.testing.assert_array_equal(r1.origins, r2.origins)
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (32, 3)


def test_train_batcher_prefetch(blender_root):
    ds = Blender(blender_root, split='train')
    batcher = TrainBatcher(ds, batch_size=16, seed=0, prefetch=2)
    try:
        rays, pixels = next(batcher)
        assert rays.origins.shape == (16, 3)
        assert pixels.shape == (16, 3)
        rays2, _ = next(batcher)
        assert not np.allclose(np.asarray(rays.origins),
                               np.asarray(rays2.origins))
    finally:
        batcher.close()


def test_rays_chunks_padding(blender_root):
    ds = Blender(blender_root, split='val', batch_type='single_image')
    rays, _ = ds[0]
    chunks, n_valid = rays_chunks(rays, chunk_size=100)
    assert n_valid == SIZE * SIZE
    assert len(chunks) == (SIZE * SIZE + 99) // 100
    for c in chunks:
        assert c.origins.shape == (100, 3)  # all static shapes


def test_spheric_render_rays():
    all_rays = spheric_render_rays(base_focal=20.0, base_size=(16, 16),
                                   scales=2, n_poses=4)
    assert len(all_rays) == 8
    assert all_rays[0].origins.shape == (16, 16, 3)
    assert all_rays[4].origins.shape == (8, 8, 3)  # scale-major ordering
    for r in all_rays:
        np.testing.assert_allclose(
            np.linalg.norm(r.viewdirs, axis=-1), 1.0, atol=1e-5)


def test_dataset_registry():
    assert set(dataset_dict) == {'blender', 'multi_blender', 'real360'}


def test_sphere_scene_synthesis(tmp_path):
    """Synthetic sphere scenes load through the Blender pipeline and are
    multi-view consistent (center sphere visible from every orbit view)."""
    from mipnerf_pl_tpu.data.synthetic import make_sphere_scene

    root = make_sphere_scene(str(tmp_path / 'spheres'), n_train=3, n_val=1,
                             n_test=1, size=16)
    ds = Blender(root, split='train')
    assert ds.num_rays == 3 * 16 * 16
    # Object pixels exist in every view (alpha was composited onto white).
    imgs = ds.images.reshape(3, 16 * 16, 3)
    for img in imgs:
        assert img.min() < 0.9  # some non-background pixels


def test_hard_scene_synthesis(tmp_path):
    """The 'hard' textured scene loads through the Blender pipeline, is
    multi-view consistent, and carries real high-frequency content (the
    regime IPE / multi-scale training are for)."""
    from mipnerf_pl_tpu.data.synthetic import (make_sphere_scene,
                                               render_hard_view,
                                               render_sphere_view)
    from mipnerf_pl_tpu.utils.vis import create_spheric_poses

    root = make_sphere_scene(str(tmp_path / 'hard'), n_train=3, n_val=1,
                             n_test=1, size=32, scene='hard')
    ds = Blender(root, split='train')
    assert ds.num_rays == 3 * 32 * 32
    imgs = ds.images.reshape(3, 32 * 32, 3)
    for img in imgs:
        assert img.min() < 0.9

    # High-frequency check: mean gradient energy far above the flat-shaded
    # sphere scene's at the same view/resolution.
    c2w = np.eye(4)
    c2w[:3, :4] = create_spheric_poses(4.0, n_poses=6)[1]
    hard = render_hard_view(c2w, 64, supersample=2)[..., :3]
    easy = render_sphere_view(c2w, 64)[..., :3]
    g = lambda im: np.abs(np.diff(im, axis=0)).mean()
    assert g(hard) > 4 * g(easy)

    # Supersampled GT is anti-aliased: a 2x-supersampled render is closer
    # to the heavily-supersampled limit than the aliased 1x render.
    ref = render_hard_view(c2w, 64, supersample=8)[..., :3]
    ss1 = render_hard_view(c2w, 64, supersample=1)[..., :3]
    ss2 = render_hard_view(c2w, 64, supersample=2)[..., :3]
    assert np.abs(ss2 - ref).mean() < np.abs(ss1 - ref).mean()

    # Straight-alpha invariant: compositing onto white then box-downsampling
    # must equal downsampling (render_hard_view's un-premultiplied output)
    # then compositing — i.e. the alpha weighting is not applied twice at
    # silhouette pixels.
    hi = render_hard_view(c2w, 128, supersample=1)
    comp_hi = hi[..., :3] * hi[..., 3:] + (1.0 - hi[..., 3:])
    comp_then_down = comp_hi.reshape(64, 2, 64, 2, 3).mean((1, 3))
    lo = render_hard_view(c2w, 64, supersample=2)
    down_then_comp = lo[..., :3] * lo[..., 3:] + (1.0 - lo[..., 3:])
    np.testing.assert_allclose(down_then_comp, comp_then_down, atol=1e-5)


def test_blender_factor2_downsample(blender_root):
    """factor=2 half-resolution path (cv2 INTER_AREA) keeps ray geometry."""
    ds = Blender(blender_root, split='val', batch_type='single_image',
                 factor=2)
    rays, img = ds[0]
    assert img.shape == (SIZE // 2, SIZE // 2, 3)
    assert rays.origins.shape == (SIZE // 2, SIZE // 2, 3)
    # focal halves with resolution -> viewdirs still unit norm
    np.testing.assert_allclose(np.linalg.norm(rays.viewdirs, axis=-1), 1.0,
                               atol=1e-5)


def test_batcher_surfaces_producer_errors():
    """A failing producer thread must raise in the consumer, not hang."""
    class BadDataset:
        def sample_batch(self, rng, n):
            raise ValueError('boom')

    batcher = TrainBatcher(BadDataset(), batch_size=4, prefetch=1)
    try:
        with pytest.raises(RuntimeError, match='producer thread failed'):
            next(batcher)
    finally:
        batcher.close()
