"""Tests for the native C++ fused batch gather."""

import time

import numpy as np
import pytest

from mipnerf_pl_tpu.native.gather import gather_multi, native_available


def _arrays(n_rows=10000, seed=0):
    rng = np.random.default_rng(seed)
    widths = [3, 3, 3, 1, 1, 1, 1, 3]
    return [rng.normal(size=(n_rows, w)).astype(np.float32) for w in widths]


def test_native_builds():
    assert native_available(), 'g++ build of libgather.so failed'


def test_gather_multi_matches_numpy():
    arrays = _arrays()
    rng = np.random.default_rng(1)
    idx = rng.integers(0, arrays[0].shape[0], size=4096)
    got = gather_multi(arrays, idx)
    for g, a in zip(got, arrays):
        np.testing.assert_array_equal(g, a[idx])


def test_gather_multi_noncontiguous_falls_back():
    arrays = _arrays()
    arrays[0] = np.asfortranarray(arrays[0])  # not C-contiguous
    idx = np.arange(16)
    got = gather_multi(arrays, idx)
    for g, a in zip(got, arrays):
        np.testing.assert_array_equal(g, np.ascontiguousarray(a)[idx])


def test_gather_multi_duplicate_and_boundary_indices():
    arrays = _arrays(n_rows=100)
    idx = np.array([0, 99, 0, 50, 99, 99], dtype=np.int64)
    got = gather_multi(arrays, idx)
    for g, a in zip(got, arrays):
        np.testing.assert_array_equal(g, a[idx])


def test_dataset_sample_batch_uses_gather(tmp_path):
    from mipnerf_pl_tpu.data.datasets import Blender
    from tests.helpers import make_blender_scene

    scene = make_blender_scene(str(tmp_path / 's'), n_frames=2, size=8)
    ds = Blender(scene, split='train')
    rays, pixels = ds.sample_batch(np.random.default_rng(0), 32)
    assert rays.origins.shape == (32, 3)
    assert pixels.shape == (32, 3)
    # Determinism preserved through the native path.
    rays2, pixels2 = ds.sample_batch(np.random.default_rng(0), 32)
    np.testing.assert_array_equal(np.asarray(rays.origins),
                                  np.asarray(rays2.origins))
