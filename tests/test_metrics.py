"""Tests for PSNR / SSIM / summarize_results (L5)."""

import numpy as np
import pytest

from mipnerf_pl_tpu.utils.metrics import (calc_psnr, eval_errors, ssim,
                                          summarize_results)


def test_psnr_known_value():
    x = np.zeros((4, 4, 3), np.float32)
    y = np.full((4, 4, 3), 0.1, np.float32)
    psnr = float(calc_psnr(x, y))
    assert abs(psnr - (-10 * np.log10(0.01))) < 1e-4   # = 20 dB


def test_psnr_identical_images_is_inf():
    x = np.random.default_rng(0).uniform(size=(4, 4, 3)).astype(np.float32)
    assert float(calc_psnr(x, x)) == np.inf


def test_ssim_identical_images():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 3, 32, 32)).astype(np.float32)
    val = float(ssim(img, img, window_size=11, reduction='mean'))
    assert abs(val - 1.0) < 1e-5


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(2)
    img = rng.uniform(0.3, 0.7, size=(1, 3, 32, 32)).astype(np.float32)
    small = img + rng.normal(scale=0.01, size=img.shape).astype(np.float32)
    large = img + rng.normal(scale=0.2, size=img.shape).astype(np.float32)
    s_small = float(ssim(img, small, 11, 'mean'))
    s_large = float(ssim(img, large, 11, 'mean'))
    assert s_small > s_large
    assert 0 < s_large < s_small < 1.0 + 1e-6


def test_ssim_matches_scipy_golden():
    """Zero-padded Gaussian-window SSIM vs an independent numpy/scipy
    implementation of the same definition (the torch-geometry variant the
    reference vendors, utils/metrics.py:44-126)."""
    from scipy.ndimage import convolve

    rng = np.random.default_rng(3)
    img1 = rng.uniform(size=(1, 1, 16, 16)).astype(np.float64)
    img2 = rng.uniform(size=(1, 1, 16, 16)).astype(np.float64)

    ks, sigma = 11, 1.5
    xs = np.arange(ks) - ks // 2
    g1 = np.exp(-xs ** 2 / (2 * sigma ** 2)); g1 /= g1.sum()
    kern = np.outer(g1, g1)
    filt = lambda im: convolve(im[0, 0], kern, mode='constant', cval=0.0)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = filt(img1), filt(img2)
    s1 = filt(img1 * img1) - mu1 ** 2
    s2 = filt(img2 * img2) - mu2 ** 2
    s12 = filt(img1 * img2) - mu1 * mu2
    want = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / \
           ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))

    got = np.asarray(ssim(img1.astype(np.float32), img2.astype(np.float32),
                          11, 'none'))[0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_eval_errors_nhwc():
    rng = np.random.default_rng(4)
    a = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
    b = a + rng.normal(scale=0.05, size=a.shape).astype(np.float32)
    psnr, s = eval_errors(a, b)
    assert 15 < float(psnr) < 40
    assert 0.5 < float(s) <= 1.0


def test_summarize_results_format(tmp_path):
    scene_dir = tmp_path / 'test' / 'lego'
    scene_dir.mkdir(parents=True)
    # 4 images at 2 scales: [s0 s1 s0 s1]
    (scene_dir / 'psnrs.txt').write_text('30.0 32.0 34.0 36.0')
    (scene_dir / 'ssims.txt').write_text('0.90 0.92 0.94 0.96')
    out = summarize_results(str(tmp_path), ['lego'], 2)
    parts = out.split(' | ')
    assert len(parts) == 3
    psnrs = [float(v) for v in parts[0].split(' ')]
    assert psnrs == [32.0, 34.0]      # per-scale means
    ssims = [float(v) for v in parts[1].split(' ')]
    assert ssims == [0.92, 0.94]
    # paper average = exp(mean(log([mse, sqrt(1-ssim)]))) of scale-means
    psnr_m, ssim_m = 33.0, 0.93
    mse = np.exp(-0.1 * np.log(10) * psnr_m)
    dssim = np.sqrt(1 - ssim_m)
    want = np.exp(np.mean(np.log([mse, dssim])))
    assert abs(float(parts[2]) - want) < 1e-4
