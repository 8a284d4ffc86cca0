"""Image quality metrics (L5): PSNR, Gaussian-window SSIM, result summaries.

Parity targets (reference file:line):
  * calc_mse / calc_psnr   reference utils/metrics.py:175-188
  * SSIM (window 11, sigma 1.5, zero padding)
                           reference utils/metrics.py:10-126,158-172
  * eval_errors            reference utils/metrics.py:191-197
  * summarize_results      reference utils/metrics.py:129-155 (identical
                           psnrs.txt/ssims.txt artifact format and the paper
                           "average" exp(mean(log([mse, sqrt(1-ssim)])))).

JAX implementation notes: the SSIM filter is a depthwise 2-D convolution
(feature_group_count=C) with explicit zero padding of (k-1)//2, exactly
matching torch.nn.functional.conv2d semantics used by the reference.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def calc_mse(x, y):
    return jnp.mean((x - y) ** 2)


def calc_psnr(x, y):
    return -10.0 * jnp.log10(calc_mse(x, y))


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    xs = np.arange(ksize, dtype=np.float64)
    g = np.exp(-((xs - ksize // 2) ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_kernel2d(ksize: int, sigma: float) -> np.ndarray:
    k1 = _gaussian_kernel1d(ksize, sigma)
    return np.outer(k1, k1)


def _filter2d(img, kernel):
    """Depthwise zero-padded conv, NCHW, torch.conv2d(groups=C) semantics."""
    c = img.shape[1]
    pad = (kernel.shape[0] - 1) // 2
    # kernel [kh, kw] -> [C, 1, kh, kw] for feature_group_count=C.
    k = jnp.broadcast_to(jnp.asarray(kernel), (c, 1, *kernel.shape))
    return jax.lax.conv_general_dilated(
        img, k,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def ssim_map(img1, img2, window_size: int = 11, max_val: float = 1.0,
             sigma: float = 1.5):
    """Per-pixel SSIM map for NCHW float images in [0, max_val]."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kernel = _gaussian_kernel2d(window_size, sigma)

    mu1 = _filter2d(img1, kernel)
    mu2 = _filter2d(img2, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, kernel) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, kernel) - mu2_sq
    sigma12 = _filter2d(img1 * img2, kernel) - mu1_mu2

    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / \
           ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


def ssim(img1, img2, window_size: int = 11, reduction: str = 'none',
         max_val: float = 1.0):
    """SSIM between NCHW images (reduction: none | mean | sum)."""
    loss = ssim_map(img1, img2, window_size, max_val)
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    return loss


def eval_errors(pred_color, batch_pixels):
    """(PSNR, SSIM-mean) for NHWC (or NCHW) image batches."""
    psnr_val = calc_psnr(pred_color, batch_pixels)
    if pred_color.shape[-1] == 3 and batch_pixels.shape[-1] == 3:
        pred_color = jnp.transpose(pred_color, (0, 3, 1, 2))
        batch_pixels = jnp.transpose(batch_pixels, (0, 3, 1, 2))
    ssim_val = ssim(pred_color, batch_pixels, window_size=11, reduction='mean')
    return psnr_val, ssim_val


def summarize_results(folder: str, scene_names, num_buckets: int) -> str:
    """Aggregate psnrs.txt/ssims.txt across scenes into the README-style
    'PSNR | SSIM | Average' line.

    Output contract (reference utils/metrics.py:129-155): per-scale PSNR
    means, then per-scale SSIM means, then the mip-NeRF paper's "average"
    metric — the geometric mean of the mean MSE (from PSNR) and the mean
    sqrt(1 - SSIM) — all at 4 decimals, ' | '-separated.
    """
    def per_scale_means(metric: str) -> np.ndarray:
        rows = []
        for scene in scene_names:
            path = os.path.join(folder, 'test', scene, f'{metric}.txt')
            vals = np.atleast_1d(np.loadtxt(path))
            rows.append(vals.reshape(-1, num_buckets).mean(axis=0))
        return np.mean(rows, axis=0)

    psnr = per_scale_means('psnrs')
    ssim_v = per_scale_means('ssims')

    mse = 10.0 ** (-psnr.mean() / 10.0)
    dssim = np.sqrt(1.0 - ssim_v.mean())
    overall = np.sqrt(mse * dssim)   # exp(mean(log([mse, dssim])))

    fmt = lambda row: ' '.join(f'{x:0.4f}' for x in row)
    return ' | '.join([fmt(psnr), fmt(ssim_v), f'{overall:0.4f}'])
