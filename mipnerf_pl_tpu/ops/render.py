"""Volumetric rendering and regularizers (L0).

Behavioural parity targets (reference file:line):
  * volumetric_rendering  reference models/mip.py:366-401
  * distloss              reference models/mip.py:8-20

TPU-first design notes:
  * Transmittance uses an exclusive cumsum expressed as
    cumsum - self (no concatenation of a zeros column), which XLA maps to a
    single scan fused with the exp/alpha elementwise chain.
  * Kept in float32: compositing and the CDF math are precision-critical
    (SURVEY.md §7 "hard parts") — the MLP may run bf16 but rendering does not.
"""

from __future__ import annotations

import jax.numpy as jnp

from mipnerf_pl_tpu.ops.fastmath import cumsum_mxu


def volumetric_rendering(rgb, density, t_samples, dirs, white_bkgd: bool):
    """Composite per-sample (rgb, density) along each ray.

    Parity: reference models/mip.py:366-401 (incl. the nan-safe distance
    clamp to [t_near_sample, t_far_sample] and the white-background blend).

    Args:
      rgb: [B, N, 3]; density: [B, N, 1]; t_samples: [B, N+1]; dirs: [B, 3].
      white_bkgd: blend (1 - acc) into the composited color.

    Returns:
      (comp_rgb [B, 3], distance [B], acc [B], weights [B, N]).
    """
    t_mids = 0.5 * (t_samples[..., :-1] + t_samples[..., 1:])
    t_interval = t_samples[..., 1:] - t_samples[..., :-1]           # [B, N]
    # Directions are un-normalized: delta = (t1 - t0) * ||d||
    # (reference models/mip.py:382-384).
    delta = t_interval * jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    density_delta = density[..., 0] * delta                          # [B, N]

    alpha = 1.0 - jnp.exp(-density_delta)
    # Exclusive cumsum: trans_i = exp(-sum_{j<i} density_delta_j).
    trans = jnp.exp(-(jnp.cumsum(density_delta, axis=-1) - density_delta))
    weights = alpha * trans                                          # [B, N]

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)            # [B, 3]
    acc = jnp.sum(weights, axis=-1)
    distance = jnp.sum(weights * t_mids, axis=-1)
    distance = jnp.clip(jnp.nan_to_num(distance, nan=0.0),
                        t_samples[..., 0], t_samples[..., -1])
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, distance, acc, weights


def volumetric_rendering_cmajor(rgb_cm, density, t_samples, dirs,
                                white_bkgd: bool, mxu_cumsum: bool = False):
    """Channel-major twin of `volumetric_rendering` for the lean kernels'
    cmajor boundary (kernels/mlp.py fused_mlp_lean cmajor=True).

    Same math and results as `volumetric_rendering` — only the per-sample
    rgb layout differs: [3, B, N] planes are full-lane [B, N] tensors on
    TPU, where the row-major [B, N, 3] layout lane-pads 3 -> 128 (201 MB
    physical per level at the lego shape).  The cotangent of `rgb_cm` flows
    back channel-major too, which is exactly the layout the lean backward
    kernel streams.

    Args:
      rgb_cm: [3, B, N]; density: [B, N]; t_samples: [B, N+1]; dirs: [B, 3].

    Returns:
      (comp_rgb [B, 3], distance [B], acc [B], weights [B, N]) — identical
      to `volumetric_rendering`.
    """
    t_mids = 0.5 * (t_samples[..., :-1] + t_samples[..., 1:])
    t_interval = t_samples[..., 1:] - t_samples[..., :-1]           # [B, N]
    delta = t_interval * jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    density_delta = density * delta                                  # [B, N]

    alpha = 1.0 - jnp.exp(-density_delta)
    if mxu_cumsum:
        # Exclusive prefix sum as a strict-upper-triangular MXU matmul
        # (ops/fastmath.py cumsum_mxu) instead of XLA's VPU reduce-window.
        trans = jnp.exp(-cumsum_mxu(density_delta, exclusive=True))
    else:
        trans = jnp.exp(-(jnp.cumsum(density_delta, axis=-1)
                          - density_delta))
    weights = alpha * trans                                          # [B, N]

    comp_rgb = jnp.sum(weights[None] * rgb_cm, axis=-1).T            # [B, 3]
    acc = jnp.sum(weights, axis=-1)
    distance = jnp.sum(weights * t_mids, axis=-1)
    distance = jnp.clip(jnp.nan_to_num(distance, nan=0.0),
                        t_samples[..., 0], t_samples[..., -1])
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, distance, acc, weights


def distloss(weights, t_samples, mxu_cumsum: bool = False):
    """Distortion regularizer of mip-NeRF 360 §4 (uni- + bilateral terms).

    Parity: reference models/mip.py:8-20 (same normalization: per-ray sums,
    batch mean; the training loop scales it by a configurable weight,
    default 0.01 as hardcoded at reference models/nerf_system.py:110-111).

    TPU-first: the bilateral term sum_ij w_i w_j |m_i - m_j| is evaluated
    with the O(N) sorted prefix-sum identity
        2 * sum_i w_i * (m_i * W_{<i} - (wm)_{<i}),  W_{<i} = sum_{j<i} w_j
    instead of materializing the reference's [B, N, N] outer products —
    valid because t_samples (hence midpoints) are sorted ascending, which
    both the stratified sampler and the inverse-CDF resampler guarantee.
    Saves ~400 MB of HBM traffic per level at the lego batch shape.

    Args:
      weights: [B, N]; t_samples: [B, N+1] (sorted ascending).
    """
    interval = t_samples[..., 1:] - t_samples[..., :-1]
    mid_points = 0.5 * (t_samples[..., 1:] + t_samples[..., :-1])
    loss_uni = (1.0 / 3.0) * jnp.mean(jnp.sum(interval * weights ** 2, axis=-1))
    wm = weights * mid_points
    # Exclusive prefix sums: contributions of all j < i.
    if mxu_cumsum:
        w_before = cumsum_mxu(weights, exclusive=True)
        wm_before = cumsum_mxu(wm, exclusive=True)
    else:
        w_before = jnp.cumsum(weights, axis=-1) - weights
        wm_before = jnp.cumsum(wm, axis=-1) - wm
    loss_bi = 2.0 * jnp.mean(jnp.sum(
        weights * (mid_points * w_before - wm_before), axis=-1))
    return loss_uni + loss_bi
