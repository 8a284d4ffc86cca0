"""Pallas TPU kernel: fused integrated positional encoding.

Computes enc = exp(-0.5 * var) * sin(arg) for the full sin/cos block layout
of `ops.math.integrated_pos_enc` in one VMEM pass — the scale ladder is
materialized as a constant row vector inside the kernel, the [rows, 3]
means/covs are broadcast across the ladder on-chip, and both transcendental
blocks are written without intermediate HBM round-trips.

Shapes: means/covs [M, 3] (flattened rays x samples), output
[M, 2 * 3 * L].  A custom VJP backprops through means and covs with a
second fused kernel.

XLA already fuses this elementwise chain well, so the kernel is opt-in
(`integrated_pos_enc(..., backend='pallas')` via models or direct call);
it exists as the hand-written native tier for the encode hot-path
(SURVEY.md §2: "where a hand-written native component is wanted... fused
IPE encoding") and as the template for future kernels.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 512


def _ladder(min_deg: int, max_deg: int, dtype=jnp.float32) -> np.ndarray:
    """[1, 3L] row vector of scales 2^l, each repeated over the 3 dims."""
    l = np.arange(min_deg, max_deg)
    return np.repeat(2.0 ** l, 3)[None, :].astype(dtype)


def _fwd_kernel(scales_ref, means_ref, covs_ref, out_ref, *, num_valid_l3):
    m = means_ref[:]                                  # [T, 3]
    c = covs_ref[:]                                   # [T, 3]
    L3 = num_valid_l3
    reps = L3 // 3
    # Broadcast [T, 3] -> [T, 3L] by concatenation along lanes.
    m_t = pltpu.repeat(m, reps, 1)
    c_t = pltpu.repeat(c, reps, 1)
    s = scales_ref[:]                                 # [1, 3L]
    arg = m_t * s
    damp = jnp.exp(-0.5 * c_t * (s * s))
    out_ref[:, :L3] = damp * jnp.sin(arg)
    out_ref[:, L3:] = damp * jnp.cos(arg)


def _bwd_kernel(scales_ref, means_ref, covs_ref, g_ref, dm_ref, dc_ref, *,
                num_valid_l3):
    m = means_ref[:]
    c = covs_ref[:]
    L3 = num_valid_l3
    reps = L3 // 3
    m_t = pltpu.repeat(m, reps, 1)
    c_t = pltpu.repeat(c, reps, 1)
    s = scales_ref[:]
    arg = m_t * s
    damp = jnp.exp(-0.5 * c_t * (s * s))
    g_sin = g_ref[:, :L3]
    g_cos = g_ref[:, L3:]
    sin_a, cos_a = jnp.sin(arg), jnp.cos(arg)
    # d enc_sin/d m = damp * cos(arg) * s ; d enc_cos/d m = -damp * sin * s
    dm_wide = (g_sin * damp * cos_a - g_cos * damp * sin_a) * s
    # d enc/d c = -0.5 s^2 * enc
    dc_wide = -0.5 * (s * s) * (g_sin * damp * sin_a + g_cos * damp * cos_a)
    # Fold the ladder axis back onto 3 dims: sum over l of each dim column.
    dm = jnp.zeros_like(m)
    dc = jnp.zeros_like(c)
    for r in range(reps):
        dm = dm + dm_wide[:, r * 3:(r + 1) * 3]
        dc = dc + dc_wide[:, r * 3:(r + 1) * 3]
    dm_ref[:] = dm
    dc_ref[:] = dc


def _resolve_interpret(interpret):
    # None -> interpret everywhere except a real TPU backend (lets the same
    # model config run in CPU tests and on hardware).
    if interpret is None:
        return jax.default_backend() != 'tpu'
    return interpret


def _run_fwd(means2d, covs2d, min_deg, max_deg, interpret):
    interpret = _resolve_interpret(interpret)
    M = means2d.shape[0]
    L3 = 3 * (max_deg - min_deg)
    scales = _ladder(min_deg, max_deg)
    grid = (pl.cdiv(M, _ROW_TILE),)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_valid_l3=L3),
        out_shape=jax.ShapeDtypeStruct((M, 2 * L3), means2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, 2 * L3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(scales), means2d, covs2d)


def _run_bwd(means2d, covs2d, g2d, min_deg, max_deg, interpret):
    interpret = _resolve_interpret(interpret)
    M = means2d.shape[0]
    L3 = 3 * (max_deg - min_deg)
    scales = _ladder(min_deg, max_deg)
    grid = (pl.cdiv(M, _ROW_TILE),)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_valid_l3=L3),
        out_shape=(jax.ShapeDtypeStruct((M, 3), means2d.dtype),
                   jax.ShapeDtypeStruct((M, 3), covs2d.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, 2 * L3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROW_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(jnp.asarray(scales), means2d, covs2d, g2d)


# ---------------------------------------------------------------------------
# Moments-form fast encode: the standalone producer for the lean megakernels.
#
# Why (round-5 step trace): with the megakernels consuming a precomputed
# [M, F] f32 encode, the XLA-side producer lowers to TWO [M, F]-sized
# fusions per level (the ladder matmul, then the transcendental epilogue —
# XLA does not fuse an elementwise epilogue into a dot), i.e. three HBM
# round-trips of the 151 MB encode at the lego shape, ~2.1 ms/step across
# both levels.  This kernel emits the encode in ONE pass: the [6, M]
# channel-major moments stream (ops/math.py cast_rays_cmajor, 9.4 MB) in,
# one [M, F] write out, with the one-hot ladder matmul on the MXU and the
# fast-polynomial exp/sin on the VPU per VMEM tile — the same math the
# in-kernel fused encode runs (kernels/mlp.py _decode_moments, shared
# here), so values match the fast-math XLA encode to ~1e-6 absolute.
#
# Gradient contract: zero cotangents for the moments, matching the lean
# megakernels' own contract for their encoded inputs (models/mipnerf.py
# setup() enforces nerf.stop_resample_grad=True for the lean family, which
# makes the moments' cotangent path structurally dead).
# ---------------------------------------------------------------------------

_MOMENTS_TILE = int(os.environ.get('IPE_MOMENTS_TILE', '2048'))


def _moments_kernel(comb_ref, phase_ref, m_ref, out_ref):
    from mipnerf_pl_tpu.kernels.mlp import _decode_moments
    out_ref[:] = _decode_moments(m_ref[:], comb_ref[:], phase_ref[:])


def _run_moments(m2d, min_deg, max_deg, interpret):
    from mipnerf_pl_tpu.kernels.mlp import _encode_matrices
    interpret = _resolve_interpret(interpret)
    M = m2d.shape[-1]
    F = 2 * 3 * (max_deg - min_deg)
    comb, phase = _encode_matrices(min_deg, max_deg)
    T = _MOMENTS_TILE
    grid = (pl.cdiv(M, T),)
    return pl.pallas_call(
        _moments_kernel,
        out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(comb.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(comb), jnp.asarray(phase.reshape(1, -1)), m2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_ipe_moments(moments, min_deg: int = 0, max_deg: int = 16,
                      interpret=None):
    """Moments-form fused IPE: [6, ...] channel-major diagonal Gaussians
    (rows 0-2 means xyz, rows 3-5 cov diag xyz — cast_rays_cmajor's layout)
    -> [..., 2*3*L] f32 encodings.

    Values match `ops.math.integrated_pos_enc(..., fast_transcendentals=
    True)` to ~1e-6 absolute (same fast exp/sin polynomials, exact 3-way
    mantissa-split ladder matmul).  Backward returns ZERO moment cotangents
    (see module comment) — callers must sit behind stop_resample_grad.
    """
    lead = moments.shape[1:]
    out = _run_moments(moments.reshape(6, -1), min_deg, max_deg, interpret)
    return out.reshape(*lead, -1)


def _fused_ipe_moments_fwd(moments, min_deg, max_deg, interpret):
    # The residual is the input itself (already live as the kernel's
    # operand); the backward only reads its shape/dtype for the zero fill.
    return (fused_ipe_moments(moments, min_deg, max_deg, interpret),
            moments)


def _fused_ipe_moments_bwd(min_deg, max_deg, interpret, res, g):
    del g
    return (jnp.zeros_like(res),)


fused_ipe_moments.defvjp(_fused_ipe_moments_fwd, _fused_ipe_moments_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_ipe(means, covs_diag, min_deg: int = 0, max_deg: int = 16,
              interpret=None):
    """Fused IPE: [..., 3] diagonal Gaussians -> [..., 2*3*L] encodings.

    Drop-in equal to `ops.math.integrated_pos_enc((means, covs), min_deg,
    max_deg)` for diagonal covariances (same layout: scale-major sin block
    then cos block).  `interpret`: True forces the Pallas interpreter,
    False forces compilation, None auto-selects (compiled on TPU only).
    """
    lead = means.shape[:-1]
    out = _run_fwd(means.reshape(-1, 3), covs_diag.reshape(-1, 3),
                   min_deg, max_deg, interpret)
    return out.reshape(*lead, -1)


def _fused_ipe_fwd(means, covs_diag, min_deg, max_deg, interpret):
    return (fused_ipe(means, covs_diag, min_deg, max_deg, interpret),
            (means, covs_diag))


def _fused_ipe_bwd(min_deg, max_deg, interpret, res, g):
    means, covs_diag = res
    lead = means.shape[:-1]
    dm, dc = _run_bwd(means.reshape(-1, 3), covs_diag.reshape(-1, 3),
                      g.reshape(-1, g.shape[-1]), min_deg, max_deg,
                      interpret)
    return dm.reshape(*lead, 3), dc.reshape(*lead, 3)


fused_ipe.defvjp(_fused_ipe_fwd, _fused_ipe_bwd)
