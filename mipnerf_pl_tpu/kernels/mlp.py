"""Pallas TPU megakernel: the full Mip-NeRF MLP, fused.

Why: XLA's train step moves ~10.7 GB of HBM per step (cost analysis) —
dominated by the 8x[B*N, 256] trunk activations written in the forward and
re-read in the backward.  The whole parameter set is ~1.2 MB in bf16, so
the TPU-native layout is: keep ALL weights resident in VMEM, stream
row-tiles of points through the trunk entirely on-chip, and write only the
4 output channels.  The backward recomputes activations per tile in VMEM
(no saved-activation traffic at all) and accumulates weight gradients in a
VMEM f32 scratch across the sequential TPU grid.

Supports the reference architecture exactly (models/mip_nerf.py:14-111):
`net_depth` ReLU trunk with skip-concats every `skip_index` layers (the
kernel generalizes over multiple skips), density head, bottleneck,
`net_depth_condition` view layers, rgb head.  Restrictions: ReLU-only
(asserted at the call site in models/mlp.py) and viewdirs required
(kernel signature takes the viewdir features unconditionally).

HBM traffic per level at the lego shape: ~190 MB total (x tile reads twice
+ dx write + heads) vs XLA's ~3 GB.  MXU work: forward twice + backward.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mipnerf_pl_tpu.ops.fastmath import (fast_exp as _fast_exp,
                                         fast_sin as _fast_sin)

import os

# Row-tile sizes: the TPU grid has a per-step scheduling overhead of a few
# microseconds, so tiles must be large enough that each step's MXU work
# (~2*T*|params| FLOPs) dominates it; measured on the v5e chip, 512-row tiles
# were overhead-bound (~3.5 us bubble per step).  Bounded above by VMEM: the
# recompute backward keeps 8 post-relu [T, W] bf16 activations + params +
# f32 weight-grad accumulators resident.
_ROW_TILE = int(os.environ.get('MLP_FWD_TILE', '4096'))
_ROW_TILE_BWD = int(os.environ.get('MLP_BWD_TILE', '2048'))
# 'save' mode streams ~10 activation tensors through VMEM in each direction;
# its tiles are bounded by the double-buffered stream footprint.
_ROW_TILE_SAVED_FWD = int(os.environ.get('MLP_SAVE_FWD_TILE', '768'))
_ROW_TILE_SAVED_BWD = int(os.environ.get('MLP_SAVE_BWD_TILE', '512'))
# lean-save streams ~10 bf16 activations/tile each way; the slim boundary
# leaves VMEM headroom for larger tiles than classic 'save' mode.  The
# forward holds less live state than the backward (no dparam accumulators,
# no cotangent chain) so its tile can be tuned independently.
_ROW_TILE_LEAN_SAVE = int(os.environ.get('MLP_LEAN_SAVE_TILE', '2048'))
_ROW_TILE_LEAN_SAVE_FWD = int(os.environ.get('MLP_LEAN_SAVE_FWD_TILE',
                                             str(_ROW_TILE_LEAN_SAVE)))


# The default 16 MB scoped-VMEM cap is far below the chip's physical VMEM;
# the streaming kernels' double-buffered tiles need more headroom.
_VMEM_LIMIT = int(os.environ.get('MLP_VMEM_LIMIT', str(96 * 1024 * 1024)))
# 'arbitrary' grid semantics: the backward kernels accumulate += into
# constant-index output refs across grid steps, which requires the
# sequential interpretation (measured perf-neutral vs unset).
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=_VMEM_LIMIT, dimension_semantics=('arbitrary',))


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != 'tpu'
    return interpret


# ---------------------------------------------------------------------------
# Parameter plumbing: the flax param dict is flattened to a fixed list of
# arrays in a deterministic order the kernels index positionally.
# ---------------------------------------------------------------------------

def param_order(net_depth: int, net_depth_condition: int):
    names = [f'trunk_{i}' for i in range(net_depth)]
    names += ['density', 'bottleneck']
    names += [f'view_{i}' for i in range(net_depth_condition)]
    names += ['rgb']
    return names


def flatten_params(mlp_params: Dict[str, Any], net_depth: int,
                   net_depth_condition: int):
    """flax MLP param subtree -> [k0, b0, k1, b1, ...] array list."""
    out = []
    for name in param_order(net_depth, net_depth_condition):
        leaf = mlp_params[name]
        out.append(leaf['kernel'])
        out.append(leaf['bias'].reshape(1, -1))
    return out


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_body(x, view, params, cfg):
    """Trunk + heads on one tile, all in registers/VMEM.  Returns
    (rgb [T, 3], density [T, nd], trunk_out [T, W], view_in [T, Wv_in]) —
    the extra outputs feed the backward recompute."""
    net_depth = cfg['net_depth']
    skip = cfg['skip_index']
    nvd = cfg['net_depth_condition']
    f32 = jnp.float32

    def dense(h, i):
        k, b = params[2 * i], params[2 * i + 1]
        return jnp.dot(h, k, preferred_element_type=f32) + b.astype(f32)

    h = x
    inputs = x
    for i in range(net_depth):
        h = jnp.maximum(dense(h, i), 0.0).astype(x.dtype)
        if i % skip == 0 and i > 0:
            h = jnp.concatenate([h, inputs], axis=-1)
    trunk_out = h
    density = dense(h, net_depth)                  # f32 [T, nd]
    bottleneck = dense(h, net_depth + 1).astype(x.dtype)
    y = jnp.concatenate([bottleneck, view], axis=-1)
    view_in = y
    for j in range(nvd):
        y = jnp.maximum(dense(y, net_depth + 2 + j), 0.0).astype(x.dtype)
    rgb = dense(y, net_depth + 2 + nvd)            # f32 [T, 3]
    return rgb, density, trunk_out, view_in


def _fwd_kernel(x_ref, view_ref, *refs, cfg):
    n_params = cfg['n_params']
    params = [r[:] for r in refs[:n_params]]
    rgb_ref, dens_ref = refs[n_params:]
    x = x_ref[:].astype(cfg['dtype'])
    view = view_ref[:].astype(cfg['dtype'])
    rgb, density, _, _ = _fwd_body(x, view, params, cfg)
    rgb_ref[:] = rgb
    dens_ref[:] = density


# ---------------------------------------------------------------------------
# 'save' mode: the forward kernel also streams the post-relu activations to
# HBM (pipelined with compute), so the backward needs NO recompute — the
# megakernel's per-FLOP efficiency at XLA's FLOP count.  Saved tensors:
# h[i] (post-relu trunk outputs, [M, W] each), bottleneck [M, W], and the
# post-relu view-branch outputs y[j] [M, Wv].  Everything else the backward
# needs is derivable: layer inputs acts[i] = h[i-1] (+x concat), relu masks
# = h[i] > 0, view_in = concat(bottleneck, view).
# ---------------------------------------------------------------------------

def _fwd_body_save(x, view, params, cfg):
    net_depth = cfg['net_depth']
    skip = cfg['skip_index']
    nvd = cfg['net_depth_condition']
    f32 = jnp.float32

    def dense(h, i):
        k, b = params[2 * i], params[2 * i + 1]
        return jnp.dot(h, k, preferred_element_type=f32) + b.astype(f32)

    hs, ys = [], []
    h = x
    inputs = x
    for i in range(net_depth):
        h = jnp.maximum(dense(h, i), 0.0).astype(x.dtype)
        hs.append(h)
        if i % skip == 0 and i > 0:
            h = jnp.concatenate([h, inputs], axis=-1)
    density = dense(h, net_depth)
    bottleneck = dense(h, net_depth + 1).astype(x.dtype)
    y = jnp.concatenate([bottleneck, view], axis=-1)
    for j in range(nvd):
        y = jnp.maximum(dense(y, net_depth + 2 + j), 0.0).astype(x.dtype)
        ys.append(y)
    rgb = dense(y, net_depth + 2 + nvd)
    return rgb, density, hs, bottleneck, ys


def _fwd_kernel_save(x_ref, view_ref, *refs, cfg):
    n_params = cfg['n_params']
    net_depth = cfg['net_depth']
    nvd = cfg['net_depth_condition']
    params = [r[:] for r in refs[:n_params]]
    outs = refs[n_params:]
    rgb_ref, dens_ref = outs[0], outs[1]
    h_refs = outs[2:2 + net_depth]
    bott_ref = outs[2 + net_depth]
    y_refs = outs[3 + net_depth:3 + net_depth + nvd]

    x = x_ref[:].astype(cfg['dtype'])
    view = view_ref[:].astype(cfg['dtype'])
    rgb, density, hs, bottleneck, ys = _fwd_body_save(x, view, params, cfg)
    rgb_ref[:] = rgb
    dens_ref[:] = density
    for r, h in zip(h_refs, hs):
        r[:] = h
    bott_ref[:] = bottleneck
    for r, y in zip(y_refs, ys):
        r[:] = y


def _bwd_kernel_saved(x_ref, view_ref, g_rgb_ref, g_dens_ref, *refs, cfg):
    """Backward with saved activations: zero recompute matmuls."""
    net_depth = cfg['net_depth']
    skip = cfg['skip_index']
    nvd = cfg['net_depth_condition']
    n_params = cfg['n_params']
    W = cfg['net_width']
    dtype = cfg['dtype']
    f32 = jnp.float32

    params = [r[:] for r in refs[:n_params]]
    saved = refs[n_params:n_params + net_depth + 1 + nvd]
    h_saved = [r[:].astype(dtype) for r in saved[:net_depth]]
    bottleneck = saved[net_depth][:].astype(dtype)
    y_saved = [r[:].astype(dtype) for r in saved[net_depth + 1:]]
    out_refs = refs[n_params + net_depth + 1 + nvd:]
    dx_ref, dview_ref = out_refs[0], out_refs[1]
    dparam_refs = out_refs[2:]

    x = x_ref[:].astype(dtype)
    view = view_ref[:].astype(dtype)
    g_rgb = g_rgb_ref[:]
    g_dens = g_dens_ref[:]

    # Reconstruct layer inputs and masks from the saved tensors.
    acts = []
    h = x
    for i in range(net_depth):
        acts.append(h)
        h = h_saved[i]
        if i % skip == 0 and i > 0:
            h = jnp.concatenate([h, x], axis=-1)
    trunk_out = h
    view_in = jnp.concatenate([bottleneck, view], axis=-1)
    v_acts = [view_in] + y_saved[:-1] if nvd > 0 else []
    rgb_in = y_saved[-1] if nvd > 0 else trunk_out

    first = pl.program_id(0) == 0

    def accum(idx, dk, db):
        kr, br = dparam_refs[2 * idx], dparam_refs[2 * idx + 1]

        @pl.when(first)
        def _():
            kr[:] = jnp.zeros(kr.shape, kr.dtype)
            br[:] = jnp.zeros(br.shape, br.dtype)

        kr[:] += dk
        br[:] += db.reshape(1, -1)

    def d_dense(idx, inp, g_out):
        k = params[2 * idx]
        gb = g_out.astype(dtype)
        dk = jax.lax.dot_general(inp, gb, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        db = jnp.sum(g_out, axis=0)
        accum(idx, dk, db)
        return jax.lax.dot_general(gb, k, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    g = d_dense(net_depth + 2 + nvd, rgb_in, g_rgb)
    for j in reversed(range(nvd)):
        g = jnp.where(y_saved[j].astype(f32) > 0.0, g, 0.0)
        g = d_dense(net_depth + 2 + j, v_acts[j], g)
    g_bottleneck = g[:, :W]
    dview_ref[:] = g[:, W:]
    g_trunk = d_dense(net_depth + 1, trunk_out, g_bottleneck)
    g_trunk += d_dense(net_depth, trunk_out, g_dens)

    g_x_extra = jnp.zeros(x.shape, dtype=f32)
    for i in reversed(range(net_depth)):
        if i % skip == 0 and i > 0:
            g_x_extra += g_trunk[:, W:]
            g_trunk = g_trunk[:, :W]
        g_trunk = jnp.where(h_saved[i].astype(f32) > 0.0, g_trunk, 0.0)
        g_trunk = d_dense(i, acts[i], g_trunk)
    dx_ref[:] = g_trunk + g_x_extra


# ---------------------------------------------------------------------------
# Backward kernel: recompute forward per tile, then chain rule.
# Weight grads accumulate into f32 outputs revisited every grid step
# (the TPU grid is sequential, so += across steps is well-defined).
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, view_ref, g_rgb_ref, g_dens_ref, *refs, cfg):
    net_depth = cfg['net_depth']
    skip = cfg['skip_index']
    nvd = cfg['net_depth_condition']
    n_params = cfg['n_params']
    W = cfg['net_width']
    dtype = cfg['dtype']
    f32 = jnp.float32

    params = [r[:] for r in refs[:n_params]]
    out_refs = refs[n_params:]
    dx_ref, dview_ref = out_refs[0], out_refs[1]
    dparam_refs = out_refs[2:]

    x = x_ref[:].astype(dtype)
    view = view_ref[:].astype(dtype)

    def dense(h, i):
        k, b = params[2 * i], params[2 * i + 1]
        return jnp.dot(h, k, preferred_element_type=f32) + b.astype(f32)

    # ---- forward recompute, stashing ONLY the post-relu outputs (bf16) ----
    # Layer inputs and relu masks are both derivable from them (acts[i] =
    # hs[i-1] [+ skip concat]; mask_i = hs[i] > 0), which halves the VMEM
    # residency vs stashing inputs and masks separately.
    hs = []          # post-relu output of each trunk layer (pre-concat)
    h = x
    for i in range(net_depth):
        h = jnp.maximum(dense(h, i), 0.0).astype(dtype)
        hs.append(h)
        if i % skip == 0 and i > 0:
            h = jnp.concatenate([h, x], axis=-1)
    trunk_out = h
    bottleneck = dense(h, net_depth + 1).astype(dtype)
    y = jnp.concatenate([bottleneck, view], axis=-1)
    v_acts, ys = [], []
    for j in range(nvd):
        v_acts.append(y)
        y = jnp.maximum(dense(y, net_depth + 2 + j), 0.0).astype(dtype)
        ys.append(y)
    rgb_in = y

    g_rgb = g_rgb_ref[:]                       # [T, 3] f32
    g_dens = g_dens_ref[:]                     # [T, nd] f32

    first = pl.program_id(0) == 0

    def accum(idx, dk, db):
        kr, br = dparam_refs[2 * idx], dparam_refs[2 * idx + 1]

        @pl.when(first)
        def _():
            kr[:] = jnp.zeros(kr.shape, kr.dtype)
            br[:] = jnp.zeros(br.shape, br.dtype)

        kr[:] += dk
        br[:] += db.reshape(1, -1)

    def d_dense(idx, inp, g_out):
        """Given d loss/d (dense output) [T, O] f32, accumulate dW/db and
        return d loss/d input [T, I] f32.  Both matmuls contract via
        dot_general dimension_numbers — no materialized transposes (the MXU
        takes either operand orientation natively; an explicit `.T` costs a
        full VMEM copy per layer per tile)."""
        k = params[2 * idx]
        gb = g_out.astype(dtype)
        # dk[I, O] = sum_t inp[t, I] * g[t, O]
        dk = jax.lax.dot_general(inp, gb, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        db = jnp.sum(g_out, axis=0)
        accum(idx, dk, db)
        # dx[T, I] = g[T, O] . k[I, O]^T
        return jax.lax.dot_general(gb, k, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    # rgb head
    g = d_dense(net_depth + 2 + nvd, rgb_in, g_rgb)
    # view layers (reverse); relu mask from the stashed post-relu output
    for j in reversed(range(nvd)):
        # (.astype(f32): Mosaic has no native bf16 comparison)
        g = jnp.where(ys[j].astype(f32) > 0.0, g, 0.0)
        g = d_dense(net_depth + 2 + j, v_acts[j], g)
    # split into bottleneck / view-direction grads
    g_bottleneck = g[:, :W]
    dview_ref[:] = g[:, W:]
    # bottleneck + density heads both feed from trunk_out
    g_trunk = d_dense(net_depth + 1, trunk_out, g_bottleneck)
    g_trunk += d_dense(net_depth, trunk_out, g_dens)

    # trunk (reverse), undoing the skip concat
    g_x_extra = jnp.zeros(x.shape, dtype=f32)
    for i in reversed(range(net_depth)):
        if i % skip == 0 and i > 0:
            # h was concat([relu_out, x]) after this layer
            g_x_extra += g_trunk[:, W:]
            g_trunk = g_trunk[:, :W]
        g_trunk = jnp.where(hs[i].astype(f32) > 0.0, g_trunk, 0.0)
        inp = x if i == 0 else hs[i - 1]
        if i >= 1 and (i - 1) % skip == 0 and i - 1 > 0:
            inp = jnp.concatenate([inp, x], axis=-1)
        g_trunk = d_dense(i, inp, g_trunk)
    dx_ref[:] = g_trunk + g_x_extra


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _cfg(net_depth, net_depth_condition, skip_index, net_width, n_params,
         dtype):
    return dict(net_depth=net_depth, net_depth_condition=net_depth_condition,
                skip_index=skip_index, net_width=net_width,
                n_params=n_params, dtype=dtype)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _tile_spec_t(width, tile):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _tile_spec(width):
    return _tile_spec_t(width, _ROW_TILE)


def _pad_rows(a, m_padded):
    """Zero-pad rows to m_padded — padded rows must be DEFINED zeros, not
    pallas block padding, so padded gradient rows contribute nothing to the
    accumulated weight grads."""
    m = a.shape[0]
    if m == m_padded:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((m_padded - m, a.shape[1]), a.dtype)], axis=0)


def _pad_cols(a, n_padded):
    """Column twin of _pad_rows for channel-major [c, M] streams."""
    n = a.shape[1]
    if n == n_padded:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((a.shape[0], n_padded - n), a.dtype)], axis=1)


def _cmajor_spec(channels, tile):
    """BlockSpec for a channel-major [c, M] stream tiled along M."""
    return pl.BlockSpec((channels, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# Fused IPE encode (round 4): the lean kernels can take the cone-Gaussian
# MOMENTS — one channel-major [6, M] f32 stream (means xyz | diag-cov xyz) —
# instead of the [M, 2*L*3] f32 encode, and compute the integrated
# positional encoding per tile in VMEM:
#
#     enc = exp(-0.5 * (cov @ (S*S))) * sin(means @ S + phase)
#
# with S the one-hot-scaled ladder matrix (S[d, k*3+d] = 2^(min_deg+k),
# duplicated for the sin|cos halves — the exact matmul form of
# ops/math.py:integrated_pos_enc, whose every output element is a single
# product and therefore exact at any dot precision >= f32).  Both moment
# dots are fused into ONE [6, 2F] constant so the ladder costs a single
# tiny MXU pass per tile (K=6).
#
# Why (round-3 trace, DESIGN.md §12): the [M, 96] f32 encode stream is the
# last big row stream at the kernel boundary — ~151 MB physical per level
# per direction at the lego shape (read by fwd AND bwd) plus the 0.83 ms
# XLA encode fusion itself.  The [6, M] moments stream is 9.4 MB, the
# in-kernel exp/sin is VPU work overlapped with the MXU trunk, and the
# backward recomputes the encode per tile (parameter-free — the lean
# family already requires stop_resample_grad, so the moments carry no
# cotangent by construction).
# ---------------------------------------------------------------------------


def _encode_matrices(min_deg: int, max_deg: int, num_dims: int = 3):
    """Trace-time constants of the fused encode: (comb [2*D, Fa + Fpad],
    phase [F]) with F = 2 * (max_deg - min_deg) * D.  comb's top rows map
    means -> sin/cos arguments (columns :F), bottom rows map diagonal covs
    -> variance ladder (columns Fa:Fa+F), where Fa = F rounded UP to the
    128-lane tile: the variance block then starts on a lane-tile boundary,
    so the kernel's z[:, Fa:] slice is a free aligned view instead of the
    cross-lane shuffle a z[:, 96:] slice lowers to on the VPU."""
    L = max_deg - min_deg
    D = num_dims
    F = 2 * L * D
    Fa = ((F + 127) // 128) * 128
    scales = np.asarray([2.0 ** i for i in range(min_deg, max_deg)])
    sel = np.tile(np.eye(D), (1, L))
    s = sel * np.repeat(scales, D)[None, :]              # [D, L*D]
    s2 = np.concatenate([s, s], axis=1)                  # [D, F]
    comb = np.zeros((2 * D, Fa + F), np.float32)
    comb[:D, :F] = s2
    comb[D:, Fa:] = s2 * s2
    phase = np.concatenate([np.zeros(L * D),
                            np.full(L * D, 0.5 * np.pi)]).astype(np.float32)
    return comb, phase


# Fast in-kernel transcendentals: _fast_exp/_fast_sin (imported at the top
# from ops/fastmath.py, shared with the XLA-side encode — Mosaic and XLA
# lower exp/sin at the same ~40 cycles/lane-element; rationale, accuracy
# envelope and coefficients in ops/fastmath.py).


def _decode_moments(m, comb, phase):
    """[2*D, T] f32 moments tile -> [T, F] f32 IPE encode (ops/math.py:
    integrated_pos_enc diagonal path; values agree to ~1e-6 absolute —
    the fast transcendentals above replace libm-exact exp/sin).
    comb/phase are the `_encode_matrices` constants, passed as (tiny)
    VMEM-resident kernel inputs — Pallas kernels cannot capture array
    constants.

    The ladder matmul runs as a 3-way bf16 mantissa split instead of a
    HIGHEST-precision f32 dot: comb is one-hot (every output element is a
    single product m * 2^k, and 2^k / 2^2k are exactly representable in
    bf16), so with m = a + b + c split into three 8-bit mantissa chunks
    each bf16 pass computes an exact partial product and the f32
    accumulation reconstructs the full f32 product exactly — same result,
    3 MXU passes instead of HIGHEST's 6 f32-emulation passes (the dot's
    K=6 pads to the 128-lane MXU tile, so every avoided pass is ~21x
    padding waste)."""
    a = m.astype(jnp.bfloat16)
    r = m - a.astype(jnp.float32)
    b = r.astype(jnp.bfloat16)
    c = (r - b.astype(jnp.float32)).astype(jnp.bfloat16)
    cb = comb.astype(jnp.bfloat16)

    def dot_bf(lhs):
        return jax.lax.dot_general(
            lhs, cb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [T, Fa + F]

    z = dot_bf(a) + dot_bf(b) + dot_bf(c)
    F = phase.shape[-1]
    Fa = z.shape[-1] - F
    return _fast_exp(-0.5 * z[:, Fa:]) * _fast_sin(z[:, :F] + phase)


def _load_x(x_ref, enc_refs, cfg):
    """Load the per-point input tile: the raw encode stream (cast to the
    compute dtype in VMEM), or the moments stream decoded in VMEM when the
    fused encode is active (enc_refs = (comb, phase [1, F]) refs)."""
    if cfg.get('encode') is None:
        return x_ref[:].astype(cfg['dtype'])
    return _decode_moments(x_ref[:], enc_refs[0][:],
                           enc_refs[1][:]).astype(cfg['dtype'])


def _n_enc(cfg):
    """Number of fused-encode constant inputs (0 or 2)."""
    return 2 if cfg.get('encode') is not None else 0


def _encode_inputs(cfg):
    """The fused-encode constant kernel inputs ([] when inactive)."""
    if cfg.get('encode') is None:
        return []
    min_deg, max_deg = cfg['encode']
    comb, phase = _encode_matrices(min_deg, max_deg)
    return [jnp.asarray(comb), jnp.asarray(phase.reshape(1, -1))]


def _x_pad_spec(x, Mp, T, cfg):
    """Pad + BlockSpec for the per-point input stream in either layout."""
    if cfg.get('encode') is not None:
        return _pad_cols(x, Mp), _cmajor_spec(x.shape[0], T)
    return _pad_rows(x, Mp), _tile_spec_t(x.shape[1], T)


def _x_rows(x, cfg):
    """Point count of the per-point input in either layout."""
    return x.shape[1] if cfg.get('encode') is not None else x.shape[0]


def _run_fwd(x, view, flat_params, cfg, interpret):
    M = x.shape[0]
    Mp = ((M + _ROW_TILE - 1) // _ROW_TILE) * _ROW_TILE
    x, view = _pad_rows(x, Mp), _pad_rows(view, Mp)
    nd = flat_params[2 * cfg['net_depth']].shape[1]
    grid = (Mp // _ROW_TILE,)
    kernel = functools.partial(_fwd_kernel, cfg=cfg)
    rgb, dens = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Mp, 3), jnp.float32),
                   jax.ShapeDtypeStruct((Mp, nd), jnp.float32)),
        grid=grid,
        in_specs=([_tile_spec(x.shape[1]), _tile_spec(view.shape[1])]
                  + [_full_spec() for _ in flat_params]),
        out_specs=(_tile_spec(3), _tile_spec(nd)),
        interpret=_resolve_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(x, view, *flat_params)
    return rgb[:M], dens[:M]


def _run_bwd(x, view, g_rgb, g_dens, flat_params, cfg, interpret):
    T = _ROW_TILE_BWD
    M = x.shape[0]
    Mp = ((M + T - 1) // T) * T
    # Zero-pad everything: zero gradient rows contribute zero to dW/db.
    x, view = _pad_rows(x, Mp), _pad_rows(view, Mp)
    g_rgb, g_dens = _pad_rows(g_rgb, Mp), _pad_rows(g_dens, Mp)
    grid = (Mp // T,)
    kernel = functools.partial(_bwd_kernel, cfg=cfg)
    dparam_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                     for p in flat_params]
    # dparam outputs are revisited every grid step (constant index map).
    dparam_specs = [pl.BlockSpec(p.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
                    for p in flat_params]
    outs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Mp, x.shape[1]), jnp.float32),
                   jax.ShapeDtypeStruct((Mp, view.shape[1]), jnp.float32),
                   *dparam_shapes),
        grid=grid,
        in_specs=([_tile_spec_t(x.shape[1], T), _tile_spec_t(view.shape[1], T),
                   _tile_spec_t(3, T), _tile_spec_t(g_dens.shape[1], T)]
                  + [_full_spec() for _ in flat_params]),
        out_specs=(_tile_spec_t(x.shape[1], T), _tile_spec_t(view.shape[1], T),
                   *dparam_specs),
        interpret=_resolve_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(x, view, g_rgb, g_dens, *flat_params)
    return (outs[0][:M], outs[1][:M]) + tuple(outs[2:])


def _run_fwd_save(x, view, flat_params, cfg, interpret):
    T = _ROW_TILE_SAVED_FWD
    M = x.shape[0]
    Mp = ((M + T - 1) // T) * T
    x, view = _pad_rows(x, Mp), _pad_rows(view, Mp)
    net_depth = cfg['net_depth']
    nvd = cfg['net_depth_condition']
    W = cfg['net_width']
    Wv = flat_params[2 * (net_depth + 2)].shape[1]
    nd = flat_params[2 * net_depth].shape[1]
    dt = cfg['dtype']
    grid = (Mp // T,)
    kernel = functools.partial(_fwd_kernel_save, cfg=cfg)
    out_shape = (
        [jax.ShapeDtypeStruct((Mp, 3), jnp.float32),
         jax.ShapeDtypeStruct((Mp, nd), jnp.float32)]
        + [jax.ShapeDtypeStruct((Mp, W), dt) for _ in range(net_depth)]
        + [jax.ShapeDtypeStruct((Mp, W), dt)]
        + [jax.ShapeDtypeStruct((Mp, Wv), dt) for _ in range(nvd)])
    out_specs = ([_tile_spec_t(3, T), _tile_spec_t(nd, T)]
                 + [_tile_spec_t(W, T) for _ in range(net_depth + 1)]
                 + [_tile_spec_t(Wv, T) for _ in range(nvd)])
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=([_tile_spec_t(x.shape[1], T), _tile_spec_t(view.shape[1], T)]
                  + [_full_spec() for _ in flat_params]),
        out_specs=tuple(out_specs),
        interpret=_resolve_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(x, view, *flat_params)
    rgb, dens = outs[0][:M], outs[1][:M]
    saved = tuple(o[:M] for o in outs[2:])
    return rgb, dens, saved


def _run_bwd_saved(x, view, g_rgb, g_dens, flat_params, saved, cfg,
                   interpret):
    T = _ROW_TILE_SAVED_BWD
    M = x.shape[0]
    Mp = ((M + T - 1) // T) * T
    x, view = _pad_rows(x, Mp), _pad_rows(view, Mp)
    g_rgb, g_dens = _pad_rows(g_rgb, Mp), _pad_rows(g_dens, Mp)
    saved = [_pad_rows(s, Mp) for s in saved]
    grid = (Mp // T,)
    kernel = functools.partial(_bwd_kernel_saved, cfg=cfg)
    dparam_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                     for p in flat_params]
    dparam_specs = [pl.BlockSpec(p.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
                    for p in flat_params]
    outs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Mp, x.shape[1]), jnp.float32),
                   jax.ShapeDtypeStruct((Mp, view.shape[1]), jnp.float32),
                   *dparam_shapes),
        grid=grid,
        in_specs=([_tile_spec_t(x.shape[1], T), _tile_spec_t(view.shape[1], T),
                   _tile_spec_t(3, T), _tile_spec_t(g_dens.shape[1], T)]
                  + [_full_spec() for _ in flat_params]
                  + [_tile_spec_t(s.shape[1], T) for s in saved]),
        out_specs=(_tile_spec_t(x.shape[1], T), _tile_spec_t(view.shape[1], T),
                   *dparam_specs),
        interpret=_resolve_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(x, view, g_rgb, g_dens, *flat_params, *saved)
    return (outs[0][:M], outs[1][:M]) + tuple(outs[2:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_mlp(x, view, flat_params, net_depth: int, net_depth_condition: int,
              skip_index: int, compute_dtype=jnp.bfloat16, interpret=None,
              mode: str = 'recompute'):
    """Fused Mip-NeRF MLP: (x [M, F], view [M, Fv], params) -> (rgb, density).

    Equivalent to models/mlp.py:MLP with use_viewdirs, with the view
    features pre-broadcast per point.  flat_params from `flatten_params`.

    mode='recompute': backward recomputes activations in-VMEM (zero saved
    tensors, +~50% MXU work).  mode='save': the forward streams post-relu
    activations to HBM (pipelined with compute) and the backward does no
    recompute.
    """
    cfg = _cfg(net_depth, net_depth_condition, skip_index,
               flat_params[0].shape[1], len(flat_params), compute_dtype)
    # Weights live in VMEM for the whole kernel: keep them in the compute
    # dtype (halves their footprint and runs native bf16 MXU passes).
    wparams = [p.astype(compute_dtype) for p in flat_params]
    if mode == 'save':
        rgb, dens, _ = _run_fwd_save(x, view, wparams, cfg, interpret)
        return rgb, dens
    return _run_fwd(x, view, wparams, cfg, interpret)


def _fused_mlp_fwd(x, view, flat_params, net_depth, net_depth_condition,
                   skip_index, compute_dtype, interpret, mode):
    cfg = _cfg(net_depth, net_depth_condition, skip_index,
               flat_params[0].shape[1], len(flat_params), compute_dtype)
    wparams = [p.astype(compute_dtype) for p in flat_params]
    if mode == 'save':
        rgb, dens, saved = _run_fwd_save(x, view, wparams, cfg, interpret)
        return (rgb, dens), (x, view, flat_params, saved)
    out = _run_fwd(x, view, wparams, cfg, interpret)
    return out, (x, view, flat_params, None)


def _fused_mlp_bwd(net_depth, net_depth_condition, skip_index, compute_dtype,
                   interpret, mode, res, g):
    x, view, flat_params, saved = res
    g_rgb, g_dens = g
    cfg = _cfg(net_depth, net_depth_condition, skip_index,
               flat_params[0].shape[1], len(flat_params), compute_dtype)
    wparams = [p.astype(compute_dtype) for p in flat_params]
    if mode == 'save':
        outs = _run_bwd_saved(x, view, g_rgb, g_dens, wparams, saved, cfg,
                              interpret)
    else:
        outs = _run_bwd(x, view, g_rgb, g_dens, wparams, cfg, interpret)
    dx, dview = outs[0], outs[1]
    dparams = [d.reshape(p.shape).astype(p.dtype)
               for d, p in zip(outs[2:], flat_params)]
    return dx, dview, tuple(dparams)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


# ---------------------------------------------------------------------------
# 'lean' mode: the recompute megakernel with a slimmed HBM boundary.
#
# Measured on the tunneled v5e: each pallas_call costs ~0.7 ms fixed and
# streams at only ~270 GB/s, and XLA pads every narrow per-point tensor to
# 128 lanes (f32[M, 3] occupies 201 MB physically).  So the boundary, not
# the MXU, is where this kernel family loses time.  Lean mode cuts it down:
#   * encode input arrives in the PRODUCER's dtype (f32) and each tile is
#     cast to the compute dtype on VMEM load: the convert is free VPU work
#     under the DMA/MXU overlap, whereas a caller-side bf16 cast makes XLA
#     materialize a packed-(2,1) bf16 copy of the whole [M, F] encode in
#     HBM (a standalone convert+repack fusion, 3.3 ms/step for two levels
#     at the lego shape — it does NOT fuse into the encode epilogue);
#   * view features stay PER-RAY ([R, Fv], ~2 MB) — the kernel runs the
#     view half of view_0 at R rows and broadcasts per ray, instead of
#     streaming a lane-padded [M, Fv] repeat (201 MB physical);
#   * rgb and density leave as ONE packed [M, 3+nd] f32 tensor (one padded
#     buffer instead of two);
#   * the backward emits parameter gradients ONLY — no dx/dview outputs
#     (402 MB/level saved).  Training-exact: the encode and view producers
#     are parameter-free and resampling is stop-gradiented (reference
#     models/mip.py:259), so those cotangents are structurally zero.
# Use 'pallas'/'xla' for input-differentiable uses (camera optimization).
# ---------------------------------------------------------------------------


def _lean_apply_act(raw_rgb, raw_density, act):
    """In-kernel head activations (f32): sigmoid rgb widened by
    `rgb_padding`, softplus(raw + density_bias) density — the model's
    default epilogue (models/mipnerf.py:221-223, reference
    models/mip_nerf.py rgb_activation/density_activation).  Running them
    inside the megakernel removes ~1.8 ms/step of XLA launch+layout
    overhead on the narrow [M, 3]/[M, 1] tensors (the VPU cost in an
    MXU-bound kernel is fully overlapped)."""
    pad, bias = act
    rgb = jax.nn.sigmoid(raw_rgb) * (1.0 + 2.0 * pad) - pad
    density = jax.nn.softplus(raw_density + bias)
    return rgb, density


def _fwd_body_lean(x, view_ray, params, cfg):
    """x [T, F] compute dtype, view_ray [R, Fv] (T = R * num_samples)."""
    net_depth = cfg['net_depth']
    skip = cfg['skip_index']
    nvd = cfg['net_depth_condition']
    W = cfg['net_width']
    N = cfg['num_samples']
    f32 = jnp.float32
    dtype = cfg['dtype']

    def dense(h, i):
        k, b = params[2 * i], params[2 * i + 1]
        return jnp.dot(h, k, preferred_element_type=f32) + b.astype(f32)

    def dense_t(h, i):
        # Channel-major head: emit [width, T] DIRECTLY as k^T h^T — one
        # dot_general with swapped contraction, no in-VMEM transpose.
        k, b = params[2 * i], params[2 * i + 1]
        return (jax.lax.dot_general(k, h, (((0,), (1,)), ((), ())),
                                    preferred_element_type=f32)
                + b.astype(f32).reshape(-1, 1))

    head = dense_t if cfg.get('cmajor') else dense
    hs = []
    h = x
    for i in range(net_depth):
        h = jnp.maximum(dense(h, i), 0.0).astype(dtype)
        hs.append(h)
        if i % skip == 0 and i > 0:
            h = jnp.concatenate([h, x], axis=-1)
    density = head(h, net_depth)
    bottleneck = dense(h, net_depth + 1).astype(dtype)

    # view_0 as split matmuls: the view half runs at R rows (= T/N) and is
    # broadcast per ray — the reference repeats the features to T rows and
    # matmuls there (models/mip_nerf.py:106).
    k0, b0 = params[2 * (net_depth + 2)], params[2 * (net_depth + 2) + 1]
    per_point = jnp.dot(bottleneck, k0[:W], preferred_element_type=f32)
    vr = view_ray.astype(dtype)
    per_ray = jnp.dot(vr, k0[W:], preferred_element_type=f32) + b0.astype(f32)
    R, Wv = per_ray.shape
    pr = jnp.broadcast_to(per_ray[:, None, :], (R, N, Wv)).reshape(R * N, Wv)
    y = jnp.maximum(per_point + pr, 0.0).astype(dtype)
    ys = [y]
    for j in range(1, nvd):
        y = jnp.maximum(dense(y, net_depth + 2 + j), 0.0).astype(dtype)
        ys.append(y)
    rgb = head(y, net_depth + 2 + nvd)
    if cfg.get('act') is not None:
        rgb, density = _lean_apply_act(rgb, density, cfg['act'])
    return rgb, density, hs, ys, bottleneck


def _fwd_kernel_lean(x_ref, view_ref, *refs, cfg):
    n_params = cfg['n_params']
    ne = _n_enc(cfg)
    params = [r[:] for r in refs[:n_params]]
    out_ref = refs[n_params + ne]
    x = _load_x(x_ref, refs[n_params:n_params + ne], cfg)
    rgb, density, _, _, _ = _fwd_body_lean(x, view_ref[:], params, cfg)
    # cmajor: heads come out [c, T] (dense_t) and pack on the channel axis.
    out_ref[:] = jnp.concatenate([rgb, density],
                                 axis=0 if cfg.get('cmajor') else -1)


def _lean_param_grads(x, vr, g_rgb, g_dens, hs, ys, bottleneck, params,
                      dparam_refs, cfg):
    """Shared backward core: accumulate parameter grads into `dparam_refs`
    from saved-or-recomputed activations.  `x`/`hs`/`ys`/`bottleneck` are
    compute-dtype [T, *] tiles, `vr` the raw per-ray view tile, `g_rgb` /
    `g_dens` the head cotangent tiles."""
    net_depth = cfg['net_depth']
    skip = cfg['skip_index']
    nvd = cfg['net_depth_condition']
    W = cfg['net_width']
    N = cfg['num_samples']
    dtype = cfg['dtype']
    f32 = jnp.float32

    cm = bool(cfg.get('cmajor'))

    if cfg.get('act') is not None:
        # Fold the head-activation derivatives into the cotangents.  The
        # raw head outputs are recomputed here from the saved/recomputed
        # activations (two tiny [T, W]x[W, 3|1] matmuls) instead of being
        # streamed — d sigmoid = s(1-s), d softplus(z+b) = sigmoid(z+b).
        # Channel-major: cotangents arrive [c, T], so recompute the raw
        # heads transposed (k^T t^T as one dot_general) and fold in place.
        pad, bias = cfg['act']

        def head_raw(t, idx):
            k, b = params[2 * idx], params[2 * idx + 1]
            if cm:
                return (jax.lax.dot_general(
                    k, t, (((0,), (1,)), ((), ())),
                    preferred_element_type=f32)
                    + b.astype(f32).reshape(-1, 1))
            return jnp.dot(t, k, preferred_element_type=f32) + b.astype(f32)

        raw_rgb = head_raw(ys[-1], net_depth + 2 + nvd)
        sig = jax.nn.sigmoid(raw_rgb)
        g_rgb = g_rgb * ((1.0 + 2.0 * pad) * sig * (1.0 - sig))
        h_last = hs[-1]
        if (net_depth - 1) % skip == 0 and net_depth - 1 > 0:
            h_last = jnp.concatenate([h_last, x], axis=-1)
        raw_d = head_raw(h_last, net_depth)
        g_dens = g_dens * jax.nn.sigmoid(raw_d + bias)

    first = pl.program_id(0) == 0

    def zero_init(r):
        @pl.when(first)
        def _():
            r[:] = jnp.zeros(r.shape, r.dtype)

    def accum_bias(idx, db):
        br = dparam_refs[2 * idx + 1]
        zero_init(br)
        br[:] += db.reshape(1, -1)

    def d_dense(idx, parts, g_out, need, g_cm=False):
        """parts: list of layer-input tensors (concat layout); need[i]: emit
        d(part_i).  dW/db always accumulate.  `g_cm`: g_out is channel-major
        [width, T] (head layers under the channel-major boundary) — the
        contraction axes swap, every result keeps the row-major layout."""
        k, kr = params[2 * idx], dparam_refs[2 * idx]
        gb = g_out.astype(dtype)
        zero_init(kr)
        accum_bias(idx, jnp.sum(g_out, axis=1 if g_cm else 0))
        gparts = []
        off = 0
        for t, n in zip(parts, need):
            w = t.shape[-1]
            kr[off:off + w, :] += jax.lax.dot_general(
                t, gb, (((0,), (1 if g_cm else 0)), ((), ())),
                preferred_element_type=f32)
            if n:
                gparts.append(jax.lax.dot_general(
                    gb, k[off:off + w],
                    (((0 if g_cm else 1,), (1,)), ((), ())),
                    preferred_element_type=f32))
            off += w
        return gparts

    # rgb head and view layers j >= 1
    g = d_dense(net_depth + 2 + nvd, [ys[-1]], g_rgb, [True], cm)[0]
    for j in reversed(range(1, nvd)):
        g = jnp.where(ys[j].astype(f32) > 0.0, g, 0.0)
        g = d_dense(net_depth + 2 + j, [ys[j - 1]], g, [True])[0]

    # view_0: split backward.  Per-point half -> bottleneck grad; per-ray
    # half reduces the cotangent over each ray's samples first, so the
    # view-rows' weight grad is an [Fv, Wv] matmul at R rows.
    g1 = jnp.where(ys[0].astype(f32) > 0.0, g, 0.0)        # [T, Wv] f32
    idx0 = net_depth + 2
    k0, kr0 = params[2 * idx0], dparam_refs[2 * idx0]
    zero_init(kr0)
    accum_bias(idx0, jnp.sum(g1, axis=0))
    g1b = g1.astype(dtype)
    kr0[:W, :] += jax.lax.dot_general(
        bottleneck, g1b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    R = vr.shape[0]
    Wv = g1.shape[-1]
    g_ray = jnp.sum(g1.reshape(R, N, Wv), axis=1).astype(dtype)   # [R, Wv]
    kr0[W:, :] += jax.lax.dot_general(
        vr.astype(dtype), g_ray, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    g_bott = jax.lax.dot_general(g1b, k0[:W], (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)

    # bottleneck + density heads read [hs[-1], x] when the last trunk layer
    # was followed by a skip concat (hs stores the pre-concat relu outputs)
    trunk_parts = [hs[-1]]
    trunk_need = [True]
    if (net_depth - 1) % skip == 0 and net_depth - 1 > 0:
        trunk_parts.append(x)
        trunk_need.append(False)
    g_trunk = d_dense(net_depth + 1, trunk_parts, g_bott, trunk_need)[0]
    g_trunk += d_dense(net_depth, trunk_parts, g_dens, trunk_need, cm)[0]

    # g_trunk is always [T, W]: d_dense returns only the hs-part gradient
    # (the x halves of skip concats are need=False everywhere — the encoded
    # input carries no cotangent in the lean design).
    for i in reversed(range(net_depth)):
        g_trunk = jnp.where(hs[i].astype(f32) > 0.0, g_trunk, 0.0)
        if i == 0:
            d_dense(i, [x], g_trunk, [False])
            break
        parts_i = [hs[i - 1]]
        need_i = [True]
        if (i - 1) % skip == 0 and i - 1 > 0:
            parts_i.append(x)
            need_i.append(False)
        g_trunk = d_dense(i, parts_i, g_trunk, need_i)[0]


def _bwd_kernel_lean(x_ref, view_ref, g_rgb_ref, g_dens_ref, *refs, cfg):
    """Recompute backward: re-run the forward per tile in VMEM, then the
    shared gradient core.  Zero HBM activation traffic, +1 fwd of MXU."""
    n_params = cfg['n_params']
    ne = _n_enc(cfg)
    params = [r[:] for r in refs[:n_params]]
    dparam_refs = refs[n_params + ne:]
    x = _load_x(x_ref, refs[n_params:n_params + ne], cfg)
    vr = view_ref[:]
    _, _, hs, ys, bottleneck = _fwd_body_lean(x, vr, params, cfg)
    _lean_param_grads(x, vr, g_rgb_ref[:], g_dens_ref[:], hs, ys,
                      bottleneck, params, dparam_refs, cfg)


def _fwd_kernel_lean_save(x_ref, view_ref, *refs, cfg):
    """Forward that also streams the activations the backward needs as ONE
    packed bf16 tensor [T, sum(widths)]: hs[0..depth-1] | bottleneck |
    ys[0..nvd-1].  A single wide stream instead of ~10 narrow ones — the
    per-stream grid synchronization overhead is what killed the many-output
    variant (measured: the streams didn't overlap compute at all)."""
    n_params = cfg['n_params']
    ne = _n_enc(cfg)
    params = [r[:] for r in refs[:n_params]]
    out_ref = refs[n_params + ne]
    saved_ref = refs[n_params + ne + 1]
    x = _load_x(x_ref, refs[n_params:n_params + ne], cfg)
    rgb, density, hs, ys, bottleneck = _fwd_body_lean(
        x, view_ref[:], params, cfg)
    out_ref[:] = jnp.concatenate([rgb, density],
                                 axis=0 if cfg.get('cmajor') else -1)
    saved_ref[:] = jnp.concatenate(hs + [bottleneck] + ys, axis=-1)


def _bwd_kernel_lean_save(x_ref, view_ref, g_rgb_ref, g_dens_ref, saved_ref,
                          *refs, cfg):
    """Zero-recompute backward: activations stream in from the forward's
    packed saved output; only the gradient core's MXU work remains."""
    net_depth = cfg['net_depth']
    nvd = cfg['net_depth_condition']
    ne = _n_enc(cfg)
    params = [r[:] for r in refs[:cfg['n_params']]]
    enc_refs = refs[cfg['n_params']:cfg['n_params'] + ne]
    dparam_refs = refs[cfg['n_params'] + ne:]
    packed = saved_ref[:]
    widths = cfg['saved_widths']
    parts, off = [], 0
    for w in widths:
        parts.append(packed[:, off:off + w])
        off += w
    hs = parts[:net_depth]
    bottleneck = parts[net_depth]
    ys = parts[net_depth + 1:]
    x = _load_x(x_ref, enc_refs, cfg)
    _lean_param_grads(x, view_ref[:], g_rgb_ref[:], g_dens_ref[:], hs, ys,
                      bottleneck, params, dparam_refs, cfg)


def _fwd_body_lean_xla(x, view_ray, params, cfg):
    """The lean forward as a plain-XLA graph (same math as _fwd_body_lean,
    same flat param layout) for the 'hybrid' mode: XLA's forward is
    bandwidth-optimal AND materializes every activation in HBM as part of
    normal execution — exactly the residuals the zero-recompute Pallas
    backward streams.  Skip/head concats are evaluated as split matmuls so
    no lane-padded concat tensor is ever materialized in HBM."""
    net_depth = cfg['net_depth']
    skip = cfg['skip_index']
    nvd = cfg['net_depth_condition']
    W = cfg['net_width']
    N = cfg['num_samples']
    f32 = jnp.float32
    dtype = cfg['dtype']

    # Dots run in the compute dtype WITHOUT preferred_element_type: a forced
    # f32 dot output would materialize [M, W] f32 (2x traffic) when the
    # fused dot+bias+relu+cast chain breaks; bf16-out dots write bf16
    # directly (this mirrors models/mlp.py's XLA path).
    def dense_parts(idx, parts):
        k, b = params[2 * idx], params[2 * idx + 1]
        out, off = b.astype(parts[0].dtype), 0
        for t in parts:
            w = t.shape[-1]
            out = out + jnp.dot(t, k[off:off + w].astype(t.dtype))
            off += w
        return out

    hs = []
    h = x
    parts = [x]
    for i in range(net_depth):
        h = jnp.maximum(dense_parts(i, parts), 0).astype(dtype)
        hs.append(h)
        parts = [h, x] if (i % skip == 0 and i > 0) else [h]
    density = dense_parts(net_depth, parts).astype(f32)
    bottleneck = dense_parts(net_depth + 1, parts).astype(dtype)

    k0, b0 = params[2 * (net_depth + 2)], params[2 * (net_depth + 2) + 1]
    per_point = jnp.dot(bottleneck, k0[:W])
    vr = view_ray.astype(dtype)
    per_ray = jnp.dot(vr, k0[W:]) + b0.astype(dtype)
    R, Wv = per_ray.shape
    y = per_point.reshape(R, N, Wv) + per_ray[:, None, :]
    y = jnp.maximum(y.reshape(R * N, Wv), 0).astype(dtype)
    ys = [y]
    for j in range(1, nvd):
        y = jnp.maximum(dense_parts(net_depth + 2 + j, [y]), 0) \
            .astype(dtype)
        ys.append(y)
    rgb = dense_parts(net_depth + 2 + nvd, [y]).astype(f32)
    if cfg.get('act') is not None:
        rgb, density = _lean_apply_act(rgb, density, cfg['act'])
    return rgb, density, hs, ys, bottleneck


def _bwd_kernel_lean_hybrid(x_ref, view_ref, g_rgb_ref, g_dens_ref, *refs,
                            cfg):
    """Zero-recompute backward for 'hybrid' mode: the saved activations
    arrive as SEPARATE per-tile streams (they are XLA residuals, never
    packed — packing them would cost an HBM round trip)."""
    net_depth = cfg['net_depth']
    nvd = cfg['net_depth_condition']
    n_saved = net_depth + 1 + nvd
    saved = [r[:] for r in refs[:n_saved]]
    params = [r[:] for r in refs[n_saved:n_saved + cfg['n_params']]]
    dparam_refs = refs[n_saved + cfg['n_params']:]
    hs = saved[:net_depth]
    bottleneck = saved[net_depth]
    ys = saved[net_depth + 1:]
    x = x_ref[:].astype(cfg['dtype'])
    _lean_param_grads(x, view_ref[:], g_rgb_ref[:], g_dens_ref[:], hs, ys,
                      bottleneck, params, dparam_refs, cfg)


def _run_bwd_lean_common(x, view, g_rgb, g_dens, extra, kernel_body, T, cfg,
                         flat_params, interpret):
    """Shared skeleton of the lean backward family: zero-pad the row streams
    to a multiple of the row tile T, stream (x, view, g_rgb, g_dens, *extra)
    per tile, and accumulate full-VMEM parameter-gradient outputs across the
    grid.  The head cotangents stream in SEPARATELY (not packed [T, 3+nd]):
    packing them would force XLA to materialize a fresh [M, 3+nd] array
    (profiled at ~0.9 ms/level of pad+add fusion at the lego shape) just for
    the kernel to unpack it again.  `extra` holds the saved-activation
    streams (none for recompute mode, one packed array for save mode,
    per-tensor XLA residuals for hybrid mode); streams already padded to the
    right row count pass through, anything else is re-padded (an HBM copy —
    off the fast path)."""
    N = cfg['num_samples']
    M = _x_rows(x, cfg)
    Mp = ((M + T - 1) // T) * T
    x, x_spec = _x_pad_spec(x, Mp, T, cfg)
    view = _pad_rows(view, Mp // N)
    cm = bool(cfg.get('cmajor'))
    if cm:
        # Channel-major cotangents [c, M]: ~6 MB physical per level instead
        # of the lane-padded 201 MB of a [M, 3] stream.
        g_rgb = _pad_cols(g_rgb, Mp)
        g_dens = _pad_cols(g_dens, Mp)
        g_specs = [_cmajor_spec(g_rgb.shape[0], T),
                   _cmajor_spec(g_dens.shape[0], T)]
    else:
        g_rgb = _pad_rows(g_rgb, Mp)
        g_dens = _pad_rows(g_dens, Mp)
        g_specs = [_tile_spec_t(g_rgb.shape[1], T),
                   _tile_spec_t(g_dens.shape[1], T)]
    extra = [s if s.shape[0] == Mp else _pad_rows(s[:M], Mp) for s in extra]
    enc_in = _encode_inputs(cfg)
    kernel = functools.partial(kernel_body, cfg=cfg)
    dparam_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                     for p in flat_params]
    # dparam outputs are revisited every grid step (constant index map).
    dparam_specs = [pl.BlockSpec(p.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
                    for p in flat_params]
    return pl.pallas_call(
        kernel,
        out_shape=tuple(dparam_shapes),
        grid=(Mp // T,),
        in_specs=([x_spec,
                   _tile_spec_t(view.shape[1], T // N)]
                  + g_specs
                  + [_tile_spec_t(s.shape[1], T) for s in extra]
                  + [_full_spec() for _ in flat_params]
                  + [_full_spec() for _ in enc_in]),
        out_specs=tuple(dparam_specs),
        interpret=_resolve_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(x, view, g_rgb, g_dens, *extra, *flat_params, *enc_in)


def _run_bwd_lean_hybrid(x, view, g_rgb, g_dens, saved, flat_params, cfg,
                         interpret):
    return _run_bwd_lean_common(
        x, view, g_rgb, g_dens, list(saved), _bwd_kernel_lean_hybrid,
        _lean_tile(_ROW_TILE_LEAN_SAVE, cfg['num_samples']), cfg,
        flat_params, interpret)


def _lean_tile(base, num_samples):
    return max(num_samples, (base // num_samples) * num_samples)


def _lean_saved_widths(cfg, flat_params):
    """Widths of the saved-activation tensors, in kernel output order."""
    W = cfg['net_width']
    Wv = flat_params[2 * (cfg['net_depth'] + 2)].shape[1]
    return ([W] * cfg['net_depth'] + [W] + [Wv] * cfg['net_depth_condition'])


def _run_fwd_lean_save(x, view, flat_params, cfg, interpret):
    N = cfg['num_samples']
    T = _lean_tile(_ROW_TILE_LEAN_SAVE_FWD, N)
    M = _x_rows(x, cfg)
    Mp = ((M + T - 1) // T) * T
    x, x_spec = _x_pad_spec(x, Mp, T, cfg)
    view = _pad_rows(view, Mp // N)
    nd = flat_params[2 * cfg['net_depth']].shape[1]
    pack = 3 + nd
    saved_w = sum(_lean_saved_widths(cfg, flat_params))
    dtype = cfg['dtype']
    grid = (Mp // T,)
    cm = bool(cfg.get('cmajor'))
    enc_in = _encode_inputs(cfg)
    kernel = functools.partial(_fwd_kernel_lean_save, cfg=cfg)
    out, saved = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((pack, Mp) if cm else (Mp, pack),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((Mp, saved_w), dtype)),
        grid=grid,
        in_specs=([x_spec,
                   _tile_spec_t(view.shape[1], T // N)]
                  + [_full_spec() for _ in flat_params]
                  + [_full_spec() for _ in enc_in]),
        out_specs=(_cmajor_spec(pack, T) if cm else _tile_spec_t(pack, T),
                   _tile_spec_t(saved_w, T)),
        interpret=_resolve_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(x, view, *flat_params, *enc_in)
    return (out[:, :M] if cm else out[:M]), saved   # saved stays row-padded


def _run_bwd_lean_save(x, view, g_rgb, g_dens, saved, flat_params, cfg,
                       interpret):
    return _run_bwd_lean_common(
        x, view, g_rgb, g_dens, [saved], _bwd_kernel_lean_save,
        _lean_tile(_ROW_TILE_LEAN_SAVE, cfg['num_samples']), cfg,
        flat_params, interpret)


def _run_fwd_lean(x, view, flat_params, cfg, interpret):
    N = cfg['num_samples']
    T = _lean_tile(_ROW_TILE, N)
    M = _x_rows(x, cfg)
    Mp = ((M + T - 1) // T) * T
    x, x_spec = _x_pad_spec(x, Mp, T, cfg)
    view = _pad_rows(view, Mp // N)
    nd = flat_params[2 * cfg['net_depth']].shape[1]
    pack = 3 + nd
    grid = (Mp // T,)
    cm = bool(cfg.get('cmajor'))
    enc_in = _encode_inputs(cfg)
    kernel = functools.partial(_fwd_kernel_lean, cfg=cfg)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((pack, Mp) if cm else (Mp, pack),
                                       jnp.float32),
        grid=grid,
        in_specs=([x_spec,
                   _tile_spec_t(view.shape[1], T // N)]
                  + [_full_spec() for _ in flat_params]
                  + [_full_spec() for _ in enc_in]),
        out_specs=_cmajor_spec(pack, T) if cm else _tile_spec_t(pack, T),
        interpret=_resolve_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(x, view, *flat_params, *enc_in)
    return out[:, :M] if cm else out[:M]


def _run_bwd_lean(x, view, g_rgb, g_dens, flat_params, cfg, interpret):
    return _run_bwd_lean_common(
        x, view, g_rgb, g_dens, [], _bwd_kernel_lean,
        _lean_tile(_ROW_TILE_BWD, cfg['num_samples']), cfg,
        flat_params, interpret)


# ---------------------------------------------------------------------------
# Render fusion: volumetric compositing inside the lean megakernel.
#
# A lean tile of T rows holds T/N COMPLETE rays (T is always a multiple of
# num_samples), so per-ray alpha compositing (ops/render.py:
# volumetric_rendering, reference models/mip.py:366-401) can run in the
# kernel epilogue: rgb and density never touch HBM at all, and the kernel
# emits per-RAY outputs (comp_rgb, acc, raw distance, weights) that are
# ~N x smaller than the per-sample streams.  This removes the XLA-side
# compositing cluster that runs at 3/128 lane utilization on [M, 3]-minor
# tensors (profiled ~4.5 ms/step at the lego shape: multiply_reduce
# fusions, [M, 1] relayout copies, broadcasts — xplane trace,
# tools/xplane_summary.py).  In-kernel, each channel is reshaped to a
# full-lane [R, N] plane and the exclusive cumsum runs as a strictly-
# triangular matmul on the otherwise-idle MXU.
#
# The backward takes the per-ray cotangents (g_comp, g_dist, g_acc,
# g_weights — weights feed the distortion loss outside), recomputes the
# composite from the saved/recomputed activations, and hands per-sample
# raw-head cotangents to the shared gradient core.  delta / t-midpoint
# inputs are parameter-free (stop_resample_grad is required by the lean
# family), so their cotangents are structurally zero like x/view.
# ---------------------------------------------------------------------------


def _strict_tri(N, upper: bool):
    """[N, N] f32 mask: upper -> 1 where row < col (exclusive prefix when
    right-multiplied), else 1 where row > col (exclusive suffix)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    return ((r < c) if upper else (r > c)).astype(jnp.float32)


# Mosaic cannot lower [T, 1] <-> [R, N] shape casts (infer-vector-layout:
# unsupported shape cast), so the per-sample-column <-> per-ray-plane
# conversions run as ONE-HOT MATMULS on the otherwise-idle MXU:
#   seg[t, r] = [t // N == r]   (ray membership,   [T, R])
#   q[t, n]   = [t %  N == n]   (in-ray position,  [T, N])
# col->plane: (seg * col)^T-contract-q; plane->col: lane-reduce of
# (seg @ plane) * q.  Exact (one-hot rows, f32 HIGHEST); ~8 MFLOP per
# conversion at T=2048 vs the tile's ~2.3 GFLOP trunk.


def _seg_mats(T, N):
    R = T // N
    t = jax.lax.broadcasted_iota(jnp.int32, (T, R), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
    seg = ((t // N) == r).astype(jnp.float32)
    t2 = jax.lax.broadcasted_iota(jnp.int32, (T, N), 0)
    n2 = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    q = ((t2 % N) == n2).astype(jnp.float32)
    return seg, q


def _dot_hi(a, b, contract):
    """f32 dot for the composite's one-hot / 0-1-mask matmuls.  HIGHEST
    (6-pass f32 emulation) keeps them exact; Mosaic rejects
    Precision.HIGH ("Unsupported dot precision"), and DEFAULT would
    truncate the f32 operand to bf16.  These dots are tiny next to the
    trunk (~8 MFLOP per conversion at T=2048 vs ~2.3 GFLOP)."""
    return jax.lax.dot_general(
        a, b, (contract, ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _col_to_rays(col, seg, q):
    """[T, 1] -> [R, N] (row-major ray blocks)."""
    return _dot_hi(seg * col, q, ((0,), (0,)))


def _rays_to_col(z, seg, q):
    """[R, N] -> [T, 1]."""
    rows = _dot_hi(seg, z, ((1,), (0,)))          # [T, N]
    return jnp.sum(rows * q, axis=-1, keepdims=True)


def _per_ray(x_ray, seg):
    """[R, k] -> [T, k] (broadcast each ray's row over its samples)."""
    return _dot_hi(seg, x_ray, ((1,), (0,)))


def _ray_reduce(x_col, seg):
    """[T, k] -> [R, k] (sum each ray's samples)."""
    return _dot_hi(seg, x_col, ((0,), (0,)))


def _composite_parts(sigma_a, delta_rays, seg, q, cfg):
    """sigma_a [T, 1] / delta_rays [R, N] f32 -> (dd, alpha, trans, w)
    [R, N] and w_col [T, 1].  delta arrives as a full-lane per-ray plane
    (its natural producer layout — no [M, 2] lane-padded stream), so the
    sigma*delta product happens after the col->plane conversion; identical
    values (the conversion is a one-hot relabeling)."""
    N = cfg['num_samples']
    dd = _col_to_rays(sigma_a, seg, q) * delta_rays
    alpha = 1.0 - jnp.exp(-dd)
    s_excl = _dot_hi(dd, _strict_tri(N, upper=True), ((1,), (0,)))
    trans = jnp.exp(-s_excl)
    w = alpha * trans
    return dd, alpha, trans, w, _rays_to_col(w, seg, q)


def _lean_composite(rgb_a, sigma_a, delta_rays, mids_rays, cfg):
    """Per-ray composite: -> (perray [R, 8] = comp_rgb | acc | dist_raw |
    3 zero pad lanes, weights [R, N]).  dist_raw is the UNCLAMPED expected
    distance — the reference's nan_to_num + clip runs outside on the tiny
    [B] tensor.  comp/acc come out of ONE [T, 4] -> [R, 4] reduce matmul;
    dist is a lane reduce of w * mids in the per-ray plane (mids never
    needs a per-sample column)."""
    N = cfg['num_samples']
    T = rgb_a.shape[0]
    seg, q = _seg_mats(T, N)
    _, _, _, w, w_col = _composite_parts(sigma_a, delta_rays, seg, q, cfg)
    stacked = jnp.concatenate(
        [rgb_a, jnp.ones_like(sigma_a)], axis=-1)                # [T, 4]
    red = _ray_reduce(w_col * stacked, seg)                      # [R, 4]
    comp, acc = red[:, :3], red[:, 3:4]
    dist = jnp.sum(w * mids_rays, axis=-1, keepdims=True)        # [R, 1]
    if cfg['render']['white_bkgd']:
        comp = comp + (1.0 - acc)
    perray = jnp.concatenate(
        [comp, acc, dist, jnp.zeros_like(comp)], axis=-1)
    return perray, w


def _lean_render_head_cotangents(rgb_a, sigma_a, delta_rays, mids_rays,
                                 g_perray, g_w_in, cfg):
    """Backward of _lean_composite: packed per-ray cotangents
    (g_perray [R, 8] = g_comp | g_acc | g_dist | pad, g_w_in [R, N]) ->
    activated-head cotangents (g_rgb_a [T, 3], g_sigma_a [T, 1])."""
    N = cfg['num_samples']
    T = rgb_a.shape[0]
    seg, q = _seg_mats(T, N)
    dd, alpha, trans, w, w_col = _composite_parts(sigma_a, delta_rays,
                                                  seg, q, cfg)
    g_comp = g_perray[:, :3]
    ga = g_perray[:, 3:4]
    if cfg['render']['white_bkgd']:
        ga = ga - jnp.sum(g_comp, axis=-1, keepdims=True)
    # dist's contribution to g_w lives in the per-ray plane; acc's and
    # comp's accumulate in column space via one [R, 4] -> [T, 4]
    # broadcast matmul, one multiply, one lane reduce.
    g_rows = _per_ray(jnp.concatenate([ga, g_comp], axis=-1), seg)  # [T, 4]
    mult = jnp.concatenate(
        [jnp.ones_like(sigma_a), rgb_a], axis=-1)                # [T, 4]
    g_w_col = jnp.sum(g_rows * mult, axis=-1, keepdims=True)
    g_w = (g_w_in + g_perray[:, 4:5] * mids_rays
           + _col_to_rays(g_w_col, seg, q))
    g_alpha = g_w * trans
    g_s_excl = -trans * (g_w * alpha)
    g_dd = jnp.exp(-dd) * g_alpha + _dot_hi(
        g_s_excl, _strict_tri(N, upper=False), ((1,), (0,)))
    g_rgb_a = w_col * g_rows[:, 1:4]
    g_sigma_a = _rays_to_col(g_dd * delta_rays, seg, q)
    return g_rgb_a, g_sigma_a


def _fwd_kernel_lean_render(x_ref, view_ref, delta_ref, mids_ref, *refs,
                            cfg, save: bool):
    n_params = cfg['n_params']
    ne = _n_enc(cfg)
    params = [r[:] for r in refs[:n_params]]
    outs = refs[n_params + ne:]
    x = _load_x(x_ref, refs[n_params:n_params + ne], cfg)
    rgb, density, hs, ys, bottleneck = _fwd_body_lean(
        x, view_ref[:], params, cfg)          # activated (cfg['act'] set)
    perray, w = _lean_composite(rgb, density, delta_ref[:], mids_ref[:],
                                cfg)
    outs[0][:] = perray
    outs[1][:] = w
    if save:
        outs[2][:] = jnp.concatenate(hs + [bottleneck] + ys, axis=-1)


def _bwd_kernel_lean_render(x_ref, view_ref, delta_ref, mids_ref, gp_ref,
                            gw_ref, *refs, cfg, save: bool):
    """Render-fused backward: rebuild the activated heads (from the saved
    stream in save mode, by recompute otherwise), run the composite
    backward, fold the activation derivatives, then the shared gradient
    core."""
    net_depth = cfg['net_depth']
    nvd = cfg['net_depth_condition']
    skip = cfg['skip_index']
    n_params = cfg['n_params']
    ne = _n_enc(cfg)
    f32 = jnp.float32
    vr = view_ref[:]
    if save:
        saved_ref = refs[0]
        params = [r[:] for r in refs[1:1 + n_params]]
        enc_refs = refs[1 + n_params:1 + n_params + ne]
        dparam_refs = refs[1 + n_params + ne:]
        packed = saved_ref[:]
        parts, off = [], 0
        for wd in cfg['saved_widths']:
            parts.append(packed[:, off:off + wd])
            off += wd
        hs, bottleneck, ys = (parts[:net_depth], parts[net_depth],
                              parts[net_depth + 1:])
        x = _load_x(x_ref, enc_refs, cfg)
    else:
        params = [r[:] for r in refs[:n_params]]
        enc_refs = refs[n_params:n_params + ne]
        dparam_refs = refs[n_params + ne:]
        x = _load_x(x_ref, enc_refs, cfg)
        _, _, hs, ys, bottleneck = _fwd_body_lean(
            x, vr, params, {**cfg, 'act': None})

    # Raw heads from the activations (two small matmuls), then the
    # activated values the composite backward needs.
    pad, bias = cfg['act']
    i_rgb = 2 * (net_depth + 2 + nvd)
    raw_rgb = jnp.dot(ys[-1], params[i_rgb], preferred_element_type=f32) \
        + params[i_rgb + 1].astype(f32)
    h_last = hs[-1]
    if (net_depth - 1) % skip == 0 and net_depth - 1 > 0:
        h_last = jnp.concatenate([h_last, x], axis=-1)
    raw_d = jnp.dot(h_last, params[2 * net_depth],
                    preferred_element_type=f32) \
        + params[2 * net_depth + 1].astype(f32)
    rgb_a, sigma_a = _lean_apply_act(raw_rgb, raw_d, cfg['act'])

    g_rgb_a, g_sigma_a = _lean_render_head_cotangents(
        rgb_a, sigma_a, delta_ref[:], mids_ref[:],
        gp_ref[:], gw_ref[:], cfg)

    sig = jax.nn.sigmoid(raw_rgb)
    g_rgb = g_rgb_a * ((1.0 + 2.0 * pad) * sig * (1.0 - sig))
    g_dens = g_sigma_a * jax.nn.sigmoid(raw_d + bias)
    _lean_param_grads(x, vr, g_rgb, g_dens, hs, ys, bottleneck, params,
                      dparam_refs, {**cfg, 'act': None})


def _run_fwd_lean_render(x, view, delta, mids, flat_params, cfg, interpret,
                         save: bool):
    N = cfg['num_samples']
    T = _lean_tile(_ROW_TILE_LEAN_SAVE_FWD if save else _ROW_TILE, N)
    M = _x_rows(x, cfg)
    Mp = ((M + T - 1) // T) * T
    R = Mp // N                       # padded ray count
    Rt = T // N                       # rays per tile
    B = M // N                        # real ray count
    x, x_spec = _x_pad_spec(x, Mp, T, cfg)
    view = _pad_rows(view, R)
    delta = _pad_rows(delta, R)
    mids = _pad_rows(mids, R)
    saved_w = sum(cfg['saved_widths'])
    dtype = cfg['dtype']
    out_shapes = [jax.ShapeDtypeStruct((R, 8), jnp.float32),
                  jax.ShapeDtypeStruct((R, N), jnp.float32)]
    out_specs = [_tile_spec_t(8, Rt), _tile_spec_t(N, Rt)]
    if save:
        out_shapes.append(jax.ShapeDtypeStruct((Mp, saved_w), dtype))
        out_specs.append(_tile_spec_t(saved_w, T))
    enc_in = _encode_inputs(cfg)
    kernel = functools.partial(_fwd_kernel_lean_render, cfg=cfg, save=save)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(Mp // T,),
        in_specs=([x_spec,
                   _tile_spec_t(view.shape[1], Rt),
                   _tile_spec_t(N, Rt), _tile_spec_t(N, Rt)]
                  + [_full_spec() for _ in flat_params]
                  + [_full_spec() for _ in enc_in]),
        out_specs=tuple(out_specs),
        interpret=_resolve_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(x, view, delta, mids, *flat_params, *enc_in)
    perray, w = outs[:2]
    saved = outs[2] if save else None
    return (perray[:B], w[:B]), saved


def _run_bwd_lean_render(x, view, delta, mids, g_perray, g_w,
                         saved, flat_params, cfg, interpret, save: bool):
    N = cfg['num_samples']
    T = _lean_tile(_ROW_TILE_LEAN_SAVE if save else _ROW_TILE_BWD, N)
    M = _x_rows(x, cfg)
    Mp = ((M + T - 1) // T) * T
    R = Mp // N
    Rt = T // N
    x, x_spec = _x_pad_spec(x, Mp, T, cfg)
    view = _pad_rows(view, R)
    delta = _pad_rows(delta, R)
    mids = _pad_rows(mids, R)
    g_perray = _pad_rows(g_perray, R)
    g_w = _pad_rows(g_w, R)
    extra = []
    if save:
        extra = [saved if saved.shape[0] == Mp
                 else _pad_rows(saved[:M], Mp)]
    kernel = functools.partial(_bwd_kernel_lean_render, cfg=cfg, save=save)
    dparam_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                     for p in flat_params]
    dparam_specs = [pl.BlockSpec(p.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
                    for p in flat_params]
    enc_in = _encode_inputs(cfg)
    return pl.pallas_call(
        kernel,
        out_shape=tuple(dparam_shapes),
        grid=(Mp // T,),
        in_specs=([x_spec,
                   _tile_spec_t(view.shape[1], Rt),
                   _tile_spec_t(N, Rt), _tile_spec_t(N, Rt),
                   _tile_spec_t(8, Rt), _tile_spec_t(N, Rt)]
                  + [_tile_spec_t(s.shape[1], T) for s in extra]
                  + [_full_spec() for _ in flat_params]
                  + [_full_spec() for _ in enc_in]),
        out_specs=tuple(dparam_specs),
        interpret=_resolve_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(x, view, delta, mids, g_perray, g_w, *extra, *flat_params, *enc_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11,
                                                    12, 13, 14))
def fused_mlp_lean_render(x, view, delta, mids, flat_params,
                          num_samples: int, net_depth: int,
                          net_depth_condition: int, skip_index: int,
                          compute_dtype=jnp.bfloat16, interpret=None,
                          mode: str = 'save', act=(0.001, -1.0),
                          white_bkgd: bool = True, encode=None):
    """Level megakernel: MLP + head activations + volumetric compositing in
    one pallas_call.  (x [M, F], view [M/N, Fv], delta [M/N, N] =
    (t1 - t0) * ||dir||, mids [M/N, N] = 0.5 (t0 + t1), params) ->
    (comp_rgb [M/N, 3], dist_raw [M/N, 1], acc [M/N, 1], weights [M/N, N]).
    delta / mids stream as full-lane per-ray [R, N] planes — their natural
    producer layout (no [M, 2] lane-padded column stream).

    Numerically equivalent to MLP + models/mipnerf.py's head epilogue +
    ops/render.py:volumetric_rendering with the distance clamp left to the
    caller (dist_raw is unclamped).  The exclusive transmittance cumsum
    runs as a strictly-triangular [N, N] matmul (f32, HIGHEST) — summation
    order differs from XLA's scan at the ~1e-6 level.  NON-DIFFERENTIABLE
    in x / view / delta / mids (zero cotangents): requires
    stop_resample_grad, like the rest of the lean family.  `act` is the
    (rgb_padding, density_bias) pair and is REQUIRED (the composite
    consumes activated heads).

    mode='save' streams activations to HBM for a zero-recompute backward;
    mode='recompute' re-runs the forward per tile in the backward.

    encode=(min_deg, max_deg): fused IPE — `x` is the channel-major
    [2*D, M] f32 moments stream (see fused_mlp_lean).
    """
    if net_depth_condition < 1:
        raise ValueError('fused_mlp_lean_render requires '
                         'net_depth_condition >= 1')
    if act is None:
        raise ValueError('fused_mlp_lean_render requires act=(rgb_padding, '
                         'density_bias) — the composite consumes activated '
                         'heads')
    cfg = _lean_cfg(net_depth, net_depth_condition, skip_index, flat_params,
                    compute_dtype, num_samples, act, encode=encode)
    cfg['render'] = {'white_bkgd': white_bkgd}
    wparams = [p.astype(compute_dtype) for p in flat_params]
    (perray, w), _ = _run_fwd_lean_render(
        x, view, delta.astype(jnp.float32), mids.astype(jnp.float32),
        wparams, cfg, interpret, mode == 'save')
    return perray[:, 0:3], perray[:, 4:5], perray[:, 3:4], w


def _fused_mlp_lean_render_fwd(x, view, delta, mids, flat_params,
                               num_samples, net_depth, net_depth_condition,
                               skip_index, compute_dtype, interpret, mode,
                               act, white_bkgd, encode):
    if net_depth_condition < 1 or act is None:
        raise ValueError('fused_mlp_lean_render requires '
                         'net_depth_condition >= 1 and act')
    cfg = _lean_cfg(net_depth, net_depth_condition, skip_index, flat_params,
                    compute_dtype, num_samples, act, encode=encode)
    cfg['render'] = {'white_bkgd': white_bkgd}
    wparams = [p.astype(compute_dtype) for p in flat_params]
    delta = delta.astype(jnp.float32)
    mids = mids.astype(jnp.float32)
    (perray, w), saved = _run_fwd_lean_render(
        x, view, delta, mids, wparams, cfg, interpret, mode == 'save')
    return ((perray[:, 0:3], perray[:, 4:5], perray[:, 3:4], w),
            (x, view, delta, mids, flat_params, saved))


def _fused_mlp_lean_render_bwd(num_samples, net_depth, net_depth_condition,
                               skip_index, compute_dtype, interpret, mode,
                               act, white_bkgd, encode, res, g):
    g_comp, g_dist, g_acc, g_w = g
    x, view, delta, mids, flat_params, saved = res
    cfg = _lean_cfg(net_depth, net_depth_condition, skip_index, flat_params,
                    compute_dtype, num_samples, act, encode=encode)
    cfg['render'] = {'white_bkgd': white_bkgd}
    wparams = [p.astype(compute_dtype) for p in flat_params]
    # Pack per-ray cotangents to the kernel's [R, 8] stream layout
    # (comp | acc | dist | 3 pad lanes) — one input stream, not four.
    g_perray = jnp.concatenate(
        [g_comp, g_acc, g_dist, jnp.zeros_like(g_comp)],
        axis=-1).astype(jnp.float32)
    outs = _run_bwd_lean_render(
        x, view, delta, mids, g_perray, g_w, saved, wparams,
        cfg, interpret, mode == 'save')
    dparams = [d.reshape(p.shape).astype(p.dtype)
               for d, p in zip(outs, flat_params)]
    return (jnp.zeros_like(x), jnp.zeros_like(view),
            jnp.zeros_like(delta), jnp.zeros_like(mids),
            tuple(dparams))


fused_mlp_lean_render.defvjp(_fused_mlp_lean_render_fwd,
                             _fused_mlp_lean_render_bwd)


def _lean_cfg(net_depth, net_depth_condition, skip_index, flat_params,
              compute_dtype, num_samples, act=None, cmajor=False,
              encode=None):
    cfg = _cfg(net_depth, net_depth_condition, skip_index,
               flat_params[0].shape[1], len(flat_params), compute_dtype)
    cfg['num_samples'] = num_samples
    cfg['saved_widths'] = _lean_saved_widths(cfg, flat_params)
    cfg['act'] = act
    cfg['cmajor'] = cmajor
    cfg['encode'] = encode
    return cfg


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
def fused_mlp_lean(x, view, flat_params, num_samples: int, net_depth: int,
                   net_depth_condition: int, skip_index: int,
                   compute_dtype=jnp.bfloat16, interpret=None,
                   mode: str = 'recompute', act=None, cmajor: bool = False,
                   encode=None):
    """Lean megakernel: (x [M, F] any float dtype — cast to the compute
    dtype per tile in VMEM, view [M/num_samples, Fv], params)
    -> (rgb [M, 3], density [M, nd]) f32.

    The underlying pallas_call writes ONE packed [M, 3 + nd] output (a
    single lane-padded row stream); the rgb/density slices returned here
    fuse into their consumers.  Returning them as separate primal outputs
    matters for the BACKWARD: the cotangents then arrive unpacked and
    stream straight into the backward kernel, instead of XLA materializing
    a packed [M, 3 + nd] cotangent (profiled at ~0.9 ms/level of pad+add
    fusion at the lego shape) just for the kernel to unpack.

    Numerically equivalent to models/mlp.py:MLP with use_viewdirs (the rgb
    head assumes num_rgb_channels == 3).  NON-DIFFERENTIABLE in x/view
    (zero cotangents) — see the section comment.

    mode='recompute': the backward re-runs the forward per tile in VMEM
    (zero activation traffic, +1 forward of MXU work).
    mode='save': the forward also streams each activation to HBM once in
    the compute dtype and the backward reads them back — trades ~2 GB/level
    of DMA for the recompute's MXU time, which is the win when the kernel
    is MXU-bound (measured: in-kernel rate ~107 TF/s flat across tile
    sizes, tools/mxu_probe.py stage2).
    mode='hybrid': plain-XLA forward (bandwidth-optimal; its activations
    materialize in HBM for free as autodiff residuals) + the zero-recompute
    Pallas backward streaming them per tile — removes the 'save' forward's
    explicit write cost entirely (fastest measured, DESIGN.md §10).

    cmajor=True: CHANNEL-MAJOR boundary — returns (rgb [3, M], density
    [nd, M]) and expects the cotangents in the same layout.  A [M, 3]
    row-major stream is lane-padded to 128 by the TPU tiled layout (201 MB
    physical for a 4.7 MB tensor at the lego shape); channel-major keeps
    the head streams at their logical size.  The heads are computed
    transposed on the MXU (dense_t) — no in-VMEM transposes anywhere.
    Pallas modes only (the hybrid forward runs in XLA, which composites
    row-major anyway).

    encode=(min_deg, max_deg): FUSED IPE — `x` is the channel-major
    [2*D, M] f32 moments stream (Gaussian means | diagonal covs, D=3) and
    the kernel computes the integrated positional encoding per tile in
    VMEM (see the fused-encode section comment).  Equivalent to feeding
    x = ops.math.integrated_pos_enc((means, covs), min_deg, max_deg);
    requires the diagonal-covariance path.  Pallas modes only.
    """
    if net_depth_condition < 1:
        # A real raise, not an assert: under `python -O` an assert would
        # vanish and _fwd_body_lean would mis-index the rgb head as view_0.
        raise ValueError('fused_mlp_lean requires net_depth_condition >= 1 '
                         '(the view branch); use the "xla" backend for '
                         'net_depth_condition == 0')
    if cmajor and mode == 'hybrid':
        raise ValueError("cmajor is a pallas-boundary layout; mode 'hybrid' "
                         "runs its forward in XLA — use 'recompute'/'save'")
    if encode is not None and mode == 'hybrid':
        raise ValueError("encode is a pallas-boundary fusion; mode 'hybrid' "
                         "runs its forward in XLA — use 'recompute'/'save'")
    cfg = _lean_cfg(net_depth, net_depth_condition, skip_index, flat_params,
                    compute_dtype, num_samples, act, cmajor, encode)
    wparams = [p.astype(compute_dtype) for p in flat_params]
    if mode == 'hybrid':
        rgb, density, _, _, _ = _fwd_body_lean_xla(
            x.astype(compute_dtype), view, wparams, cfg)
        return rgb, density
    out = _run_fwd_lean(x, view, wparams, cfg, interpret)
    return (out[:3], out[3:]) if cmajor else (out[:, :3], out[:, 3:])


def _fused_mlp_lean_fwd(x, view, flat_params, num_samples, net_depth,
                        net_depth_condition, skip_index, compute_dtype,
                        interpret, mode, act, cmajor, encode):
    cfg = _lean_cfg(net_depth, net_depth_condition, skip_index, flat_params,
                    compute_dtype, num_samples, act, cmajor, encode)
    wparams = [p.astype(compute_dtype) for p in flat_params]
    if mode == 'hybrid':
        rgb, density, hs, ys, bottleneck = _fwd_body_lean_xla(
            x.astype(compute_dtype), view, wparams, cfg)
        return (rgb, density), (x, view, flat_params,
                                tuple(hs) + (bottleneck,) + tuple(ys))
    if mode == 'save':
        out, saved = _run_fwd_lean_save(x, view, wparams, cfg, interpret)
        prim = (out[:3], out[3:]) if cmajor else (out[:, :3], out[:, 3:])
        return prim, (x, view, flat_params, saved)
    out = _run_fwd_lean(x, view, wparams, cfg, interpret)
    prim = (out[:3], out[3:]) if cmajor else (out[:, :3], out[:, 3:])
    return prim, (x, view, flat_params, None)


def _fused_mlp_lean_bwd(num_samples, net_depth, net_depth_condition,
                        skip_index, compute_dtype, interpret, mode, act,
                        cmajor, encode, res, g):
    g_rgb, g_dens = g
    x, view, flat_params, saved = res
    cfg = _lean_cfg(net_depth, net_depth_condition, skip_index, flat_params,
                    compute_dtype, num_samples, act, cmajor, encode)
    wparams = [p.astype(compute_dtype) for p in flat_params]
    if mode == 'hybrid':
        outs = _run_bwd_lean_hybrid(x.astype(compute_dtype), view, g_rgb,
                                    g_dens, list(saved), wparams, cfg,
                                    interpret)
    elif mode == 'save':
        outs = _run_bwd_lean_save(x, view, g_rgb, g_dens, saved, wparams,
                                  cfg, interpret)
    else:
        outs = _run_bwd_lean(x, view, g_rgb, g_dens, wparams, cfg, interpret)
    dparams = [d.reshape(p.shape).astype(p.dtype)
               for d, p in zip(outs, flat_params)]
    return (jnp.zeros_like(x), jnp.zeros_like(view), tuple(dparams))


fused_mlp_lean.defvjp(_fused_mlp_lean_fwd, _fused_mlp_lean_bwd)
