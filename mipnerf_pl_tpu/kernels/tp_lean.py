"""TP-composable lean MLP: Megatron pair-megakernels under shard_map.

Why this exists (DESIGN.md §11): the single-chip lean megakernel holds the
WHOLE trunk's weights VMEM-resident, which stops existing at W=1024 — the
measured Mosaic scoped-VMEM allocation is 99.97 MB against the 96 MB limit
(BENCH_W1024.json anchors the single-chip W=1024 row: XLA 242.12 ms/step).
Tensor parallelism is the memory knob that brings a VMEM-resident design
back: shard the trunk Megatron-style over the mesh's `model` axis so each
device's kernel only ever holds HALVED (1/n) weight panels.

Design — explicit shard_map + per-device Pallas PAIR kernels, not GSPMD
auto-partitioning (GSPMD treats a pallas_call as one opaque unit: it can
partition its batch dim, but `model`-sharded weights get all-gathered back
to full width at the kernel boundary, reintroducing the exact VMEM wall TP
is supposed to remove):

  * The trunk runs in Megatron PAIRS (col-parallel even layer, row-parallel
    odd layer).  Per pair, ONE pallas kernel computes
        partial = relu(h @ Wcol_local + bcol_local) @ Wrow_local
    entirely in VMEM — the [T, W/n] col activation never touches HBM — and
    the pair boundary is a single f32 psum over `model` (the only
    collective per pair, placed explicitly, rides ICI).
  * The skip concat (reference models/mip_nerf.py:94-97; here it fires
    after even layer `skip_index`, so it lands INSIDE a pair): the row
    kernel's x-rows are a separate REPLICATED panel whose contribution is
    added by device 0 only (axis_index mask — exactly-once, no 1/n
    rescaling noise).
  * Heads (density / bottleneck / view / rgb) are thin: plain XLA inside
    the shard_map body, bottleneck + view_0 col-parallel with one final
    psum, density/rgb replicated.  At head widths 1/3 this is noise; the
    VMEM story is entirely the trunk pairs.

Training (VERDICT r4 missing #2): the trunk pairs carry a custom VJP whose
backward is the same VMEM-resident recompute pattern — `_pair_bwd_kernel`
re-derives the [T, W/n] col activation from the pair inputs (it was never
written to HBM, so the backward can't read it; recomputing one col dense is
cheaper than saving an [M, W/n] stream at these shapes), then produces dx
and the three param-grad accumulators in one kernel, accumulated across the
sequential row-tile grid.  Everything outside the pairs (psums, skip
x-term, heads) is plain jnp that JAX transposes — shard_map's transpose
psums the per-device cotangents of replicated/col/row panels into exactly
the Megatron backward (column/row dgrads + psum on the row boundary), so
`jax.grad` through `tp_lean_forward` IS the TP training backward.  Grad
parity vs the full-width single-chip lean body is pinned at W=1024 on the
8-device virtual mesh by tests/test_tp_lean.py.

Numerics: identical value pipeline to kernels/mlp.py:_fwd_body_lean
(f32-accum dots + bias, relu, compute-dtype casts) up to psum summation
order; pinned against it at W=1024 on the 8-device virtual mesh by
tests/test_tp_lean.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mipnerf_pl_tpu.kernels.mlp import _resolve_interpret

_ROW_TILE = 2048


def _pair_kernel(x_ref, wc_ref, bc_ref, wr_ref, o_ref, *, dtype):
    """One Megatron pair on one device: col dense + bias + relu at the
    LOCAL width, then the row dense producing the f32 PARTIAL sum (the row
    bias and relu happen after the psum, outside the kernel)."""
    h = jnp.dot(x_ref[:].astype(dtype), wc_ref[:],
                preferred_element_type=jnp.float32) \
        + bc_ref[:].astype(jnp.float32)
    h = jnp.maximum(h, 0.0).astype(dtype)
    o_ref[:] = jnp.dot(h, wr_ref[:], preferred_element_type=jnp.float32)


def _pair_call(x, w_col, b_col, w_row, dtype, interpret):
    """Row-tiled pallas_call of `_pair_kernel`: weights VMEM-resident at
    LOCAL (1/n) width, activations streamed."""
    M, f_in = x.shape
    w_out = w_row.shape[1]
    T = min(_ROW_TILE, M)
    if M % T:
        raise ValueError(f'row count {M} not divisible by tile {T}')
    tile = lambda c: pl.BlockSpec((T, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pair_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((M, w_out), jnp.float32),
        grid=(M // T,),
        in_specs=[tile(x.shape[1]), full, full, full],
        out_specs=tile(w_out),
        interpret=_resolve_interpret(interpret),
    )(x, w_col.astype(dtype), b_col, w_row.astype(dtype))


_BWD_ROW_TILE = 1024


def _pair_bwd_kernel(x_ref, wc_ref, bc_ref, wr_ref, g_ref,
                     dx_ref, dwc_ref, dbc_ref, dwr_ref, *, dtype):
    """Backward of one Megatron pair, one row tile per grid step.

    Recomputes the col activation (never materialized in HBM — the lean
    point), then emits dx for this tile and accumulates the three param
    grads across the sequential TPU grid.  All dots f32-accumulated from
    compute-dtype operands, matching XLA's transpose of the forward."""
    i = pl.program_id(0)
    f32 = jnp.float32
    x = x_ref[:].astype(dtype)
    hpre = jnp.dot(x, wc_ref[:], preferred_element_type=f32) \
        + bc_ref[:].astype(f32)
    h = jnp.maximum(hpre, 0.0).astype(dtype)
    g = g_ref[:].astype(dtype)

    # dWrow = h^T @ g  (contract the row/tile axis)
    dwr = jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    # dh = (g @ Wrow^T) * relu'(hpre)
    dh = jax.lax.dot_general(g, wr_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dh = jnp.where(hpre > 0.0, dh, 0.0)
    dhd = dh.astype(dtype)
    dwc = jax.lax.dot_general(x, dhd, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dbc = jnp.sum(dh, axis=0, keepdims=True)
    dx_ref[:] = jax.lax.dot_general(dhd, wc_ref[:], (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)

    @pl.when(i == 0)
    def _init():
        dwc_ref[:] = jnp.zeros_like(dwc_ref)
        dbc_ref[:] = jnp.zeros_like(dbc_ref)
        dwr_ref[:] = jnp.zeros_like(dwr_ref)

    dwc_ref[:] += dwc
    dbc_ref[:] += dbc
    dwr_ref[:] += dwr


def _pair_bwd_call(x, w_col, b_col, w_row, g, dtype, interpret):
    M, f_in = x.shape
    w_loc = w_col.shape[1]
    w_out = w_row.shape[1]
    T = min(_BWD_ROW_TILE, M)
    if M % T:
        raise ValueError(f'row count {M} not divisible by tile {T}')
    tile = lambda c: pl.BlockSpec((T, c), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    acc = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dx, dwc, dbc, dwr = pl.pallas_call(
        functools.partial(_pair_bwd_kernel, dtype=dtype),
        out_shape=(jax.ShapeDtypeStruct((M, f_in), f32),
                   jax.ShapeDtypeStruct((f_in, w_loc), f32),
                   jax.ShapeDtypeStruct((1, w_loc), f32),
                   jax.ShapeDtypeStruct((w_loc, w_out), f32)),
        grid=(M // T,),
        in_specs=[tile(f_in), full, full, full, tile(w_out)],
        out_specs=(tile(f_in), acc(f_in, w_loc), acc(1, w_loc),
                   acc(w_loc, w_out)),
        interpret=_resolve_interpret(interpret),
    )(x, w_col.astype(dtype), b_col, w_row.astype(dtype), g)
    return dx, dwc, dbc, dwr


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _pair(x, w_col, b_col, w_row, dtype, interpret):
    """Differentiable Megatron pair: `_pair_call` forward, VMEM-resident
    recompute backward.  Residuals are the pair INPUTS only — the col
    activation is recomputed inside `_pair_bwd_kernel`."""
    return _pair_call(x, w_col, b_col, w_row, dtype, interpret)


def _pair_fwd(x, w_col, b_col, w_row, dtype, interpret):
    return (_pair_call(x, w_col, b_col, w_row, dtype, interpret),
            (x, w_col, b_col, w_row))


def _pair_bwd(dtype, interpret, res, g):
    x, w_col, b_col, w_row = res
    dx, dwc, dbc, dwr = _pair_bwd_call(x, w_col, b_col, w_row, g,
                                       dtype, interpret)
    return (dx.astype(x.dtype), dwc.astype(w_col.dtype),
            dbc.astype(b_col.dtype), dwr.astype(w_row.dtype))


_pair.defvjp(_pair_fwd, _pair_bwd)


def tp_lean_forward(x, view, flat_params, mesh: Mesh, num_samples: int,
                    net_depth: int = 8, net_depth_condition: int = 1,
                    skip_index: int = 4, compute_dtype=jnp.bfloat16,
                    interpret=None):
    """Forward pass of the lean MLP, tensor-parallel over `mesh`'s `model`
    axis and data-parallel over its `data` axis.

    Args mirror kernels/mlp.py:fused_mlp_lean — x [M, F] f32 encode, view
    [M/num_samples, Fv], `flat_params` the lean flat layout
    (models/mlp.py:_declare_flat_params) with FULL (unsharded) shapes; the
    sharding is internal.  Returns (raw_rgb [M, 3], raw_density [M, nd])
    f32 — the same raw heads, same math, as the single-chip lean forward.

    Requirements: even net_depth, even skip_index (so the skip concat
    lands inside a pair), trunk width divisible by the model-axis size,
    per-device row count divisible by the row tile.
    """
    n_model = mesh.shape['model']
    if net_depth % 2:
        raise ValueError('tp_lean_forward needs an even net_depth')
    if skip_index % 2:
        raise ValueError('tp_lean_forward needs an even skip_index')
    W = flat_params[0].shape[1]
    if W % n_model:
        raise ValueError(f'net_width {W} not divisible by model={n_model}')
    nvd = net_depth_condition
    skips = {i for i in range(skip_index, net_depth, skip_index)}

    # --- flatten the params into named slots with explicit specs --------
    # (shard_map specs are per-array, so the skip pair's row kernel and the
    # view_0 kernel are pre-split into their sharded / replicated row
    # blocks here, outside the shard_map.)
    col = P(None, 'model')      # col-parallel kernel / bias: split outputs
    row = P('model', None)      # row-parallel kernel: split inputs
    rep = P(None, None)
    slots: dict[str, tuple] = {}

    def put(name, leaf, spec):
        slots[name] = (leaf, spec)

    for i in range(net_depth):
        k, b = flat_params[2 * i], flat_params[2 * i + 1]
        if i % 2 == 0:
            put(f'k{i}', k, col)
            put(f'b{i}', b, col)
        else:
            # The skip concat fires after even layer j (j % skip == 0,
            # j > 0), so it feeds THIS odd layer i = j + 1: split its
            # kernel into h-rows (sharded) + x-rows (replicated).
            if (i - 1) in skips:
                put(f'k{i}_h', k[:W], row)
                put(f'k{i}_x', k[W:], rep)
            else:
                put(f'k{i}', k, row)
            put(f'b{i}', b, rep)
    nd_i = 2 * net_depth
    put('kd', flat_params[nd_i], rep)
    put('bd', flat_params[nd_i + 1], rep)
    put('kbn', flat_params[nd_i + 2], col)
    put('bbn', flat_params[nd_i + 3], col)
    kv = flat_params[nd_i + 4]
    put('kv_h', kv[:W], row)         # bottleneck rows: sharded like bn cols
    put('kv_v', kv[W:], rep)         # view-direction rows: replicated
    put('bv', flat_params[nd_i + 5], rep)
    for j in range(1, nvd):
        put(f'kv{j}', flat_params[nd_i + 4 + 2 * j], rep)
        put(f'bv{j}', flat_params[nd_i + 5 + 2 * j], rep)
    r_i = nd_i + 4 + 2 * nvd
    put('kr', flat_params[r_i], rep)
    put('br', flat_params[r_i + 1], rep)

    names = list(slots)
    leaves = [slots[n][0] for n in names]
    specs = [slots[n][1] for n in names]
    dtype = compute_dtype
    f32 = jnp.float32

    def body(x, view, *leaves):
        p = dict(zip(names, leaves))
        dev0 = (jax.lax.axis_index('model') == 0).astype(f32)

        def dense(h, k, b):
            return jnp.dot(h.astype(dtype), k.astype(dtype),
                           preferred_element_type=f32) + b.astype(f32)

        h = x
        for e in range(0, net_depth, 2):
            o = e + 1
            k_row = p.get(f'k{o}', p.get(f'k{o}_h'))
            partial = _pair(h, p[f'k{e}'], p[f'b{e}'], k_row,
                            dtype, interpret)
            if e in skips:
                # row layer's input was concat([h_e, x]): add the x-rows'
                # term exactly once (device 0; all devices hold full x).
                partial = partial + dev0 * jnp.dot(
                    x.astype(dtype), p[f'k{o}_x'].astype(dtype),
                    preferred_element_type=f32)
            h = jax.lax.psum(partial, 'model') + p[f'b{o}'].astype(f32)
            h = jnp.maximum(h, 0.0).astype(dtype)

        density = dense(h, p['kd'], p['bd'])
        bottleneck = dense(h, p['kbn'], p['bbn']).astype(dtype)
        pp = jax.lax.psum(
            jnp.dot(bottleneck, p['kv_h'].astype(dtype),
                    preferred_element_type=f32), 'model')
        per_ray = dense(view, p['kv_v'], p['bv'])
        R, wv = per_ray.shape
        pr = jnp.broadcast_to(per_ray[:, None, :],
                              (R, num_samples, wv)).reshape(-1, wv)
        y = jnp.maximum(pp + pr, 0.0).astype(dtype)
        for j in range(1, nvd):
            y = jnp.maximum(dense(y, p[f'kv{j}'], p[f'bv{j}']),
                            0.0).astype(dtype)
        rgb = dense(y, p['kr'], p['br'])
        return rgb, density

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P('data', None), P('data', None), *specs),
        out_specs=(P('data', None), P('data', None)),
        check_vma=False)
    return mapped(x, view, *leaves)
