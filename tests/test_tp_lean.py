"""TP-composable lean kernel (kernels/tp_lean.py) on the virtual mesh.

DESIGN.md §11 / round-3 VERDICT item 7: at W=1024 the single-chip lean
megakernel cannot exist (measured 99.97 MB scoped-VMEM vs the 96 MB limit,
BENCH_W1024.json); the Megatron pair-megakernel under shard_map holds only
1/n-width panels per device.  These tests prove the sharded forward runs at
W=1024 on the 8-device CPU mesh and is numerically the single-chip lean
forward (kernels/mlp.py:_fwd_body_lean) up to psum ordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipnerf_pl_tpu.kernels.mlp import _fwd_body_lean, _lean_cfg
from mipnerf_pl_tpu.kernels.tp_lean import tp_lean_forward
from mipnerf_pl_tpu.parallel.mesh import create_mesh


def _flat_params(rng, f_x, f_v, W, wv, net_depth=8, nvd=1, skip=4, nd=1):
    """Random params in the lean flat layout
    (models/mlp.py:_declare_flat_params): trunk k/b pairs (skip layers
    widened), density, bottleneck, view_0 [W+f_v, wv], extra view layers,
    rgb."""
    def kb(fin, fout):
        return [rng.normal(size=(fin, fout)).astype(np.float32)
                * (1.0 / np.sqrt(fin)),
                rng.normal(size=(1, fout)).astype(np.float32) * 0.1]

    flat = []
    fin = f_x
    for i in range(net_depth):
        flat += kb(fin, W)
        fin = W + f_x if (i % skip == 0 and i > 0) else W
    flat += kb(W, nd)           # density head
    flat += kb(W, W)            # bottleneck
    flat += kb(W + f_v, wv)     # view_0 (split matmul rows: bottleneck|view)
    for _ in range(1, nvd):
        flat += kb(wv, wv)
    flat += kb(wv, 3)           # rgb head
    return [jnp.asarray(p) for p in flat]


def _reference(x, view, flat, num_samples, net_depth, nvd, skip, W):
    """Single-chip lean forward at full width (the anchor)."""
    cfg = _lean_cfg(net_depth, nvd, skip, flat, jnp.float32, num_samples)
    rgb, density, _, _, _ = _fwd_body_lean(
        jnp.asarray(x), jnp.asarray(view), flat, cfg)
    return np.asarray(rgb), np.asarray(density)


@pytest.mark.parametrize('W', [256, 1024])
def test_tp_lean_forward_matches_single_chip(W):
    """dp=4 x tp=2: the pair-megakernel TP forward must equal the
    single-chip lean forward.  W=1024 is THE motivating shape — the width
    where the single-chip VMEM-resident kernel stops existing."""
    mesh = create_mesh(model_axis=2)
    rng = np.random.default_rng(0)
    N, R = 8, 64                      # 512 rows; 64 per-device rows x 8
    f_x, f_v, wv = 96, 27, 128
    x = rng.normal(size=(R * N, f_x)).astype(np.float32)
    view = rng.normal(size=(R, f_v)).astype(np.float32)
    flat = _flat_params(rng, f_x, f_v, W, wv)

    rgb_ref, dens_ref = _reference(x, view, flat, N, 8, 1, 4, W)
    rgb, dens = tp_lean_forward(
        jnp.asarray(x), jnp.asarray(view), flat, mesh, num_samples=N,
        compute_dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(rgb), rgb_ref,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dens), dens_ref,
                               rtol=2e-4, atol=2e-4)


def test_tp_lean_forward_tp4():
    """model=4: generality beyond the provisioned tp=2 (width panels W/4)."""
    mesh = create_mesh(model_axis=4)
    assert mesh.shape == {'data': 2, 'model': 4}
    rng = np.random.default_rng(1)
    N, R = 4, 32
    f_x, f_v, W, wv = 32, 27, 64, 16
    x = rng.normal(size=(R * N, f_x)).astype(np.float32)
    view = rng.normal(size=(R, f_v)).astype(np.float32)
    flat = _flat_params(rng, f_x, f_v, W, wv)

    rgb_ref, dens_ref = _reference(x, view, flat, N, 8, 1, 4, W)
    rgb, dens = tp_lean_forward(
        jnp.asarray(x), jnp.asarray(view), flat, mesh, num_samples=N,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dens), dens_ref,
                               rtol=2e-4, atol=2e-4)


def _grads(fwd_fn, x, view, flat, seed):
    """Grads of a random-cotangent linear loss — a direct VJP probe: any
    wrong dgrad panel, mask, or missing psum shifts some leaf."""
    rng = np.random.default_rng(seed)
    rgb0, dens0 = fwd_fn(jnp.asarray(x), jnp.asarray(view), flat)
    cr = jnp.asarray(rng.normal(size=rgb0.shape).astype(np.float32))
    cd = jnp.asarray(rng.normal(size=dens0.shape).astype(np.float32))

    def loss(args):
        x_, view_, flat_ = args
        rgb, dens = fwd_fn(x_, view_, flat_)
        return jnp.sum(rgb * cr) + jnp.sum(dens * cd)

    return jax.grad(loss)((jnp.asarray(x), jnp.asarray(view), flat))


def _assert_grads_close(g, g_ref):
    gx, gv, gf = g
    rx, rv, rf = g_ref
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=1e-3, atol=1e-4)
    for i, (a, b) in enumerate(zip(gf, rf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=f'flat param {i}')


def test_tp_lean_grad_matches_single_chip_w1024():
    """THE training story (VERDICT r4 missing #2): jax.grad through the
    TP pair-megakernels at W=1024 — the width where the single-chip
    VMEM-resident kernel cannot exist — must equal the full-width
    single-chip lean backward, leaf for leaf (pair custom-VJP recompute
    kernels + shard_map-transposed psums = the Megatron backward)."""
    mesh = create_mesh(model_axis=2)
    rng = np.random.default_rng(0)
    N, R = 8, 64
    f_x, f_v, W, wv = 96, 27, 1024, 128
    x = rng.normal(size=(R * N, f_x)).astype(np.float32)
    view = rng.normal(size=(R, f_v)).astype(np.float32)
    flat = _flat_params(rng, f_x, f_v, W, wv)

    def fwd_tp(x_, view_, flat_):
        return tp_lean_forward(x_, view_, flat_, mesh, num_samples=N,
                               compute_dtype=jnp.float32)

    def fwd_ref(x_, view_, flat_):
        cfg = _lean_cfg(8, 1, 4, flat_, jnp.float32, N)
        rgb, density, _, _, _ = _fwd_body_lean(x_, view_, flat_, cfg)
        return rgb, density

    _assert_grads_close(_grads(fwd_tp, x, view, flat, seed=3),
                        _grads(fwd_ref, x, view, flat, seed=3))


def test_tp_lean_grad_tp4():
    """model=4 grads: the skip-pair x-rows (device-0 exactly-once mask)
    and every psum transpose must survive a wider model axis."""
    mesh = create_mesh(model_axis=4)
    rng = np.random.default_rng(1)
    N, R = 4, 32
    f_x, f_v, W, wv = 32, 27, 64, 16
    x = rng.normal(size=(R * N, f_x)).astype(np.float32)
    view = rng.normal(size=(R, f_v)).astype(np.float32)
    flat = _flat_params(rng, f_x, f_v, W, wv)

    def fwd_tp(x_, view_, flat_):
        return tp_lean_forward(x_, view_, flat_, mesh, num_samples=N,
                               compute_dtype=jnp.float32)

    def fwd_ref(x_, view_, flat_):
        cfg = _lean_cfg(8, 1, 4, flat_, jnp.float32, N)
        rgb, density, _, _, _ = _fwd_body_lean(x_, view_, flat_, cfg)
        return rgb, density

    _assert_grads_close(_grads(fwd_tp, x, view, flat, seed=4),
                        _grads(fwd_ref, x, view, flat, seed=4))


def test_tp_lean_validates_shapes():
    mesh = create_mesh(model_axis=2)
    rng = np.random.default_rng(2)
    flat = _flat_params(rng, 8, 3, 17, 8)   # width 17 % 2 != 0
    with pytest.raises(ValueError, match='divisible'):
        tp_lean_forward(jnp.zeros((16, 8)), jnp.zeros((4, 3)), flat, mesh,
                        num_samples=4)
