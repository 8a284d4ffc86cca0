"""Tests for the fused Pallas MLP megakernel vs the Flax reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipnerf_pl_tpu.kernels.mlp import flatten_params, fused_mlp
from mipnerf_pl_tpu.models.mlp import MLP

CFG = dict(net_depth=4, net_width=32, net_depth_condition=1,
           net_width_condition=16, skip_index=2)


def _setup(M=700, xdim=24, vdim=11, seed=0, cfg=CFG):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(M, 1, xdim)).astype(np.float32))
    view = jnp.asarray(rng.normal(size=(M, vdim)).astype(np.float32))
    mlp = MLP(**cfg, compute_dtype=jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), x, view)
    flat = flatten_params(params['params'], cfg['net_depth'],
                          cfg['net_depth_condition'])
    # Per-point layout for the kernel: fold samples into rows, broadcast view.
    x2 = x.reshape(-1, xdim)
    view2 = jnp.repeat(view, x.shape[1], axis=0)
    return mlp, params, flat, x, view, x2, view2


def test_fused_mlp_forward_matches_flax():
    mlp, params, flat, x, view, x2, view2 = _setup()
    want_rgb, want_dens = mlp.apply(params, x, view)
    rgb, dens = fused_mlp(x2, view2, tuple(flat), CFG['net_depth'],
                          CFG['net_depth_condition'], CFG['skip_index'],
                          jnp.float32, True)
    np.testing.assert_allclose(np.asarray(rgb),
                               np.asarray(want_rgb).reshape(-1, 3),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dens),
                               np.asarray(want_dens).reshape(-1, 1),
                               rtol=1e-5, atol=1e-5)


def test_fused_mlp_gradients_match_flax():
    mlp, params, flat, x, view, x2, view2 = _setup(M=320)
    rng = np.random.default_rng(1)
    g_rgb = jnp.asarray(rng.normal(size=(320, 3)).astype(np.float32))
    g_dens = jnp.asarray(rng.normal(size=(320, 1)).astype(np.float32))

    def loss_flax(p, x, v):
        rgb, dens = mlp.apply(p, x, v)
        return (jnp.sum(rgb.reshape(-1, 3) * g_rgb)
                + jnp.sum(dens.reshape(-1, 1) * g_dens))

    def loss_fused(flat, x2, v2):
        rgb, dens = fused_mlp(x2, v2, flat, CFG['net_depth'],
                              CFG['net_depth_condition'], CFG['skip_index'],
                              jnp.float32, True)
        return jnp.sum(rgb * g_rgb) + jnp.sum(dens * g_dens)

    gp_flax, gx_flax, gv_flax = jax.grad(loss_flax, argnums=(0, 1, 2))(
        params, x, view)
    gflat_fused, gx_fused, gv_fused = jax.grad(
        loss_fused, argnums=(0, 1, 2))(tuple(flat), x2, view2)

    # dx / dview
    np.testing.assert_allclose(np.asarray(gx_fused),
                               np.asarray(gx_flax).reshape(-1, x2.shape[1]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv_fused),
                               np.asarray(gv_flax), rtol=2e-4, atol=2e-4)

    # parameter grads (flatten flax grads in the same order)
    gflat_flax = flatten_params(gp_flax['params'], CFG['net_depth'],
                                CFG['net_depth_condition'])
    for got, want in zip(gflat_fused, gflat_flax):
        np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                                   np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_mlp_padding_does_not_corrupt_grads():
    """M not a multiple of the row tile: padded rows must not leak into the
    weight gradients."""
    mlp, params, flat, x, view, x2, view2 = _setup(M=513)  # 513 = 512 + 1

    def loss(flat):
        rgb, dens = fused_mlp(x2, view2, flat, CFG['net_depth'],
                              CFG['net_depth_condition'], CFG['skip_index'],
                              jnp.float32, True)
        return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2)

    def loss_flax(p):
        rgb, dens = mlp.apply(p, x, view)
        return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2)

    g_fused = jax.grad(loss)(tuple(flat))
    g_flax = flatten_params(jax.grad(loss_flax)(params)['params'],
                            CFG['net_depth'], CFG['net_depth_condition'])
    for got, want in zip(g_fused, g_flax):
        np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                                   np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_mlp_full_size_shapes():
    """Lego-size architecture traces and runs in interpret mode."""
    cfg = dict(net_depth=8, net_width=256, net_depth_condition=1,
               net_width_condition=128, skip_index=4)
    mlp, params, flat, x, view, x2, view2 = _setup(
        M=64, xdim=96, vdim=27, cfg=cfg)
    rgb, dens = fused_mlp(x2, view2, tuple(flat), 8, 1, 4, jnp.float32, True)
    want_rgb, want_dens = mlp.apply(params, x, view)
    np.testing.assert_allclose(np.asarray(rgb),
                               np.asarray(want_rgb).reshape(-1, 3),
                               rtol=1e-4, atol=1e-4)


def test_model_pallas_mlp_backend_matches_xla():
    """MipNerf(mlp_backend='pallas') must match the XLA model with the SAME
    params (trees are interchangeable) in outputs and parameter gradients."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)
    rays = random_rays(8)
    m_x = MipNerf(**kw, mlp_backend='xla')
    m_p = MipNerf(**kw, mlp_backend='pallas')
    params_x = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)
    params_p = m_p.init(jax.random.PRNGKey(0), rays, None, False, True)
    # identical trees (paths and shapes) and identical values (same init key)
    assert (jax.tree_util.tree_structure(params_x)
            == jax.tree_util.tree_structure(params_p))
    for a, b in zip(jax.tree.leaves(params_x), jax.tree.leaves(params_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    r_x = m_x.apply(params_x, rays, jax.random.PRNGKey(1), False, True)
    r_p = m_p.apply(params_x, rays, jax.random.PRNGKey(1), False, True)
    np.testing.assert_allclose(np.asarray(r_p[-1].rgb),
                               np.asarray(r_x[-1].rgb), rtol=1e-5, atol=1e-5)

    def loss(model, p):
        ret = model.apply(p, rays, jax.random.PRNGKey(2), True, True)
        return sum(jnp.mean(lv.rgb ** 2) for lv in ret)

    g_x = jax.grad(lambda p: loss(m_x, p))(params_x)
    g_p = jax.grad(lambda p: loss(m_p, p))(params_x)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_fused_mlp_save_mode_matches_recompute():
    """'save' mode (activations streamed from fwd, zero recompute in bwd)
    must match 'recompute' mode in outputs and all gradients."""
    mlp, params, flat, x, view, x2, view2 = _setup(M=700)

    def loss(flat, mode):
        rgb, dens = fused_mlp(x2, view2, flat, CFG['net_depth'],
                              CFG['net_depth_condition'], CFG['skip_index'],
                              jnp.float32, True, mode)
        return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2), (rgb, dens)

    (l_r, (rgb_r, dens_r)), g_r = jax.value_and_grad(
        lambda f: loss(f, 'recompute'), has_aux=True)(tuple(flat))
    (l_s, (rgb_s, dens_s)), g_s = jax.value_and_grad(
        lambda f: loss(f, 'save'), has_aux=True)(tuple(flat))
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(l_s), float(l_r), rtol=1e-6)
    for a, b in zip(g_s, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_model_pallas_save_backend():
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)
    rays = random_rays(8)
    m_x = MipNerf(**kw, mlp_backend='xla')
    m_s = MipNerf(**kw, mlp_backend='pallas_save')
    params = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)
    r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_s = m_s.apply(params, rays, jax.random.PRNGKey(1), False, True)
    np.testing.assert_allclose(np.asarray(r_s[-1].rgb),
                               np.asarray(r_x[-1].rgb), rtol=1e-5, atol=1e-5)

    def loss(model, p):
        ret = model.apply(p, rays, jax.random.PRNGKey(2), True, True)
        return sum(jnp.mean(lv.rgb ** 2) for lv in ret)

    g_x = jax.grad(lambda p: loss(m_x, p))(params)
    g_s = jax.grad(lambda p: loss(m_s, p))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_fused_mlp_lean_matches_flax():
    """Lean mode (per-ray view input, packed output) must match the Flax MLP
    in forward outputs and parameter gradients.  dx/dview are structurally
    zero by design (non-diff boundary)."""
    from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

    N = 8
    mlp, params, flat, x, view, x2, view2 = _setup(M=96, cfg=CFG)
    # reshape per-sample layout: [M(=rays), 1, xdim] -> treat M/N rays of N
    xdim = x2.shape[1]
    x3 = x2.reshape(-1, N, xdim)                # [R, N, xdim]
    view_ray = view[::1][: x3.shape[0]]         # [R, vdim] per-ray features

    want_rgb, want_dens = mlp.apply(params, x3,
                                    view_ray)   # flax broadcasts per ray

    def loss_lean(flat):
        rgb, dens = fused_mlp_lean(x3.reshape(-1, xdim), view_ray, flat, N,
                                   CFG['net_depth'],
                                   CFG['net_depth_condition'],
                                   CFG['skip_index'], jnp.float32, True)
        packed = jnp.concatenate([rgb, dens], axis=-1)
        return jnp.sum(packed ** 2), packed

    (_, packed), g_lean = jax.value_and_grad(
        loss_lean, has_aux=True)(tuple(flat))
    np.testing.assert_allclose(np.asarray(packed[:, :3]),
                               np.asarray(want_rgb).reshape(-1, 3),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(packed[:, 3:]),
                               np.asarray(want_dens).reshape(-1, 1),
                               rtol=1e-5, atol=1e-5)

    def loss_flax(p):
        rgb, dens = mlp.apply(p, x3, view_ray)
        return (jnp.sum(rgb ** 2) + jnp.sum(dens ** 2))

    g_flax = flatten_params(jax.grad(loss_flax)(params)['params'],
                            CFG['net_depth'], CFG['net_depth_condition'])
    for got, want in zip(g_lean, g_flax):
        np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                                   np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_mlp_lean_padding_does_not_corrupt():
    """Ray count not a multiple of the row tile: padded rows must not leak
    into the packed outputs or weight gradients."""
    from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

    N = 4
    mlp, params, flat, x, view, x2, view2 = _setup(M=516, cfg=CFG)  # 129 rays
    xdim = x2.shape[1]
    x3 = x2.reshape(-1, N, xdim)
    view_ray = view[: x3.shape[0]]

    def loss(flat):
        rgb, dens = fused_mlp_lean(x3.reshape(-1, xdim), view_ray, flat, N,
                                   CFG['net_depth'],
                                   CFG['net_depth_condition'],
                                   CFG['skip_index'], jnp.float32, True)
        return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2)

    def loss_flax(p):
        rgb, dens = mlp.apply(p, x3, view_ray)
        return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2)

    g_lean = jax.grad(loss)(tuple(flat))
    g_flax = flatten_params(jax.grad(loss_flax)(params)['params'],
                            CFG['net_depth'], CFG['net_depth_condition'])
    for got, want in zip(g_lean, g_flax):
        np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                                   np.asarray(want), rtol=2e-4, atol=2e-4)


def test_model_pallas_lean_backend():
    """MipNerf(mlp_backend='pallas_lean') matches the XLA model with the
    SAME params in outputs and parameter gradients."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)
    rays = random_rays(8)
    m_x = MipNerf(**kw, mlp_backend='xla')
    m_l = MipNerf(**kw, mlp_backend='pallas_lean')
    params = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)
    params_l = m_l.init(jax.random.PRNGKey(0), rays, None, False, True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_l))
    r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_l = m_l.apply(params, rays, jax.random.PRNGKey(1), False, True)
    np.testing.assert_allclose(np.asarray(r_l[-1].rgb),
                               np.asarray(r_x[-1].rgb), rtol=1e-5, atol=1e-5)

    def loss(model, p):
        ret = model.apply(p, rays, jax.random.PRNGKey(2), True, True)
        return sum(jnp.mean(lv.rgb ** 2) for lv in ret)

    g_x = jax.grad(lambda p: loss(m_x, p))(params)
    g_l = jax.grad(lambda p: loss(m_l, p))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_l)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_fused_mlp_lean_save_matches_recompute():
    """Lean 'save' mode (activations streamed, zero recompute) must match
    lean 'recompute' mode in outputs and all parameter gradients."""
    from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

    N = 8
    mlp, params, flat, x, view, x2, view2 = _setup(M=96, cfg=CFG)
    xdim = x2.shape[1]
    x3 = x2.reshape(-1, N, xdim).reshape(-1, xdim)
    view_ray = view[: x2.shape[0] // N]

    def loss(flat, mode):
        rgb, dens = fused_mlp_lean(x3, view_ray, flat, N, CFG['net_depth'],
                                   CFG['net_depth_condition'],
                                   CFG['skip_index'], jnp.float32, True,
                                   mode)
        packed = jnp.concatenate([rgb, dens], axis=-1)
        return jnp.sum(packed ** 2), packed

    (l_r, p_r), g_r = jax.value_and_grad(
        lambda f: loss(f, 'recompute'), has_aux=True)(tuple(flat))
    (l_s, p_s), g_s = jax.value_and_grad(
        lambda f: loss(f, 'save'), has_aux=True)(tuple(flat))
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_r),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(g_s, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_lean_save_mismatched_fwd_bwd_tiles(monkeypatch):
    """When MLP_LEAN_SAVE_FWD_TILE != MLP_LEAN_SAVE_TILE and the row count
    is not a common multiple, the backward must re-pad the saved-activation
    stream (kernels/mlp.py:_run_bwd_lean_save) — grads must still match the
    recompute-mode reference exactly."""
    import mipnerf_pl_tpu.kernels.mlp as kmlp
    from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

    # N=8, M=96: fwd tile 64 -> Mp_fwd=128; bwd tile 48 -> Mp_bwd=96.
    monkeypatch.setattr(kmlp, '_ROW_TILE_LEAN_SAVE_FWD', 64)
    monkeypatch.setattr(kmlp, '_ROW_TILE_LEAN_SAVE', 48)

    N = 8
    mlp, params, flat, x, view, x2, view2 = _setup(M=96, cfg=CFG)
    xdim = x2.shape[1]
    x3 = x2.reshape(-1, N, xdim).reshape(-1, xdim)
    view_ray = view[: x2.shape[0] // N]

    def loss(flat, mode):
        rgb, dens = fused_mlp_lean(x3, view_ray, flat, N, CFG['net_depth'],
                                   CFG['net_depth_condition'],
                                   CFG['skip_index'], jnp.float32, True,
                                   mode)
        packed = jnp.concatenate([rgb, dens], axis=-1)
        return jnp.sum(packed ** 2), packed

    (l_r, p_r), g_r = jax.value_and_grad(
        lambda f: loss(f, 'recompute'), has_aux=True)(tuple(flat))
    (l_s, p_s), g_s = jax.value_and_grad(
        lambda f: loss(f, 'save'), has_aux=True)(tuple(flat))
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_r),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(g_s, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_model_pallas_lean_save_backend():
    """MipNerf(mlp_backend='pallas_lean_save') matches XLA with the SAME
    params in outputs and parameter gradients."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)
    rays = random_rays(8)
    m_x = MipNerf(**kw, mlp_backend='xla')
    m_l = MipNerf(**kw, mlp_backend='pallas_lean_save')
    params = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)
    r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_l = m_l.apply(params, rays, jax.random.PRNGKey(1), False, True)
    np.testing.assert_allclose(np.asarray(r_l[-1].rgb),
                               np.asarray(r_x[-1].rgb), rtol=1e-5, atol=1e-5)

    def loss(model, p):
        ret = model.apply(p, rays, jax.random.PRNGKey(2), True, True)
        return sum(jnp.mean(lv.rgb ** 2) for lv in ret)

    g_x = jax.grad(lambda p: loss(m_x, p))(params)
    g_l = jax.grad(lambda p: loss(m_l, p))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_l)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_model_pallas_hybrid_backend():
    """MipNerf(mlp_backend='pallas_hybrid') — XLA forward + zero-recompute
    Pallas backward — matches XLA in outputs and parameter gradients."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)
    rays = random_rays(8)
    m_x = MipNerf(**kw, mlp_backend='xla')
    m_h = MipNerf(**kw, mlp_backend='pallas_hybrid')
    params = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)
    r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_h = m_h.apply(params, rays, jax.random.PRNGKey(1), False, True)
    np.testing.assert_allclose(np.asarray(r_h[-1].rgb),
                               np.asarray(r_x[-1].rgb), rtol=1e-5, atol=1e-5)

    def loss(model, p):
        ret = model.apply(p, rays, jax.random.PRNGKey(2), True, True)
        return sum(jnp.mean(lv.rgb ** 2) for lv in ret)

    g_x = jax.grad(lambda p: loss(m_x, p))(params)
    g_h = jax.grad(lambda p: loss(m_h, p))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_h)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_fused_mlp_hybrid_grads_match_flax():
    """Hybrid-mode parameter grads vs the Flax MLP, including a
    non-tile-aligned ray count."""
    from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

    N = 4
    mlp, params, flat, x, view, x2, view2 = _setup(M=516, cfg=CFG)
    xdim = x2.shape[1]
    x3 = x2.reshape(-1, N, xdim)
    view_ray = view[: x3.shape[0]]

    def loss(flat):
        rgb, dens = fused_mlp_lean(x3.reshape(-1, xdim), view_ray, flat, N,
                                   CFG['net_depth'],
                                   CFG['net_depth_condition'],
                                   CFG['skip_index'], jnp.float32, True,
                                   'hybrid')
        return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2)

    def loss_flax(p):
        rgb, dens = mlp.apply(p, x3, view_ray)
        return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2)

    g_h = jax.grad(loss)(tuple(flat))
    g_flax = flatten_params(jax.grad(loss_flax)(params)['params'],
                            CFG['net_depth'], CFG['net_depth_condition'])
    for got, want in zip(g_h, g_flax):
        np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                                   np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_mlp_lean_activation_epilogue():
    """act=(rgb_padding, density_bias) must match applying the model's
    sigmoid/softplus epilogue to the raw lean outputs — forward and
    parameter grads (kernels/mlp.py:_lean_apply_act)."""
    from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

    N = 8
    pad, bias = 0.001, -1.0
    mlp, params, flat, x, view, x2, view2 = _setup(M=96, cfg=CFG)
    xdim = x2.shape[1]
    x3 = x2.reshape(-1, N, xdim).reshape(-1, xdim)
    view_ray = view[: x2.shape[0] // N]

    for mode in ('recompute', 'save', 'hybrid'):
        def loss_fused(flat):
            rgb, dens = fused_mlp_lean(
                x3, view_ray, flat, N, CFG['net_depth'],
                CFG['net_depth_condition'], CFG['skip_index'], jnp.float32,
                True, mode, (pad, bias))
            return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2), (rgb, dens)

        def loss_manual(flat):
            raw_rgb, raw_d = fused_mlp_lean(
                x3, view_ray, flat, N, CFG['net_depth'],
                CFG['net_depth_condition'], CFG['skip_index'], jnp.float32,
                True, mode)
            rgb = jax.nn.sigmoid(raw_rgb) * (1.0 + 2.0 * pad) - pad
            dens = jax.nn.softplus(raw_d + bias)
            return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2), (rgb, dens)

        (_, (r_f, d_f)), g_f = jax.value_and_grad(
            loss_fused, has_aux=True)(tuple(flat))
        (_, (r_m, d_m)), g_m = jax.value_and_grad(
            loss_manual, has_aux=True)(tuple(flat))
        np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_m),
                                   rtol=1e-6, atol=1e-6, err_msg=mode)
        np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_m),
                                   rtol=1e-6, atol=1e-6, err_msg=mode)
        for a, b in zip(g_f, g_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=mode)


def _model_pair_losses(m_a, m_b, params, rays, with_distloss=True):
    """Loss touching comp_rgb AND weights (via distloss) at every level —
    exercises the g_comp and g_weights cotangent paths together."""
    from mipnerf_pl_tpu.ops.render import distloss

    def loss(model, p):
        ret = model.apply(p, rays, jax.random.PRNGKey(2), True, True)
        total = sum(jnp.mean(lv.rgb ** 2) for lv in ret)
        if with_distloss:
            total = total + 0.01 * sum(
                distloss(lv.weights, lv.t_samples) for lv in ret)
        return total

    return jax.grad(lambda p: loss(m_a, p))(params), \
        jax.grad(lambda p: loss(m_b, p))(params)


@pytest.mark.parametrize('backend', ['pallas_lean', 'pallas_lean_save'])
def test_model_render_fusion_matches_xla(backend):
    """The render-fused level megakernel must match the XLA model with the
    SAME params in all LevelOutput fields and in parameter gradients of a
    loss that uses both comp_rgb and weights (distloss)."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)
    rays = random_rays(16)
    m_x = MipNerf(**kw, mlp_backend='xla')
    m_r = MipNerf(**kw, mlp_backend=backend, fuse_render=True)
    params = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)

    r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_r = m_r.apply(params, rays, jax.random.PRNGKey(1), False, True)
    for lx, lr in zip(r_x, r_r):
        np.testing.assert_allclose(np.asarray(lr.rgb), np.asarray(lx.rgb),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lr.distance),
                                   np.asarray(lx.distance),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lr.acc), np.asarray(lx.acc),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lr.weights),
                                   np.asarray(lx.weights),
                                   rtol=1e-5, atol=1e-6)

    g_x, g_r = _model_pair_losses(m_x, m_r, params, rays)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=2e-5)


def test_model_render_fusion_white_bkgd_and_unbounded():
    """white_bkgd=False and unbounded=True variants through the fused
    render path match XLA."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    for unbounded in (False, True):
        kw = dict(num_samples=8, max_deg_point=4, deg_view=2,
                  mlp_net_depth=3, mlp_net_width=16,
                  mlp_net_width_condition=8, mlp_skip_index=2,
                  unbounded=unbounded)
        rays = random_rays(16)
        m_x = MipNerf(**kw, mlp_backend='xla')
        m_r = MipNerf(**kw, mlp_backend='pallas_lean_save',
                      fuse_render=True)
        params = m_x.init(jax.random.PRNGKey(0), rays, None, False, False)
        r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, False)
        r_r = m_r.apply(params, rays, jax.random.PRNGKey(1), False, False)
        np.testing.assert_allclose(np.asarray(r_r[-1].rgb),
                                   np.asarray(r_x[-1].rgb),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f'unbounded={unbounded}')
        np.testing.assert_allclose(np.asarray(r_r[-1].distance),
                                   np.asarray(r_x[-1].distance),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f'unbounded={unbounded}')


def test_fused_mlp_lean_cmajor_matches_rowmajor():
    """cmajor=True must equal the row-major lean path transposed — forward
    and parameter gradients, with and without the fused head epilogue and
    in both pallas modes (kernels/mlp.py fused_mlp_lean cmajor)."""
    from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

    N = 8
    mlp, params, flat, x, view, x2, view2 = _setup(M=96, cfg=CFG)
    xdim = x2.shape[1]
    x3 = x2.reshape(-1, N, xdim).reshape(-1, xdim)
    view_ray = view[: x2.shape[0] // N]

    for mode in ('recompute', 'save'):
        for act in (None, (0.001, -1.0)):
            def loss_cm(flat):
                rgb_t, dens_t = fused_mlp_lean(
                    x3, view_ray, flat, N, CFG['net_depth'],
                    CFG['net_depth_condition'], CFG['skip_index'],
                    jnp.float32, True, mode, act, True)
                # Weighted loss so the rgb/dens cotangents are row-varying
                # (a plain sum would hide contraction-axis mistakes).
                w = jnp.arange(rgb_t.shape[1], dtype=jnp.float32) + 1.0
                return (jnp.sum(w * rgb_t ** 2) + jnp.sum(w * dens_t ** 2),
                        (rgb_t, dens_t))

            def loss_rm(flat):
                rgb, dens = fused_mlp_lean(
                    x3, view_ray, flat, N, CFG['net_depth'],
                    CFG['net_depth_condition'], CFG['skip_index'],
                    jnp.float32, True, mode, act)
                w = (jnp.arange(rgb.shape[0], dtype=jnp.float32)
                     + 1.0)[:, None]
                return (jnp.sum(w * rgb ** 2) + jnp.sum(w * dens ** 2),
                        (rgb, dens))

            tag = f'mode={mode} act={act}'
            (_, (r_t, d_t)), g_cm = jax.value_and_grad(
                loss_cm, has_aux=True)(tuple(flat))
            (_, (r_r, d_r)), g_rm = jax.value_and_grad(
                loss_rm, has_aux=True)(tuple(flat))
            np.testing.assert_allclose(np.asarray(r_t.T), np.asarray(r_r),
                                       rtol=1e-5, atol=1e-6, err_msg=tag)
            np.testing.assert_allclose(np.asarray(d_t.T), np.asarray(d_r),
                                       rtol=1e-5, atol=1e-6, err_msg=tag)
            for a, b in zip(g_cm, g_rm):
                # The swapped head contraction (k^T g^T) changes the f32
                # accumulation order; tolerance is order-noise, not error.
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=5e-4, atol=1e-4, err_msg=tag)


def test_volumetric_rendering_cmajor_matches_rowmajor():
    from mipnerf_pl_tpu.ops.render import (volumetric_rendering,
                                           volumetric_rendering_cmajor)

    rng = np.random.default_rng(7)
    B, N = 12, 8
    rgb = jnp.asarray(rng.uniform(size=(B, N, 3)).astype(np.float32))
    density = jnp.asarray(rng.uniform(size=(B, N, 1)).astype(np.float32))
    t = jnp.asarray(np.sort(rng.uniform(1.0, 5.0, size=(B, N + 1))
                            .astype(np.float32), axis=-1))
    dirs = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    for wb in (False, True):
        want = volumetric_rendering(rgb, density, t, dirs, white_bkgd=wb)
        got = volumetric_rendering_cmajor(
            jnp.moveaxis(rgb, -1, 0), density[..., 0], t, dirs,
            white_bkgd=wb)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('backend', ['pallas_lean', 'pallas_lean_save'])
def test_model_channel_major_matches_default(backend):
    """MipNerf(channel_major=True) must match the same backend without it
    in every LevelOutput field and in parameter gradients of a loss using
    comp_rgb and weights (the full cotangent path through
    volumetric_rendering_cmajor into the cmajor backward kernel)."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)
    rays = random_rays(16)
    # channel_major defaults True since round 3 — pin the reference model
    # to the row-major head boundary so the comparison stays meaningful.
    m_d = MipNerf(**kw, mlp_backend=backend, channel_major=False)
    m_c = MipNerf(**kw, mlp_backend=backend, channel_major=True)
    params = m_d.init(jax.random.PRNGKey(0), rays, None, False, True)

    r_d = m_d.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_c = m_c.apply(params, rays, jax.random.PRNGKey(1), False, True)
    for ld, lc in zip(r_d, r_c):
        np.testing.assert_allclose(np.asarray(lc.rgb), np.asarray(ld.rgb),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lc.distance),
                                   np.asarray(ld.distance),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lc.acc), np.asarray(ld.acc),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lc.weights),
                                   np.asarray(ld.weights),
                                   rtol=1e-5, atol=1e-6)

    g_d, g_c = _model_pair_losses(m_d, m_c, params, rays)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def _moments_setup(R=16, N=8, min_deg=0, max_deg=4, seed=3, cfg=CFG):
    """Random cone-Gaussian moments + the manually encoded equivalent."""
    from mipnerf_pl_tpu.ops.math import integrated_pos_enc

    rng = np.random.default_rng(seed)
    D = 3
    means = rng.normal(size=(R, N, D)).astype(np.float32)
    covs = rng.uniform(0.0, 0.5, size=(R, N, D)).astype(np.float32)
    enc = integrated_pos_enc((jnp.asarray(means), jnp.asarray(covs)),
                             min_deg, max_deg)                  # [R, N, F]
    moments = jnp.asarray(
        np.concatenate([means.reshape(-1, D).T,
                        covs.reshape(-1, D).T], axis=0))        # [6, R*N]
    xdim = enc.shape[-1]
    view = jnp.asarray(rng.normal(size=(R, 11)).astype(np.float32))
    mlp = MLP(**cfg, compute_dtype=jnp.float32)
    x3 = enc.reshape(R, N, xdim)
    params = mlp.init(jax.random.PRNGKey(0), x3, view)
    flat = flatten_params(params['params'], cfg['net_depth'],
                          cfg['net_depth_condition'])
    return moments, enc.reshape(-1, xdim), view, flat, (min_deg, max_deg)


@pytest.mark.parametrize('mode', ['recompute', 'save'])
@pytest.mark.parametrize('cmajor', [False, True])
def test_fused_mlp_lean_encode_matches_manual(mode, cmajor):
    """encode=(min_deg, max_deg) on a [6, M] moments stream must equal the
    same lean kernel fed the XLA integrated_pos_enc of those moments —
    forward outputs and parameter gradients (kernels/mlp.py
    _decode_moments)."""
    from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

    N = 8
    moments, enc, view, flat, deg = _moments_setup(N=N)

    def run(flat, fused):
        x = moments if fused else enc
        rgb, dens = fused_mlp_lean(
            x, view, flat, N, CFG['net_depth'], CFG['net_depth_condition'],
            CFG['skip_index'], jnp.float32, True, mode, None, cmajor,
            deg if fused else None)
        axis = 1 if cmajor else 0
        w = jnp.arange(rgb.shape[axis], dtype=jnp.float32) + 1.0
        if cmajor:
            w = w[None, :]
        else:
            w = w[:, None]
        return jnp.sum(w * rgb ** 2) + jnp.sum(w * dens ** 2), (rgb, dens)

    (_, (r_f, d_f)), g_f = jax.value_and_grad(
        lambda f: run(f, True), has_aux=True)(tuple(flat))
    (_, (r_m, d_m)), g_m = jax.value_and_grad(
        lambda f: run(f, False), has_aux=True)(tuple(flat))
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_m),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_m),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(g_f, g_m):
        # atol 2e-4: the in-kernel decode's fast exp/sin are ~1e-6-absolute
        # approximations of libm (kernels/mlp.py _fast_exp/_fast_sin), which
        # shows up amplified in near-zero gradient entries.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_mlp_lean_encode_padding():
    """Moments stream with a point count that is not a tile multiple: the
    zero-padded moment columns decode to a NONZERO encode (sin of the cos
    phase is 1), which must still contribute nothing — all cotangents on
    padded rows are zero."""
    import mipnerf_pl_tpu.kernels.mlp as kmlp
    from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

    N = 4
    R = 129                                     # 516 points, tile 512
    moments, enc, view, flat, deg = _moments_setup(R=R, N=N)

    def loss(flat, fused):
        x = moments if fused else enc
        rgb, dens = fused_mlp_lean(
            x, view, flat, N, CFG['net_depth'], CFG['net_depth_condition'],
            CFG['skip_index'], jnp.float32, True, 'save', None, False,
            deg if fused else None)
        return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2)

    g_f = jax.grad(lambda f: loss(f, True))(tuple(flat))
    g_m = jax.grad(lambda f: loss(f, False))(tuple(flat))
    for a, b in zip(g_f, g_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_model_fuse_encode_matches_unfused():
    """MipNerf(fuse_encode=True) must match both
    fuse_encode=False (same backend) and the XLA model in every LevelOutput
    field and in parameter gradients (incl. weights via distloss)."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)
    rays = random_rays(16)
    m_x = MipNerf(**kw, mlp_backend='xla')
    m_0 = MipNerf(**kw, mlp_backend='pallas_lean_save', fuse_encode=False)
    m_1 = MipNerf(**kw, mlp_backend='pallas_lean_save', fuse_encode=True)
    params = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)
    params_1 = m_1.init(jax.random.PRNGKey(0), rays, None, False, True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_1))

    r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_0 = m_0.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_1 = m_1.apply(params, rays, jax.random.PRNGKey(1), False, True)
    for lx, l0, l1 in zip(r_x, r_0, r_1):
        for f in ('rgb', 'distance', 'acc', 'weights'):
            np.testing.assert_allclose(
                np.asarray(getattr(l1, f)), np.asarray(getattr(l0, f)),
                rtol=1e-5, atol=1e-6, err_msg=f'{f} fused vs unfused')
            np.testing.assert_allclose(
                np.asarray(getattr(l1, f)), np.asarray(getattr(lx, f)),
                rtol=1e-5, atol=1e-5, err_msg=f'{f} fused vs xla')

    g_x, g_1 = _model_pair_losses(m_x, m_1, params, rays)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=2e-5)


def test_model_fuse_encode_render_fusion():
    """fuse_encode composes with fuse_render: the level megakernel ingests
    moments and emits per-ray outputs — vs the XLA model."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)
    rays = random_rays(16)
    m_x = MipNerf(**kw, mlp_backend='xla')
    m_r = MipNerf(**kw, mlp_backend='pallas_lean_save', fuse_render=True,
                  fuse_encode=True)
    params = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)
    r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_r = m_r.apply(params, rays, jax.random.PRNGKey(1), False, True)
    for lx, lr in zip(r_x, r_r):
        for f in ('rgb', 'distance', 'acc', 'weights'):
            np.testing.assert_allclose(
                np.asarray(getattr(lr, f)), np.asarray(getattr(lx, f)),
                rtol=1e-5, atol=1e-5, err_msg=f)

    g_x, g_r = _model_pair_losses(m_x, m_r, params, rays)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=2e-5)


def test_model_fuse_encode_disable_integration():
    """disable_integration under the fused encode: the covariance rows are
    zeroed, which must equal the XLA model's zeroed-cov PE path."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2,
              disable_integration=True)
    rays = random_rays(8)
    m_x = MipNerf(**kw, mlp_backend='xla')
    m_e = MipNerf(**kw, mlp_backend='pallas_lean_save')
    params = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)
    r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_e = m_e.apply(params, rays, jax.random.PRNGKey(1), False, True)
    np.testing.assert_allclose(np.asarray(r_e[-1].rgb),
                               np.asarray(r_x[-1].rgb), rtol=1e-5, atol=1e-5)
