"""Tests for Pallas kernels (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipnerf_pl_tpu.kernels.ipe import fused_ipe
from mipnerf_pl_tpu.ops.math import integrated_pos_enc


@pytest.mark.parametrize('min_deg,max_deg', [(0, 16), (0, 8), (2, 6)])
def test_fused_ipe_matches_reference(min_deg, max_deg):
    rng = np.random.default_rng(0)
    means = rng.normal(size=(4, 8, 3)).astype(np.float32)
    covs = rng.uniform(0.001, 0.2, size=(4, 8, 3)).astype(np.float32)
    want = np.asarray(integrated_pos_enc((means, covs), min_deg, max_deg))
    got = np.asarray(fused_ipe(jnp.asarray(means), jnp.asarray(covs),
                               min_deg, max_deg, True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_ipe_ragged_rows():
    """Row count not a multiple of the tile size: padded grid must not
    corrupt valid rows."""
    rng = np.random.default_rng(1)
    means = rng.normal(size=(700, 3)).astype(np.float32)   # 700 < 2*512
    covs = rng.uniform(0.01, 0.1, size=(700, 3)).astype(np.float32)
    want = np.asarray(integrated_pos_enc((means, covs), 0, 4))
    got = np.asarray(fused_ipe(jnp.asarray(means), jnp.asarray(covs),
                               0, 4, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_ipe_gradients_match():
    rng = np.random.default_rng(2)
    means = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    covs = jnp.asarray(rng.uniform(0.01, 0.3, size=(16, 3)).astype(np.float32))

    def loss_k(m, c):
        return jnp.sum(fused_ipe(m, c, 0, 6, True) ** 2)

    def loss_r(m, c):
        return jnp.sum(integrated_pos_enc((m, c), 0, 6) ** 2)

    gk_m, gk_c = jax.grad(loss_k, argnums=(0, 1))(means, covs)
    gr_m, gr_c = jax.grad(loss_r, argnums=(0, 1))(means, covs)
    np.testing.assert_allclose(np.asarray(gk_m), np.asarray(gr_m),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gr_c),
                               rtol=1e-4, atol=1e-5)


def test_model_pallas_ipe_backend():
    """MipNerf with ipe_backend='pallas' matches the XLA path."""
    import jax
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=2,
              mlp_net_width=16, mlp_net_width_condition=8)
    rays = random_rays(8)
    m_x = MipNerf(**kw, ipe_backend='xla')
    m_p = MipNerf(**kw, ipe_backend='pallas')
    params = m_x.init(jax.random.PRNGKey(0), rays, None, False, True)
    r_x = m_x.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_p = m_p.apply(params, rays, jax.random.PRNGKey(1), False, True)
    np.testing.assert_allclose(np.asarray(r_x[-1].rgb),
                               np.asarray(r_p[-1].rgb), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Moments-form standalone encode (fused_ipe_moments) — the lean megakernels'
# default [M, F] encode producer (models/mipnerf.py `_pallas_encode`).
# ---------------------------------------------------------------------------


def _random_moments(rng, shape):
    means = rng.normal(size=(*shape, 3)).astype(np.float32)
    covs = rng.uniform(0.001, 0.2, size=(*shape, 3)).astype(np.float32)
    moments = np.moveaxis(np.concatenate([means, covs], axis=-1), -1, 0)
    return means, covs, moments


@pytest.mark.parametrize('min_deg,max_deg', [(0, 16), (0, 8), (2, 6)])
def test_fused_ipe_moments_matches_fastmath_encode(min_deg, max_deg):
    """Values must match the fast-math XLA encode (same polynomials, same
    exact one-hot ladder products)."""
    from mipnerf_pl_tpu.kernels.ipe import fused_ipe_moments
    rng = np.random.default_rng(0)
    means, covs, moments = _random_moments(rng, (4, 8))
    want = np.asarray(integrated_pos_enc(
        (jnp.asarray(means), jnp.asarray(covs)), min_deg, max_deg,
        fast_transcendentals=True))
    got = np.asarray(fused_ipe_moments(jnp.asarray(moments),
                                       min_deg, max_deg, True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_ipe_moments_ragged_rows():
    """M not a multiple of the tile: padded grid must not corrupt rows."""
    from mipnerf_pl_tpu.kernels.ipe import fused_ipe_moments
    rng = np.random.default_rng(1)
    means, covs, moments = _random_moments(rng, (700,))
    want = np.asarray(integrated_pos_enc(
        (jnp.asarray(means), jnp.asarray(covs)), 0, 4,
        fast_transcendentals=True))
    got = np.asarray(fused_ipe_moments(jnp.asarray(moments), 0, 4, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_ipe_moments_zero_cotangent():
    """The backward contract: zero moment cotangents (callers sit behind
    stop_resample_grad, where the true cotangent path is structurally
    dead)."""
    from mipnerf_pl_tpu.kernels.ipe import fused_ipe_moments
    rng = np.random.default_rng(2)
    _, _, moments = _random_moments(rng, (16,))

    g = jax.grad(
        lambda m: jnp.sum(fused_ipe_moments(m, 0, 6, True) ** 2))(
            jnp.asarray(moments))
    assert g.shape == moments.shape
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_model_pallas_encode_matches_xla_fast_encode():
    """MipNerf(pallas_encode=True) must match pallas_encode=False (the
    fast-math XLA encode) in every output field and in parameter grads —
    the kernel replaces the producer, not the math."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2,
              mlp_backend='pallas_lean_save', fast_encode_math=True)
    rays = random_rays(16)
    m_0 = MipNerf(**kw, pallas_encode=False)
    m_1 = MipNerf(**kw, pallas_encode=True)
    assert m_1.pallas_encode
    params = m_0.init(jax.random.PRNGKey(0), rays, None, False, True)
    r_0 = m_0.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_1 = m_1.apply(params, rays, jax.random.PRNGKey(1), False, True)
    for l0, l1 in zip(r_0, r_1):
        for f in ('rgb', 'distance', 'acc', 'weights'):
            np.testing.assert_allclose(
                np.asarray(getattr(l1, f)), np.asarray(getattr(l0, f)),
                rtol=1e-5, atol=1e-6, err_msg=f)

    def loss(m):
        def f(p):
            out = m.apply(p, rays, jax.random.PRNGKey(1), False, True)
            return sum(jnp.sum(lv.rgb ** 2) + jnp.sum(lv.weights ** 2)
                       for lv in out)
        return jax.grad(f)(params)

    g_0, g_1 = loss(m_0), loss(m_1)
    for a, b in zip(jax.tree.leaves(g_0), jax.tree.leaves(g_1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=2e-5)


def test_fused_ipe_moments_disable_integration():
    """Kernel check: zeroed covariance rows reduce the encode to the plain
    PE of the means (exp(-0.5*0) = 1 factor)."""
    from mipnerf_pl_tpu.kernels.ipe import fused_ipe_moments
    rng = np.random.default_rng(3)
    means, _, moments = _random_moments(rng, (32,))
    moments[3:] = 0.0
    want = np.asarray(integrated_pos_enc(
        (jnp.asarray(means), jnp.zeros_like(jnp.asarray(means))), 0, 6,
        fast_transcendentals=True))
    got = np.asarray(fused_ipe_moments(jnp.asarray(moments), 0, 6, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_model_pallas_encode_disable_integration():
    """Model branch check: MipNerf(disable_integration=True) under
    _pallas_encode (the _moments_stream covariance zeroing) matches the
    same model with pallas_encode off."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf
    from tests.helpers import random_rays

    kw = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
              mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2,
              mlp_backend='pallas_lean_save', fast_encode_math=True,
              disable_integration=True)
    rays = random_rays(16)
    m_0 = MipNerf(**kw, pallas_encode=False)
    m_1 = MipNerf(**kw, pallas_encode=True)
    params = m_0.init(jax.random.PRNGKey(0), rays, None, False, True)
    r_0 = m_0.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r_1 = m_1.apply(params, rays, jax.random.PRNGKey(1), False, True)
    for l0, l1 in zip(r_0, r_1):
        for f in ('rgb', 'distance', 'acc', 'weights'):
            np.testing.assert_allclose(
                np.asarray(getattr(l1, f)), np.asarray(getattr(l0, f)),
                rtol=1e-5, atol=1e-6, err_msg=f)
