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
