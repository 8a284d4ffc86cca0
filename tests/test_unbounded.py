"""Tests for the unbounded (mip-NeRF-360-style) path: inverse-depth
sampling, 360 resampling, contraction IPE, full model forward/backward."""

import jax
import jax.numpy as jnp
import numpy as np

from mipnerf_pl_tpu.models.mipnerf import MipNerf
from mipnerf_pl_tpu.ops.sampling import (resample_along_rays_360,
                                         sample_along_rays_360)
from tests.helpers import random_rays

SMALL = dict(num_samples=8, deg_view=2, mlp_net_depth=3, mlp_net_width=16,
             mlp_net_width_condition=8, mlp_skip_index=2, unbounded=True)


def _far_rays(batch=8, seed=0):
    r = random_rays(batch, seed)
    return r._replace(near=np.full_like(r.near, 0.5),
                      far=np.full_like(r.far, 100.0))


def test_resample_360_monotone_and_in_range():
    B, N = 8, 16
    rng = np.random.default_rng(0)
    rays = _far_rays(B)
    t_inv, _ = sample_along_rays_360(
        jax.random.PRNGKey(0), rays.origins, rays.directions, rays.radii,
        N, rays.near, rays.far, True, 'cone')
    t_inv = np.asarray(t_inv)
    assert np.all(np.diff(t_inv, axis=-1) < 0)  # descending 1/near -> 1/far

    weights = rng.uniform(0, 1, size=(B, N)).astype(np.float32)
    new_t_inv, (means, covs) = resample_along_rays_360(
        jax.random.PRNGKey(1), rays.origins, rays.directions, rays.radii,
        jnp.asarray(t_inv), jnp.asarray(weights), True, 'cone', True, 0.01)
    new_t_inv = np.asarray(new_t_inv)
    assert new_t_inv.shape == (B, N + 1)
    assert np.all(np.diff(new_t_inv, axis=-1) <= 1e-7)      # still descending
    assert np.all(new_t_inv <= 1 / 0.5 + 1e-5)
    assert np.all(new_t_inv >= 1 / 100.0 - 1e-6)
    assert covs.shape == (B, N, 3, 3)
    assert np.all(np.isfinite(np.asarray(means)))


def test_unbounded_forward_shapes():
    model = MipNerf(**SMALL)
    rays = _far_rays(8)
    params = model.init(jax.random.PRNGKey(0), rays, jax.random.PRNGKey(1),
                        False, False)
    ret = model.apply(params, rays, jax.random.PRNGKey(2), True, False)
    assert len(ret) == 2
    for level in ret:
        assert level.rgb.shape == (8, 3)
        assert np.all(np.isfinite(np.asarray(level.rgb)))
        # weights valid
        assert float(jnp.max(jnp.sum(level.weights, -1))) <= 1 + 1e-5


def test_unbounded_encoder_is_42dim():
    """The contraction IPE feeds a 42-feature input to the MLP trunk."""
    model = MipNerf(**SMALL)
    rays = _far_rays(4)
    params = model.init(jax.random.PRNGKey(0), rays, None, False, False)
    kernel = params['params']['mlp']['trunk_0']['kernel']
    assert kernel.shape[0] == 42


def test_unbounded_grads_finite():
    model = MipNerf(**SMALL)
    rays = _far_rays(8)
    params = model.init(jax.random.PRNGKey(0), rays, None, False, False)

    def loss(p):
        ret = model.apply(p, rays, jax.random.PRNGKey(0), True, False)
        return sum(jnp.mean(level.rgb ** 2) for level in ret)

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_unbounded_jit_compiles():
    model = MipNerf(**SMALL)
    rays = _far_rays(8)
    params = model.init(jax.random.PRNGKey(0), rays, None, False, False)
    fwd = jax.jit(lambda p, r, k: model.apply(p, r, k, True, False))
    ret = fwd(params, rays, jax.random.PRNGKey(0))
    assert ret[-1].rgb.shape == (8, 3)


def test_unbounded_distloss_is_positive():
    """Regression: descending t_inv bins fed to distloss negated the
    regularizer (training would maximize distortion).  The training loss
    path must flip to ascending order first."""
    from mipnerf_pl_tpu.train.system import MipNeRFSystem
    from tests.helpers import tiny_hparams

    hp = tiny_hparams()
    hp['nerf.unbounded'] = True
    system = MipNeRFSystem(hp)
    rays = _far_rays(16)
    params = system.model.init(jax.random.PRNGKey(0), rays, None, False,
                               False)
    pixels = np.zeros((16, 3), np.float32)
    _, aux = system.loss_fn(params, rays, pixels, jax.random.PRNGKey(1))
    assert float(aux['train/distloss_fine']) > 0.0


def test_distloss_negates_on_descending_bins():
    """Documents why the flip is needed: the O(N) identity assumes sorted
    ascending bins."""
    from mipnerf_pl_tpu.ops.render import distloss
    rng = np.random.default_rng(0)
    w = rng.uniform(0, 1, size=(4, 8)).astype(np.float32)
    t = np.sort(rng.uniform(1, 5, size=(4, 9)).astype(np.float32), -1)
    asc = float(distloss(w, t))
    desc = float(distloss(np.flip(w, -1).copy(), np.flip(t, -1).copy()))
    assert asc > 0
    np.testing.assert_allclose(desc, -asc, rtol=1e-5)
