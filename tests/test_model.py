"""Tests for the MipNerf Flax model (L1)."""

import jax
import jax.numpy as jnp
import numpy as np

from mipnerf_pl_tpu.models.mipnerf import MipNerf, make_mipnerf_from_hparams
from tests.helpers import random_rays, tiny_hparams

SMALL = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
             mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)


def _init(model, rays):
    return model.init(jax.random.PRNGKey(0), rays, jax.random.PRNGKey(1),
                      False, True)


def test_forward_shapes_and_levels():
    model = MipNerf(**SMALL)
    rays = random_rays(16)
    params = _init(model, rays)
    ret = model.apply(params, rays, jax.random.PRNGKey(2), True, True)
    assert len(ret) == 2
    for level in ret:
        assert level.rgb.shape == (16, 3)
        assert level.distance.shape == (16,)
        assert level.acc.shape == (16,)
        assert level.weights.shape == (16, 8)
        assert level.t_samples.shape == (16, 9)
        assert np.all(np.isfinite(np.asarray(level.rgb)))


def test_rgb_padding_range():
    """rgb in [-pad, 1+pad] (reference models/mip_nerf.py:236-237)."""
    model = MipNerf(**SMALL, rgb_padding=0.001)
    rays = random_rays(8)
    params = _init(model, rays)
    ret = model.apply(params, rays, None, False, False)
    for level in ret:
        rgb = np.asarray(level.rgb)
        # composited rgb (no white bkgd) is a weighted sum with acc <= 1.
        assert np.all(rgb >= -0.002) and np.all(rgb <= 1.002)


def test_deterministic_when_not_randomized():
    model = MipNerf(**SMALL)
    rays = random_rays(8)
    params = _init(model, rays)
    r1 = model.apply(params, rays, jax.random.PRNGKey(1), False, True)
    r2 = model.apply(params, rays, jax.random.PRNGKey(99), False, True)
    np.testing.assert_array_equal(np.asarray(r1[-1].rgb),
                                  np.asarray(r2[-1].rgb))


def test_randomized_key_sensitivity():
    model = MipNerf(**SMALL)
    rays = random_rays(8)
    params = _init(model, rays)
    r1 = model.apply(params, rays, jax.random.PRNGKey(1), True, True)
    r2 = model.apply(params, rays, jax.random.PRNGKey(2), True, True)
    assert not np.allclose(np.asarray(r1[-1].rgb), np.asarray(r2[-1].rgb))
    # Same key replays exactly.
    r3 = model.apply(params, rays, jax.random.PRNGKey(1), True, True)
    np.testing.assert_array_equal(np.asarray(r1[-1].rgb),
                                  np.asarray(r3[-1].rgb))


def test_disable_integration_and_no_viewdirs():
    model = MipNerf(**SMALL, disable_integration=True, use_viewdirs=False)
    rays = random_rays(8)
    params = _init(model, rays)
    ret = model.apply(params, rays, None, False, True)
    assert ret[-1].rgb.shape == (8, 3)


def test_density_noise_uses_key():
    model = MipNerf(**SMALL, density_noise=1.0)
    rays = random_rays(8)
    params = _init(model, rays)
    r1 = model.apply(params, rays, jax.random.PRNGKey(1), True, True)
    r2 = model.apply(params, rays, jax.random.PRNGKey(1), True, True)
    np.testing.assert_array_equal(np.asarray(r1[-1].rgb),
                                  np.asarray(r2[-1].rgb))


def test_bf16_compute_dtype():
    model = MipNerf(**SMALL, compute_dtype=jnp.bfloat16)
    rays = random_rays(8)
    params = _init(model, rays)
    # Params stay f32 even with bf16 compute.
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32
    ret = model.apply(params, rays, None, False, True)
    assert ret[-1].rgb.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(ret[-1].rgb)))


def test_three_levels():
    model = MipNerf(**SMALL, num_levels=3)
    rays = random_rays(4)
    params = _init(model, rays)
    ret = model.apply(params, rays, jax.random.PRNGKey(0), True, True)
    assert len(ret) == 3


def test_grads_flow_through_both_levels():
    model = MipNerf(**SMALL)
    rays = random_rays(8)
    params = _init(model, rays)

    def loss(p):
        ret = model.apply(p, rays, jax.random.PRNGKey(0), True, True)
        return sum(jnp.mean(level.rgb ** 2) for level in ret)

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert max(norms) > 0


def test_param_count_full_size():
    """Full lego config must produce the reference architecture's parameter
    count: 8x256 trunk with skip concat (+96 input at layer 5), density,
    bottleneck, 1x128 view branch on 256+27 input, rgb head."""
    hp = tiny_hparams()
    hp.update({'nerf.num_samples': 128, 'nerf.max_deg_point': 16,
               'nerf.deg_view': 4, 'nerf.mlp.net_depth': 8,
               'nerf.mlp.net_width': 256,
               'nerf.mlp.net_width_condition': 128})
    model = make_mipnerf_from_hparams(hp)
    rays = random_rays(2)
    params = _init(model, rays)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    # xyz_dim=96, view_dim=27: trunk 96*256+256 + 6*(256..)+... computed:
    expect = (96 * 256 + 256) + (256 * 256 + 256) * 3 + \
             ((256 + 96) * 256 + 256) + (256 * 256 + 256) * 3 + \
             (256 * 1 + 1) + (256 * 256 + 256) + \
             ((256 + 27) * 128 + 128) + (128 * 3 + 3)
    assert n_params == expect


def test_jit_forward():
    model = MipNerf(**SMALL)
    rays = random_rays(8)
    params = _init(model, rays)
    fwd = jax.jit(lambda p, r, k: model.apply(p, r, k, True, True))
    ret = fwd(params, rays, jax.random.PRNGKey(0))
    assert ret[-1].rgb.shape == (8, 3)


def test_lean_backend_rejects_resample_grad():
    """The lean kernels produce parameter grads only; combining them with
    nerf.stop_resample_grad=False would silently drop the level-0-weights ->
    level-1-samples gradient path, so the model must refuse."""
    import pytest

    rays = random_rays(8)
    for backend in ('pallas_lean', 'pallas_lean_save', 'pallas_hybrid'):
        model = MipNerf(**SMALL, mlp_backend=backend,
                        stop_resample_grad=False)
        with pytest.raises(ValueError, match='stop_resample_grad'):
            _init(model, rays)
    # xla/pallas backends ARE input-differentiable: must still work.
    model = MipNerf(**SMALL, mlp_backend='xla', stop_resample_grad=False)
    _init(model, rays)


def test_mlp_no_condition_layers_uses_view():
    """net_depth_condition=0: the rgb head consumes concat(bottleneck, view)
    directly (reference models/mip_nerf.py:66-73) — the view input must
    affect the output and the rgb kernel must span both."""
    from mipnerf_pl_tpu.models.mlp import MLP

    mlp = MLP(net_depth=3, net_width=16, net_depth_condition=0,
              net_width_condition=8, skip_index=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 8, 10)).astype(np.float32))
    view = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(0), x, view)
    assert params['params']['rgb']['kernel'].shape == (16 + 6, 3)

    rgb1, dens1 = mlp.apply(params, x, view)
    rgb2, dens2 = mlp.apply(params, x, view + 1.0)
    assert not np.allclose(np.asarray(rgb1), np.asarray(rgb2))
    np.testing.assert_allclose(np.asarray(dens1), np.asarray(dens2))

    # Numeric parity with the reference formulation: trunk -> bottleneck ->
    # rgb on the explicit concat of bottleneck and repeated view features.
    p = jax.tree.map(np.asarray, params['params'])
    h = np.asarray(x).reshape(-1, 10)
    inputs, skip = h, None
    for i in range(3):
        parts = h if skip is None else np.concatenate([h, skip], -1)
        h = np.maximum(parts @ p[f'trunk_{i}']['kernel']
                       + p[f'trunk_{i}']['bias'], 0.0)
        skip = inputs if (i % 2 == 0 and i > 0) else None
    trunk = h if skip is None else np.concatenate([h, skip], -1)
    dens_ref = trunk @ p['density']['kernel'] + p['density']['bias']
    bott = trunk @ p['bottleneck']['kernel'] + p['bottleneck']['bias']
    view_rep = np.repeat(np.asarray(view), 8, axis=0)
    rgb_ref = (np.concatenate([bott, view_rep], -1) @ p['rgb']['kernel']
               + p['rgb']['bias'])
    np.testing.assert_allclose(np.asarray(rgb1).reshape(-1, 3), rgb_ref,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dens1).reshape(-1, 1), dens_ref,
                               rtol=1e-5, atol=1e-5)
