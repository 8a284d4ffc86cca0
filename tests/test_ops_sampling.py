"""Unit tests for stratified sampling and inverse-CDF resampling.

The mask-reduction interval search must be exactly equivalent to the
reference's searchsorted+gather semantics (reference models/mip.py:210-228);
we verify against an independent numpy implementation of those semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mipnerf_pl_tpu.ops import sampling as s
from mipnerf_pl_tpu.ops.render import volumetric_rendering

F32_EPS = np.finfo(np.float32).eps


def numpy_pdf_golden(bins, weights, num_samples, u):
    """Numpy searchsorted/gather implementation of the torch reference
    semantics (models/mip.py:168-229) given precomputed u."""
    eps = 1e-5
    weight_sum = weights.sum(-1, keepdims=True)
    padding = np.maximum(0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding
    pdf = weights / weight_sum
    cdf = np.minimum(1, np.cumsum(pdf[..., :-1], axis=-1))
    cdf = np.concatenate(
        [np.zeros_like(cdf[..., :1]), cdf, np.ones_like(cdf[..., :1])], -1)

    B = cdf.shape[0]
    samples = np.zeros((B, num_samples), np.float32)
    for b in range(B):
        inds = np.searchsorted(cdf[b], u[b], side='right')
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        cdf_g0, cdf_g1 = cdf[b][below], cdf[b][above]
        bins_g0, bins_g1 = bins[b][below], bins[b][above]
        denom = cdf_g1 - cdf_g0
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[b] - cdf_g0) / denom
        samples[b] = bins_g0 + t * (bins_g1 - bins_g0)
    return samples


def test_pdf_matches_searchsorted_golden():
    rng = np.random.default_rng(0)
    B, M, S = 32, 16, 17
    bins = np.sort(rng.uniform(2, 6, size=(B, M + 1)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, size=(B, M)).astype(np.float32)
    # zero out some rows entirely to hit the eps-padding path
    weights[:4] = 0.0

    got = np.asarray(s.sorted_piecewise_constant_pdf(
        None, bins, weights, S, randomized=False))
    u = np.broadcast_to(
        np.linspace(0, 1 - F32_EPS, S, dtype=np.float32), (B, S))
    want = numpy_pdf_golden(bins, weights, S, u)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pdf_randomized_stratified_and_sorted():
    rng_key = jax.random.PRNGKey(0)
    B, M, S = 8, 32, 33
    rng = np.random.default_rng(1)
    bins = np.sort(rng.uniform(2, 6, size=(B, M + 1)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, size=(B, M)).astype(np.float32)
    samples = np.asarray(s.sorted_piecewise_constant_pdf(
        rng_key, bins, weights, S, randomized=True))
    assert samples.shape == (B, S)
    # sorted ascending, within [bins0, bins-1]
    assert np.all(np.diff(samples, axis=-1) >= -1e-6)
    assert np.all(samples >= bins[:, :1] - 1e-6)
    assert np.all(samples <= bins[:, -1:] + 1e-6)


def test_pdf_concentrates_where_weights_are():
    """Samples must land in high-weight bins (inverse-transform property)."""
    B, M, S = 1, 8, 1024
    bins = np.linspace(0, 8, M + 1, dtype=np.float32)[None]
    weights = np.zeros((B, M), np.float32)
    weights[0, 3] = 1.0  # all mass in bin [3, 4]
    samples = np.asarray(s.sorted_piecewise_constant_pdf(
        jax.random.PRNGKey(2), bins, weights, S, randomized=True))
    frac_inside = np.mean((samples >= 3) & (samples <= 4))
    assert frac_inside > 0.99


def test_sample_along_rays_deterministic():
    B, N = 4, 16
    o = np.zeros((B, 3), np.float32)
    d = np.tile(np.array([0, 0, 1], np.float32), (B, 1))
    r = np.full((B, 1), 0.01, np.float32)
    near = np.full((B, 1), 2.0, np.float32)
    far = np.full((B, 1), 6.0, np.float32)
    t, (means, covs) = s.sample_along_rays(
        None, o, d, r, N, near, far, randomized=False, disparity=False,
        ray_shape='cone')
    assert t.shape == (B, N + 1)
    np.testing.assert_allclose(np.asarray(t[0]),
                               np.linspace(2, 6, N + 1), rtol=1e-6)
    assert means.shape == (B, N, 3)
    assert covs.shape == (B, N, 3)


def test_sample_along_rays_randomized_stratified():
    B, N = 512, 16
    key = jax.random.PRNGKey(3)
    o = np.zeros((B, 3), np.float32)
    d = np.tile(np.array([0, 0, 1], np.float32), (B, 1))
    r = np.full((B, 1), 0.01, np.float32)
    near = np.full((B, 1), 2.0, np.float32)
    far = np.full((B, 1), 6.0, np.float32)
    t, _ = s.sample_along_rays(key, o, d, r, N, near, far, randomized=True,
                               disparity=False, ray_shape='cone')
    t = np.asarray(t)
    # Stratified: each t_i within its stratum, monotone per ray.
    assert np.all(np.diff(t, axis=-1) > 0)
    assert np.all(t >= 2.0 - 1e-5) and np.all(t <= 6.0 + 1e-5)
    # Mean of each interior fencepost ~ the deterministic grid (the first /
    # last jitter in half-strata: lower=[t0, mids], upper=[mids, tN] per
    # reference models/mip.py:156-158, so their means sit a quarter-stratum in).
    grid = np.linspace(2, 6, N + 1)
    np.testing.assert_allclose(t.mean(0)[1:-1], grid[1:-1], atol=0.05)
    stratum = 4.0 / N
    assert abs(t.mean(0)[0] - (2.0 + stratum / 4)) < 0.05
    assert abs(t.mean(0)[-1] - (6.0 - stratum / 4)) < 0.05


def test_sample_along_rays_disparity():
    B, N = 2, 8
    o = np.zeros((B, 3), np.float32)
    d = np.tile(np.array([0, 0, 1], np.float32), (B, 1))
    r = np.full((B, 1), 0.01, np.float32)
    near = np.full((B, 1), 1.0, np.float32)
    far = np.full((B, 1), 100.0, np.float32)
    t, _ = s.sample_along_rays(None, o, d, r, N, near, far, randomized=False,
                               disparity=True, ray_shape='cone')
    t = np.asarray(t)
    # Linear in inverse depth: 1/t is a linspace.
    np.testing.assert_allclose(1 / t[0],
                               np.linspace(1, 1 / 100, N + 1), rtol=1e-5)


def test_sample_along_rays_360():
    B, N = 4, 8
    key = jax.random.PRNGKey(4)
    o = np.zeros((B, 3), np.float32)
    d = np.tile(np.array([0, 0, 1], np.float32), (B, 1))
    r = np.full((B, 1), 0.01, np.float32)
    near = np.full((B, 1), 0.5, np.float32)
    far = np.full((B, 1), 1000.0, np.float32)
    t_inv, (means, covs) = s.sample_along_rays_360(
        key, o, d, r, N, near, far, randomized=True, ray_shape='cone')
    assert t_inv.shape == (B, N + 1)
    assert covs.shape == (B, N, 3, 3)  # full covariance for the 360 path
    assert np.all(np.isfinite(np.asarray(means)))


def test_resample_concentrates_on_coarse_peak():
    """End-to-end level-0 -> level-1 behaviour: resampling should pack the
    fine samples around where the coarse weights peaked."""
    B, N = 16, 32
    key = jax.random.PRNGKey(5)
    o = np.zeros((B, 3), np.float32)
    d = np.tile(np.array([0, 0, 1], np.float32), (B, 1))
    r = np.full((B, 1), 0.01, np.float32)
    near = np.full((B, 1), 2.0, np.float32)
    far = np.full((B, 1), 6.0, np.float32)
    t, _ = s.sample_along_rays(None, o, d, r, N, near, far, False, False, 'cone')

    # Synthetic coarse weights: peak around t = 4.
    t_mid = 0.5 * (np.asarray(t)[..., :-1] + np.asarray(t)[..., 1:])
    weights = np.exp(-((t_mid - 4.0) ** 2) / 0.01).astype(np.float32)

    new_t, (means, covs) = s.resample_along_rays(
        key, o, d, r, t, weights, randomized=True, ray_shape='cone',
        stop_grad=True, resample_padding=0.01)
    new_t = np.asarray(new_t)
    assert new_t.shape == (B, N + 1)
    # Most fenceposts should lie near the peak.
    frac_near_peak = np.mean(np.abs(new_t - 4.0) < 0.5)
    assert frac_near_peak > 0.5


def test_resample_stop_grad():
    """stop_grad=True must block gradients from new_t to the coarse weights."""
    B, N = 2, 8
    o = jnp.zeros((B, 3)); d = jnp.ones((B, 3))
    r = jnp.full((B, 1), 0.01)
    t = jnp.broadcast_to(jnp.linspace(2., 6., N + 1), (B, N + 1))

    def loss_fn(w, stop):
        new_t, _ = s.resample_along_rays(
            None, o, d, r, t, w, randomized=False, ray_shape='cone',
            stop_grad=stop, resample_padding=0.01)
        return jnp.sum(new_t)

    w = jnp.ones((B, N)) * 0.5
    g_stop = jax.grad(lambda w: loss_fn(w, True))(w)
    g_flow = jax.grad(lambda w: loss_fn(w, False))(w)
    assert float(jnp.abs(g_stop).max()) == 0.0
    assert float(jnp.abs(g_flow).max()) > 0.0


def test_full_pipeline_jit():
    """Two-level sample→render pipeline compiles and runs under jit."""
    B, N = 64, 32

    @jax.jit
    def pipeline(key, o, d, r, near, far):
        k0, k1 = jax.random.split(key)
        t, (means, covs) = s.sample_along_rays(
            k0, o, d, r, N, near, far, True, False, 'cone')
        density = jnp.ones((B, N, 1)) * 0.5
        rgb = jnp.ones((B, N, 3)) * 0.7
        _, _, _, weights = volumetric_rendering(rgb, density, t, d, True)
        t2, _ = s.resample_along_rays(k1, o, d, r, t, weights, True, 'cone',
                                      True, 0.01)
        return t2

    key = jax.random.PRNGKey(0)
    o = jnp.zeros((B, 3)); d = jnp.ones((B, 3)) * jnp.array([0, 0, 1.])
    r = jnp.full((B, 1), 0.01)
    near = jnp.full((B, 1), 2.0); far = jnp.full((B, 1), 6.0)
    t2 = pipeline(key, o, d, r, near, far)
    assert t2.shape == (B, N + 1)
    assert np.all(np.isfinite(np.asarray(t2)))
