"""Unit tests for volumetric rendering and the distortion loss."""

import jax
import jax.numpy as jnp
import numpy as np

from mipnerf_pl_tpu.ops.render import volumetric_rendering, distloss


def _setup(B=8, N=16, density_val=0.5, seed=0):
    rng = np.random.default_rng(seed)
    rgb = rng.uniform(size=(B, N, 3)).astype(np.float32)
    density = np.full((B, N, 1), density_val, np.float32)
    t = np.broadcast_to(np.linspace(2, 6, N + 1, dtype=np.float32), (B, N + 1)).copy()
    dirs = np.tile(np.array([0, 0, 1], np.float32), (B, 1))
    return rgb, density, t, dirs


def test_weights_nonneg_and_sum_le_one():
    rgb, density, t, dirs = _setup()
    _, _, acc, weights = volumetric_rendering(rgb, density, t, dirs, False)
    w = np.asarray(weights)
    assert np.all(w >= 0)
    assert np.all(np.asarray(acc) <= 1 + 1e-5)
    np.testing.assert_allclose(np.asarray(acc), w.sum(-1), rtol=1e-6)


def test_zero_density_transparent():
    rgb, _, t, dirs = _setup()
    density = np.zeros((8, 16, 1), np.float32)
    comp, dist, acc, w = volumetric_rendering(rgb, density, t, dirs, False)
    np.testing.assert_allclose(np.asarray(comp), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-7)
    # Distance is nan-safe clamped into [t0, tN] (reference models/mip.py:398).
    assert np.all(np.asarray(dist) >= 2.0 - 1e-6)


def test_zero_density_white_background():
    rgb, _, t, dirs = _setup()
    density = np.zeros((8, 16, 1), np.float32)
    comp, _, _, _ = volumetric_rendering(rgb, density, t, dirs, True)
    np.testing.assert_allclose(np.asarray(comp), 1.0, atol=1e-6)


def test_opaque_wall_first_sample_wins():
    rgb, _, t, dirs = _setup()
    density = np.zeros((8, 16, 1), np.float32)
    density[:, 0] = 1e6  # opaque first segment
    comp, dist, acc, w = volumetric_rendering(rgb, density, t, dirs, False)
    np.testing.assert_allclose(np.asarray(comp), rgb[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-6)
    # Distance = first segment midpoint.
    t_mid0 = 0.5 * (t[:, 0] + t[:, 1])
    np.testing.assert_allclose(np.asarray(dist), t_mid0, atol=1e-5)


def test_direction_norm_scales_delta():
    """delta = (t1-t0)*||d|| (reference models/mip.py:382-384): doubling the
    direction norm must increase opacity for the same density."""
    rgb, density, t, dirs = _setup(density_val=0.1)
    _, _, acc1, _ = volumetric_rendering(rgb, density, t, dirs, False)
    _, _, acc2, _ = volumetric_rendering(rgb, density, t, dirs * 2.0, False)
    assert np.all(np.asarray(acc2) > np.asarray(acc1))


def test_transmittance_exclusive_cumsum():
    """weights_i = alpha_i * exp(-sum_{j<i} sigma_j delta_j), checked
    against a brute-force loop."""
    B, N = 4, 8
    rng = np.random.default_rng(1)
    rgb = rng.uniform(size=(B, N, 3)).astype(np.float32)
    density = rng.uniform(0.1, 2.0, size=(B, N, 1)).astype(np.float32)
    t = np.sort(rng.uniform(2, 6, size=(B, N + 1)).astype(np.float32), -1)
    dirs = rng.normal(size=(B, 3)).astype(np.float32)

    _, _, _, weights = volumetric_rendering(rgb, density, t, dirs, False)

    dnorm = np.linalg.norm(dirs, axis=-1, keepdims=True)
    delta = (t[:, 1:] - t[:, :-1]) * dnorm
    dd = density[..., 0] * delta
    want = np.zeros((B, N), np.float32)
    for b in range(B):
        acc_sum = 0.0
        for i in range(N):
            alpha = 1 - np.exp(-dd[b, i])
            trans = np.exp(-acc_sum)
            want[b, i] = alpha * trans
            acc_sum += dd[b, i]
    np.testing.assert_allclose(np.asarray(weights), want, rtol=1e-5, atol=1e-7)


def test_distloss_golden():
    """Check against a brute-force O(N^2) numpy evaluation."""
    B, N = 4, 8
    rng = np.random.default_rng(2)
    w = rng.uniform(0, 0.2, size=(B, N)).astype(np.float32)
    t = np.sort(rng.uniform(2, 6, size=(B, N + 1)).astype(np.float32), -1)

    got = float(distloss(w, t))

    interval = t[:, 1:] - t[:, :-1]
    mids = 0.5 * (t[:, 1:] + t[:, :-1])
    uni = (1 / 3) * (interval * w ** 2).sum(-1).mean()
    bi = 0.0
    for b in range(B):
        for i in range(N):
            for j in range(N):
                bi += w[b, i] * w[b, j] * abs(mids[b, i] - mids[b, j])
    bi /= B
    assert abs(got - (uni + bi)) < 1e-5


def test_distloss_prefers_compact_weights():
    """Concentrated weights must cost less than spread-out weights."""
    N = 32
    t = np.broadcast_to(np.linspace(2, 6, N + 1, dtype=np.float32), (1, N + 1)).copy()
    w_spread = np.full((1, N), 1.0 / N, np.float32)
    w_compact = np.zeros((1, N), np.float32)
    w_compact[0, N // 2] = 1.0
    assert float(distloss(w_compact, t)) < float(distloss(w_spread, t))


def test_render_grad_flows():
    rgb, density, t, dirs = _setup()

    def loss(density):
        comp, _, _, _ = volumetric_rendering(rgb, density, t, dirs, True)
        return jnp.mean(comp ** 2)

    g = jax.grad(loss)(jnp.asarray(density))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


# -- MXU prefix sums (ops/fastmath.py cumsum_mxu) -----------------------------

def test_cumsum_mxu_matches_cumsum():
    from mipnerf_pl_tpu.ops.fastmath import cumsum_mxu
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(7, 128)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(cumsum_mxu(x)),
                               np.asarray(jnp.cumsum(x, axis=-1)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cumsum_mxu(x, exclusive=True)),
        np.asarray(jnp.cumsum(x, axis=-1) - x), rtol=1e-5, atol=1e-5)


def test_vol_render_cmajor_mxu_cumsum_equivalent():
    from mipnerf_pl_tpu.ops.render import volumetric_rendering_cmajor
    rgb, density, t, dirs = _setup(B=6, N=32, seed=7)
    rgb_cm = jnp.asarray(np.moveaxis(rgb, -1, 0))
    d = jnp.asarray(density[..., 0])
    base = volumetric_rendering_cmajor(rgb_cm, d, jnp.asarray(t),
                                       jnp.asarray(dirs), True)
    fast = volumetric_rendering_cmajor(rgb_cm, d, jnp.asarray(t),
                                       jnp.asarray(dirs), True,
                                       mxu_cumsum=True)
    for a, b in zip(base, fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_distloss_mxu_cumsum_equivalent_incl_grad():
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.uniform(size=(5, 33)).astype(np.float32))
    t = jnp.asarray(np.sort(rng.uniform(1, 6, size=(5, 34))
                            .astype(np.float32), axis=-1))
    f_base = lambda w_: distloss(w_, t)
    f_mxu = lambda w_: distloss(w_, t, mxu_cumsum=True)
    np.testing.assert_allclose(float(f_base(w)), float(f_mxu(w)), rtol=1e-6)
    g_base = jax.grad(f_base)(w)
    g_mxu = jax.grad(f_mxu)(w)
    np.testing.assert_allclose(np.asarray(g_base), np.asarray(g_mxu),
                               rtol=1e-4, atol=1e-6)


def test_pdf_sampler_mxu_cumsum_equivalent():
    from mipnerf_pl_tpu.ops.sampling import sorted_piecewise_constant_pdf
    rng = np.random.default_rng(13)
    bins = jnp.asarray(np.sort(rng.uniform(0, 4, size=(4, 17))
                               .astype(np.float32), axis=-1))
    w = jnp.asarray(rng.uniform(size=(4, 16)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    s_base = sorted_piecewise_constant_pdf(key, bins, w, 16, True)
    s_mxu = sorted_piecewise_constant_pdf(key, bins, w, 16, True,
                                          mxu_cumsum=True)
    np.testing.assert_allclose(np.asarray(s_base), np.asarray(s_mxu),
                               rtol=1e-5, atol=1e-5)
