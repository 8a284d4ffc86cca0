"""Unit tests for L0 cone-casting math and encodings.

Strategy (SURVEY.md §4): golden-check every kernel against independent numpy
derivations of the paper formulas plus Monte-Carlo estimates, and property
tests (IPE -> PE limit as cov -> 0, stable vs exact frustum moments).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipnerf_pl_tpu.ops import math as m


def test_lift_gaussian_diagonal_matches_full():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    t_mean = rng.uniform(1, 5, size=(16, 8)).astype(np.float32)
    t_var = rng.uniform(0.01, 0.1, size=(16, 8)).astype(np.float32)
    r_var = rng.uniform(0.01, 0.1, size=(16, 8)).astype(np.float32)

    mean_d, cov_d = m.lift_gaussian(d, t_mean, t_var, r_var, diagonal=True)
    mean_f, cov_f = m.lift_gaussian(d, t_mean, t_var, r_var, diagonal=False)

    np.testing.assert_allclose(mean_d, mean_f, rtol=1e-6)
    # Diagonal of the full covariance must equal the diagonal-mode output.
    diag_of_full = jnp.diagonal(cov_f, axis1=-2, axis2=-1)
    np.testing.assert_allclose(cov_d, diag_of_full, rtol=1e-4, atol=1e-6)


def test_conical_frustum_stable_matches_exact():
    """The stable parameterization must agree with the exact moments when
    far from the degenerate regime (reference models/mip.py:65-77)."""
    rng = np.random.default_rng(2)
    d = rng.normal(size=(8, 3)).astype(np.float32)
    t0 = rng.uniform(2.0, 3.0, size=(8, 4)).astype(np.float32)
    t1 = t0 + rng.uniform(0.5, 1.0, size=(8, 4)).astype(np.float32)
    r = rng.uniform(0.001, 0.01, size=(8, 1)).astype(np.float32)

    mean_s, cov_s = m.conical_frustum_to_gaussian(d, t0, t1, r, True, stable=True)
    mean_e, cov_e = m.conical_frustum_to_gaussian(d, t0, t1, r, True, stable=False)
    np.testing.assert_allclose(mean_s, mean_e, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(cov_s, cov_e, rtol=2e-2, atol=1e-6)


def test_conical_frustum_monte_carlo():
    """First/second moments of t within a cone frustum, vs closed form."""
    rng = np.random.default_rng(3)
    t0, t1 = 2.0, 3.0
    # Density of t within a conical frustum is proportional to t^2.
    ts = rng.uniform(t0, t1, size=2_000_000)
    w = ts ** 2
    t_mean_mc = np.average(ts, weights=w)
    t_var_mc = np.average((ts - t_mean_mc) ** 2, weights=w)

    d = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    mean, cov = m.conical_frustum_to_gaussian(
        d, np.array([[t0]], np.float32), np.array([[t1]], np.float32),
        np.array([[1e-6]], np.float32), diagonal=True)
    # mean z-coordinate == E[t]; z-variance == Var[t] (radius negligible).
    assert abs(float(mean[0, 0, 2]) - t_mean_mc) < 1e-3
    assert abs(float(cov[0, 0, 2]) - t_var_mc) < 1e-3


def test_cast_rays_offsets_origin():
    d = np.array([[0.0, 0.0, -1.0]], dtype=np.float32)
    o = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    r = np.array([[0.01]], dtype=np.float32)
    t = np.array([[2.0, 3.0, 4.0]], dtype=np.float32)
    means, covs = m.cast_rays(t, o, d, r, 'cone')
    assert means.shape == (1, 2, 3)
    # Frustum [2, 3] along -z from origin (1,2,3): center x/y unchanged.
    np.testing.assert_allclose(means[0, :, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(means[0, :, 1], 2.0, atol=1e-6)
    assert means[0, 0, 2] < 3.0 - 2.0 + 1e-3  # moved toward -z


def test_cylinder_gaussian_moments():
    """Cylinder: t ~ U[t0, t1] -> var (t1-t0)^2/12; radius var r^2/4."""
    d = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    t0 = np.array([[2.0]], np.float32)
    t1 = np.array([[4.0]], np.float32)
    r = np.array([[0.5]], np.float32)
    mean, cov = m.cylinder_to_gaussian(d, t0, t1, r, diagonal=True)
    assert abs(float(mean[0, 0, 2]) - 3.0) < 1e-6
    assert abs(float(cov[0, 0, 2]) - (2.0 ** 2 / 12.0)) < 1e-6
    assert abs(float(cov[0, 0, 0]) - 0.25 ** 2) < 1e-6


def test_expected_sin_monte_carlo():
    rng = np.random.default_rng(4)
    x = np.array([0.3, 1.2, -2.0], dtype=np.float32)
    var = np.array([0.05, 0.5, 2.0], dtype=np.float32)
    y = m.expected_sin(x, var)
    z = rng.normal(size=(1_000_000, 3)) * np.sqrt(var) + x
    mc = np.sin(z).mean(axis=0)
    np.testing.assert_allclose(np.asarray(y), mc, atol=5e-3)


def test_expected_sin_var_nonnegative():
    y, y_var = m.expected_sin_var(jnp.linspace(-5, 5, 64),
                                  jnp.linspace(0, 3, 64))
    assert np.all(np.asarray(y_var) >= 0)


def test_ipe_zero_cov_equals_pe():
    """IPE with zero covariance must reduce to plain sin/cos PE — the switch
    the reference exposes via disable_integration (models/mip_nerf.py:211-212)."""
    rng = np.random.default_rng(5)
    means = rng.normal(size=(4, 6, 3)).astype(np.float32)
    covs = np.zeros_like(means)
    enc = m.integrated_pos_enc((means, covs), 0, 4)
    pe = m.pos_enc(means, 0, 4, append_identity=False)
    np.testing.assert_allclose(np.asarray(enc), np.asarray(pe), atol=1e-6)


def test_ipe_shapes_and_layout():
    means = np.zeros((2, 5, 3), np.float32)
    means[..., 0] = 1.0  # x = 1
    covs = np.zeros((2, 5, 3), np.float32)
    enc = np.asarray(m.integrated_pos_enc((means, covs), 0, 16))
    assert enc.shape == (2, 5, 2 * 3 * 16)
    # Layout: scale-major sin block then cos block; sin(2^0 * 1) first.
    assert abs(enc[0, 0, 0] - np.sin(1.0)) < 1e-6
    assert abs(enc[0, 0, 3] - np.sin(2.0)) < 1e-6        # scale 2^1, dim x
    assert abs(enc[0, 0, 3 * 16] - np.cos(1.0)) < 1e-6   # cos block start


def test_ipe_full_cov_matches_diagonal():
    rng = np.random.default_rng(6)
    means = rng.normal(size=(3, 4, 3)).astype(np.float32)
    diag = rng.uniform(0.01, 0.2, size=(3, 4, 3)).astype(np.float32)
    full = np.zeros((3, 4, 3, 3), np.float32)
    full[..., np.arange(3), np.arange(3)] = diag
    enc_d = m.integrated_pos_enc((means, diag), 0, 8, diagonal=True)
    enc_f = m.integrated_pos_enc((means, full), 0, 8, diagonal=False)
    np.testing.assert_allclose(np.asarray(enc_d), np.asarray(enc_f),
                               rtol=1e-4, atol=1e-5)


def test_ipe_high_variance_shrinks_to_zero():
    means = np.ones((1, 1, 3), np.float32)
    covs = np.full((1, 1, 3), 100.0, np.float32)
    enc = np.asarray(m.integrated_pos_enc((means, covs), 0, 4))
    assert np.all(np.abs(enc) < 1e-5)


def test_pos_enc_append_identity():
    x = np.array([[0.5, -0.25, 1.0]], dtype=np.float32)
    enc = np.asarray(m.pos_enc(x, 0, 4, append_identity=True))
    assert enc.shape == (1, 3 + 2 * 3 * 4)
    np.testing.assert_allclose(enc[0, :3], x[0], atol=1e-7)
    assert abs(enc[0, 3] - np.sin(0.5)) < 1e-6


def test_contract_norm_bounded():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(128, 3)).astype(np.float32) * 10
    y = np.asarray(m.contract(x))
    norms = np.linalg.norm(y, axis=-1)
    assert np.all(norms <= 2.0 + 1e-5)
    # Inside the unit ball the map is 'x / ||x|| * (2 - 1/||x||)', which for
    # ||x|| < 1 still contracts; identity is applied by track_linearize's mask.
    x_far = np.array([[100.0, 0, 0]], np.float32)
    y_far = np.asarray(m.contract(x_far))
    assert abs(y_far[0, 0] - (2 - 1 / 100)) < 1e-5


def test_track_linearize_inside_identity():
    rng = np.random.default_rng(8)
    means = (rng.uniform(-0.4, 0.4, size=(2, 3, 3))).astype(np.float32)
    covs = rng.uniform(0.01, 0.02, size=(2, 3, 3)).astype(np.float32)
    new_means, new_covs = m.track_linearize(means, covs)
    np.testing.assert_allclose(np.asarray(new_means), means, atol=1e-6)
    # Inside: covariance just diagonalized, not transformed.
    diag = np.asarray(jnp.diagonal(new_covs, axis1=-2, axis2=-1))
    np.testing.assert_allclose(diag, covs, atol=1e-6)


def test_integrated_pos_enc_360_shape():
    rng = np.random.default_rng(9)
    means = rng.normal(size=(2, 4, 3)).astype(np.float32) * 3
    covs = rng.uniform(0.01, 0.1, size=(2, 4, 3)).astype(np.float32)
    enc = m.integrated_pos_enc_360((means, covs))
    assert enc.shape == (2, 4, 42)
    assert np.all(np.isfinite(np.asarray(enc)))


def test_math_jit_compatible():
    """Everything must trace under jit with static shapes."""
    @jax.jit
    def f(o, d, r, t):
        means, covs = m.cast_rays(t, o, d, r, 'cone')
        return m.integrated_pos_enc((means, covs), 0, 16)

    o = jnp.ones((8, 3)); d = jnp.ones((8, 3)); r = jnp.full((8, 1), 0.01)
    t = jnp.broadcast_to(jnp.linspace(2., 6., 9), (8, 9))
    out = f(o, d, r, t)
    assert out.shape == (8, 8, 96)


def test_cast_rays_cmajor_matches_cast_rays():
    """cast_rays_cmajor must be BIT-IDENTICAL to cast_rays(diagonal=True)
    rearranged, for both ray shapes (it is the producer of the lean
    kernels' fused-encode moments stream)."""
    import numpy as np

    from mipnerf_pl_tpu.ops.math import cast_rays, cast_rays_cmajor

    rng = np.random.default_rng(11)
    B, N = 7, 6
    t = jnp.asarray(np.sort(rng.uniform(1.0, 5.0, size=(B, N + 1))
                            .astype(np.float32), axis=-1))
    o = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(0.001, 0.01, size=(B, 1)).astype(np.float32))
    for shape in ('cone', 'cylinder'):
        means, covs = cast_rays(t, o, d, r, shape, diagonal=True)
        m = cast_rays_cmajor(t, o, d, r, shape)
        np.testing.assert_array_equal(
            np.asarray(m[:3]), np.moveaxis(np.asarray(means), -1, 0),
            err_msg=f'{shape} means')
        np.testing.assert_array_equal(
            np.asarray(m[3:]), np.moveaxis(np.asarray(covs), -1, 0),
            err_msg=f'{shape} covs')


def test_fastmath_exp_accuracy():
    """fast_exp must hold ~1 ulp relative error over the IPE's full argument
    range (x <= 0; -0.5 * yv2 reaches ~-8e4 at max_deg=16 lego covariances,
    where both sides underflow toward 0)."""
    from mipnerf_pl_tpu.ops.fastmath import fast_exp

    x = jnp.asarray(
        -np.concatenate([np.zeros(1),
                         np.logspace(-6, np.log10(87.0), 4001)])
        .astype(np.float32))
    got = np.asarray(fast_exp(x))
    want = np.exp(np.asarray(x, dtype=np.float64))
    # ~1 ulp through the normal range; a few-ulp drift appears only at the
    # subnormal boundary (|exp| ~ 1e-38), far below any encode value that
    # survives the bf16 cast.
    np.testing.assert_allclose(got, want, rtol=5e-6)
    # Deep-underflow arguments must clamp to the 2^-126 floor, not produce
    # garbage from the exponent-bit construction wrapping.
    assert float(fast_exp(jnp.float32(-1e4))) <= 2.0 ** -126


def test_fastmath_sin_accuracy():
    """fast_sin must hold <= ~1e-6 absolute error up to |y| ~ 2^17 (the
    encode's sin arguments reach 2^max_deg * scene coords)."""
    from mipnerf_pl_tpu.ops.fastmath import fast_sin

    rng = np.random.default_rng(3)
    y = rng.uniform(-2.0 ** 17, 2.0 ** 17, size=20001).astype(np.float32)
    y[:7] = [0.0, np.pi, -np.pi, 0.5 * np.pi, -0.5 * np.pi, 1.0, -1.0]
    got = np.asarray(fast_sin(jnp.asarray(y)))
    want = np.sin(np.asarray(y, dtype=np.float64))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=0)


def test_ipe_fast_transcendentals_matches_exact():
    """integrated_pos_enc(fast_transcendentals=True) must agree with the
    exact path to well under the lean kernels' bf16 input quantization
    (~4e-3) — the invisibility argument that lets training default to it."""
    rng = np.random.default_rng(4)
    means = jnp.asarray(rng.normal(scale=1.5, size=(6, 5, 3))
                        .astype(np.float32))
    covs = jnp.asarray(rng.uniform(0.0, 0.05, size=(6, 5, 3))
                       .astype(np.float32))
    exact = m.integrated_pos_enc((means, covs), 0, 16)
    fast = m.integrated_pos_enc((means, covs), 0, 16,
                                fast_transcendentals=True)
    assert fast.shape == exact.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               atol=5e-6, rtol=0)


def test_model_fast_encode_math_gating():
    """fast_encode_math engages exactly for the lean megakernel consumers
    (whose bf16 input cast makes the ~1e-6 polynomial error invisible) and
    never for the exact backends."""
    from mipnerf_pl_tpu.models.mipnerf import MipNerf

    def gate(**kw):
        model = MipNerf(**kw)
        return model.bind({'params': {}})._fast_encode_math  # noqa: SLF001

    assert gate(mlp_backend='pallas_lean_save')
    assert gate(mlp_backend='pallas_lean')
    assert not gate(mlp_backend='xla')
    assert not gate(mlp_backend='pallas')
    assert not gate(mlp_backend='pallas_lean_save', fast_encode_math=False)
    assert not gate(mlp_backend='pallas_lean_save', unbounded=True)
    assert not gate(mlp_backend='pallas_lean_save', use_viewdirs=False)
    # _fast_sin's Cody-Waite reduction is exact only to |args| ~ 2^18;
    # beyond max_deg 16 both fast paths must fall back to exact libm
    # exp/sin (ADVICE r4).
    assert not gate(mlp_backend='pallas_lean_save', max_deg_point=18)

    def gate_fused(**kw):
        model = MipNerf(fuse_encode=True, **kw)
        return model.bind({'params': {}})._fused_encode  # noqa: SLF001

    assert gate_fused(mlp_backend='pallas_lean')
    assert not gate_fused(mlp_backend='pallas_lean', max_deg_point=18)
