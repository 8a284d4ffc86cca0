"""Fast f32 transcendentals for the IPE encode's benign argument ranges.

Both TPU lowerings of exp/sin — Mosaic's in-Pallas-kernel sequences AND
XLA's fusion codegen — run the generic libm-style algorithms at ~40
cycles per lane-element (~38 Gop/s measured both ways: the exp+sin of
one fused-encode level costs 0.83 s per 800x800 frame in-kernel, and
3.27 ms/step as the training path's two [M, 96] XLA fusions —
tools/trace_render.py / tools/trace_step.py plus stubbed-transcendental
counterfactual runs, DESIGN.md §15/§16).  The IPE's arguments are benign
(sin args |y| <~ 2^18 from 2^max_deg * scene coords; exp args <= 0), so
short polynomials with explicit range reduction beat the generic
lowering ~3x:

  * fast_exp: exp(x), x <= 0 — exponent-bit construction of 2^k via
    int shift+bitcast, degree-6 exp2 polynomial on the fraction
    (~1 ulp relative error; clamps to the 2^-126 normal floor below it).
  * fast_sin: 4-term Cody-Waite 2*pi reduction (each constant has an
    8-bit mantissa so products with the quotient r <= 2^15 stay exact
    in f32) + odd degree-11 minimax polynomial on [-pi, pi]
    (<= ~1e-6 absolute error for |y| <= 2^17, measured vs f64).

Coefficients were least-squares fit in f64 and validated in f32 Horner
arithmetic (max |err|: exp 1.2e-7 rel, sin 1.1e-6 abs at |y| = 2^17).
Plain jnp/lax ops only: the same functions trace inside Pallas kernels
(kernels/mlp.py _decode_moments) and in ordinary XLA graphs
(ops/math.py integrated_pos_enc fast_transcendentals=True).
"""

import jax
import jax.numpy as jnp
import numpy as np

_EXP2_POLY = (1.0000000044246224, 0.6931469138636562, 0.24023030894734468,
              0.05548214848461723, 0.009679987432619325,
              0.0012437935946014247, 0.00021683440307878395)
_SIN_POLY = (0.9999997070349279, -0.16666577217490788, 0.008332558132552199,
             -0.0001981257593077941, 2.704051697679347e-06,
             -2.0534265066427463e-08)
_TWO_PI_CW = (6.28125, 0.001934051513671875, 1.2558884918689728e-06,
              -2.2257751197685138e-10)
_INV_TWO_PI = 0.15915494309189535
_LOG2_E = 1.4426950408889634


def fast_exp(x):
    """exp(x) for x <= 0, f32 (~1 ulp relative; 2^-126 floor below it)."""
    t = jnp.maximum(x * np.float32(_LOG2_E), -126.0)
    kf = jnp.floor(t)
    f = t - kf
    scale = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(kf.astype(jnp.int32) + 127, 23), jnp.float32)
    p = jnp.full_like(f, np.float32(_EXP2_POLY[-1]))
    for cco in _EXP2_POLY[-2::-1]:
        p = p * f + np.float32(cco)
    return scale * p


def fast_sin(y):
    """sin(y) for |y| <= ~2^18, f32 (<= ~1e-6 absolute vs f64)."""
    r = jnp.floor(y * np.float32(_INV_TWO_PI) + 0.5)
    t = y
    for pc in _TWO_PI_CW:
        t = t - r * np.float32(pc)
    t2 = t * t
    p = jnp.full_like(t, np.float32(_SIN_POLY[-1]))
    for cco in _SIN_POLY[-2::-1]:
        p = p * t2 + np.float32(cco)
    return p * t


def cumsum_mxu(x, *, exclusive: bool = False):
    """Prefix sum along the last axis as ONE triangular MXU matmul.

    XLA lowers `jnp.cumsum` over a short trailing axis on TPU to an O(N^2)
    reduce-window on the VPU; at the train-step shapes ([B, 128] per level
    for the transmittance, the resample CDF and the distloss prefix sums,
    forward AND transposed again in backward) those reduce-windows are pure
    serial VPU time.  The same O(N^2) work expressed as `x @ triu(ones)`
    is a [B, N] x [N, N] matmul — a few microseconds of MXU.  The VJP is
    the mirrored triangular matmul, so the backward's reversed cumsums
    become MXU work too.

    precision=HIGHEST keeps the f32 sums exact to ~1 ulp (every partial
    product is an exact f32 value times 1.0), matching sequential cumsum
    to float rounding.

    Args:
      x: [..., N] f32.
      exclusive: drop the diagonal — out[..., i] = sum_{j < i} x[..., j]
        (the transmittance / prefix-"before" form).

    Returns:
      [..., N] prefix sums.
    """
    n = x.shape[-1]
    tri = jnp.triu(jnp.ones((n, n), x.dtype), k=1 if exclusive else 0)
    return jnp.matmul(x, tri, precision=jax.lax.Precision.HIGHEST)
