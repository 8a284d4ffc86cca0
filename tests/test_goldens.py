"""Golden-value regression tests for the numerical core.

Frozen input/output pairs for each L0 op (generated from the f32 CPU
implementation at framework v0.1.0).  Any future backend swap (Pallas
kernels, layout changes, precision experiments) must reproduce these to
tight tolerance — PSNR parity lives and dies on this math (SURVEY.md §7
"hard parts").

The fixture file is regenerated with:  python tests/test_goldens.py
"""

import os

import jax
import numpy as np

from mipnerf_pl_tpu.models.mipnerf import MipNerf
from mipnerf_pl_tpu.ops.math import cast_rays, integrated_pos_enc, pos_enc
from mipnerf_pl_tpu.ops.render import distloss, volumetric_rendering
from mipnerf_pl_tpu.ops.sampling import (resample_along_rays,
                                         sample_along_rays,
                                         sorted_piecewise_constant_pdf)
from tests.helpers import random_rays

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'goldens.npz')

MODEL_KW = dict(num_samples=8, max_deg_point=4, deg_view=2, mlp_net_depth=3,
                mlp_net_width=16, mlp_net_width_condition=8, mlp_skip_index=2)


def compute_all():
    """Deterministic outputs of every core op on fixed inputs."""
    rng = np.random.default_rng(1234)
    B, N = 8, 16
    o = rng.normal(size=(B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    v = d / np.linalg.norm(d, axis=-1, keepdims=True)
    r = rng.uniform(0.001, 0.02, size=(B, 1)).astype(np.float32)
    near = np.full((B, 1), 2.0, np.float32)
    far = np.full((B, 1), 6.0, np.float32)
    key = jax.random.PRNGKey(42)

    out = {}
    t, (means, covs) = sample_along_rays(key, o, d, r, N, near, far,
                                         True, False, 'cone')
    out['t_samples'] = np.asarray(t)
    out['means'] = np.asarray(means)
    out['covs'] = np.asarray(covs)
    out['ipe'] = np.asarray(integrated_pos_enc((means, covs), 0, 8))
    out['pe'] = np.asarray(pos_enc(v, 0, 4, True))

    weights = rng.uniform(0, 1, size=(B, N)).astype(np.float32)
    out['pdf_det'] = np.asarray(sorted_piecewise_constant_pdf(
        None, np.asarray(t), weights, N + 1, False))
    new_t, _ = resample_along_rays(key, o, d, r, t, weights, True, 'cone',
                                   True, 0.01)
    out['resampled_t'] = np.asarray(new_t)

    rgb = rng.uniform(size=(B, N, 3)).astype(np.float32)
    density = rng.uniform(0.05, 2.0, size=(B, N, 1)).astype(np.float32)
    comp, dist, acc, w = volumetric_rendering(rgb, density, t, d, True)
    out['comp_rgb'] = np.asarray(comp)
    out['distance'] = np.asarray(dist)
    out['acc'] = np.asarray(acc)
    out['weights'] = np.asarray(w)
    out['distloss'] = np.asarray(distloss(w, t))

    # Full model forward with fixed init + key.
    model = MipNerf(**MODEL_KW)
    rays = random_rays(4, seed=7)
    params = model.init(jax.random.PRNGKey(0), rays, jax.random.PRNGKey(1),
                        False, True)
    ret = model.apply(params, rays, jax.random.PRNGKey(9), True, True)
    out['model_rgb_coarse'] = np.asarray(ret[0].rgb)
    out['model_rgb_fine'] = np.asarray(ret[-1].rgb)
    out['model_dist_fine'] = np.asarray(ret[-1].distance)
    return out


def test_goldens_match():
    assert os.path.exists(GOLDEN_PATH), (
        'goldens.npz missing — regenerate with `python tests/test_goldens.py`')
    want = np.load(GOLDEN_PATH)
    got = compute_all()
    assert set(want.files) == set(got.keys())
    for k in want.files:
        np.testing.assert_allclose(
            got[k], want[k], rtol=2e-5, atol=1e-6,
            err_msg=f'golden drift in {k!r}')


if __name__ == '__main__':
    np.savez_compressed(GOLDEN_PATH, **compute_all())
    print(f'wrote {GOLDEN_PATH}')
