#!/usr/bin/env python
"""Freeze reference-produced golden outputs for the L0 ray-math ops.

Imports the actual upstream PyTorch implementation from /root/reference
(models/mip.py) on CPU, evaluates every L0 op on fixed seeded inputs, and
writes tests/goldens_ref.npz.  tests/test_ref_parity.py then asserts the
JAX ops in mipnerf_pl_tpu against these REFERENCE-produced numbers (not
self-produced ones) to <= 1e-5.

Deterministic paths only (randomized=False): the reference draws from
torch's global RNG, this framework from explicit jax PRNG keys, so the
jittered streams are intentionally different distributions-equal samples.

Usage: python tools/gen_ref_goldens.py [--reference /root/reference]
"""

import argparse
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_REFERENCE = '/root/reference'
GOLDENS_PATH = os.path.join(REPO_ROOT, 'tests', 'goldens_ref.npz')

B, N = 8, 16          # rays, samples per ray
IPE_MIN_DEG, IPE_MAX_DEG = 0, 16
PE_MIN_DEG, PE_MAX_DEG = 0, 4
RESAMPLE_PADDING = 0.01


def make_inputs():
    """Fixed, seeded inputs shared by the generator and the parity test."""
    rng = np.random.default_rng(42)
    d = rng.normal(size=(B, 3)).astype(np.float32)   # non-normalized on purpose
    inputs = {
        'origins': rng.normal(size=(B, 3)).astype(np.float32) * 0.2,
        'directions': d,
        'viewdirs': (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(
            np.float32),
        'radii': (rng.uniform(0.001, 0.02, size=(B, 1))).astype(np.float32),
        'near': np.full((B, 1), 2.0, np.float32),
        'far': np.full((B, 1), 6.0, np.float32),
        # Ascending fenceposts for cast_rays / volumetric_rendering.
        't_samples': np.sort(
            rng.uniform(2.0, 6.0, size=(B, N + 1)).astype(np.float32), -1),
        'rgb': rng.uniform(0.0, 1.0, size=(B, N, 3)).astype(np.float32),
        'density': rng.uniform(0.0, 3.0, size=(B, N, 1)).astype(np.float32),
        'weights': rng.uniform(0.0, 1.0, size=(B, N)).astype(np.float32),
        # expected_sin inputs: wide range to exercise the variance shrink.
        'es_x': (rng.normal(size=(B, N, 6)) * 20.0).astype(np.float32),
        'es_var': rng.uniform(0.0, 25.0, size=(B, N, 6)).astype(np.float32),
        'pe_x': rng.normal(size=(B, 3)).astype(np.float32),
        # Gaussian stats for IPE (means anywhere, small diagonal covs).
        'ipe_means': (rng.normal(size=(B, N, 3)) * 2.0).astype(np.float32),
        'ipe_covs': rng.uniform(0.0, 0.1, size=(B, N, 3)).astype(np.float32),
    }
    # Degenerate rows exercise the eps-padding path of the PDF sampler.
    w = inputs['weights'].copy()
    w[0] = 0.0
    w[1] = 1e-8
    inputs['pdf_weights'] = w
    return inputs


def compute_reference_goldens(reference_root=DEFAULT_REFERENCE):
    """Run the upstream torch implementation on the fixed inputs."""
    sys.path.insert(0, reference_root)
    try:
        import torch
        from models import mip as ref  # noqa: the upstream module
    finally:
        sys.path.remove(reference_root)

    x = {k: torch.from_numpy(v.copy()) for k, v in make_inputs().items()}
    out = {}

    means, covs = ref.cast_rays(x['t_samples'], x['origins'],
                                x['directions'], x['radii'], 'cone')
    out['cast_means'], out['cast_covs'] = means, covs

    t, (m, c) = ref.sample_along_rays(
        x['origins'], x['directions'], x['radii'], N, x['near'], x['far'],
        randomized=False, disparity=False, ray_shape='cone')
    out['sample_t'], out['sample_means'], out['sample_covs'] = t, m, c

    t_d, (m_d, c_d) = ref.sample_along_rays(
        x['origins'], x['directions'], x['radii'], N, x['near'], x['far'],
        randomized=False, disparity=True, ray_shape='cone')
    out['sample_disp_t'] = t_d
    out['sample_disp_means'], out['sample_disp_covs'] = m_d, c_d

    out['ipe'] = ref.integrated_pos_enc(
        (x['ipe_means'], x['ipe_covs']), IPE_MIN_DEG, IPE_MAX_DEG)
    es_y, es_var = ref.expected_sin(x['es_x'], x['es_var'])
    out['expected_sin_y'], out['expected_sin_var'] = es_y, es_var
    out['pe'] = ref.pos_enc(x['pe_x'], PE_MIN_DEG, PE_MAX_DEG,
                            append_identity=True)
    out['pe_noid'] = ref.pos_enc(x['pe_x'], PE_MIN_DEG, PE_MAX_DEG,
                                 append_identity=False)

    for tag, white in (('white', True), ('black', False)):
        rgb, dist, acc, w = ref.volumetric_rendering(
            x['rgb'], x['density'], x['t_samples'], x['directions'], white)
        out[f'vr_{tag}_rgb'], out[f'vr_{tag}_distance'] = rgb, dist
        out[f'vr_{tag}_acc'], out[f'vr_{tag}_weights'] = acc, w

    out['distloss'] = ref.distloss(x['weights'], x['t_samples'])

    # The reference sampler mutates `weights` in place — pass clones.
    out['pdf_samples'] = ref.sorted_piecewise_constant_pdf(
        x['t_samples'].clone(), x['pdf_weights'].clone(), N,
        randomized=False)

    rt, (rm, rc) = ref.resample_along_rays(
        x['origins'], x['directions'], x['radii'], x['t_samples'].clone(),
        x['weights'].clone(), randomized=False, ray_shape='cone',
        stop_grad=True, resample_padding=RESAMPLE_PADDING)
    out['resample_t'], out['resample_means'], out['resample_covs'] = rt, rm, rc

    return {k: np.asarray(v.detach().numpy(), np.float32)
            for k, v in out.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reference', default=DEFAULT_REFERENCE)
    ap.add_argument('--out', default=GOLDENS_PATH)
    args = ap.parse_args()
    goldens = compute_reference_goldens(args.reference)
    np.savez(args.out, **goldens)
    print(f'wrote {len(goldens)} reference goldens -> {args.out}')
    for k, v in sorted(goldens.items()):
        print(f'  {k:24s} {v.shape}')


if __name__ == '__main__':
    main()
