#!/usr/bin/env python
"""Measure the ACTUAL reference training step (torch CPU) at the lego shape.

Runs the upstream hjxwhy/mipnerf_pl model from /root/reference — forward,
masked MSE + 0.01*distloss loss (reference models/nerf_system.py:95-121),
backward, Adam step — at the exact lego workload (batch 3072 rays, 128
samples x 2 levels, 8x256 MLP) on the CPU cores available here, and prints
rays/s.  This is one measured anchor for bench.py's baseline denominator
(BASELINE.md "Throughput denominator"): the reference's GPU throughput is
unpublished, so the committed estimate is bracketed by (a) this CPU
measurement and (b) an A100 roofline of the measured per-step FLOPs.
"""

import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, '/root/reference')
from models.mip_nerf import MipNerf          # noqa: E402
from models.mip import distloss              # noqa: E402
from datasets.datasets import Rays           # noqa: E402

B = int(os.environ.get('REF_BENCH_BATCH', 3072))
N_WARMUP = int(os.environ.get('REF_BENCH_WARMUP', 1))
N_TIMED = int(os.environ.get('REF_BENCH_STEPS', 2))


def make_rays(batch_size):
    rng = np.random.default_rng(0)
    d = rng.normal(size=(batch_size, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((batch_size, 1), np.float32)
    t = lambda x: torch.from_numpy(x)
    return Rays(
        origins=t(rng.normal(size=(batch_size, 3)).astype(np.float32) * 0.1),
        directions=t(d), viewdirs=t(d), radii=t(ones * 0.005),
        lossmult=t(ones), near=t(ones * 2.0), far=t(ones * 6.0))


def main():
    torch.manual_seed(0)
    model = MipNerf()          # all defaults == lego config
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)
    rays = make_rays(B)
    pixels = torch.rand(B, 3)

    def step():
        opt.zero_grad()
        ret = model(rays, True, True)
        mask = rays.lossmult
        losses = []
        for (rgb, _, _, weights, t_samples) in ret:
            mse = (mask * (rgb - pixels) ** 2).sum() / mask.sum()
            losses.append(mse + 0.01 * distloss(weights, t_samples))
        loss = 0.1 * sum(losses[:-1]) + losses[-1]
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(N_WARMUP):
        step()
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        step()
    dt = (time.perf_counter() - t0) / N_TIMED
    print(f'reference torch-CPU ({os.cpu_count()} cores, '
          f'torch {torch.__version__}): {dt * 1e3:.0f} ms/step '
          f'= {B / dt:,.0f} rays/s at the lego shape (B={B})')


if __name__ == '__main__':
    main()
