#!/usr/bin/env python
"""Isolated MLP micro-bench at the lego shape: fwd and fwd+bwd per backend.

  python tools/mlp_bench.py [xla|pallas|pallas_save ...]

Times ONE level's worth of MLP work (M = 3072*128 points) in a K-step scan;
multiply by 2 for the per-train-step cost.  Methodology as perf_step.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
B = 3072
N = 128
M = B * N


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

    from mipnerf_pl_tpu.models.mlp import MLP

    backends = sys.argv[1:] or ['xla', 'pallas']
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(size=(B, N, 96)).astype(np.float32))
    venc = jnp.asarray(rng.normal(size=(B, 27)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def timed(name, fn, *args):
        out = None
        for _ in range(2):
            out = fn(*args)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        n_calls = 4
        t0 = time.perf_counter()
        for _ in range(n_calls):
            out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = time.perf_counter() - t0
        per = dt / (n_calls * K) * 1e3
        print(f'{name:24s} {per:8.2f} ms  (x2 levels = {2*per:7.2f} ms/step)',
              flush=True)

    for backend in backends:
        mlp = MLP(compute_dtype=jnp.bfloat16, backend=backend)
        mp = mlp.init(jax.random.PRNGKey(0), enc, venc)

        def scan(body):
            @jax.jit
            def run(mp):
                def f(carry, i):
                    return carry + body(mp, i), None
                tot, _ = jax.lax.scan(f, jnp.zeros(()), jnp.arange(K))
                return tot
            return run

        def _fwd(mp, i):
            e = enc + jax.random.fold_in(key, i)[0].astype(jnp.float32) * 0.0
            rgb, dens = mlp.apply(mp, e, venc)
            return jnp.sum(rgb) + jnp.sum(dens)
        timed(f'{backend} fwd', scan(_fwd), mp)

        def _loss(mp, e):
            rgb, dens = mlp.apply(mp, e, venc)
            return jnp.sum(rgb ** 2) + jnp.sum(dens ** 2)

        def _bwd(mp, i):
            e = enc + jax.random.fold_in(key, i)[0].astype(jnp.float32) * 0.0
            val, g = jax.value_and_grad(_loss)(mp, e)
            return val + sum(jnp.sum(x)
                             for x in jax.tree_util.tree_leaves(g))
        timed(f'{backend} fwd+bwd', scan(_bwd), mp)


if __name__ == '__main__':
    main()
