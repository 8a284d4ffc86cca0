#!/usr/bin/env python
"""Second-stage MXU probe: what raises the in-kernel matmul-chain rate?

mxu_probe.py established: XLA's HBM-streamed chain hits ~118 TF/s while the
VMEM-resident Pallas chain caps at ~102 — even though the Pallas kernel has
no HBM traffic between layers.  The train-step floor sits right at the 10x
target, so every TF/s of in-kernel rate matters.  This probe sweeps the
knobs that plausibly control the Mosaic schedule:

  tile_M      rows per grid step (DMA amortization, MXU pipeline depth)
  out_dtype   f32 accum + cast vs bf16 dot output (VPU cast pressure)
  unroll      python-unrolled layer loop (always; fori would break VMEM)
  relu        with/without bias+relu between dots
  semantics   dimension_semantics parallel vs arbitrary

Usage: python tools/mxu_probe2.py [tile ...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = 3072 * 128
W = 256
DEPTH = 8
K_SCAN = 10
FLOPS = 2 * M * W * W * DEPTH


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, W)).astype(np.float32)).astype(jnp.bfloat16)
    ws = [jnp.asarray((rng.normal(size=(W, W)) * 0.06).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(DEPTH)]
    bs = [jnp.asarray(rng.normal(size=(1, W)).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(DEPTH)]

    def timed(name, fn, *args):
        out = None
        for _ in range(2):
            out = fn(*args)
            float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(out).ravel()[0])
        dt = time.perf_counter() - t0 / 1.0
        dt = (time.perf_counter() - t0) / (n * K_SCAN)
        print(f'{name:34s} {dt * 1e3:7.2f} ms  {FLOPS / dt / 1e12:6.1f} TF/s',
              flush=True)

    def make(tile, out_dtype, relu, semantics):
        f32 = jnp.float32

        def kernel(x_ref, *refs):
            o_ref = refs[-1]
            params = refs[:-1]
            h = x_ref[:]
            for i in range(DEPTH):
                w = params[2 * i][:]
                if out_dtype == 'f32':
                    y = jnp.dot(h, w, preferred_element_type=f32)
                    if relu:
                        y = jnp.maximum(y + params[2 * i + 1][:].astype(f32), 0.0)
                    h = y.astype(jnp.bfloat16)
                else:
                    y = jnp.dot(h, w, preferred_element_type=jnp.bfloat16)
                    if relu:
                        y = jnp.maximum(y + params[2 * i + 1][:], 0)
                    h = y
            o_ref[:] = h

        grid = (M // tile,)
        full = [pl.BlockSpec((W, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM)]

        @jax.jit
        def run(x, flat):
            def body(c, _):
                out = pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((M, W), jnp.bfloat16),
                    grid=grid,
                    in_specs=([pl.BlockSpec((tile, W), lambda i: (i, 0),
                                            memory_space=pltpu.VMEM)]
                              + full * DEPTH),
                    out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=(semantics,),
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(c, *flat)
                return out, ()
            out, _ = jax.lax.scan(body, x, None, length=K_SCAN)
            return jnp.sum(out[:1, :1].astype(jnp.float32))

        flat = []
        for w, b in zip(ws, bs):
            flat += [w, b]
        return lambda: run(x0, tuple(flat))

    tiles = [int(t) for t in sys.argv[1:]] or [2048, 4096, 8192, 16384]
    for tile in tiles:
        for out_dtype in ('f32', 'bf16'):
            for relu in (True, False):
                sem = 'arbitrary'
                name = f'tile={tile} out={out_dtype} relu={int(relu)}'
                try:
                    timed(name, make(tile, out_dtype, relu, sem))
                except Exception as e:  # noqa
                    print(f'{name:34s} FAILED {type(e).__name__}: {e}',
                          flush=True)
    # semantics comparison at the best tile
    timed('tile=8192 f32 relu sem=parallel',
          make(8192, 'f32', True, 'parallel'))


if __name__ == '__main__':
    main()
