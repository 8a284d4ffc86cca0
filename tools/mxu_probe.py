#!/usr/bin/env python
"""Probe the chip's practical MXU ceiling for the MLP's matmul shapes.

Variants:
  big_xla      one [16384, 2048] @ [2048, 2048] XLA matmul chain (chip peak)
  chain_xla    8x [M, 256] @ [256, 256] XLA chain (the MLP trunk shape, HBM)
  chain_pallas same chain inside ONE pallas kernel, weights VMEM-resident
  chain_relu   chain_pallas + bias + relu + bf16 cast per layer (the real op)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = 3072 * 128
W = 256
DEPTH = 8
TILE = int(os.environ.get('PROBE_TILE', '2048'))
K_SCAN = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, W)).astype(np.float32)).astype(jnp.bfloat16)
    ws = [jnp.asarray((rng.normal(size=(W, W)) * 0.06).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(DEPTH)]
    bs = [jnp.asarray(rng.normal(size=(1, W)).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(DEPTH)]

    def timed(name, fn, flops, *args):
        for _ in range(2):
            out = fn(*args)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / (n * K_SCAN)
        print(f'{name:14s} {dt*1e3:8.2f} ms  {flops/dt/1e12:7.1f} TFLOP/s',
              flush=True)

    def scan(body):
        @jax.jit
        def run(*args):
            def f(c, i):
                return c + body(i, *args), None
            tot, _ = jax.lax.scan(f, jnp.zeros(()), jnp.arange(K_SCAN))
            return tot
        return run

    # chip-peak reference: one big square matmul
    A = jnp.asarray(rng.normal(size=(16384, 2048)).astype(np.float32)).astype(jnp.bfloat16)
    B = jnp.asarray(rng.normal(size=(2048, 2048)).astype(np.float32)).astype(jnp.bfloat16)

    def big(i, A, B):
        A2 = A + i.astype(jnp.bfloat16) * 0
        return jnp.sum(jnp.dot(A2, B, preferred_element_type=jnp.float32))
    timed('big_xla', scan(big), 2 * 16384 * 2048 * 2048, A, B)

    flops_chain = 2 * M * W * W * DEPTH

    def chain_xla(i, x, *ws):
        h = x + i.astype(jnp.bfloat16) * 0
        for w in ws:
            h = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.sum(h.astype(jnp.float32))
    timed('chain_xla', scan(chain_xla), flops_chain, x, *ws)

    def mk_kernel(relu):
        def kernel(x_ref, *refs):
            wrefs = refs[:DEPTH]
            brefs = refs[DEPTH:2 * DEPTH]
            out_ref = refs[2 * DEPTH]
            h = x_ref[:]
            for d in range(DEPTH):
                acc = jnp.dot(h, wrefs[d][:],
                              preferred_element_type=jnp.float32)
                if relu:
                    acc = jnp.maximum(acc + brefs[d][:].astype(jnp.float32),
                                      0.0)
                h = acc.astype(jnp.bfloat16)
            out_ref[:] = jnp.sum(h.astype(jnp.float32), axis=-1,
                                 keepdims=True)
        return kernel

    def mk_pallas(relu):
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        tile = pl.BlockSpec((TILE, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        otile = pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            mk_kernel(relu),
            out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
            grid=(M // TILE,),
            in_specs=[tile] + [full] * (2 * DEPTH),
            out_specs=otile,
        )

        def body(i, x, *args):
            x2 = x + i.astype(jnp.bfloat16) * 0
            return jnp.sum(call(x2, *args))
        return body

    timed('chain_pallas', scan(mk_pallas(False)), flops_chain, x, *ws, *bs)
    timed('chain_relu', scan(mk_pallas(True)), flops_chain, x, *ws, *bs)


if __name__ == '__main__':
    main()
