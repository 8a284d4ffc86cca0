#!/usr/bin/env python
"""Third-stage probe: where does the lean-save kernel lose ~9 ms vs its
MXU budget?  Tests the boundary-stream hypotheses directly on the chain
shape from mxu_probe.py (8x [393k,256]@[256,256] bf16, ~107 TF/s clean).

Variants:
  clean        the chain, separate w/b inputs           (baseline ~107)
  accum_out    + 8 [256,256] f32 constant-index accumulator OUTPUTS with
               += per grid step (the dparam pattern in the lean backward)
  accum_scratch same accumulation in VMEM scratch, outputs written only on
               the last grid step (tests whether per-step output flush is
               the cost)
  wide_out     + one [T, 2432] bf16 per-tile output (the fwd save stream)
  wide_in      + one [T, 2432] bf16 per-tile INPUT (the bwd saved stream)
"""

import functools
import sys
import time

import numpy as np

M = 3072 * 128
W = 256
DEPTH = 8
TILE = 2048
K_SCAN = 10
FLOPS = 2 * M * W * W * DEPTH
SAVED_W = 2432


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
    saved = jnp.asarray(rng.normal(size=(M, SAVED_W)).astype(np.float32)).astype(jnp.bfloat16)

    # NOTE an earlier revision of this file rebuilt the @jax.jit closure on
    # every timed call, so it measured retracing (8.9 TF/s) instead of the
    # kernel; each variant's jitted fn must be built exactly once.
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                              dimension_semantics=('arbitrary',))
    f32 = jnp.float32

    def timed(name, fn):
        out = None
        for _ in range(2):
            out = fn()
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / (n * K_SCAN)
        print(f'{name:14s} {dt * 1e3:7.2f} ms  {FLOPS / dt / 1e12:6.1f} TF/s',
              flush=True)

    grid = (M // TILE,)
    tile_in = pl.BlockSpec((TILE, W), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    tile_saved = pl.BlockSpec((TILE, SAVED_W), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    wfull = pl.BlockSpec((W, W), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def chain(x, params):
        h = x
        for i in range(DEPTH):
            h = jnp.dot(h, params[i], preferred_element_type=f32) \
                .astype(jnp.bfloat16)
        return h

    # --- clean ------------------------------------------------------------
    def k_clean(x_ref, *refs):
        o = refs[-1]
        o[:] = chain(x_ref[:], [r[:] for r in refs[:DEPTH]])

    def run_clean():
        @jax.jit
        def f(x):
            def body(c, _):
                out = pl.pallas_call(
                    k_clean,
                    out_shape=jax.ShapeDtypeStruct((M, W), jnp.bfloat16),
                    grid=grid, in_specs=[tile_in] + [wfull] * DEPTH,
                    out_specs=tile_in, compiler_params=cp)(c, *ws)
                return out, ()
            out, _ = jax.lax.scan(body, x, None, length=K_SCAN)
            return jnp.sum(out[:1, :1].astype(f32))
        return lambda: f(x0)

    # --- accum_out: 8 constant-index f32 accumulator outputs --------------
    def k_accum(x_ref, *refs):
        params = [r[:] for r in refs[:DEPTH]]
        o = refs[DEPTH]
        accs = refs[DEPTH + 1:]
        x = x_ref[:]
        h = x
        first = pl.program_id(0) == 0
        for i in range(DEPTH):
            h2 = jnp.dot(h, params[i], preferred_element_type=f32) \
                .astype(jnp.bfloat16)
            @pl.when(first)
            def _(acc=accs[i]):
                acc[:] = jnp.zeros(acc.shape, acc.dtype)
            accs[i][:] += jax.lax.dot_general(
                h, h2, (((0,), (0,)), ((), ())), preferred_element_type=f32)
            h = h2
        o[:] = h

    def run_accum():
        @jax.jit
        def f(x):
            def body(c, _):
                outs = pl.pallas_call(
                    k_accum,
                    out_shape=([jax.ShapeDtypeStruct((M, W), jnp.bfloat16)]
                               + [jax.ShapeDtypeStruct((W, W), f32)] * DEPTH),
                    grid=grid, in_specs=[tile_in] + [wfull] * DEPTH,
                    out_specs=[tile_in] + [wfull] * DEPTH,
                    compiler_params=cp)(c, *ws)
                return outs[0], outs[1]
            out, _ = jax.lax.scan(body, x, None, length=K_SCAN)
            return jnp.sum(out[:1, :1].astype(f32))
        return lambda: f(x0)

    # --- accum_scratch: accumulate in scratch, flush once -----------------
    def k_scratch(x_ref, *refs):
        params = [r[:] for r in refs[:DEPTH]]
        o = refs[DEPTH]
        accs_out = refs[DEPTH + 1:DEPTH + 1 + DEPTH]
        scratch = refs[DEPTH + 1 + DEPTH:]
        x = x_ref[:]
        h = x
        first = pl.program_id(0) == 0
        last = pl.program_id(0) == pl.num_programs(0) - 1
        for i in range(DEPTH):
            h2 = jnp.dot(h, params[i], preferred_element_type=f32) \
                .astype(jnp.bfloat16)
            @pl.when(first)
            def _(s=scratch[i]):
                s[:] = jnp.zeros(s.shape, s.dtype)
            scratch[i][:] += jax.lax.dot_general(
                h, h2, (((0,), (0,)), ((), ())), preferred_element_type=f32)
            @pl.when(last)
            def _(a=accs_out[i], s=scratch[i]):
                a[:] = s[:]
            h = h2
        o[:] = h

    def run_scratch():
        @jax.jit
        def f(x):
            def body(c, _):
                outs = pl.pallas_call(
                    k_scratch,
                    out_shape=([jax.ShapeDtypeStruct((M, W), jnp.bfloat16)]
                               + [jax.ShapeDtypeStruct((W, W), f32)] * DEPTH),
                    grid=grid, in_specs=[tile_in] + [wfull] * DEPTH,
                    out_specs=[tile_in] + [wfull] * DEPTH,
                    scratch_shapes=[pltpu.VMEM((W, W), f32)] * DEPTH,
                    compiler_params=cp)(c, *ws)
                return outs[0], outs[1]
            out, _ = jax.lax.scan(body, x, None, length=K_SCAN)
            return jnp.sum(out[:1, :1].astype(f32))
        return lambda: f(x0)

    # --- wide_out: + [T, 2432] bf16 per-tile output -----------------------
    def k_wide_out(x_ref, *refs):
        params = [r[:] for r in refs[:DEPTH]]
        o, wide = refs[DEPTH], refs[DEPTH + 1]
        hs = []
        h = x_ref[:]
        for i in range(DEPTH):
            h = jnp.dot(h, params[i], preferred_element_type=f32) \
                .astype(jnp.bfloat16)
            hs.append(h)
        o[:] = h
        wide[:] = jnp.concatenate(hs + [h, h[:, :128]], axis=-1)

    def run_wide_out():
        @jax.jit
        def f(x):
            def body(c, _):
                out, _w = pl.pallas_call(
                    k_wide_out,
                    out_shape=(jax.ShapeDtypeStruct((M, W), jnp.bfloat16),
                               jax.ShapeDtypeStruct((M, SAVED_W),
                                                    jnp.bfloat16)),
                    grid=grid, in_specs=[tile_in] + [wfull] * DEPTH,
                    out_specs=(tile_in, tile_saved),
                    compiler_params=cp)(c, *ws)
                return out, ()
            out, _ = jax.lax.scan(body, x, None, length=K_SCAN)
            return jnp.sum(out[:1, :1].astype(f32))
        return lambda: f(x0)

    # --- wide_in: + [T, 2432] bf16 per-tile input -------------------------
    def k_wide_in(x_ref, s_ref, *refs):
        params = [r[:] for r in refs[:DEPTH]]
        o = refs[DEPTH]
        h = x_ref[:] + s_ref[:, :W]
        for i in range(DEPTH):
            h = jnp.dot(h, params[i], preferred_element_type=f32) \
                .astype(jnp.bfloat16)
        o[:] = h

    def run_wide_in():
        @jax.jit
        def f(x):
            def body(c, _):
                out = pl.pallas_call(
                    k_wide_in,
                    out_shape=jax.ShapeDtypeStruct((M, W), jnp.bfloat16),
                    grid=grid, in_specs=[tile_in, tile_saved]
                    + [wfull] * DEPTH,
                    out_specs=tile_in, compiler_params=cp)(c, saved, *ws)
                return out, ()
            out, _ = jax.lax.scan(body, x, None, length=K_SCAN)
            return jnp.sum(out[:1, :1].astype(f32))
        return lambda: f(x0)


    # --- wide_out_dma: manual double-buffered streaming of the wide output
    # (out ref lives in HBM; kernel DMAs each tile's scratch slot out and
    # only waits on that slot two steps later) ----------------------------
    def k_wide_dma(x_ref, *refs):
        params = [r[:] for r in refs[:DEPTH]]
        o, wide_hbm = refs[DEPTH], refs[DEPTH + 1]
        scratch, sems = refs[DEPTH + 2], refs[DEPTH + 3]
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)

        def dma(for_step, s):
            return pltpu.make_async_copy(
                scratch.at[s],
                wide_hbm.at[pl.ds(for_step * TILE, TILE), :],
                sems.at[s])

        @pl.when(i >= 2)
        def _():
            dma(i - 2, slot).wait()

        hs = []
        h = x_ref[:]
        for d in range(DEPTH):
            h = jnp.dot(h, params[d], preferred_element_type=f32) \
                .astype(jnp.bfloat16)
            hs.append(h)
        o[:] = h
        val = jnp.concatenate(hs + [h, h[:, :128]], axis=-1)

        @pl.when(slot == 0)
        def _():
            scratch[0] = val

        @pl.when(slot == 1)
        def _():
            scratch[1] = val
        dma(i, slot).start()

        @pl.when(i == n - 1)
        def _():
            @pl.when(n >= 2)
            def _():
                dma(i - 1, jax.lax.rem(i - 1, 2)).wait()
            dma(i, slot).wait()

    def run_wide_dma():
        @jax.jit
        def f(x):
            def body(c, _):
                out, _w = pl.pallas_call(
                    k_wide_dma,
                    out_shape=(jax.ShapeDtypeStruct((M, W), jnp.bfloat16),
                               jax.ShapeDtypeStruct((M, SAVED_W),
                                                    jnp.bfloat16)),
                    grid=grid,
                    in_specs=[tile_in] + [wfull] * DEPTH,
                    out_specs=(tile_in,
                               pl.BlockSpec(memory_space=pltpu.ANY)),
                    scratch_shapes=[
                        pltpu.VMEM((2, TILE, SAVED_W), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
                    compiler_params=cp)(c, *ws)
                return out, ()
            out, _ = jax.lax.scan(body, x, None, length=K_SCAN)
            return jnp.sum(out[:1, :1].astype(f32))
        return lambda: f(x0)

    names = sys.argv[1:] or ['clean', 'accum_out', 'accum_scratch',
                             'wide_out', 'wide_in']
    fns = dict(clean=run_clean, accum_out=run_accum,
               accum_scratch=run_scratch, wide_out=run_wide_out,
               wide_in=run_wide_in, wide_out_dma=run_wide_dma)
    for n in names:
        try:
            timed(n, fns[n]())
        except Exception as e:  # noqa
            print(f'{n:14s} FAILED {type(e).__name__}: {e}'[:300], flush=True)


if __name__ == '__main__':
    main()
