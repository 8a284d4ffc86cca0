#!/usr/bin/env python
"""MXU probe: the chip's practical matmul ceiling for the MLP's shapes,
and where the lean megakernels lose time against it.  One parameterized
tool (round-3 VERDICT hygiene: formerly mxu_probe{,2,3}.py).

Usage: python tools/mxu_probe.py STAGE [args...]

  stage1 [variant...]   ceilings (DESIGN.md §5 numbers)
      big_xla       one [16384, 2048] @ [2048, 2048] XLA chain (chip peak)
      chain_xla     8x [M, 256] @ [256, 256] XLA chain (MLP trunk, HBM)
      chain_pallas  same chain inside ONE pallas kernel, weights in VMEM
      chain_relu    chain_pallas + bias + relu + bf16 cast (the real op)

  stage2 [tile...]      Mosaic schedule knobs on the in-kernel chain
      sweeps tile_M x out_dtype(f32/bf16) x relu, plus one
      dimension_semantics=parallel row (defaults: 2048 4096 8192 16384)

  stage3 [variant...]   boundary-stream hypotheses (DESIGN.md §12)
      clean         the chain, separate w/b inputs (baseline)
      accum_out     + 8 [256,256] f32 constant-index accumulator OUTPUTS
                    with += per grid step (lean backward dparam pattern)
      accum_scratch same accumulation in VMEM scratch, flushed once
      wide_out      + one [T, 2432] bf16 per-tile output (fwd save stream)
      wide_in       + one [T, 2432] bf16 per-tile INPUT (bwd saved stream)
      wide_out_dma  manual double-buffered DMA of the wide output

Env: PROBE_TILE (stage1/stage3 row tile, default 2048).
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
FLOPS_CHAIN = 2 * M * W * W * DEPTH
SAVED_W = 2432


def _timed(name, fn, flops):
    import jax
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
    print(f'{name:34s} {dt * 1e3:7.2f} ms  {flops / dt / 1e12:6.1f} TF/s',
          flush=True)


def _setup():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, W)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    ws = [jnp.asarray((rng.normal(size=(W, W)) * 0.06).astype(np.float32))
          .astype(jnp.bfloat16) for _ in range(DEPTH)]
    bs = [jnp.asarray(rng.normal(size=(1, W)).astype(np.float32))
          .astype(jnp.bfloat16) for _ in range(DEPTH)]
    return rng, x0, ws, bs


# ---------------------------------------------------------------------------
# stage1: ceilings
# ---------------------------------------------------------------------------

def stage1(variants):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rng, x, ws, bs = _setup()

    def scan(body):
        @jax.jit
        def run(*args):
            def f(c, i):
                return c + body(i, *args), None
            tot, _ = jax.lax.scan(f, jnp.zeros(()), jnp.arange(K_SCAN))
            return tot
        return run

    def big(i, A, B):
        A2 = A + i.astype(jnp.bfloat16) * 0
        return jnp.sum(jnp.dot(A2, B, preferred_element_type=jnp.float32))

    def chain_xla(i, x, *ws):
        h = x + i.astype(jnp.bfloat16) * 0
        for w in ws:
            h = jnp.dot(h, w,
                        preferred_element_type=jnp.float32) \
                .astype(jnp.bfloat16)
        return jnp.sum(h.astype(jnp.float32))

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
                    acc = jnp.maximum(
                        acc + brefs[d][:].astype(jnp.float32), 0.0)
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

    A = jnp.asarray(rng.normal(size=(16384, 2048)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    B = jnp.asarray(rng.normal(size=(2048, 2048)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    table = {
        'big_xla': (lambda: scan(big)(A, B), 2 * 16384 * 2048 * 2048),
        'chain_xla': (lambda: scan(chain_xla)(x, *ws), FLOPS_CHAIN),
        'chain_pallas': (lambda: scan(mk_pallas(False))(x, *ws, *bs),
                         FLOPS_CHAIN),
        'chain_relu': (lambda: scan(mk_pallas(True))(x, *ws, *bs),
                       FLOPS_CHAIN),
    }
    for name in variants or list(table):
        fn, flops = table[name]
        _timed(name, fn, flops)


# ---------------------------------------------------------------------------
# stage2: Mosaic schedule knobs
# ---------------------------------------------------------------------------

def stage2(args):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _, x0, ws, bs = _setup()

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
                        y = jnp.maximum(
                            y + params[2 * i + 1][:].astype(f32), 0.0)
                    h = y.astype(jnp.bfloat16)
                else:
                    y = jnp.dot(h, w, preferred_element_type=jnp.bfloat16)
                    if relu:
                        y = jnp.maximum(y + params[2 * i + 1][:], 0)
                    h = y
            o_ref[:] = h

        grid = (M // tile,)
        full = [pl.BlockSpec((W, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]

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

    tiles = [int(t) for t in args] or [2048, 4096, 8192, 16384]
    for tile in tiles:
        for out_dtype in ('f32', 'bf16'):
            for relu in (True, False):
                name = f'tile={tile} out={out_dtype} relu={int(relu)}'
                try:
                    _timed(name, make(tile, out_dtype, relu, 'arbitrary'),
                           FLOPS_CHAIN)
                except Exception as e:  # noqa: BLE001
                    print(f'{name:34s} FAILED {type(e).__name__}: {e}',
                          flush=True)
    _timed('tile=8192 f32 relu sem=parallel',
           make(8192, 'f32', True, 'parallel'), FLOPS_CHAIN)


# ---------------------------------------------------------------------------
# stage3: boundary-stream hypotheses
# ---------------------------------------------------------------------------

def stage3(variants):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rng, x0, ws, _bs = _setup()
    saved = jnp.asarray(rng.normal(size=(M, SAVED_W)).astype(np.float32)) \
        .astype(jnp.bfloat16)

    # NOTE an earlier revision rebuilt the @jax.jit closure on every timed
    # call, so it measured retracing (8.9 TF/s) instead of the kernel; each
    # variant's jitted fn must be built exactly once.
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024,
                              dimension_semantics=('arbitrary',))
    f32 = jnp.float32
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

    def k_accum(x_ref, *refs):
        params = [r[:] for r in refs[:DEPTH]]
        o = refs[DEPTH]
        accs = refs[DEPTH + 1:]
        h = x_ref[:]
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
                               + [jax.ShapeDtypeStruct((W, W), f32)]
                               * DEPTH),
                    grid=grid, in_specs=[tile_in] + [wfull] * DEPTH,
                    out_specs=[tile_in] + [wfull] * DEPTH,
                    compiler_params=cp)(c, *ws)
                return outs[0], outs[1]
            out, _ = jax.lax.scan(body, x, None, length=K_SCAN)
            return jnp.sum(out[:1, :1].astype(f32))
        return lambda: f(x0)

    def k_scratch(x_ref, *refs):
        params = [r[:] for r in refs[:DEPTH]]
        o = refs[DEPTH]
        accs_out = refs[DEPTH + 1:DEPTH + 1 + DEPTH]
        scratch = refs[DEPTH + 1 + DEPTH:]
        h = x_ref[:]
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
                               + [jax.ShapeDtypeStruct((W, W), f32)]
                               * DEPTH),
                    grid=grid, in_specs=[tile_in] + [wfull] * DEPTH,
                    out_specs=[tile_in] + [wfull] * DEPTH,
                    scratch_shapes=[pltpu.VMEM((W, W), f32)] * DEPTH,
                    compiler_params=cp)(c, *ws)
                return outs[0], outs[1]
            out, _ = jax.lax.scan(body, x, None, length=K_SCAN)
            return jnp.sum(out[:1, :1].astype(f32))
        return lambda: f(x0)

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

    fns = dict(clean=run_clean, accum_out=run_accum,
               accum_scratch=run_scratch, wide_out=run_wide_out,
               wide_in=run_wide_in, wide_out_dma=run_wide_dma)
    for n in variants or ['clean', 'accum_out', 'accum_scratch',
                          'wide_out', 'wide_in']:
        try:
            _timed(n, fns[n](), FLOPS_CHAIN)
        except Exception as e:  # noqa: BLE001
            print(f'{n:14s} FAILED {type(e).__name__}: {e}'[:300],
                  flush=True)


def main():
    stages = {'stage1': stage1, 'stage2': stage2, 'stage3': stage3}
    if len(sys.argv) < 2 or sys.argv[1] not in stages:
        print(__doc__)
        sys.exit(2)
    stages[sys.argv[1]](sys.argv[2:])


if __name__ == '__main__':
    main()
