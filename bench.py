#!/usr/bin/env python
"""Benchmark: training-step throughput (rays/sec/chip) on the lego workload.

Runs the EXACT reference training workload shape — batch 3072 rays, 128
samples x 2 levels through the shared 8x256 MLP (configs/lego.yaml:5,20-21,
38-39), Adam + MipLRDecay, masked MSE + distloss — on synthetic rays (no
dataset dependency) and prints JSON lines; the LAST line is the graded
result.

Robustness contract (the tunneled TPU's compile latency swings 2-15+ min,
and round 2's bench timed out with no number at all):
  * The parent process never touches JAX.  Each measurement runs in a child
    process (the tunnel grants the chip to one client at a time), so a
    hung/slow attempt is killable without losing what already printed.
  * The known-fast-to-compile XLA backend is measured FIRST and its JSON
    line printed immediately; the faster Pallas megakernel backend is then
    attempted under a hard wall-clock deadline and its line printed only if
    it beats the XLA number.  A stalled Pallas compile can therefore
    degrade the result, never erase it.
  * A persistent XLA compilation cache (mipnerf_pl_tpu/compile_cache.py)
    makes retries and repeat runs warm.
Env knobs: BENCH_MLP_BACKEND (default pallas_lean_save; 'xla' skips the
second child), BENCH_XLA_TIMEOUT / BENCH_PALLAS_TIMEOUT (seconds),
BENCH_K (steps per dispatch), BENCH_BATCH (smoke-testing only),
BENCH_FUSE_RENDER (opt-in experiment), BENCH_FUSE_ENCODE=0 (disable the
round-4 in-kernel IPE), BENCH_NET_WIDTH (TP-sizing measurements at
non-reference trunk widths; DESIGN.md §11), BENCH_PARITY=0 (skip the
on-chip grad-parity gate that guards every pallas measurement; see
_parity_gate) and BENCH_PARITY_TOL (its leaf tolerance, default 3e-2).

vs_baseline: the denominator is an estimate of the reference PyTorch code on
an A100 (the reference publishes no speed numbers and no GPU exists here).
Provenance — BASELINE.md "Throughput denominator": bracketed by (a) the
measured reference-torch step on this host's CPU (tools/measure_ref_torch.py:
104.9 s/step = 29 rays/s on one core, 27 GFLOP/s effective) and (b) an A100
roofline of the step's measured 2.81 TFLOP / >=21 GB fp32 eager traffic
(~50-100 ms/step => ~10-30k rays/s).  10k is the bracket's LOWER edge (the
driver's original framing, BENCH_r01); the printed `vs_baseline_bracket`
gives the ratio at both edges so the claim is never anchored to the
friendliest denominator alone.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 10_000.0  # A100 torch estimate, bracket lower edge
REFERENCE_RAYS_PER_SEC_UPPER = 30_000.0  # bracket upper edge (BASELINE.md)


# ---------------------------------------------------------------------------
# Child: claim the chip, measure one backend, print one JSON line.
# ---------------------------------------------------------------------------

def _ensure_backend():
    """The tunneled TPU plugin occasionally fails to claim its grant right
    after another process released it; re-exec once or twice to retry."""
    try:
        # Importing the package re-asserts the caller's JAX_PLATFORMS env
        # selection over the sitecustomize plugin's live-config override
        # (mipnerf_pl_tpu.__init__._respect_env_platform).
        import mipnerf_pl_tpu  # noqa: F401
        import jax
        jax.devices()
        return
    except RuntimeError:
        retries = int(os.environ.get('BENCH_BACKEND_RETRIES', '0'))
        if retries >= int(os.environ.get('BENCH_BACKEND_MAX_RETRIES', '8')):
            raise
        os.environ['BENCH_BACKEND_RETRIES'] = str(retries + 1)
        time.sleep(30)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _child_main(backend: str):
    _ensure_backend()
    from mipnerf_pl_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from mipnerf_pl_tpu.config import default
    hparams = default()
    hparams['train.compute_dtype'] = 'bfloat16'
    hparams['nerf.mlp_backend'] = backend
    # Opt-in experiment: composite inside the megakernel (models/mipnerf.py
    # fuse_render).  Off by default — measured slower than unfused.
    if os.environ.get('BENCH_FUSE_RENDER'):
        hparams['nerf.fuse_render'] = True
    if os.environ.get('BENCH_CHANNEL_MAJOR'):
        # '0' disables (channel_major defaults True since round 3), any
        # other non-empty value force-enables.
        hparams['nerf.channel_major'] = \
            os.environ['BENCH_CHANNEL_MAJOR'] != '0'
    if os.environ.get('BENCH_LEAN_INPUT_CAST'):
        # Fallback retry (see main): pre-round-3 XLA-side bf16 input cast.
        hparams['nerf.lean_input_cast'] = True
    if os.environ.get('BENCH_FUSE_ENCODE') == '0':
        # Fallback retry (see main): disable the round-4 in-kernel IPE.
        hparams['nerf.fuse_encode'] = False
    if os.environ.get('BENCH_BATCH'):  # smoke-testing only
        hparams['train.batch_size'] = int(os.environ['BENCH_BATCH'])
    if os.environ.get('BENCH_NET_WIDTH'):  # TP-sizing rows (DESIGN.md §11)
        hparams['nerf.mlp.net_width'] = int(os.environ['BENCH_NET_WIDTH'])
    _run(hparams)


def _parity_gate(system, hparams, rays, pixels, tol):
    """On-chip one-step grad-parity gate (VERDICT r4 weak #1c): before
    timing a pallas backend, value_and_grad the full train loss on one
    identical batch through it AND the XLA backend and compare every grad
    leaf.  A Mosaic/lowering miscompile would ship a fast wrong number;
    this catches it in the same child that produces the graded line.  The
    result is echoed in the bench JSON (parity_ok) and the parent discards
    the line on failure, falling back to the already-printed XLA number."""
    import time as _time

    import jax

    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    t0 = _time.perf_counter()
    hp = dict(hparams)
    hp['nerf.mlp_backend'] = 'xla'
    grads = {}
    for name, s in (('xla', MipNeRFSystem(hp, mesh=system.mesh)),
                    ('pallas', system)):
        state = s.init_state()    # same seed -> identical params
        r = jax.tree.map(lambda x: jax.device_put(x, s.batch_sharding), rays)
        px = jax.device_put(pixels, s.batch_sharding)
        gfn = jax.jit(lambda p, r_, px_, k, s=s: jax.value_and_grad(
            s.loss_fn, has_aux=True)(p, r_, px_, k))
        (_, _), g = gfn(state['params'], r, px, jax.random.PRNGKey(7))
        grads[name] = jax.device_get(g)
    worst = 0.0
    for a, b in zip(jax.tree.leaves(grads['xla']),
                    jax.tree.leaves(grads['pallas'])):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        worst = max(worst, float(np.linalg.norm(b - a)
                                 / (np.linalg.norm(a) + 1e-12)))
    return {'parity_ok': bool(worst <= tol),
            'parity_max_leaf_rel_err': round(worst, 6),
            'parity_gate_s': round(_time.perf_counter() - t0, 1)}


def _run(hparams):
    import jax

    from mipnerf_pl_tpu.train.system import MipNeRFSystem
    from mipnerf_pl_tpu.rays import Rays

    system = MipNeRFSystem(hparams)
    n_chips = system.mesh.devices.size
    batch_size = int(hparams['train.batch_size'])

    rng = np.random.default_rng(0)
    d = rng.normal(size=(batch_size, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((batch_size, 1), np.float32)
    rays = Rays(origins=rng.normal(size=(batch_size, 3)).astype(np.float32) * 0.1,
                directions=d, viewdirs=d, radii=ones * 0.005, lossmult=ones,
                near=ones * 2.0, far=ones * 6.0)
    pixels1 = rng.uniform(size=(batch_size, 3)).astype(np.float32)

    parity = None
    if (str(hparams['nerf.mlp_backend']) != 'xla'
            and os.environ.get('BENCH_PARITY', '1') != '0'):
        parity = _parity_gate(
            system, hparams, rays, pixels1,
            tol=float(os.environ.get('BENCH_PARITY_TOL', '3e-2')))
        print(f'# parity gate: {parity}', file=sys.stderr, flush=True)

    # K-step scanned trainer: one dispatch = K on-device steps (the tunnel
    # to the TPU has ~30 ms dispatch/sync latency; scanning amortizes it).
    # Measured K=25 -> 75.7k rays/s, K=100 -> 76.2k (+0.7%); 100 is default.
    K = int(os.environ.get('BENCH_K', '100'))
    from mipnerf_pl_tpu.parallel.mesh import stacked_batch_sharding
    stack_sh = stacked_batch_sharding(system.mesh)
    rays = jax.tree.map(
        lambda x: jax.device_put(
            np.broadcast_to(x[None], (K, *x.shape)).copy(), stack_sh), rays)
    pixels = jax.device_put(
        np.broadcast_to(pixels1[None], (K, batch_size, 3)).copy(), stack_sh)

    state = system.init_state()
    key = jax.random.PRNGKey(0)
    train_many = system.make_train_many(donate=True)

    # Warmup: first call compiles; second recompiles once with the donated
    # output buffers aliased as inputs (steady-state executable).
    for _ in range(2):
        state, aux = train_many(state, rays, pixels, key)
        float(np.asarray(aux['loss'][-1]))

    n_calls = 4
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, aux = train_many(state, rays, pixels, key)
    float(np.asarray(aux['loss'][-1]))   # force completion
    dt = time.perf_counter() - t0

    rays_per_sec = n_calls * K * batch_size / dt
    rays_per_sec_chip = rays_per_sec / n_chips
    line = {
        'metric': 'train_rays_per_sec_per_chip',
        'value': round(rays_per_sec_chip, 1),
        'unit': 'rays/s/chip',
        'vs_baseline': round(rays_per_sec_chip / REFERENCE_RAYS_PER_SEC, 3),
        'backend': str(hparams['nerf.mlp_backend']),
        'ms_per_step': round(1e3 * batch_size / rays_per_sec_chip, 2),
        'vs_baseline_bracket': [
            round(rays_per_sec_chip / REFERENCE_RAYS_PER_SEC_UPPER, 3),
            round(rays_per_sec_chip / REFERENCE_RAYS_PER_SEC, 3)],
    }
    if os.environ.get('BENCH_NET_WIDTH'):
        # Off-reference shape: self-describe so a TP-sizing row can never be
        # mistaken for the graded lego-shape number.
        line['net_width'] = int(hparams['nerf.mlp.net_width'])
    if parity is not None:
        line.update(parity)
    print(json.dumps(line), flush=True)


# ---------------------------------------------------------------------------
# Parent: orchestrate children; guarantee a tail JSON line lands.
# ---------------------------------------------------------------------------

def _run_child(backend: str, timeout: float, extra_env=None):
    """Run one measurement child; return its parsed JSON line or None."""
    def parse_lines(stdout):
        result = None
        for line in (stdout or '').splitlines():
            line = line.strip()
            if line.startswith('{'):
                try:
                    result = json.loads(line)
                except json.JSONDecodeError:
                    pass
            elif line:
                print(f'# child[{backend}]: {line}', file=sys.stderr)
        return result

    env = dict(os.environ, **extra_env) if extra_env else None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--child', backend],
            capture_output=True, text=True, timeout=timeout, env=env)
    except subprocess.TimeoutExpired as e:
        stderr = e.stderr if isinstance(e.stderr, str) else \
            (e.stderr or b'').decode()
        stdout = e.stdout if isinstance(e.stdout, str) else \
            (e.stdout or b'').decode()
        sys.stderr.write(stderr)
        print(f'# bench child {backend!r} hit the {timeout:.0f}s deadline; '
              'killed', file=sys.stderr, flush=True)
        # The measurement may have landed before the hang (the tunnel is
        # known to stall in teardown): salvage any JSON the child printed.
        return parse_lines(stdout), True, stderr
    if proc.stderr:
        sys.stderr.write(proc.stderr)
        sys.stderr.flush()
    result = parse_lines(proc.stdout)
    if proc.returncode != 0:
        print(f'# bench child {backend!r} exited rc={proc.returncode}',
              file=sys.stderr, flush=True)
    return result, False, proc.stderr or ''


def _is_vmem_oom(stderr: str) -> bool:
    """Mosaic scoped-VMEM allocation failure: a config/shape problem no
    boundary-layout retry can fix (ADVICE r3: retrying just doubles
    time-to-fallback, e.g. W=1024 single-chip)."""
    s = stderr or ''
    return ('vmem' in s.lower() and
            ('exceeds' in s.lower() or 'alloc' in s.lower()))


def main():
    best_backend = os.environ.get('BENCH_MLP_BACKEND', 'pallas_lean_save')
    plan = [('xla', float(os.environ.get('BENCH_XLA_TIMEOUT', '2700')))]
    if best_backend != 'xla':
        plan.append((best_backend,
                     float(os.environ.get('BENCH_PALLAS_TIMEOUT', '1500'))))

    # Fallback ladder for the pallas child, newest boundary first: the
    # round-4 in-kernel IPE, then the round-3 f32-input/channel-major
    # layout.  Each rung only runs if the child died FAST (a Mosaic
    # lowering gap — a slow compile would have hit the deadline instead)
    # and NOT with a scoped-VMEM allocation failure (an OOM no layout
    # retry can fix; retrying just doubles time-to-fallback — ADVICE r3).
    ladder = [
        ('fuse_encode_off', {'BENCH_FUSE_ENCODE': '0'}),
        ('lean_input_cast', {'BENCH_FUSE_ENCODE': '0',
                             'BENCH_LEAN_INPUT_CAST': '1',
                             'BENCH_CHANNEL_MAJOR': '0'}),
    ]
    best = None
    for backend, timeout in plan:
        result, timed_out, stderr = _run_child(backend, timeout)
        if result is None and backend != 'xla':
            for name, env in ladder:
                if timed_out or _is_vmem_oom(stderr):
                    break
                print(f'# bench: retrying {backend!r} with fallback '
                      f'{name!r}', file=sys.stderr, flush=True)
                result, timed_out, stderr = _run_child(backend, timeout, env)
                if result is not None:
                    result['fallback'] = name
                    break
        if result is None:
            continue
        if result.get('parity_ok') is False:
            # The on-chip grad-parity gate failed: a fast wrong number.
            # The XLA line already printed stands as the graded result.
            print(f'# bench: {backend!r} FAILED the grad-parity gate (max '
                  f'leaf rel err {result.get("parity_max_leaf_rel_err")}); '
                  'discarding its measurement', file=sys.stderr, flush=True)
            continue
        if best is None or result['value'] > best['value']:
            best = result
            # Print improvements as they land: the driver parses the tail,
            # so the best line so far is always the last one out.
            print(json.dumps(best), flush=True)
    if best is None:
        print('# bench: no measurement landed', file=sys.stderr, flush=True)
        sys.exit(1)


if __name__ == '__main__':
    if len(sys.argv) >= 3 and sys.argv[1] == '--child':
        _child_main(sys.argv[2])
    else:
        main()
