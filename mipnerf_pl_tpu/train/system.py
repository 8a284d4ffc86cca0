"""Training system (L2): the jit/pjit train loop.

Replaces the reference's LightningModule + Trainer + DDPPlugin
(reference models/nerf_system.py:13-177, train.py:48-64) with ~300 lines of
explicit JAX: a pjit-sharded train step (data-parallel ray batches over a
TPU mesh, replicated parameters, XLA-inserted gradient psum over ICI), an
optax Adam + MipLRDecay schedule, chunked full-image validation renders,
TensorBoard logging with the reference's scalar/image names, and orbax
checkpointing (top-k on val/psnr + last).

Loss parity (reference models/nerf_system.py:95-121):
  loss = coarse_loss_mult * (mse_c + 0.01 * distloss_c)
         + mse_f + 0.01 * distloss_f
with the masked multi-scale MSE  (mask * (rgb - gt)^2).sum() / mask.sum().
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mipnerf_pl_tpu import config as config_lib
from mipnerf_pl_tpu.data.datasets import dataset_dict
from mipnerf_pl_tpu.data.pipeline import TrainBatcher
from mipnerf_pl_tpu.models.mipnerf import make_mipnerf_from_hparams
from mipnerf_pl_tpu.ops.render import distloss
from mipnerf_pl_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                          replicated_sharding)
from mipnerf_pl_tpu.rays import Rays, namedtuple_map, rays_chunks
from mipnerf_pl_tpu.train.ckpt import CheckpointManager
from mipnerf_pl_tpu.train.schedule import mip_lr_decay
from mipnerf_pl_tpu.utils.metrics import calc_psnr
from mipnerf_pl_tpu.utils.vis import stack_rgb, visualize_depth


class SimpleProfiler:
    """Phase-timing accumulator — the analog of PL's profiler='simple'
    (reference train.py:59): wall time per phase, printed at fit() end."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def add(self, name: str, dt: float):
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = ['profiler summary (phase: total s | calls | mean ms):']
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f'  {name:16s} {total:10.2f} | {n:6d} | {total / n * 1e3:10.2f}')
        return '\n'.join(lines)


def profiler_supported() -> bool:
    """jax.profiler works on the standard cpu/gpu/tpu backends; on tunneled
    relay platforms (the 'axon' plugin in this environment) start_trace has
    been observed to hang, so profiling is skipped unless forced with
    MIPNERF_FORCE_PROFILE=1 (SURVEY.md §5 tracing row).

    The relay is NOT detectable from jax.default_backend() — it registers
    as a regular 'tpu' platform (verified: default_backend() == 'tpu',
    device_kind 'TPU v5 lite') — so detect it from the PJRT
    platform_version string and the JAX_PLATFORMS selector instead."""
    if os.environ.get('MIPNERF_FORCE_PROFILE'):
        return True
    if 'axon' in os.environ.get('JAX_PLATFORMS', ''):
        return False
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        version = ''
    if 'axon' in version:
        return False
    return jax.default_backend() in ('cpu', 'gpu', 'tpu')


def _render_fusion_ok(hparams: Dict[str, Any]) -> bool:
    """True when the fused render+encode lean megakernel supports this
    model config (mirrors the MipNerf.setup gating for _fused_render /
    _fused_encode, models/mipnerf.py) — the condition under which
    val.mlp_backend='auto' picks it over the XLA forward."""
    return (bool(hparams['nerf.use_viewdirs'])
            and str(hparams['nerf.rgb_activation']) == 'sigmoid'
            and str(hparams['nerf.density_activation']) == 'softplus'
            and float(hparams['nerf.density_noise']) == 0.0
            and str(hparams['nerf.mlp.net_activation']) == 'relu'
            and int(hparams['nerf.mlp.num_rgb_channels']) == 3
            and int(hparams['nerf.mlp.num_density_channels']) == 1
            # The lean render kernel hard-raises on net_depth_condition < 1
            # (kernels/mlp.py fused_mlp_lean_render — the view branch is the
            # head-boundary layout); such configs render via the XLA twin.
            and int(hparams['nerf.mlp.net_depth_condition']) >= 1
            and not bool(hparams.get('nerf.unbounded', False))
            and str(hparams.get('nerf.ipe_backend', 'xla')) == 'xla')


def _dummy_rays(batch_size: int = 4) -> Rays:
    o = jnp.zeros((batch_size, 3), jnp.float32)
    d = jnp.concatenate([jnp.zeros((batch_size, 2)),
                         jnp.ones((batch_size, 1))], -1)
    s = jnp.ones((batch_size, 1), jnp.float32)
    return Rays(origins=o, directions=d, viewdirs=d, radii=0.01 * s,
                lossmult=s, near=2.0 * s, far=6.0 * s)


class MipNeRFSystem:
    """Owns the model, optimizer, mesh, data pipeline, and the fit loop."""

    def __init__(self, hparams: Dict[str, Any], mesh=None):
        self.hparams = dict(hparams)
        compute_dtype = (jnp.bfloat16
                         if str(hparams.get('train.compute_dtype',
                                            'float32')) == 'bfloat16'
                         else jnp.float32)
        self.model = make_mipnerf_from_hparams(hparams, compute_dtype)
        # Inference model: identical params, its own backend selection
        # (val.mlp_backend).  Forward-only the right kernel is DIFFERENT
        # from training's (no backward grid-sync, no saved streams);
        # tools/render_bench.py is the evidence base (PARITY.md "Render
        # path"):
        #   'auto'  -> the measured-fastest render backend: the fused
        #              render+encode lean megakernel when the model's fusion
        #              preconditions hold (2.34 s/frame at 800x800 vs the
        #              XLA forward's 2.88 — the in-kernel fast-polynomial
        #              IPE removes the 0.83 s/frame libm exp+sin cost,
        #              kernels/mlp.py _fast_exp/_fast_sin), else XLA
        #   'xla' | 'pallas_lean' | 'pallas_lean_save' -> explicit choice
        #              (lean backends render through the fuse_render level
        #              megakernel — per-ray outputs never touch HBM)
        train_backend = str(hparams.get('nerf.mlp_backend', 'xla'))
        val_backend = str(hparams.get('val.mlp_backend', 'auto') or 'auto')
        if val_backend == 'auto':
            val_backend = ('pallas_lean' if _render_fusion_ok(hparams)
                           else 'xla')
        if (val_backend != train_backend
                or val_backend.startswith('pallas_lean')):
            eval_hp = dict(hparams)
            eval_hp['nerf.mlp_backend'] = val_backend
            if val_backend.startswith('pallas_lean'):
                # Per-ray outputs never touch HBM; forward-only the fused
                # composite is pure win (no backward grid-sync cost, which
                # is what made it lose in training — DESIGN.md §10).  Same
                # story for the fused in-VMEM encode: its decode recompute
                # loses in training's fwd+bwd but wins forward-only (the
                # [M, 96] stream and the XLA exp/sin fusion both disappear).
                # Both gate themselves off inside the model when their
                # preconditions fail.  Eval computes no gradients, so the
                # lean family's stop_resample_grad requirement is moot —
                # force it to keep setup() from raising when training ran
                # with resample gradients enabled.
                eval_hp['nerf.fuse_render'] = True
                eval_hp['nerf.fuse_encode'] = True
                eval_hp['nerf.stop_resample_grad'] = True
            self.eval_model = make_mipnerf_from_hparams(eval_hp,
                                                        compute_dtype)
        else:
            self.eval_model = self.model
        self.lr_schedule = mip_lr_decay(
            hparams['optimizer.lr_init'], hparams['optimizer.lr_final'],
            hparams['optimizer.max_steps'],
            hparams['optimizer.lr_delay_steps'],
            hparams['optimizer.lr_delay_mult'])
        self.model_axis = int(hparams.get('parallel.model_axis', 1) or 1)
        # Packed Adam: one flat-vector update instead of ~36 per-leaf
        # micro-fusions inside the scan (train/opt.py).  Disabled under
        # model parallelism — raveling would merge differently-sharded
        # leaves into one replicated vector.  Checkpoint opt_states are
        # shape-incompatible across this flag; keep it fixed per run.
        if (bool(hparams.get('train.packed_adam', True))
                and self.model_axis == 1):
            from mipnerf_pl_tpu.train.opt import packed_adam
            self.tx = packed_adam(learning_rate=self.lr_schedule)
        else:
            self.tx = optax.adam(learning_rate=self.lr_schedule)
        # Device count: num_devices wins; otherwise honor the reference's
        # `num_gpus` key (reference configs/lego.yaml:2 carries it, so a
        # reference-style config with num_gpus: 2 must use 2 chips, not
        # silently all of them).  num_gpus of 0/1 means "unset" — 1 was the
        # long-standing compat default and is baked into every pre-round-3
        # checkpoint's hparams.json, so treating it as a device count would
        # silently shrink eval/render of old checkpoints to one device.
        # Use num_devices: 1 to genuinely pin a single chip.
        num_devices = int(hparams.get('num_devices', 0) or 0)
        if num_devices <= 0 and int(hparams.get('num_gpus', 0) or 0) > 1:
            num_devices = int(hparams['num_gpus'])
        self.mesh = mesh if mesh is not None else create_mesh(
            num_devices, model_axis=self.model_axis)
        self.batch_sharding = batch_sharding(self.mesh)
        self.param_sharding = replicated_sharding(self.mesh)
        from mipnerf_pl_tpu.parallel.mesh import stacked_batch_sharding
        self.stacked_sharding = stacked_batch_sharding(self.mesh)

        self.train_randomized = hparams['train.randomized']
        self.val_randomized = hparams['val.randomized']
        self.white_bkgd = hparams['train.white_bkgd']
        self.val_chunk_size = int(hparams['val.chunk_size'])
        self.batch_size = int(hparams['train.batch_size'])
        self.coarse_loss_mult = float(hparams['loss.coarse_loss_mult'])
        self.distloss_mult = float(hparams.get('loss.distloss_mult', 0.01))
        # MXU prefix sums for the distloss (same predicate as the model's
        # internal cumsums — the whole train step switches together).
        from mipnerf_pl_tpu.models.mipnerf import lean_cumsum_active
        self._mxu_distloss = lean_cumsum_active(
            bool(hparams.get('nerf.mxu_cumsum', True)), train_backend)
        self.disable_multiscale_loss = hparams['loss.disable_multiscale_loss']

        self._train_step = None
        self._render_chunk_jits = {}
        self._render_cam_jits = {}
        # Device-side output packing for full-image renders.  The fetch
        # rides a ~20 MB/s tunnel here (tools/render_probe.py: 20.7 MB =
        # 1.06 s/frame at 800px, a quarter of the render); f16 halves the
        # payload at ~1.5e-4 abs quantization error on [0,1] rgb — orders
        # of magnitude under the MSE of any real prediction (40 dB PSNR =
        # 1e-4 MSE), so PSNR/SSIM are unchanged to reported precision.
        # 'float32' opts out.
        self.fetch_dtype = jnp.dtype(
            self.hparams.get('val.fetch_dtype', 'float16'))
        self.train_dataset = None
        self.val_dataset = None

    # -- parameters ----------------------------------------------------------
    def init_state(self, seed: Optional[int] = None) -> Dict[str, Any]:
        """Initialize {params, opt_state, step} replicated over the mesh."""
        seed = int(self.hparams['seed'] if seed is None else seed)
        key = jax.random.PRNGKey(seed)
        params = self.model.init(key, _dummy_rays(), jax.random.PRNGKey(0),
                                 False, self.white_bkgd)
        params = self._place_params(params)
        opt_state = self.tx.init(params)
        return {'params': params, 'opt_state': opt_state,
                'step': jnp.zeros((), jnp.int32)}

    def _place_params(self, params):
        """Mesh placement for params: TP shardings when the model axis is
        active (Megatron-style, parallel/tp.py — GSPMD derives activation
        shardings and the psum collectives), replicated otherwise."""
        if self.mesh.shape.get('model', 1) > 1:
            from mipnerf_pl_tpu.parallel.tp import shard_params_tp
            return shard_params_tp(params, self.mesh)
        from mipnerf_pl_tpu.parallel.mesh import put_global_tree
        return put_global_tree(params, self.param_sharding)

    def place_state(self, state):
        """Place a restored host state on the mesh with the run's layout.

        In TP mode the params AND the optimizer moments (whose leaf paths
        mirror the params') get the Megatron shardings — a resumed TP run
        must not silently fall back to replicated layout."""
        if self.mesh.shape.get('model', 1) > 1:
            from mipnerf_pl_tpu.parallel.tp import mlp_param_shardings
            return jax.device_put(state, mlp_param_shardings(state, self.mesh))
        from mipnerf_pl_tpu.parallel.mesh import put_global_tree
        return put_global_tree(state, self.param_sharding)

    def abstract_state(self):
        """Abstract {params, opt_state, step} pytree (no device memory)."""
        key = jax.random.PRNGKey(0)
        params = jax.eval_shape(
            lambda k: self.model.init(k, _dummy_rays(), jax.random.PRNGKey(0),
                                      False, self.white_bkgd), key)
        opt_state = jax.eval_shape(self.tx.init, params)
        return {'params': params, 'opt_state': opt_state,
                'step': jax.ShapeDtypeStruct((), jnp.int32)}

    def abstract_eval_state(self):
        """Abstract {params, step} — no opt_state.  Eval/render restores use
        this so a checkpoint stays evaluable regardless of which optimizer
        layout (train.packed_adam on/off) wrote it."""
        st = self.abstract_state()
        return {'params': st['params'], 'step': st['step']}

    # -- data ----------------------------------------------------------------
    def setup(self, data_path: str, dataset_name: str,
              prefetch: int = 2, seed: Optional[int] = None,
              steps_per_call: int = 1):
        from mipnerf_pl_tpu.parallel.mesh import stacked_batch_sharding
        dataset_cls = dataset_dict[dataset_name]
        extra = {}
        factor = self.hparams.get('data.factor')
        if factor is not None and str(factor) != 'None':
            extra['factor'] = int(factor)
        self.train_dataset = dataset_cls(
            data_dir=data_path, split='train',
            white_bkgd=self.hparams['train.white_bkgd'],
            batch_type=self.hparams['train.batch_type'], **extra)
        self.val_dataset = dataset_cls(
            data_dir=data_path, split='val',
            white_bkgd=self.hparams['val.white_bkgd'],
            batch_type=self.hparams['val.batch_type'], **extra)
        sharding = (stacked_batch_sharding(self.mesh) if steps_per_call > 1
                    else self.batch_sharding)
        self.batcher = TrainBatcher(
            self.train_dataset, self.batch_size,
            seed=int(self.hparams['seed'] if seed is None else seed),
            sharding=sharding, prefetch=prefetch,
            steps_per_call=steps_per_call)

    # -- train step ------------------------------------------------------------
    def loss_fn(self, params, rays: Rays, pixels, key) -> Tuple[jnp.ndarray, dict]:
        ret = self.model.apply(params, rays, key, self.train_randomized,
                               self.white_bkgd)
        mask = rays.lossmult
        if self.disable_multiscale_loss:
            mask = jnp.ones_like(mask)
        mask_sum = jnp.sum(mask)

        use_dist = self.distloss_mult != 0.0
        losses, dists, psnrs = [], [], []
        for level in ret:
            mse = jnp.sum(mask * (level.rgb - pixels[..., :3]) ** 2) / mask_sum
            losses.append(mse)
            if use_dist:
                w, t = level.weights, level.t_samples
                if self.model.unbounded:
                    # t_samples carries DESCENDING t_inv in unbounded mode;
                    # distloss requires ascending bins (its prefix-sum
                    # identity negates on descending input) — flip both.
                    # Regularizing in inverse-depth (s-)space is the
                    # mip-NeRF-360 formulation.
                    w = jnp.flip(w, axis=-1)
                    t = jnp.flip(t, axis=-1)
                dists.append(distloss(w, t, mxu_cumsum=self._mxu_distloss))
            else:
                dists.append(jnp.zeros(()))
            psnrs.append(calc_psnr(level.rgb, pixels[..., :3]))

        loss = losses[-1] + self.distloss_mult * dists[-1]
        for mse_c, dist_c in zip(losses[:-1], dists[:-1]):
            loss = loss + self.coarse_loss_mult * (
                mse_c + self.distloss_mult * dist_c)

        aux = {
            'loss': loss,
            'train/psnr': psnrs[-1],
            'train/psnr_coarse': psnrs[0],
            'train/mse_fine': losses[-1],
            'train/distloss_fine': dists[-1],
        }
        return loss, aux

    def make_train_step(self, donate: bool = True):
        """Build the jitted, mesh-sharded train step."""

        def step_fn(state, rays, pixels, key):
            grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
            (_, aux), grads = grad_fn(state['params'], rays, pixels, key)
            updates, new_opt = self.tx.update(grads, state['opt_state'],
                                              state['params'])
            new_params = optax.apply_updates(state['params'], updates)
            aux['lr'] = self.lr_schedule(state['step'])
            new_state = {'params': new_params, 'opt_state': new_opt,
                         'step': state['step'] + 1}
            return new_state, aux

        donate_argnums = (0,) if donate else ()
        return jax.jit(step_fn, donate_argnums=donate_argnums)

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self.make_train_step(
                donate=bool(self.hparams.get('train.donate_buffers', True)))
        return self._train_step

    def make_train_many(self, donate: bool = True):
        """Build a jitted K-step trainer: `lax.scan` over stacked batches.

        One dispatch trains K steps on-device — the TPU-native answer to
        host->device dispatch latency (each Python->TPU call here rides a
        high-latency tunnel; per-step dispatch would bound throughput at
        ~30 rays/ms regardless of compute).  Batches arrive as [K, B, ...]
        stacks (one transfer); per-step PRNG keys are folded from the
        global step inside the scan, so resuming mid-run replays the exact
        same key sequence as single-step training.

        Returns fn(state, rays_stack, pixels_stack, base_key)
          -> (state, aux stacked over K).
        """

        def multi_step(state, rays_stack, pixels_stack, base_key):
            def body(carry, xs):
                rays, pixels = xs
                step_key = jax.random.fold_in(base_key, carry['step'])
                grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
                (_, aux), grads = grad_fn(carry['params'], rays, pixels,
                                          step_key)
                updates, new_opt = self.tx.update(grads, carry['opt_state'],
                                                  carry['params'])
                new_params = optax.apply_updates(carry['params'], updates)
                aux['lr'] = self.lr_schedule(carry['step'])
                new_carry = {'params': new_params, 'opt_state': new_opt,
                             'step': carry['step'] + 1}
                return new_carry, aux

            return jax.lax.scan(body, state, (rays_stack, pixels_stack))

        return jax.jit(multi_step, donate_argnums=(0,) if donate else ())

    # -- rendering --------------------------------------------------------------
    def _pack_outputs(self, coarse, fine, need_coarse: bool):
        """Select + downcast the per-chunk outputs fetched to the host.

        eval.py / render_video.py only consume the fine level; validate()
        needs the coarse rgb too.  Packing happens IN the jit so the
        dropped/f16 channels never cross the link (see fetch_dtype note in
        __init__)."""
        outs = (fine.rgb, fine.distance, fine.acc)
        if need_coarse:
            outs = (coarse.rgb,) + outs
        return tuple(jnp.asarray(o, self.fetch_dtype) for o in outs)

    def _unpack_outputs(self, outs, n_valid, need_coarse: bool):
        arrs = [np.asarray(o, np.float32).reshape(-1, *o.shape[2:])[:n_valid]
                for o in outs]
        names = (['coarse_rgb'] if need_coarse else []) + \
            ['fine_rgb', 'distance', 'acc']
        return dict(zip(names, arrs))

    def render_chunks_scanned(self, need_coarse: bool = True):
        """Jitted lax.map over [C, chunk, ...] stacked ray chunks.

        One dispatch + one fetch per image instead of per chunk — the same
        latency-amortization trick as the scanned trainer (the tunnel costs
        ~34 ms per sync).  `lax.map` keeps per-chunk memory footprint while
        rendering any image size with one compiled executable per chunk
        size (reference analog: rearrange_render_image, models/mip.py:404-421).
        """
        fn = self._render_chunk_jits.get(need_coarse)
        if fn is None:
            @jax.jit
            def _render(params, rays_stack, key):
                n_chunks = jax.tree_util.tree_leaves(rays_stack)[0].shape[0]

                def one(args):
                    idx, rays = args
                    # Per-chunk key: with val.randomized=True every chunk
                    # gets independent sample jitter (the reference's global
                    # RNG advances per chunk; a shared key would not).
                    ret = self.eval_model.apply(params, rays,
                                                jax.random.fold_in(key, idx),
                                                self.val_randomized,
                                                self.white_bkgd)
                    return self._pack_outputs(ret[0], ret[-1], need_coarse)
                return jax.lax.map(one, (jnp.arange(n_chunks), rays_stack))
            fn = self._render_chunk_jits[need_coarse] = _render
        return fn

    def _render_camera_jit(self, h: int, w: int, chunk: int,
                           need_coarse: bool = True):
        """Jitted camera->image render, cached per (h, w, chunk).

        The whole pipeline — ray generation from ~100 bytes of pose/
        intrinsics (ops/camera.py), edge-pad, chunking, and the lax.map'd
        model forward — runs in ONE device program.  Rays never exist on
        the host: tools/render_probe.py measured the materialized-ray
        host->device path at ~1.3 s/frame at 800px on this link, a third
        of the full render (reference ships the full bundle every frame,
        eval.py:49-78)."""
        key_ = (h, w, chunk, need_coarse)
        fn = self._render_cam_jits.get(key_)
        if fn is None:
            n = h * w
            n_chunks = -(-n // chunk)
            pad = n_chunks * chunk - n
            constrain = self.mesh.shape.get('data', 1) > 1

            @jax.jit
            def _render(params, cam, key):
                from mipnerf_pl_tpu.ops.camera import camera_rays
                rays = camera_rays(cam, h, w)
                flat = namedtuple_map(
                    lambda x: x.reshape(n, x.shape[-1]), rays)
                if pad:
                    # Edge-pad with the last ray (valid geometry, results
                    # sliced away by the caller) to keep shapes static.
                    flat = namedtuple_map(lambda x: jnp.concatenate(
                        [x, jnp.broadcast_to(x[-1:], (pad, x.shape[-1]))],
                        axis=0), flat)
                stack = namedtuple_map(
                    lambda x: x.reshape(n_chunks, chunk, x.shape[-1]), flat)
                if constrain:
                    stack = namedtuple_map(
                        lambda x: jax.lax.with_sharding_constraint(
                            x, self.stacked_sharding), stack)

                def one(args):
                    idx, rays = args
                    ret = self.eval_model.apply(
                        params, rays, jax.random.fold_in(key, idx),
                        self.val_randomized, self.white_bkgd)
                    return self._pack_outputs(ret[0], ret[-1], need_coarse)
                return jax.lax.map(one, (jnp.arange(n_chunks), stack))

            fn = self._render_cam_jits[key_] = _render
        return fn

    def render_camera(self, params, cam, h: int, w: int,
                      key: Optional[jax.Array] = None,
                      chunk_size: Optional[int] = None,
                      need_coarse: bool = True):
        """Full-image render from a Camera -> dict of numpy images.

        Same outputs as `render_image`, but rays are generated ON DEVICE
        from the camera (pose + intrinsics) inside the render jit.  With
        need_coarse=False the coarse rgb is neither fetched nor in the
        returned dict (eval/render_video fast path)."""
        chunk_size = chunk_size or self.val_chunk_size
        if key is None:
            key = jax.random.PRNGKey(0)
        outs = self._render_camera_jit(h, w, chunk_size,
                                       need_coarse)(params, cam, key)
        out = self._unpack_outputs(outs, h * w, need_coarse)
        return {k: v.reshape(h, w, 3) if v.ndim == 2 else v.reshape(h, w)
                for k, v in out.items()}

    def render_image(self, params, rays: Rays,
                     key: Optional[jax.Array] = None,
                     chunk_size: Optional[int] = None,
                     need_coarse: bool = True):
        """Chunked full-image render -> dict of numpy images.

        Fixed-shape chunks (last one edge-padded) are stacked and scanned
        on-device in a single dispatch.
        """
        chunk_size = chunk_size or self.val_chunk_size
        h, w = rays.origins.shape[-3:-1]
        chunks, n_valid = rays_chunks(rays, chunk_size)
        if key is None:
            key = jax.random.PRNGKey(0)

        stack = Rays(*[np.stack([np.asarray(getattr(c, f)) for c in chunks])
                       for f in Rays._fields])
        from mipnerf_pl_tpu.parallel.mesh import put_global
        stack = namedtuple_map(
            lambda x: put_global(x, self.stacked_sharding), stack)
        outs = self.render_chunks_scanned(need_coarse)(params, stack, key)
        out = self._unpack_outputs(outs, n_valid, need_coarse)
        return {k: v.reshape(h, w, 3) if v.ndim == 2 else v.reshape(h, w)
                for k, v in out.items()}

    def validate(self, state, num_images: int, writer=None,
                 global_step: int = 0, start_index: int = 0):
        """Render `num_images` val images; log and return mean loss/psnr."""
        val_losses, val_psnrs = [], []
        n = len(self.val_dataset)
        for i in range(num_images):
            rays, rgb_gt = self.val_dataset[(start_index + i) % n]
            out = None
            cam_fn = getattr(self.val_dataset, 'camera', None)
            if cam_fn is not None:
                # Catch NotImplementedError ONLY around the dataset accessor
                # ("this dataset has no single-camera form") — a raise from
                # inside the render itself (e.g. an activation guard) is a
                # real misconfiguration and must propagate.
                try:
                    cam, (ch, cw) = cam_fn((start_index + i) % n)
                except NotImplementedError:
                    cam = None
                if cam is not None:
                    out = self.render_camera(state['params'], cam, ch, cw)
            if out is None:
                out = self.render_image(state['params'], rays)
            gt = rgb_gt[..., :3]
            mask = np.asarray(rays.lossmult)
            mask_b = np.broadcast_to(mask, (*gt.shape[:-1], 1))
            mse_c = (mask_b * (out['coarse_rgb'] - gt) ** 2).sum() / mask_b.sum()
            mse_f = (mask_b * (out['fine_rgb'] - gt) ** 2).sum() / mask_b.sum()
            val_losses.append(self.coarse_loss_mult * mse_c + mse_f)
            val_psnrs.append(-10.0 * np.log10(np.mean((out['fine_rgb'] - gt) ** 2)))
            if writer is not None and i == 0:
                writer.add_images('val/GT_coarse_fine',
                                  stack_rgb(gt, out['coarse_rgb'],
                                            out['fine_rgb']),
                                  global_step)
                depth = visualize_depth(out['distance'])
                writer.add_image('distance',
                                 np.transpose(depth, (2, 0, 1)), global_step)
        mean_loss = float(np.mean(val_losses))
        mean_psnr = float(np.mean(val_psnrs))
        if writer is not None:
            writer.add_scalar('val/loss', mean_loss, global_step)
            writer.add_scalar('val/psnr', mean_psnr, global_step)
        return mean_loss, mean_psnr

    # -- fit loop -----------------------------------------------------------------
    def fit(self, data_path: str, dataset_name: str, out_dir: str,
            max_steps: Optional[int] = None, log_every: int = 100,
            resume_path: Optional[str] = None, verbose: bool = True):
        """Full training run: data, loop, val, checkpoints, TB logs."""
        from tensorboardX import SummaryWriter

        hp = self.hparams
        # Record the data binding so checkpoints are self-contained (eval /
        # render restore hparams from the ckpt dir alone).
        hp['dataset_name'] = dataset_name
        hp['data_path'] = data_path
        exp_name = hp['exp_name']
        max_steps = int(max_steps or hp['optimizer.max_steps'])
        val_interval = int(hp['val.check_interval'])
        val_sample_num = int(hp['val.sample_num'])

        # K steps per device dispatch (lax.scan): amortizes host->TPU
        # dispatch latency.  Boundaries are rounded to multiples of K so one
        # compiled executable serves the whole run.
        spc = int(hp.get('train.steps_per_call', 20) or 1)
        spc = max(1, min(spc, val_interval, max_steps))
        val_interval = ((val_interval + spc - 1) // spc) * spc
        log_every = max(spc, ((log_every + spc - 1) // spc) * spc)

        self.setup(data_path, dataset_name, steps_per_call=spc)
        state = self.init_state()
        start_step = 0

        ckpt_dir = os.path.join(out_dir, 'ckpt', exp_name)
        ckpt = CheckpointManager(ckpt_dir, hparams=hp,
                                 save_top_k=int(hp.get('checkpoint.save_top_k', 2)))
        # Failure recovery (SURVEY.md §5): explicit resume_path wins;
        # otherwise auto-restore from this run's own `last` checkpoint if one
        # exists (a crashed/preempted job restarted with the same out_dir
        # continues where it left off — the reference loses everything
        # unless resume is passed manually).
        resume_from = None
        explicit = resume_path or hp.get('checkpoint.resume_path')
        if explicit and str(explicit) != 'None':
            resume_from = str(explicit)
        elif (hp.get('checkpoint.auto_resume', True)
              and ckpt.latest_step() is not None):
            resume_from = ckpt_dir
        if resume_from:
            from mipnerf_pl_tpu.train.ckpt import restore_for_eval
            start_step, state = restore_for_eval(
                resume_from, self.abstract_state(), prefer_best=False)
            state = self.place_state(state)
            if verbose:
                print(f'resumed from {resume_from} at step {start_step}',
                      flush=True)

        writer = SummaryWriter(os.path.join(out_dir, 'logs', exp_name))
        base_key = jax.random.PRNGKey(int(hp['seed']))

        # Sanity val render (reference num_sanity_val_steps=1, train.py:57).
        self.validate(state, 1, writer=None, global_step=start_step)

        train_many = self.make_train_many(
            donate=bool(hp.get('train.donate_buffers', True)))
        prof = SimpleProfiler()

        # --profile N: wrap one steady-state K-step dispatch in a
        # jax.profiler trace written to the TB logdir.  Degrades gracefully:
        # skipped with a message on platforms where start_trace hangs.
        profile_steps = int(hp.get('profile', 0) or 0)
        if profile_steps > 0 and not profiler_supported():
            print(f'--profile: jax.profiler unsupported on the '
                  f'{jax.default_backend()!r} backend here; skipping '
                  f'(set MIPNERF_FORCE_PROFILE=1 to force)', flush=True)
            profile_steps = 0
        # jax.profiler.trace appends plugins/profile to its log_dir; handing
        # it the run's TB logdir puts the trace exactly where TensorBoard's
        # profile plugin looks (logs/<exp>/plugins/profile).
        trace_dir = os.path.join(out_dir, 'logs', exp_name)

        def next_shaped(remaining):
            """Fetch a batch shaped as a [k, ...] dispatch stack (k <= spc;
            ragged on the final call only)."""
            rays, pixels = next(self.batcher)
            if spc == 1:
                rays = namedtuple_map(lambda x: x[None] if x.ndim == 2 else x,
                                      rays)
                pixels = pixels[None] if pixels.ndim == 2 else pixels
            k = min(spc, remaining)
            if k < spc:
                # Ragged final call: slice the stack (one extra compile, once).
                rays = namedtuple_map(lambda x: x[:k], rays)
                pixels = pixels[:k]
            return rays, pixels, k

        t0 = time.time()
        rays_since_log = 0
        val_cursor = 0
        dispatch_index = 0
        step = start_step
        while step < max_steps:
            t_data = time.time()
            rays, pixels, k = next_shaped(max_steps - step)
            prof.add('data', time.time() - t_data)
            t_step = time.time()
            if profile_steps > 0 and dispatch_index == 1:
                # Second dispatch = warmed executable (the first compiles).
                # Trace whole dispatches covering >= profile_steps scanned
                # steps, bounded by max_steps, a fresh batch each; then fall
                # through so logging/validation/checkpointing still run.
                n_disp = max(1, (profile_steps + spc - 1) // spc)
                try:
                    with jax.profiler.trace(trace_dir):
                        for i in range(n_disp):
                            if i > 0:
                                if step + spc > max_steps:
                                    break
                                rays, pixels, k = next_shaped(
                                    max_steps - step)
                            state, aux = train_many(state, rays, pixels,
                                                    base_key)
                            step += k
                            rays_since_log += self.batch_size * k
                        jax.block_until_ready(aux['loss'])
                    print(f'--profile: trace written to {trace_dir}',
                          flush=True)
                except Exception as e:  # never let tracing kill training
                    print(f'--profile: trace failed ({e}); continuing',
                          flush=True)
                profile_steps = 0
            else:
                state, aux = train_many(state, rays, pixels, base_key)
                step += k
                rays_since_log += self.batch_size * k
            prof.add('train_dispatch', time.time() - t_step)
            dispatch_index += 1

            if step % log_every == 0 or step == start_step + spc:
                aux = jax.device_get(aux)   # [K]-stacked scalars
                dt = time.time() - t0
                rays_per_sec = rays_since_log / max(dt, 1e-9)
                writer.add_scalar('lr', float(aux['lr'][-1]), step)
                writer.add_scalar('train/loss', float(aux['loss'][-1]), step)
                writer.add_scalar('train/psnr',
                                  float(aux['train/psnr'][-1]), step)
                writer.add_scalar('perf/rays_per_sec', rays_per_sec, step)
                if verbose:
                    print(f'step {step}/{max_steps} '
                          f'loss={float(aux["loss"][-1]):.5f} '
                          f'psnr={float(aux["train/psnr"][-1]):.2f} '
                          f'lr={float(aux["lr"][-1]):.2e} '
                          f'rays/s={rays_per_sec:,.0f}', flush=True)
                t0 = time.time()
                rays_since_log = 0

            if step % val_interval == 0 or step >= max_steps:
                t_val = time.time()
                # Cycle through val images across validations (reference
                # behaviour: the val dataset advances an internal counter,
                # datasets/datasets.py:79-81).
                val_loss, val_psnr = self.validate(
                    state, val_sample_num, writer=writer,
                    global_step=step, start_index=val_cursor)
                val_cursor += val_sample_num
                # Machine-readable val trajectory next to the TB events —
                # convergence/plateau evidence without a TB reader.
                hist = os.path.join(out_dir, 'logs', exp_name,
                                    'val_history.csv')
                write_header = not os.path.exists(hist)
                with open(hist, 'a') as f:
                    if write_header:
                        f.write('step,val_loss,val_psnr\n')
                    f.write(f'{step},{val_loss:.6f},{val_psnr:.4f}\n')
                prof.add('validate', time.time() - t_val)
                t_ckpt = time.time()
                host_state = jax.device_get(state)
                ckpt.save(step, host_state, val_psnr=val_psnr)
                prof.add('checkpoint', time.time() - t_ckpt)
                t0 = time.time()
                rays_since_log = 0

        ckpt.close()
        self.batcher.close()
        writer.close()
        if verbose:
            print(prof.summary(), flush=True)
        return state
