"""The Mip-NeRF MLP (L1) as a Flax module.

Architecture parity: reference models/mip_nerf.py:14-111 — an 8x256 ReLU
trunk with a skip-concat of the encoded input after every `skip_index`
layers, a density head, a bottleneck `extra_layer`, a 1x128 view-conditioned
branch, and an RGB head.  Kernel init is Xavier/Glorot-uniform
(reference models/mip_nerf.py:7-11); biases are zero-init (deviation: torch
Linear defaults biases to U(+-1/sqrt(fan_in)); zeros is the JAX/Flax norm and
trains identically).

TPU-first design notes:
  * All matmuls run on the MXU.  `compute_dtype=bfloat16` casts activations
    (params stay float32) so the MXU runs native bf16 x bf16 -> f32 passes;
    widths 256/128 are exact multiples of the 128-lane MXU tile.
  * The sample axis is folded into the batch for the matmuls by XLA
    automatically ([B, N, F] dots are batched over B*N rows).
  * The view-direction features are broadcast across samples *after* the
    bottleneck projection — computing the broadcast at [B, F_view] and
    letting the concat+dense fuse avoids materializing [B, N, F_view] in HBM
    twice.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class _DenseParams(nn.Module):
    """Owns a Dense layer's params without computing — lets the fused
    Pallas backend share the exact same parameter tree as the XLA path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param('kernel', nn.initializers.xavier_uniform(),
                       (in_features, self.features), jnp.float32)
        b = self.param('bias', nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class MLP(nn.Module):
    """Coordinate MLP mapping encoded cone-Gaussians to (raw_rgb, raw_density).

    backend='pallas' evaluates the whole network with the fused VMEM
    megakernel (kernels/mlp.py): weights resident on-chip, activations never
    written to HBM, backward recomputed in-VMEM.  Parameter trees are
    identical between backends (checkpoints interchangeable).
    """

    net_depth: int = 8
    net_width: int = 256
    net_depth_condition: int = 1
    net_width_condition: int = 128
    skip_index: int = 4
    num_rgb_channels: int = 3
    num_density_channels: int = 1
    net_activation: str = 'relu'
    compute_dtype: Any = jnp.float32
    backend: str = 'xla'
    # (rgb_padding, density_bias) to fuse the model's sigmoid/softplus head
    # epilogue into the lean megakernel (set by MipNerf when the head
    # activations are the defaults and density_noise == 0); None = return
    # raw heads.  Only honored by the lean backends.
    fused_activation: Optional[tuple] = None
    # Channel-major head boundary (set by MipNerf): the lean kernel returns
    # (rgb [3, B, N], density [nd, B, N]) so the head streams avoid the
    # [M, 3] lane-padded layout (kernels/mlp.py fused_mlp_lean cmajor).
    # Callers must composite channel-major (ops/render.py
    # volumetric_rendering_cmajor).  Lean pallas backends only.
    channel_major: bool = False
    # Fallback knob: cast the encode input to the compute dtype in XLA
    # BEFORE the lean kernel (the pre-round-3 boundary, which materializes
    # a packed bf16 copy in HBM).  Exists so the bench can retry with the
    # known-compiling operand layout if the f32-input kernel ever hits a
    # Mosaic lowering gap on a new toolchain.
    input_cast: bool = False

    def _act(self, x):
        if self.net_activation == 'relu':
            return nn.relu(x)
        raise NotImplementedError(self.net_activation)

    @nn.compact
    def __call__(self, x, view_direction: Optional[jnp.ndarray] = None,
                 render=None, encode=None):
        """Evaluate the MLP.

        Args:
          x: [batch, num_samples, feature] encoded sample positions (IPE) —
            or, with `encode`, the CHANNEL-MAJOR [6, batch, num_samples]
            cone-Gaussian moments (ops/math.py cast_rays_cmajor).
          view_direction: optional [batch, feature] encoded view directions,
            shared by all samples of a ray.
          render: optional (delta [batch, N], mids [batch, N], white_bkgd)
            — fuse volumetric compositing into the lean megakernel and
            return PER-RAY outputs (comp_rgb, dist_raw, acc, weights)
            instead of the raw heads.  Requires a lean backend and
            `fused_activation`.
          encode: optional (min_deg, max_deg) — fuse the integrated
            positional encoding into the lean megakernel (x carries
            moments, the kernel computes the IPE per tile in VMEM).
            Requires a lean pallas backend.

        Returns:
          raw_rgb: [batch, num_samples, num_rgb_channels] (float32)
          raw_density: [batch, num_samples, num_density_channels] (float32)
          — or the per-ray render tuple when `render` is given.
        """
        if encode is not None and self.backend not in ('pallas_lean',
                                                       'pallas_lean_save'):
            raise ValueError('encode fusion requires a lean pallas backend, '
                             f'got {self.backend!r}')
        if render is not None:
            return self._call_pallas_lean_render(x, view_direction, *render,
                                                 encode=encode)
        num_samples = x.shape[-1] if encode is not None else x.shape[-2]
        if (self.backend in ('pallas_lean', 'pallas_lean_save',
                             'pallas_hybrid')
                and view_direction is not None):
            return self._call_pallas_lean(x, view_direction, encode)
        if (self.backend in ('pallas', 'pallas_save')
                and view_direction is not None):
            return self._call_pallas(x, view_direction)
        # Flatten [.., N, F] -> [M, F]: XLA lowers 3-D Dense ops to TPU
        # convolutions with poorly-fused bias broadcasts and pad-based
        # concats (verified in the optimized HLO); plain 2-D rows become
        # clean matmuls the compiler fuses properly.
        lead = x.shape[:-1]
        cd = self.compute_dtype

        def dense(name, features, *xs):
            """y = concat(xs) @ kernel + bias WITHOUT the concat: the kernel
            keeps the concatenated-input layout [sum(F_i), features] (param
            tree identical to nn.Dense on the concat), but each input hits
            its own row-slice in a separate MXU pass.  Materializing the
            concat costs a lane-padded [M, 384] f32 round-trip per level at
            the lego shape (352- and 283-wide inputs both pad to 384);
            summing partial matmuls keeps every operand a clean tile."""
            dim_in = sum(t.shape[-1] for t in xs)
            k, b = _DenseParams(features, name=name)(dim_in)
            out, off = b.astype(cd), 0
            for t in xs:
                out = out + t @ k[off:off + t.shape[-1]].astype(cd)
                off += t.shape[-1]
            return out

        x = x.reshape(-1, x.shape[-1]).astype(cd)
        inputs = x
        skip = None   # set to the encoded inputs right after a skip layer
        for i in range(self.net_depth):
            parts = (x,) if skip is None else (x, skip)
            x = self._act(dense(f'trunk_{i}', self.net_width, *parts))
            skip = inputs if (i % self.skip_index == 0 and i > 0) else None

        trunk_parts = (x,) if skip is None else (x, skip)
        raw_density = dense('density', self.num_density_channels,
                            *trunk_parts)

        if view_direction is not None:
            bottleneck = dense('bottleneck', self.net_width, *trunk_parts)
            view = view_direction.astype(cd)

            def split_dense(name, w, per_sample_in):
                """concat(per_sample_in, view) @ kernel + bias WITHOUT
                repeating the per-ray view features to [B*N, F_v]: project
                them ONCE per ray ([B, F_v] rows) and broadcast-add into the
                per-sample projection (reference models/mip_nerf.py:106
                repeats, then matmuls at B*N)."""
                w_in = per_sample_in.shape[-1]
                k, b = _DenseParams(w, name=name)(w_in + view.shape[-1])
                per_sample = per_sample_in @ k[:w_in].astype(cd)
                per_ray = view @ k[w_in:].astype(cd) + b.astype(cd)
                out = per_sample.reshape(-1, num_samples, w) \
                    + per_ray[:, None, :]
                return out.reshape(-1, w)

            for i in range(self.net_depth_condition):
                if i == 0:
                    x = self._act(split_dense(
                        'view_0', self.net_width_condition, bottleneck))
                else:
                    x = self._act(dense(f'view_{i}',
                                        self.net_width_condition, x))
            if self.net_depth_condition == 0:
                # No conditioning layers: the rgb head itself consumes
                # concat(bottleneck, view) (reference models/mip_nerf.py:
                # 66-73 with net_depth_condition=0).
                raw_rgb = split_dense('rgb', self.num_rgb_channels,
                                      bottleneck)
            else:
                raw_rgb = dense('rgb', self.num_rgb_channels, x)
        else:
            raw_rgb = dense('rgb', self.num_rgb_channels, *trunk_parts)
        # Heads return float32 regardless of compute dtype: the activations /
        # compositing downstream are precision-critical.
        return (raw_rgb.reshape(*lead, self.num_rgb_channels).astype(jnp.float32),
                raw_density.reshape(*lead, self.num_density_channels).astype(jnp.float32))

    def _declare_flat_params(self, xyz_dim: int, view_dim: int):
        """Declare the identical parameter tree nn.Dense would own, as the
        flat [k0, b0, k1, b1, ...] list the fused kernels index."""
        flat = []
        dim_in = xyz_dim
        for i in range(self.net_depth):
            k, b = _DenseParams(self.net_width, name=f'trunk_{i}')(dim_in)
            flat += [k, b.reshape(1, -1)]
            dim_in = self.net_width
            if i % self.skip_index == 0 and i > 0:
                dim_in = self.net_width + xyz_dim
        k, b = _DenseParams(self.num_density_channels, name='density')(dim_in)
        flat += [k, b.reshape(1, -1)]
        k, b = _DenseParams(self.net_width, name='bottleneck')(dim_in)
        flat += [k, b.reshape(1, -1)]
        dim_v = self.net_width + view_dim
        for j in range(self.net_depth_condition):
            k, b = _DenseParams(self.net_width_condition,
                                name=f'view_{j}')(dim_v)
            flat += [k, b.reshape(1, -1)]
            dim_v = self.net_width_condition
        k, b = _DenseParams(self.num_rgb_channels, name='rgb')(dim_v)
        flat += [k, b.reshape(1, -1)]
        return flat

    def _lean_x_layout(self, x, encode):
        """(num_samples, xyz_dim, lead, x2) of the lean per-point input in
        either boundary layout: encoded rows [.., N, F] -> [M, F], or
        channel-major moments [6, .., N] -> [6, M] with the ENCODED width
        as xyz_dim (the kernel decodes to it; the param tree is identical
        either way)."""
        if encode is None:
            return x.shape[-2], x.shape[-1], x.shape[:-1], \
                x.reshape(-1, x.shape[-1])
        min_deg, max_deg = encode
        xyz_dim = 2 * (max_deg - min_deg) * (x.shape[0] // 2)
        return x.shape[-1], xyz_dim, x.shape[1:], x.reshape(x.shape[0], -1)

    def _call_pallas_lean(self, x, view_direction, encode=None):
        """Lean megakernel (kernels/mlp.py:fused_mlp_lean): f32 encode
        input cast to the compute dtype in-VMEM (or, with `encode`, the
        [6, M] moments stream decoded in-VMEM), per-ray view features
        (the kernel broadcasts them), one packed output, parameter
        gradients only.  Parameter tree identical to every other
        backend."""
        from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean

        # Raises (not asserts): these preconditions must survive `python -O`
        # or the kernels silently compute garbage.
        if self.net_activation != 'relu':
            raise ValueError('pallas backends are ReLU-only, got '
                             f'{self.net_activation!r}')
        if self.num_rgb_channels != 3:
            raise ValueError('lean mode packs rgb as 3 channels, got '
                             f'{self.num_rgb_channels}')
        num_samples, xyz_dim, lead, x2 = self._lean_x_layout(x, encode)
        flat = self._declare_flat_params(xyz_dim, view_direction.shape[-1])

        # The encode output enters the kernel in ITS OWN dtype (f32): the
        # kernel casts each tile to the compute dtype on VMEM load, where
        # the VPU convert is fully overlapped.  Casting here instead makes
        # XLA materialize a bf16 copy of the [M, F] encode in HBM — the
        # cast does NOT fuse into the encode epilogue because the Mosaic
        # operand's packed (2,1) tiling forces a standalone convert+repack
        # fusion (profiled at 3.3 ms/step for two levels at the lego
        # shape, tools/xplane_summary.py on a --profile trace).
        if self.input_cast and encode is None:   # compatibility fallback
            x2 = x2.astype(self.compute_dtype)
        view2 = view_direction.reshape(-1, view_direction.shape[-1])
        mode = {'pallas_lean_save': 'save',
                'pallas_hybrid': 'hybrid'}.get(self.backend, 'recompute')
        if self.channel_major:
            if mode == 'hybrid':
                raise ValueError('channel_major requires a pallas lean '
                                 'backend (hybrid forward runs in XLA)')
            rgb_t, dens_t = fused_mlp_lean(
                x2, view2, tuple(flat), num_samples, self.net_depth,
                self.net_depth_condition, self.skip_index,
                self.compute_dtype, None, mode, self.fused_activation, True,
                encode)
            return (rgb_t.reshape(self.num_rgb_channels, *lead),
                    dens_t.reshape(self.num_density_channels, *lead))
        rgb, dens = fused_mlp_lean(x2, view2, tuple(flat), num_samples,
                                   self.net_depth, self.net_depth_condition,
                                   self.skip_index, self.compute_dtype,
                                   None, mode, self.fused_activation, False,
                                   encode)
        return (rgb.reshape(*lead, self.num_rgb_channels),
                dens.reshape(*lead, self.num_density_channels))

    def _call_pallas_lean_render(self, x, view_direction, delta, mids,
                                 white_bkgd, encode=None):
        """Level megakernel (kernels/mlp.py:fused_mlp_lean_render): MLP +
        head activations + volumetric compositing in one pallas_call,
        returning per-ray (comp_rgb, dist_raw [unclamped], acc, weights)."""
        from mipnerf_pl_tpu.kernels.mlp import fused_mlp_lean_render

        if self.backend not in ('pallas_lean', 'pallas_lean_save'):
            raise ValueError('render fusion requires a lean pallas backend, '
                             f'got {self.backend!r}')
        if self.net_activation != 'relu':
            raise ValueError('pallas backends are ReLU-only, got '
                             f'{self.net_activation!r}')
        if self.num_rgb_channels != 3 or self.num_density_channels != 1:
            raise ValueError('render fusion requires 3 rgb channels and 1 '
                             'density channel')
        if self.fused_activation is None:
            raise ValueError('render fusion requires fused_activation')
        if view_direction is None:
            raise ValueError('render fusion requires view directions')
        num_samples, xyz_dim, lead_x, x2 = self._lean_x_layout(x, encode)
        flat = self._declare_flat_params(xyz_dim, view_direction.shape[-1])
        lead = lead_x[:-1]
        # f32 in; the kernel casts per tile in VMEM (see _call_pallas_lean).
        view2 = view_direction.reshape(-1, view_direction.shape[-1])
        # delta / mids stay in their producer layout: full-lane [R, N]
        # per-ray planes (a [M, 1] column stream would lane-pad 1 -> 128).
        d2 = delta.reshape(-1, num_samples)
        m2 = mids.reshape(-1, num_samples)
        mode = 'save' if self.backend == 'pallas_lean_save' else 'recompute'
        comp, dist, acc, w = fused_mlp_lean_render(
            x2, view2, d2, m2, tuple(flat), num_samples, self.net_depth,
            self.net_depth_condition, self.skip_index, self.compute_dtype,
            None, mode, self.fused_activation, bool(white_bkgd), encode)
        return (comp.reshape(*lead, 3), dist.reshape(*lead),
                acc.reshape(*lead), w.reshape(*lead, num_samples))

    def _call_pallas(self, x, view_direction):
        """Fused-megakernel evaluation (kernels/mlp.py)."""
        from mipnerf_pl_tpu.kernels.mlp import fused_mlp

        if self.net_activation != 'relu':
            raise ValueError('pallas backends are ReLU-only, got '
                             f'{self.net_activation!r}')
        num_samples = x.shape[-2]
        xyz_dim = x.shape[-1]
        flat = self._declare_flat_params(xyz_dim, view_direction.shape[-1])

        x2 = x.reshape(-1, xyz_dim)
        view2 = jnp.repeat(view_direction, num_samples, axis=0)
        mode = 'save' if self.backend == 'pallas_save' else 'recompute'
        rgb, dens = fused_mlp(x2, view2, tuple(flat), self.net_depth,
                              self.net_depth_condition, self.skip_index,
                              self.compute_dtype, None, mode)
        lead = x.shape[:-1]
        return (rgb.reshape(*lead, self.num_rgb_channels),
                dens.reshape(*lead, self.num_density_channels))
