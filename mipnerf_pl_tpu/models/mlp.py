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


class MLP(nn.Module):
    """Coordinate MLP mapping encoded cone-Gaussians to (raw_rgb, raw_density)."""

    net_depth: int = 8
    net_width: int = 256
    net_depth_condition: int = 1
    net_width_condition: int = 128
    skip_index: int = 4
    num_rgb_channels: int = 3
    num_density_channels: int = 1
    net_activation: str = 'relu'
    compute_dtype: Any = jnp.float32

    def _act(self, x):
        if self.net_activation == 'relu':
            return nn.relu(x)
        raise NotImplementedError(self.net_activation)

    def _dense(self, features: int, name: str):
        return nn.Dense(
            features,
            name=name,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
        )

    @nn.compact
    def __call__(self, x, view_direction: Optional[jnp.ndarray] = None):
        """Evaluate the MLP.

        Args:
          x: [batch, num_samples, feature] encoded sample positions (IPE).
          view_direction: optional [batch, feature] encoded view directions,
            shared by all samples of a ray.

        Returns:
          raw_rgb: [batch, num_samples, num_rgb_channels] (float32)
          raw_density: [batch, num_samples, num_density_channels] (float32)
        """
        num_samples = x.shape[-2]
        x = x.astype(self.compute_dtype)
        inputs = x
        for i in range(self.net_depth):
            x = self._act(self._dense(self.net_width, f'trunk_{i}')(x))
            if i % self.skip_index == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        raw_density = self._dense(self.num_density_channels, 'density')(x)

        if view_direction is not None:
            bottleneck = self._dense(self.net_width, 'bottleneck')(x)
            view = jnp.broadcast_to(
                view_direction[..., None, :].astype(self.compute_dtype),
                (*bottleneck.shape[:-2], num_samples, view_direction.shape[-1]))
            x = jnp.concatenate([bottleneck, view], axis=-1)
            for i in range(self.net_depth_condition):
                x = self._act(self._dense(self.net_width_condition, f'view_{i}')(x))
        raw_rgb = self._dense(self.num_rgb_channels, 'rgb')(x)
        # Heads return float32 regardless of compute dtype: the activations /
        # compositing downstream are precision-critical.
        return raw_rgb.astype(jnp.float32), raw_density.astype(jnp.float32)
