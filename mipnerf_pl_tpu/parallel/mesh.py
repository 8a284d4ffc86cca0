"""Device mesh and sharding helpers (Lx).

The reference's entire distributed story is PyTorch-Lightning DDP over NCCL
(reference train.py:48-62): data parallelism with gradient all-reduce.  The
TPU-native equivalent is declarative: build a 1-D `jax.sharding.Mesh` over
all chips, shard the ray batch on the `data` axis, keep parameters
replicated, and let XLA SPMD insert the gradient psum over ICI.  No backend
code, no process groups — the collective schedule is compiled.

A second (currently size-1) `model` axis is provisioned so wider MLPs can
shard their weight matrices (tensor parallelism) without re-plumbing; at the
reference's 256-wide trunk TP is counterproductive (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mipnerf_pl_tpu.rays import Rays, namedtuple_map


def create_mesh(num_devices: int = 0, model_axis: int = 1,
                devices=None) -> Mesh:
    """1-D (data) or 2-D (data, model) mesh over the visible chips.

    Args:
      num_devices: how many devices to use; 0 = all visible.
      model_axis: size of the model-parallel axis (1 = pure DP).
      devices: explicit device list (tests pass CPU devices here).
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    mesh_shape = (n // model_axis, model_axis)
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names=('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray-batch) axis across the data axis."""
    return NamedSharding(mesh, P('data'))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """For [K, B, ...] multi-step batch stacks: K replicated (scanned
    on-device), B sharded across the data axis."""
    return NamedSharding(mesh, P(None, 'data'))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(rays: Rays, sharding: NamedSharding) -> Rays:
    return namedtuple_map(lambda x: jax.device_put(x, sharding), rays)


def pad_batch_to_devices(n: int, num_devices: int) -> int:
    """Smallest multiple of num_devices >= n (static-shape friendly)."""
    return ((n + num_devices - 1) // num_devices) * num_devices


def local_mesh_context(mesh: Optional[Mesh]):
    """Context manager entering the mesh (or a no-op when mesh is None)."""
    import contextlib
    return mesh or contextlib.nullcontext()
