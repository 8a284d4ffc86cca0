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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mipnerf_pl_tpu.rays import Rays, namedtuple_map


def maybe_initialize_distributed(hparams) -> bool:
    """Multi-host (pod) plumbing: `jax.distributed.initialize()` gated on
    `parallel.multi_host`.

    On a TPU pod slice each host runs this same program; after
    initialization `jax.devices()` returns the GLOBAL device list, so
    `create_mesh` spans the pod and the pjit-sharded train step's psum
    rides ICI/DCN (SURVEY.md §2.3) with no further code changes.  The
    coordinator address / process count / process id are auto-detected on
    TPU pods; explicit values (for GPU/CPU clusters) come from the
    parallel.* keys.

    The reference is single-host-only (its DDP plumbing assumes one
    machine, reference train.py:48-62); this is beyond-parity and inert by
    default.  Returns True iff initialize() was called.
    """
    def _get(key):
        v = hparams.get(key)
        return None if v is None or str(v) == 'None' else v

    if not _get('parallel.multi_host'):
        return False
    kwargs = {}
    if _get('parallel.coordinator_address') is not None:
        kwargs['coordinator_address'] = str(_get('parallel.coordinator_address'))
    if _get('parallel.num_processes') is not None:
        kwargs['num_processes'] = int(_get('parallel.num_processes'))
    if _get('parallel.process_id') is not None:
        kwargs['process_id'] = int(_get('parallel.process_id'))
    jax.distributed.initialize(**kwargs)
    return True


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


def process_count() -> int:
    """jax.process_count(), routed through this module so multi-host tests
    can monkeypatch it on a single-process virtual mesh."""
    return jax.process_count()


def put_global(x, sharding: NamedSharding):
    """`device_put` that also works on MULTI-PROCESS meshes.

    Single-process: plain `jax.device_put` (the fast path — one transfer,
    no per-shard callbacks).

    Multi-process (TPU pod slices): `device_put` onto a NamedSharding that
    spans non-addressable devices raises, so the global array is assembled
    with `jax.make_array_from_callback` — each host materializes ONLY the
    shards its addressable devices own, sliced out of its host-local copy
    of the (host-global) numpy data.

    Design choice (vs each host sampling only its ray shard): every host
    holds the full host-global batch/image and ships 1/num_processes of
    it.  The host-side cost is a few MB of redundant numpy sampling per
    dispatch; in exchange the GLOBAL batch sequence is bit-identical to
    the single-host run (same rng, same rows), so pod runs reproduce
    single-chip runs exactly and resume across topology changes.  The
    reference has no multi-host story at all (its DDP assumes one machine,
    reference train.py:48-62).
    """
    if process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def put_global_tree(tree, sharding: NamedSharding):
    """put_global over a pytree (params/state trees on pods)."""
    return jax.tree.map(lambda x: put_global(x, sharding), tree)


def shard_rays(rays: Rays, sharding: NamedSharding) -> Rays:
    return namedtuple_map(lambda x: put_global(x, sharding), rays)


def pad_batch_to_devices(n: int, num_devices: int) -> int:
    """Smallest multiple of num_devices >= n (static-shape friendly)."""
    return ((n + num_devices - 1) // num_devices) * num_devices
