"""Host -> device input pipeline: sharded, double-buffered ray batches.

Replaces the reference's torch DataLoader worker pool
(models/nerf_system.py:78-93) with a TPU-idiomatic pipeline: a background
thread gathers numpy ray batches and pushes them to device HBM with the
target NamedSharding while the previous step computes — the standard JAX
double-buffering recipe, keeping the TPU from ever waiting on input.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Iterator, Optional

import jax
import numpy as np

from mipnerf_pl_tpu.rays import Rays


class TrainBatcher:
    """Infinite iterator of device-resident (Rays, pixels) batches.

    Args:
      dataset: a train-split dataset exposing `sample_batch(rng, batch_size)`.
      batch_size: global batch size (divided across the mesh's data axis by
        the sharding).
      seed: numpy seed for the host-side ray sampler.
      sharding: optional `jax.sharding.NamedSharding` for the batch arrays;
        None keeps batches on the default device.
      prefetch: number of batches to keep in flight (>=1 enables the
        background thread; 0 is fully synchronous, used by tests).
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 sharding=None, prefetch: int = 2, steps_per_call: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.steps_per_call = steps_per_call
        self.rng = np.random.default_rng(seed)
        self.sharding = sharding
        self.prefetch = prefetch
        self._queue: Optional[queue.Queue] = None
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        if prefetch > 0:
            self._queue = queue.Queue(maxsize=prefetch)
            self._thread = threading.Thread(target=self._producer, daemon=True)
            self._thread.start()

    def _make_batch(self):
        k = self.steps_per_call
        rays, pixels = self.dataset.sample_batch(self.rng,
                                                 k * self.batch_size)
        if k > 1:
            # [K*B, C] -> [K, B, C] stacks for the scanned multi-step trainer.
            reshape = lambda x: x.reshape(k, self.batch_size, x.shape[-1])
            rays = Rays(*[reshape(f) for f in rays])
            pixels = pixels.reshape(k, self.batch_size, pixels.shape[-1])
        return self._put_on_device(rays, pixels)

    def _put_on_device(self, rays: Rays, pixels: np.ndarray):
        if self.sharding is not None:
            # put_global: plain device_put on one host, per-process shard
            # assembly on pods (parallel/mesh.py put_global).
            from mipnerf_pl_tpu.parallel.mesh import put_global
            dev = lambda x: put_global(x, self.sharding)
        else:
            dev = jax.device_put
        return Rays(*[dev(np.ascontiguousarray(f)) for f in rays]), dev(
            np.ascontiguousarray(pixels))

    def _producer(self):
        try:
            while not self._stop.is_set():
                batch = self._make_batch()
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface producer failures to the consumer
            self._error = e
            self._stop.set()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        if self._queue is not None:
            while True:
                if self._error is not None:
                    raise RuntimeError(
                        'TrainBatcher producer thread failed') from self._error
                try:
                    return self._queue.get(timeout=5.0)
                except queue.Empty:
                    if self._error is None and not self._stop.is_set():
                        continue
                    if self._error is not None:
                        raise RuntimeError(
                            'TrainBatcher producer thread failed'
                        ) from self._error
                    raise RuntimeError('TrainBatcher closed')
        return self._make_batch()

    def close(self):
        self._stop.set()
        if self._queue is not None:
            def drain():
                try:
                    while True:
                        self._queue.get_nowait()
                except queue.Empty:
                    pass
            # Drain until the producer has observed the stop flag and
            # exited, then drain ONCE MORE: the producer's final put can
            # land between a drain pass and the liveness check, which would
            # otherwise leave one batch pinned on device.  The deadline
            # bounds the wait so a producer wedged inside device_put cannot
            # hang close() forever (it is a daemon thread; process exit
            # still reclaims it).
            deadline = time.monotonic() + 10.0
            while True:
                drain()
                if (self._thread is None or not self._thread.is_alive()
                        or time.monotonic() > deadline):
                    break
                self._thread.join(timeout=0.1)
            drain()
        elif self._thread is not None:
            self._thread.join(timeout=5.0)
