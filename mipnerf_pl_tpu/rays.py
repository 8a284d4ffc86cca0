"""Ray container pytree.

Parity: reference `datasets/datasets.py:13-21` defines
``Rays = namedtuple('Rays', (origins, directions, viewdirs, radii, lossmult,
near, far))`` and ``namedtuple_map``.  A NamedTuple is already a JAX pytree,
so the same container flows through jit/pjit/shard_map unchanged; fields can
hold numpy arrays (host side) or jax arrays (device side).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Any

import numpy as np


class Rays(NamedTuple):
    """A bundle of rays: every field has leading batch dims and a trailing
    feature dim (3 for geometry, 1 for scalars)."""

    origins: Any      # [..., 3] ray origins (world)
    directions: Any   # [..., 3] un-normalized ray directions (world)
    viewdirs: Any     # [..., 3] unit-norm view directions
    radii: Any        # [..., 1] base radius of the pixel cone at t=1
    lossmult: Any     # [..., 1] per-ray loss weight (multi-scale)
    near: Any         # [..., 1] near plane
    far: Any          # [..., 1] far plane


Rays_keys = Rays._fields


def namedtuple_map(fn: Callable, tup):
    """Apply `fn` to each element of `tup` and cast to `tup`'s namedtuple."""
    return type(tup)(*map(fn, tup))


def rays_flatten(rays: Rays) -> Rays:
    """Flatten leading dims of every field to [N, C]."""
    return namedtuple_map(lambda x: x.reshape(-1, x.shape[-1]), rays)


def rays_num(rays: Rays) -> int:
    return int(np.prod(rays.origins.shape[:-1]))


def rays_index(rays: Rays, idx) -> Rays:
    """Index / slice every field identically."""
    return namedtuple_map(lambda x: x[idx], rays)


def rays_pad_to(rays: Rays, n: int) -> Rays:
    """Edge-pad flattened rays along axis 0 up to length `n`.

    Padding repeats the final ray, keeping every padded entry a valid ray so
    the padded tail renders garbage-free (results are sliced away by the
    caller).  Fixed-size chunks keep the rendering program's shapes static so
    XLA compiles exactly one executable per chunk size — the TPU replacement
    for the reference's variable-length last chunk
    (`models/mip.py:404-421`).
    """

    def _pad(x):
        cur = x.shape[0]
        if cur >= n:
            return x[:n]
        pad_block = np.repeat(np.asarray(x[-1:]), n - cur, axis=0)
        return np.concatenate([np.asarray(x), pad_block], axis=0)

    return namedtuple_map(_pad, rays)


def rays_chunks(rays: Rays, chunk_size: int):
    """Split flattened rays into fixed-shape chunks (last chunk edge-padded).

    Returns (list_of_chunks, n_valid) where each chunk holds exactly
    `chunk_size` rays.  Behavioural parity with the reference's
    `rearrange_render_image` (`models/mip.py:404-421`) with TPU-friendly
    static shapes.
    """
    flat = rays_flatten(rays)
    n = flat.origins.shape[0]
    chunks = []
    for i in range(0, n, chunk_size):
        part = rays_index(flat, slice(i, i + chunk_size))
        if part.origins.shape[0] < chunk_size:
            part = rays_pad_to(part, chunk_size)
        chunks.append(part)
    return chunks, n
