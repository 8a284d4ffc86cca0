"""On-device camera-to-rays generation.

Every dataset/render-path ray generator in this framework (and the
reference, datasets/datasets.py:130-263 + render_video.py:19-112) is the
same computation with a different 3x3 intrinsics matrix: a pixel grid is
mapped through `pix2cam` to camera-space directions, rotated by the
camera-to-world matrix, normalized for viewdirs, and differenced for the
cone radii.  The reference materializes the result on the host and ships
~60 bytes/ray to the device for every rendered frame; at 800x800 that is
~38 MB/frame of host->device traffic, which the render-path decomposition
(tools/render_probe.py) measured at ~1.3 s/frame on this link — a third of
the whole render.

This module is the TPU-native replacement: a `Camera` is ~100 BYTES of
pose/intrinsics scalars, and `camera_rays` expands it into the full ray
bundle on device, inside the same jit as the chunked renderer, so pixels
never exist on the host at all.  The expansion is a few separable
multiply-adds per pixel (VPU-trivial, fuses into the first consumer).

Parity: each dataset's `camera(i)` accessor folds its own convention
(pixel-center offsets, y-flip, -z forward, COLMAP K^-1) into `pix2cam`, so
`camera_rays` reproduces the host `_generate_rays` bit-for-bit up to f32
re-association (pinned by tests/test_camera.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np

from mipnerf_pl_tpu.rays import Rays


class Camera(NamedTuple):
    """A single pinhole camera: everything `camera_rays` needs.

    `pix2cam` acts on RAW integer pixel coordinates [x, y, 1] (x = column,
    y = row, from `arange` with no center offset) — dataset conventions
    (the +0.5 pixel center, Blender's -z forward / y flip, COLMAP's K^-1)
    are folded into the matrix by the constructors below.
    """

    c2w: Any          # [3, 4] camera-to-world (rotation | translation)
    pix2cam: Any      # [3, 3] raw-pixel -> camera-space direction
    near: Any         # scalar
    far: Any          # scalar
    lossmult: Any     # scalar (multi-scale weighting; 1.0 otherwise)


def fold_pixel_center(pix2cam: np.ndarray) -> np.ndarray:
    """Fold the +0.5 pixel-center offset into a pix2cam that expects it.

    P @ [x+.5, y+.5, 1] == P' @ [x, y, 1] with
    P' = [P0, P1, P2 + .5 P0 + .5 P1].
    """
    p = np.asarray(pix2cam, np.float32).copy()
    p[:, 2] = p[:, 2] + 0.5 * p[:, 0] + 0.5 * p[:, 1]
    return p


def pix2cam_from_focal(w: int, h: int, focal: float) -> np.ndarray:
    """Blender/OpenGL convention: -z forward, +y up, pixel centers at +0.5.

    Reproduces datasets.py Blender._generate_rays:
    [(x - w/2 + .5)/f, -(y - h/2 + .5)/f, -1].
    """
    f = float(focal)
    return np.array([
        [1.0 / f, 0.0, (0.5 - 0.5 * w) / f],
        [0.0, -1.0 / f, (0.5 * h - 0.5) / f],
        [0.0, 0.0, -1.0],
    ], dtype=np.float32)


def camera_rays(cam: Camera, h: int, w: int) -> Rays:
    """Expand a Camera into an image-shaped [h, w, ...] ray bundle on device.

    h, w must be static (Python ints) — the result shape depends on them.
    All math is separable multiply-add in f32 (no dot ops), so the result
    matches the host numpy generators up to f32 re-association and XLA fuses
    the whole expansion into its consumer.
    """
    c2w = jnp.asarray(cam.c2w, jnp.float32)
    p = jnp.asarray(cam.pix2cam, jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)

    # d_cam[i, j, :] = P @ [x_j, y_i, 1]
    d_cam = (x[None, :, None] * p[:, 0] + y[:, None, None] * p[:, 1]
             + p[:, 2])                                     # [h, w, 3]
    # d_world = R @ d_cam  (separable against the rotation columns)
    rot = c2w[:3, :3]
    directions = (d_cam[..., 0:1] * rot[:, 0] + d_cam[..., 1:2] * rot[:, 1]
                  + d_cam[..., 2:3] * rot[:, 2])            # [h, w, 3]
    origins = jnp.broadcast_to(c2w[:3, -1], directions.shape)
    viewdirs = directions / jnp.linalg.norm(directions, axis=-1,
                                            keepdims=True)

    # Cone base radii from row-neighbor direction distance (reference
    # datasets/datasets.py:151-158): last row reuses the previous diff.
    dx = jnp.sqrt(jnp.sum((directions[:-1] - directions[1:]) ** 2, -1))
    dx = jnp.concatenate([dx, dx[-2:-1]], 0)
    radii = (dx * 2.0 / np.sqrt(12.0))[..., None]

    ones = jnp.ones_like(origins[..., :1])
    return Rays(
        origins=origins,
        directions=directions,
        viewdirs=viewdirs,
        radii=radii,
        lossmult=ones * jnp.asarray(cam.lossmult, jnp.float32),
        near=ones * jnp.asarray(cam.near, jnp.float32),
        far=ones * jnp.asarray(cam.far, jnp.float32),
    )
