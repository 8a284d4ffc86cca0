"""Camera-pose utilities for real (LLFF-style) captures.

Convention notes: these implement the standard LLFF/NeRF pose
normalizations (behavioral contracts — the conventions decide world
orientation, so outputs must match the ecosystem's):

  * camera-to-world matrices are [3, 4] (or [3, 5] with an hwf column),
    camera axes as columns [right, up, forward];
  * `recenter_poses` re-expresses all poses in the "average camera" frame
    (reference datasets/datasets.py:384-443);
  * `spherify_poses` centers the world on the point closest to all camera
    optical axes and aligns +z with the average up direction (reference
    datasets/datasets.py:445-474).

Implementations are vectorized over the pose stack; rigid transforms are
inverted analytically (R^T, -R^T t) instead of via homogeneous-matrix
inverses.
"""

from __future__ import annotations

import numpy as np


def _unit(x, axis=-1):
    return x / np.linalg.norm(x, axis=axis, keepdims=True)


def camera_basis(forward, up, position) -> np.ndarray:
    """[3, 4] camera-to-world from a forward direction and an up hint.

    Gram-Schmidt: right = up x forward, true-up = forward x right; columns
    are [right, up, forward, position].
    """
    fwd = _unit(forward)
    right = _unit(np.cross(up, fwd))
    true_up = _unit(np.cross(fwd, right))
    return np.stack([right, true_up, fwd, position], axis=-1)


def average_pose(poses: np.ndarray) -> np.ndarray:
    """The "central" camera of a stack: mean position, mean viewing
    direction, mean up.  poses: [N, 3, 4+]; returns [3, 4]."""
    return camera_basis(forward=poses[:, :3, 2].sum(0),
                        up=poses[:, :3, 1].sum(0),
                        position=poses[:, :3, 3].mean(0))


def _apply_world_transform(poses: np.ndarray, frame: np.ndarray):
    """Re-express camera-to-world poses in the coordinate frame given by
    the [3, 4] camera-to-world matrix `frame` (rigid inverse, vectorized)."""
    rot_inv = frame[:3, :3].T
    t_inv = -rot_inv @ frame[:3, 3]
    new_rot = np.einsum('ij,njk->nik', rot_inv, poses[:, :3, :3])
    new_t = poses[:, :3, 3] @ rot_inv.T + t_inv
    return new_rot, new_t


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Center the pose cloud on its average camera.  poses: [N, 3, 5]
    (pose + hwf column); the hwf column is passed through."""
    new_rot, new_t = _apply_world_transform(poses, average_pose(poses))
    out = poses.copy()
    out[:, :3, :3] = new_rot
    out[:, :3, 3] = new_t
    return out


def focus_point(poses: np.ndarray) -> np.ndarray:
    """Least-squares point closest to every camera's optical axis.

    Each camera views along o_i + s * d_i (d = z column).  Minimizing the
    summed squared point-line distances gives the normal equations
    (sum_i P_i^T P_i) p = sum_i P_i^T P_i o_i with P_i = I - d_i d_i^T.
    """
    d = poses[:, :3, 2]
    o = poses[:, :3, 3]
    proj = np.eye(3) - d[:, :, None] * d[:, None, :]            # [N, 3, 3]
    lhs = np.einsum('nij,njk->ik', proj.transpose(0, 2, 1), proj)
    rhs = np.einsum('nij,njk,nk->i', proj.transpose(0, 2, 1), proj, o)
    return np.linalg.solve(lhs, rhs)


def spherify_poses(poses: np.ndarray) -> np.ndarray:
    """Re-center on the cameras' mutual focus point with +z pointing along
    the average up — the normalization for inward-facing 360 captures.

    poses: [N, 3, 5]; returns [N, 3, 5] with the first pose's hwf column
    broadcast to all (as the LLFF convention does).
    """
    center = focus_point(poses)
    up = _unit((poses[:, :3, 3] - center).mean(0))
    # Arbitrary non-collinear seed for the horizontal basis — the exact
    # LLFF constant, kept so spherified worlds match the ecosystem's.
    right = _unit(np.cross([0.1, 0.2, 0.3], up))
    fwd = _unit(np.cross(up, right))
    frame = np.stack([right, fwd, up, center], axis=-1)          # [3, 4]

    new_rot, new_t = _apply_world_transform(poses, frame)
    hwf = np.broadcast_to(poses[0, :3, -1:], (len(poses), 3, 1))
    return np.concatenate(
        [new_rot, new_t[:, :, None], hwf], axis=-1)
