"""Batched, jittable geometry: quaternions, SE(3) poses and pinhole projection.

This is the TPU-native replacement for the reference's mixed NumPy/torch
geometry stack (hive/geometric.py:34-207 pose/projection helpers and the torch
``Quaternion`` at hive/geometric.py:209-299). Everything here:

* operates on batches (leading axis N) — per-frame Python loops in the
  reference become a single vectorised call;
* is pure and differentiable, so the pose optimiser can take gradients
  straight through it;
* uses only static shapes and is safe under ``jax.jit``/``vmap``/``shard_map``.

Conventions (identical to the reference):
* quaternions are scalar-last ``[x, y, z, w]``;
* a pose 7-vector is ``[qx, qy, qz, qw, tx, ty, tz]``;
* poses are world-to-camera: ``p_cam = R @ p_world + t``;
* projection: ``uvw = K @ (R @ p + t)``; unprojection: ``p = R^T (d K^{-1} u - t)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Camera geometry needs true fp32 matmuls: the MXU's default bf16 passes lose
# ~0.7px at VGA focal lengths. These matmuls are tiny (Nx3 @ 3x3), so running
# them at HIGHEST precision costs nothing.
_HIGHEST = jax.lax.Precision.HIGHEST


def _matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HIGHEST)


# ---------------------------------------------------------------------------
# Quaternions — shape (..., 4), scalar last.
# ---------------------------------------------------------------------------

def quat_identity() -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0])


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalise to a unit quaternion along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """(-x, -y, -z, w): the inverse rotation for unit quaternions."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 (composition: rotate by q2 then q1)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)

    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
        w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``v`` (..., 3) by unit quaternions ``q`` (..., 4).

    Uses the expanded form ``v + 2 w (u × v) + 2 u × (u × v)`` which is cheaper
    than two Hamilton products and maps to pure VPU work on TPU.
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) → rotation matrix (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)

    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z

    m = jnp.stack([
        1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
        2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
        2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
    ], axis=-1)

    return m.reshape(*q.shape[:-1], 3, 3)


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) → unit quaternion (..., 4), scalar last.

    Branchless variant of Shepperd's method: compute the four candidate
    quaternions (one per largest diagonal combination) and select the
    numerically stable one with a gather — no data-dependent control flow, so
    it vectorises and jits cleanly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four times the squared components (may be negative under roundoff; the
    # selected branch is always positive).
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # Candidate quaternions, each scaled by 4*component — normalised at the end.
    cand_w = jnp.stack([m21 - m12, m02 - m20, m10 - m01, qw2], axis=-1)
    cand_x = jnp.stack([qx2, m10 + m01, m02 + m20, m21 - m12], axis=-1)
    cand_y = jnp.stack([m10 + m01, qy2, m21 + m12, m02 - m20], axis=-1)
    cand_z = jnp.stack([m02 + m20, m21 + m12, qz2, m10 - m01], axis=-1)

    four_sq = jnp.stack([qx2, qy2, qz2, qw2], axis=-1)
    best = jnp.argmax(four_sq, axis=-1)

    cands = jnp.stack([cand_x, cand_y, cand_z, cand_w], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]

    q = quat_normalize(q)
    # Canonicalise sign (w >= 0) so round-trips are deterministic.
    return q * jnp.where(q[..., 3:4] < 0.0, -1.0, 1.0)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions, batched over ``t``.

    Falls back to lerp when the quaternions are nearly parallel.
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)  # take the short arc
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)

    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)

    near = sin_theta < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))

    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# SE(3) poses — 7-vectors (..., 7) or homogeneous matrices (..., 4, 4).
# ---------------------------------------------------------------------------

def pose_to_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """Pose 7-vector (..., 7) → homogeneous matrix (..., 4, 4)."""
    R = quat_to_matrix(quat_normalize(pose[..., :4]))
    t = pose[..., 4:]

    top = jnp.concatenate([R, t[..., :, None]], axis=-1)           # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), (*pose.shape[:-1], 1, 4))

    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(m: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous matrix (..., 4, 4) → pose 7-vector (..., 7)."""
    q = matrix_to_quat(m[..., :3, :3])
    t = m[..., :3, 3]
    return jnp.concatenate([q, t], axis=-1)


def pose_inverse(pose: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid pose: (q, t) → (q*, -q* t)."""
    q_inv = quat_conjugate(quat_normalize(pose[..., :4]))
    t_inv = -quat_rotate(q_inv, pose[..., 4:])
    return jnp.concatenate([q_inv, t_inv], axis=-1)


def pose_compose(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """Compose rigid poses: result applies ``b`` first, then ``a``
    (matrix form ``A @ B``)."""
    qa, ta = quat_normalize(pose_a[..., :4]), pose_a[..., 4:]
    qb, tb = quat_normalize(pose_b[..., :4]), pose_b[..., 4:]

    q = quat_multiply(qa, qb)
    t = quat_rotate(qa, tb) + ta
    return jnp.concatenate([q, t], axis=-1)


def pose_relative(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """Relative pose ``b^{-1} @ a`` (i.e. "a minus b", ref hive/geometric.py:91-99)."""
    return pose_compose(pose_inverse(pose_b), pose_a)


# ---------------------------------------------------------------------------
# Pinhole camera projection.
# ---------------------------------------------------------------------------

def project_points(points: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray,
                   t: jnp.ndarray, scale_factor: float = 1.0):
    """World points (..., 3) → pixel coordinates (..., 2) and depths (...,).

    Matches the reference ``world2image`` (hive/geometric.py:155-180) but is
    batched and differentiable; callers round/cast on the host if they need
    integer pixels.
    """
    cam = _matmul(points, R.T) + t.reshape(3)
    uvw = _matmul(cam, K.T)
    depth = uvw[..., 2]
    uv = uvw[..., :2] / (depth[..., None] * scale_factor)
    return uv, depth


def unproject_pixels(points2d: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray,
                     R: jnp.ndarray, t: jnp.ndarray, scale_factor: float = 1.0) -> jnp.ndarray:
    """Pixel coordinates (..., 2) + depths (...,) → world points (..., 3).

    Matches the reference ``image2world`` (hive/geometric.py:183-206).
    """
    ones = jnp.ones_like(depth)
    uv1 = jnp.stack([points2d[..., 0] * scale_factor,
                     points2d[..., 1] * scale_factor, ones], axis=-1)
    K_inv = jnp.linalg.inv(K)
    cam = depth[..., None] * _matmul(uv1, K_inv.T)
    world = _matmul(cam - t.reshape(3), R)  # (R^T)^T = R on the right
    return world


@partial(jax.jit, static_argnames=("height", "width"))
def unproject_depth_map(depth: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray,
                        t: jnp.ndarray, *, height: int, width: int) -> jnp.ndarray:
    """Dense unprojection of an (H, W) depth map → (H, W, 3) world points.

    The whole-frame analogue of ``point_cloud_from_depth``
    (hive/geometric.py:107-126); masking/compaction happens on the host where
    dynamic shapes are cheap, while this dense part runs on TPU.
    """
    vs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    us = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    uv = jnp.stack([us, vs], axis=-1)
    return unproject_pixels(uv, depth, K, R, t)


def view_frustum_points(depth: jnp.ndarray, K: jnp.ndarray,
                        cam_to_world: jnp.ndarray) -> jnp.ndarray:
    """The 5 world-space corner points of a camera's view frustum.

    Used for scene-bound estimation before TSDF fusion (the tpu-native
    equivalent of the reference's ``fusion.get_view_frustum`` call in
    hive/fusion.py:59).

    :param depth: (H, W) depth map (meters); the max depth sets the far plane.
    :param K: (3, 3) intrinsics.
    :param cam_to_world: (4, 4) camera-to-world transform.
    :return: (5, 3) world-space points (camera origin + 4 far-plane corners).
    """
    h, w = depth.shape
    max_depth = jnp.max(depth)

    corners = jnp.array([[0.0, 0.0], [w, 0.0], [w, h], [0.0, h]])
    ones = jnp.ones((4, 1))
    uv1 = jnp.concatenate([corners, ones], axis=-1)
    rays = _matmul(uv1, jnp.linalg.inv(K).T)  # camera-space rays at depth 1
    far = rays * max_depth

    pts_cam = jnp.concatenate([jnp.zeros((1, 3)), far], axis=0)
    pts_world = _matmul(pts_cam, cam_to_world[:3, :3].T) + cam_to_world[:3, 3]
    return pts_world
