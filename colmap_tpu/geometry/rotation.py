"""Batched quaternion / rotation utilities.

Quaternions are stored as ``(..., 4)`` arrays in Hamilton convention with
scalar-first layout ``(w, x, y, z)`` — the same convention as the reference
(doc/format.rst: "The quaternion is defined using the Hamilton convention").
All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap friendly (reference behavior: src/colmap/geometry/pose.h,
src/colmap/geometry/rigid3.h — re-designed as array programs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_identity(batch_shape=(), dtype=jnp.float32):
    q = jnp.zeros(batch_shape + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_normalize(q):
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, jnp.finfo(q.dtype).tiny)


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(q1, q2):
    """Hamilton product q1 ⊗ q2 (composition: rotate by q2 then q1)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


@jax.jit
def quat_rotate(q, v):
    """Rotate vectors ``v`` (..., 3) by unit quaternions ``q`` (..., 4)."""
    w = q[..., :1]
    u = q[..., 1:]
    # v' = v + 2 w (u × v) + 2 u × (u × v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


@jax.jit
def quat_to_rotmat(q):
    """Unit quaternion → rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


@jax.jit
def rotmat_to_quat(m):
    """Rotation matrix (..., 3, 3) → unit quaternion, branch-free.

    Uses the four-candidate construction (one per largest diagonal
    combination) and selects the best-conditioned one with ``where`` so the
    function stays vmap/jit friendly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Candidate squared magnitudes (≥0 up to numerical noise).
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # Build each candidate quaternion (unnormalized).
    sw = jnp.sqrt(qw2 + jnp.finfo(m.dtype).tiny)
    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    sx = jnp.sqrt(qx2 + jnp.finfo(m.dtype).tiny)
    cand_x = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    sy = jnp.sqrt(qy2 + jnp.finfo(m.dtype).tiny)
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    sz = jnp.sqrt(qz2 + jnp.finfo(m.dtype).tiny)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)

    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_from_axis_angle(axis, angle):
    """axis (..., 3) need not be normalized; angle (...,) in radians."""
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), jnp.finfo(jnp.asarray(axis).dtype).tiny
    )
    half = 0.5 * jnp.asarray(angle)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


@jax.jit
def quat_angle(q1, q2=None):
    """Rotation angle (radians) of q1, or of relative rotation q1⁻¹ q2."""
    if q2 is not None:
        q = quat_multiply(quat_conjugate(q1), q2)
    else:
        q = q1
    q = quat_normalize(q)
    w = jnp.clip(jnp.abs(q[..., 0]), 0.0, 1.0)
    return 2.0 * jnp.arccos(w)


def quat_slerp(q1, q2, t):
    """Spherical linear interpolation between unit quaternions."""
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(dot < 0, -q2, q2)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    # Fall back to lerp for nearly parallel quaternions.
    small = sin_theta < 1e-6
    w1 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w2 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w1 * q1 + w2 * q2)


def average_quaternions(quats, weights=None):
    """Weighted chordal-L2 quaternion mean via the largest eigenvector of
    the weighted outer-product accumulator (Markley's method).

    reference behavior: src/colmap/geometry/pose.h:69-78 (AverageQuaternions).
    """
    quats = quat_normalize(quats)
    if weights is None:
        weights = jnp.ones(quats.shape[:-1], dtype=quats.dtype)
    a = jnp.einsum("...i,...j,...->ij", quats, quats, weights)
    _, vecs = jnp.linalg.eigh(a)
    q = vecs[..., -1]
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def rotation_between_vectors(a, b):
    """Smallest rotation quaternion taking direction a to direction b."""
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-30)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-30)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    w = 1.0 + d
    # Degenerate antiparallel case: rotate pi about any orthogonal axis.
    ortho = jnp.stack(
        [-a[..., 1] - a[..., 2], a[..., 0], a[..., 0]], axis=-1
    )
    q = jnp.concatenate([w, c], axis=-1)
    q_anti = jnp.concatenate([jnp.zeros_like(w), ortho], axis=-1)
    q = jnp.where(w < 1e-6, q_anti, q)
    return quat_normalize(q)
