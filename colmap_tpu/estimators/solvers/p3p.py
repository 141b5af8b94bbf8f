"""Batched P3P absolute-pose minimal solver (Grunert's quartic).

reference behavior: src/colmap/estimators/solvers/absolute_pose.* (PoseLib
P3P). Implemented from the classic Grunert 1841 formulation (coefficients as
in Haralick et al. 1994): solve the quartic in the distance ratio v = s3/s1,
recover the three camera-frame distances, then the rigid pose by 3-point
Kabsch alignment. Fully closed-form — vmapped over thousands of samples with
no data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from colmap_tpu.optim.polynomial import solve_quartic


def kabsch(src, dst, weights=None):
    """Rigid alignment: returns (R, t) with dst ≈ R @ src + t.

    src, dst: (..., N, 3).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-30)
    src_c = jnp.sum(src * weights[..., None], axis=-2) / wsum
    dst_c = jnp.sum(dst * weights[..., None], axis=-2) / wsum
    src0 = src - src_c[..., None, :]
    dst0 = dst - dst_c[..., None, :]
    H = jnp.einsum("...ni,...nj,...n->...ij", src0, dst0, weights)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.ones(H.shape[:-2] + (3,), dtype=src.dtype)
    D = D.at[..., 2].set(det)
    R = jnp.einsum("...ji,...j,...jk->...ik", Vt, D, jnp.swapaxes(U, -1, -2))
    # R = Vᵀᵀ D Uᵀ — build explicitly:
    R = jnp.swapaxes(Vt, -1, -2) @ (D[..., None] * jnp.swapaxes(U, -1, -2))
    t = dst_c - jnp.einsum("...ij,...j->...i", R, src_c)
    return R, t


def p3p(points3D, rays):
    """Solve P3P for one sample: 3 world points + 3 unit bearing vectors.

    Args:
        points3D: (3, 3) world points.
        rays: (3, 3) unit bearings in the camera frame.
    Returns:
        R: (4, 3, 3), t: (4, 3) — up to four cam_from_world solutions,
        NaN-padded for invalid roots.
    """
    X1, X2, X3 = points3D[0], points3D[1], points3D[2]
    f1, f2, f3 = rays[0], rays[1], rays[2]

    a2 = jnp.sum((X2 - X3) ** 2)
    b2 = jnp.sum((X1 - X3) ** 2)
    c2 = jnp.sum((X1 - X2) ** 2)
    cos_a = jnp.dot(f2, f3)  # angle opposite side a (between rays 2,3)
    cos_b = jnp.dot(f1, f3)
    cos_g = jnp.dot(f1, f2)

    b2_safe = jnp.maximum(b2, 1e-30)
    ac_b = (a2 - c2) / b2_safe  # (a²-c²)/b²
    apc_b = (a2 + c2) / b2_safe  # (a²+c²)/b²

    A4 = (ac_b - 1.0) ** 2 - 4.0 * (c2 / b2_safe) * cos_a**2
    A3 = 4.0 * (
        ac_b * (1.0 - ac_b) * cos_b
        - (1.0 - apc_b) * cos_a * cos_g
        + 2.0 * (c2 / b2_safe) * cos_a**2 * cos_b
    )
    A2 = 2.0 * (
        ac_b**2
        - 1.0
        + 2.0 * ac_b**2 * cos_b**2
        + 2.0 * ((b2 - c2) / b2_safe) * cos_a**2
        - 4.0 * apc_b * cos_a * cos_b * cos_g
        + 2.0 * ((b2 - a2) / b2_safe) * cos_g**2
    )
    A1 = 4.0 * (
        -ac_b * (1.0 + ac_b) * cos_b
        + 2.0 * (a2 / b2_safe) * cos_g**2 * cos_b
        - (1.0 - apc_b) * cos_a * cos_g
    )
    A0 = (1.0 + ac_b) ** 2 - 4.0 * (a2 / b2_safe) * cos_g**2

    v_roots, v_mask = solve_quartic(A4, A3, A2, A1, A0)  # (4,), (4,)

    def pose_for_root(v, ok):
        denom_u = 2.0 * (cos_g - v * cos_a)
        u = ((-1.0 + ac_b) * v**2 - 2.0 * ac_b * cos_b * v + 1.0 + ac_b) / jnp.where(
            jnp.abs(denom_u) < 1e-12, 1.0, denom_u
        )
        s1_sq_den = 1.0 + v**2 - 2.0 * v * cos_b
        s1 = jnp.sqrt(b2 / jnp.maximum(s1_sq_den, 1e-30))
        s2 = u * s1
        s3 = v * s1
        ok = ok & (v > 0) & (u > 0) & (s1_sq_den > 1e-30) & (jnp.abs(denom_u) >= 1e-12)
        Y = jnp.stack([s1 * f1, s2 * f2, s3 * f3])  # camera-frame points
        R, t = kabsch(points3D, Y)
        nanify = lambda x: jnp.where(ok, x, jnp.nan)
        return nanify(R), nanify(t)

    Rs, ts = [], []
    for i in range(4):
        R, t = pose_for_root(v_roots[i], v_mask[i])
        Rs.append(R)
        ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)
