"""Essential / fundamental matrix math, batched.

reference behavior: src/colmap/geometry/essential_matrix.h:53-81. All
functions broadcast over leading batch dimensions; convention is
``x2ᵀ E x1 = 0`` with E built from ``cam2_from_cam1`` as [t]x R.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rotation as rot
from colmap_tpu.geometry.rigid3 import Rigid3


def cross_product_matrix(v):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    z = jnp.zeros_like(v[..., 0])
    m = jnp.stack(
        [z, -v[..., 2], v[..., 1],
         v[..., 2], z, -v[..., 0],
         -v[..., 1], v[..., 0], z],
        axis=-1,
    )
    return m.reshape(v.shape[:-1] + (3, 3))


def essential_from_pose(cam2_from_cam1: Rigid3):
    """E = [t_normalized]x R (essential_matrix.cc EssentialMatrixFromPose)."""
    t = cam2_from_cam1.t
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-30)
    return cross_product_matrix(t) @ cam2_from_cam1.rotmat()


def fundamental_from_essential(K2, E, K1):
    """F = K2⁻ᵀ E K1⁻¹."""
    return (
        jnp.linalg.inv(jnp.swapaxes(K2, -1, -2)) @ E @ jnp.linalg.inv(K1)
    )


def essential_from_fundamental(K2, F, K1):
    return jnp.swapaxes(K2, -1, -2) @ F @ K1


def decompose_essential_matrix(E):
    """E -> (R1, R2, t) candidate decompositions (one batch each).

    reference behavior: DecomposeEssentialMatrix (essential_matrix.cc):
    SVD with det-positive corrections; t is the last left singular vector.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce rotations.
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, 1, 0], [-1, 0, 0], [0, 0, 1]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-30)
    return R1, R2, t


def triangulate_point_dlt(proj1, proj2, x1, x2):
    """Two-view DLT triangulation.

    proj1/proj2: (..., 3, 4) projection matrices [R|t];
    x1/x2: (..., 2) normalized image points. Returns (..., 3) world points.
    reference behavior: TriangulatePoint (geometry/triangulation.cc).
    """
    rows = [
        x1[..., 0, None] * proj1[..., 2, :] - proj1[..., 0, :],
        x1[..., 1, None] * proj1[..., 2, :] - proj1[..., 1, :],
        x2[..., 0, None] * proj2[..., 2, :] - proj2[..., 0, :],
        x2[..., 1, None] * proj2[..., 2, :] - proj2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    # Solution = right singular vector of smallest singular value.
    _, _, Vt = jnp.linalg.svd(A)
    Xh = Vt[..., 3, :]
    w = Xh[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-30, 1.0, w)
    return Xh[..., :3] / safe_w[..., None]


def calc_depth(proj, X):
    """Depth of world point X under projection matrix proj (..., 3, 4)."""
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    z = jnp.einsum("...j,...j->...", proj[..., 2, :], Xh)
    return z * jnp.linalg.norm(proj[..., 2, :3], axis=-1)


def pose_from_essential_matrix(E, x1, x2, mask=None):
    """Recover cam2_from_cam1 from E + matched normalized points.

    Tests the four (R, t) candidates and picks the one with the most points
    passing cheirality in both views (reference: PoseFromEssentialMatrix).

    Args:
        E: (3, 3); x1, x2: (N, 2) normalized points (inliers).
        mask: optional (N,) validity — padded rows MUST be excluded from the
            cheirality vote or they can swing the candidate selection.
    Returns:
        (R (3,3), t (3,), points3D (N, 3), num_valid (int array), valid_mask)
    """
    if mask is None:
        mask = jnp.ones(x1.shape[:-1], dtype=bool)
    R1, R2, t = decompose_essential_matrix(E)
    eye34 = jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), E.dtype)], axis=1)

    def score(R, tt):
        proj2 = jnp.concatenate([R, tt[:, None]], axis=1)
        X = triangulate_point_dlt(eye34, proj2, x1, x2)
        d1 = calc_depth(eye34, X)
        d2 = calc_depth(proj2, X)
        # max depth filter like the reference (kMinDepth..max_depth).
        baseline = jnp.linalg.norm(tt)
        max_depth = 1000.0 * baseline
        ok = (d1 > 1e-12) & (d1 < max_depth) & (d2 > 1e-12) & (d2 < max_depth) & mask
        return jnp.sum(ok), X, ok

    cands = [(R1, t), (R2, t), (R1, -t), (R2, -t)]
    counts = []
    Xs = []
    oks = []
    for R, tt in cands:
        c, X, ok = score(R, tt)
        counts.append(c)
        Xs.append(X)
        oks.append(ok)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    Rb = jnp.stack([c[0] for c in cands])[best]
    tb = jnp.stack([c[1] for c in cands])[best]
    Xb = jnp.stack(Xs)[best]
    okb = jnp.stack(oks)[best]
    return Rb, tb, Xb, counts[best], okb


def sampson_error(E, x1, x2):
    """First-order geometric error of the epipolar constraint.

    x1, x2: (..., 2) normalized points; E: (..., 3, 3).
    reference behavior: estimators/cost_functions/sampson_error.h.

    Written in scalar-component broadcast form: the einsum formulation
    materializes a (models, points, 3, 3) broadcast and lowers to tiny
    batched matvecs — the dominant cost of every RANSAC scoring pass on
    TPU. Component form is 9 broadcast FMAs per line.
    """
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    a = E[..., 0, 0] * u1 + E[..., 0, 1] * v1 + E[..., 0, 2]
    b = E[..., 1, 0] * u1 + E[..., 1, 1] * v1 + E[..., 1, 2]
    c = E[..., 2, 0] * u1 + E[..., 2, 1] * v1 + E[..., 2, 2]
    at = E[..., 0, 0] * u2 + E[..., 1, 0] * v2 + E[..., 2, 0]
    bt = E[..., 0, 1] * u2 + E[..., 1, 1] * v2 + E[..., 2, 1]
    x2tEx1 = u2 * a + v2 * b + c
    denom = a * a + b * b + at * at + bt * bt
    return x2tEx1**2 / jnp.maximum(denom, 1e-30)


def squared_epipolar_line_distance(F, x1, x2):
    """Squared point-to-epipolar-line distance of x2 to F x1.
    (Component broadcast form — see sampson_error.)"""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    a = F[..., 0, 0] * u1 + F[..., 0, 1] * v1 + F[..., 0, 2]
    b = F[..., 1, 0] * u1 + F[..., 1, 1] * v1 + F[..., 1, 2]
    c = F[..., 2, 0] * u1 + F[..., 2, 1] * v1 + F[..., 2, 2]
    x2tFx1 = u2 * a + v2 * b + c
    return x2tFx1**2 / jnp.maximum(a * a + b * b, 1e-30)
