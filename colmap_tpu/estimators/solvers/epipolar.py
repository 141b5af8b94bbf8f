"""Batched epipolar minimal/linear solvers: E (8pt), F (7pt/8pt), H (4pt DLT).

reference behavior: src/colmap/estimators/solvers/{essential,fundamental,
homography}_matrix.* (PoseLib wrappers). Re-designed as fixed-shape vmapped
array programs: every solver maps a (m, 2)+(m, 2) sample (or weighted N-point
set for least-squares refits) to one or more 3x3 models, NaN-padded, so
thousands of hypotheses evaluate as one XLA program.

All solvers use Hartley normalization for conditioning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.optim.polynomial import solve_cubic


def _hartley_normalize(pts, weights=None):
    """Similarity transform T with mean 0 and mean distance sqrt(2).

    Returns (pts_normalized, T (3,3)).
    """
    if weights is None:
        weights = jnp.ones(pts.shape[:-1], dtype=pts.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-30)
    centroid = jnp.sum(pts * weights[..., None], axis=-2) / wsum
    centered = pts - centroid[..., None, :]
    mean_dist = (
        jnp.sum(jnp.linalg.norm(centered, axis=-1) * weights, axis=-1)
        / wsum[..., 0]
    )
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-30)
    T = jnp.zeros(pts.shape[:-2] + (3, 3), dtype=pts.dtype)
    T = T.at[..., 0, 0].set(scale)
    T = T.at[..., 1, 1].set(scale)
    T = T.at[..., 2, 2].set(1.0)
    T = T.at[..., 0, 2].set(-scale * centroid[..., 0])
    T = T.at[..., 1, 2].set(-scale * centroid[..., 1])
    return centered * scale[..., None, None], T


def _epipolar_constraint_matrix(x1, x2):
    """Rows of the 8-point system: x2_i ⊗ x1_i for x2ᵀ F x1 = 0."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )


def _smallest_right_singular(A):
    """Right singular vector of the smallest singular value of A (..., m, n).

    Uses the symmetric eigendecomposition of AᵀA (TPU-friendly; jnp.linalg
    eigh lowers well, and AᵀA is small: 9x9)."""
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]


def fundamental_eight_point(x1, x2, weights=None):
    """8-point (or weighted N-point) fundamental matrix.

    x1, x2: (..., N, 2) pixel or normalized coordinates. Returns (..., 3, 3).
    """
    n1, T1 = _hartley_normalize(x1, weights)
    n2, T2 = _hartley_normalize(x2, weights)
    A = _epipolar_constraint_matrix(n1, n2)
    if weights is not None:
        A = A * weights[..., None]
    f = _smallest_right_singular(A)
    F = f.reshape(f.shape[:-1] + (3, 3))
    # Rank-2 enforcement.
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    F = U @ (S[..., None] * Vt)
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
    return F / jnp.maximum(norm, 1e-30)[..., None, None]


def essential_eight_point(x1, x2, weights=None):
    """8-point essential matrix with (1,1,0) singular value projection.

    x1, x2: (..., N, 2) *normalized* (calibrated) coordinates.
    """
    n1, T1 = _hartley_normalize(x1, weights)
    n2, T2 = _hartley_normalize(x2, weights)
    A = _epipolar_constraint_matrix(n1, n2)
    if weights is not None:
        A = A * weights[..., None]
    f = _smallest_right_singular(A)
    E = f.reshape(f.shape[:-1] + (3, 3))
    E = jnp.swapaxes(T2, -1, -2) @ E @ T1
    U, S, Vt = jnp.linalg.svd(E)
    ones = jnp.ones_like(S[..., :2])
    S_proj = jnp.concatenate([ones, jnp.zeros_like(S[..., :1])], axis=-1)
    E = U @ (S_proj[..., None] * Vt)
    return E


def fundamental_seven_point(x1, x2):
    """7-point fundamental matrix: up to 3 solutions.

    x1, x2: (..., 7, 2). Returns (..., 3, 3, 3) with NaN padding for complex
    roots (solution axis first).
    reference behavior: solvers/fundamental_matrix.* (PoseLib 7pt).
    """
    n1, T1 = _hartley_normalize(x1)
    n2, T2 = _hartley_normalize(x2)
    A = _epipolar_constraint_matrix(n1, n2)  # (..., 7, 9)
    # 2D null space of A: two smallest eigenvectors of AᵀA.
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    f1 = vecs[..., :, 0].reshape(AtA.shape[:-2] + (3, 3))
    f2 = vecs[..., :, 1].reshape(AtA.shape[:-2] + (3, 3))

    # det(a F1 + (1-a) F2) = 0: cubic in a. Evaluate by polynomial
    # interpolation of g(a) at 4 points (exact for cubic).
    def g(a):
        return jnp.linalg.det(a[..., None, None] * f1 + (1 - a)[..., None, None] * f2)

    batch = AtA.shape[:-2]
    a_nodes = jnp.asarray([0.0, 1.0, 2.0, -1.0], dtype=x1.dtype)
    gv = jnp.stack([g(jnp.full(batch, an, x1.dtype)) for an in a_nodes], axis=-1)
    # Fit cubic coeffs c3 a^3 + c2 a^2 + c1 a + c0 through the 4 samples.
    V = jnp.stack([a_nodes**3, a_nodes**2, a_nodes, jnp.ones_like(a_nodes)], axis=-1)
    coeffs = jnp.einsum("ij,...j->...i", jnp.linalg.inv(V), gv)
    roots, mask = solve_cubic(
        coeffs[..., 0], coeffs[..., 1], coeffs[..., 2], coeffs[..., 3]
    )

    def build(a, ok):
        F = a[..., None, None] * f1 + (1 - a)[..., None, None] * f2
        F = jnp.swapaxes(T2, -1, -2) @ F @ T1
        norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
        F = F / jnp.maximum(norm, 1e-30)[..., None, None]
        return jnp.where(ok[..., None, None], F, jnp.nan)

    Fs = jnp.stack(
        [build(roots[..., i], mask[..., i]) for i in range(3)], axis=-3
    )
    return Fs


def homography_dlt(x1, x2, weights=None):
    """4-point (or weighted N-point) homography via DLT.

    x1, x2: (..., N, 2); H maps x1 -> x2. Returns (..., 3, 3).
    reference behavior: solvers/homography_matrix.*.
    """
    n1, T1 = _hartley_normalize(x1, weights)
    n2, T2 = _hartley_normalize(x2, weights)
    u1, v1 = n1[..., 0], n1[..., 1]
    u2, v2 = n2[..., 0], n2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    row1 = jnp.stack([-u1, -v1, -o, z, z, z, u2 * u1, u2 * v1, u2], axis=-1)
    row2 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    A = jnp.concatenate([row1, row2], axis=-2)
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=-1)
        A = A * w2[..., None]
    h = _smallest_right_singular(A)
    H = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.inv(T2) @ H @ T1
    # Normalize by H[2,2]-ish scale (use Frobenius for robustness).
    norm = jnp.linalg.norm(H.reshape(H.shape[:-2] + (9,)), axis=-1)
    return H / jnp.maximum(norm, 1e-30)[..., None, None]


def homography_transfer_error(H, x1, x2):
    """Squared forward transfer error |H x1 - x2|², per point.

    H: (..., 3, 3); x1, x2: (..., 2) — batch dims broadcast, matching the
    per-point convention of sampson_error/squared_epipolar_line_distance so
    RANSAC residual closures are uniform across model families.
    """
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    Hx = jnp.einsum("...ij,...j->...i", H, p1)
    w = Hx[..., 2]
    bad = jnp.abs(w) < 1e-12
    safe_w = jnp.where(bad, 1.0, w)
    proj = Hx[..., :2] / safe_w[..., None]
    err = jnp.sum((proj - x2) ** 2, axis=-1)
    return jnp.where(bad, jnp.inf, err)
