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

from colmap_tpu.optim.small_linalg import (
    bmm_small, eigh_small, nullspace_small, svd3x3,
)
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

    Minimal samples (m < n): exact null space by direct Householder QR —
    the cheapest formulation inside the vmapped RANSAC trial loop.
    Overdetermined refits: symmetric eigendecomposition of AᵀA via the
    fixed-sweep Jacobi in optim/small_linalg. (jnp.linalg.eigh lowers to a
    100-iteration @Eigh custom call costing ~110 ms per batched invocation
    on the TPU and dominated the whole verification pipeline.)"""
    if A.shape[-2] < A.shape[-1]:
        return nullspace_small(A, 1)[..., :, 0]
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    _, vecs = eigh_small(AtA)
    return vecs[..., :, 0]


def _det3(M):
    """Closed-form batched 3x3 determinant (jnp.linalg.det lowers to a
    batched LU custom call — slow and f64-fragile on this backend)."""
    return (
        M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
        - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
        + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0])
    )


def _similarity_inv(T):
    """Analytic inverse of a Hartley similarity [[s,0,tx],[0,s,ty],[0,0,1]]."""
    s = T[..., 0, 0]
    inv_s = 1.0 / s
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    return jnp.stack([
        jnp.stack([inv_s, z, -T[..., 0, 2] * inv_s], axis=-1),
        jnp.stack([z, inv_s, -T[..., 1, 2] * inv_s], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


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
    U, S, Vt = svd3x3(F)
    S = S.at[..., 2].set(0.0)
    F = bmm_small(U, S[..., None] * Vt)
    F = bmm_small(bmm_small(jnp.swapaxes(T2, -1, -2), F), T1)
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
    E = bmm_small(bmm_small(jnp.swapaxes(T2, -1, -2), E), T1)
    U, S, Vt = svd3x3(E)
    ones = jnp.ones_like(S[..., :2])
    S_proj = jnp.concatenate([ones, jnp.zeros_like(S[..., :1])], axis=-1)
    E = bmm_small(U, S_proj[..., None] * Vt)
    return E


def essential_eight_point_rays(r1, r2, weights=None):
    """Weighted N-point essential matrix from 3D bearing rays with (1,1,0)
    singular value projection (unit rays need no Hartley conditioning)."""
    A = _ray_constraint_matrix(r1, r2)
    if weights is not None:
        A = A * weights[..., None]
    f = _smallest_right_singular(A)
    E = f.reshape(f.shape[:-1] + (3, 3))
    U, S, Vt = svd3x3(E)
    ones = jnp.ones_like(S[..., :2])
    S_proj = jnp.concatenate([ones, jnp.zeros_like(S[..., :1])], axis=-1)
    return bmm_small(U, S_proj[..., None] * Vt)


def homography_ray_dlt(r1, r2, weights=None):
    """Ray-space homography H with r2 ~ H r1 (spherical pairs).

    Each correspondence contributes the three rows of [r2]_x H r1 = 0 (two
    independent); the DLT stacks all of them. r1, r2: (..., N, 3) unit rays.
    Returns (..., 3, 3) with unit Frobenius norm.
    """
    x2, y2, z2 = r2[..., 0], r2[..., 1], r2[..., 2]
    # Rows of the cross-product constraint [r2]_x (H r1) = 0, kron'd with r1.
    cross = jnp.stack(
        [
            jnp.stack([jnp.zeros_like(z2), -z2, y2], axis=-1),
            jnp.stack([z2, jnp.zeros_like(z2), -x2], axis=-1),
            jnp.stack([-y2, x2, jnp.zeros_like(z2)], axis=-1),
        ],
        axis=-2,
    )  # (..., N, 3, 3)
    A = (cross[..., :, :, None] * r1[..., None, None, :]).reshape(
        r1.shape[:-2] + (3 * r1.shape[-2], 9)
    )
    if weights is not None:
        w3 = jnp.repeat(weights, 3, axis=-1)
        A = A * w3[..., None]
    h = _smallest_right_singular(A)
    H = h.reshape(h.shape[:-1] + (3, 3))
    norm = jnp.linalg.norm(H.reshape(H.shape[:-2] + (9,)), axis=-1)
    return H / jnp.maximum(norm, 1e-30)[..., None, None]


# ---------------------------------------------------------------------------
# 5-point essential matrix (Nistér) — TPU-safe batched formulation.
#
# reference behavior: estimators/solvers/essential_matrix.* +
# essential_matrix_poly.h (PoseLib 5pt with the 10th-degree polynomial).
# Design notes: the classic action-matrix eigendecomposition needs a
# nonsymmetric eig (unavailable on TPU), so this uses Nistér's closed
# polynomial reduction: nullspace basis -> 10x20 cubic-constraint system ->
# Gauss-Jordan -> 3x3 polynomial matrix B(z) -> det B(z) = degree-10
# polynomial, whose real roots are isolated on a tan(theta) grid in
# homogeneous (sin, cos) form (overflow-free) and polished by bisection —
# fixed shapes throughout, so thousands of samples run as one XLA program.
# ---------------------------------------------------------------------------

# Monomial orders.
# deg1: [x, y, z, 1]
# deg2: [x², y², z², xy, xz, yz, x, y, z, 1]
# deg3 (Nistér's 20-monomial order):
#   [x³, y³, x²y, xy², x²z, x², y²z, y², xyz, xy,
#    xz², xz, x, yz², yz, y, z³, z², z, 1]
_MUL11 = (  # deg1 x deg1 -> deg2 index table
    (0, 3, 4, 6),
    (3, 1, 5, 7),
    (4, 5, 2, 8),
    (6, 7, 8, 9),
)
_MUL21 = (  # deg2 x deg1 -> deg3 index table
    (0, 2, 4, 5),     # x² · [x,y,z,1]
    (3, 1, 6, 7),     # y²
    (10, 13, 16, 17), # z²
    (2, 3, 8, 9),     # xy
    (4, 8, 10, 11),   # xz
    (8, 6, 13, 14),   # yz
    (5, 9, 11, 12),   # x
    (9, 7, 14, 15),   # y
    (11, 14, 17, 18), # z
    (12, 15, 18, 19), # 1
)


def _p1_mul_p1(p, q):
    """(.., 4) x (.., 4) -> (.., 10)."""
    out = jnp.zeros(p.shape[:-1] + (10,), dtype=p.dtype)
    for i in range(4):
        for j in range(4):
            out = out.at[..., _MUL11[i][j]].add(p[..., i] * q[..., j])
    return out


def _p2_mul_p1(p, q):
    """(.., 10) x (.., 4) -> (.., 20)."""
    out = jnp.zeros(p.shape[:-1] + (20,), dtype=p.dtype)
    for i in range(10):
        for j in range(4):
            out = out.at[..., _MUL21[i][j]].add(p[..., i] * q[..., j])
    return out


def _polyval_homog(coeffs, s, c):
    """Evaluate sum_k coeffs[k] * s^(n-k) * c^k (descending z-powers).

    coeffs: (.., n+1); s, c: (.., G). Homogeneous form of p(z) with
    z = s/c — finite at c -> 0, so the whole real line is searchable.
    """
    n = coeffs.shape[-1] - 1
    G = s.shape[-1]
    out = jnp.zeros(coeffs.shape[:-1] + (G,), dtype=coeffs.dtype)
    # Horner in s with a running power of c.
    for k in range(n + 1):
        out = out * s + coeffs[..., k, None] * (c ** k if k else 1.0)
    return out


def _ray_constraint_matrix(r1, r2):
    """Rows r2_i ⊗ r1_i of the epipolar system for 3D bearing rays
    (spherical/omnidirectional cameras): r2ᵀ E r1 = 0."""
    return (r2[..., :, None] * r1[..., None, :]).reshape(r1.shape[:-1] + (9,))


def essential_five_point(x1, x2):
    """Nistér 5-point essential matrix: up to 10 solutions.

    x1, x2: (5, 2) *normalized* (calibrated) coordinates; single sample —
    vmap for batches. Returns (10, 3, 3) with NaN padding.
    """
    return _essential_five_point_from_constraints(
        _epipolar_constraint_matrix(x1, x2)
    )


def essential_five_point_rays(r1, r2):
    """5-point essential matrix from 3D bearing rays (single sample).

    The spherical/omnidirectional variant: only the constraint rows differ,
    the Nistér polynomial machinery is shared (reference behavior:
    EstimateSphericalTwoViewGeometry estimates E from CamRayFromImg rays,
    two_view_geometry.cc:394-470)."""
    return _essential_five_point_from_constraints(
        _ray_constraint_matrix(r1, r2)
    )


def _essential_five_point_from_constraints(A):
    """Shared Nistér solve from a (5, 9) constraint matrix."""
    dtype = A.dtype
    # 4-dim nullspace basis by direct Householder QR (hot path: one call
    # per RANSAC sample); E = x E0 + y E1 + z E2 + E3.
    ns = nullspace_small(A, 4)  # (9, 4)
    EB = jnp.stack([ns[:, k].reshape(3, 3) for k in range(4)], axis=-1)
    # EB[i, j] is the deg1 poly (x, y, z, 1) for entry (i, j): shape (3,3,4).

    # det(E): expansion along the first row (deg3).
    def minor(i0, i1, j0, j1):
        return _p1_mul_p1(EB[i0, j0], EB[i1, j1]) - _p1_mul_p1(
            EB[i0, j1], EB[i1, j0]
        )

    det_row = (
        _p2_mul_p1(minor(1, 2, 1, 2), EB[0, 0])
        - _p2_mul_p1(minor(1, 2, 0, 2), EB[0, 1])
        + _p2_mul_p1(minor(1, 2, 0, 1), EB[0, 2])
    )  # (20,)

    # 2 E Eᵀ E − trace(E Eᵀ) E = 0: nine deg3 rows.
    EEt = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for k in range(3):
            acc = jnp.zeros((10,), dtype=dtype)
            for j in range(3):
                acc = acc + _p1_mul_p1(EB[i, j], EB[k, j])
            EEt[i][k] = acc
    trace = EEt[0][0] + EEt[1][1] + EEt[2][2]
    rows = [det_row]
    for i in range(3):
        for j in range(3):
            acc = jnp.zeros((20,), dtype=dtype)
            for k in range(3):
                Lik = 2.0 * EEt[i][k] - (trace if i == k else 0.0)
                acc = acc + _p2_mul_p1(Lik, EB[k, j])
            rows.append(acc)
    M = jnp.stack(rows, axis=0)  # (10, 20)

    # Gauss-Jordan: [A1 | A2] -> [I | A1⁻¹ A2].
    Mred = jnp.linalg.solve(M[:, :10], M[:, 10:])  # (10, 10)
    # Columns of Mred: [xz², xz, x, yz², yz, y, z³, z², z, 1].

    def brow(i):
        r1, r2 = Mred[4 + 2 * i], Mred[5 + 2 * i]
        p1 = jnp.stack([r2[0], r2[1] - r1[0], r2[2] - r1[1], -r1[2]])
        p2 = jnp.stack([r2[3], r2[4] - r1[3], r2[5] - r1[4], -r1[5]])
        p3 = jnp.stack(
            [r2[6], r2[7] - r1[6], r2[8] - r1[7], r2[9] - r1[8], -r1[9]]
        )
        return p1, p2, p3

    (p1a, p2a, p3a), (p1b, p2b, p3b), (p1c, p2c, p3c) = (
        brow(0), brow(1), brow(2)
    )

    conv = lambda a, b: jnp.convolve(a, b)  # noqa: E731 (descending powers)
    # det of [[p1a,p2a,p3a],[p1b,p2b,p3b],[p1c,p2c,p3c]] — degree 10 in z.
    n_poly = (
        conv(p1a, conv(p2b, p3c) - conv(p2c, p3b))
        - conv(p2a, conv(p1b, p3c) - conv(p1c, p3b))
        + conv(p3a, conv(p1b, p2c) - conv(p1c, p2b))
    )  # (11,) descending

    scale = jnp.max(jnp.abs(n_poly))
    n_poly = n_poly / jnp.maximum(scale, 1e-300 if dtype == jnp.float64 else 1e-30)

    # Root isolation: z = tan(theta) grid in homogeneous (sin, cos) form.
    # Endpoint-inclusive: the homogeneous form is finite at theta = ±pi/2,
    # so arbitrarily large real roots still produce a sign change in the
    # boundary cells. Cells holding a *pair* of close roots show no sign
    # change; those are recovered by bisecting the derivative to the
    # enclosed extremum and splitting the cell there.
    G = 1024
    theta = jnp.arange(G + 1, dtype=dtype) / G * jnp.pi - jnp.pi / 2
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    v = _polyval_homog(n_poly, sin_t, cos_t)
    d_poly = n_poly[:-1] * jnp.arange(10, 0, -1, dtype=dtype)
    dv = _polyval_homog(d_poly, sin_t, cos_t)

    # Compaction of marked cells via top_k instead of jnp.nonzero: nonzero
    # lowers to full-grid index materialization + sort copies that cost
    # tens of ms per RANSAC step on the TPU; top_k of (G - index) yields
    # the first-k True indices directly.
    span = jnp.arange(G, dtype=jnp.int32)

    def first_true(mask_cells, k):
        val = jnp.where(mask_cells, G - span, 0)
        topv = jax.lax.top_k(val, k)[0]
        return jnp.where(topv > 0, G - topv, 0), topv > 0

    sign_change = v[:-1] * v[1:] < 0
    idx, direct_valid = first_true(sign_change, 10)
    d_lo, d_hi = theta[idx], theta[idx + 1]

    # Extremum cells: derivative flips but the value does not.
    ext_cell = (dv[:-1] * dv[1:] < 0) & ~sign_change
    eidx, e_valid = first_true(ext_cell, 9)
    e_lo, e_hi = theta[eidx], theta[eidx + 1]
    e_dlo = dv[eidx]

    def bis_d(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        vm = _polyval_homog(d_poly, jnp.sin(mid), jnp.cos(mid))
        go_right = jnp.sign(vm) == jnp.sign(e_dlo)
        return (jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)), None

    # Bisection depth by dtype: cells are ~3e-3 rad wide; 24 halvings reach
    # ~2e-10 — below f32 resolution (f64 CPU paths keep the deep refine).
    n_bis_d = 50 if dtype == jnp.float64 else 24
    (el, eh), _ = jax.lax.scan(bis_d, (e_lo, e_hi), None, length=n_bis_d)
    e_mid = 0.5 * (el + eh)
    v_mid = _polyval_homog(n_poly, jnp.sin(e_mid), jnp.cos(e_mid))
    split = e_valid & (jnp.sign(v_mid) != jnp.sign(v[eidx])) & (v_mid != 0)

    # Candidate brackets: 10 direct + 18 from extremum splits.
    lo = jnp.concatenate([d_lo, e_lo, e_mid])
    hi = jnp.concatenate([d_hi, e_mid, e_hi])
    valid_all = jnp.concatenate([direct_valid, split, split])
    vlo = _polyval_homog(n_poly, jnp.sin(lo), jnp.cos(lo))

    def bis(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        vm = _polyval_homog(n_poly, jnp.sin(mid), jnp.cos(mid))
        go_right = jnp.sign(vm) == jnp.sign(vlo)
        return (jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)), None

    n_bis = 60 if dtype == jnp.float64 else 28
    (lo, hi), _ = jax.lax.scan(bis, (lo, hi), None, length=n_bis)
    # A degree-10 polynomial has at most 10 real roots: compact to 10.
    n_cand = valid_all.shape[0]  # 28
    span_c = jnp.arange(n_cand, dtype=jnp.int32)
    val_c = jnp.where(valid_all, n_cand - span_c, 0)
    topv_c = jax.lax.top_k(val_c, 10)[0]
    ridx = jnp.where(topv_c > 0, n_cand - topv_c, 0)
    valid = topv_c > 0
    z = jnp.tan(0.5 * (lo + hi))[ridx]  # (10,)

    # Back-substitute x(z), y(z): least squares over the three B rows.
    def peval(p, z):
        out = jnp.zeros_like(z)
        for k in range(p.shape[0]):
            out = out * z + p[k]
        return out

    a11, a12, b1 = peval(p1a, z), peval(p2a, z), -peval(p3a, z)
    a21, a22, b2 = peval(p1b, z), peval(p2b, z), -peval(p3b, z)
    a31, a32, b3 = peval(p1c, z), peval(p2c, z), -peval(p3c, z)
    # Normal equations (2x2) of the 3x2 system.
    g11 = a11 * a11 + a21 * a21 + a31 * a31
    g12 = a11 * a12 + a21 * a22 + a31 * a32
    g22 = a12 * a12 + a22 * a22 + a32 * a32
    h1 = a11 * b1 + a21 * b2 + a31 * b3
    h2 = a12 * b1 + a22 * b2 + a32 * b3
    det_g = g11 * g22 - g12 * g12
    safe = jnp.where(jnp.abs(det_g) < 1e-30, 1.0, det_g)
    xs = (g22 * h1 - g12 * h2) / safe
    ys = (g11 * h2 - g12 * h1) / safe

    E = (
        xs[:, None, None] * EB[None, :, :, 0]
        + ys[:, None, None] * EB[None, :, :, 1]
        + z[:, None, None] * EB[None, :, :, 2]
        + EB[None, :, :, 3]
    )  # (10, 3, 3)
    # Project onto the essential manifold (absorbs root-polish residue).
    # Newton-Schulz instead of an SVD: Y <- 1.5 Y - 0.5 Y Yᵀ Y drives the
    # two dominant singular values to 1 quadratically while the near-zero
    # third stays near zero — for candidates already essentially valid
    # this matches the U diag(1,1,0) Vᵀ projection to solver precision at
    # ~10x less cost (the per-candidate batched 3x3 SVD was 80% of the
    # whole 5pt program on the TPU).
    hi = jax.lax.Precision.HIGHEST
    fro = jnp.sqrt(jnp.sum(E * E, axis=(-2, -1), keepdims=True))
    Y = E * (jnp.sqrt(2.0) / jnp.maximum(fro, 1e-30))
    for _ in range(3 if dtype == jnp.float32 else 4):
        YYtY = jnp.matmul(
            jnp.matmul(Y, jnp.swapaxes(Y, -1, -2), precision=hi),
            Y, precision=hi,
        )
        Y = 1.5 * Y - 0.5 * YYtY
    E = Y
    ok = valid & (jnp.abs(det_g) >= 1e-30)
    return jnp.where(ok[:, None, None], E, jnp.nan)


def fundamental_seven_point(x1, x2):
    """7-point fundamental matrix: up to 3 solutions.

    x1, x2: (..., 7, 2). Returns (..., 3, 3, 3) with NaN padding for complex
    roots (solution axis first).
    reference behavior: solvers/fundamental_matrix.* (PoseLib 7pt).
    """
    n1, T1 = _hartley_normalize(x1)
    n2, T2 = _hartley_normalize(x2)
    A = _epipolar_constraint_matrix(n1, n2)  # (..., 7, 9)
    # 2D null space of A by direct Householder QR (hot path: one call per
    # RANSAC sample; any orthonormal basis parameterizes the same pencil).
    ns = nullspace_small(A, 2)  # (..., 9, 2)
    batch = A.shape[:-2]
    f1 = ns[..., :, 0].reshape(batch + (3, 3))
    f2 = ns[..., :, 1].reshape(batch + (3, 3))

    # det(a F1 + (1-a) F2) = 0: cubic in a. Evaluate by polynomial
    # interpolation of g(a) at 4 points (exact for cubic).
    def g(a):
        return _det3(a[..., None, None] * f1 + (1 - a)[..., None, None] * f2)

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
        F = bmm_small(bmm_small(jnp.swapaxes(T2, -1, -2), F), T1)
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
    H = bmm_small(bmm_small(_similarity_inv(T2), H), T1)
    # Normalize by H[2,2]-ish scale (use Frobenius for robustness).
    norm = jnp.linalg.norm(H.reshape(H.shape[:-2] + (9,)), axis=-1)
    return H / jnp.maximum(norm, 1e-30)[..., None, None]


def homography_transfer_error(H, x1, x2):
    """Squared forward transfer error |H x1 - x2|², per point.

    H: (..., 3, 3); x1, x2: (..., 2) — batch dims broadcast, matching the
    per-point convention of sampson_error/squared_epipolar_line_distance so
    RANSAC residual closures are uniform across model families.
    """
    # Component broadcast form (no (models, points, 3, 3) einsum
    # materialization — see geometry/essential.sampson_error).
    u1, v1 = x1[..., 0], x1[..., 1]
    hx = H[..., 0, 0] * u1 + H[..., 0, 1] * v1 + H[..., 0, 2]
    hy = H[..., 1, 0] * u1 + H[..., 1, 1] * v1 + H[..., 1, 2]
    w = H[..., 2, 0] * u1 + H[..., 2, 1] * v1 + H[..., 2, 2]
    bad = jnp.abs(w) < 1e-12
    safe_w = jnp.where(bad, 1.0, w)
    dx = hx / safe_w - x2[..., 0]
    dy = hy / safe_w - x2[..., 1]
    err = dx * dx + dy * dy
    return jnp.where(bad, jnp.inf, err)
