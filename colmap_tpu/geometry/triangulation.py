"""Multi-view triangulation math, batched.

reference behavior: src/colmap/geometry/triangulation.h:55-118 — 2-view DLT,
midpoint, N-view SVD, and triangulation-angle computation, redesigned as
fixed-shape masked array programs (invalid/padded views carry zero weight).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.geometry.essential import calc_depth, triangulate_point_dlt  # noqa: F401


def triangulate_multi_view(proj_matrices, points, mask=None):
    """N-view triangulation via the smallest eigenvector of AᵀA.

    Args:
        proj_matrices: (..., V, 3, 4) cam-from-world projections.
        points: (..., V, 2) normalized image observations.
        mask: optional (..., V) validity weights (0/1); padded views -> 0.
    Returns:
        (..., 3) triangulated world points.

    reference behavior: TriangulateMultiViewPoint (triangulation.h:75) —
    accumulates per-view rank-deficient terms and takes the smallest
    eigenvector of the 4x4 system, which is what the masked sum builds here.
    """
    # Per view: term = (x_h * P_2 - P_row) style cost. The reference uses
    # cost accumulation: A += (point_h * P3 - P)ᵀ (point_h * P3 - P) with
    # point normalized to unit norm.
    ones = jnp.ones_like(points[..., :1])
    xh = jnp.concatenate([points, ones], axis=-1)  # (..., V, 3)
    xh = xh / jnp.linalg.norm(xh, axis=-1, keepdims=True)
    # term_i = P - xh (xhᵀ P): (..., V, 3, 4)
    xhxhT_P = jnp.einsum("...i,...j,...jk->...ik", xh, xh, proj_matrices)
    term = proj_matrices - xhxhT_P
    A = jnp.einsum("...vij,...vik->...jk", term, term) if mask is None else jnp.einsum(
        "...vij,...vik,...v->...jk", term, term, mask.astype(points.dtype)
    )
    _, vecs = jnp.linalg.eigh(A)
    Xh = vecs[..., 0]
    w = Xh[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-30, 1e-30, w)
    return Xh[..., :3] / safe_w[..., None]


def triangulate_midpoint(centers, rays):
    """Least-squares intersection of rays (midpoint method).

    centers: (..., V, 3) camera centers; rays: (..., V, 3) unit directions.
    Returns (..., 3).
    """
    eye = jnp.eye(3, dtype=rays.dtype)
    # sum_i (I - d dᵀ) X = sum_i (I - d dᵀ) c
    P = eye - jnp.einsum("...i,...j->...ij", rays, rays)
    A = jnp.sum(P, axis=-3)
    b = jnp.einsum("...vij,...vj->...i", P, centers)
    return jnp.linalg.solve(A, b)


def triangulation_angle(center1, center2, point3D):
    """Angle (radians) at the 3D point between the two viewing rays.

    reference behavior: CalculateTriangulationAngle (triangulation.cc) —
    computed via the law of cosines for numerical stability.
    """
    baseline2 = jnp.sum((center1 - center2) ** 2, axis=-1)
    ray1_2 = jnp.sum((point3D - center1) ** 2, axis=-1)
    ray2_2 = jnp.sum((point3D - center2) ** 2, axis=-1)
    denom = 2.0 * jnp.sqrt(jnp.maximum(ray1_2 * ray2_2, 1e-30))
    cos_angle = (ray1_2 + ray2_2 - baseline2) / denom
    angle = jnp.arccos(jnp.clip(cos_angle, -1.0, 1.0))
    # Triangulation angle is the acute angle.
    return jnp.minimum(angle, jnp.pi - angle)
