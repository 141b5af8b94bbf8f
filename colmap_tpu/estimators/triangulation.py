"""Robust multi-view triangulation (RANSAC over view pairs).

reference behavior: src/colmap/estimators/triangulation.{h,cc}
EstimateTriangulation — LORANSAC whose minimal sample is a *view pair*
(TriangulationEstimator), scored by angular reprojection error across all
observations, with cheirality and min-tri-angle checks. TPU formulation:
all O(V^2) view pairs of a track are DLT-triangulated in one shot, all
candidates scored against all observations as one (P, V) residual matrix,
best support wins, then an N-view DLT refit on the inliers — a fixed-shape
program vmappable over thousands of tracks.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from colmap_tpu.geometry.triangulation import (
    triangulate_multi_view,
    triangulation_angle,
)


@dataclasses.dataclass(frozen=True)
class TriangulationOptions:
    """reference: estimators/triangulation.h:56-79."""

    min_tri_angle_deg: float = 1.5
    # Angular error threshold (radians) for support counting.
    max_angular_error_deg: float = 2.0


def _pair_dlt(P1, P2, x1, x2):
    """Closed-form 2-view DLT. P: (3, 4) normalized projection matrices,
    x: (2,) normalized image points. Returns (3,) world point."""
    rows = jnp.stack(
        [
            x1[0] * P1[2] - P1[0],
            x1[1] * P1[2] - P1[1],
            x2[0] * P2[2] - P2[0],
            x2[1] * P2[2] - P2[1],
        ]
    )
    A = rows
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[-1]
    w = X[3]
    safe = jnp.where(jnp.abs(w) < 1e-12, 1.0, w)
    return X[:3] / safe


def _angular_errors(X, R, t, x):
    """Angle between observed ray and the ray to X, per view.

    R: (V, 3, 3), t: (V, 3) cam_from_world; x: (V, 2) normalized points.
    """
    Xc = jnp.einsum("vij,j->vi", R, X) + t
    ray_obs = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    ray_obs = ray_obs / jnp.linalg.norm(ray_obs, axis=-1, keepdims=True)
    nrm = jnp.linalg.norm(Xc, axis=-1, keepdims=True)
    ray_est = Xc / jnp.maximum(nrm, 1e-12)
    cosang = jnp.clip(jnp.sum(ray_obs * ray_est, axis=-1), -1.0, 1.0)
    ang = jnp.arccos(cosang)
    # Negative depth = automatic outlier.
    return jnp.where(Xc[..., 2] > 0, ang, jnp.pi)


@partial(jax.jit, static_argnames=("options",))
def estimate_triangulation(R, t, x, mask, options: TriangulationOptions):
    """Robust triangulation of one track (vmap for batches).

    Args:
        R: (V, 3, 3) cam_from_world rotations (padded).
        t: (V, 3) translations.
        x: (V, 2) normalized observations.
        mask: (V,) validity of each observation row.

    Returns dict with xyz (3,), inlier_mask (V,), num_inliers, success.
    """
    V = x.shape[0]
    max_err = jnp.deg2rad(options.max_angular_error_deg)
    min_angle = jnp.deg2rad(options.min_tri_angle_deg)

    # Projection matrices and camera centers.
    P = jnp.concatenate([R, t[..., None]], axis=-1)  # (V, 3, 4)
    C = -jnp.einsum("vji,vj->vi", R, t)  # centers

    ii, jj = jnp.meshgrid(jnp.arange(V), jnp.arange(V), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    pair_ok = (ii < jj) & mask[ii] & mask[jj]

    Xs = jax.vmap(_pair_dlt)(P[ii], P[jj], x[ii], x[jj])  # (V*V, 3)
    # Pair tri angle check (reference: min_tri_angle on the sample).
    ang_pair = jax.vmap(triangulation_angle)(C[ii], C[jj], Xs[:, None])[:, 0]
    pair_ok &= ang_pair >= min_angle

    errs = jax.vmap(lambda X: _angular_errors(X, R, t, x))(Xs)  # (V*V, V)
    support = jnp.sum((errs <= max_err) & mask[None, :], axis=-1)
    support = jnp.where(pair_ok & jnp.all(jnp.isfinite(Xs), axis=-1), support, 0)
    best = jnp.argmax(support)
    X_best = Xs[best]
    inl = (errs[best] <= max_err) & mask

    # N-view DLT refit on the inliers (LO step).
    X_ref = triangulate_multi_view(P, x, mask=inl)
    err_ref = _angular_errors(X_ref, R, t, x)
    inl_ref = (err_ref <= max_err) & mask
    take = (jnp.sum(inl_ref) >= jnp.sum(inl)) & jnp.all(jnp.isfinite(X_ref))
    X_out = jnp.where(take, X_ref, X_best)
    inl_out = jnp.where(take, inl_ref, inl)
    n_inl = jnp.sum(inl_out)
    success = (n_inl >= 2) & (support[best] >= 2)
    return {
        "xyz": X_out,
        "inlier_mask": inl_out,
        "num_inliers": n_inl,
        "success": success,
    }


estimate_triangulation_batch = jax.vmap(
    estimate_triangulation, in_axes=(0, 0, 0, 0, None)
)
