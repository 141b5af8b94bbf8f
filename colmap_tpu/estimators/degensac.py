"""Dominant-plane-robust fundamental matrix estimation (DEGENSAC).

reference behavior: src/colmap/estimators/fundamental_matrix_degensac.{h,cc}
(Chum et al., "Two-view geometry estimation unaffected by a dominant
plane") wired in via TwoViewGeometryOptions (estimators/two_view_geometry.h
DEGENSAC option :103). The reference interleaves per-sample H-degeneracy
tests inside the sequential RANSAC loop; that shape is hostile to batching,
so the TPU formulation runs the degeneracy recovery *after* the batched
F-RANSAC as one vectorized plane-and-parallax pass:

  1. fit H to the F-inliers (batched H RANSAC);
  2. if the dominant plane explains most F-inliers, the F estimate is
     suspect: sample off-plane correspondence pairs in bulk, build
     F_k = [e'_k]_x H from the epipole e'_k given by the intersection of
     the two parallax lines, and score all K hypotheses at once;
  3. keep the recovered F if its support beats the original.

This preserves DEGENSAC's semantics (the winning model is never an
H-compatible degenerate F when off-plane structure exists) in fixed-shape
batch form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from colmap_tpu.estimators.solvers.epipolar import fundamental_eight_point
from colmap_tpu.geometry.essential import squared_epipolar_line_distance
from colmap_tpu.optim.ransac import RansacOptions


def _cross_mat(v):
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def fundamental_from_plane_and_parallax(H, x1a, x2a, x1b, x2b):
    """F from a homography plus two off-plane correspondences.

    The epipole e' is the intersection of the parallax lines
    l_i = (H x1_i) x x2_i; then F = [e']_x H.
    All arguments broadcast; returns (..., 3, 3) normalized to unit Frobenius.
    """
    ones_a = jnp.ones_like(x1a[..., :1])
    p1a = jnp.concatenate([x1a, ones_a], axis=-1)
    p2a = jnp.concatenate([x2a, ones_a], axis=-1)
    p1b = jnp.concatenate([x1b, ones_a], axis=-1)
    p2b = jnp.concatenate([x2b, ones_a], axis=-1)
    Hx1a = jnp.einsum("...ij,...j->...i", H, p1a)
    Hx1b = jnp.einsum("...ij,...j->...i", H, p1b)
    la = jnp.cross(Hx1a, p2a)
    lb = jnp.cross(Hx1b, p2b)
    e2 = jnp.cross(la, lb)
    F = _cross_mat(e2) @ H
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
    return F / jnp.maximum(norm, 1e-30)[..., None, None]


@partial(jax.jit, static_argnames=("options", "num_pair_hypotheses"))
def degensac_recover_f(
    key,
    x1,
    x2,
    mask,
    F,
    f_inlier_mask,
    H,
    h_inlier_mask,
    options: RansacOptions,
    num_pair_hypotheses: int = 256,
):
    """Plane-and-parallax F recovery given a dominant-plane H.

    Args:
        x1, x2: (N, 2) padded correspondences; mask (N,) valid rows.
        F, f_inlier_mask: the batched-RANSAC F result.
        H, h_inlier_mask: dominant-plane homography and its inliers.

    Returns (F_best, num_inliers, inlier_mask, recovered: bool scalar).
    """
    n = x1.shape[0]
    max_sq = options.max_error**2

    # Off-plane pool: valid rows not explained by H. Sampling weights favor
    # F-inliers but allow any off-plane row (F may be the degenerate model).
    off_plane = mask & ~h_inlier_mask
    n_off = jnp.sum(off_plane)
    pool = jnp.nonzero(off_plane, size=n, fill_value=0)[0]
    k1, k2 = jax.random.split(key)
    ra = jax.random.randint(k1, (num_pair_hypotheses,), 0, jnp.maximum(n_off, 1))
    rb = jax.random.randint(k2, (num_pair_hypotheses,), 0, jnp.maximum(n_off, 1))
    ia, ib = pool[ra], pool[rb]

    Fs = fundamental_from_plane_and_parallax(
        H[None], x1[ia], x2[ia], x1[ib], x2[ib]
    )  # (K, 3, 3)
    res = squared_epipolar_line_distance(Fs[:, None], x1[None], x2[None])
    inl = (res <= max_sq) & mask[None, :]
    support = jnp.sum(inl, axis=-1)
    ok = jnp.all(jnp.isfinite(Fs.reshape(Fs.shape[0], -1)), axis=-1)
    ok &= ia != ib
    support = jnp.where(ok, support, 0)
    best = jnp.argmax(support)

    # Local refit of the best recovered model on its inliers.
    w = inl[best].astype(x1.dtype)
    F_ref = fundamental_eight_point(x1, x2, w)
    res_ref = squared_epipolar_line_distance(F_ref, x1, x2)
    sup_ref = jnp.sum((res_ref <= max_sq) & mask)
    ref_ok = jnp.all(jnp.isfinite(F_ref))
    take_ref = ref_ok & (sup_ref > support[best])
    F_rec = jnp.where(take_ref, F_ref, Fs[best])
    sup_rec = jnp.maximum(support[best], jnp.where(ref_ok, sup_ref, 0))

    f_support = jnp.sum(f_inlier_mask & mask)
    recovered = (n_off >= 2) & (sup_rec > f_support)
    F_best = jnp.where(recovered, F_rec, F)
    res_b = squared_epipolar_line_distance(F_best, x1, x2)
    inl_b = (res_b <= max_sq) & mask
    return F_best, jnp.sum(inl_b), inl_b, recovered


def is_h_degenerate(num_f_inliers, num_fh_inliers, threshold: float = 0.8):
    """The F estimate is H-degenerate when the dominant plane explains most
    of its support (Chum et al. use >= 5 of 7 sample points ~ 0.7-0.85)."""
    return num_fh_inliers >= threshold * jnp.maximum(num_f_inliers, 1)
