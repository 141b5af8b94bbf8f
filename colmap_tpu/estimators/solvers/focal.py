"""Focal-length recovery from epipolar geometry.

reference behavior: src/colmap/estimators/solvers/relpose_shared_focal.{h,cc}
(PoseLib 6-pt shared-focal minimal solver) and relpose_one_sided_focal.cc —
used by EstimateSharedFocalTwoViewGeometry /
EstimateOneSidedFocalTwoViewGeometry (estimators/two_view_geometry.cc:597-611)
when exactly one or neither camera has a focal prior.

TPU-first design: instead of Grobner-basis minimal solvers, focal recovery
runs as closed-form/batched array programs on top of the already-vectorized
F RANSAC:

- two independent focals: the Bougnoux closed form from F + principal
  points (Bougnoux, ICCV'98);
- one shared focal: geometric mean of the Bougnoux pair (equal in the
  noise-free shared-focal case), validated for identifiability;
- one-sided focal: a vectorized log-space grid + golden refinement over
  the unknown focal, scoring the essential-ness of diag(f,f,1)-upgraded G
  (equal nonzero singular values) — a batched SVD sweep instead of a
  polynomial solver.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _epipole(F):
    """Right epipole: F e = 0 (smallest right singular vector)."""
    _, _, Vt = jnp.linalg.svd(F)
    return Vt[-1]


def bougnoux_focals(F, pp1, pp2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Squared focal lengths (f1^2, f2^2) from a fundamental matrix.

    Bougnoux ICCV'98 closed form. pp1/pp2: (2,) principal points in pixels.
    Negative outputs indicate an unreliable/degenerate configuration.
    """
    F = jnp.asarray(F)
    p1 = jnp.concatenate([jnp.asarray(pp1, dtype=F.dtype), jnp.ones(1, F.dtype)])
    p2 = jnp.concatenate([jnp.asarray(pp2, dtype=F.dtype), jnp.ones(1, F.dtype)])
    I2 = jnp.diag(jnp.asarray([1.0, 1.0, 0.0], dtype=F.dtype))

    def cross(v):
        return jnp.array(
            [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]],
            dtype=F.dtype,
        )

    e1 = _epipole(F)  # F e1 = 0
    e2 = _epipole(F.T)  # F^T e2 = 0

    # f1: focal of image 1.
    num1 = -(p2 @ cross(e2) @ I2 @ F @ p1) * (p2 @ F @ p1)
    den1 = p2 @ cross(e2) @ I2 @ F @ I2 @ F.T @ p2
    f1_sq = num1 / den1
    # f2 by the symmetric formula on F^T.
    num2 = -(p1 @ cross(e1) @ I2 @ F.T @ p2) * (p1 @ F.T @ p2)
    den2 = p1 @ cross(e1) @ I2 @ F.T @ I2 @ F @ p1
    f2_sq = num2 / den2
    return f1_sq, f2_sq


def shared_focal_from_fundamental(
    F, pp1, pp2, min_focal: float = 1e-3
) -> Tuple[float, bool]:
    """Single shared focal from F: geometric mean of the Bougnoux pair.

    Returns (focal, ok). ok is False when either squared focal is
    non-positive (coplanar-axes singular family — reference:
    relpose_shared_focal.h IsFocalIdentifiable discussion).
    """
    f1_sq, f2_sq = bougnoux_focals(F, pp1, pp2)
    f1_sq = float(f1_sq)
    f2_sq = float(f2_sq)
    if not np.isfinite(f1_sq) or not np.isfinite(f2_sq):
        return 0.0, False
    if f1_sq <= min_focal or f2_sq <= min_focal:
        return 0.0, False
    # Consistency of the two estimates guards identifiability.
    ratio = np.sqrt(f1_sq / f2_sq)
    if ratio > 1.5 or ratio < 1.0 / 1.5:
        return 0.0, False
    return float((f1_sq * f2_sq) ** 0.25), True


def two_focals_from_fundamental(
    F, pp1, pp2, min_focal: float = 1e-3
) -> Tuple[float, float, bool]:
    """Two independent focals via Bougnoux (reference: uncalibrated
    two-view path, prior focal estimation)."""
    f1_sq, f2_sq = bougnoux_focals(F, pp1, pp2)
    f1_sq, f2_sq = float(f1_sq), float(f2_sq)
    if (
        not np.isfinite(f1_sq)
        or not np.isfinite(f2_sq)
        or f1_sq <= min_focal
        or f2_sq <= min_focal
    ):
        return 0.0, 0.0, False
    return float(np.sqrt(f1_sq)), float(np.sqrt(f2_sq)), True


def _essentialness(E):
    """0 when E is a valid essential matrix (two equal singular values,
    third zero)."""
    s = jnp.linalg.svd(E, compute_uv=False)
    return (s[0] - s[1]) / jnp.maximum(s[0] + s[1], 1e-12) + s[2] / jnp.maximum(
        s[0], 1e-12
    )


def one_sided_focal_from_geometry(
    G,
    min_focal: float,
    max_focal: float,
    num_samples: int = 64,
    num_refine: int = 24,
) -> Tuple[float, float]:
    """Unknown focal f of the *second* camera given G with
    x2_centered^T G x1_ray = 0, i.e. E = diag(f, f, 1) G.

    Vectorized log-space grid over f followed by golden-section refinement;
    returns (f, residual essential-ness score).
    """
    G = jnp.asarray(G)

    def score(f):
        K = jnp.diag(jnp.stack([f, f, jnp.ones_like(f)]))
        return _essentialness(K @ G)

    fs = jnp.exp(
        jnp.linspace(np.log(min_focal), np.log(max_focal), num_samples)
    ).astype(G.dtype)
    scores = jax.vmap(score)(fs)
    best = int(jnp.argmin(scores))
    lo = float(fs[max(best - 1, 0)])
    hi = float(fs[min(best + 1, num_samples - 1)])
    # Golden-section refinement on [lo, hi].
    gr = 0.61803398875
    a, b = lo, hi
    c = b - gr * (b - a)
    d = a + gr * (b - a)
    fc = float(score(jnp.asarray(c, dtype=G.dtype)))
    fd = float(score(jnp.asarray(d, dtype=G.dtype)))
    for _ in range(num_refine):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = float(score(jnp.asarray(c, dtype=G.dtype)))
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = float(score(jnp.asarray(d, dtype=G.dtype)))
    f = 0.5 * (a + b)
    return float(f), float(score(jnp.asarray(f, dtype=G.dtype)))
