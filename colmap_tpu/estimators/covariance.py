"""Bundle-adjustment covariance estimation.

reference behavior: src/colmap/estimators/covariance.h:50-143
(EstimateBACovariance) — pose/point covariances from the Schur complement of
the BA normal equations. The reduced camera system here is small (6F + CP),
so it is densified by applying the matrix-free Schur matvec to basis vectors
and inverted directly; point covariances come from back-substitution:
Σ_pp = H_pp⁻¹ + H_pp⁻¹ H_pc Σ_cc H_cp H_pp⁻¹.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators import bundle_adjustment as ba


def estimate_ba_covariance(
    problem: ba.BAProblem,
    model_id: int,
    options: Optional[ba.BAOptions] = None,
    masks: Optional[ba.BAMasks] = None,
    damping: float = 1e-8,
):
    """Pose (and camera-intrinsic) covariances at the current state.

    Returns dict with:
        pose_covs: (F, 6, 6) per-frame covariance in the local tangent
            (rotation xyz, translation xyz); gauge-fixed frames get zeros.
        cam_covs: (C, P, P).
    """
    if options is None:
        options = ba.BAOptions()
    if masks is None:
        masks = ba.default_masks(problem, model_id, options)

    r, Jp, Jc, Jx = ba._obs_jacobians(problem, model_id, options)
    Jp, Jc, Jx = ba._apply_masks(Jp, Jc, Jx, problem, masks, options)
    F = problem.quat.shape[0]
    C, P = problem.cam_params.shape
    lam = jnp.asarray(damping, dtype=problem.points.dtype)
    ops = ba._build_schur(problem, Jp, Jc, Jx, lam, options)

    n = F * 6 + C * P

    def matvec_flat(v):
        xp = v[: F * 6].reshape(F, 6)
        xc = v[F * 6:].reshape(C, P)
        op, oc = ba._schur_matvec(problem, ops, xp, xc,
                                  options.obs_sorted_by_point)
        return jnp.concatenate([op.reshape(-1), oc.reshape(-1)])

    S = jax.vmap(matvec_flat)(jnp.eye(n, dtype=problem.points.dtype)).T
    S = np.asarray(S)
    # Regularize fixed (zero) rows/cols so the inverse exists; their
    # covariance is reported as zero.
    diag = np.abs(np.diag(S))
    fixed = diag < 1e-12
    S_reg = S + np.diag(np.where(fixed, 1.0, damping * np.maximum(diag, 1.0)))
    cov = np.linalg.inv(S_reg)
    cov[fixed, :] = 0.0
    cov[:, fixed] = 0.0

    pose_covs = np.stack(
        [cov[6 * i: 6 * i + 6, 6 * i: 6 * i + 6] for i in range(F)]
    )
    cam_covs = np.stack(
        [
            cov[F * 6 + P * i: F * 6 + P * (i + 1),
                F * 6 + P * i: F * 6 + P * (i + 1)]
            for i in range(C)
        ]
    )
    return {"pose_covs": pose_covs, "cam_covs": cam_covs}
