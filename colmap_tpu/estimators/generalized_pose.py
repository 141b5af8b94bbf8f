"""Generalized (multi-camera rig) pose estimation.

reference behavior: src/colmap/estimators/generalized_pose.{h,cc} —
EstimateGeneralizedAbsolutePose (GP3P RANSAC for rig registration,
consumed by IncrementalMapper RegisterNextGeneralizedFrame,
sfm/incremental_mapper.cc:608), EstimateGeneralizedRelativePose, and
EstimateStructureLessAbsolutePose (2D-2D resectioning fallback,
incremental_mapper.cc RegisterNextStructureLessImage).

TPU-first design: the reference wraps PoseLib's Grobner-basis minimal
solvers (GP3P, 6-pt generalized relpose) inside a threaded RANSAC. Here
every solver is a *batched linear algebra program* vmapped over the
hypothesis batch of the vectorized RANSAC harness (SURVEY §2.9 P3):

- generalized absolute pose: linear gDLT on the ray-transfer constraint
  d x (R X + t - c) = 0 from 6+ correspondences (12-unknown least
  squares, SO(3) projection, optimal re-solve of t) — the rig geometry
  makes the problem inhomogeneous so scale is observable;
- generalized relative pose: the 17-point linear solver on the
  generalized epipolar constraint over Plucker rays (Li & Hartley);
- structure-less resectioning: 5+1 sampling — Nister 5-point essential
  against one registered world camera fixes rotation + translation
  direction, one extra correspondence from a *different* world camera
  resolves the metric scale in closed form (linear in s).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators.solvers.epipolar import essential_five_point
from colmap_tpu.geometry import rotation as rot
from colmap_tpu.geometry.essential import (
    cross_product_matrix,
    pose_from_essential_matrix,
)
from colmap_tpu.optim.ransac import RansacOptions, ransac
from colmap_tpu.scene.types import Camera, Pose
from colmap_tpu.sensor import models as camera_models
from colmap_tpu.utils.bucketing import bucket_size, pad_rows
from colmap_tpu.utils.dtypes import floatx


# ---------------------------------------------------------------------------
# Linear generalized absolute pose (gDLT)


def gdlt_pose(X, origins, dirs, weights=None, estimate_scale: bool = False):
    """Generalized absolute pose from N>=6 ray-point correspondences.

    The ray in rig coordinates is {origins[i] + s * dirs[i]}; X[i] are world
    points. Solves d x (R X + t - c) = 0 in least squares over the 12
    entries of (R, t), projects R onto SO(3), then re-solves t optimally.

    When ``estimate_scale`` is true the world scale is a 13th unknown —
    d x (R (s X) + t - c) = 0 — recovered from the singular values of the
    unconstrained rotation block. This resolves the metric conflict
    between a monocular-initialized scene (arbitrary scale) and the
    calibrated rig baselines (metric), the rig analogue of the reference's
    scale gauge handling.

    Returns a (3, 5) [R | t | s*e1] matrix (s == 1 when not estimated).
    vmap for batches.
    """
    dtype = X.dtype
    n = X.shape[0]
    if weights is None:
        weights = jnp.ones(n, dtype=dtype)
    D = jax.vmap(cross_product_matrix)(dirs)  # (n, 3, 3)
    # Rows: M[i] @ (R X[i] + t) = M[i] @ c[i]; unknown u = [vec_row(R), t].
    A_R = jnp.einsum("nia,nb->niab", D, X).reshape(n, 3, 9)
    A = jnp.concatenate([A_R, D], axis=-1)  # (n, 3, 12)
    b = jnp.einsum("nij,nj->ni", D, origins)  # (n, 3)
    w = jnp.sqrt(jnp.maximum(weights, 0.0))[:, None]
    A = (A * w[..., None]).reshape(n * 3, 12)
    b = (b * w).reshape(n * 3)
    AtA = A.T @ A + 1e-10 * jnp.eye(12, dtype=dtype)
    u = jnp.linalg.solve(AtA, A.T @ b)
    R_raw = u[:9].reshape(3, 3)
    # Project onto SO(3) (orthogonal Procrustes with det +1).
    U, sv, Vt = jnp.linalg.svd(R_raw)
    S = jnp.diag(
        jnp.array([1.0, 1.0, 1.0], dtype=dtype).at[2].set(
            jnp.sign(jnp.linalg.det(U @ Vt))
        )
    )
    R = U @ S @ Vt
    if estimate_scale:
        # The raw block approximates s * R: s = mean singular value.
        s = jnp.mean(sv)
        Xs = s * X
    else:
        s = jnp.asarray(1.0, dtype=dtype)
        Xs = X
    # Optimal t given R: sum_i w_i |M_i (R (sX_i) + t - c_i)|^2 minimized.
    rhs = jnp.einsum(
        "nij,nj->ni", D, origins - jnp.einsum("ab,nb->na", R, Xs)
    )  # (n, 3)
    MtM = jnp.einsum("nki,nkj->ij", D * weights[:, None, None], D)
    Mtb = jnp.einsum("nki,nk->i", D * weights[:, None, None], rhs)
    t = jnp.linalg.solve(MtM + 1e-10 * jnp.eye(3, dtype=dtype), Mtb)
    s_col = jnp.zeros(3, dtype=dtype).at[0].set(s)
    return jnp.concatenate([R, t[:, None], s_col[:, None]], axis=1)


@partial(jax.jit, static_argnames=("options", "estimate_scale"))
def _gen_abs_ransac(
    key, X, uv, cam_q, cam_t, focal, mask, max_error_px, options,
    estimate_scale=False,
):
    """Vectorized generalized-absolute-pose LO-RANSAC.

    X: (N, 3) world points; uv: (N, 2) normalized observations in their
    cameras; cam_q/cam_t: per-correspondence cam_from_rig rotation (wxyz)
    and translation; focal: per-correspondence mean focal (px scale).
    """
    bucket = X.shape[0]
    # Ray in rig coordinates: origin = rig point of camera center,
    # direction = rotated bearing.
    centers = -jax.vmap(rot.quat_rotate)(jax.vmap(rot.quat_conjugate)(cam_q), cam_t)
    bearings = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=1)
    bearings = bearings / jnp.linalg.norm(bearings, axis=1, keepdims=True)
    dirs = jax.vmap(rot.quat_rotate)(jax.vmap(rot.quat_conjugate)(cam_q), bearings)

    def sample_estimate(idxs):  # (K, 6)
        return jax.vmap(
            lambda s: gdlt_pose(
                X[s], centers[s], dirs[s], estimate_scale=estimate_scale
            )
        )(idxs)

    def residual(models):  # (M, 3, 5)
        R = models[:, :, :3]
        t = models[:, :, 3]
        s = models[:, 0, 4]
        Xr = (
            jnp.einsum("mij,nj->mni", R, X) * s[:, None, None]
            + t[:, None, :]
        )  # rig frame (world scaled per hypothesis)
        Xc = jax.vmap(
            lambda xr: jax.vmap(rot.quat_rotate)(cam_q, xr) + cam_t
        )(Xr)
        z = Xc[..., 2]
        behind = z < 1e-8
        proj = Xc[..., :2] / jnp.where(behind, 1.0, z)[..., None]
        err = jnp.sum((proj - uv[None]) ** 2, axis=-1) * focal[None] ** 2
        return jnp.where(behind, jnp.inf, err)

    def refine(model, weights):
        return gdlt_pose(
            X, centers, dirs, weights, estimate_scale=estimate_scale
        )

    return ransac(
        key, bucket, 6, sample_estimate, residual, options,
        mask=mask, local_refine_fn=refine, max_error=max_error_px,
    )


@dataclasses.dataclass
class GeneralizedAbsolutePoseOptions:
    """reference: RANSACOptions passed into EstimateGeneralizedAbsolutePose
    (sfm/incremental_mapper.cc:596-600)."""

    max_error_px: float = 12.0
    min_inlier_ratio: float = 0.1
    confidence: float = 0.9999
    min_num_trials: int = 100
    max_num_trials: int = 10000
    batch_size: int = 64


def _normalize_observations(
    points2D: np.ndarray,
    camera_idxs: np.ndarray,
    cameras: Sequence[Camera],
):
    """Undistort pixel observations into per-camera normalized coords."""
    uv = np.zeros_like(np.asarray(points2D, dtype=np.float64))
    focal = np.zeros(len(points2D))
    for ci, cam in enumerate(cameras):
        sel = np.nonzero(camera_idxs == ci)[0]
        if len(sel) == 0:
            continue
        u, _ = camera_models.cam_from_img(
            int(cam.model_id), jnp.asarray(cam.params),
            jnp.asarray(points2D[sel], dtype=floatx()),
        )
        uv[sel] = np.asarray(u)
        focal[sel] = cam.mean_focal_length()
    return uv, focal


def estimate_generalized_absolute_pose(
    points2D: np.ndarray,
    points3D: np.ndarray,
    camera_idxs: np.ndarray,
    cams_from_rig: Sequence[Pose],
    cameras: Sequence[Camera],
    options: Optional[GeneralizedAbsolutePoseOptions] = None,
    seed: int = 0,
    estimate_scale: bool = False,
) -> Tuple[Optional[Pose], np.ndarray, float]:
    """Rig registration from 2D-3D correspondences across rig cameras.

    Returns (rig_from_world | None, inlier_mask, world_scale). When
    ``estimate_scale`` the returned scale s maps world points into the
    rig-metric frame (X_metric = s * X_world); otherwise s == 1.
    reference: estimators/generalized_pose.h:57.
    """
    if options is None:
        options = GeneralizedAbsolutePoseOptions()
    points2D = np.asarray(points2D, dtype=np.float64)
    points3D = np.asarray(points3D, dtype=np.float64)
    camera_idxs = np.asarray(camera_idxs)
    n = len(points2D)
    if n < 6:
        return None, np.zeros(n, dtype=bool), 1.0

    uv, focal = _normalize_observations(points2D, camera_idxs, cameras)
    cam_q = np.stack([cams_from_rig[ci].quat for ci in camera_idxs])
    cam_t = np.stack([cams_from_rig[ci].t for ci in camera_idxs])

    bucket = bucket_size(n, 128)
    ransac_opts = RansacOptions(
        min_inlier_ratio=options.min_inlier_ratio,
        confidence=options.confidence,
        min_num_trials=options.min_num_trials,
        max_num_trials=options.max_num_trials,
        batch_size=options.batch_size,
    )
    res = _gen_abs_ransac(
        jax.random.PRNGKey(seed),
        jnp.asarray(pad_rows(points3D, bucket), dtype=floatx()),
        jnp.asarray(pad_rows(uv, bucket), dtype=floatx()),
        jnp.asarray(pad_rows(cam_q, bucket), dtype=floatx()),
        jnp.asarray(pad_rows(cam_t, bucket), dtype=floatx()),
        jnp.asarray(pad_rows(focal[:, None], bucket)[:, 0], dtype=floatx()),
        jnp.asarray(np.arange(bucket) < n),
        jnp.asarray(float(options.max_error_px)),
        ransac_opts,
        estimate_scale,
    )
    if not bool(res.success):
        return None, np.zeros(n, dtype=bool), 1.0
    model = np.asarray(res.model, dtype=np.float64)
    quat = np.asarray(rot.rotmat_to_quat(jnp.asarray(model[:, :3])))
    scale = float(model[0, 4])
    return Pose(quat, model[:, 3]), np.asarray(res.inlier_mask)[:n], scale


# ---------------------------------------------------------------------------
# Generalized pose refinement (LM on the 6-DoF rig tangent)


def refine_generalized_absolute_pose(
    rig_from_world: Pose,
    points2D: np.ndarray,
    points3D: np.ndarray,
    camera_idxs: np.ndarray,
    cams_from_rig: Sequence[Pose],
    cameras: Sequence[Camera],
    inlier_mask: Optional[np.ndarray] = None,
    num_iterations: int = 30,
    loss_scale_px: float = 1.0,
) -> Tuple[Pose, bool]:
    """Robust LM refinement of rig_from_world over reprojection errors.

    reference: RefineGeneralizedAbsolutePose (estimators/generalized_pose.cc,
    a Ceres problem over the rig pose with rig-aware reprojection factors).
    """
    points2D = np.asarray(points2D, dtype=np.float64)
    points3D = np.asarray(points3D, dtype=np.float64)
    camera_idxs = np.asarray(camera_idxs)
    if inlier_mask is None:
        inlier_mask = np.ones(len(points2D), dtype=bool)
    uv, focal = _normalize_observations(points2D, camera_idxs, cameras)
    cam_q = jnp.asarray(np.stack([cams_from_rig[ci].quat for ci in camera_idxs]),
                        dtype=jnp.float64)
    cam_t = jnp.asarray(np.stack([cams_from_rig[ci].t for ci in camera_idxs]),
                        dtype=jnp.float64)
    X = jnp.asarray(points3D, dtype=jnp.float64)
    obs = jnp.asarray(uv, dtype=jnp.float64)
    f = jnp.asarray(focal, dtype=jnp.float64)
    w_in = jnp.asarray(inlier_mask, dtype=jnp.float64)
    q0 = jnp.asarray(rig_from_world.quat, dtype=jnp.float64)
    t0 = jnp.asarray(rig_from_world.t, dtype=jnp.float64)

    def residuals(delta, q_base, t_base):
        dq = jnp.concatenate([jnp.ones(1, dtype=delta.dtype), 0.5 * delta[:3]])
        dq = dq / jnp.linalg.norm(dq)
        q = rot.quat_multiply(dq, q_base)
        t = t_base + delta[3:]
        Xr = jax.vmap(rot.quat_rotate, in_axes=(None, 0))(q, X) + t
        Xc = jax.vmap(rot.quat_rotate)(cam_q, Xr) + cam_t
        z = jnp.maximum(Xc[:, 2], 1e-8)
        proj = Xc[:, :2] / z[:, None]
        return ((proj - obs) * f[:, None]).reshape(-1)

    def robust_weights(r):
        # Cauchy weights on the per-observation error norm.
        e2 = jnp.sum(r.reshape(-1, 2) ** 2, axis=1)
        w = 1.0 / (1.0 + e2 / (loss_scale_px**2))
        return jnp.repeat(jnp.sqrt(w) * jnp.sqrt(w_in), 2)

    q, t = q0, t0
    lam = 1e-4
    prev_cost = None
    for _ in range(num_iterations):
        delta0 = jnp.zeros(6, dtype=jnp.float64)
        r = residuals(delta0, q, t)
        J = jax.jacfwd(residuals)(delta0, q, t)
        wts = robust_weights(r)
        Jw = J * wts[:, None]
        rw = r * wts
        cost = float(jnp.sum(rw**2))
        H = Jw.T @ Jw
        g = Jw.T @ rw
        step = jnp.linalg.solve(H + lam * jnp.diag(jnp.diag(H) + 1e-12), -g)
        r_new = residuals(step, q, t)
        new_cost = float(jnp.sum((r_new * robust_weights(r_new)) ** 2))
        if new_cost < cost:
            dq = jnp.concatenate([jnp.ones(1, dtype=step.dtype), 0.5 * step[:3]])
            dq = dq / jnp.linalg.norm(dq)
            q = rot.quat_multiply(dq, q)
            t = t + step[3:]
            lam = max(lam * 0.3, 1e-10)
            if prev_cost is not None and abs(prev_cost - new_cost) < 1e-12 * max(
                prev_cost, 1.0
            ):
                break
            prev_cost = new_cost
        else:
            lam = min(lam * 10.0, 1e8)
    ok = np.all(np.isfinite(np.asarray(q))) and np.all(np.isfinite(np.asarray(t)))
    return Pose(np.asarray(q), np.asarray(t)), bool(ok)


# ---------------------------------------------------------------------------
# Generalized relative pose (17-point linear on the GEC)


def g17_relative_pose(q1, m1, q2, m2):
    """Linear generalized relative pose from 17+ Plucker ray pairs.

    Generalized epipolar constraint (Li & Hartley):
        q2' E q1 + q2' R m1 + m2' R q1 = 0,  E = [t]x R,
    with rays (direction q, moment m = c x q) in their rig frames. Solves
    the 18-unknown homogeneous system, projects the R block to SO(3), and
    recovers metric t from E R'.

    Returns (3, 4) rig2_from_rig1. vmap for batches.
    """
    dtype = q1.dtype
    # Coefficients: vec_row(E) gets q2_i q1_j; vec_row(R) gets
    # q2_i m1_j + m2_i q1_j.
    cE = jnp.einsum("ni,nj->nij", q2, q1).reshape(-1, 9)
    cR = (
        jnp.einsum("ni,nj->nij", q2, m1) + jnp.einsum("ni,nj->nij", m2, q1)
    ).reshape(-1, 9)
    A = jnp.concatenate([cE, cR], axis=1)  # (n, 18)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    u = vecs[:, 0]
    E_raw = u[:9].reshape(3, 3)
    R_raw = u[9:].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(R_raw)
    det_sign = jnp.sign(jnp.linalg.det(U @ Vt))
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=dtype).at[2].set(det_sign))
    R = U @ S @ Vt
    # Global scale of the nullspace vector: the R block has |s| = lam each.
    lam = jnp.mean(s) * det_sign  # signed scale so R_raw ~ lam * R
    E = E_raw / jnp.where(jnp.abs(lam) < 1e-12, 1.0, lam)
    T = E @ R.T  # should be [t]x
    t = 0.5 * jnp.stack(
        [T[2, 1] - T[1, 2], T[0, 2] - T[2, 0], T[1, 0] - T[0, 1]]
    )
    return jnp.concatenate([R, t[:, None]], axis=1)


def _plucker_rays(uv, cam_q, cam_t):
    """Normalized observations + cam_from_rig -> Plucker rays in rig frame."""
    bearings = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=1)
    bearings = bearings / jnp.linalg.norm(bearings, axis=1, keepdims=True)
    q_inv = jax.vmap(rot.quat_conjugate)(cam_q)
    d = jax.vmap(rot.quat_rotate)(q_inv, bearings)
    c = -jax.vmap(rot.quat_rotate)(q_inv, cam_t)
    m = jnp.cross(c, d)
    return d, m, c


@partial(jax.jit, static_argnames=("options",))
def _gen_rel_ransac(
    key, uv1, uv2, q1c, t1c, q2c, t2c, focal, mask, max_error_px, options
):
    d1, m1, c1 = _plucker_rays(uv1, q1c, t1c)
    d2, m2, c2 = _plucker_rays(uv2, q2c, t2c)
    bucket = uv1.shape[0]

    def sample_estimate(idxs):  # (K, 17)
        return jax.vmap(
            lambda s: g17_relative_pose(d1[s], m1[s], d2[s], m2[s])
        )(idxs)

    def residual(models):
        # Generalized Sampson error per correspondence: build the relative
        # pose between the two *observing cameras* and evaluate the
        # classical Sampson distance on normalized coordinates.
        R = models[:, :, :3]
        t = models[:, :, 3]

        def per_model(Rm, tm):
            # cam2_from_cam1 = cam2_from_rig2 * rig2_from_rig1 * rig1_from_cam1
            R2 = jax.vmap(rot.quat_to_rotmat)(q2c)
            R1 = jax.vmap(rot.quat_to_rotmat)(q1c)
            R_rel = jnp.einsum("nab,bc,ndc->nad", R2, Rm, R1)
            # t_rel = R2 (Rm (-R1^T t1) + tm) + t2
            c1_in_rig = -jnp.einsum("nba,nb->na", R1, t1c)
            t_rel = (
                jnp.einsum("nab,nb->na",
                           R2, jnp.einsum("ab,nb->na", Rm, c1_in_rig) + tm)
                + t2c
            )
            E = jax.vmap(
                lambda tt, RR: cross_product_matrix(tt) @ RR
            )(t_rel, R_rel)
            x1h = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=1)
            x2h = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], axis=1)
            Ex1 = jnp.einsum("nij,nj->ni", E, x1h)
            Etx2 = jnp.einsum("nji,nj->ni", E, x2h)
            num = jnp.sum(x2h * Ex1, axis=1) ** 2
            den = (
                Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2
                + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
            )
            return num / jnp.maximum(den, 1e-12) * focal**2

        return jax.vmap(per_model)(R, t)

    def refine(model, weights):
        return _weighted_g17(d1, m1, d2, m2, weights)

    return ransac(
        key, bucket, 17, sample_estimate, residual, options,
        mask=mask, local_refine_fn=refine, max_error=max_error_px,
    )


def _weighted_g17(d1, m1, d2, m2, weights):
    """Weighted least-squares refit of the 17-pt linear system."""
    w = jnp.sqrt(jnp.maximum(weights, 0.0))[:, None]
    cE = jnp.einsum("ni,nj->nij", d2, d1).reshape(-1, 9)
    cR = (
        jnp.einsum("ni,nj->nij", d2, m1) + jnp.einsum("ni,nj->nij", m2, d1)
    ).reshape(-1, 9)
    A = jnp.concatenate([cE, cR], axis=1) * w
    _, vecs = jnp.linalg.eigh(A.T @ A)
    u = vecs[:, 0]
    E_raw = u[:9].reshape(3, 3)
    R_raw = u[9:].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(R_raw)
    det_sign = jnp.sign(jnp.linalg.det(U @ Vt))
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=d1.dtype).at[2].set(det_sign))
    R = U @ S @ Vt
    lam = jnp.mean(s) * det_sign
    E = E_raw / jnp.where(jnp.abs(lam) < 1e-12, 1.0, lam)
    T = E @ R.T
    t = 0.5 * jnp.stack(
        [T[2, 1] - T[1, 2], T[0, 2] - T[2, 0], T[1, 0] - T[0, 1]]
    )
    return jnp.concatenate([R, t[:, None]], axis=1)


@dataclasses.dataclass
class GeneralizedRelativePoseOptions:
    max_error_px: float = 4.0
    min_inlier_ratio: float = 0.25
    confidence: float = 0.999
    min_num_trials: int = 50
    max_num_trials: int = 2000
    batch_size: int = 32


def estimate_generalized_relative_pose(
    points2D1: np.ndarray,
    points2D2: np.ndarray,
    camera_idxs1: np.ndarray,
    camera_idxs2: np.ndarray,
    cams_from_rig: Sequence[Pose],
    cameras: Sequence[Camera],
    options: Optional[GeneralizedRelativePoseOptions] = None,
    seed: int = 0,
) -> Tuple[Optional[Pose], np.ndarray]:
    """rig2_from_rig1 from 2D-2D correspondences between two rig frames.

    reference: estimators/generalized_pose.h EstimateGeneralizedRelativePose.
    Returns (rig2_from_rig1 | None, inlier_mask). Metric scale requires the
    rays to emanate from >= 2 distinct camera centers (non-panoramic).
    """
    if options is None:
        options = GeneralizedRelativePoseOptions()
    n = len(points2D1)
    if n < 17:
        return None, np.zeros(n, dtype=bool)
    points2D1 = np.asarray(points2D1, dtype=np.float64)
    points2D2 = np.asarray(points2D2, dtype=np.float64)
    camera_idxs1 = np.asarray(camera_idxs1)
    camera_idxs2 = np.asarray(camera_idxs2)
    uv1, f1 = _normalize_observations(points2D1, camera_idxs1, cameras)
    uv2, f2 = _normalize_observations(points2D2, camera_idxs2, cameras)
    focal = np.sqrt(f1 * f2)
    q1c = np.stack([cams_from_rig[ci].quat for ci in camera_idxs1])
    t1c = np.stack([cams_from_rig[ci].t for ci in camera_idxs1])
    q2c = np.stack([cams_from_rig[ci].quat for ci in camera_idxs2])
    t2c = np.stack([cams_from_rig[ci].t for ci in camera_idxs2])

    bucket = bucket_size(n, 128)
    ransac_opts = RansacOptions(
        min_inlier_ratio=options.min_inlier_ratio,
        confidence=options.confidence,
        min_num_trials=options.min_num_trials,
        max_num_trials=options.max_num_trials,
        batch_size=options.batch_size,
    )
    pad = lambda a: jnp.asarray(pad_rows(a, bucket), dtype=floatx())
    res = _gen_rel_ransac(
        jax.random.PRNGKey(seed),
        pad(uv1), pad(uv2),
        pad(q1c), pad(t1c), pad(q2c), pad(t2c),
        jnp.asarray(pad_rows(focal[:, None], bucket)[:, 0], dtype=floatx()),
        jnp.asarray(np.arange(bucket) < n),
        jnp.asarray(float(options.max_error_px)),
        ransac_opts,
    )
    if not bool(res.success):
        return None, np.zeros(n, dtype=bool)
    model = np.asarray(res.model, dtype=np.float64)
    quat = np.asarray(rot.rotmat_to_quat(jnp.asarray(model[:, :3])))
    return Pose(quat, model[:, 3]), np.asarray(res.inlier_mask)[:n]


# ---------------------------------------------------------------------------
# Structure-less absolute pose (5+1 resectioning against registered images)


@partial(jax.jit, static_argnames=("options", "num_world_cams"))
def _structure_less_ransac(
    key,
    uv,  # (N, 2) normalized obs in the new camera
    uv_w,  # (N, 2) normalized obs in the world cameras
    cam_idx,  # (N,) world camera index per correspondence
    Rw,  # (C, 3, 3) world cam rotations (cam_from_world)
    tw,  # (C, 3)
    csr_offsets,  # (C+1,) per-camera corr list offsets
    csr_data,  # (N,) corr indices grouped by camera
    cam_probs,  # (C,) sampling probability (0 for cameras with <5 corrs)
    focal,  # (N,) pixel scale
    mask,
    max_error_px,
    options,
    num_world_cams,
):
    """5+1 structure-less resectioning RANSAC.

    Hypothesis: 5 correspondences from one world camera give the essential
    matrix new_cam <- world_cam (Nister), cheirality picks (R, t_dir); one
    correspondence from a different camera resolves the scale s linearly
    from its epipolar constraint. Scored by generalized Sampson error
    against every correspondence's own world camera.
    """
    bucket = uv.shape[0]
    K = options.batch_size
    C = num_world_cams

    def make_hypotheses(key):
        k1, k2, k3 = jax.random.split(key, 3)
        cams = jax.random.categorical(k1, jnp.log(cam_probs + 1e-30), shape=(K,))
        counts = csr_offsets[cams + 1] - csr_offsets[cams]
        r5 = jax.random.randint(k2, (K, 5), 0, 1 << 30) % jnp.maximum(
            counts[:, None], 1
        )
        idx5 = csr_data[csr_offsets[cams][:, None] + r5]  # (K, 5)
        # Scale correspondence: any corr from a different camera.
        r1 = jax.random.randint(k3, (K,), 0, bucket)
        diff = (cam_idx[r1] != cams) & mask[r1]
        return cams, idx5, r1, diff

    def solve_one(cam_c, idx5, idx_s, scale_ok):
        x_w = uv_w[idx5]  # in world camera c
        x_n = uv[idx5]  # in the new camera
        Es = essential_five_point(x_w, x_n)  # (10, 3, 3) E: new <- worldcam

        def pose_of(E):
            R, t, _, n_ok, _ = pose_from_essential_matrix(
                E, x_w, x_n, mask=jnp.ones(5, dtype=bool)
            )
            return R, t, n_ok

        Rs, ts, oks = jax.vmap(pose_of)(Es)
        valid = jnp.isfinite(Es.reshape(10, -1)).all(axis=1) & (oks >= 4)
        # Resolve scale with the extra correspondence for every E candidate.
        Rc = Rw[cam_c]
        tc = tw[cam_c]
        cam_s = cam_idx[idx_s]
        Rs2 = Rw[cam_s]
        ts2 = tw[cam_s]
        x1s = jnp.concatenate([uv_w[idx_s], jnp.ones(1, dtype=uv.dtype)])
        x2s = jnp.concatenate([uv[idx_s], jnp.ones(1, dtype=uv.dtype)])

        def with_scale(R_rel, t_dir):
            # cam_from_world(s) = (R_rel, s t_dir) o (Rc, tc)
            R_new = R_rel @ Rc
            t_base = R_rel @ tc
            # Relative pose new_cam <- world cam s: R_ns = R_new Rs2^T,
            # t_ns(s) = (t_base + s t_dir) - R_ns ts2 = a + s b.
            R_ns = R_new @ Rs2.T
            a = t_base - R_ns @ ts2
            b = t_dir
            # Epipolar: x2s' [t_ns]x R_ns x1s = 0, linear in s.
            Rx1 = R_ns @ x1s
            c0 = jnp.dot(x2s, jnp.cross(a, Rx1))
            c1 = jnp.dot(x2s, jnp.cross(b, Rx1))
            s = -c0 / jnp.where(jnp.abs(c1) < 1e-12, 1e-12, c1)
            t_new = t_base + s * t_dir
            good = (jnp.abs(c1) > 1e-10) & (s > 1e-8)
            return jnp.concatenate([R_new, t_new[:, None]], axis=1), good

        models, good = jax.vmap(with_scale)(Rs, ts)
        ok = valid & good & scale_ok
        return jnp.where(ok[:, None, None], models, jnp.nan)

    def sample_estimate(_idxs_unused, key):
        cams, idx5, r1, diff = make_hypotheses(key)
        models = jax.vmap(solve_one)(cams, idx5, r1, diff)  # (K, 10, 3, 4)
        return models.reshape(K * 10, 3, 4)

    def residual(models):
        R = models[:, :, :3]
        t = models[:, :, 3]

        def per_model(Rm, tm):
            R_rel = jnp.einsum("ab,ncb->nac", Rm, Rw[cam_idx])
            t_rel = tm - jnp.einsum("nab,nb->na", R_rel, tw[cam_idx])
            E = jax.vmap(lambda tt, RR: cross_product_matrix(tt) @ RR)(
                t_rel, R_rel
            )
            x1h = jnp.concatenate([uv_w, jnp.ones_like(uv_w[:, :1])], axis=1)
            x2h = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=1)
            Ex1 = jnp.einsum("nij,nj->ni", E, x1h)
            Etx2 = jnp.einsum("nji,nj->ni", E, x2h)
            num = jnp.sum(x2h * Ex1, axis=1) ** 2
            den = (
                Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2
                + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
            )
            return num / jnp.maximum(den, 1e-12) * focal**2

        return jax.vmap(per_model)(R, t)

    # Custom RANSAC loop (the sampling is structured, so the generic
    # harness' uniform index sampler does not apply).
    max_sq = max_error_px**2

    def score_batch(key):
        models = sample_estimate(None, key)
        res = residual(models)
        inl = (res <= max_sq) & mask[None, :]
        support = jnp.sum(inl, axis=-1)
        model_ok = jnp.isfinite(models.reshape(models.shape[0], -1)).all(axis=1)
        support = jnp.where(model_ok, support, 0)
        best = jnp.argmax(support)
        return models[best], support[best]

    key, sub = jax.random.split(key)
    model0, support0 = score_batch(sub)

    def cond(state):
        key, model, support, trials = state
        ratio = support / jnp.maximum(jnp.sum(mask), 1)
        nom = jnp.log(jnp.maximum(1.0 - options.confidence, 1e-30))
        denom = jnp.log(jnp.maximum(1.0 - ratio**6, 1e-30))
        dyn = jnp.where(denom < -1e-12, 3.0 * nom / denom, jnp.inf)
        return (trials < options.max_num_trials) & (
            (trials < options.min_num_trials) | (trials < dyn)
        )

    def body(state):
        key, model, support, trials = state
        key, sub = jax.random.split(key)
        m, s = score_batch(sub)
        take = s > support
        model = jnp.where(take, m, model)
        support = jnp.maximum(support, s)
        return key, model, support, trials + K

    key, model, support, trials = jax.lax.while_loop(
        cond, body, (key, model0, support0, jnp.asarray(K))
    )
    res = residual(model[None])[0]
    inlier_mask = (res <= max_sq) & mask
    return model, jnp.sum(inlier_mask), inlier_mask


@dataclasses.dataclass(frozen=True)
class StructureLessAbsolutePoseOptions:
    """reference: StructureLessAbsolutePoseEstimationOptions
    (incremental_mapper.cc:763-773) — Sampson scoring, stricter error."""

    max_error_px: float = 6.0
    confidence: float = 0.9999
    min_num_trials: int = 100
    max_num_trials: int = 5000
    batch_size: int = 16


def estimate_structure_less_absolute_pose(
    points2D: np.ndarray,
    world_points2D: np.ndarray,
    world_camera_idxs: np.ndarray,
    world_cams_from_world: Sequence[Pose],
    world_cameras: Sequence[Camera],
    camera: Camera,
    options: Optional[StructureLessAbsolutePoseOptions] = None,
    seed: int = 0,
) -> Tuple[Optional[Pose], np.ndarray]:
    """cam_from_world of a new camera from 2D-2D correspondences to
    registered images (no triangulated structure needed).

    reference: EstimateStructureLessAbsolutePose (Zheng & Wu-style
    structure-less resectioning, estimators/generalized_pose.cc).
    Returns (cam_from_world | None, inlier_mask).
    """
    if options is None:
        options = StructureLessAbsolutePoseOptions()
    n = len(points2D)
    points2D = np.asarray(points2D, dtype=np.float64)
    world_points2D = np.asarray(world_points2D, dtype=np.float64)
    world_camera_idxs = np.asarray(world_camera_idxs)
    C = len(world_cameras)
    if n < 6 or C < 2:
        return None, np.zeros(n, dtype=bool)

    # Normalize new-camera and world observations.
    uv, _ = camera_models.cam_from_img(
        int(camera.model_id), jnp.asarray(camera.params),
        jnp.asarray(points2D, dtype=floatx()),
    )
    uv = np.asarray(uv)
    uv_w, f_w = _normalize_observations(
        world_points2D, world_camera_idxs, world_cameras
    )
    focal = np.sqrt(f_w * camera.mean_focal_length())

    Rw = np.stack([p.rotmat() for p in world_cams_from_world])
    tw = np.stack([p.t for p in world_cams_from_world])

    # CSR of correspondence indices per world camera.
    order = np.argsort(world_camera_idxs, kind="stable")
    counts = np.bincount(world_camera_idxs, minlength=C)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    cam_probs = (counts >= 5).astype(np.float64)
    if cam_probs.sum() == 0:
        return None, np.zeros(n, dtype=bool)
    cam_probs /= cam_probs.sum()

    bucket = bucket_size(n, 128)
    pad_f = lambda a: jnp.asarray(pad_rows(a, bucket), dtype=floatx())
    csr_data = np.zeros(bucket, dtype=np.int32)
    csr_data[: len(order)] = order
    res_model, num_inl, inl = _structure_less_ransac(
        jax.random.PRNGKey(seed),
        pad_f(uv), pad_f(uv_w),
        jnp.asarray(
            np.concatenate([world_camera_idxs,
                            np.zeros(bucket - n, dtype=world_camera_idxs.dtype)])
        ),
        jnp.asarray(Rw, dtype=floatx()), jnp.asarray(tw, dtype=floatx()),
        jnp.asarray(offsets.astype(np.int32)),
        jnp.asarray(csr_data),
        jnp.asarray(cam_probs, dtype=floatx()),
        jnp.asarray(pad_rows(focal[:, None], bucket)[:, 0], dtype=floatx()),
        jnp.asarray(np.arange(bucket) < n),
        jnp.asarray(float(options.max_error_px)),
        options,
        C,
    )
    model = np.asarray(res_model, dtype=np.float64)
    if not np.isfinite(model).all() or int(num_inl) < 6:
        return None, np.zeros(n, dtype=bool)
    quat = np.asarray(rot.rotmat_to_quat(jnp.asarray(model[:, :3])))
    return Pose(quat, model[:, 3]), np.asarray(inl)[:n]
