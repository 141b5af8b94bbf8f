"""Absolute pose estimation and refinement.

reference behavior: src/colmap/estimators/pose.h:47-148 —
EstimateAbsolutePose (LO-RANSAC over P3P with optional focal-length search)
and RefineAbsolutePose (Ceres small problem → here a vmapped LM using the
shared BA machinery on a single-pose problem).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.estimators.solvers.p3p import kabsch, p3p
from colmap_tpu.geometry import rotation as rot
from colmap_tpu.optim.ransac import RansacOptions, ransac
from colmap_tpu.scene.types import Camera, Pose
from colmap_tpu.sensor import models as camera_models
from colmap_tpu.utils.dtypes import floatx


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("options",))
def _p3p_ransac(key, X, rays, uv, mask, max_error, options):
    """Module-level jitted P3P LO-RANSAC (stable compile cache per shape).

    X/rays/uv: (N, 3/3/2) padded arrays; max_error traced (normalized units).
    """
    bucket = X.shape[0]

    def sample_estimate_packed(idxs):
        Rs, ts = jax.vmap(p3p)(X[idxs], rays[idxs])
        M = Rs.reshape(-1, 3, 3)
        T = ts.reshape(-1, 3)
        return jnp.concatenate([M, T[:, :, None]], axis=-1)

    def residual(models):
        R = models[..., :3]
        t = models[..., 3]
        Xc = jnp.einsum("mij,nj->mni", R, X) + t[:, None, :]
        z = Xc[..., 2]
        behind = z < 1e-8
        safe_z = jnp.where(behind, 1.0, z)
        proj = Xc[..., :2] / safe_z[..., None]
        err = jnp.sum((proj - uv[None]) ** 2, axis=-1)
        return jnp.where(behind, jnp.inf, err)

    def refine(model, weights):
        # Weighted EPnP-lite: Kabsch on back-projected points at current
        # depths (cheap LO step).
        R = model[..., :3]
        t = model[..., 3]
        Xc = jnp.einsum("ij,nj->ni", R, X) + t
        depth = jnp.maximum(Xc[..., 2], 1e-6)
        ray_full = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
        target = ray_full * depth[..., None]
        R_new, t_new = kabsch(X, target, weights)
        return jnp.concatenate([R_new, t_new[:, None]], axis=-1)

    return ransac(
        key, bucket, 3, sample_estimate_packed, residual, options,
        mask=mask, local_refine_fn=refine, max_error=max_error,
    )


@dataclasses.dataclass
class AbsolutePoseOptions:
    """reference: estimators/pose.h:47-76 (AbsolutePoseEstimationOptions)."""

    max_error_px: float = 12.0
    min_inlier_ratio: float = 0.1
    confidence: float = 0.9999
    min_num_trials: int = 100
    max_num_trials: int = 10000
    batch_size: int = 64
    estimate_focal_length: bool = False
    # Focal search grid (reference: kFocalLengthRatios in pose.cc).
    num_focal_samples: int = 30
    min_focal_ratio: float = 0.2
    max_focal_ratio: float = 5.0


def estimate_absolute_pose(
    camera: Camera,
    points2D: np.ndarray,
    points3D: np.ndarray,
    options: Optional[AbsolutePoseOptions] = None,
    seed: int = 0,
) -> Tuple[Optional[Pose], np.ndarray, Optional[float]]:
    """LO-RANSAC P3P absolute pose from 2D-3D correspondences.

    Returns (cam_from_world | None, inlier_mask, focal_scale | None).
    """
    if options is None:
        options = AbsolutePoseOptions()
    n = len(points2D)
    if n < 4:
        return None, np.zeros(n, dtype=bool), None

    from colmap_tpu.utils.bucketing import bucket_size, pad_rows

    bucket = bucket_size(n, 128)
    xy = jnp.asarray(pad_rows(np.asarray(points2D), bucket), dtype=floatx())
    X = jnp.asarray(pad_rows(np.asarray(points3D), bucket), dtype=floatx())
    row_valid = jnp.asarray(np.arange(bucket) < n)
    params = jnp.asarray(camera.params)
    model_id = int(camera.model_id)

    # Normalized bearings once; the P3P estimator consumes rays and the
    # residual reprojects through the true camera model.
    rays, rays_valid = camera_models.cam_ray_from_img(model_id, params, xy)
    rays_valid = rays_valid & row_valid

    # Threshold in normalized units (angle-ish): convert px -> normalized.
    thresh_n = camera.cam_from_img_threshold(options.max_error_px)
    uv, _ = camera_models.cam_from_img(model_id, params, xy)

    opts = RansacOptions(
        min_inlier_ratio=options.min_inlier_ratio,
        confidence=options.confidence,
        min_num_trials=options.min_num_trials,
        max_num_trials=options.max_num_trials,
        batch_size=options.batch_size,
    )
    res = _p3p_ransac(
        jax.random.PRNGKey(seed), X, rays, uv, rays_valid,
        jnp.asarray(float(thresh_n)), opts,
    )
    if not bool(res.success):
        return None, np.zeros(n, dtype=bool), None
    model = np.asarray(res.model)
    R, t = model[:, :3], model[:, 3]
    quat = np.asarray(rot.rotmat_to_quat(jnp.asarray(R)))
    return Pose(quat, t), np.asarray(res.inlier_mask)[:n], None


@dataclasses.dataclass
class RefinePoseOptions:
    max_iterations: int = 30
    loss: str = "cauchy"
    loss_scale: float = 1.0
    refine_focal_length: bool = False
    refine_extra_params: bool = False


def refine_absolute_pose(
    camera: Camera,
    cam_from_world: Pose,
    points2D: np.ndarray,
    points3D: np.ndarray,
    inlier_mask: Optional[np.ndarray] = None,
    options: Optional[RefinePoseOptions] = None,
) -> Tuple[Pose, Camera, bool]:
    """LM refinement of a single pose (and optionally intrinsics) over its
    2D-3D inliers, reusing the BA core with constant points.

    reference behavior: RefineAbsolutePose (estimators/pose.cc).
    """
    if options is None:
        options = RefinePoseOptions()
    n = len(points2D)
    if inlier_mask is None:
        inlier_mask = np.ones(n, dtype=bool)
    from colmap_tpu.utils.bucketing import bucket_size, pad_rows

    bucket = bucket_size(n, 128)
    w = pad_rows(inlier_mask.astype(np.float64), bucket)

    problem = ba.BAProblem(
        quat=jnp.asarray(cam_from_world.quat, dtype=floatx())[None],
        t=jnp.asarray(cam_from_world.t, dtype=floatx())[None],
        cam_params=jnp.asarray(camera.params, dtype=floatx())[None],
        points=jnp.asarray(pad_rows(np.asarray(points3D), bucket), dtype=floatx()),
        obs_frame=jnp.zeros(bucket, dtype=jnp.int32),
        obs_cam=jnp.zeros(bucket, dtype=jnp.int32),
        obs_point=jnp.arange(bucket, dtype=jnp.int32),
        obs_xy=jnp.asarray(pad_rows(np.asarray(points2D), bucket), dtype=floatx()),
        obs_w=jnp.asarray(w),
    )
    ba_options = ba.BAOptions(
        max_iterations=options.max_iterations,
        pcg_iterations=12,
        loss=options.loss,
        loss_scale=options.loss_scale,
        refine_focal_length=options.refine_focal_length,
        refine_principal_point=False,
        refine_extra_params=options.refine_extra_params,
        refine_points=False,
    )
    model_id = int(camera.model_id)
    masks = ba.default_masks(problem, model_id, ba_options)
    solved, summary = ba.solve(problem, model_id, ba_options, masks)
    ok = summary["final_cost"] <= summary["initial_cost"]
    new_pose = Pose(
        np.asarray(solved.quat[0], dtype=np.float64),
        np.asarray(solved.t[0], dtype=np.float64),
    ).normalize()
    new_camera = camera
    if options.refine_focal_length or options.refine_extra_params:
        new_camera = dataclasses.replace(
            camera, params=np.asarray(solved.cam_params[0][: len(camera.params)])
        )
    return new_pose, new_camera, ok
