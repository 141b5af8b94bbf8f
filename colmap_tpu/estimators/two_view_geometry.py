"""Two-view geometric verification as vectorized hypothesis scoring.

reference behavior: src/colmap/estimators/two_view_geometry.{h,cc} — the
calibrated path estimates E + F + H, the uncalibrated path F + H, and a
decision tree on inlier ratios picks the configuration
(CALIBRATED / UNCALIBRATED / PLANAR_OR_PANORAMIC / DEGENERATE, :57-118).
Unlike the reference's per-pair CPU RANSAC loops, every model family here is
the batched hypothesis-scoring RANSAC from colmap_tpu.optim.ransac, so a
single device program verifies one pair; pairs are trivially batchable by
vmapping at a fixed match-count pad.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators.solvers.epipolar import (
    essential_eight_point,
    essential_five_point,
    fundamental_eight_point,
    fundamental_seven_point,
    homography_dlt,
    homography_transfer_error,
)
from colmap_tpu.geometry.essential import (
    pose_from_essential_matrix,
    sampson_error,
    squared_epipolar_line_distance,
)
from colmap_tpu.geometry.triangulation import triangulation_angle
from colmap_tpu.optim.ransac import RansacOptions, ransac
from colmap_tpu.scene.types import (
    Camera,
    Pose,
    TwoViewGeometry,
    TwoViewGeometryConfig,
)
from colmap_tpu.sensor import models as camera_models
from colmap_tpu.utils.dtypes import floatx


@dataclasses.dataclass
class TwoViewGeometryOptions:
    """reference: estimators/two_view_geometry.h:45-131."""

    min_num_inliers: int = 15
    min_inlier_ratio: float = 0.0
    min_E_F_inlier_ratio: float = 0.95
    max_H_inlier_ratio: float = 0.8
    watermark_min_inlier_ratio: float = 0.7
    watermark_border_size: float = 0.1
    detect_watermark: bool = True
    watermark_detection_max_error: float = 4.0
    force_H_use: bool = False
    compute_relative_pose: bool = False
    # Recursively estimate multiple configurations by removing the previous
    # inlier set until no model with enough support remains; if >1 model is
    # found, config becomes MULTIPLE with the union of inliers (reference:
    # two_view_geometry.h:108-117, EstimateMultipleTwoViewGeometries
    # two_view_geometry.cc:339-382).
    multiple_models: bool = False
    # Whether watermark models are dropped during multi-model estimation
    # (reference: two_view_geometry.h:83-84).
    multiple_ignore_watermark: bool = True
    # Drop matches whose two keypoints barely move between the images —
    # useful when a camera rig sees part of its own vehicle
    # (reference: two_view_geometry.h:90-95, FilterStationaryMatches
    # two_view_geometry.cc:1570).
    filter_stationary_matches: bool = False
    stationary_matches_max_error: float = 4.0
    # Dominant-plane-robust F (reference: two_view_geometry.h:103 DEGENSAC,
    # estimators/fundamental_matrix_degensac.*).
    use_degensac: bool = False
    # Focal recovery for uncalibrated pairs: shared focal when both views
    # come from the same camera without a prior, one-sided focal when
    # exactly one side is calibrated, Bougnoux two-focal otherwise
    # (reference: two_view_geometry.cc:560-640 dispatch,
    # solvers/relpose_shared_focal.*, relpose_one_sided_focal.*).
    estimate_focals: bool = True
    ransac: RansacOptions = dataclasses.field(
        default_factory=lambda: RansacOptions(
            max_error=4.0,
            confidence=0.999,
            min_num_trials=100,
            max_num_trials=10000,
            min_inlier_ratio=0.25,
            batch_size=128,
        )
    )


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("options",))
def _ransac_f(key, x1, x2, mask, options: RansacOptions):
    """Fundamental-matrix LO-RANSAC with 7pt minimal + 8pt refit.

    Module-level jit: stable cache key per (shape, options) so the
    incremental pipeline's thousands of verification calls reuse one
    compiled program per shape bucket.
    """
    n = x1.shape[0]

    def sample_estimate(idxs):
        s1, s2 = x1[idxs], x2[idxs]  # (K, 7, 2)
        Fs = jax.vmap(fundamental_seven_point)(s1, s2)  # (K, 3, 3, 3)
        return Fs.reshape(-1, 3, 3)

    def residual(models):
        return squared_epipolar_line_distance(
            models[:, None], x1[None], x2[None]
        )

    def refine(model, weights):
        return fundamental_eight_point(x1, x2, weights)

    return ransac(key, n, 7, sample_estimate, residual, options, mask, refine)


@_partial(jax.jit, static_argnames=("options",))
def _ransac_e(key, x1n, x2n, mask, max_error, options: RansacOptions):
    """Essential-matrix LO-RANSAC (normalized coords): 5-point Nistér
    minimal solver (up to 10 solutions/sample) + weighted 8pt LO refit —
    the reference's LORANSAC<EssentialMatrixFivePointEstimator>
    (estimators/two_view_geometry.cc:569-636).

    max_error is traced so per-camera normalized thresholds share one
    compiled program."""
    n = x1n.shape[0]

    def sample_estimate(idxs):
        s1, s2 = x1n[idxs], x2n[idxs]  # (K, 5, 2)
        Es = jax.vmap(essential_five_point)(s1, s2)  # (K, 10, 3, 3)
        return Es.reshape(-1, 3, 3)

    def residual(models):
        return sampson_error(models[:, None], x1n[None], x2n[None])

    def refine(model, weights):
        return essential_eight_point(x1n, x2n, weights)

    return ransac(key, n, 5, sample_estimate, residual, options, mask, refine,
                  max_error=max_error)


@_partial(jax.jit, static_argnames=("options",))
def _ransac_h(key, x1, x2, mask, options: RansacOptions):
    n = x1.shape[0]

    def sample_estimate(idxs):
        s1, s2 = x1[idxs], x2[idxs]
        return jax.vmap(homography_dlt)(s1, s2)

    def residual(models):
        return homography_transfer_error(models[:, None], x1[None], x2[None])

    def refine(model, weights):
        return homography_dlt(x1, x2, weights)

    return ransac(key, n, 4, sample_estimate, residual, options, mask, refine)


def _detect_watermark(x1, x2, inlier_mask, w1, h1, w2, h2, opt) -> bool:
    """reference behavior: two_view_geometry.cc DetectWatermark (:70-88):
    inliers in the border region moving by a pure translation."""
    inl = np.asarray(inlier_mask)
    if inl.sum() == 0:
        return False
    p1 = np.asarray(x1)[inl]
    p2 = np.asarray(x2)[inl]
    diff = p2 - p1
    med = np.median(diff, axis=0)
    trans_ok = np.sum((diff - med) ** 2, axis=1) <= opt.watermark_detection_max_error**2
    if trans_ok.mean() < opt.watermark_min_inlier_ratio:
        return False
    b1 = opt.watermark_border_size * np.sqrt(w1 * h1)
    b2 = opt.watermark_border_size * np.sqrt(w2 * h2)
    in_border1 = (
        (p1[:, 0] < b1) | (p1[:, 0] > w1 - b1) | (p1[:, 1] < b1) | (p1[:, 1] > h1 - b1)
    )
    in_border2 = (
        (p2[:, 0] < b2) | (p2[:, 0] > w2 - b2) | (p2[:, 1] < b2) | (p2[:, 1] > h2 - b2)
    )
    border_ratio = np.mean(in_border1 & in_border2 & trans_ok)
    return bool(border_ratio > opt.watermark_min_inlier_ratio)


def estimate_two_view_geometry(
    camera1: Camera,
    points1: np.ndarray,
    camera2: Camera,
    points2: np.ndarray,
    matches: np.ndarray,
    options: Optional[TwoViewGeometryOptions] = None,
    seed: int = 0,
) -> TwoViewGeometry:
    """Estimate and classify the two-view geometry of a matched image pair.

    Args:
        points1/points2: (N1, 2), (N2, 2) keypoint coordinates.
        matches: (M, 2) uint32 index pairs into points1/points2.
    """
    if options is None:
        options = TwoViewGeometryOptions()
    matches = np.asarray(matches)
    if options.filter_stationary_matches and len(matches) > 0:
        # reference: FilterStationaryMatches (two_view_geometry.cc:1570) —
        # drop matches that move less than the threshold.
        disp = (
            np.asarray(points1)[matches[:, 0]]
            - np.asarray(points2)[matches[:, 1]]
        )
        moving = np.sum(disp * disp, axis=1) > (
            options.stationary_matches_max_error**2
        )
        matches = matches[moving]
    if options.multiple_models:
        sub = dataclasses.replace(
            options, multiple_models=False, filter_stationary_matches=False
        )
        return estimate_multiple_two_view_geometries(
            camera1, points1, camera2, points2, matches, sub, seed=seed
        )
    from colmap_tpu.estimators.spherical import (
        estimate_spherical_two_view_geometry,
        is_spherical,
    )

    if is_spherical(camera1) or is_spherical(camera2):
        # Omnidirectional pairs have no meaningful F/H in image space —
        # classify via bearing-ray E + ray-space H (reference:
        # EstimateSphericalTwoViewGeometry, two_view_geometry.cc:394-528).
        return estimate_spherical_two_view_geometry(
            camera1, points1, camera2, points2, matches, options, seed=seed
        )

    g = TwoViewGeometry()
    if len(matches) < options.min_num_inliers:
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g

    from colmap_tpu.utils.bucketing import bucket_size, pad_rows

    n_matches = len(matches)
    bucket = bucket_size(n_matches, 256)
    x1 = jnp.asarray(
        pad_rows(np.asarray(points1)[matches[:, 0]], bucket), dtype=floatx()
    )
    x2 = jnp.asarray(
        pad_rows(np.asarray(points2)[matches[:, 1]], bucket), dtype=floatx()
    )
    mask = jnp.asarray(np.arange(bucket) < n_matches)
    key = jax.random.PRNGKey(seed)
    kf, ke, kh = jax.random.split(key, 3)

    calibrated = camera1.has_prior_focal_length and camera2.has_prior_focal_length

    # F and H always; E when calibrated.
    res_f = _ransac_f(kf, x1, x2, mask, options.ransac)
    res_h = _ransac_h(kh, x1, x2, mask, options.ransac)

    res_e = None
    if calibrated:
        x1n, _ = camera_models.cam_from_img(camera1.model_id, jnp.asarray(camera1.params), x1)
        x2n, _ = camera_models.cam_from_img(camera2.model_id, jnp.asarray(camera2.params), x2)
        # Normalized-space threshold.
        thresh_n = 0.5 * (
            camera1.cam_from_img_threshold(options.ransac.max_error)
            + camera2.cam_from_img_threshold(options.ransac.max_error)
        )
        res_e = _ransac_e(
            ke, x1n, x2n, mask, jnp.asarray(float(thresh_n)), options.ransac
        )

    num_f = int(res_f.num_inliers)
    num_h = int(res_h.num_inliers)
    num_e = int(res_e.num_inliers) if res_e is not None else 0

    if options.use_degensac and num_f >= options.min_num_inliers:
        # H-degeneracy test on the F support; recover via plane-and-parallax.
        from colmap_tpu.estimators.degensac import (
            degensac_recover_f,
            is_h_degenerate,
        )

        num_fh = int(jnp.sum(res_f.inlier_mask & res_h.inlier_mask))
        if bool(is_h_degenerate(num_f, num_fh)):
            kd = jax.random.fold_in(key, 3)
            F_rec, n_rec, inl_rec, recovered = degensac_recover_f(
                kd, x1, x2, mask, res_f.model, res_f.inlier_mask,
                res_h.model, res_h.inlier_mask, options.ransac,
            )
            if bool(recovered):
                res_f = res_f._replace(
                    model=F_rec, num_inliers=n_rec, inlier_mask=inl_rec
                )
                num_f = int(n_rec)

    if options.force_H_use:
        best_mask, best_num = res_h.inlier_mask, num_h
        g.config = int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
        g.H = np.asarray(res_h.model)
    elif (
        calibrated
        and num_e >= options.min_num_inliers
        and num_e > options.min_E_F_inlier_ratio * num_f
    ):
        # Calibrated configuration; E is trusted.
        best_mask, best_num = res_e.inlier_mask, num_e
        g.config = int(TwoViewGeometryConfig.CALIBRATED)
        g.E = np.asarray(res_e.model)
        g.F = np.asarray(fundamental_eight_point(x1, x2, res_e.inlier_mask.astype(x1.dtype)))
        if num_h > options.max_H_inlier_ratio * num_e:
            g.config = int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
            g.H = np.asarray(res_h.model)
    elif num_f >= options.min_num_inliers:
        best_mask, best_num = res_f.inlier_mask, num_f
        g.config = int(TwoViewGeometryConfig.UNCALIBRATED)
        g.F = np.asarray(res_f.model)
        if num_h > options.max_H_inlier_ratio * num_f:
            g.config = int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
            g.H = np.asarray(res_h.model)
        elif options.estimate_focals:
            _estimate_uncalibrated_focals(g, camera1, camera2)
    elif num_h >= options.min_num_inliers:
        best_mask, best_num = res_h.inlier_mask, num_h
        g.config = int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
        g.H = np.asarray(res_h.model)
    else:
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g

    if best_num < options.min_num_inliers or (
        options.min_inlier_ratio > 0
        and best_num < options.min_inlier_ratio * len(matches)
    ):
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g

    if options.detect_watermark and _detect_watermark(
        x1, x2, best_mask,
        camera1.width, camera1.height, camera2.width, camera2.height, options,
    ):
        g.config = int(TwoViewGeometryConfig.WATERMARK)

    g.inlier_matches = (
        np.asarray(matches)[np.asarray(best_mask)[:n_matches]].astype(np.uint32)
    )

    if options.compute_relative_pose and g.config in (
        int(TwoViewGeometryConfig.CALIBRATED),
        int(TwoViewGeometryConfig.UNCALIBRATED),
        int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC),
    ):
        _recover_pose(g, camera1, points1, camera2, points2)

    return g


def two_view_geometry_from_known_relative_pose(
    camera1: Camera,
    points1: np.ndarray,
    camera2: Camera,
    points2: np.ndarray,
    cam2_from_cam1: Pose,
    matches: np.ndarray,
    min_num_inliers: int = 15,
    max_error: float = 4.0,
) -> TwoViewGeometry:
    """Classify matches against a known relative pose (no estimation).

    reference behavior: TwoViewGeometryFromKnownRelativePose
    (two_view_geometry.cc:1586-1641) — build E from the pose, keep matches
    whose first-order epipolar error is within max_error (pixels, converted
    through the camera focals like the rest of this module), config
    CALIBRATED when enough survive.
    """
    from colmap_tpu.geometry.essential import essential_from_pose
    from colmap_tpu.geometry.rigid3 import Rigid3

    g = TwoViewGeometry()
    matches = np.asarray(matches)
    if len(matches) < min_num_inliers:
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g
    x1 = np.asarray(points1)[matches[:, 0]]
    x2 = np.asarray(points2)[matches[:, 1]]
    x1n, _ = camera_models.cam_from_img(
        camera1.model_id, jnp.asarray(camera1.params, dtype=floatx()),
        jnp.asarray(x1, dtype=floatx()),
    )
    x2n, _ = camera_models.cam_from_img(
        camera2.model_id, jnp.asarray(camera2.params, dtype=floatx()),
        jnp.asarray(x2, dtype=floatx()),
    )
    E = essential_from_pose(
        Rigid3(
            quat=jnp.asarray(cam2_from_cam1.quat, dtype=floatx()),
            t=jnp.asarray(cam2_from_cam1.t, dtype=floatx()),
        )
    )
    err = np.asarray(sampson_error(E, x1n, x2n))
    thresh = 0.5 * (
        camera1.cam_from_img_threshold(max_error)
        + camera2.cam_from_img_threshold(max_error)
    )
    inl = err <= thresh * thresh
    if int(inl.sum()) < min_num_inliers:
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g
    g.config = int(TwoViewGeometryConfig.CALIBRATED)
    g.E = np.asarray(E)
    g.cam2_from_cam1 = cam2_from_cam1
    g.inlier_matches = matches[inl].astype(np.uint32)
    return g


def extract_outlier_matches(matches: np.ndarray, inlier_matches: np.ndarray) -> np.ndarray:
    """Matches not present in inlier_matches (reference:
    ExtractOutlierMatches, two_view_geometry.cc:157)."""
    matches = np.asarray(matches)
    if len(inlier_matches) == 0:
        return matches
    inl = {(int(a), int(b)) for a, b in np.asarray(inlier_matches)}
    keep = np.fromiter(
        ((int(a), int(b)) not in inl for a, b in matches),
        dtype=bool,
        count=len(matches),
    )
    return matches[keep]


def estimate_multiple_two_view_geometries(
    camera1: Camera,
    points1: np.ndarray,
    camera2: Camera,
    points2: np.ndarray,
    matches: np.ndarray,
    options: TwoViewGeometryOptions,
    seed: int = 0,
) -> TwoViewGeometry:
    """Recursive multi-model two-view estimation for scenes with several
    rigidly moving objects or strong distortion.

    reference behavior: EstimateMultipleTwoViewGeometries
    (two_view_geometry.cc:339-382) — estimate a geometry, remove its
    inliers, repeat until DEGENERATE; one surviving model keeps its own
    config, several are reported as MULTIPLE with the concatenated inlier
    matches (and no single F/E/H, matching the reference which leaves the
    models of a MULTIPLE configuration unset).
    """
    remaining = np.asarray(matches)
    geometries = []
    round_idx = 0
    while True:
        g = estimate_two_view_geometry(
            camera1, points1, camera2, points2, remaining, options,
            seed=seed + round_idx,
        )
        round_idx += 1
        if g.config == int(TwoViewGeometryConfig.DEGENERATE):
            break
        remaining = extract_outlier_matches(remaining, g.inlier_matches)
        if options.multiple_ignore_watermark:
            if g.config != int(TwoViewGeometryConfig.WATERMARK):
                geometries.append(g)
        else:
            geometries.append(g)

    if not geometries:
        out = TwoViewGeometry()
        out.config = int(TwoViewGeometryConfig.DEGENERATE)
        return out
    if len(geometries) == 1:
        return geometries[0]
    out = TwoViewGeometry()
    out.config = int(TwoViewGeometryConfig.MULTIPLE)
    out.inlier_matches = np.concatenate(
        [g.inlier_matches for g in geometries], axis=0
    ).astype(np.uint32)
    return out


def _recover_pose(g: TwoViewGeometry, camera1, points1, camera2, points2):
    """Decompose E (or F upgraded by intrinsics) into a relative pose.

    reference behavior: EstimateTwoViewGeometryPose (two_view_geometry.cc:929).
    """
    from colmap_tpu.geometry.essential import essential_from_fundamental

    if len(g.inlier_matches) < 8:
        return
    # Use intrinsics recovered by the shared-/one-sided-focal paths when
    # available (reference: EstimateTwoViewGeometryPose consumes
    # geometry.camera1/camera2).
    if g.camera1 is not None:
        camera1 = g.camera1
    if g.camera2 is not None:
        camera2 = g.camera2
    from colmap_tpu.utils.bucketing import bucket_size, pad_rows

    n_inl = len(g.inlier_matches)
    bucket = bucket_size(n_inl, 256)
    # Padding repeats the first inlier: harmless for cheirality voting.
    pad_idx = np.zeros(bucket, dtype=np.int64)
    pad_idx[:n_inl] = np.arange(n_inl)
    x1 = jnp.asarray(
        np.asarray(points1)[g.inlier_matches[pad_idx, 0]], dtype=floatx()
    )
    x2 = jnp.asarray(
        np.asarray(points2)[g.inlier_matches[pad_idx, 1]], dtype=floatx()
    )
    x1n, _ = camera_models.cam_from_img(camera1.model_id, jnp.asarray(camera1.params), x1)
    x2n, _ = camera_models.cam_from_img(camera2.model_id, jnp.asarray(camera2.params), x2)

    if (
        g.config == int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
        and g.H is not None
    ):
        # Homography decomposition resolves PLANAR vs PANORAMIC
        # (reference: EstimateTwoViewGeometryPoseFromCamRays planar branch,
        # two_view_geometry.cc:858-905).
        _recover_pose_planar_or_panoramic(
            g, camera1, camera2, np.asarray(x1n)[:n_inl], np.asarray(x2n)[:n_inl]
        )
        return

    if g.E is not None:
        E = jnp.asarray(g.E)
    else:
        # Upgrade F with the (possibly unreliable) intrinsics.
        from colmap_tpu.scene.synthetic import _calibration_matrix

        K1 = jnp.asarray(_calibration_matrix(camera1))
        K2 = jnp.asarray(_calibration_matrix(camera2))
        E = essential_from_fundamental(K2, jnp.asarray(g.F), K1)
    row_mask = jnp.asarray(np.arange(bucket) < n_inl)
    R, t, points3D, num_valid, ok = pose_from_essential_matrix(
        E, x1n, x2n, mask=row_mask
    )
    from colmap_tpu.geometry import rotation as rot

    quat = np.asarray(rot.rotmat_to_quat(R))
    g.cam2_from_cam1 = Pose(quat, np.asarray(t))
    # Median triangulation angle over valid points.
    c1 = jnp.zeros(3, dtype=x1.dtype)
    c2 = -jnp.einsum("ij,i->j", R, t)
    angles = triangulation_angle(c1, c2, points3D)
    ok_np = np.asarray(ok) & (np.arange(bucket) < n_inl)
    if ok_np.any():
        g.tri_angle = float(np.median(np.asarray(angles)[ok_np]))
    else:
        g.tri_angle = 0.0


def _recover_pose_planar_or_panoramic(g, camera1, camera2, x1n, x2n):
    """Resolve a PLANAR_OR_PANORAMIC pair by decomposing its homography.

    reference behavior: PoseFromHomographyMatrix selection + the
    PLANAR/PANORAMIC split on ||t||² (two_view_geometry.cc:875-905):
    panoramic pairs (pure rotation) get tri_angle = 0; planar pairs keep the
    triangulated points' median angle.
    """
    from colmap_tpu.geometry import rotation as rot
    from colmap_tpu.geometry.homography import pose_from_homography_matrix
    from colmap_tpu.geometry.triangulation import triangulation_angle
    from colmap_tpu.scene.synthetic import _calibration_matrix

    K1 = np.asarray(_calibration_matrix(camera1))
    K2 = np.asarray(_calibration_matrix(camera2))
    rays1 = np.concatenate([x1n, np.ones((len(x1n), 1))], axis=1)
    rays1 /= np.linalg.norm(rays1, axis=1, keepdims=True)
    rays2 = np.concatenate([x2n, np.ones((len(x2n), 1))], axis=1)
    rays2 /= np.linalg.norm(rays2, axis=1, keepdims=True)
    R, t, n, points3D, count = pose_from_homography_matrix(
        np.asarray(g.H), K1, K2, rays1, rays2
    )
    if np.dot(t, t) < 1e-12:
        g.config = int(TwoViewGeometryConfig.PANORAMIC)
        g.tri_angle = 0.0
    else:
        g.config = int(TwoViewGeometryConfig.PLANAR)
        if count == 0:
            return
        c2 = -R.T @ t
        angles = np.asarray(
            triangulation_angle(
                jnp.zeros(3, dtype=floatx()),
                jnp.asarray(c2, dtype=floatx()),
                jnp.asarray(points3D, dtype=floatx()),
            )
        )
        g.tri_angle = float(np.median(angles)) if len(angles) else 0.0
    quat = np.asarray(rot.rotmat_to_quat(jnp.asarray(R, dtype=floatx())))
    g.cam2_from_cam1 = Pose(quat, np.asarray(t))


def _estimate_uncalibrated_focals(g: TwoViewGeometry, camera1, camera2):
    """Recover focal lengths for an UNCALIBRATED pair from its F.

    reference behavior: EstimateSharedFocalTwoViewGeometry /
    EstimateOneSidedFocalTwoViewGeometry (two_view_geometry.cc:1155-1400) —
    the config stays UNCALIBRATED; the estimated intrinsics are exposed via
    geometry.camera1/camera2 and E is filled so pose recovery can proceed
    with the recovered calibration.
    """
    import dataclasses as _dc

    from colmap_tpu.estimators.solvers.focal import (
        one_sided_focal_from_geometry,
        shared_focal_from_fundamental,
        two_focals_from_fundamental,
    )
    from colmap_tpu.scene.synthetic import _calibration_matrix

    F = jnp.asarray(g.F)
    pp1 = camera_models.principal_point_idxs(int(camera1.model_id))
    pp2 = camera_models.principal_point_idxs(int(camera2.model_id))
    c1 = np.asarray([camera1.params[pp1[0]], camera1.params[pp1[1]]])
    c2 = np.asarray([camera2.params[pp2[0]], camera2.params[pp2[1]]])

    def set_focal(cam, focal):
        new = _dc.replace(cam, params=np.asarray(cam.params, dtype=np.float64).copy())
        for i in camera_models.focal_length_idxs(int(cam.model_id)):
            new.params[i] = focal
        new.has_prior_focal_length = False
        return new

    if camera1.has_prior_focal_length == camera2.has_prior_focal_length:
        # Both uncalibrated.
        if camera1.camera_id == camera2.camera_id:
            focal, ok = shared_focal_from_fundamental(F, c1, c2)
            if not ok:
                return
            g.camera1 = set_focal(camera1, focal)
            g.camera2 = g.camera1
        else:
            f1, f2, ok = two_focals_from_fundamental(F, c1, c2)
            if not ok:
                return
            g.camera1 = set_focal(camera1, f1)
            g.camera2 = set_focal(camera2, f2)
    else:
        # Exactly one side calibrated: recover the other side's focal from
        # G = T2^T F K1 (x2_centered^T G x1_ray = 0) via the vectorized
        # essential-ness sweep.
        flipped = camera1.has_prior_focal_length
        cam_known = camera1 if flipped else camera2
        cam_unknown = camera2 if flipped else camera1
        Fd = F if flipped else F.T
        K_known = jnp.asarray(_calibration_matrix(cam_known))
        cu = c2 if flipped else c1
        T = jnp.asarray(
            [[1.0, 0.0, cu[0]], [0.0, 1.0, cu[1]], [0.0, 0.0, 1.0]]
        )
        G = T.T @ Fd @ K_known
        max_dim = float(max(cam_unknown.width, cam_unknown.height))
        focal, score = one_sided_focal_from_geometry(
            G, 0.1 * max_dim, 10.0 * max_dim
        )
        if not np.isfinite(focal) or score > 0.05:
            return
        est_unknown = set_focal(cam_unknown, focal)
        if flipped:
            g.camera1, g.camera2 = camera1, est_unknown
        else:
            g.camera1, g.camera2 = est_unknown, camera2

    # Fill E from the recovered calibration (reference: :97-101).
    from colmap_tpu.geometry.essential import essential_from_fundamental

    K1 = jnp.asarray(_calibration_matrix(g.camera1))
    K2 = jnp.asarray(_calibration_matrix(g.camera2))
    g.E = np.asarray(K2.T @ F @ K1)
