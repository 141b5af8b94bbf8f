"""Spherical (omnidirectional) two-view geometry on bearing rays.

reference behavior: EstimateSphericalTwoViewGeometry
(src/colmap/estimators/two_view_geometry.cc:394-528) — for a pair where at
least one camera has no pinhole image plane (EQUIRECTANGULAR), the
fundamental matrix is meaningless, so the pair is classified from a
bearing-ray essential matrix and a ray-space homography:
CALIBRATED when the homography's support does not dominate E's, else
PLANAR_OR_PANORAMIC (a 360 camera's common capture mode is pure rotation).
Pose recovery decomposes E over rays, or the ray-space homography through
identity calibration (EstimateTwoViewGeometryPoseFromCamRays, :813-905).

TPU design: both model families run as batched hypothesis-scoring RANSAC
over fixed-size padded ray arrays (colmap_tpu.optim.ransac), scored with
first-order angular errors — the tangent-plane analog of the reference's
tangent Sampson error, with pixel thresholds converted through the
equirectangular focal equivalent width/(2π) (sensor/models.py
mean_focal_length).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators.solvers.epipolar import (
    essential_eight_point_rays,
    essential_five_point_rays,
    homography_ray_dlt,
)
from colmap_tpu.optim.ransac import RansacOptions, ransac
from colmap_tpu.scene.types import (
    Pose,
    TwoViewGeometry,
    TwoViewGeometryConfig,
)
from colmap_tpu.sensor import models as camera_models
from colmap_tpu.utils.dtypes import floatx

SPHERICAL_MODELS = (int(camera_models.CameraModelId.EQUIRECTANGULAR),)


def is_spherical(camera) -> bool:
    """reference: Camera::IsSpherical (no pinhole image plane)."""
    return int(camera.model_id) in SPHERICAL_MODELS


def angular_sampson_error(E, r1, r2):
    """First-order angular epipolar error for unit bearing rays (radians²).

    The constraint c = r2ᵀ E r1 is linearized on the unit sphere: the
    gradient w.r.t. a tangent perturbation of r1 is P1 Eᵀ r2 and of r2 is
    P2 E r1, with P_i = I - r_i r_iᵀ the tangent-plane projectors. The
    Sampson step length c² / (|P1 Eᵀ r2|² + |P2 E r1|²) is the squared
    angular distance to the epipolar constraint — the ray-space analog of
    the reference's tangent Sampson error (estimators/cost_functions/
    sampson_error.h specialized to rays).
    """
    Er1 = jnp.einsum("...ij,...j->...i", E, r1)
    Etr2 = jnp.einsum("...ji,...j->...i", E, r2)
    c = jnp.einsum("...i,...i->...", r2, Er1)
    # Tangent projections: v - (v·r) r.
    t2 = Er1 - jnp.einsum("...i,...i->...", Er1, r2)[..., None] * r2
    t1 = Etr2 - jnp.einsum("...i,...i->...", Etr2, r1)[..., None] * r1
    denom = jnp.sum(t1 * t1, axis=-1) + jnp.sum(t2 * t2, axis=-1)
    return c * c / jnp.maximum(denom, 1e-20)


def homography_ray_angular_error(H, r1, r2):
    """Squared angular distance between H r1 and r2 (radians²), symmetric
    in the transfer direction only through H (one-sided like the
    reference's HomographyMatrixRayEstimator residual)."""
    hr = jnp.einsum("...ij,...j->...i", H, r1)
    hr = hr / jnp.maximum(jnp.linalg.norm(hr, axis=-1), 1e-20)[..., None]
    cos = jnp.clip(jnp.sum(hr * r2, axis=-1), -1.0, 1.0)
    # Small-angle: angle² ≈ 2(1 - cos); exact enough below ~20 deg and
    # monotone everywhere, which is all RANSAC scoring needs.
    return 2.0 * (1.0 - cos)


@partial(jax.jit, static_argnames=("options",))
def _ransac_e_rays(key, r1, r2, mask, max_error, options: RansacOptions):
    n = r1.shape[0]

    def sample_estimate(idxs):
        s1, s2 = r1[idxs], r2[idxs]  # (K, 5, 3)
        Es = jax.vmap(essential_five_point_rays)(s1, s2)
        return Es.reshape(-1, 3, 3)

    def residual(models):
        return angular_sampson_error(models[:, None], r1[None], r2[None])

    def refine(model, weights):
        return essential_eight_point_rays(r1, r2, weights)

    return ransac(key, n, 5, sample_estimate, residual, options, mask, refine,
                  max_error=max_error)


@partial(jax.jit, static_argnames=("options",))
def _ransac_h_rays(key, r1, r2, mask, max_error, options: RansacOptions):
    n = r1.shape[0]

    def sample_estimate(idxs):
        return jax.vmap(homography_ray_dlt)(r1[idxs], r2[idxs])

    def residual(models):
        return homography_ray_angular_error(models[:, None], r1[None], r2[None])

    def refine(model, weights):
        return homography_ray_dlt(r1, r2, weights)

    return ransac(key, n, 4, sample_estimate, residual, options, mask, refine,
                  max_error=max_error)


def pose_from_essential_matrix_rays(E, r1, r2, mask=None):
    """Recover cam2_from_cam1 from E + bearing rays via midpoint
    triangulation cheirality over the four candidates (reference:
    PoseFromEssentialMatrix on rays, geometry/essential_matrix.cc)."""
    from colmap_tpu.geometry.essential import decompose_essential_matrix

    if mask is None:
        mask = jnp.ones(r1.shape[:-1], dtype=bool)
    R1, R2, t = decompose_essential_matrix(E)

    def score(R, tt):
        # Midpoint triangulation in cam1 frame: rays r1 from origin, rays
        # Rᵀ r2 from center -Rᵀ tt.
        r2_in_1 = jnp.einsum("ji,...j->...i", R, r2)
        c2 = -jnp.einsum("ji,j->i", R, tt)
        # Solve per-pair 3x3 nullspace [r1, -r2_in_1, -c2] λ = 0.
        A = jnp.stack(
            [r1, -r2_in_1, -jnp.broadcast_to(c2, r1.shape)], axis=-1
        )
        AtA = jnp.einsum("...ij,...ik->...jk", A, A)
        _, vecs = jnp.linalg.eigh(AtA)
        null = vecs[..., :, 0]
        w = null[..., 2]
        safe_w = jnp.where(jnp.abs(w) > 1e-12, w, 1.0)
        lam = null[..., :2] / safe_w[..., None]
        ok = (
            (jnp.abs(w) > 1e-12)
            & (lam[..., 0] > 1e-12)
            & (lam[..., 1] > 1e-12)
            & mask
        )
        X = 0.5 * (
            lam[..., :1] * r1 + c2 + lam[..., 1:2] * r2_in_1
        )
        return jnp.sum(ok), X, ok

    cands = [(R1, t), (R2, t), (R1, -t), (R2, -t)]
    counts, Xs, oks = [], [], []
    for R, tt in cands:
        c, X, ok = score(R, tt)
        counts.append(c)
        Xs.append(X)
        oks.append(ok)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    Rb = jnp.stack([c[0] for c in cands])[best]
    tb = jnp.stack([c[1] for c in cands])[best]
    return Rb, tb, jnp.stack(Xs)[best], counts[best], jnp.stack(oks)[best]


def estimate_spherical_two_view_geometry(
    camera1, points1, camera2, points2, matches, options, seed: int = 0
) -> TwoViewGeometry:
    """Bearing-ray two-view estimation for spherical pairs.

    reference: EstimateSphericalTwoViewGeometry
    (two_view_geometry.cc:394-528).
    """
    from colmap_tpu.utils.bucketing import bucket_size, pad_rows

    g = TwoViewGeometry()
    matches = np.asarray(matches)
    if len(matches) < options.min_num_inliers:
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g

    n_matches = len(matches)
    bucket = bucket_size(n_matches, 256)
    x1 = jnp.asarray(
        pad_rows(np.asarray(points1)[matches[:, 0]], bucket), dtype=floatx()
    )
    x2 = jnp.asarray(
        pad_rows(np.asarray(points2)[matches[:, 1]], bucket), dtype=floatx()
    )
    r1, _ = camera_models.cam_ray_from_img(
        camera1.model_id, jnp.asarray(camera1.params, dtype=floatx()), x1
    )
    r2, _ = camera_models.cam_ray_from_img(
        camera2.model_id, jnp.asarray(camera2.params, dtype=floatx()), x2
    )
    r1 = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-12)
    r2 = r2 / jnp.maximum(jnp.linalg.norm(r2, axis=-1, keepdims=True), 1e-12)
    mask = jnp.asarray(np.arange(bucket) < n_matches)

    # Pixel threshold -> angular threshold via each camera's focal
    # equivalent (width/(2π) for equirectangular).
    thresh = 0.5 * (
        camera1.cam_from_img_threshold(options.ransac.max_error)
        + camera2.cam_from_img_threshold(options.ransac.max_error)
    )
    key = jax.random.PRNGKey(seed)
    ke, kh = jax.random.split(key)
    res_e = _ransac_e_rays(
        ke, r1, r2, mask, jnp.asarray(float(thresh)), options.ransac
    )
    res_h = _ransac_h_rays(
        kh, r1, r2, mask, jnp.asarray(float(thresh)), options.ransac
    )
    num_e = int(res_e.num_inliers)
    num_h = int(res_h.num_inliers)

    if num_e < options.min_num_inliers and num_h < options.min_num_inliers:
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g

    best_mask, best_num = res_e.inlier_mask, num_e
    if (
        num_e >= options.min_num_inliers
        and num_h <= options.max_H_inlier_ratio * max(num_e, 1)
    ):
        g.config = int(TwoViewGeometryConfig.CALIBRATED)
        g.E = np.asarray(res_e.model)
    else:
        g.config = int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
        g.H = np.asarray(res_h.model)
        if num_h > best_num:
            best_mask, best_num = res_h.inlier_mask, num_h
        if res_e is not None:
            g.E = np.asarray(res_e.model)

    if options.min_inlier_ratio > 0 and (
        best_num < options.min_inlier_ratio * n_matches
    ):
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g

    g.inlier_matches = (
        np.asarray(matches)[np.asarray(best_mask)[:n_matches]].astype(np.uint32)
    )

    if options.compute_relative_pose:
        recover_spherical_pose(g, camera1, points1, camera2, points2)
    return g


def recover_spherical_pose(g, camera1, points1, camera2, points2):
    """Pose recovery over bearing rays.

    reference: EstimateTwoViewGeometryPoseFromCamRays — E decomposition for
    CALIBRATED, ray-space homography through identity K for the
    planar/panoramic branch (two_view_geometry.cc:813-905)."""
    from colmap_tpu.geometry import rotation as rot
    from colmap_tpu.geometry.homography import pose_from_homography_matrix
    from colmap_tpu.geometry.triangulation import triangulation_angle

    if len(g.inlier_matches) < 5:
        return
    x1 = np.asarray(points1)[g.inlier_matches[:, 0]]
    x2 = np.asarray(points2)[g.inlier_matches[:, 1]]
    r1 = np.asarray(
        camera_models.cam_ray_from_img(
            camera1.model_id, jnp.asarray(camera1.params, dtype=floatx()),
            jnp.asarray(x1, dtype=floatx()),
        )[0]
    )
    r2 = np.asarray(
        camera_models.cam_ray_from_img(
            camera2.model_id, jnp.asarray(camera2.params, dtype=floatx()),
            jnp.asarray(x2, dtype=floatx()),
        )[0]
    )
    r1 = r1 / np.maximum(np.linalg.norm(r1, axis=1, keepdims=True), 1e-12)
    r2 = r2 / np.maximum(np.linalg.norm(r2, axis=1, keepdims=True), 1e-12)

    if g.config == int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC):
        eye = np.eye(3)
        R, t, n, X, count = pose_from_homography_matrix(
            np.asarray(g.H), eye, eye, r1, r2
        )
        if np.dot(t, t) < 1e-12:
            g.config = int(TwoViewGeometryConfig.PANORAMIC)
            g.tri_angle = 0.0
        else:
            g.config = int(TwoViewGeometryConfig.PLANAR)
            if count > 0:
                c2 = -R.T @ t
                ang = np.asarray(
                    triangulation_angle(
                        jnp.zeros(3, dtype=floatx()),
                        jnp.asarray(c2, dtype=floatx()),
                        jnp.asarray(X, dtype=floatx()),
                    )
                )
                g.tri_angle = float(np.median(ang)) if len(ang) else 0.0
        quat = np.asarray(rot.rotmat_to_quat(jnp.asarray(R, dtype=floatx())))
        g.cam2_from_cam1 = Pose(quat, np.asarray(t))
        return

    if g.E is None:
        return
    R, t, X, count, ok = pose_from_essential_matrix_rays(
        jnp.asarray(g.E, dtype=floatx()),
        jnp.asarray(r1, dtype=floatx()),
        jnp.asarray(r2, dtype=floatx()),
    )
    quat = np.asarray(rot.rotmat_to_quat(R))
    g.cam2_from_cam1 = Pose(quat, np.asarray(t))
    ok_np = np.asarray(ok)
    if ok_np.any():
        c2 = -np.asarray(R).T @ np.asarray(t)
        ang = np.asarray(
            triangulation_angle(
                jnp.zeros(3, dtype=floatx()),
                jnp.asarray(c2, dtype=floatx()),
                jnp.asarray(X, dtype=floatx()),
            )
        )
        g.tri_angle = float(np.median(ang[ok_np]))
    else:
        g.tri_angle = 0.0
