"""Tests for the vectorized RANSAC harness and two-view verification.

reference test strategy: optim/ransac_test.cc, estimators/two_view_geometry
usage in controllers/feature_matching tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators.two_view_geometry import (
    TwoViewGeometryOptions,
    estimate_two_view_geometry,
)
from colmap_tpu.optim.ransac import RansacOptions, ransac
from colmap_tpu.scene.types import Camera, TwoViewGeometryConfig
from colmap_tpu.estimators.solvers.epipolar import (
    homography_dlt,
    homography_transfer_error,
)


def test_ransac_homography_with_outliers():
    rng = np.random.default_rng(0)
    H_gt = np.array([[1.2, 0.1, 10.0], [-0.05, 0.9, -5.0], [1e-4, 2e-4, 1.0]])
    n_in, n_out = 120, 80
    x1_in = rng.uniform(0, 800, (n_in, 2))
    p1 = np.concatenate([x1_in, np.ones((n_in, 1))], axis=1) @ H_gt.T
    x2_in = p1[:, :2] / p1[:, 2:]
    x1_out = rng.uniform(0, 800, (n_out, 2))
    x2_out = rng.uniform(0, 800, (n_out, 2))
    x1 = jnp.asarray(np.concatenate([x1_in, x1_out]))
    x2 = jnp.asarray(np.concatenate([x2_in, x2_out]))

    def sample_estimate(idxs):
        return jax.vmap(homography_dlt)(x1[idxs], x2[idxs])

    def residual(models):
        return homography_transfer_error(models[:, None], x1[None], x2[None])

    def refine(model, weights):
        return homography_dlt(x1, x2, weights)

    res = ransac(
        jax.random.PRNGKey(0), len(x1), 4, sample_estimate, residual,
        RansacOptions(max_error=2.0, batch_size=64), local_refine_fn=refine,
    )
    assert bool(res.success)
    inl = np.asarray(res.inlier_mask)
    # All true inliers recovered, almost no false positives.
    assert inl[:n_in].mean() > 0.99
    assert inl[n_in:].mean() < 0.05


def _make_pair(rng, calibrated, n_points=150, outlier_ratio=0.3):
    f = 700.0
    w, h = 800, 600
    cam1 = Camera.create(1, 1, f, w, h)  # PINHOLE
    cam2 = Camera.create(2, 1, f, w, h)
    cam1.has_prior_focal_length = calibrated
    cam2.has_prior_focal_length = calibrated
    # Relative pose with sideways translation.
    from colmap_tpu.geometry import rotation as rot
    from colmap_tpu.scene.types import Pose

    angle = 0.15
    q = np.asarray(rot.quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), angle))
    t = np.array([1.0, 0.1, 0.05])
    pose21 = Pose(q, t)
    X = rng.uniform(-3, 3, (n_points, 3))
    X[:, 2] = rng.uniform(4, 12, n_points)
    x1 = X[:, :2] / X[:, 2:] * f + np.array([w / 2, h / 2])
    Xc2 = pose21.apply(X)
    x2 = Xc2[:, :2] / Xc2[:, 2:] * f + np.array([w / 2, h / 2])
    ok = (
        (x1[:, 0] > 0) & (x1[:, 0] < w) & (x1[:, 1] > 0) & (x1[:, 1] < h)
        & (x2[:, 0] > 0) & (x2[:, 0] < w) & (x2[:, 1] > 0) & (x2[:, 1] < h)
    )
    x1, x2 = x1[ok], x2[ok]
    n = len(x1)
    n_out = int(n * outlier_ratio)
    x2_noise = x2.copy()
    out_idx = rng.choice(n, n_out, replace=False)
    x2_noise[out_idx] = rng.uniform(0, [w, h], (n_out, 2))
    matches = np.stack([np.arange(n), np.arange(n)], axis=1).astype(np.uint32)
    return cam1, x1, cam2, x2_noise, matches, out_idx, pose21


def test_two_view_geometry_calibrated():
    rng = np.random.default_rng(1)
    cam1, x1, cam2, x2, matches, out_idx, pose21 = _make_pair(rng, calibrated=True)
    g = estimate_two_view_geometry(
        cam1, x1, cam2, x2, matches,
        TwoViewGeometryOptions(compute_relative_pose=True),
    )
    assert g.config == int(TwoViewGeometryConfig.CALIBRATED)
    inliers = set(map(tuple, g.inlier_matches))
    outset = set(int(i) for i in out_idx)
    n_total = len(matches) - len(out_idx)
    # Most true inliers found; outliers rejected.
    n_true = sum(1 for (a, b) in inliers if a not in outset)
    n_false = sum(1 for (a, b) in inliers if a in outset)
    assert n_true > 0.9 * n_total
    assert n_false < 0.05 * len(out_idx) + 2
    # Relative pose recovered.
    assert g.cam2_from_cam1 is not None
    q_gt = pose21.quat / np.linalg.norm(pose21.quat)
    q_est = g.cam2_from_cam1.quat
    assert min(np.abs(q_est - q_gt).max(), np.abs(q_est + q_gt).max()) < 1e-2
    t_gt = pose21.t / np.linalg.norm(pose21.t)
    assert np.abs(g.cam2_from_cam1.t - t_gt).max() < 1e-2
    assert g.tri_angle > 0.01


def test_two_view_geometry_uncalibrated():
    rng = np.random.default_rng(2)
    cam1, x1, cam2, x2, matches, out_idx, _ = _make_pair(rng, calibrated=False)
    g = estimate_two_view_geometry(cam1, x1, cam2, x2, matches)
    assert g.config == int(TwoViewGeometryConfig.UNCALIBRATED)
    assert len(g.inlier_matches) > 0.8 * (len(matches) - len(out_idx))


def test_two_view_geometry_planar():
    """Pure-rotation pair must be classified planar/panoramic."""
    rng = np.random.default_rng(3)
    f, w, h = 700.0, 800, 600
    cam1 = Camera.create(1, 1, f, w, h)
    cam2 = Camera.create(2, 1, f, w, h)
    cam1.has_prior_focal_length = cam2.has_prior_focal_length = True
    from colmap_tpu.geometry import rotation as rot
    from colmap_tpu.scene.types import Pose

    q = np.asarray(rot.quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), 0.1))
    pose21 = Pose(q, np.zeros(3))  # pure rotation
    X = rng.uniform(-3, 3, (200, 3))
    X[:, 2] = rng.uniform(4, 12, 200)
    x1 = X[:, :2] / X[:, 2:] * f + np.array([w / 2, h / 2])
    Xc2 = pose21.apply(X)
    x2 = Xc2[:, :2] / Xc2[:, 2:] * f + np.array([w / 2, h / 2])
    ok = (
        (x1[:, 0] > 0) & (x1[:, 0] < w) & (x1[:, 1] > 0) & (x1[:, 1] < h)
        & (x2[:, 0] > 0) & (x2[:, 0] < w) & (x2[:, 1] > 0) & (x2[:, 1] < h)
    )
    x1, x2 = x1[ok], x2[ok]
    matches = np.stack([np.arange(len(x1))] * 2, axis=1).astype(np.uint32)
    g = estimate_two_view_geometry(cam1, x1, cam2, x2, matches)
    assert g.config in (
        int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC),
        int(TwoViewGeometryConfig.PANORAMIC),
    )


def test_two_view_geometry_degenerate():
    rng = np.random.default_rng(4)
    cam1 = Camera.create(1, 1, 700.0, 800, 600)
    cam2 = Camera.create(2, 1, 700.0, 800, 600)
    x1 = rng.uniform(0, 800, (60, 2))
    x2 = rng.uniform(0, 800, (60, 2))  # pure noise
    matches = np.stack([np.arange(60)] * 2, axis=1).astype(np.uint32)
    g = estimate_two_view_geometry(cam1, x1, cam2, x2, matches)
    assert g.config == int(TwoViewGeometryConfig.DEGENERATE)

    # Too few matches.
    g = estimate_two_view_geometry(cam1, x1[:5], cam2, x2[:5], matches[:5])
    assert g.config == int(TwoViewGeometryConfig.DEGENERATE)


def test_shared_focal_recovery_two_view():
    """Same-camera uncalibrated pair: shared focal recovered from F
    (reference: EstimateSharedFocalTwoViewGeometry,
    two_view_geometry.cc:1155)."""
    import numpy as np

    from colmap_tpu.estimators.two_view_geometry import (
        TwoViewGeometryOptions,
        estimate_two_view_geometry,
    )
    from colmap_tpu.scene.types import Camera, Pose, TwoViewGeometryConfig
    from colmap_tpu.sensor import models as camera_models

    rng = np.random.default_rng(0)
    f_true = 1100.0
    cam = Camera(
        1, int(camera_models.CameraModelId.SIMPLE_PINHOLE), 1024, 768,
        np.array([850.0, 512.0, 384.0]),  # wrong default focal, no prior
        has_prior_focal_length=False,
    )
    n = 200
    X = np.concatenate(
        [rng.uniform(-3, 3, (n, 2)), rng.uniform(6, 12, (n, 1))], axis=1
    )
    angle = 0.25
    q = np.array([np.cos(angle / 2), 0, np.sin(angle / 2), 0])
    pose21 = Pose(q, np.array([1.2, 0.1, 0.2]))

    def project(P, f):
        uv = P[:, :2] / P[:, 2:3]
        return uv * f + np.array([512.0, 384.0])

    x1 = project(X, f_true)
    x2 = project(pose21.apply(X), f_true)
    ok = (pose21.apply(X)[:, 2] > 0.1) & (X[:, 2] > 0.1)
    x1, x2 = x1[ok], x2[ok]
    matches = np.stack([np.arange(len(x1))] * 2, axis=1).astype(np.uint32)

    g = estimate_two_view_geometry(
        cam, x1, cam, x2, matches,
        TwoViewGeometryOptions(compute_relative_pose=True, detect_watermark=False),
    )
    assert g.config == int(TwoViewGeometryConfig.UNCALIBRATED)
    assert g.camera1 is not None and g.camera2 is not None
    f_est = g.camera1.mean_focal_length()
    np.testing.assert_allclose(f_est, f_true, rtol=0.03)
    assert g.E is not None
    # Pose recovered with the estimated focal must match ground truth.
    assert g.cam2_from_cam1 is not None
    assert np.degrees(g.cam2_from_cam1.angle_to(pose21)) < 1.0


def test_one_sided_focal_recovery_two_view():
    """One calibrated + one uncalibrated camera: the unknown focal is
    recovered (reference: EstimateOneSidedFocalTwoViewGeometry)."""
    import numpy as np

    from colmap_tpu.estimators.two_view_geometry import (
        TwoViewGeometryOptions,
        estimate_two_view_geometry,
    )
    from colmap_tpu.scene.types import Camera, Pose, TwoViewGeometryConfig
    from colmap_tpu.sensor import models as camera_models

    rng = np.random.default_rng(1)
    f1, f2_true = 900.0, 1300.0
    cam1 = Camera(
        1, int(camera_models.CameraModelId.SIMPLE_PINHOLE), 1024, 768,
        np.array([f1, 512.0, 384.0]), has_prior_focal_length=True,
    )
    cam2 = Camera(
        2, int(camera_models.CameraModelId.SIMPLE_PINHOLE), 1024, 768,
        np.array([700.0, 512.0, 384.0]), has_prior_focal_length=False,
    )
    n = 200
    X = np.concatenate(
        [rng.uniform(-3, 3, (n, 2)), rng.uniform(6, 12, (n, 1))], axis=1
    )
    angle = -0.2
    q = np.array([np.cos(angle / 2), np.sin(angle / 2), 0, 0])
    pose21 = Pose(q, np.array([-0.8, 0.4, 0.1]))

    def project(P, f):
        uv = P[:, :2] / P[:, 2:3]
        return uv * f + np.array([512.0, 384.0])

    x1 = project(X, f1)
    x2 = project(pose21.apply(X), f2_true)
    ok = (pose21.apply(X)[:, 2] > 0.1) & (X[:, 2] > 0.1)
    x1, x2 = x1[ok], x2[ok]
    matches = np.stack([np.arange(len(x1))] * 2, axis=1).astype(np.uint32)

    g = estimate_two_view_geometry(
        cam1, x1, cam2, x2, matches,
        TwoViewGeometryOptions(detect_watermark=False),
    )
    assert g.config == int(TwoViewGeometryConfig.UNCALIBRATED)
    assert g.camera2 is not None
    np.testing.assert_allclose(
        g.camera2.mean_focal_length(), f2_true, rtol=0.03
    )


def test_multiple_models_two_homographies():
    """Two independently moving planes → MULTIPLE config with the union of
    both inlier sets (reference: EstimateMultipleTwoViewGeometries,
    two_view_geometry.cc:339-382)."""
    rng = np.random.default_rng(7)
    w, h = 1024, 768
    cam = Camera.create(1, 1, 900.0, w, h)

    def plane_pair(H_gt, n, lo, hi):
        x1 = rng.uniform(lo, hi, (n, 2))
        p = np.concatenate([x1, np.ones((n, 1))], axis=1) @ H_gt.T
        x2 = p[:, :2] / p[:, 2:]
        return x1, x2

    H_a = np.array([[1.05, 0.02, 40.0], [-0.01, 0.97, -20.0], [1e-5, -2e-5, 1.0]])
    H_b = np.array([[0.8, -0.1, 300.0], [0.12, 1.15, 90.0], [-3e-5, 4e-5, 1.0]])
    x1a, x2a = plane_pair(H_a, 150, (60, 60), (480, 700))
    x1b, x2b = plane_pair(H_b, 80, (540, 60), (960, 700))
    x1 = np.concatenate([x1a, x1b])
    x2 = np.concatenate([x2a, x2b])
    matches = np.stack([np.arange(len(x1))] * 2, axis=1).astype(np.uint32)

    opts = TwoViewGeometryOptions(
        multiple_models=True, detect_watermark=False, estimate_focals=False,
    )
    g = estimate_two_view_geometry(cam, x1, cam, x2, matches, opts)
    assert g.config == int(TwoViewGeometryConfig.MULTIPLE)
    # Inliers from both planes present.
    inl1 = {int(a) for a, _ in g.inlier_matches}
    assert len(inl1 & set(range(150))) > 100
    assert len(inl1 & set(range(150, 230))) > 50


def test_stationary_match_filtering():
    """filter_stationary_matches drops near-zero-displacement matches
    (reference: FilterStationaryMatches, two_view_geometry.cc:1570)."""
    rng = np.random.default_rng(8)
    cam1, x1, cam2, x2, matches, out_idx, _ = _make_pair(rng, calibrated=False)
    # Append stationary junk matches (same coordinates both sides).
    n_stat = 60
    stat = rng.uniform(100, 500, (n_stat, 2))
    x1s = np.concatenate([x1, stat])
    x2s = np.concatenate([x2, stat + rng.normal(0, 0.5, (n_stat, 2))])
    m2 = np.stack([np.arange(len(x1s))] * 2, axis=1).astype(np.uint32)
    g = estimate_two_view_geometry(
        cam1, x1s, cam2, x2s, m2,
        TwoViewGeometryOptions(filter_stationary_matches=True,
                               detect_watermark=False),
    )
    stat_ids = set(range(len(x1), len(x1s)))
    assert not ({int(a) for a, _ in g.inlier_matches} & stat_ids)


def test_pose_from_homography_planar():
    """Malis homography decomposition recovers (R, t, n) of a planar scene
    (reference: geometry/homography_matrix.cc PoseFromHomographyMatrix)."""
    from colmap_tpu.geometry.homography import pose_from_homography_matrix

    rng = np.random.default_rng(5)
    f = 600.0
    K = np.array([[f, 0, 320.0], [0, f, 240.0], [0, 0, 1.0]])
    # Plane z = 3 in cam1 (n=(0,0,1), d=3); relative pose with rotation.
    angle = 0.2
    c, s = np.cos(angle), np.sin(angle)
    R_gt = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    t_gt = np.array([0.5, 0.1, 0.05])
    n_gt = np.array([0.0, 0.0, 1.0])
    d = 3.0
    H = K @ (R_gt - np.outer(t_gt, n_gt) / d) @ np.linalg.inv(K)

    # Bearing rays of plane points visible in both cameras.
    X = np.concatenate(
        [rng.uniform(-1.5, 1.5, (100, 2)), np.full((100, 1), d)], axis=1
    )
    X2 = X @ R_gt.T + t_gt
    r1 = X / np.linalg.norm(X, axis=1, keepdims=True)
    r2 = X2 / np.linalg.norm(X2, axis=1, keepdims=True)
    R, t, n, pts, count = pose_from_homography_matrix(H, K, K, r1, r2)
    assert count > 90
    np.testing.assert_allclose(R, R_gt, atol=1e-6)
    # Translation recovered up to the plane-distance scale: t/d.
    np.testing.assert_allclose(t, t_gt / d, atol=1e-6)
    np.testing.assert_allclose(np.abs(n @ n_gt), 1.0, atol=1e-6)


def test_two_view_planar_vs_panoramic_resolution():
    """compute_relative_pose resolves PLANAR_OR_PANORAMIC into PLANAR (moving
    camera, planar scene) or PANORAMIC (pure rotation) via homography
    decomposition (reference: two_view_geometry.cc:875-905)."""
    rng = np.random.default_rng(6)
    f = 700.0
    w, h = 800, 600
    cam1 = Camera.create(1, 1, f, w, h)
    cam2 = Camera.create(2, 1, f, w, h)
    cam1.has_prior_focal_length = True
    cam2.has_prior_focal_length = True
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])

    def run_case(R_gt, t_gt):
        # Planar scene points at z=5 in cam1.
        X = np.concatenate(
            [rng.uniform(-2.5, 2.5, (200, 2)), np.full((200, 1), 5.0)], axis=1
        )
        X2 = X @ R_gt.T + t_gt
        x1 = (X @ K.T)
        x1 = x1[:, :2] / x1[:, 2:]
        x2 = (X2 @ K.T)
        x2 = x2[:, :2] / x2[:, 2:]
        ok = (
            (x1[:, 0] > 0) & (x1[:, 0] < w) & (x1[:, 1] > 0) & (x1[:, 1] < h)
            & (x2[:, 0] > 0) & (x2[:, 0] < w) & (x2[:, 1] > 0) & (x2[:, 1] < h)
        )
        x1, x2 = x1[ok], x2[ok]
        matches = np.stack([np.arange(len(x1))] * 2, 1).astype(np.uint32)
        return estimate_two_view_geometry(
            cam1, x1, cam2, x2, matches,
            TwoViewGeometryOptions(
                compute_relative_pose=True, detect_watermark=False
            ),
        )

    angle = 0.15
    c, s = np.cos(angle), np.sin(angle)
    R_gt = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    g_planar = run_case(R_gt, np.array([0.8, 0.1, 0.0]))
    assert g_planar.config == int(TwoViewGeometryConfig.PLANAR)
    assert g_planar.cam2_from_cam1 is not None
    assert g_planar.tri_angle > 0.01

    g_pano = run_case(R_gt, np.zeros(3))
    assert g_pano.config == int(TwoViewGeometryConfig.PANORAMIC)
    assert g_pano.tri_angle == 0.0
    from colmap_tpu.geometry import rotation as rot
    import jax.numpy as jnp
    R_est = np.asarray(rot.quat_to_rotmat(jnp.asarray(g_pano.cam2_from_cam1.quat)))
    np.testing.assert_allclose(R_est, R_gt, atol=1e-3)


def _spherical_pair(rng, R_gt, t_gt, n=300, outlier_ratio=0.15):
    """Equirectangular pair observing random 3D points; returns pixel
    keypoints + matches."""
    from colmap_tpu.sensor import models as camera_models
    import jax.numpy as jnp

    w, h = 2048, 1024
    mid = int(camera_models.CameraModelId.EQUIRECTANGULAR)
    cam = Camera.create(1, mid, 0.0, w, h)
    X = rng.standard_normal((n, 3))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X *= rng.uniform(2.0, 8.0, (n, 1))
    X2 = X @ R_gt.T + t_gt

    def project(P):
        xy, _ = camera_models.img_from_cam(
            mid, jnp.asarray(cam.params, jnp.float64), jnp.asarray(P),
            check_cheirality=False,
        )
        return np.array(xy)

    x1 = project(X)
    x2 = project(X2)
    n_out = int(n * outlier_ratio)
    out_idx = rng.choice(n, n_out, replace=False)
    x2[out_idx] = rng.uniform([0, 0], [w, h], (n_out, 2))
    matches = np.stack([np.arange(n)] * 2, 1).astype(np.uint32)
    return cam, x1, x2, matches, out_idx


def test_spherical_two_view_calibrated():
    """Equirectangular pair with translation: bearing-ray E RANSAC gives a
    CALIBRATED config and the correct relative pose (reference:
    EstimateSphericalTwoViewGeometry, two_view_geometry.cc:394-528)."""
    rng = np.random.default_rng(12)
    angle = 0.3
    c, s = np.cos(angle), np.sin(angle)
    R_gt = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    t_gt = np.array([0.8, 0.2, 0.3])
    cam, x1, x2, matches, out_idx = _spherical_pair(rng, R_gt, t_gt)
    g = estimate_two_view_geometry(
        cam, x1, cam, x2, matches,
        TwoViewGeometryOptions(compute_relative_pose=True,
                               detect_watermark=False),
    )
    assert g.config == int(TwoViewGeometryConfig.CALIBRATED)
    inl = {int(a) for a, _ in g.inlier_matches}
    assert len(inl & set(out_idx.tolist())) <= 3
    assert len(inl) > 0.8 * (len(matches) - len(out_idx))
    assert g.cam2_from_cam1 is not None
    from colmap_tpu.geometry import rotation as rot
    import jax.numpy as jnp
    R_est = np.asarray(rot.quat_to_rotmat(jnp.asarray(g.cam2_from_cam1.quat)))
    assert np.abs(R_est - R_gt).max() < 0.02
    t_dir = t_gt / np.linalg.norm(t_gt)
    assert min(np.abs(g.cam2_from_cam1.t - t_dir).max(),
               np.abs(g.cam2_from_cam1.t + t_dir).max()) < 0.05
    assert g.tri_angle > 0.01


def test_spherical_two_view_panoramic():
    """Pure-rotation equirectangular pair resolves to PANORAMIC with the
    rotation recovered through the ray-space homography."""
    rng = np.random.default_rng(13)
    angle = 0.4
    c, s = np.cos(angle), np.sin(angle)
    R_gt = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    cam, x1, x2, matches, out_idx = _spherical_pair(
        rng, R_gt, np.zeros(3), outlier_ratio=0.1
    )
    g = estimate_two_view_geometry(
        cam, x1, cam, x2, matches,
        TwoViewGeometryOptions(compute_relative_pose=True,
                               detect_watermark=False),
    )
    assert g.config == int(TwoViewGeometryConfig.PANORAMIC)
    assert g.tri_angle == 0.0
    from colmap_tpu.geometry import rotation as rot
    import jax.numpy as jnp
    R_est = np.asarray(rot.quat_to_rotmat(jnp.asarray(g.cam2_from_cam1.quat)))
    assert np.abs(R_est - R_gt).max() < 0.01


def test_two_view_from_known_relative_pose():
    """Known-pose match classification (reference:
    TwoViewGeometryFromKnownRelativePose, two_view_geometry.cc:1586)."""
    from colmap_tpu.estimators.two_view_geometry import (
        two_view_geometry_from_known_relative_pose,
    )

    rng = np.random.default_rng(14)
    cam1, x1, cam2, x2, matches, out_idx, pose21 = _make_pair(
        rng, calibrated=True
    )
    g = two_view_geometry_from_known_relative_pose(
        cam1, x1, cam2, x2, pose21, matches
    )
    assert g.config == int(TwoViewGeometryConfig.CALIBRATED)
    inl = {int(a) for a, _ in g.inlier_matches}
    outset = set(int(i) for i in out_idx)
    assert len(inl & outset) <= 2
    assert len(inl) > 0.9 * (len(matches) - len(out_idx))
