"""Tests for GPS, covariance, view-graph calibration, pose-prior alignment.

reference test strategy: geometry/gps_test.cc, estimators/covariance tests,
estimators/view_graph_calibration tests, estimators/alignment_test.cc.
"""

import numpy as np
import pytest

from colmap_tpu.geometry.gps import (
    ecef_to_ellipsoid,
    ellipsoid_to_ecef,
    ellipsoid_to_enu,
    enu_to_ellipsoid,
)


def test_gps_ecef_roundtrip():
    lat, lon, alt = 47.37, 8.54, 408.0  # Zurich
    ecef = ellipsoid_to_ecef(lat, lon, alt)
    assert abs(np.linalg.norm(ecef) - 6.37e6) < 3e4
    back = ecef_to_ellipsoid(ecef)
    np.testing.assert_allclose(back, [lat, lon, alt], atol=1e-6)


def test_gps_enu_roundtrip():
    ref = (47.37, 8.54, 408.0)
    lat = np.array([47.370, 47.371, 47.372])
    lon = np.array([8.540, 8.541, 8.542])
    alt = np.array([408.0, 409.0, 410.0])
    enu = ellipsoid_to_enu(lat, lon, alt, *ref)
    # First point = reference -> origin; others within ~250 m.
    np.testing.assert_allclose(enu[0], 0.0, atol=1e-6)
    assert np.all(np.abs(enu[1:]) < 300)
    back = enu_to_ellipsoid(enu, *ref)
    np.testing.assert_allclose(back[:, 0], lat, atol=1e-9)
    np.testing.assert_allclose(back[:, 1], lon, atol=1e-9)
    np.testing.assert_allclose(back[:, 2], alt, atol=1e-6)


def test_ba_covariance():
    from colmap_tpu.estimators import bundle_adjustment as ba
    from colmap_tpu.estimators.covariance import estimate_ba_covariance
    from colmap_tpu.scene.synthetic_ba import synthetic_ba_problem
    import jax.numpy as jnp

    problem, gt, model_id = synthetic_ba_problem(
        num_frames=8, num_points=120, obs_per_point=5, dtype=jnp.float64,
        pixel_noise=1.0, seed=2,
    )
    options = ba.BAOptions()
    masks = ba.default_masks(problem, model_id, options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    masks = masks._replace(cam_mask=jnp.zeros_like(masks.cam_mask))
    out = estimate_ba_covariance(problem, model_id, options, masks)
    covs = out["pose_covs"]
    assert covs.shape == (8, 6, 6)
    # Gauge-fixed frame 0 has zero covariance; others positive-definite.
    assert np.abs(covs[0]).max() == 0.0
    for i in range(2, 8):
        eigs = np.linalg.eigvalsh(covs[i])
        assert eigs.min() > 0
        # With ~1px noise and f~1280 the pose stddevs are small but nonzero.
        assert np.sqrt(eigs.max()) < 1.0


def test_view_graph_calibration():
    from colmap_tpu.estimators.view_graph_calibration import calibrate_view_graph
    from colmap_tpu.geometry.essential import essential_from_pose
    from colmap_tpu.geometry.rigid3 import Rigid3
    from colmap_tpu.geometry import rotation as rot
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    true_focals = {1: 800.0, 2: 1100.0, 3: 950.0}
    pps = {1: (400, 300), 2: (500, 400), 3: (450, 350)}
    edges = []
    for (a, b) in [(1, 2), (2, 3), (1, 3), (1, 2), (2, 3)]:
        q = rot.quat_from_axis_angle(jnp.asarray(rng.standard_normal(3)), rng.uniform(0.2, 0.6))
        t = rng.standard_normal(3)
        pose = Rigid3(q, jnp.asarray(t / np.linalg.norm(t)))
        E = np.asarray(essential_from_pose(pose))
        Ka = np.array([[true_focals[a], 0, pps[a][0]], [0, true_focals[a], pps[a][1]], [0, 0, 1]])
        Kb = np.array([[true_focals[b], 0, pps[b][0]], [0, true_focals[b], pps[b][1]], [0, 0, 1]])
        F = np.linalg.inv(Kb).T @ E @ np.linalg.inv(Ka)
        edges.append((a, b, F))
    # Priors off by up to 30%.
    priors = {1: 650.0, 2: 1300.0, 3: 1050.0}
    result = calibrate_view_graph([1, 2, 3], priors, pps, edges)
    for cid in true_focals:
        rel = abs(result[cid] - true_focals[cid]) / true_focals[cid]
        assert rel < 0.05, f"camera {cid}: {result[cid]} vs {true_focals[cid]}"


def test_align_to_pose_priors():
    from colmap_tpu.estimators.alignment import align_reconstruction_to_pose_priors
    from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset

    opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=6, num_points3D=40, seed=4)
    recon = synthesize_dataset(opt)
    # Priors = GT centers in a different (scaled/shifted) frame.
    priors = {}
    for iid in recon.reg_image_ids():
        c = recon.cam_from_world(iid).projection_center()
        priors[iid] = 3.0 * c + np.array([10.0, -5.0, 2.0])
    # One outlier prior.
    priors[1] = priors[1] + np.array([100.0, 0, 0])
    sim = align_reconstruction_to_pose_priors(recon, priors, robust_max_error=1.0)
    assert sim is not None
    errs = [
        np.linalg.norm(recon.cam_from_world(i).projection_center() - priors[i])
        for i in recon.reg_image_ids() if i != 1
    ]
    assert max(errs) < 1e-6
