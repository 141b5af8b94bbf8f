"""Tests for generalized (rig) pose estimation.

reference test strategy: estimators/generalized_pose_test.cc — synthetic
rigs, exact correspondences + outliers, pose asserted near ground truth.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.estimators.generalized_pose import (
    GeneralizedAbsolutePoseOptions,
    GeneralizedRelativePoseOptions,
    StructureLessAbsolutePoseOptions,
    estimate_generalized_absolute_pose,
    estimate_generalized_relative_pose,
    estimate_structure_less_absolute_pose,
    refine_generalized_absolute_pose,
)
from colmap_tpu.scene.types import Camera, Pose
from colmap_tpu.sensor import models as camera_models


def _random_pose(rng, t_scale=1.0):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0, 0.5)
    q = np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])
    return Pose(q, rng.normal(size=3) * t_scale)


def _pinhole(cam_id, f=500.0, w=640, h=480):
    return Camera(
        cam_id, int(camera_models.CameraModelId.PINHOLE), w, h,
        np.array([f, f, w / 2, h / 2]),
    )


def _project(camera, cam_from_world, X):
    Xc = cam_from_world.apply(X)
    uv = Xc[:, :2] / Xc[:, 2:3]
    f = camera.params[0]
    return uv * f + camera.params[2:4], Xc[:, 2] > 0


def _rig_setup(rng, num_cams=3):
    cams_from_rig = [Pose.identity()]
    for i in range(1, num_cams):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = 0.2 * i
        q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
        cams_from_rig.append(Pose(q, rng.normal(size=3) * 0.3))
    cameras = [_pinhole(i) for i in range(num_cams)]
    return cams_from_rig, cameras


def test_generalized_absolute_pose_exact_with_outliers():
    rng = np.random.default_rng(0)
    cams_from_rig, cameras = _rig_setup(rng)
    rig_from_world = _random_pose(rng)
    n = 120
    X = rig_from_world.inverse().apply(
        np.concatenate([rng.uniform(-2, 2, (n, 2)), rng.uniform(4, 10, (n, 1))], 1)
    )
    cam_idxs = rng.integers(0, len(cameras), n)
    pts2d = np.zeros((n, 2))
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        cfw = cams_from_rig[cam_idxs[i]].compose(rig_from_world)
        uv, ok = _project(cameras[cam_idxs[i]], cfw, X[i : i + 1])
        pts2d[i] = uv[0]
        keep[i] = ok[0]
    X, cam_idxs, pts2d = X[keep], cam_idxs[keep], pts2d[keep]
    n = len(X)
    # 25% outliers.
    n_out = n // 4
    pts2d[-n_out:] += rng.uniform(30, 120, size=(n_out, 2))

    pose, inliers, scale = estimate_generalized_absolute_pose(
        pts2d, X, cam_idxs, cams_from_rig, cameras,
        GeneralizedAbsolutePoseOptions(max_error_px=4.0), seed=1,
    )
    assert pose is not None
    assert scale == 1.0
    assert inliers[: n - n_out].mean() > 0.95
    assert np.degrees(pose.angle_to(rig_from_world)) < 0.1
    np.testing.assert_allclose(pose.t, rig_from_world.t, atol=0.01)

    # LM refinement tightens further.
    refined, ok = refine_generalized_absolute_pose(
        pose, pts2d, X, cam_idxs, cams_from_rig, cameras, inliers
    )
    assert ok
    assert np.degrees(refined.angle_to(rig_from_world)) < 0.02
    np.testing.assert_allclose(refined.t, rig_from_world.t, atol=2e-3)


def test_generalized_relative_pose_metric():
    rng = np.random.default_rng(1)
    cams_from_rig, cameras = _rig_setup(rng, num_cams=2)
    rig2_from_rig1 = _random_pose(rng, t_scale=0.8)
    n = 150
    # World points in front of rig1.
    X1 = np.concatenate(
        [rng.uniform(-3, 3, (n, 2)), rng.uniform(5, 12, (n, 1))], axis=1
    )  # in rig1 frame
    idx1 = rng.integers(0, 2, n)
    idx2 = rng.integers(0, 2, n)
    pts1 = np.zeros((n, 2))
    pts2 = np.zeros((n, 2))
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        c1 = cams_from_rig[idx1[i]]
        c2 = cams_from_rig[idx2[i]].compose(rig2_from_rig1)
        uv1, ok1 = _project(cameras[idx1[i]], c1, X1[i : i + 1])
        uv2, ok2 = _project(cameras[idx2[i]], c2, X1[i : i + 1])
        pts1[i], pts2[i] = uv1[0], uv2[0]
        keep[i] = ok1[0] and ok2[0]
    pts1, pts2 = pts1[keep], pts2[keep]
    idx1, idx2 = idx1[keep], idx2[keep]

    pose, inliers = estimate_generalized_relative_pose(
        pts1, pts2, idx1, idx2, cams_from_rig, cameras,
        GeneralizedRelativePoseOptions(max_error_px=2.0), seed=2,
    )
    assert pose is not None
    assert inliers.mean() > 0.9
    assert np.degrees(pose.angle_to(rig2_from_rig1)) < 0.5
    # Metric translation (scale observable through the rig baseline).
    np.testing.assert_allclose(pose.t, rig2_from_rig1.t, atol=0.05)


def test_structure_less_absolute_pose():
    rng = np.random.default_rng(2)
    # Three registered world cameras with distinct centers.
    world_poses = [
        Pose.identity(),
        _random_pose(rng, t_scale=1.5),
        _random_pose(rng, t_scale=1.5),
    ]
    world_cams = [_pinhole(i) for i in range(3)]
    new_cam = _pinhole(9)
    cam_from_world = _random_pose(rng, t_scale=1.0)

    n = 180
    X = np.concatenate(
        [rng.uniform(-3, 3, (n, 2)), rng.uniform(6, 14, (n, 1))], axis=1
    )
    X = cam_from_world.inverse().apply(X)
    w_idx = rng.integers(0, 3, n)
    pts_new = np.zeros((n, 2))
    pts_w = np.zeros((n, 2))
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        uv_n, ok_n = _project(new_cam, cam_from_world, X[i : i + 1])
        uv_w, ok_w = _project(world_cams[w_idx[i]], world_poses[w_idx[i]], X[i : i + 1])
        pts_new[i], pts_w[i] = uv_n[0], uv_w[0]
        keep[i] = ok_n[0] and ok_w[0]
    pts_new, pts_w, w_idx = pts_new[keep], pts_w[keep], w_idx[keep]
    # 20% outliers.
    n_k = len(pts_new)
    n_out = n_k // 5
    pts_new[-n_out:] += rng.uniform(40, 150, size=(n_out, 2))

    pose, inliers = estimate_structure_less_absolute_pose(
        pts_new, pts_w, w_idx, world_poses, world_cams, new_cam,
        StructureLessAbsolutePoseOptions(max_error_px=2.0), seed=3,
    )
    assert pose is not None
    assert inliers[: n_k - n_out].mean() > 0.8
    assert np.degrees(pose.angle_to(cam_from_world)) < 0.5
    # Metric position (scale from the multi-camera world side).
    np.testing.assert_allclose(
        pose.projection_center(), cam_from_world.projection_center(), atol=0.1
    )


def test_generalized_absolute_pose_scale_recovery():
    """estimate_scale resolves a mis-scaled world against metric rig rays."""
    rng = np.random.default_rng(5)
    cams_from_rig, cameras = _rig_setup(rng)
    rig_from_world = _random_pose(rng)
    n = 100
    X = rig_from_world.inverse().apply(
        np.concatenate([rng.uniform(-2, 2, (n, 2)), rng.uniform(4, 10, (n, 1))], 1)
    )
    cam_idxs = rng.integers(0, len(cameras), n)
    pts2d = np.zeros((n, 2))
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        cfw = cams_from_rig[cam_idxs[i]].compose(rig_from_world)
        uv, ok = _project(cameras[cam_idxs[i]], cfw, X[i : i + 1])
        pts2d[i] = uv[0]
        keep[i] = ok[0]
    X, cam_idxs, pts2d = X[keep], cam_idxs[keep], pts2d[keep]
    # Shrink the world by 1/1.7: solver must recover scale ~1.7.
    X_wrong = X / 1.7
    pose, inliers, scale = estimate_generalized_absolute_pose(
        pts2d, X_wrong, cam_idxs, cams_from_rig, cameras,
        GeneralizedAbsolutePoseOptions(max_error_px=4.0), seed=6,
        estimate_scale=True,
    )
    assert pose is not None
    assert inliers.mean() > 0.9
    np.testing.assert_allclose(scale, 1.7, rtol=1e-3)
