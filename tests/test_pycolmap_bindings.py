"""pycolmap class-surface + estimator binding tests.

VERDICT r1 weak #9: the reference binds every layer (src/pycolmap/
main.cc:34-75); these cover the class re-exports and the estimator
wrappers with pycolmap's dict-return conventions.
"""

import numpy as np
import pytest

import colmap_tpu.pycolmap_compat as pc
from colmap_tpu.scene.types import Camera, Pose


def test_class_surface_present():
    for name in (
        "Rigid3d", "Sim3d", "RANSACOptions", "CorrespondenceGraph",
        "DatabaseCache", "IncrementalMapper", "IncrementalPipelineOptions",
        "Reconstruction", "Database", "Camera", "Image", "Point3D",
        "TwoViewGeometryConfig",
    ):
        assert hasattr(pc, name), name


def test_camera_create_accepts_model_name():
    cam = Camera.create(1, "SIMPLE_PINHOLE", 500.0, 640, 480)
    assert cam.model_name == "SIMPLE_PINHOLE"
    assert cam.params[0] == 500.0


def test_estimate_homography_matrix():
    rng = np.random.default_rng(0)
    H = np.array([[1.1, 0.02, 5.0], [0.01, 0.95, -3.0], [1e-4, -2e-5, 1.0]])
    x1 = rng.uniform(0, 500, (100, 2))
    x1h = np.concatenate([x1, np.ones((100, 1))], 1)
    x2h = x1h @ H.T
    x2 = x2h[:, :2] / x2h[:, 2:]
    res = pc.estimate_homography_matrix(x1, x2)
    assert res is not None and res["num_inliers"] >= 95
    # Up-to-scale agreement with the true H.
    Hn = res["H"] / res["H"][2, 2]
    np.testing.assert_allclose(Hn, H, atol=1e-2)


def test_estimate_fundamental_matrix():
    rng = np.random.default_rng(1)
    # Two-view geometry: points on two depth planes, translated camera.
    X = rng.uniform(-1, 1, (120, 3))
    X[:, 2] += 4.0
    R2 = np.eye(3)
    t2 = np.array([-0.5, 0.05, 0.0])
    f, c = 500.0, np.array([320.0, 240.0])
    x1 = X[:, :2] / X[:, 2:] * f + c
    Xc2 = X @ R2.T + t2
    x2 = Xc2[:, :2] / Xc2[:, 2:] * f + c
    res = pc.estimate_fundamental_matrix(x1, x2)
    assert res is not None and res["num_inliers"] >= 110


def test_absolute_pose_and_refine():
    rng = np.random.default_rng(2)
    cam = Camera.create(1, "SIMPLE_PINHOLE", 500.0, 640, 480)
    X = rng.uniform(-1, 1, (50, 3))
    X[:, 2] += 5
    uv = (X[:, :2] / X[:, 2:]) * 500.0 + np.array([320, 240])
    res = pc.estimate_absolute_pose(uv, X, cam)
    assert res is not None and res["num_inliers"] >= 45
    r2 = pc.refine_absolute_pose(
        res["cam_from_world"], uv, X, cam, res["inlier_mask"]
    )
    assert r2["success"]


def test_estimate_triangulation_binding():
    cam = Camera.create(1, "SIMPLE_PINHOLE", 500.0, 640, 480)
    poses = [
        Pose.identity(),
        Pose(np.array([1.0, 0, 0, 0]), np.array([-1.0, 0, 0])),
    ]
    pt = np.array([0.2, 0.1, 4.0])
    obs = []
    for p in poses:
        Xc = p.rotmat() @ pt + p.t
        obs.append(Xc[:2] / Xc[2] * 500.0 + np.array([320, 240]))
    res = pc.estimate_triangulation(np.stack(obs), poses, [cam, cam])
    assert res is not None
    np.testing.assert_allclose(res["xyz"], pt, atol=1e-2)
