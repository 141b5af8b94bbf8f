"""Tests for scene containers, database, model I/O, synthetic generator.

reference test strategy: scene/database_test.cc, scene/reconstruction_io_test.cc,
scene/synthetic_test.cc.
"""

import numpy as np
import pytest

from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.scene.reconstruction_io import read_model, write_model
from colmap_tpu.scene.synthetic import (
    MatchConfig,
    SyntheticDatasetOptions,
    synthesize_dataset,
)
from colmap_tpu.scene.types import (
    INVALID_POINT3D,
    Camera,
    Pose,
    TwoViewGeometry,
)
from colmap_tpu.utils.types import image_pair_to_pair_id, pair_id_to_image_pair


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (2, 1), (100, 100), (1, 2147483646)]:
        pid = image_pair_to_pair_id(a, b)
        lo, hi = pair_id_to_image_pair(pid)
        assert (lo, hi) == (min(a, b), max(a, b))


def test_database_cameras_images(tmp_path):
    db = Database(str(tmp_path / "test.db"))
    cam = Camera.create(1, 2, 650.0, 800, 600)  # SIMPLE_RADIAL
    db.write_camera(cam)
    image_id = db.write_image("img1.png", 1)
    assert image_id == 1
    cams = db.read_cameras()
    assert cams[1].model_id == 2
    np.testing.assert_allclose(cams[1].params, cam.params)
    assert db.read_images() == [(1, "img1.png", 1)]
    db.close()


def test_database_keypoints_descriptors(tmp_path):
    db = Database(str(tmp_path / "t.db"))
    cam = Camera.create(1, 1, 650.0, 800, 600)
    db.write_camera(cam)
    db.write_image("a.png", 1)
    kp = np.random.rand(50, 2).astype(np.float32) * 800
    db.write_keypoints(1, kp)
    np.testing.assert_allclose(db.read_keypoints(1), kp)
    desc = np.random.randint(0, 256, (50, 128), dtype=np.uint8)
    db.write_descriptors(1, desc)
    np.testing.assert_array_equal(db.read_descriptors(1), desc)
    db.close()


def test_database_matches_swap(tmp_path):
    """Matches stored via the larger-first pair must round-trip swapped."""
    db = Database(str(tmp_path / "t.db"))
    m = np.array([[0, 5], [1, 6], [2, 7]], dtype=np.uint32)
    db.write_matches(10, 3, m)  # 10 > 3: stored swapped
    np.testing.assert_array_equal(db.read_matches(10, 3), m)
    np.testing.assert_array_equal(db.read_matches(3, 10), m[:, ::-1])
    db.close()


def test_database_two_view_geometry_swap(tmp_path):
    db = Database(str(tmp_path / "t.db"))
    rng = np.random.default_rng(0)
    g = TwoViewGeometry(
        config=2,
        E=rng.standard_normal((3, 3)),
        F=rng.standard_normal((3, 3)),
        H=rng.standard_normal((3, 3)) + 3 * np.eye(3),
        inlier_matches=np.array([[0, 1], [2, 3]], dtype=np.uint32),
    )
    q = rng.standard_normal(4)
    g.cam2_from_cam1 = Pose(q / np.linalg.norm(q), rng.standard_normal(3))
    db.write_two_view_geometry(7, 2, g)  # stored under (2, 7) swapped
    back = db.read_two_view_geometry(7, 2)
    np.testing.assert_array_equal(back.inlier_matches, g.inlier_matches)
    np.testing.assert_allclose(back.E, g.E, atol=1e-12)
    np.testing.assert_allclose(back.F, g.F, atol=1e-12)
    np.testing.assert_allclose(back.H, g.H, atol=1e-9)
    np.testing.assert_allclose(back.cam2_from_cam1.quat, g.cam2_from_cam1.quat, atol=1e-12)
    # Reading in stored order gives the inverse relation.
    fwd = db.read_two_view_geometry(2, 7)
    np.testing.assert_allclose(fwd.E, g.E.T, atol=1e-12)
    db.close()


def test_synthetic_consistency():
    opt = SyntheticDatasetOptions(num_rigs=2, num_frames_per_rig=3, num_points3D=60, seed=42)
    recon = synthesize_dataset(opt)
    assert recon.num_cameras() == 2
    assert recon.num_images() == 6
    assert recon.num_reg_frames() == 6
    assert recon.num_points3D() == 60
    # Every observation must reproject exactly (error ~ 0).
    recon.update_point3D_errors()
    errors = [p.error for p in recon.points3D.values() if p.error >= 0]
    assert np.max(errors) < 1e-6


def test_synthetic_database():
    opt = SyntheticDatasetOptions(
        num_rigs=1,
        num_frames_per_rig=4,
        num_points3D=50,
        seed=7,
        inlier_match_ratio=0.8,
    )
    db = Database(":memory:")
    recon = synthesize_dataset(opt, database=db)
    assert db.num_images() == 4
    assert db.num_matched_pairs() == 6  # exhaustive over 4 images
    # Inlier matches in two-view geometries correspond to shared 3D points.
    g = db.read_two_view_geometry(1, 2)
    img1, img2 = recon.images[1], recon.images[2]
    for i1, i2 in g.inlier_matches:
        assert img1.points2D_p3d[i1] == img2.points2D_p3d[i2]
        assert img1.points2D_p3d[i1] != INVALID_POINT3D
    # Raw matches contain outliers beyond the inliers.
    m = db.read_matches(1, 2)
    assert len(m) >= len(g.inlier_matches)
    db.close()


def test_synthetic_chained():
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=5, num_points3D=40, seed=3,
        match_config=MatchConfig.CHAINED,
    )
    db = Database(":memory:")
    synthesize_dataset(opt, database=db)
    assert db.num_matched_pairs() == 4
    db.close()


def test_synthetic_rig():
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_cameras_per_rig=2, num_frames_per_rig=3, num_points3D=80, seed=1
    )
    recon = synthesize_dataset(opt)
    assert recon.num_cameras() == 2
    assert recon.num_images() == 6
    assert recon.num_frames() == 3
    rig = recon.rigs[1]
    assert rig.num_sensors() == 2
    recon.update_point3D_errors()
    errors = [p.error for p in recon.points3D.values() if p.error >= 0]
    assert np.max(errors) < 1e-6


def test_model_io_binary_roundtrip(tmp_path):
    opt = SyntheticDatasetOptions(num_rigs=2, num_frames_per_rig=3, num_points3D=40, seed=11)
    recon = synthesize_dataset(opt)
    write_model(recon, str(tmp_path / "model"), fmt="bin")
    back = read_model(str(tmp_path / "model"))
    assert back.num_cameras() == recon.num_cameras()
    assert back.num_images() == recon.num_images()
    assert back.num_points3D() == recon.num_points3D()
    for iid in recon.images:
        np.testing.assert_allclose(
            back.cam_from_world(iid).quat, recon.cam_from_world(iid).quat, atol=1e-12
        )
        np.testing.assert_allclose(
            back.cam_from_world(iid).t, recon.cam_from_world(iid).t, atol=1e-12
        )
        np.testing.assert_allclose(
            back.images[iid].points2D_xy, recon.images[iid].points2D_xy, atol=1e-12
        )
        np.testing.assert_array_equal(
            back.images[iid].points2D_p3d, recon.images[iid].points2D_p3d
        )
    for pid in recon.points3D:
        np.testing.assert_allclose(back.points3D[pid].xyz, recon.points3D[pid].xyz)
        assert len(back.points3D[pid].track) == len(recon.points3D[pid].track)


def test_model_io_text_roundtrip(tmp_path):
    opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=3, num_points3D=30, seed=12)
    recon = synthesize_dataset(opt)
    write_model(recon, str(tmp_path / "model"), fmt="txt")
    back = read_model(str(tmp_path / "model"))
    assert back.num_images() == recon.num_images()
    assert back.num_points3D() == recon.num_points3D()
    for iid in recon.images:
        np.testing.assert_allclose(
            back.cam_from_world(iid).t, recon.cam_from_world(iid).t, atol=1e-12
        )


def test_reconstruction_observation_management():
    opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=4, num_points3D=30, seed=5)
    recon = synthesize_dataset(opt)
    pid = next(iter(recon.points3D))
    track = recon.points3D[pid].track
    n_before = len(track)
    el = track[0]
    recon.delete_observation(el.image_id, el.point2D_idx)
    if pid in recon.points3D:
        assert len(recon.points3D[pid].track) == n_before - 1
    # Deleting a whole point clears image references.
    pid2 = next(iter(recon.points3D))
    track2 = list(recon.points3D[pid2].track)
    recon.delete_point3D(pid2)
    for el in track2:
        assert recon.images[el.image_id].points2D_p3d[el.point2D_idx] == INVALID_POINT3D


def test_normalize():
    opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=5, num_points3D=30, seed=9)
    recon = synthesize_dataset(opt)
    recon.transform(2.0, np.array([1.0, 0, 0, 0]), np.array([10.0, 0, 0]))
    recon.update_point3D_errors()
    errors = [p.error for p in recon.points3D.values() if p.error >= 0]
    assert np.max(errors) < 1e-6  # transform preserves reprojection
    recon.normalize()
    centers = np.array([recon.cam_from_world(i).projection_center() for i in recon.reg_image_ids()])
    assert np.linalg.norm(centers.mean(axis=0)) < 2.0
