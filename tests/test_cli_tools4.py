"""CLI subcommand batch 4 tests: feature_importer, rectification,
standalone undistorter, advancing-front mesher, PMVS/CMP-MVS export.

reference test strategy: exe/*_test.cc smoke tests on synthetic data;
image/undistortion_test.cc RectifyStereoCameras golden checks.
"""

import os

import numpy as np
import pytest

from colmap_tpu.cli.main import main as cli_main
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.scene.types import Camera, Pose
from colmap_tpu.sensor import models as camera_models


def test_rectify_stereo_cameras_epipolar_alignment():
    """After rectification, corresponding points have equal y coordinates."""
    from colmap_tpu.image.rectification import rectify_stereo_cameras

    cam1 = Camera(1, int(camera_models.CameraModelId.PINHOLE), 640, 480,
                  np.array([500.0, 500.0, 320.0, 240.0]))
    cam2 = Camera(2, int(camera_models.CameraModelId.PINHOLE), 640, 480,
                  np.array([520.0, 520.0, 310.0, 250.0]))
    # Small rotation + mostly-x baseline.
    angle = 0.05
    q = np.array([np.cos(angle / 2), 0.0, np.sin(angle / 2), 0.0])
    cam2_from_cam1 = Pose(q, np.array([-1.0, 0.05, 0.02]))
    H1, H2, Q = rectify_stereo_cameras(cam1, cam2, cam2_from_cam1)

    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, size=(50, 3)) + np.array([0, 0, 6.0])
    K1 = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1.0]])
    K2 = np.array([[520, 0, 310], [0, 520, 250], [0, 0, 1.0]])
    x1 = (K1 @ pts.T).T
    x1 = x1[:, :2] / x1[:, 2:3]
    p2 = cam2_from_cam1.apply(pts)
    x2 = (K2 @ p2.T).T
    x2 = x2[:, :2] / x2[:, 2:3]

    def warp(H, x):
        xh = np.concatenate([x, np.ones((len(x), 1))], axis=1) @ H.T
        return xh[:, :2] / xh[:, 2:3]

    y1 = warp(H1, x1)[:, 1]
    y2 = warp(H2, x2)[:, 1]
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_rectify_disparity_to_depth():
    """Q reprojects (x, y, disparity) to metric 3D for rectified cameras."""
    from colmap_tpu.image.rectification import rectify_stereo_cameras

    cam = Camera(1, int(camera_models.CameraModelId.PINHOLE), 640, 480,
                 np.array([500.0, 500.0, 320.0, 240.0]))
    baseline = 0.5
    cam2_from_cam1 = Pose(np.array([1.0, 0, 0, 0]), np.array([-baseline, 0, 0]))
    H1, H2, Q = rectify_stereo_cameras(cam, cam, cam2_from_cam1)
    # Identity-rotation pair: rectified frame == camera frame.
    z = 4.0
    pt = np.array([0.3, -0.2, z])
    x1 = 500 * pt[0] / z + 320, 500 * pt[1] / z + 240
    x2 = 500 * (pt[0] - baseline) / z + 320
    disparity = x1[0] - x2
    v = np.array([x1[1], x1[0], disparity, 1.0]) @ Q
    xyz = v[:3] / v[3]
    # Q convention (reference undistortion.cc:437-444): [row, col, disp, 1]
    # Q = [X, Y, Z, 1] w, with Z = baseline * (f + disp) / disp.
    np.testing.assert_allclose(
        abs(xyz[2]), baseline * (500.0 + disparity) / disparity, rtol=1e-6
    )
    np.testing.assert_allclose(abs(xyz[2]) - baseline, z, rtol=1e-6)


def test_feature_importer_roundtrip(tmp_path):
    from PIL import Image as PILImage

    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    for name in ("a.png", "b.png"):
        PILImage.fromarray(
            rng.integers(0, 255, size=(60, 80), dtype=np.uint8)
        ).save(img_dir / name)

    feat_dir = tmp_path / "feats"
    os.makedirs(feat_dir)
    n = 5
    kps = {}
    for name in ("a.png", "b.png"):
        kp = rng.uniform(0, 50, size=(n, 4)).astype(np.float32)
        desc = rng.integers(0, 256, size=(n, 128))
        with open(feat_dir / (name + ".txt"), "w") as f:
            f.write(f"{n} 128\n")
            for i in range(n):
                f.write(
                    " ".join(f"{v:.3f}" for v in kp[i])
                    + " "
                    + " ".join(str(int(v)) for v in desc[i])
                    + "\n"
                )
        kps[name] = (kp, desc)

    db_path = str(tmp_path / "db.db")
    cli_main([
        "feature_importer",
        "--database_path", db_path,
        "--image_path", str(img_dir),
        "--import_path", str(feat_dir),
    ])
    db = Database(db_path, must_exist=True)
    rows = db.read_images()
    assert len(rows) == 2
    for iid, name, _ in rows:
        kp = db.read_keypoints(iid)
        desc = db.read_descriptors(iid)
        np.testing.assert_allclose(kp[:, :4], kps[name][0], atol=1e-3)
        np.testing.assert_array_equal(desc, kps[name][1].astype(np.uint8))
    db.close()


def test_image_undistorter_standalone(tmp_path):
    from PIL import Image as PILImage

    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    rng = np.random.default_rng(1)
    PILImage.fromarray(
        rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    ).save(img_dir / "x.png")
    input_file = tmp_path / "cams.txt"
    input_file.write_text("x.png SIMPLE_RADIAL 70 32 24 0.05\n")
    out = tmp_path / "out"
    cli_main([
        "image_undistorter_standalone",
        "--image_path", str(img_dir),
        "--input_file", str(input_file),
        "--output_path", str(out),
    ])
    assert (out / "x.png").exists()
    assert np.asarray(PILImage.open(out / "x.png")).shape == (48, 64, 3)


def test_advancing_front_mesher_cli(tmp_path):
    from colmap_tpu.utils.ply import read_ply_mesh, write_ply

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(800, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    ply_in = str(tmp_path / "pts.ply")
    write_ply(ply_in, pts.astype(np.float32))
    ply_out = str(tmp_path / "mesh.ply")
    cli_main([
        "advancing_front_mesher",
        "--input_path", ply_in,
        "--output_path", ply_out,
    ])
    mesh = read_ply_mesh(ply_out)
    verts, faces = mesh["vertices"], mesh["faces"]
    assert len(verts) == 800
    # Closed-ish sphere surface: close to Euler bound 2n-4 faces.
    assert len(faces) > 1200


def test_pmvs_and_cmpmvs_export(tmp_path):
    from colmap_tpu.scene.reconstruction_io import write_model

    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=4, num_points3D=60, seed=5
    )
    db = Database(str(tmp_path / "db.db"))
    gt = synthesize_dataset(opt, database=db)
    db.close()
    sparse = str(tmp_path / "sparse")
    write_model(gt, sparse, fmt="bin")
    img_dir = str(tmp_path / "images")
    os.makedirs(img_dir)

    out_pmvs = str(tmp_path / "pmvs_ws")
    cli_main([
        "image_undistorter",
        "--image_path", img_dir,
        "--input_path", sparse,
        "--output_path", out_pmvs,
        "--output_type", "PMVS",
    ])
    assert os.path.exists(os.path.join(out_pmvs, "pmvs", "option-all"))
    assert os.path.exists(os.path.join(out_pmvs, "pmvs", "vis.dat"))
    n_reg = len(gt.reg_image_ids())
    txts = os.listdir(os.path.join(out_pmvs, "pmvs", "txt"))
    assert len(txts) == n_reg
    with open(os.path.join(out_pmvs, "pmvs", "txt", "00000000.txt")) as f:
        assert f.readline().strip() == "CONTOUR"
        P = np.array([[float(v) for v in f.readline().split()] for _ in range(3)])
    assert P.shape == (3, 4)

    out_cmp = str(tmp_path / "cmp_ws")
    cli_main([
        "image_undistorter",
        "--image_path", img_dir,
        "--input_path", sparse,
        "--output_path", out_cmp,
        "--output_type", "CMP-MVS",
    ])
    assert os.path.exists(os.path.join(out_cmp, "00001_P.txt"))


def test_guided_geometric_verifier_cli(tmp_path):
    db_path = str(tmp_path / "db.db")
    db = Database(db_path)
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=5, num_points3D=80, seed=7
    )
    synthesize_dataset(opt, database=db)
    db.close()
    cli_main(["guided_geometric_verifier", "--database_path", db_path])
    db = Database(db_path, must_exist=True)
    n = sum(1 for _ in db.read_all_two_view_geometries())
    assert n > 0
    db.close()


def test_feature_extraction_with_mask(tmp_path):
    from PIL import Image as PILImage

    from colmap_tpu.controllers.feature_pipeline import (
        ImageReaderOptions,
        run_feature_extraction,
    )
    from colmap_tpu.feature.sift import SiftOptions

    rng = np.random.default_rng(4)
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    img = rng.integers(0, 255, size=(96, 128), dtype=np.uint8)
    PILImage.fromarray(img).save(img_dir / "a.png")
    # Mask out the left half.
    mask = np.zeros((96, 128), dtype=np.uint8)
    mask[:, 64:] = 255
    PILImage.fromarray(mask).save(mask_dir / "a.png")

    db = Database(str(tmp_path / "db.db"))
    ids = run_feature_extraction(
        db, str(img_dir),
        reader_options=ImageReaderOptions(mask_path=str(mask_dir)),
        sift_options=SiftOptions(max_num_features=512),
    )
    kp = db.read_keypoints(ids[0])
    db.close()
    assert len(kp) > 0
    assert (kp[:, 0] >= 63.0).all()
