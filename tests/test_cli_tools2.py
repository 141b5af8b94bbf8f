"""Tests for the second batch of CLI tools."""

import os

import numpy as np
import pytest

from colmap_tpu.cli.main import main as cli_main
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction_io import read_model, write_model
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset


@pytest.fixture()
def model_dir(tmp_path):
    d = tmp_path / "model"
    opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=4, num_points3D=40, seed=6)
    recon = synthesize_dataset(opt)
    write_model(recon, str(d), fmt="bin")
    return str(d)


def test_model_transformer(model_dir, tmp_path):
    tf = tmp_path / "tf.txt"
    tf.write_text("2.0 1 0 0 0 1.0 2.0 3.0")
    out = tmp_path / "out"
    cli_main(["model_transformer", "--input_path", model_dir,
              "--output_path", str(out), "--transform_path", str(tf)])
    a = read_model(model_dir)
    b = read_model(str(out))
    pid = next(iter(a.points3D))
    np.testing.assert_allclose(
        b.points3D[pid].xyz, 2.0 * a.points3D[pid].xyz + [1, 2, 3], atol=1e-9
    )


def test_model_cropper(model_dir, tmp_path):
    out = tmp_path / "out"
    cli_main(["model_cropper", "--input_path", model_dir,
              "--output_path", str(out), "--boundary=-1,-1,-1,0,1,1"])
    b = read_model(str(out))
    for p in b.points3D.values():
        assert p.xyz[0] <= 0


def test_point_filtering(model_dir, tmp_path):
    out = tmp_path / "out"
    cli_main(["point_filtering", "--input_path", model_dir,
              "--output_path", str(out), "--min_track_len", "3"])
    b = read_model(str(out))
    for p in b.points3D.values():
        assert len(p.track) >= 3


def test_project_generator(tmp_path):
    out = tmp_path / "project.ini"
    cli_main(["project_generator", "--database_path", "/a/db.db",
              "--output_path", str(out)])
    assert "SiftExtraction" in out.read_text()


def test_database_merger(tmp_path):
    p1, p2, pm = (str(tmp_path / f"{n}.db") for n in ("a", "b", "m"))
    for path, seed in ((p1, 1), (p2, 2)):
        opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=3,
                                      num_points3D=20, seed=seed)
        db = Database(path)
        synthesize_dataset(opt, database=db)
        # Distinct names per database.
        db.conn.execute(
            "UPDATE images SET name = ? || name", (f"s{seed}_",)
        )
        db.commit()
        db.close()
    cli_main(["database_merger", "--database_path1", p1,
              "--database_path2", p2, "--merged_database_path", pm])
    out = Database(pm)
    assert out.num_images() == 6
    assert out.num_matched_pairs() == 6  # 3 per source database
    out.close()


def test_pose_prior_mapper(tmp_path):
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=6, num_points3D=80, seed=9,
        camera_has_prior_focal_length=True, prior_position=True,
    )
    db_path = str(tmp_path / "db.db")
    db = Database(db_path)
    gt = synthesize_dataset(opt, database=db)
    db.close()
    out = tmp_path / "sparse"
    cli_main(["pose_prior_mapper", "--database_path", db_path,
              "--output_path", str(out)])
    recon = read_model(str(out / "0"))
    # After prior alignment the model lives in the GT (prior) frame directly.
    errs = [
        np.linalg.norm(
            recon.cam_from_world(i).projection_center()
            - gt.cam_from_world(i).projection_center()
        )
        for i in recon.reg_image_ids()
    ]
    assert np.median(errs) < 0.05
