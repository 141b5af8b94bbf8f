"""CLI subcommand batch 3 tests (retrieval, view-graph, model/db tools).

reference test strategy: exe/*_test.cc smoke tests on synthetic data.
"""

import json
import os

import numpy as np
import pytest

from colmap_tpu.cli.main import main as cli_main
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction_io import read_model, write_model
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset


@pytest.fixture(scope="module")
def db_and_gt(tmp_path_factory):
    d = tmp_path_factory.mktemp("clidb")
    path = str(d / "database.db")
    db = Database(path)
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=8, num_points3D=120, seed=11
    )
    gt = synthesize_dataset(opt, database=db)
    db.commit()
    db.close()
    gt_dir = str(d / "gt")
    write_model(gt, gt_dir, fmt="bin")
    return path, gt_dir


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("climodel")
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=6, num_points3D=80, seed=5
    )
    recon = synthesize_dataset(opt)
    write_model(recon, str(d), fmt="bin")
    return str(d)


def test_gui_stub():
    with pytest.raises(SystemExit):
        cli_main(["gui"])


def test_transitive_matcher(db_and_gt, tmp_path, capsys):
    import shutil

    path = str(tmp_path / "db.db")
    shutil.copy(db_and_gt[0], path)
    cli_main(["transitive_matcher", "--database_path", path])
    out = capsys.readouterr().out
    assert "transitive pairs" in out


def test_vocab_tree_builder_matcher_retriever(db_and_gt, tmp_path, capsys):
    import shutil

    path = str(tmp_path / "db.db")
    shutil.copy(db_and_gt[0], path)
    vocab = str(tmp_path / "vocab.npz")
    cli_main(["vocab_tree_builder", "--database_path", path,
              "--vocab_tree_path", vocab, "--num_words", "32"])
    assert os.path.exists(vocab)
    data = np.load(vocab)
    assert data["vocabulary"].shape == (32, 128)

    cli_main(["vocab_tree_retriever", "--database_path", path,
              "--vocab_tree_path", vocab, "--num_images", "3"])
    out = capsys.readouterr().out
    assert len(out.splitlines()) > 3

    cli_main(["vocab_tree_matcher", "--database_path", path,
              "--vocab_tree_path", vocab, "--num_images", "3"])
    out = capsys.readouterr().out
    assert "vocab-tree pairs" in out


def test_geometric_verifier(db_and_gt, tmp_path, capsys):
    import shutil

    path = str(tmp_path / "db.db")
    shutil.copy(db_and_gt[0], path)
    cli_main(["geometric_verifier", "--database_path", path])
    out = capsys.readouterr().out
    assert "Verified" in out
    db = Database(path)
    assert db.num_verified_pairs() > 0
    db.close()


def test_rotation_averager(db_and_gt, tmp_path):
    out_dir = str(tmp_path / "rots")
    cli_main(["rotation_averager", "--database_path", db_and_gt[0],
              "--output_path", out_dir])
    recon = read_model(out_dir)
    gt = read_model(db_and_gt[1])
    assert recon.num_reg_frames() == gt.num_reg_frames()
    # Rotations must agree with ground truth up to a global rotation.
    iids = sorted(recon.reg_image_ids())
    ref = iids[0]
    for iid in iids[1:]:
        R_rel = (
            recon.cam_from_world(iid).rotmat()
            @ recon.cam_from_world(ref).rotmat().T
        )
        R_rel_gt = (
            gt.cam_from_world(iid).rotmat() @ gt.cam_from_world(ref).rotmat().T
        )
        cos = (np.trace(R_rel @ R_rel_gt.T) - 1.0) / 2.0
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5


def test_view_graph_calibrator(tmp_path, capsys):
    """Focal recovery from F matrices via the CLI.

    The sphere-scene synthetic dataset is degenerate for self-calibration
    (all optical axes meet at the origin), so build a database with random
    relative poses instead (reference: view_graph_calibration_test.cc uses
    random two-view geometries).
    """
    import jax.numpy as jnp

    from colmap_tpu.geometry import rotation as rot
    from colmap_tpu.geometry.essential import essential_from_pose
    from colmap_tpu.geometry.rigid3 import Rigid3
    from colmap_tpu.scene.types import Camera, TwoViewGeometry, TwoViewGeometryConfig

    rng = np.random.default_rng(7)
    path = str(tmp_path / "db.db")
    db = Database(path)
    true_focals = [800.0, 1100.0]
    cam_ids, img_ids = [], []
    for k, f in enumerate(true_focals):
        cam = Camera.create(k + 1, 1, f * 1.25, 800, 600)  # PINHOLE, 25% off
        cid = db.write_camera(cam)
        cam_ids.append(cid)
        for j in range(3):
            img_ids.append((db.write_image(f"im{k}_{j}.png", cid), k))
    for a in range(len(img_ids)):
        db.write_keypoints(img_ids[a][0], np.zeros((1, 4)))
    for a in range(len(img_ids)):
        for b in range(a + 1, len(img_ids)):
            (ia, ka), (ib, kb) = img_ids[a], img_ids[b]
            q = rot.quat_from_axis_angle(
                jnp.asarray(rng.standard_normal(3)), rng.uniform(0.2, 0.6)
            )
            t = rng.standard_normal(3)
            pose = Rigid3(q, jnp.asarray(t / np.linalg.norm(t)))
            E = np.asarray(essential_from_pose(pose))
            Ka = np.array([[true_focals[ka], 0, 400], [0, true_focals[ka], 300], [0, 0, 1]])
            Kb = np.array([[true_focals[kb], 0, 400], [0, true_focals[kb], 300], [0, 0, 1]])
            F = np.linalg.inv(Kb).T @ E @ np.linalg.inv(Ka)
            g = TwoViewGeometry(
                config=int(TwoViewGeometryConfig.UNCALIBRATED), F=F,
                inlier_matches=np.zeros((20, 2), dtype=np.uint32),
            )
            db.write_two_view_geometry(ia, ib, g)
    db.commit()
    db.close()
    cli_main(["view_graph_calibrator", "--database_path", path])
    out = capsys.readouterr().out
    assert "focal" in out
    db = Database(path)
    cams = db.read_cameras()
    for cid, f_true in zip(cam_ids, true_focals):
        recovered = float(cams[cid].params[0])
        assert abs(recovered - f_true) / f_true < 0.05, (cid, recovered, f_true)
    db.close()


def test_image_registrator(db_and_gt, tmp_path):
    # Start from the GT model with the last two images removed, register them.
    gt = read_model(db_and_gt[1])
    iids = sorted(gt.reg_image_ids())
    drop = set(iids[-2:])
    for iid in drop:
        gt.deregister_frame(gt.images[iid].frame_id)
    partial = str(tmp_path / "partial")
    write_model(gt, partial, fmt="bin")
    out_dir = str(tmp_path / "registered")
    cli_main(["image_registrator", "--database_path", db_and_gt[0],
              "--input_path", partial, "--output_path", out_dir])
    recon = read_model(out_dir)
    full = read_model(db_and_gt[1])
    assert recon.num_reg_frames() == full.num_reg_frames()
    from colmap_tpu.estimators.alignment import compare_reconstructions

    stats = compare_reconstructions(recon, full)
    assert stats["num_common_images"] == full.num_reg_frames()
    assert np.max(stats["rotation_errors_deg"]) < 0.1


def test_model_comparer(model_dir, capsys):
    cli_main(["model_comparer", "--input_path1", model_dir,
              "--input_path2", model_dir])
    out = capsys.readouterr().out
    assert "Common images: 6" in out
    assert "Mean rotation error: 0.0" in out


def test_model_splitter(model_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "parts")
    cli_main(["model_splitter", "--input_path", model_dir,
              "--output_path", out_dir, "--num_parts", "2"])
    parts = sorted(os.listdir(out_dir))
    assert len(parts) >= 1
    total = 0
    for p in parts:
        sub = read_model(os.path.join(out_dir, p))
        assert sub.num_reg_frames() > 0
        total += sub.num_points3D()
    assert total >= 80  # overlap can duplicate points


def test_model_clusterer(model_dir, tmp_path):
    out_dir = str(tmp_path / "clusters")
    cli_main(["model_clusterer", "--input_path", model_dir,
              "--output_path", out_dir, "--leaf_max_num_images", "4"])
    parts = sorted(os.listdir(out_dir))
    assert len(parts) >= 2
    for p in parts:
        sub = read_model(os.path.join(out_dir, p))
        assert sub.num_reg_frames() > 0


def test_image_deleter(model_dir, tmp_path):
    recon = read_model(model_dir)
    names = [recon.images[i].name for i in sorted(recon.reg_image_ids())[:2]]
    names_path = tmp_path / "names.txt"
    names_path.write_text("\n".join(names))
    out_dir = str(tmp_path / "deleted")
    cli_main(["image_deleter", "--input_path", model_dir,
              "--output_path", out_dir, "--image_names_path", str(names_path)])
    sub = read_model(out_dir)
    assert sub.num_reg_frames() == recon.num_reg_frames() - 2
    kept_names = {sub.images[i].name for i in sub.reg_image_ids()}
    assert not (kept_names & set(names))


def test_image_filterer(model_dir, tmp_path):
    out_dir = str(tmp_path / "filtered")
    cli_main(["image_filterer", "--input_path", model_dir,
              "--output_path", out_dir, "--min_num_observations", "10"])
    sub = read_model(out_dir)
    for iid in sub.reg_image_ids():
        n_3d = int(np.sum(np.asarray(sub.images[iid].points2D_p3d) >= 0))
        assert n_3d >= 10


def test_database_cleaner(db_and_gt, tmp_path):
    import shutil

    path = str(tmp_path / "db.db")
    shutil.copy(db_and_gt[0], path)
    cli_main(["database_cleaner", "--database_path", path, "--type", "matches"])
    db = Database(path)
    assert db.num_verified_pairs() == 0
    assert db.num_images() > 0
    db.close()
    cli_main(["database_cleaner", "--database_path", path, "--type", "all"])
    db = Database(path)
    assert db.num_images() == 0
    assert len(db.read_cameras()) == 0
    db.close()


def test_rig_configurator(tmp_path, capsys):
    from colmap_tpu.scene.types import Camera

    path = str(tmp_path / "rig.db")
    db = Database(path)
    cid1 = db.write_camera(Camera.create(1, 1, 500.0, 640, 480))
    cid2 = db.write_camera(Camera.create(2, 1, 500.0, 640, 480))
    for k in range(3):
        db.write_image(f"left/{k:04d}.png", cid1)
        db.write_image(f"right/{k:04d}.png", cid2)
    db.commit()
    config = [{
        "cameras": [
            {"image_prefix": "left/", "ref_sensor": True},
            {
                "image_prefix": "right/",
                "cam_from_rig_rotation": [1.0, 0.0, 0.0, 0.0],
                "cam_from_rig_translation": [0.2, 0.0, 0.0],
            },
        ]
    }]
    cfg_path = tmp_path / "rig_config.json"
    cfg_path.write_text(json.dumps(config))
    cli_main(["rig_configurator", "--database_path", path,
              "--rig_config_path", str(cfg_path)])
    out = capsys.readouterr().out
    assert "1 rigs, 3 frames" in out
    rigs = db.read_rigs()
    frames = db.read_frames()
    db2 = Database(path)
    rigs = db2.read_rigs()
    frames = db2.read_frames()
    assert len(rigs) == 1
    assert len(frames) == 3
    assert all(len(f.data_ids) == 2 for f in frames)
    db2.close()
    db.close()


def test_spatial_matcher(tmp_path, capsys):
    # Build a DB with pose priors: positions along a line; neighbors match.
    import shutil

    d = tmp_path
    path = str(d / "db.db")
    db = Database(path)
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=6, num_points3D=100, seed=2,
        prior_position=True,
    )
    synthesize_dataset(opt, database=db)
    # Drop existing matches so the spatial matcher does the work.
    db.conn.execute("DELETE FROM two_view_geometries")
    db.conn.execute("DELETE FROM matches")
    db.commit()
    db.close()
    cli_main(["spatial_matcher", "--database_path", path,
              "--max_distance", "1000000"])
    out = capsys.readouterr().out
    assert "spatial pairs" in out
    db = Database(path)
    assert db.num_verified_pairs() > 0
    db.close()


def test_hierarchical_mapper_cli(db_and_gt, tmp_path):
    out_dir = str(tmp_path / "hier")
    cli_main(["hierarchical_mapper", "--database_path", db_and_gt[0],
              "--output_path", out_dir, "--leaf_max_num_images", "5",
              "--quiet"])
    models = sorted(os.listdir(out_dir))
    assert len(models) >= 1
    recon = read_model(os.path.join(out_dir, models[0]))
    assert recon.num_reg_frames() >= 5
