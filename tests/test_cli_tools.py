"""CLI and model tool tests.

reference test strategy: exe/*_test.cc (CLI smoke tests on synthetic data).
"""

import os

import numpy as np
import pytest

from colmap_tpu.cli.main import main as cli_main
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction_io import read_model, write_model
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=5, num_points3D=50, seed=3)
    recon = synthesize_dataset(opt)
    write_model(recon, str(d), fmt="bin")
    return str(d)


def test_model_analyzer(model_dir, capsys):
    cli_main(["model_analyzer", "--path", model_dir])
    out = capsys.readouterr().out
    assert "Registered frames: 5" in out
    assert "Points: 50" in out


def test_model_converter_formats(model_dir, tmp_path):
    out_txt = tmp_path / "txt"
    cli_main(["model_converter", "--input_path", model_dir,
              "--output_path", str(out_txt), "--output_type", "TXT"])
    assert (out_txt / "cameras.txt").exists()
    back = read_model(str(out_txt))
    assert back.num_points3D() == 50

    out_ply = tmp_path / "m.ply"
    cli_main(["model_converter", "--input_path", model_dir,
              "--output_path", str(out_ply), "--output_type", "PLY"])
    from colmap_tpu.utils.ply import read_ply

    data = read_ply(str(out_ply))
    assert len(data["points"]) == 50

    out_nvm = tmp_path / "m.nvm"
    cli_main(["model_converter", "--input_path", model_dir,
              "--output_path", str(out_nvm), "--output_type", "NVM"])
    lines = open(out_nvm).read().splitlines()
    assert lines[0] == "NVM_V3"
    assert int(lines[2]) == 5  # images

    out_bundler = tmp_path / "m.out"
    cli_main(["model_converter", "--input_path", model_dir,
              "--output_path", str(out_bundler), "--output_type", "Bundler"])
    lines = open(out_bundler).read().splitlines()
    assert lines[0].startswith("# Bundle file")


def test_model_aligner(model_dir, tmp_path):
    # Transform a copy, align it back; poses must agree.
    recon = read_model(model_dir)
    recon.transform(2.0, np.array([1.0, 0, 0, 0]), np.array([1.0, 2.0, 3.0]))
    moved = tmp_path / "moved"
    write_model(recon, str(moved), fmt="bin")
    out = tmp_path / "aligned"
    cli_main(["model_aligner", "--input_path", str(moved),
              "--ref_model_path", model_dir, "--output_path", str(out)])
    aligned = read_model(str(out))
    ref = read_model(model_dir)
    for iid in ref.reg_image_ids():
        np.testing.assert_allclose(
            aligned.cam_from_world(iid).projection_center(),
            ref.cam_from_world(iid).projection_center(),
            atol=1e-6,
        )


def test_bundle_adjuster_cli(model_dir, tmp_path):
    out = tmp_path / "ba"
    cli_main(["bundle_adjuster", "--input_path", model_dir,
              "--output_path", str(out), "--max_num_iterations", "5"])
    back = read_model(str(out))
    assert back.num_points3D() == 50


def test_database_creator_cli(tmp_path):
    db_path = str(tmp_path / "db.db")
    cli_main(["database_creator", "--database_path", db_path])
    assert os.path.exists(db_path)
    db = Database(db_path)
    assert db.num_images() == 0
    db.close()


def test_undistortion_roundtrip():
    """Undistorted pinhole reprojection matches distorted observation rays."""
    import jax.numpy as jnp

    from colmap_tpu.image.undistortion import undistort_camera, undistort_image
    from colmap_tpu.scene.types import Camera
    from colmap_tpu.sensor import models as cm

    cam = Camera.create(1, 4, 600.0, 640, 480)  # OPENCV
    cam.params[4:] = [0.1, -0.05, 0.001, 0.001]
    ucam = undistort_camera(cam)
    assert ucam.model_id == 1  # PINHOLE
    # A grid of rays projects consistently through both cameras.
    uv = np.linspace(-0.3, 0.3, 7)
    uu, vv = np.meshgrid(uv, uv)
    rays = np.stack([uu.ravel(), vv.ravel(), np.ones(uu.size)], axis=-1)
    xy_u, ok_u = cm.img_from_cam(int(ucam.model_id), jnp.asarray(ucam.params), jnp.asarray(rays))
    uv_back, _ = cm.cam_from_img(int(ucam.model_id), jnp.asarray(ucam.params), xy_u)
    np.testing.assert_allclose(np.asarray(uv_back), rays[:, :2], atol=1e-9)

    # Warping a synthetic image: straight lines stay finite and inside.
    img = np.random.default_rng(0).uniform(0, 255, (480, 640)).astype(np.uint8)
    out = undistort_image(img, cam, ucam)
    assert out.shape == (480, 640)
    assert out.max() > 0
