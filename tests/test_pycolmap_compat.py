"""pycolmap-compatible API smoke tests.

reference test strategy: src/pycolmap/pipeline/*_test.py,
python/examples/custom_incremental_pipeline_test.py:44-168.
"""

import numpy as np
import pytest

import colmap_tpu.pycolmap_compat as pycolmap
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset


def test_reconstruction_read_write(tmp_path):
    opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=4, num_points3D=30, seed=0)
    recon = synthesize_dataset(opt)
    r = pycolmap.Reconstruction()
    r.__dict__.update(recon.__dict__)
    r.write(str(tmp_path))
    r2 = pycolmap.Reconstruction(str(tmp_path))
    assert r2.num_points3D() == 30
    assert r2.num_reg_frames() == 4


def test_incremental_mapping_from_database(tmp_path):
    db_path = str(tmp_path / "db.db")
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=6, num_points3D=100, seed=5,
        camera_has_prior_focal_length=True,
    )
    db = pycolmap.Database(db_path)
    gt = synthesize_dataset(opt, database=db)
    db.close()
    models = pycolmap.incremental_mapping(db_path, output_path=str(tmp_path / "sparse"))
    assert 0 in models
    assert models[0].num_reg_frames() == 6
    cmp = pycolmap.compare_reconstructions(models[0], gt)
    assert cmp["max_rotation_error_deg"] < 0.5


def test_bundle_adjustment_api():
    opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=5, num_points3D=60, seed=2)
    recon = synthesize_dataset(opt)
    from colmap_tpu.scene.synthetic import add_noise

    add_noise(recon, np.random.default_rng(0), point3D_stddev=0.02)
    summary = pycolmap.bundle_adjustment(recon)
    assert summary["final_cost"] < summary["initial_cost"]


def test_estimate_absolute_pose_api():
    rng = np.random.default_rng(3)
    from colmap_tpu.scene.types import Camera, Pose
    from colmap_tpu.geometry import rotation as rot
    import jax.numpy as jnp
    from colmap_tpu.sensor import models as cm

    cam = Camera.create(1, 1, 700.0, 800, 600)
    q = np.asarray(rot.quat_from_axis_angle(jnp.asarray([0.3, 1.0, 0.2]), 0.5))
    pose_gt = Pose(q, rng.standard_normal(3))
    Xc = rng.uniform(-2, 2, (80, 3))
    Xc[:, 2] = rng.uniform(3, 9, 80)
    X = pose_gt.inverse().apply(Xc)
    xy, _ = cm.img_from_cam(1, jnp.asarray(cam.params), jnp.asarray(Xc))
    result = pycolmap.estimate_and_refine_absolute_pose(np.asarray(xy), X, cam)
    assert result is not None
    assert result["cam_from_world"].angle_to(pose_gt) < np.deg2rad(0.05)


def test_pipeline_wrapper_surface():
    """Every pipeline function the reference pycolmap exposes has a
    counterpart here (reference: src/pycolmap/pipeline/*.cc)."""
    import colmap_tpu.pycolmap_compat as pc

    for name in [
        "extract_features", "match_exhaustive", "match_sequential",
        "match_spatial", "match_vocabtree", "match_image_pairs",
        "verify_matches", "geometric_verification",
        "guided_geometric_verification", "incremental_mapping",
        "hierarchical_mapping", "bundle_adjustment", "triangulate_points",
        "import_images", "infer_camera_from_image", "calibrate_view_graph",
        "undistort_images", "patch_match_stereo", "stereo_fusion",
        "poisson_meshing", "set_random_seed",
    ]:
        assert callable(getattr(pc, name)), name


def test_geometric_verification_api(tmp_path):
    """geometric_verification re-verifies stored matches into
    two_view_geometries (reference: pycolmap.verify_matches /
    geometric_verification bindings)."""
    db_path = str(tmp_path / "db.db")
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=4, num_points3D=80, seed=9,
        camera_has_prior_focal_length=True,
    )
    db = pycolmap.Database(db_path)
    synthesize_dataset(opt, database=db)
    # Wipe verified geometries to force re-verification.
    db.conn.execute("DELETE FROM two_view_geometries")
    db.commit()
    db.close()
    n = pycolmap.geometric_verification(db_path)
    assert n > 0
    db = pycolmap.Database(db_path)
    assert sum(1 for _ in db.read_all_two_view_geometries()) == n
    db.close()
