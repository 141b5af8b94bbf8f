"""End-to-end incremental mapping on synthetic data.

reference test strategy: controllers/incremental_pipeline_test.cc:44-70 —
synthesize a database, run the pipeline, assert the reconstruction matches
ground truth (ReconstructionNear: rotation ≤ 1e-2 deg, center ≤ 1e-4 units
for noise-free input; relaxed bounds with noise/outliers).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.estimators.alignment import compare_reconstructions
from colmap_tpu.estimators.pose import estimate_absolute_pose
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import (
    MatchConfig,
    SyntheticDatasetOptions,
    synthesize_dataset,
)
from colmap_tpu.sfm.incremental_pipeline import (
    IncrementalPipeline,
    IncrementalPipelineOptions,
)


def test_absolute_pose_synthetic():
    """P3P RANSAC + refine recovers a camera pose from 2D-3D matches."""
    rng = np.random.default_rng(0)
    from colmap_tpu.scene.types import Camera, Pose
    from colmap_tpu.geometry import rotation as rot
    import jax.numpy as jnp

    cam = Camera.create(1, 2, 1280.0, 1024, 768)  # SIMPLE_RADIAL
    cam.params[3] = 0.02
    q = np.asarray(rot.quat_from_axis_angle(jnp.asarray(rng.standard_normal(3)), 0.4))
    pose_gt = Pose(q, rng.standard_normal(3))
    # Generate points in front of the camera, then map to world space.
    Xc = rng.uniform(-2, 2, (100, 3))
    Xc[:, 2] = rng.uniform(2, 8, 100)
    X = pose_gt.inverse().apply(Xc)
    from colmap_tpu.sensor import models as cm

    xy, ok = cm.img_from_cam(cam.model_id, jnp.asarray(cam.params), jnp.asarray(Xc))
    xy = np.asarray(xy)
    inb = (
        np.asarray(ok) & (xy[:, 0] > 0) & (xy[:, 0] < 1024) & (xy[:, 1] > 0) & (xy[:, 1] < 768)
    )
    X, xy = X[inb], xy[inb]
    assert len(X) >= 30
    # 30% outliers.
    n_out = len(X) // 3
    xy_noisy = xy.copy()
    xy_noisy[:n_out] = rng.uniform(0, [1024, 768], (n_out, 2))
    pose, inliers, _ = estimate_absolute_pose(cam, xy_noisy, X)
    assert pose is not None
    assert pose.angle_to(pose_gt) < np.deg2rad(0.1)
    np.testing.assert_allclose(pose.t, pose_gt.t, atol=1e-2)
    assert inliers[n_out:].mean() > 0.95


@pytest.mark.parametrize("match_config", [MatchConfig.EXHAUSTIVE, MatchConfig.CHAINED])
def test_incremental_pipeline_noise_free(match_config):
    opt = SyntheticDatasetOptions(
        num_rigs=1,
        num_frames_per_rig=8,
        num_points3D=120,
        num_points2D_without_point3D=5,
        seed=17,
        match_config=match_config,
        camera_has_prior_focal_length=True,
    )
    db = Database(":memory:")
    gt = synthesize_dataset(opt, database=db)

    pipeline = IncrementalPipeline(IncrementalPipelineOptions(), db)
    models = pipeline.run()
    assert len(models) >= 1
    recon = models[0]
    assert recon.num_reg_frames() == 8, f"registered {recon.num_reg_frames()}/8"
    cmp = compare_reconstructions(recon, gt)
    assert cmp["num_common_images"] == 8
    assert cmp["max_rotation_error_deg"] < 1e-1
    assert cmp["max_center_error"] < 1e-2


def test_incremental_pipeline_with_outlier_matches():
    opt = SyntheticDatasetOptions(
        num_rigs=1,
        num_frames_per_rig=6,
        num_points3D=150,
        num_points2D_without_point3D=10,
        seed=23,
        inlier_match_ratio=0.7,
        camera_has_prior_focal_length=True,
    )
    db = Database(":memory:")
    gt = synthesize_dataset(opt, database=db)
    pipeline = IncrementalPipeline(IncrementalPipelineOptions(), db)
    models = pipeline.run()
    assert len(models) >= 1
    recon = models[0]
    assert recon.num_reg_frames() >= 5
    cmp = compare_reconstructions(recon, gt)
    assert cmp["max_rotation_error_deg"] < 0.5
    assert cmp["max_center_error"] < 0.05
