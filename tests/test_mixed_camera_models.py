"""Heterogeneous camera models in one BA problem / pipeline run.

VERDICT r1 item 6 (reference: bundle_adjustment_ceres.h:40-116 handles any
model mix per problem via per-observation cost functors; here a lax.switch
over the static tuple of distinct models with parameter rows padded to the
largest model). The E2E test mixes SIMPLE_RADIAL and OPENCV_FISHEYE rigs
and must pass the reference synthetic bounds (1e-2 deg / 1e-4 u,
controllers/incremental_pipeline_test.cc:66-70).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import (
    SyntheticDatasetOptions,
    synthesize_dataset,
)
from colmap_tpu.sensor import models as camera_models


MIXED_OPTIONS = dict(
    camera_model_ids=(
        int(camera_models.CameraModelId.SIMPLE_RADIAL),
        int(camera_models.CameraModelId.OPENCV_FISHEYE),
    ),
    camera_params_list=(
        (1280.0, 512.0, 384.0, 0.02),
        (900.0, 900.0, 512.0, 384.0, 0.01, -0.005, 0.001, 0.0),
    ),
)


def _mixed_recon(num_frames_per_rig=4, num_points=120, seed=3):
    db = Database(":memory:")
    opt = SyntheticDatasetOptions(
        num_rigs=2, num_cameras_per_rig=1,
        num_frames_per_rig=num_frames_per_rig, num_points3D=num_points,
        camera_has_prior_focal_length=True, **MIXED_OPTIONS,
    )
    recon = synthesize_dataset(opt, db, rng=np.random.default_rng(seed))
    return recon, db


def test_mixed_problem_packs_and_solves():
    from colmap_tpu.estimators import bundle_adjustment as ba
    from colmap_tpu.estimators.ba_setup import (
        problem_from_reconstruction, update_reconstruction,
    )

    recon, _db = _mixed_recon()
    problem, index = problem_from_reconstruction(recon)
    assert isinstance(index["model_id"], tuple)
    assert len(index["model_id"]) == 2
    # Param rows padded to OPENCV_FISHEYE's 8 + 1 model column.
    assert problem.cam_params.shape[1] == 9

    options = ba.BAOptions(max_iterations=5, pcg_iterations=30)
    masks = ba.default_masks(problem, index["model_id"], options)
    # Model-position column must be constant.
    np.testing.assert_array_equal(np.asarray(masks.cam_mask[:, -1]), 0.0)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)

    cost0 = float(ba.compute_cost(problem, index["model_id"], options))
    # Residuals at the synthetic ground state must be ~0 for BOTH models —
    # this pins the switch dispatch to the right projection per camera.
    assert cost0 < 1e-6, cost0

    # Perturb and solve back.
    import jax.numpy as jnp

    perturbed = problem._replace(
        points=problem.points + 0.01 * np.random.default_rng(0).standard_normal(
            problem.points.shape
        )
    )
    solved, summary = ba.solve_packed(
        perturbed, index["model_id"], options, masks
    )
    assert summary["final_cost"] < 1e-8 * max(summary["initial_cost"], 1e-30) \
        or summary["final_cost"] < 1e-6
    update_reconstruction(recon, solved, index)


def test_mixed_filtering():
    from colmap_tpu.sfm.filtering import filter_points3D

    recon, _db = _mixed_recon()
    # Noise-free synthetic scene: nothing should be filtered.
    n = filter_points3D(recon, max_reproj_error=4.0, min_tri_angle_deg=0.5)
    assert n == 0
    assert len(recon.points3D) == 120


def test_mixed_incremental_mapper_e2e():
    from colmap_tpu.estimators.alignment import compare_reconstructions
    from colmap_tpu.sfm.incremental_pipeline import (
        IncrementalPipeline, IncrementalPipelineOptions,
    )

    db = Database(":memory:")
    opt = SyntheticDatasetOptions(
        num_rigs=2, num_cameras_per_rig=1, num_frames_per_rig=4,
        num_points3D=120, camera_has_prior_focal_length=True,
        **MIXED_OPTIONS,
    )
    gt = synthesize_dataset(opt, db, rng=np.random.default_rng(5))
    pipeline_options = IncrementalPipelineOptions(min_model_size=4)
    recons = IncrementalPipeline(pipeline_options, db).run()
    assert recons, "no reconstruction produced"
    best = max(recons, key=lambda r: r.num_reg_frames())
    assert best.num_reg_frames() == 8
    stats = compare_reconstructions(best, gt)
    assert stats["num_common_images"] == 8
    assert stats["max_rotation_error_deg"] < 1e-2
    assert stats["max_center_error"] < 1e-4
