"""Generalized rig registration + structure-less fallback in the
incremental pipeline.

reference test strategy: sfm/incremental_mapper_test.cc (multi-camera rig
synthetic scenes) and incremental_pipeline_test.cc (ReconstructionNear
bounds 1e-2 deg / 1e-4 u on noise-free data).
"""

import jax
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _drop_executables_between_tests():
    """Release live XLA:CPU executables after each pipeline E2E test.

    Two full incremental-pipeline runs in one process push the live
    executable count past the threshold where the NEXT
    backend_compile_and_load segfaults (the historical serial-suite
    crash, reproduced in this module alone in r5). Clearing between
    tests keeps each test's compile load fresh; the persistent on-disk
    cache keeps the recompiles cheap."""
    yield
    jax.clear_caches()

from colmap_tpu.estimators.alignment import compare_reconstructions
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.sfm.incremental_pipeline import (
    IncrementalPipeline,
    IncrementalPipelineOptions,
)


@pytest.mark.slow
def test_incremental_pipeline_multi_camera_rig(tmp_path):
    db = Database(str(tmp_path / "db.db"))
    opt = SyntheticDatasetOptions(
        num_rigs=1,
        num_cameras_per_rig=2,
        num_frames_per_rig=6,
        num_points3D=200,
        camera_has_prior_focal_length=True,
        seed=4,
    )
    gt = synthesize_dataset(opt, database=db)
    db.commit()

    options = IncrementalPipelineOptions(min_model_size=4)
    models = IncrementalPipeline(options, db).run()
    db.close()
    assert len(models) >= 1
    recon = max(models, key=lambda m: m.num_reg_frames())
    # All 6 frames x 2 cameras registered.
    assert recon.num_reg_frames() == 6
    r = compare_reconstructions(recon, gt)
    assert r["num_common_images"] == 12
    assert r["max_rotation_error_deg"] < 1e-2
    assert r["max_center_error"] < 1e-4


@pytest.mark.slow
def test_incremental_pipeline_structure_less_only(tmp_path):
    db = Database(str(tmp_path / "db.db"))
    opt = SyntheticDatasetOptions(
        num_rigs=1,
        num_cameras_per_rig=1,
        num_frames_per_rig=7,
        num_points3D=250,
        camera_has_prior_focal_length=True,
        seed=5,
    )
    gt = synthesize_dataset(opt, database=db)
    db.commit()

    options = IncrementalPipelineOptions(
        min_model_size=4, structure_less_registration_only=True
    )
    models = IncrementalPipeline(options, db).run()
    db.close()
    assert len(models) >= 1
    recon = max(models, key=lambda m: m.num_reg_frames())
    assert recon.num_reg_frames() >= 6
    r = compare_reconstructions(recon, gt)
    assert r["max_rotation_error_deg"] < 0.1
    assert r["max_center_error"] < 1e-2
