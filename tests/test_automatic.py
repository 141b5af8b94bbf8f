"""One-click automatic reconstruction end-to-end.

reference test strategy: controllers/automatic_reconstruction tests.
"""

import os

import numpy as np
import pytest

from colmap_tpu.controllers.automatic import (
    AutomaticReconstructionOptions,
    DataType,
    Quality,
    run_automatic_reconstruction,
)
from colmap_tpu.estimators.alignment import compare_reconstructions
from tests.test_e2e_images import _render_scene


@pytest.mark.slow
def test_automatic_reconstruction_sparse(tmp_path):
    img_dir, names, gt, focal = _render_scene(tmp_path)

    from colmap_tpu.sfm.incremental_mapper import IncrementalMapperOptions
    from colmap_tpu.sfm.incremental_pipeline import IncrementalPipelineOptions

    options = AutomaticReconstructionOptions(
        workspace_path=str(tmp_path / "ws"),
        image_path=img_dir,
        data_type=DataType.INDIVIDUAL,
        quality=Quality.MEDIUM,
        camera_model="PINHOLE",
        mapper_options=IncrementalPipelineOptions(
            mapper=IncrementalMapperOptions(
                init_min_num_inliers=50, abs_pose_min_num_inliers=15
            )
        ),
    )
    models = run_automatic_reconstruction(options)
    assert models, "no model"
    recon = models[0]
    assert recon.num_reg_frames() >= len(names) - 1
    assert os.path.exists(str(tmp_path / "ws" / "sparse" / "0" / "cameras.bin"))
    cmp = compare_reconstructions(recon, gt)
    assert cmp["num_common_images"] >= len(names) - 1
    # The extractor guesses the focal length (no prior passed), so the
    # tolerance is looser than the calibrated end-to-end test.
    assert cmp["max_rotation_error_deg"] < 5.0
