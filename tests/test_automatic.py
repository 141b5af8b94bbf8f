"""One-click automatic reconstruction end-to-end (sparse + dense).

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
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.scene.synthetic_images import render_images


@pytest.mark.slow
def test_automatic_reconstruction_sparse(tmp_path):
    # Ground-truth scene rendered to images.
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=6, num_points3D=90, seed=13,
        camera_model_id=1, camera_params=(600.0, 600.0, 240.0, 240.0),
        camera_width=480, camera_height=480,
        num_points2D_without_point3D=0,
    )
    gt = synthesize_dataset(opt)
    # Spread the points for well-conditioned two-view geometry.
    for p in gt.points3D.values():
        p.xyz = p.xyz * 1.8
    img_dir = str(tmp_path / "images")
    render_images(gt, img_dir, patch_world=0.12)

    options = AutomaticReconstructionOptions(
        workspace_path=str(tmp_path / "ws"),
        image_path=img_dir,
        data_type=DataType.INDIVIDUAL,
        quality=Quality.MEDIUM,
        camera_model="PINHOLE",
    )
    models = run_automatic_reconstruction(options)
    assert models, "no model"
    recon = models[0]
    assert recon.num_reg_frames() >= 5
    assert os.path.exists(str(tmp_path / "ws" / "sparse" / "0" / "cameras.bin"))
    # GT image names carry .png via the renderer; map by name for comparison.
    name_to_gt = {gt.images[i].name + ("" if gt.images[i].name.endswith(".png") else ".png"): i
                  for i in gt.reg_image_ids()}
    # compare via name-matched subset
    common = 0
    errs = []
    for iid in recon.reg_image_ids():
        nm = recon.images[iid].name
        if nm in name_to_gt:
            common += 1
    assert common >= 5
