"""Port of the reference's pure-Python custom incremental pipeline example
against pycolmap_compat (VERDICT r2 item 9 — the cheapest strong test of
API fidelity).

reference: python/examples/custom_incremental_pipeline.py:44-168 drives the
bound IncrementalMapper class directly: synthetic DB -> DatabaseCache ->
find_initial_image_pair -> register_initial_image_pair -> triangulate ->
global BA -> (find_next_images -> register_next_image -> triangulate ->
local BA)* -> final global refinement; its test
(custom_incremental_pipeline_test.py) compares against ground truth. The
flow below mirrors that structure through colmap_tpu.pycolmap_compat's
class surface, changing only the import line and the snapshot/callback
plumbing the example uses for progress display.
"""

import pytest

pytestmark = pytest.mark.slow


import numpy as np

import colmap_tpu.pycolmap_compat as pycolmap
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.scene.synthetic import (
    SyntheticDatasetOptions,
    synthesize_dataset,
)
from colmap_tpu.sfm.incremental_mapper import IncrementalMapperOptions


def reconstruct_sub_model(mapper, mapper_options, reconstruction):
    """Mirror of the example's reconstruct_sub_model flow (simplified: no
    snapshots, callbacks, or structure-less fallback)."""
    mapper.begin_reconstruction(reconstruction)

    # initialize_reconstruction equivalent.
    ret = mapper.find_initial_image_pair(mapper_options)
    assert ret is not None, "no good initial image pair found"
    id1, id2, cam2_from_cam1, inlier_matches = ret
    ok = mapper.register_initial_image_pair(
        id1, id2, cam2_from_cam1, inlier_matches, mapper_options
    )
    assert ok
    from colmap_tpu.sfm.incremental_triangulator import TriangulatorOptions

    tri_options = TriangulatorOptions()
    for image_id in (id1, id2):
        mapper.triangulate_image(image_id, tri_options)
    mapper.global_bundle_adjustment()
    mapper.filter_points(mapper_options)
    mapper.filter_frames(mapper_options)
    assert reconstruction.num_reg_frames() > 0
    assert len(reconstruction.points3D) > 0

    # Registration loop.
    reg_next_success, prev_reg_next_success = True, True
    while reg_next_success or prev_reg_next_success:
        prev_reg_next_success = reg_next_success
        reg_next_success = False
        for next_image_id in mapper.find_next_images(mapper_options):
            reg_next_success = mapper.register_next_image(
                next_image_id, mapper_options
            )
            if reg_next_success:
                break
        if reg_next_success:
            mapper.triangulate_image(next_image_id, tri_options)
            mapper.local_bundle_adjustment(next_image_id, mapper_options)
            mapper.filter_points(mapper_options)
            mapper.filter_frames(mapper_options)

    # Final global refinement.
    mapper.global_bundle_adjustment()
    mapper.filter_points(mapper_options)
    mapper.filter_frames(mapper_options)


def test_custom_incremental_pipeline_without_noise(tmp_path):
    """reference: custom_incremental_pipeline_test.py::test_without_noise."""
    db_path = str(tmp_path / "database.db")
    db = Database(db_path)
    options = SyntheticDatasetOptions(
        num_rigs=1, num_cameras_per_rig=1, num_frames_per_rig=9,
        num_points3D=120, camera_has_prior_focal_length=True,
    )
    gt = synthesize_dataset(options, db, rng=np.random.default_rng(11))

    # The example's entry objects, resolved through pycolmap_compat.
    cache = pycolmap.DatabaseCache.create(db)
    mapper = pycolmap.IncrementalMapper(cache)
    recon = Reconstruction()
    reconstruct_sub_model(mapper, IncrementalMapperOptions(), recon)

    assert recon.num_reg_frames() == 9
    from colmap_tpu.estimators.alignment import compare_reconstructions

    stats = compare_reconstructions(recon, gt)
    assert stats["num_common_images"] == 9
    # Reference synthetic bounds (custom_incremental_pipeline_test.py /
    # incremental_pipeline_test.cc:66-70).
    assert stats["max_rotation_error_deg"] < 1e-2
    assert stats["max_center_error"] < 1e-4
    db.close()
