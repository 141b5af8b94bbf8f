"""Hierarchical mapping tests: clustering, sub-reconstruction, merging.

reference test strategy: controllers/hierarchical_pipeline tests +
scene/scene_clustering_test.cc.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.scene.clustering import SceneClusteringOptions, cluster_scene
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.sfm.hierarchical_pipeline import (
    HierarchicalPipeline,
    HierarchicalPipelineOptions,
    merge_reconstructions,
)
from colmap_tpu.estimators.alignment import compare_reconstructions


def test_cluster_scene_two_groups():
    # Two densely connected groups with one weak bridge.
    ids = list(range(1, 21))
    weights = {}
    for a in range(1, 11):
        for b in range(a + 1, 11):
            weights[(a, b)] = 100.0
    for a in range(11, 21):
        for b in range(a + 1, 21):
            weights[(a, b)] = 100.0
    weights[(10, 11)] = 1.0
    clusters = cluster_scene(
        ids, weights, SceneClusteringOptions(leaf_max_num_images=12, image_overlap=2)
    )
    assert len(clusters) == 2
    core_sets = [set(c[:10]) for c in clusters]
    assert set(range(1, 11)) in core_sets
    assert set(range(11, 21)) in core_sets


def test_merge_reconstructions():
    opt = SyntheticDatasetOptions(num_rigs=1, num_frames_per_rig=8, num_points3D=60, seed=21)
    full = synthesize_dataset(opt)
    import copy

    # Two overlapping halves of the same scene.
    a = copy.deepcopy(full)
    b = copy.deepcopy(full)
    for fid in [7, 8]:
        a.deregister_frame(fid)
    for fid in [1, 2]:
        b.deregister_frame(fid)
    # Disturb b by a similarity (different gauge).
    b.transform(1.7, np.array([0.9, 0.1, 0.2, 0.1]) / np.linalg.norm([0.9, 0.1, 0.2, 0.1]),
                np.array([3.0, -1.0, 2.0]))
    assert merge_reconstructions(a, b)
    assert a.num_reg_frames() == 8
    cmp = compare_reconstructions(a, full)
    assert cmp["num_common_images"] == 8
    assert cmp["max_center_error"] < 1e-6


def test_hierarchical_pipeline_end_to_end():
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=10, num_points3D=120, seed=33,
        camera_has_prior_focal_length=True,
    )
    db = Database(":memory:")
    gt = synthesize_dataset(opt, database=db)
    options = HierarchicalPipelineOptions()
    options.clustering = SceneClusteringOptions(leaf_max_num_images=6, image_overlap=3)
    models = HierarchicalPipeline(options, db).run()
    assert models
    recon = models[0]
    assert recon.num_reg_frames() >= 9
    cmp = compare_reconstructions(recon, gt)
    assert cmp["max_rotation_error_deg"] < 0.5
    assert cmp["max_center_error"] < 0.05
