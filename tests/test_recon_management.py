"""ReconstructionManager, pruning, and rigid clustering.

reference test strategy: scene/reconstruction_manager (numbered dirs),
scene/reconstruction_pruning_test.cc (coverage-gain selection),
scene/reconstruction_clustering_test.cc (strong/weak component split).
"""

import numpy as np
import pytest

from colmap_tpu.scene.reconstruction_clustering import (
    ReconstructionClusteringOptions,
    cluster_reconstruction_frames,
    split_reconstruction_into_clusters,
)
from colmap_tpu.scene.reconstruction_manager import ReconstructionManager
from colmap_tpu.scene.reconstruction_pruning import find_redundant_points3D
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset


def _scene(seed=0, frames=6, points=150):
    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=frames, num_points3D=points, seed=seed
    )
    return synthesize_dataset(opt, rng=np.random.default_rng(seed))


def test_reconstruction_manager_roundtrip(tmp_path):
    mgr = ReconstructionManager()
    mgr.append(_scene(0))
    mgr.append(_scene(1, frames=4, points=60))
    mgr.write(str(tmp_path))
    mgr2 = ReconstructionManager()
    n = mgr2.read_all(str(tmp_path))
    assert n == 2
    assert mgr2.get(0).num_points3D() == mgr.get(0).num_points3D()
    assert mgr2.get(1).num_reg_frames() == mgr.get(1).num_reg_frames()
    mgr2.delete(0)
    assert len(mgr2) == 1
    mgr2.clear()
    assert len(mgr2) == 0


def test_find_redundant_points_keeps_coverage():
    recon = _scene(2, points=300)
    redundant = find_redundant_points3D(0.05, recon)
    # Dense synthetic scene: a meaningful share of points is redundant,
    # but coverage demands keep a core set.
    assert 0 < len(redundant) < recon.num_points3D()
    # With a zero gain threshold everything is kept.
    assert len(find_redundant_points3D(0.0, recon)) == 0


def test_cluster_reconstruction_single_component():
    recon = _scene(3)
    ids = cluster_reconstruction_frames(
        recon, ReconstructionClusteringOptions(min_num_reg_frames=2)
    )
    # Fully covisible synthetic scene: one cluster containing every frame.
    assert set(ids.values()) == {0}


def test_split_reconstruction_into_clusters():
    recon = _scene(4)
    subs = split_reconstruction_into_clusters(
        recon, ReconstructionClusteringOptions(min_num_reg_frames=2)
    )
    assert len(subs) == 1
    assert subs[0].num_reg_frames() == recon.num_reg_frames()
