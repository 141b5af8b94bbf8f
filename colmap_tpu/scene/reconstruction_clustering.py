"""Reconstruction clustering: split into rigidly-connected frame clusters.

reference behavior: src/colmap/scene/reconstruction_clustering.{h,cc} —
covisibility counts between registered frame pairs, an adaptive edge
threshold (median - MAD, floored by min_edge_weight_threshold), union-find
over strong edges, clusters ordered by size (largest = 0), clusters below
min_num_reg_frames discarded (-1). Used after global SfM to drop weakly
connected components (controllers/reconstruction_clustering.*).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from colmap_tpu.scene.reconstruction import Reconstruction


@dataclasses.dataclass
class ReconstructionClusteringOptions:
    """reference: reconstruction_clustering.h:40-62."""

    min_covisibility_count: int = 5
    min_edge_weight_threshold: float = 20.0
    min_num_reg_frames: int = 3


def cluster_reconstruction_frames(
    recon: Reconstruction,
    options: ReconstructionClusteringOptions = ReconstructionClusteringOptions(),
) -> Dict[int, int]:
    """frame_id -> cluster id (largest cluster = 0; -1 = discarded)."""
    nodes = set(recon.reg_frame_ids())
    if not nodes:
        return {}

    # Covisibility counts over frame pairs (tracks of length > 2).
    cov: Dict[tuple, int] = {}
    for p in recon.points3D.values():
        if len(p.track) <= 2:
            continue
        fids = [recon.images[el.image_id].frame_id for el in p.track]
        for i in range(len(fids)):
            for j in range(i + 1, len(fids)):
                if fids[i] == fids[j]:
                    continue
                key = (min(fids[i], fids[j]), max(fids[i], fids[j]))
                cov[key] = cov.get(key, 0) + 1

    edges = {k: v for k, v in cov.items() if v >= options.min_covisibility_count}
    if not edges:
        return {f: -1 for f in nodes}

    # Adaptive threshold: median - MAD, floored (reference :166-180).
    w = np.array(list(edges.values()), dtype=np.float64)
    med = np.median(w)
    mad = np.median(np.abs(w - med))
    threshold = max(med - mad, options.min_edge_weight_threshold)

    # Union-find over strong edges.
    parent: Dict[int, int] = {f: f for f in nodes}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (f1, f2), weight in edges.items():
        if weight >= threshold and f1 in parent and f2 in parent:
            r1, r2 = find(f1), find(f2)
            if r1 != r2:
                parent[r2] = r1

    groups: Dict[int, List[int]] = {}
    for f in nodes:
        groups.setdefault(find(f), []).append(f)
    ordered = sorted(groups.values(), key=len, reverse=True)

    cluster_ids: Dict[int, int] = {}
    next_id = 0
    for cluster in ordered:
        if len(cluster) >= options.min_num_reg_frames:
            for f in cluster:
                cluster_ids[f] = next_id
            next_id += 1
        else:
            for f in cluster:
                cluster_ids[f] = -1
    return cluster_ids


def split_reconstruction_into_clusters(
    recon: Reconstruction,
    options: ReconstructionClusteringOptions = ReconstructionClusteringOptions(),
) -> List[Reconstruction]:
    """Sub-reconstructions per rigid cluster, largest first (reference:
    controllers/reconstruction_clustering.cc splits after global SfM)."""
    from colmap_tpu.cli.extra_commands import _submodel_for_images

    cluster_ids = cluster_reconstruction_frames(recon, options)
    n_clusters = max((c for c in cluster_ids.values()), default=-1) + 1
    out = []
    for c in range(n_clusters):
        keep_frames = {f for f, cid in cluster_ids.items() if cid == c}
        keep_images = {
            iid
            for iid, img in recon.images.items()
            if img.frame_id in keep_frames
        }
        out.append(_submodel_for_images(recon, keep_images))
    return out


def prune_weakly_connected_frames(
    recon: Reconstruction,
    options: ReconstructionClusteringOptions = ReconstructionClusteringOptions(),
) -> List[int]:
    """Deregister frames outside the largest cluster (reference:
    GlobalPipeline pruning stage). Returns the pruned frame ids."""
    cluster_ids = cluster_reconstruction_frames(recon, options)
    pruned = [f for f, cid in cluster_ids.items() if cid != 0]
    for f in pruned:
        recon.deregister_frame(f)
    return pruned
