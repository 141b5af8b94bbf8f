"""Hierarchical mapping: cluster → reconstruct per leaf → Sim3 merge.

reference behavior: src/colmap/controllers/hierarchical_pipeline.h:42-86 —
SceneClustering partition, an IncrementalPipeline per leaf cluster (the
reference parallelizes across threads; multi-host TPU deployments run one
cluster per host group), then greedy merging of overlapping
sub-reconstructions via robust Sim3 alignment on shared images.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from colmap_tpu.estimators.alignment import align_reconstructions, apply_sim3
from colmap_tpu.scene.clustering import SceneClusteringOptions, cluster_scene
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.sfm.incremental_pipeline import (
    IncrementalPipeline,
    IncrementalPipelineOptions,
)
from colmap_tpu.utils import logging


@dataclasses.dataclass
class HierarchicalPipelineOptions:
    clustering: SceneClusteringOptions = dataclasses.field(
        default_factory=SceneClusteringOptions
    )
    incremental: IncrementalPipelineOptions = dataclasses.field(
        default_factory=IncrementalPipelineOptions
    )
    min_common_images_for_merge: int = 3
    verbose: bool = False


def merge_reconstructions(
    dst: Reconstruction, src: Reconstruction, min_common: int = 3
) -> bool:
    """Align src onto dst via shared images and merge entities.

    reference behavior: MergeReconstructions (estimators/alignment.cc).
    """
    sim = align_reconstructions(src, dst, min_common_images=min_common)
    if sim is None:
        return False
    import copy

    src = copy.deepcopy(src)
    apply_sim3(src, *sim)
    for iid in src.reg_image_ids():
        img2 = src.images[iid]
        if iid not in dst.images:
            if img2.camera_id not in dst.cameras:
                dst.add_camera(src.cameras[img2.camera_id])
            frame2 = src.frames[img2.frame_id]
            if frame2.rig_id not in dst.rigs:
                dst.add_rig(src.rigs[frame2.rig_id])
            if frame2.frame_id not in dst.frames:
                dst.add_frame(frame2)
            elif not dst.frames[frame2.frame_id].has_pose():
                # The frame container can already exist in dst (e.g. another
                # image of the same rig frame) while still unposed — adopt
                # the aligned pose from src before registering.
                dst.frames[frame2.frame_id].rig_from_world = (
                    frame2.rig_from_world
                )
            new_img = copy.deepcopy(img2)
            new_img.points2D_p3d[:] = -1
            dst.add_image(new_img)
            dst.register_frame(new_img.frame_id)
        elif not dst.is_image_registered(iid):
            dst.frames[dst.images[iid].frame_id].rig_from_world = (
                src.frames[img2.frame_id].rig_from_world
            )
            dst.register_frame(dst.images[iid].frame_id)
    from colmap_tpu.scene.types import INVALID_POINT3D

    for pid, p in src.points3D.items():
        track = [
            el for el in p.track
            if el.image_id in dst.images
            and dst.is_image_registered(el.image_id)
            and dst.images[el.image_id].points2D_p3d[el.point2D_idx]
            == INVALID_POINT3D
        ]
        if len(track) >= 2:
            dst.add_point3D(p.xyz, track, color=p.color)
    return True


def _serialize_reconstruction(recon: Reconstruction) -> bytes:
    """Pack a reconstruction into one byte blob (zipped bin-model files)."""
    import io
    import os
    import tempfile
    import zipfile

    from colmap_tpu.scene.reconstruction_io import write_model

    with tempfile.TemporaryDirectory() as d:
        write_model(recon, d, fmt="bin")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for name in sorted(os.listdir(d)):
                z.write(os.path.join(d, name), name)
        return buf.getvalue()


def _deserialize_reconstruction(data: bytes) -> Reconstruction:
    import io
    import tempfile
    import zipfile

    from colmap_tpu.scene.reconstruction_io import read_model

    with tempfile.TemporaryDirectory() as d:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            z.extractall(d)
        return read_model(d)


def exchange_sub_reconstructions(subs: List[Reconstruction]) -> List[Reconstruction]:
    """Gather every process's leaf reconstructions onto all processes.

    Cluster-per-host dispatch (parallel/multihost.local_work_slice) leaves
    each process holding only its strided slice of the leaves; the greedy
    Sim3 merge needs all of them. Serializes via the bin model format and
    exchanges the blobs over DCN so every process merges the identical set
    deterministically. Single-process: identity.
    """
    import pickle

    from colmap_tpu.parallel import multihost

    if multihost.process_count() == 1:
        return subs
    payload = pickle.dumps([_serialize_reconstruction(r) for r in subs])
    blobs = multihost.all_gather_bytes(payload)
    out: List[Reconstruction] = []
    for blob in blobs:
        out.extend(_deserialize_reconstruction(b) for b in pickle.loads(blob))
    return out


class HierarchicalPipeline:
    def __init__(self, options: HierarchicalPipelineOptions, database: Database):
        self.options = options
        self.database = database

    def run(self) -> List[Reconstruction]:
        # Build the pair-weight graph from verified geometries.
        from colmap_tpu.utils.types import pair_id_to_image_pair

        weights = {}
        image_ids = [iid for (iid, _, _) in self.database.read_images()]
        for (id1, id2, g) in self.database.read_all_two_view_geometries():
            if g is not None and len(g.inlier_matches) > 0:
                weights[(id1, id2)] = float(len(g.inlier_matches))
        clusters = cluster_scene(image_ids, weights, self.options.clustering)
        if self.options.verbose:
            logging.info("Clustered %d images into %d leaves", len(image_ids), len(clusters))

        # Reconstruct each leaf independently. Multi-host: each process
        # takes a strided slice of the leaves (cluster-per-host dispatch,
        # parallel/multihost.py); single-host this is all of them.
        from colmap_tpu.parallel import multihost

        local = set(
            ci for ci, _ in multihost.local_work_slice(list(enumerate(clusters)))
        )
        subs: List[Reconstruction] = []
        for ci, cluster in enumerate(clusters):
            if ci not in local:
                continue
            names = {
                name for (iid, name, _) in self.database.read_images()
                if iid in set(cluster)
            }
            from colmap_tpu.scene.database_cache import DatabaseCache
            from colmap_tpu.sfm.incremental_mapper import IncrementalMapper

            cache = DatabaseCache.create(
                self.database,
                min_num_matches=self.options.incremental.min_num_matches,
                image_names=names,
            )
            pipeline = IncrementalPipeline(self.options.incremental, self.database)
            # Reuse the pipeline internals on the filtered cache.
            mapper = IncrementalMapper(cache)
            recon = Reconstruction()
            ok = pipeline._reconstruct_sub_model(mapper, recon)
            if ok:
                subs.append(recon)
                if self.options.verbose:
                    logging.info("  leaf %d: %d frames", ci, recon.num_reg_frames())

        # Multi-host: every process reconstructed a strided slice of the
        # leaves; gather all sub-reconstructions so the merge below runs on
        # the full set (identically on every process — callers write output
        # from process 0 only).
        subs = exchange_sub_reconstructions(subs)
        if not subs:
            return []
        # Greedy merge into the largest.
        subs.sort(key=lambda r: -r.num_reg_frames())
        merged = subs[0]
        rest = subs[1:]
        progress = True
        while rest and progress:
            progress = False
            for i, r in enumerate(rest):
                if merge_reconstructions(
                    merged, r, self.options.min_common_images_for_merge
                ):
                    rest.pop(i)
                    progress = True
                    break
        return [merged] + rest
