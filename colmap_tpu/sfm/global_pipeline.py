"""Global reconstruction pipeline driver.

reference behavior: src/colmap/controllers/global_pipeline.{h,cc} —
DatabaseCache → pose-graph construction → (view-graph calibration) →
relative-pose decomposition → GlobalMapper::Solve → pruning → output.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from colmap_tpu.scene.database import Database
from colmap_tpu.scene.database_cache import DatabaseCache
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.scene.types import Pose, TwoViewGeometryConfig
from colmap_tpu.sfm.global_mapper import GlobalMapper, GlobalMapperOptions
from colmap_tpu.utils.types import image_pair_to_pair_id
from colmap_tpu.utils import logging


@dataclasses.dataclass
class GlobalPipelineOptions:
    min_num_matches: int = 15
    # View-graph calibration of focal lengths from F matrices before
    # relative-pose decomposition (reference: global_pipeline.cc runs
    # RunViewGraphCalibration first).
    view_graph_calibration: bool = True
    # Deregister frames outside the largest well-connected cluster after the
    # solve (reference: scene/reconstruction_pruning + global_pipeline.cc).
    prune_after_solve: bool = True
    mapper: GlobalMapperOptions = dataclasses.field(default_factory=GlobalMapperOptions)
    verbose: bool = False


class GlobalPipeline:
    def __init__(self, options: GlobalPipelineOptions, database: Database):
        self.options = options
        self.database = database

    def _calibrate_view_graph(self) -> None:
        """Estimate focals from F matrices of UNCALIBRATED pairs and write
        them back to the database's cameras before pose decomposition."""
        from colmap_tpu.estimators.view_graph_calibration import (
            calibrate_view_graph,
        )
        from colmap_tpu.scene.types import TwoViewGeometryConfig
        from colmap_tpu.sensor import models as camera_models

        cameras = self.database.read_cameras()
        images = {iid: cid for (iid, _, cid) in self.database.read_images()}
        edges = []
        for (id1, id2, g) in self.database.read_all_two_view_geometries():
            if (
                g is None
                or g.F is None
                or g.config != int(TwoViewGeometryConfig.UNCALIBRATED)
                or len(g.inlier_matches) < self.options.min_num_matches
            ):
                continue
            if id1 in images and id2 in images:
                edges.append((images[id1], images[id2], g.F))
        # Skip entirely when every contributing camera already has a
        # trustworthy prior focal (reference skips calibrated pairs).
        edges = [
            (c1, c2, F)
            for (c1, c2, F) in edges
            if not (
                cameras[c1].has_prior_focal_length
                and cameras[c2].has_prior_focal_length
            )
        ]
        if not edges:
            return
        cam_ids = sorted(cameras.keys())
        prior_focals = {c: cameras[c].mean_focal_length() for c in cam_ids}
        pps = {}
        for c in cam_ids:
            pp_idx = camera_models.principal_point_idxs(cameras[c].model_id)
            if len(pp_idx) == 2:
                pps[c] = (
                    float(cameras[c].params[pp_idx[0]]),
                    float(cameras[c].params[pp_idx[1]]),
                )
            else:
                pps[c] = (cameras[c].width / 2.0, cameras[c].height / 2.0)
        focals = calibrate_view_graph(cam_ids, prior_focals, pps, edges)
        for cid, f in focals.items():
            cam = cameras[cid]
            if cam.has_prior_focal_length or abs(f - prior_focals[cid]) < 1e-9:
                continue
            params = cam.params.copy()
            for k in camera_models.focal_length_idxs(cam.model_id):
                params[k] = f
            self.database.update_camera(
                dataclasses.replace(cam, params=params)
            )
            if self.options.verbose:
                logging.info(
                    "VGC: camera %d focal %.2f -> %.2f", cid, prior_focals[cid], f
                )

    def run(self) -> Optional[Reconstruction]:
        if self.options.view_graph_calibration:
            self._calibrate_view_graph()
        cache = DatabaseCache.create(
            self.database, min_num_matches=self.options.min_num_matches
        )
        # View graph of relative poses: stored qvec/tvec, or E/F decomposed
        # on the fly (reference: PoseGraph::Load + relative-pose decomposition).
        from colmap_tpu.scene.pose_graph import PoseGraph

        graph = PoseGraph.load(
            self.database, min_num_inliers=self.options.min_num_matches
        ).largest_connected_component()
        rel_poses: Dict[int, Pose] = graph.rel_poses()

        if self.options.verbose:
            logging.info("Collected %d relative poses", len(rel_poses))
        recon = Reconstruction()
        mapper = GlobalMapper(cache)
        ok = mapper.solve(recon, rel_poses, self.options.mapper)
        if not ok:
            return None
        if self.options.prune_after_solve:
            from colmap_tpu.scene.reconstruction_clustering import (
                prune_weakly_connected_frames,
            )

            pruned = prune_weakly_connected_frames(recon)
            if pruned and self.options.verbose:
                logging.info("Pruned %d weakly connected frames", len(pruned))
        return recon if recon.num_reg_frames() >= 2 else None
