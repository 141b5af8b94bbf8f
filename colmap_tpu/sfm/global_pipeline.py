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


@dataclasses.dataclass
class GlobalPipelineOptions:
    min_num_matches: int = 15
    mapper: GlobalMapperOptions = dataclasses.field(default_factory=GlobalMapperOptions)
    verbose: bool = False


class GlobalPipeline:
    def __init__(self, options: GlobalPipelineOptions, database: Database):
        self.options = options
        self.database = database

    def run(self) -> Optional[Reconstruction]:
        cache = DatabaseCache.create(
            self.database, min_num_matches=self.options.min_num_matches
        )
        # Collect relative poses: stored qvec/tvec, or decompose E on the fly.
        rel_poses: Dict[int, Pose] = {}
        cameras = self.database.read_cameras()
        images = {iid: cid for (iid, _, cid) in self.database.read_images()}
        kps = {}
        for (id1, id2, g) in self.database.read_all_two_view_geometries():
            if g is None or len(g.inlier_matches) < self.options.min_num_matches:
                continue
            if g.config not in (
                int(TwoViewGeometryConfig.CALIBRATED),
                int(TwoViewGeometryConfig.UNCALIBRATED),
                int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC),
            ):
                continue
            pair_id = image_pair_to_pair_id(id1, id2)
            if g.cam2_from_cam1 is not None:
                rel_poses[pair_id] = g.cam2_from_cam1
                continue
            # Decompose the epipolar geometry into a relative pose.
            if id1 not in images or id2 not in images:
                continue
            from colmap_tpu.estimators.two_view_geometry import _recover_pose
            from colmap_tpu.scene.types import Camera

            cam1, cam2 = cameras[images[id1]], cameras[images[id2]]
            for iid in (id1, id2):
                if iid not in kps:
                    kps[iid] = self.database.read_keypoints(iid)
            _recover_pose(g, cam1, kps[id1][:, :2], cam2, kps[id2][:, :2])
            if g.cam2_from_cam1 is not None:
                rel_poses[pair_id] = g.cam2_from_cam1

        if self.options.verbose:
            print(f"Collected {len(rel_poses)} relative poses")
        recon = Reconstruction()
        mapper = GlobalMapper(cache)
        ok = mapper.solve(recon, rel_poses, self.options.mapper)
        return recon if ok else None
