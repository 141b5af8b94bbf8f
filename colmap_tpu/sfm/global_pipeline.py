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
        # View graph of relative poses: stored qvec/tvec, or E/F decomposed
        # on the fly (reference: PoseGraph::Load + relative-pose decomposition).
        from colmap_tpu.scene.pose_graph import PoseGraph

        graph = PoseGraph.load(
            self.database, min_num_inliers=self.options.min_num_matches
        )
        rel_poses: Dict[int, Pose] = graph.rel_poses()

        if self.options.verbose:
            logging.info("Collected %d relative poses", len(rel_poses))
        recon = Reconstruction()
        mapper = GlobalMapper(cache)
        ok = mapper.solve(recon, rel_poses, self.options.mapper)
        return recon if ok else None
