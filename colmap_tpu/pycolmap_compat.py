"""pycolmap-compatible API surface.

reference behavior: src/pycolmap (pybind11 module binding every layer,
pycolmap/main.cc:34-75; pipeline functions in pycolmap/pipeline/*.cc).
This module exposes the same top-level function names and core classes so
scripts written against pycolmap (e.g. the reference's benchmark harness and
python/examples/custom_incremental_pipeline.py) can switch with
``import colmap_tpu.pycolmap_compat as pycolmap``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# Core data types re-exported under pycolmap's names.
from colmap_tpu.scene.database import Database  # noqa: F401
from colmap_tpu.scene.reconstruction import Reconstruction as _Reconstruction
from colmap_tpu.scene.reconstruction_io import read_model, write_model
from colmap_tpu.scene.types import (  # noqa: F401
    Camera,
    Frame,
    Image,
    Point3D,
    Pose,
    Rig,
    TrackElement,
    TwoViewGeometry,
)
from colmap_tpu.sensor.models import CameraModelId  # noqa: F401
from colmap_tpu.utils.dtypes import floatx


class Reconstruction(_Reconstruction):
    """pycolmap.Reconstruction-compatible constructor/read/write."""

    def __init__(self, path: Optional[str] = None):
        super().__init__()
        if path is not None:
            other = read_model(path)
            self.__dict__.update(other.__dict__)

    def read(self, path: str):
        other = read_model(path)
        self.__dict__.update(other.__dict__)

    def write(self, path: str):
        write_model(self, path, fmt="bin")

    def write_text(self, path: str):
        write_model(self, path, fmt="txt")


def extract_features(
    database_path: str,
    image_path: str,
    image_names: Optional[list] = None,
    camera_model: str = "SIMPLE_RADIAL",
    **kwargs,
):
    """reference: pycolmap.extract_features (pipeline/extract_features.cc)."""
    from colmap_tpu.controllers.feature_pipeline import (
        ImageReaderOptions,
        run_feature_extraction,
    )

    db = Database(database_path)
    ids = run_feature_extraction(
        db, image_path, image_names,
        ImageReaderOptions(camera_model=camera_model),
    )
    db.close()
    return ids


def match_exhaustive(database_path: str, **kwargs):
    """reference: pycolmap.match_exhaustive."""
    from colmap_tpu.controllers.feature_pipeline import run_exhaustive_matching

    db = Database(database_path)
    n = run_exhaustive_matching(db)
    db.close()
    return n


def match_sequential(database_path: str, **kwargs):
    from colmap_tpu.controllers.feature_pipeline import run_sequential_matching

    db = Database(database_path)
    n = run_sequential_matching(db)
    db.close()
    return n


def verify_matches(database_path: str, pairs, **kwargs):
    """reference: pycolmap.verify_matches."""
    from colmap_tpu.controllers.feature_pipeline import run_matches_import

    db = Database(database_path)
    n = run_matches_import(db, pairs)
    db.close()
    return n


def incremental_mapping(
    database_path: str,
    image_path: str = "",
    output_path: Optional[str] = None,
    options=None,
) -> Dict[int, Reconstruction]:
    """reference: pycolmap.incremental_mapping (pipeline/sfm.cc)."""
    from colmap_tpu.sfm.incremental_pipeline import (
        IncrementalPipeline,
        IncrementalPipelineOptions,
    )

    db = Database(database_path)
    pipeline = IncrementalPipeline(options or IncrementalPipelineOptions(), db)
    models = pipeline.run()
    out: Dict[int, Reconstruction] = {}
    for i, m in enumerate(models):
        r = Reconstruction()
        r.__dict__.update(m.__dict__)
        out[i] = r
        if output_path is not None:
            write_model(m, os.path.join(output_path, str(i)), fmt="bin")
    db.close()
    return out


def global_mapping(
    database_path: str, image_path: str = "", output_path: Optional[str] = None,
    options=None,
):
    """GLOMAP-style mapping (reference: global_mapper pipeline)."""
    from colmap_tpu.sfm.global_pipeline import GlobalPipeline, GlobalPipelineOptions

    db = Database(database_path)
    recon = GlobalPipeline(options or GlobalPipelineOptions(), db).run()
    db.close()
    if recon is not None and output_path is not None:
        write_model(recon, os.path.join(output_path, "0"), fmt="bin")
    return recon


def bundle_adjustment(reconstruction, options=None):
    """reference: pycolmap.bundle_adjustment."""
    from colmap_tpu.estimators import bundle_adjustment as ba
    from colmap_tpu.estimators.ba_setup import (
        problem_from_reconstruction,
        update_reconstruction,
    )

    problem, index = problem_from_reconstruction(reconstruction)
    opts = options or ba.BAOptions()
    masks = ba.default_masks(problem, index["model_id"], opts)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    solved, summary = ba.solve(problem, index["model_id"], opts, masks)
    update_reconstruction(reconstruction, solved, index)
    reconstruction.update_point3D_errors()
    return summary


def triangulate_points(reconstruction, database_path: str, **kwargs):
    """reference: pycolmap.triangulate_points."""
    from colmap_tpu.scene.database_cache import DatabaseCache
    from colmap_tpu.sfm.incremental_triangulator import (
        IncrementalTriangulator,
        TriangulatorOptions,
    )

    db = Database(database_path)
    cache = DatabaseCache.create(db)
    tri = IncrementalTriangulator(cache.correspondence_graph, reconstruction)
    n = tri.retriangulate(TriangulatorOptions())
    db.close()
    return n


def estimate_and_refine_absolute_pose(points2D, points3D, camera, **kwargs):
    """reference: pycolmap.estimate_and_refine_absolute_pose."""
    from colmap_tpu.estimators.pose import (
        estimate_absolute_pose,
        refine_absolute_pose,
    )

    pose, inliers, _ = estimate_absolute_pose(camera, points2D, points3D)
    if pose is None:
        return None
    pose, camera, ok = refine_absolute_pose(camera, pose, points2D, points3D, inliers)
    return {"cam_from_world": pose, "num_inliers": int(inliers.sum()),
            "inlier_mask": inliers}


def estimate_essential_matrix(points1, points2, camera1, camera2, **kwargs):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from colmap_tpu.estimators.two_view_geometry import _ransac_e
    from colmap_tpu.optim.ransac import RansacOptions
    from colmap_tpu.sensor import models as cm
    from colmap_tpu.utils.bucketing import bucket_size, pad_rows

    n = len(points1)
    bucket = bucket_size(n, 256)
    x1 = jnp.asarray(pad_rows(np.asarray(points1), bucket), dtype=floatx())
    x2 = jnp.asarray(pad_rows(np.asarray(points2), bucket), dtype=floatx())
    mask = jnp.asarray(np.arange(bucket) < n)
    x1n, _ = cm.cam_from_img(camera1.model_id, jnp.asarray(camera1.params), x1)
    x2n, _ = cm.cam_from_img(camera2.model_id, jnp.asarray(camera2.params), x2)
    th = 0.5 * (camera1.cam_from_img_threshold(4.0) + camera2.cam_from_img_threshold(4.0))
    res = _ransac_e(jax.random.PRNGKey(0), x1n, x2n, mask,
                    jnp.asarray(float(th)), RansacOptions())
    if not bool(res.success):
        return None
    return {"E": np.asarray(res.model),
            "num_inliers": int(res.num_inliers),
            "inlier_mask": np.asarray(res.inlier_mask)[:n]}


def align_reconstructions(src, tgt, **kwargs):
    from colmap_tpu.estimators.alignment import align_reconstructions as _align

    return _align(src, tgt)


def compare_reconstructions(recon1, recon2, **kwargs):
    from colmap_tpu.estimators.alignment import compare_reconstructions as _cmp

    return _cmp(recon1, recon2)
