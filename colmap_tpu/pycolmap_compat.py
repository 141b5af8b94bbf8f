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


def match_spatial(database_path: str, **kwargs):
    """reference: pycolmap.match_spatial (GPS/prior kNN pairing +
    match+verify; pycolmap/pipeline/match_features.cc)."""
    from colmap_tpu.cli.extra_commands import _prior_positions_enu
    from colmap_tpu.controllers.feature_pipeline import run_matches_import
    from colmap_tpu.feature.pairing import SpatialPairingOptions, spatial_pairs

    db = Database(database_path)
    ids, pos = _prior_positions_enu(db)
    if len(ids) < 2:
        db.close()
        return 0
    opts = SpatialPairingOptions(
        max_num_neighbors=kwargs.get("max_num_neighbors", 50),
        max_distance=kwargs.get("max_distance", 100.0),
        ignore_z=kwargs.get("ignore_z", True),
    )
    pairs = spatial_pairs(ids, pos, opts)
    n = run_matches_import(db, pairs)
    db.close()
    return n


def match_vocabtree(database_path: str, vocab_tree_path: str = "", **kwargs):
    """reference: pycolmap.match_vocabtree (retrieval pairing + match+verify)."""
    from colmap_tpu.cli.extra_commands import (
        _load_or_train_index,
        _read_all_descriptors,
    )
    from colmap_tpu.controllers.feature_pipeline import run_matches_import
    from colmap_tpu.utils.types import image_pair_to_pair_id

    db = Database(database_path)
    desc = _read_all_descriptors(
        db, max_per_image=kwargs.get("max_num_features", None)
    )
    index = _load_or_train_index(vocab_tree_path, desc)
    pairs, seen = [], set()
    num_images = kwargs.get("num_images", 10)
    for iid, d in desc.items():
        for r in index.query(d, num_images, exclude_image_id=iid):
            key = image_pair_to_pair_id(iid, r.image_id)
            if key not in seen:
                seen.add(key)
                pairs.append((min(iid, r.image_id), max(iid, r.image_id)))
    n = run_matches_import(db, pairs)
    db.close()
    return n


def match_image_pairs(database_path: str, pairs, **kwargs):
    """reference: pycolmap.match_image_pairs — match+verify an explicit
    pair list (names or ids)."""
    from colmap_tpu.controllers.feature_pipeline import run_matches_import

    db = Database(database_path)
    name_to_id = {name: iid for (iid, name, _) in db.read_images()}
    id_pairs = []
    for a, b in pairs:
        ia = name_to_id.get(a, a)
        ib = name_to_id.get(b, b)
        id_pairs.append((int(ia), int(ib)))
    n = run_matches_import(db, id_pairs)
    db.close()
    return n


def geometric_verification(database_path: str, pairs=None, **kwargs):
    """reference: pycolmap.geometric_verification — re-verify existing
    matches into two_view_geometries."""
    from colmap_tpu.controllers.feature_pipeline import run_matches_import
    from colmap_tpu.utils.types import pair_id_to_image_pair

    db = Database(database_path)
    if pairs is None:
        pairs = [
            pair_id_to_image_pair(pid) for (pid, _m) in db.read_all_matches()
        ]
    n = run_matches_import(db, pairs)
    db.close()
    return n


def guided_geometric_verification(database_path: str, pairs=None, **kwargs):
    """reference: pycolmap.guided_geometric_verification."""
    from colmap_tpu.controllers.feature_pipeline import (
        MatchingPipelineOptions,
        run_matches_import,
    )
    from colmap_tpu.utils.types import pair_id_to_image_pair

    db = Database(database_path)
    if pairs is None:
        pairs = [
            pair_id_to_image_pair(pid) for (pid, _m) in db.read_all_matches()
        ]
    n = run_matches_import(
        db, pairs, MatchingPipelineOptions(guided_matching=True)
    )
    db.close()
    return n


def hierarchical_mapping(
    database_path: str,
    image_path: str = "",
    output_path: Optional[str] = None,
    **kwargs,
):
    """reference: pycolmap.hierarchical_mapping."""
    from colmap_tpu.sfm.hierarchical_pipeline import (
        HierarchicalPipeline,
        HierarchicalPipelineOptions,
    )

    db = Database(database_path)
    pipe = HierarchicalPipeline(HierarchicalPipelineOptions(), db)
    recons = pipe.run()
    db.close()
    if output_path is not None:
        os.makedirs(output_path, exist_ok=True)
        for i, recon in enumerate(recons):
            write_model(recon, os.path.join(output_path, str(i)), fmt="bin")
    return {i: r for i, r in enumerate(recons)}


def import_images(
    database_path: str,
    image_path: str,
    camera_mode=None,
    image_names=None,
    **kwargs,
):
    """reference: pycolmap.import_images — register image rows (+ cameras
    from EXIF) in the database without extracting features."""
    from colmap_tpu.controllers.feature_pipeline import ImageReaderOptions

    db = Database(database_path)
    if image_names is None:
        image_names = sorted(
            f for f in os.listdir(image_path)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"))
        )
    opts = ImageReaderOptions()
    image_ids = []
    shared_camera_id = None
    for name in image_names:
        path = os.path.join(image_path, name)
        cam = infer_camera_from_image(path, options=opts)
        if camera_mode in (None, "SINGLE") and shared_camera_id is not None:
            camera_id = shared_camera_id
        else:
            # Let SQLite assign the id: avoids UNIQUE collisions with
            # pre-existing non-contiguous camera ids and the O(n^2)
            # read_cameras() scan per image.
            camera_id = db.write_camera(cam, use_camera_id=False)
            if camera_mode in (None, "SINGLE"):
                shared_camera_id = camera_id
        image_ids.append(db.write_image(name, camera_id))
    db.commit()
    db.close()
    return image_ids


def infer_camera_from_image(image_path: str, options=None):
    """reference: pycolmap.infer_camera_from_image — camera model + focal
    prior from EXIF (or default focal heuristic)."""
    from PIL import Image as PILImage

    from colmap_tpu.controllers.feature_pipeline import ImageReaderOptions
    from colmap_tpu.sensor import models as cm
    from colmap_tpu.utils.exif import read_exif

    from colmap_tpu.sensor.specs import focal_length_px_from_exif

    opts = options or ImageReaderOptions()
    with PILImage.open(image_path) as im:
        width, height = im.size
    exif = read_exif(image_path)
    model_id = cm.MODEL_NAME_TO_ID[opts.camera_model]
    focal, has_prior = focal_length_px_from_exif(
        exif, width, height, opts.default_focal_length_factor
    )
    cam = Camera.create(0, model_id, focal, width, height)
    cam.has_prior_focal_length = has_prior
    return cam


def calibrate_view_graph(database_path: str, **kwargs):
    """reference: pycolmap.calibrate_view_graph (view-graph focal
    calibration over UNCALIBRATED pairs)."""
    from colmap_tpu.estimators.view_graph_calibration import (
        calibrate_view_graph as _cal,
    )
    from colmap_tpu.sensor import models as cm

    db = Database(database_path)
    cameras = db.read_cameras()
    images = {iid: cid for (iid, _, cid) in db.read_images()}
    edges = []
    for (id1, id2, g) in db.read_all_two_view_geometries():
        if g is None or g.F is None or id1 not in images or id2 not in images:
            continue
        edges.append((images[id1], images[id2], g.F))
    camera_ids = sorted(cameras.keys())
    prior_focals = {
        cid: float(cm.mean_focal_length(cameras[cid].model_id, cameras[cid].params))
        for cid in camera_ids
    }
    pps = {}
    for cid in camera_ids:
        pp = cm.principal_point_idxs(int(cameras[cid].model_id))
        pps[cid] = (
            float(cameras[cid].params[pp[0]]),
            float(cameras[cid].params[pp[1]]),
        )
    out = _cal(camera_ids, prior_focals, pps, edges)
    db.close()
    return out


def undistort_images(
    output_path: str,
    input_path: str,
    image_path: str,
    **kwargs,
):
    """reference: pycolmap.undistort_images (COLMAP-layout MVS workspace)."""
    from colmap_tpu.cli.main import _cmd_image_undistorter

    class _Args:
        pass

    args = _Args()
    args.image_path = image_path
    args.input_path = input_path
    args.output_path = output_path
    args.output_type = kwargs.get("output_type", "COLMAP")
    _cmd_image_undistorter(args)


def patch_match_stereo(workspace_path: str, **kwargs):
    """reference: pycolmap.patch_match_stereo."""
    from PIL import Image as PILImage

    from colmap_tpu.mvs.workspace import run_patch_match_workspace
    from colmap_tpu.scene.reconstruction_io import read_model

    recon = read_model(os.path.join(workspace_path, "sparse"))
    images = {}
    for iid in recon.reg_image_ids():
        name = recon.images[iid].name
        p = os.path.join(workspace_path, "images", name)
        if os.path.exists(p):
            images[iid] = (
                np.asarray(PILImage.open(p).convert("L"), dtype=np.float32)
                / 255.0
            )
    return run_patch_match_workspace(
        recon, images, workspace_path,
        geom_consistency=kwargs.get("geom_consistency", False),
        write_consistency_graph=kwargs.get("write_consistency_graph", False),
    )


def stereo_fusion(output_path: str, workspace_path: str, **kwargs):
    """reference: pycolmap.stereo_fusion."""
    from colmap_tpu.mvs.workspace import run_fusion_workspace
    from colmap_tpu.scene.reconstruction_io import read_model

    recon = read_model(os.path.join(workspace_path, "sparse"))
    pts, normals, vis = run_fusion_workspace(recon, workspace_path, output_path)
    return {"num_points": len(pts)}


def poisson_meshing(input_path: str, output_path: str, **kwargs):
    """reference: pycolmap.poisson_meshing (fused PLY -> mesh)."""
    from colmap_tpu.mvs.meshing import poisson_mesh
    from colmap_tpu.utils.ply import read_ply, write_ply_mesh

    cloud = read_ply(input_path)
    verts, faces, _colors = poisson_mesh(cloud["points"], cloud.get("normals"))
    write_ply_mesh(output_path, verts, faces)
    return {"num_vertices": len(verts), "num_faces": len(faces)}


def set_random_seed(seed: int):
    """reference: pycolmap.set_random_seed — stored for pipelines that take
    explicit seeds (JAX keys thread seeds explicitly; this sets the default)."""
    global _default_seed
    _default_seed = int(seed)


_default_seed = 0


# ---------------------------------------------------------------------------
# Class surface + estimator bindings (reference: src/pycolmap/main.cc:34-75
# binds every layer; these re-export the native classes under the
# pycolmap names and wrap the RANSAC cores with pycolmap's dict returns).

from colmap_tpu.geometry.rigid3 import Rigid3 as Rigid3d  # noqa: F401,E402
from colmap_tpu.geometry.rigid3 import Sim3 as Sim3d  # noqa: F401,E402
from colmap_tpu.optim.ransac import RansacOptions as RANSACOptions  # noqa: F401,E402
from colmap_tpu.scene.correspondence_graph import (  # noqa: F401,E402
    CorrespondenceGraph,
)
from colmap_tpu.scene.database_cache import DatabaseCache  # noqa: F401,E402
from colmap_tpu.scene.types import TwoViewGeometryConfig  # noqa: F401,E402
from colmap_tpu.sfm.incremental_mapper import (  # noqa: F401,E402
    IncrementalMapper,
)
from colmap_tpu.sfm.incremental_pipeline import (  # noqa: F401,E402
    IncrementalPipelineOptions,
)


def _pad_pair(points1, points2):
    import jax.numpy as jnp

    from colmap_tpu.utils.bucketing import bucket_size, pad_rows

    n = len(points1)
    bucket = bucket_size(n, 256)
    x1 = jnp.asarray(pad_rows(np.asarray(points1, np.float64), bucket),
                     dtype=floatx())
    x2 = jnp.asarray(pad_rows(np.asarray(points2, np.float64), bucket),
                     dtype=floatx())
    mask = jnp.asarray(np.arange(bucket) < n)
    return n, x1, x2, mask


def estimate_fundamental_matrix(points1, points2, options=None):
    """reference: pycolmap.estimate_fundamental_matrix (7pt LO-RANSAC)."""
    import jax

    from colmap_tpu.estimators.two_view_geometry import _ransac_f
    from colmap_tpu.optim.ransac import RansacOptions

    n, x1, x2, mask = _pad_pair(points1, points2)
    res = _ransac_f(jax.random.PRNGKey(_default_seed), x1, x2, mask,
                    options or RansacOptions())
    if not bool(res.success):
        return None
    return {"F": np.asarray(res.model),
            "num_inliers": int(res.num_inliers),
            "inlier_mask": np.asarray(res.inlier_mask)[:n]}


def estimate_homography_matrix(points1, points2, options=None):
    """reference: pycolmap.estimate_homography_matrix (4pt DLT LO-RANSAC)."""
    import jax

    from colmap_tpu.estimators.two_view_geometry import _ransac_h
    from colmap_tpu.optim.ransac import RansacOptions

    n, x1, x2, mask = _pad_pair(points1, points2)
    res = _ransac_h(jax.random.PRNGKey(_default_seed), x1, x2, mask,
                    options or RansacOptions())
    if not bool(res.success):
        return None
    return {"H": np.asarray(res.model),
            "num_inliers": int(res.num_inliers),
            "inlier_mask": np.asarray(res.inlier_mask)[:n]}


def estimate_absolute_pose(points2D, points3D, camera, options=None):
    """reference: pycolmap.estimate_absolute_pose (P3P RANSAC, no refine)."""
    from colmap_tpu.estimators.pose import (
        AbsolutePoseOptions,
        estimate_absolute_pose as _est,
    )

    est_options = None
    if options is not None:
        # Translate pycolmap RANSACOptions into the estimator's options
        # (mirrors the F/H wrappers, which forward thresholds directly).
        est_options = AbsolutePoseOptions(
            max_error_px=options.max_error,
            min_inlier_ratio=options.min_inlier_ratio,
            confidence=options.confidence,
            min_num_trials=options.min_num_trials,
            max_num_trials=options.max_num_trials,
        )
    pose, inliers, _focal = _est(camera, points2D, points3D, est_options)
    if pose is None:
        return None
    return {"cam_from_world": pose, "num_inliers": int(inliers.sum()),
            "inlier_mask": inliers}


def refine_absolute_pose(cam_from_world, points2D, points3D, camera,
                         inlier_mask=None):
    """reference: pycolmap.refine_absolute_pose (LM on inliers)."""
    from colmap_tpu.estimators.pose import refine_absolute_pose as _ref

    if inlier_mask is None:
        inlier_mask = np.ones(len(points2D), dtype=bool)
    pose, camera, ok = _ref(camera, cam_from_world, points2D, points3D,
                            inlier_mask)
    return {"cam_from_world": pose, "success": bool(ok)}


def estimate_generalized_absolute_pose(points2D, points3D, camera_idxs,
                                       cams_from_rig, cameras, options=None):
    """reference: pycolmap.estimate_generalized_absolute_pose (gDLT)."""
    from colmap_tpu.estimators.generalized_pose import (
        estimate_generalized_absolute_pose as _est,
    )

    return _est(points2D, points3D, camera_idxs, cams_from_rig, cameras)


def estimate_generalized_relative_pose(points2D1, points2D2, camera_idxs1,
                                       camera_idxs2, cams_from_rig, cameras,
                                       options=None):
    """reference: pycolmap.estimate_generalized_relative_pose (17pt GEC)."""
    from colmap_tpu.estimators.generalized_pose import (
        estimate_generalized_relative_pose as _est,
    )

    return _est(points2D1, points2D2, camera_idxs1, camera_idxs2,
                cams_from_rig, cameras)


def estimate_triangulation(points2D, cams_from_world, cameras, options=None):
    """reference: pycolmap.estimate_triangulation (RANSAC over view pairs).

    points2D (V, 2) pixel observations, one per view; returns the robust
    3D point and the per-view inlier mask.
    """
    import jax.numpy as jnp

    from colmap_tpu.estimators.triangulation import (
        TriangulationOptions,
        estimate_triangulation as _est,
    )
    from colmap_tpu.sensor import models as cm

    V = len(points2D)
    R = np.stack([p.rotmat() if hasattr(p, "rotmat")
                  else np.asarray(p)[:3, :3] for p in cams_from_world])
    t = np.stack([np.asarray(p.t) if hasattr(p, "t")
                  else np.asarray(p)[:3, 3] for p in cams_from_world])
    xn = np.stack([
        np.asarray(cm.cam_from_img(cameras[v].model_id,
                                   jnp.asarray(cameras[v].params),
                                   jnp.asarray(points2D[v])[None])[0][0])
        for v in range(V)
    ])
    res = _est(jnp.asarray(R, dtype=floatx()), jnp.asarray(t, dtype=floatx()),
               jnp.asarray(xn, dtype=floatx()),
               jnp.ones(V, dtype=bool), options or TriangulationOptions())
    if not bool(res["success"]):
        return None
    return {"xyz": np.asarray(res["xyz"]),
            "inlier_mask": np.asarray(res["inlier_mask"])}


def estimate_two_view_geometry(camera1, points1, camera2, points2,
                               matches=None, options=None):
    """reference: pycolmap.estimate_two_view_geometry (full decision tree)."""
    from colmap_tpu.estimators.two_view_geometry import (
        TwoViewGeometryOptions,
        estimate_two_view_geometry as _est,
    )

    if matches is None:
        n = min(len(points1), len(points2))
        matches = np.stack([np.arange(n), np.arange(n)], axis=1)
    return _est(camera1, np.asarray(points1), camera2, np.asarray(points2),
                np.asarray(matches), options or TwoViewGeometryOptions())


def estimate_two_view_geometry_pose(camera1, points1, camera2, points2, g):
    """reference: pycolmap.estimate_two_view_geometry_pose — recover the
    relative pose for an already-classified TwoViewGeometry."""
    from colmap_tpu.estimators.two_view_geometry import _recover_pose

    return _recover_pose(g, camera1, np.asarray(points1), camera2,
                         np.asarray(points2))
