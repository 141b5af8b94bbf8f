"""CLI subcommands batch 3: retrieval, view-graph, model and database tools.

reference behavior: src/colmap/exe/colmap.cc:92-159 — the commands here
complete the reference's subcommand surface: spatial/transitive/vocab_tree
matchers, vocab_tree_builder/retriever, hierarchical_mapper,
image_registrator, rotation_averager, view_graph_calibrator,
geometric_verifier, model_comparer/splitter/clusterer, image_deleter/
filterer, database_cleaner, rig_configurator, gui (stub).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


# ---------------------------------------------------------------------------
# helpers


def _prior_positions_enu(database):
    """Image prior positions in a metric local frame.

    WGS84 priors (coordinate_system=0) are converted to ENU around the first
    prior (reference: SpatialPairGenerator converts GPS via GPSTransform,
    controllers/pairing.cc).
    """
    priors = database.read_pose_priors()
    ids, pos, cs = [], [], []
    for prior in priors.values():
        if prior["position"] is None:
            continue
        ids.append(prior["data_id"])
        pos.append(prior["position"])
        cs.append(prior["coordinate_system"])
    if not ids:
        return [], np.zeros((0, 3))
    pos = np.asarray(pos, dtype=np.float64)
    if all(c == 0 for c in cs):  # WGS84
        from colmap_tpu.geometry.gps import ellipsoid_to_enu

        ref = pos[0]
        pos = np.stack(
            [
                np.asarray(
                    ellipsoid_to_enu(p[0], p[1], p[2], ref[0], ref[1], ref[2])
                ).reshape(3)
                for p in pos
            ]
        )
    return ids, pos


def collect_relative_poses(database, min_num_matches: int = 15):
    """pair_id -> relative Pose via the PoseGraph (scene/pose_graph.py)."""
    from colmap_tpu.scene.pose_graph import PoseGraph

    return PoseGraph.load(database, min_num_inliers=min_num_matches).rel_poses()


def _write_models(models, output_path):
    from colmap_tpu.scene.reconstruction_io import write_model

    os.makedirs(output_path, exist_ok=True)
    for i, recon in enumerate(models):
        out = os.path.join(output_path, str(i))
        write_model(recon, out, fmt="bin")
        print(
            f"Model {i}: {recon.num_reg_frames()} frames, "
            f"{recon.num_points3D()} points -> {out}"
        )


# ---------------------------------------------------------------------------
# matchers


def _cmd_spatial_matcher(args):
    from colmap_tpu.controllers.feature_pipeline import run_matches_import
    from colmap_tpu.feature.pairing import SpatialPairingOptions, spatial_pairs
    from colmap_tpu.scene.database import Database

    db = Database(args.database_path, must_exist=True)
    ids, pos = _prior_positions_enu(db)
    if len(ids) < 2:
        print("Not enough pose priors for spatial matching")
        sys.exit(1)
    pairs = spatial_pairs(
        ids,
        pos,
        SpatialPairingOptions(
            max_num_neighbors=args.max_num_neighbors,
            max_distance=args.max_distance,
            ignore_z=args.ignore_z,
        ),
    )
    n = run_matches_import(db, pairs)
    print(f"Verified {n} of {len(pairs)} spatial pairs")
    db.close()


def _cmd_transitive_matcher(args):
    from colmap_tpu.controllers.feature_pipeline import run_matches_import
    from colmap_tpu.feature.pairing import TransitivePairingOptions, transitive_pairs
    from colmap_tpu.scene.database import Database

    db = Database(args.database_path, must_exist=True)
    pairs = transitive_pairs(
        db, TransitivePairingOptions(num_iterations=args.num_iterations)
    )
    n = run_matches_import(db, pairs)
    print(f"Verified {n} of {len(pairs)} transitive pairs")
    db.close()


def _read_all_descriptors(db, max_per_image=None):
    out = {}
    for (iid, _, _) in db.read_images():
        d = db.read_descriptors(iid)
        if max_per_image and len(d) > max_per_image:
            d = d[:max_per_image]
        out[iid] = d
    return out


def _npz_path(path):
    """np.savez appends .npz when missing; normalize so builder and loader
    agree on the on-disk name."""
    return path if path.endswith(".npz") else path + ".npz"


def _cmd_vocab_tree_builder(args):
    from colmap_tpu.retrieval.visual_index import (
        build_vocabulary,
        build_vocabulary_tree,
    )
    from colmap_tpu.scene.database import Database

    args.vocab_tree_path = _npz_path(args.vocab_tree_path)
    db = Database(args.database_path, must_exist=True)
    desc = _read_all_descriptors(db, max_per_image=args.max_features_per_image)
    all_desc = np.concatenate([d for d in desc.values() if len(d)])
    rng = np.random.default_rng(0)
    if len(all_desc) > args.max_num_descriptors:
        all_desc = all_desc[
            rng.choice(len(all_desc), args.max_num_descriptors, replace=False)
        ]
    if args.depth > 1:
        tree = build_vocabulary_tree(
            all_desc, branching=args.branching, depth=args.depth
        )
        np.savez(
            args.vocab_tree_path,
            **{f"level_{i}": lv for i, lv in enumerate(tree.levels)},
        )
        print(
            f"Built hierarchical vocabulary ({args.branching}^{args.depth} = "
            f"{tree.num_words} words) -> {args.vocab_tree_path}"
        )
    else:
        vocab = build_vocabulary(all_desc, num_words=args.num_words)
        np.savez(
            args.vocab_tree_path, vocabulary=np.asarray(vocab, dtype=np.float32)
        )
        print(f"Built vocabulary of {args.num_words} words -> {args.vocab_tree_path}")
    db.close()


def _load_or_train_index(vocab_tree_path, desc_by_image, num_words=256):
    from colmap_tpu.retrieval.visual_index import VisualIndex

    if vocab_tree_path and not os.path.exists(vocab_tree_path):
        # The builder writes <path>.npz when the suffix is missing.
        if os.path.exists(_npz_path(vocab_tree_path)):
            vocab_tree_path = _npz_path(vocab_tree_path)
    if vocab_tree_path and os.path.exists(vocab_tree_path):
        from colmap_tpu.retrieval.visual_index import TreeVocabulary

        data = np.load(vocab_tree_path)
        if "level_0" in data:
            n_levels = sum(1 for k in data.files if k.startswith("level_"))
            vocab = TreeVocabulary([data[f"level_{i}"] for i in range(n_levels)])
        else:
            vocab = data["vocabulary"]
        index = VisualIndex(vocab)
    else:
        from colmap_tpu.retrieval.visual_index import (
            default_vocab_tree_path, load_vocab_tree,
        )

        shipped = default_vocab_tree_path()
        if vocab_tree_path:
            from colmap_tpu.utils import logging

            logging.warning(
                "vocab tree file %s not found; falling back to the %s",
                vocab_tree_path,
                "shipped small tree" if shipped
                else "on-the-fly flat vocabulary",
            )
        if shipped:
            index = VisualIndex(load_vocab_tree(shipped))
        else:
            all_desc = np.concatenate(
                [d for d in desc_by_image.values() if len(d)]
            )
            rng = np.random.default_rng(0)
            sub = all_desc[
                rng.choice(
                    len(all_desc), min(len(all_desc), 20000), replace=False
                )
            ]
            index = VisualIndex.create(sub, num_words=num_words)
    for iid, d in desc_by_image.items():
        index.add(iid, d)
    return index


def _cmd_vocab_tree_matcher(args):
    from colmap_tpu.controllers.feature_pipeline import run_matches_import
    from colmap_tpu.scene.database import Database
    from colmap_tpu.utils.types import image_pair_to_pair_id

    db = Database(args.database_path, must_exist=True)
    desc = _read_all_descriptors(db, max_per_image=args.max_features_per_image)
    index = _load_or_train_index(args.vocab_tree_path, desc)
    pairs, seen = [], set()
    for iid, d in desc.items():
        for r in index.query(d, args.num_images, exclude_image_id=iid):
            key = image_pair_to_pair_id(iid, r.image_id)
            if key not in seen:
                seen.add(key)
                pairs.append((min(iid, r.image_id), max(iid, r.image_id)))
    n = run_matches_import(db, pairs)
    print(f"Verified {n} of {len(pairs)} vocab-tree pairs")
    db.close()


def _cmd_vocab_tree_retriever(args):
    from colmap_tpu.scene.database import Database

    db = Database(args.database_path, must_exist=True)
    names = {iid: name for (iid, name, _) in db.read_images()}
    desc = _read_all_descriptors(db, max_per_image=args.max_features_per_image)
    index = _load_or_train_index(args.vocab_tree_path, desc)
    for iid, d in desc.items():
        results = index.query(d, args.num_images, exclude_image_id=iid)
        for r in results:
            print(f"{names[iid]} {names[r.image_id]} {r.score:.4f}")
    db.close()


def _cmd_geometric_verifier(args):
    """Re-verify existing matches (reference: geometric_verifier /
    two_view_geometry_verifier path in exe/feature.cc)."""
    from colmap_tpu.controllers.feature_pipeline import (
        MatchingPipelineOptions,
        run_matches_import,
    )
    from colmap_tpu.scene.database import Database
    from colmap_tpu.utils.types import pair_id_to_image_pair

    db = Database(args.database_path, must_exist=True)
    pairs = []
    for (pair_id, m) in db.read_all_matches():
        if len(m) > 0:
            pairs.append(pair_id_to_image_pair(pair_id))
    options = MatchingPipelineOptions(guided_matching=args.guided_matching)
    n = run_matches_import(db, pairs, options)
    print(f"Verified {n} of {len(pairs)} matched pairs")
    db.close()


# ---------------------------------------------------------------------------
# mappers / estimators


def _cmd_hierarchical_mapper(args):
    from colmap_tpu.scene.clustering import SceneClusteringOptions
    from colmap_tpu.scene.database import Database
    from colmap_tpu.sfm.hierarchical_pipeline import (
        HierarchicalPipeline,
        HierarchicalPipelineOptions,
    )

    db = Database(args.database_path, must_exist=True)
    options = HierarchicalPipelineOptions(
        clustering=SceneClusteringOptions(
            leaf_max_num_images=args.leaf_max_num_images,
            image_overlap=args.image_overlap,
        ),
        verbose=not args.quiet,
    )
    models = HierarchicalPipeline(options, db).run()
    # Every process holds the identical merged set after the in-pipeline
    # exchange; only rank 0 writes to avoid clobbering shared output paths.
    from colmap_tpu.parallel import multihost

    if multihost.process_index() == 0:
        _write_models(models, args.output_path)
    db.close()


def _cmd_image_registrator(args):
    """Register additional images into an existing model without changing
    the model's structure (reference: image_registrator, exe/sfm.cc)."""
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.database_cache import DatabaseCache
    from colmap_tpu.scene.reconstruction_io import read_model, write_model
    from colmap_tpu.sfm.incremental_mapper import (
        IncrementalMapper,
        IncrementalMapperOptions,
    )

    db = Database(args.database_path, must_exist=True)
    recon = read_model(args.input_path)
    cache = DatabaseCache.create(db)
    # Unregistered images are not serialized in images.bin; bring them in
    # from the database so they become registration candidates.
    from colmap_tpu.scene.types import INVALID_POINT3D, Frame, Image

    for iid, image in cache.images.items():
        if iid in recon.images:
            continue
        if image.camera_id not in recon.cameras:
            recon.add_camera(cache.cameras[image.camera_id])
        frame = cache.frames[image.frame_id]
        if frame.rig_id not in recon.rigs:
            recon.add_rig(cache.rigs[frame.rig_id])
        if frame.frame_id not in recon.frames:
            recon.add_frame(
                Frame(frame_id=frame.frame_id, rig_id=frame.rig_id,
                      data_ids=list(frame.data_ids))
            )
        img = Image(
            image_id=image.image_id, name=image.name,
            camera_id=image.camera_id, frame_id=image.frame_id,
        )
        img.points2D_xy = image.points2D_xy.copy()
        img.points2D_p3d = np.full(
            image.num_points2D(), INVALID_POINT3D, dtype=np.int64
        )
        recon.add_image(img)
    mapper = IncrementalMapper(cache)
    mapper.begin_reconstruction(recon)
    options = IncrementalMapperOptions()
    n_registered = 0
    for _ in range(len(cache.images)):
        candidates = [
            iid for iid in mapper.find_next_images(options)
            if not recon.is_image_registered(iid)
        ]
        if not candidates:
            break
        ok = False
        for iid in candidates[: args.max_trials_per_round]:
            if mapper.register_next_image(iid, options):
                n_registered += 1
                ok = True
                break
        if not ok:
            break
    write_model(recon, args.output_path, fmt="bin")
    print(f"Registered {n_registered} additional images -> {args.output_path}")
    db.close()


def _cmd_rotation_averager(args):
    """Standalone global rotation averaging over the view graph
    (reference: rotation_averager, controllers/rotation_averaging.*)."""
    from colmap_tpu.estimators.rotation_averaging import estimate_rotations
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.database_cache import DatabaseCache
    from colmap_tpu.scene.reconstruction import Reconstruction
    from colmap_tpu.scene.reconstruction_io import write_model
    from colmap_tpu.scene.types import Pose
    from colmap_tpu.utils.types import pair_id_to_image_pair

    db = Database(args.database_path, must_exist=True)
    rel_poses = collect_relative_poses(db, args.min_num_matches)
    if not rel_poses:
        print("No relative poses in database; run a matcher first")
        sys.exit(1)
    cache = DatabaseCache.create(db, min_num_matches=args.min_num_matches)
    image_ids = sorted(cache.images.keys())
    row = {iid: i for i, iid in enumerate(image_ids)}
    edges, rel_quats = [], []
    for pair_id, pose in rel_poses.items():
        a, b = pair_id_to_image_pair(pair_id)
        if a in row and b in row:
            edges.append((row[a], row[b]))
            rel_quats.append(pose.quat)
    quats = estimate_rotations(
        len(image_ids), np.asarray(edges), np.asarray(rel_quats)
    )
    recon = Reconstruction()
    for cid, cam in cache.cameras.items():
        recon.add_camera(cam)
    for rig in cache.rigs.values():
        recon.add_rig(rig)
    for frame in cache.frames.values():
        recon.add_frame(frame)
    for image in cache.images.values():
        recon.add_image(image)
    for iid in image_ids:
        frame_id = cache.images[iid].frame_id
        recon.frames[frame_id].rig_from_world = Pose(
            np.asarray(quats[row[iid]]), np.zeros(3)
        )
        recon.register_frame(frame_id)
    os.makedirs(args.output_path, exist_ok=True)
    write_model(recon, args.output_path, fmt="bin")
    print(f"Averaged rotations for {len(image_ids)} images -> {args.output_path}")
    db.close()


def _cmd_view_graph_calibrator(args):
    """Estimate focal lengths from F matrices over the view graph and
    update the database cameras (reference: view_graph_calibrator,
    estimators/view_graph_calibration.*)."""
    from colmap_tpu.estimators.view_graph_calibration import (
        ViewGraphCalibrationOptions,
        calibrate_view_graph,
    )
    from colmap_tpu.scene.database import Database
    from colmap_tpu.sensor import models as camera_models

    db = Database(args.database_path, must_exist=True)
    cameras = db.read_cameras()
    images = {iid: cid for (iid, _, cid) in db.read_images()}
    edges = []
    for (id1, id2, g) in db.read_all_two_view_geometries():
        if g is None or g.F is None:
            continue
        if id1 not in images or id2 not in images:
            continue
        edges.append((images[id1], images[id2], g.F))
    camera_ids = sorted(cameras.keys())
    prior_focals = {
        cid: float(
            camera_models.mean_focal_length(
                cameras[cid].model_id, cameras[cid].params
            )
        )
        for cid in camera_ids
    }
    pps = {}
    for cid in camera_ids:
        cam = cameras[cid]
        pp_idxs = camera_models.principal_point_idxs(cam.model_id)
        pps[cid] = (float(cam.params[pp_idxs[0]]), float(cam.params[pp_idxs[1]]))
    focals = calibrate_view_graph(
        camera_ids, prior_focals, pps, edges, ViewGraphCalibrationOptions()
    )
    for cid, f in focals.items():
        cam = cameras[cid]
        for i in camera_models.focal_length_idxs(cam.model_id):
            cam.params[i] = float(f)
        db.update_camera(cam)
    db.commit()
    for cid in camera_ids:
        print(f"camera {cid}: focal {prior_focals[cid]:.2f} -> {focals[cid]:.2f}")
    db.close()


# ---------------------------------------------------------------------------
# model tools


def _cmd_model_comparer(args):
    from colmap_tpu.estimators.alignment import compare_reconstructions
    from colmap_tpu.scene.reconstruction_io import read_model

    recon1 = read_model(args.input_path1)
    recon2 = read_model(args.input_path2)
    stats = compare_reconstructions(recon1, recon2)
    print(f"Common images: {stats.get('num_common_images', 0)}")
    if stats.get("num_common_images", 0) > 0:
        print(f"Mean rotation error: {np.mean(stats['rotation_errors_deg']):.6f} deg")
        print(f"Max rotation error: {np.max(stats['rotation_errors_deg']):.6f} deg")
        print(f"Mean center error: {np.mean(stats['center_errors']):.6f}")
        print(f"Max center error: {np.max(stats['center_errors']):.6f}")


def _submodel_for_images(recon, keep_ids):
    """New reconstruction restricted to the given registered image ids."""
    from colmap_tpu.scene.reconstruction import Reconstruction

    keep = set(keep_ids)
    sub = Reconstruction()
    for cid, cam in recon.cameras.items():
        sub.add_camera(cam)
    frames_needed = {recon.images[iid].frame_id for iid in keep}
    for fid in frames_needed:
        frame = recon.frames[fid]
        if frame.rig_id not in sub.rigs:
            sub.add_rig(recon.rigs[frame.rig_id])
        import copy

        f2 = copy.deepcopy(frame)
        sub.add_frame(f2)
    for iid in keep:
        import copy

        img = copy.deepcopy(recon.images[iid])
        img.points2D_p3d = np.full(len(img.points2D_p3d), -1, dtype=np.int64)
        sub.add_image(img)
    for fid in frames_needed:
        if recon.is_frame_registered(fid):
            sub.register_frame(fid)
    for pid, p in recon.points3D.items():
        track = [el for el in p.track if el.image_id in keep]
        if len(track) >= 2:
            sub.add_point3D(p.xyz, track, color=p.color)
    return sub


def _cmd_model_splitter(args):
    """Split a model into spatial tiles (reference: model_splitter,
    exe/model.cc — parts/tiles with overlap)."""
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    if recon.num_points3D() == 0:
        print("Empty model")
        sys.exit(1)
    pts = np.stack([p.xyz for p in recon.points3D.values()])
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    n = args.num_parts
    axis = int(np.argmax(hi - lo))
    edges = np.linspace(lo[axis], hi[axis], n + 1)
    overlap = args.overlap_ratio * (edges[1] - edges[0])
    os.makedirs(args.output_path, exist_ok=True)
    for k in range(n):
        lo_k, hi_k = edges[k] - overlap, edges[k + 1] + overlap
        img_ids = set()
        for p in recon.points3D.values():
            if lo_k <= p.xyz[axis] <= hi_k:
                img_ids.update(el.image_id for el in p.track)
        img_ids = {i for i in img_ids if recon.is_image_registered(i)}
        if not img_ids:
            continue
        sub = _submodel_for_images(recon, img_ids)
        # Crop points to the tile.
        for pid in list(sub.points3D.keys()):
            if not (lo_k <= sub.points3D[pid].xyz[axis] <= hi_k):
                sub.delete_point3D(pid)
        out = os.path.join(args.output_path, str(k))
        write_model(sub, out, fmt="bin")
        print(
            f"Part {k}: {sub.num_reg_frames()} frames, "
            f"{sub.num_points3D()} points -> {out}"
        )


def _cmd_model_clusterer(args):
    """Cluster a model's images by covisibility and write per-cluster
    submodels (reference: model_clusterer / reconstruction clustering)."""
    from colmap_tpu.scene.clustering import SceneClusteringOptions, cluster_scene
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    reg = sorted(recon.reg_image_ids())
    weights = {}
    for p in recon.points3D.values():
        track_ids = sorted({el.image_id for el in p.track})
        for i in range(len(track_ids)):
            for j in range(i + 1, len(track_ids)):
                key = (track_ids[i], track_ids[j])
                weights[key] = weights.get(key, 0.0) + 1.0
    clusters = cluster_scene(
        reg, weights,
        SceneClusteringOptions(leaf_max_num_images=args.leaf_max_num_images),
    )
    os.makedirs(args.output_path, exist_ok=True)
    for k, cluster in enumerate(clusters):
        sub = _submodel_for_images(recon, cluster)
        out = os.path.join(args.output_path, str(k))
        write_model(sub, out, fmt="bin")
        print(
            f"Cluster {k}: {sub.num_reg_frames()} frames, "
            f"{sub.num_points3D()} points -> {out}"
        )


def _cmd_image_deleter(args):
    """Delete images from a model (reference: image_deleter, exe/image.cc)."""
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    to_delete = set()
    if args.image_names_path:
        names = {
            line.strip()
            for line in open(args.image_names_path)
            if line.strip()
        }
        to_delete |= {
            iid for iid, img in recon.images.items() if img.name in names
        }
    if args.image_ids_path:
        to_delete |= {
            int(line) for line in open(args.image_ids_path) if line.strip()
        }
    keep = [
        iid for iid in recon.reg_image_ids() if iid not in to_delete
    ]
    sub = _submodel_for_images(recon, keep)
    write_model(sub, args.output_path, fmt="bin")
    print(f"Deleted {len(to_delete)} images -> {args.output_path}")


def _cmd_image_filterer(args):
    """Remove weakly constrained images (reference: image_filterer,
    exe/image.cc — min_num_observations etc.)."""
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    keep = []
    for iid in recon.reg_image_ids():
        img = recon.images[iid]
        n_3d = int(np.sum(np.asarray(img.points2D_p3d) >= 0))
        if n_3d >= args.min_num_observations:
            keep.append(iid)
    sub = _submodel_for_images(recon, keep)
    write_model(sub, args.output_path, fmt="bin")
    print(
        f"Kept {len(keep)} of {recon.num_reg_frames()} images -> "
        f"{args.output_path}"
    )


def _cmd_database_cleaner(args):
    """Clear database tables (reference: database_cleaner, exe/database.cc —
    types all/images/features/matches)."""
    from colmap_tpu.scene.database import Database

    db = Database(args.database_path, must_exist=True)
    t = args.type
    cur = db.conn
    if t in ("matches", "features", "images", "all"):
        cur.execute("DELETE FROM two_view_geometries")
        cur.execute("DELETE FROM matches")
    if t in ("features", "images", "all"):
        cur.execute("DELETE FROM descriptors")
        cur.execute("DELETE FROM keypoints")
    if t in ("images", "all"):
        cur.execute("DELETE FROM pose_priors")
        cur.execute("DELETE FROM frames")
        cur.execute("DELETE FROM frame_data")
        cur.execute("DELETE FROM images")
    if t == "all":
        cur.execute("DELETE FROM cameras")
        cur.execute("DELETE FROM rig_sensors")
        cur.execute("DELETE FROM rigs")
    db.commit()
    print(f"Cleaned database ({t})")
    db.close()


def _cmd_rig_configurator(args):
    """Apply a rig configuration to the database: group images into rigs and
    frames by filename prefix (reference: rig_configurator, exe/rig.cc +
    doc rig config JSON format)."""
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.types import Pose, Rig, Frame, SensorType

    config = json.load(open(args.rig_config_path))
    db = Database(args.database_path, must_exist=True)
    images = db.read_images()  # (iid, name, cid)
    next_rig_id = 1
    next_frame_id = 1
    n_frames = 0
    for rig_cfg in config:
        cam_cfgs = rig_cfg["cameras"]
        # Group images by prefix; key frames by the suffix.
        groups = {}  # suffix -> {prefix_index: (iid, cid)}
        prefix_cam = {}
        ref_idx = 0
        for ci, cc in enumerate(cam_cfgs):
            if cc.get("ref_sensor"):
                ref_idx = ci
        for (iid, name, cid) in images:
            for ci, cc in enumerate(cam_cfgs):
                prefix = cc["image_prefix"]
                if name.startswith(prefix):
                    suffix = name[len(prefix):]
                    groups.setdefault(suffix, {})[ci] = (iid, cid)
                    prefix_cam[ci] = cid
                    break
        if not groups:
            continue
        ref_cid = prefix_cam.get(ref_idx)
        if ref_cid is None:
            continue
        rig = Rig(
            rig_id=next_rig_id,
            ref_sensor_id=(int(SensorType.CAMERA), ref_cid),
        )
        for ci, cc in enumerate(cam_cfgs):
            if ci == ref_idx or ci not in prefix_cam:
                continue
            pose = None
            if "cam_from_rig_rotation" in cc:
                pose = Pose(
                    np.asarray(cc["cam_from_rig_rotation"], dtype=np.float64),
                    np.asarray(
                        cc.get("cam_from_rig_translation", [0, 0, 0]),
                        dtype=np.float64,
                    ),
                )
            rig.sensors[(int(SensorType.CAMERA), prefix_cam[ci])] = pose
        db.write_rig(rig)
        next_rig_id += 1
        for suffix in sorted(groups):
            members = groups[suffix]
            frame = Frame(
                frame_id=next_frame_id,
                rig_id=rig.rig_id,
                data_ids=[
                    (int(SensorType.CAMERA), cid, iid)
                    for ci, (iid, cid) in sorted(members.items())
                ],
            )
            db.write_frame(frame)
            next_frame_id += 1
            n_frames += 1
    db.commit()
    print(f"Configured {next_rig_id - 1} rigs, {n_frames} frames")
    db.close()


def _cmd_model_orientation_aligner(args):
    """Align the model's coordinate axes to an estimated world frame
    (reference: model_orientation_aligner, exe/model.cc — methods
    MANHATTAN-WORLD / IMAGE-ORIENTATION; plus PRINCIPAL-PLANE / ENU from
    AlignToPrincipalPlane / AlignToENUPlane)."""
    from colmap_tpu.estimators import coordinate_frame as cf
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    method = args.method.upper()
    if method == "MANHATTAN-WORLD":
        from PIL import Image as PILImage

        if not args.image_path:
            print("--image_path required for MANHATTAN-WORLD")
            sys.exit(1)
        images = {}
        for iid in recon.reg_image_ids():
            p = os.path.join(args.image_path, recon.images[iid].name)
            if os.path.exists(p):
                images[iid] = np.asarray(PILImage.open(p).convert("L"),
                                         dtype=np.float32)
        frame = cf.estimate_manhattan_world_frame(
            recon, images,
            cf.ManhattanWorldFrameOptions(max_image_size=args.max_image_size),
        )
        if not np.isfinite(frame).all() or abs(np.linalg.det(frame)) < 0.5:
            print("Manhattan frame estimation failed")
            sys.exit(1)
        cf.align_to_orientation_frame(recon, frame)
    elif method == "IMAGE-ORIENTATION":
        gravity = cf.estimate_gravity_from_image_orientation(recon)
        if np.linalg.norm(gravity) < 0.5:
            print("Gravity estimation failed")
            sys.exit(1)
        # Rotate the estimated downward axis onto +y (COLMAP convention:
        # y points down in world space after orientation alignment).
        from colmap_tpu.estimators.gravity_refinement import (
            gravity_aligned_rotation,
        )

        R = gravity_aligned_rotation(gravity)
        from colmap_tpu.geometry import rotation as rot
        import jax.numpy as jnp

        quat = np.asarray(rot.rotmat_to_quat(jnp.asarray(R)))
        recon.transform(1.0, quat, np.zeros(3))
    elif method == "PRINCIPAL-PLANE":
        cf.align_to_principal_plane(recon)
    elif method == "ENU":
        cf.align_to_enu_plane(recon)
    else:
        print(f"Unknown method {args.method}")
        sys.exit(1)
    write_model(recon, args.output_path, fmt="bin")
    print(f"Aligned model ({method}) -> {args.output_path}")


def _cmd_gui(args):
    print(
        "colmap_tpu is a headless TPU framework; the Qt GUI is not available."
        " Use the CLI commands or the pycolmap-compatible Python API."
    )
    sys.exit(1)


# ---------------------------------------------------------------------------
# registration


def register(sub):
    c = sub.add_parser("gui")
    c.set_defaults(fn=_cmd_gui)

    c = sub.add_parser("spatial_matcher")
    c.add_argument("--database_path", required=True)
    c.add_argument("--max_num_neighbors", type=int, default=50)
    c.add_argument("--max_distance", type=float, default=100.0)
    c.add_argument("--ignore_z", action="store_true", default=True)
    c.set_defaults(fn=_cmd_spatial_matcher)

    c = sub.add_parser("transitive_matcher")
    c.add_argument("--database_path", required=True)
    c.add_argument("--num_iterations", type=int, default=3)
    c.set_defaults(fn=_cmd_transitive_matcher)

    c = sub.add_parser("vocab_tree_builder")
    c.add_argument("--database_path", required=True)
    c.add_argument("--vocab_tree_path", required=True)
    c.add_argument("--num_words", type=int, default=1024)
    c.add_argument("--branching", type=int, default=10)
    c.add_argument("--depth", type=int, default=1,
                   help="depth > 1 builds a hierarchical k-means tree with "
                        "branching**depth effective words")
    c.add_argument("--max_num_descriptors", type=int, default=200000)
    c.add_argument("--max_features_per_image", type=int, default=2000)
    c.set_defaults(fn=_cmd_vocab_tree_builder)

    c = sub.add_parser("vocab_tree_matcher")
    c.add_argument("--database_path", required=True)
    c.add_argument("--vocab_tree_path", default=None)
    c.add_argument("--num_images", type=int, default=10)
    c.add_argument("--max_features_per_image", type=int, default=2000)
    c.set_defaults(fn=_cmd_vocab_tree_matcher)

    c = sub.add_parser("vocab_tree_retriever")
    c.add_argument("--database_path", required=True)
    c.add_argument("--vocab_tree_path", default=None)
    c.add_argument("--num_images", type=int, default=10)
    c.add_argument("--max_features_per_image", type=int, default=2000)
    c.set_defaults(fn=_cmd_vocab_tree_retriever)

    c = sub.add_parser("geometric_verifier")
    c.add_argument("--database_path", required=True)
    c.add_argument("--guided_matching", action="store_true")
    c.set_defaults(fn=_cmd_geometric_verifier)

    c = sub.add_parser("hierarchical_mapper")
    c.add_argument("--database_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--leaf_max_num_images", type=int, default=500)
    c.add_argument("--image_overlap", type=int, default=50)
    c.add_argument("--quiet", action="store_true")
    c.set_defaults(fn=_cmd_hierarchical_mapper)

    c = sub.add_parser("image_registrator")
    c.add_argument("--database_path", required=True)
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--max_trials_per_round", type=int, default=10)
    c.set_defaults(fn=_cmd_image_registrator)

    c = sub.add_parser("rotation_averager")
    c.add_argument("--database_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--min_num_matches", type=int, default=15)
    c.set_defaults(fn=_cmd_rotation_averager)

    c = sub.add_parser("view_graph_calibrator")
    c.add_argument("--database_path", required=True)
    c.set_defaults(fn=_cmd_view_graph_calibrator)

    c = sub.add_parser("model_comparer")
    c.add_argument("--input_path1", required=True)
    c.add_argument("--input_path2", required=True)
    c.set_defaults(fn=_cmd_model_comparer)

    c = sub.add_parser("model_splitter")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--num_parts", type=int, default=2)
    c.add_argument("--overlap_ratio", type=float, default=0.05)
    c.set_defaults(fn=_cmd_model_splitter)

    c = sub.add_parser("model_clusterer")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--leaf_max_num_images", type=int, default=500)
    c.set_defaults(fn=_cmd_model_clusterer)

    c = sub.add_parser("image_deleter")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--image_names_path", default=None)
    c.add_argument("--image_ids_path", default=None)
    c.set_defaults(fn=_cmd_image_deleter)

    c = sub.add_parser("image_filterer")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--min_num_observations", type=int, default=10)
    c.set_defaults(fn=_cmd_image_filterer)

    c = sub.add_parser("database_cleaner")
    c.add_argument("--database_path", required=True)
    c.add_argument("--type", required=True,
                   choices=["all", "images", "features", "matches"])
    c.set_defaults(fn=_cmd_database_cleaner)

    c = sub.add_parser("model_orientation_aligner")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--image_path", default=None)
    c.add_argument("--method", default="MANHATTAN-WORLD",
                   choices=["MANHATTAN-WORLD", "IMAGE-ORIENTATION",
                            "PRINCIPAL-PLANE", "ENU",
                            "manhattan-world", "image-orientation",
                            "principal-plane", "enu"])
    c.add_argument("--max_image_size", type=int, default=1024)
    c.set_defaults(fn=_cmd_model_orientation_aligner)

    c = sub.add_parser("rig_configurator")
    c.add_argument("--database_path", required=True)
    c.add_argument("--rig_config_path", required=True)
    c.set_defaults(fn=_cmd_rig_configurator)
