"""Command-line interface.

reference behavior: src/colmap/exe/colmap.cc:92-159 — the same subcommand
surface (feature_extractor, *_matcher, mapper, global_mapper,
bundle_adjuster, point_triangulator, model_* tools, image_undistorter,
patch_match_stereo, stereo_fusion, database_creator, ...) mapped onto the
TPU-native library. Flags use the reference's dotted-path style where it
matters for drop-in compatibility (e.g. --database_path, --image_path,
--output_path).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _cmd_database_creator(args):
    from colmap_tpu.scene.database import Database

    Database(args.database_path).close()
    print(f"Created database at {args.database_path}")


def _cmd_feature_extractor(args):
    from colmap_tpu.controllers.feature_pipeline import (
        ImageReaderOptions,
        run_feature_extraction,
    )
    from colmap_tpu.feature.sift import SiftOptions
    from colmap_tpu.scene.database import Database

    db = Database(args.database_path)
    reader = ImageReaderOptions(
        camera_model=args.camera_model,
        single_camera=not args.per_image_camera,
        camera_params=args.camera_params,
        mask_path=args.mask_path,
        camera_mask_path=args.camera_mask_path,
        extractor_type=args.descriptor_type,
        aliked_weights_path=args.aliked_weights_path,
    )
    sift = SiftOptions(max_num_features=args.max_num_features)
    ids = run_feature_extraction(db, args.image_path, reader_options=reader,
                                 sift_options=sift)
    print(f"Extracted features for {len(ids)} images")
    db.close()


def _cmd_exhaustive_matcher(args):
    from colmap_tpu.controllers.feature_pipeline import run_exhaustive_matching
    from colmap_tpu.scene.database import Database

    db = Database(args.database_path, must_exist=True)
    n = run_exhaustive_matching(db)
    print(f"Verified {n} image pairs")
    db.close()


def _cmd_sequential_matcher(args):
    from colmap_tpu.controllers.feature_pipeline import run_sequential_matching
    from colmap_tpu.feature.pairing import SequentialPairingOptions
    from colmap_tpu.scene.database import Database

    db = Database(args.database_path, must_exist=True)
    n = run_sequential_matching(
        db, pairing=SequentialPairingOptions(overlap=args.overlap)
    )
    print(f"Verified {n} image pairs")
    db.close()


def _cmd_matches_importer(args):
    from colmap_tpu.controllers.feature_pipeline import run_matches_import
    from colmap_tpu.feature.pairing import imported_pairs
    from colmap_tpu.scene.database import Database

    db = Database(args.database_path, must_exist=True)
    name_to_id = {name: iid for (iid, name, _) in db.read_images()}
    pairs = imported_pairs(args.match_list_path, name_to_id)
    n = run_matches_import(db, pairs)
    print(f"Verified {n} of {len(pairs)} imported pairs")
    db.close()


def _cmd_mapper(args):
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.reconstruction_io import write_model
    from colmap_tpu.sfm.incremental_pipeline import (
        IncrementalPipeline,
        IncrementalPipelineOptions,
    )

    db = Database(args.database_path, must_exist=True)
    options = IncrementalPipelineOptions(verbose=not args.quiet)
    pipeline = IncrementalPipeline(options, db)
    models = pipeline.run()
    os.makedirs(args.output_path, exist_ok=True)
    for i, recon in enumerate(models):
        out = os.path.join(args.output_path, str(i))
        write_model(recon, out, fmt="bin")
        print(
            f"Model {i}: {recon.num_reg_frames()} frames, "
            f"{recon.num_points3D()} points -> {out}"
        )
    db.close()


def _cmd_global_mapper(args):
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.reconstruction_io import write_model
    from colmap_tpu.sfm.global_pipeline import GlobalPipeline, GlobalPipelineOptions

    db = Database(args.database_path, must_exist=True)
    recon = GlobalPipeline(GlobalPipelineOptions(verbose=not args.quiet), db).run()
    if recon is None:
        print("Global mapping failed")
        sys.exit(1)
    os.makedirs(args.output_path, exist_ok=True)
    out = os.path.join(args.output_path, "0")
    write_model(recon, out, fmt="bin")
    print(f"Model: {recon.num_reg_frames()} frames, {recon.num_points3D()} points -> {out}")
    db.close()


def _cmd_bundle_adjuster(args):
    from colmap_tpu.estimators import bundle_adjustment as ba
    from colmap_tpu.estimators.ba_setup import (
        problem_from_reconstruction,
        update_reconstruction,
    )
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    problem, index = problem_from_reconstruction(recon)
    options = ba.BAOptions(max_iterations=args.max_num_iterations)
    masks = ba.default_masks(problem, index["model_id"], options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    solved, summary = ba.solve(problem, index["model_id"], options, masks)
    update_reconstruction(recon, solved, index)
    recon.update_point3D_errors()
    write_model(recon, args.output_path, fmt="bin")
    print(
        f"BA: cost {summary['initial_cost']:.4e} -> {summary['final_cost']:.4e} "
        f"in {summary['num_iterations']} iterations"
    )


def _cmd_point_triangulator(args):
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.database_cache import DatabaseCache
    from colmap_tpu.scene.reconstruction_io import read_model, write_model
    from colmap_tpu.sfm.incremental_mapper import IncrementalMapper, IncrementalMapperOptions
    from colmap_tpu.sfm.incremental_triangulator import TriangulatorOptions

    db = Database(args.database_path, must_exist=True)
    recon = read_model(args.input_path)
    cache = DatabaseCache.create(db)
    mapper = IncrementalMapper(cache)
    # Keep existing poses; re-triangulate all registered images.
    mapper.recon = recon
    from colmap_tpu.sfm.incremental_triangulator import IncrementalTriangulator

    mapper.triangulator = IncrementalTriangulator(cache.correspondence_graph, recon)
    n = mapper.triangulator.retriangulate(TriangulatorOptions())
    recon.update_point3D_errors()
    write_model(recon, args.output_path, fmt="bin")
    print(f"Triangulated {n} observations")
    db.close()


def _cmd_model_converter(args):
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    if args.output_type in ("BIN", "bin"):
        write_model(recon, args.output_path, fmt="bin")
    elif args.output_type in ("TXT", "txt"):
        write_model(recon, args.output_path, fmt="txt")
    elif args.output_type in ("PLY", "ply"):
        from colmap_tpu.utils.ply import write_ply

        pts = np.stack([p.xyz for p in recon.points3D.values()]) if recon.points3D else np.zeros((0, 3))
        colors = np.stack([p.color for p in recon.points3D.values()]) if recon.points3D else None
        write_ply(args.output_path, pts, colors=colors)
    elif args.output_type in ("NVM", "nvm"):
        from colmap_tpu.scene.exporters import write_nvm

        write_nvm(recon, args.output_path)
    elif args.output_type in ("Bundler", "bundler"):
        from colmap_tpu.scene.exporters import write_bundler

        write_bundler(recon, args.output_path)
    elif args.output_type in ("VRML", "vrml"):
        from colmap_tpu.scene.exporters import write_vrml

        base = os.path.splitext(args.output_path)[0]
        write_vrml(recon, base + ".images.wrl", base + ".points3D.wrl")
    elif args.output_type in ("R3D", "r3d", "Recon3D"):
        from colmap_tpu.scene.exporters import write_recon3d

        write_recon3d(recon, args.output_path)
    elif args.output_type in ("CAM", "cam"):
        from colmap_tpu.scene.exporters import write_cam_files

        write_cam_files(recon, args.output_path)
    else:
        print(f"Unknown output type {args.output_type}")
        sys.exit(1)
    print(f"Converted model -> {args.output_path}")


def _cmd_model_analyzer(args):
    from colmap_tpu.scene.reconstruction_io import read_model

    recon = read_model(args.path)
    recon.update_point3D_errors()
    n_obs = recon.compute_num_observations()
    print(f"Cameras: {recon.num_cameras()}")
    print(f"Images: {recon.num_images()}")
    print(f"Registered frames: {recon.num_reg_frames()}")
    print(f"Points: {recon.num_points3D()}")
    print(f"Observations: {n_obs}")
    print(f"Mean track length: {recon.compute_mean_track_length():.6f}")
    print(
        "Mean observations per registered image: "
        f"{n_obs / max(recon.num_reg_frames(), 1):.6f}"
    )
    print(f"Mean reprojection error: {recon.compute_mean_reprojection_error():.6f}px")


def _cmd_model_aligner(args):
    from colmap_tpu.estimators.alignment import align_reconstructions, apply_sim3
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    ref = read_model(args.ref_model_path)
    sim = align_reconstructions(recon, ref)
    if sim is None:
        print("Alignment failed: not enough common images")
        sys.exit(1)
    apply_sim3(recon, *sim)
    write_model(recon, args.output_path, fmt="bin")
    print(f"Aligned model (scale {sim[0]:.6f}) -> {args.output_path}")


def _cmd_model_merger(args):
    from colmap_tpu.estimators.alignment import align_reconstructions, apply_sim3
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon1 = read_model(args.input_path1)
    recon2 = read_model(args.input_path2)
    sim = align_reconstructions(recon2, recon1)
    if sim is None:
        print("Merge failed: models share too few images")
        sys.exit(1)
    apply_sim3(recon2, *sim)
    # Merge entities of recon2 into recon1 (disjoint ids assumed for points).
    for iid in recon2.reg_image_ids():
        if iid not in recon1.images or not recon1.is_image_registered(iid):
            # Bring over frame+image when missing.
            img2 = recon2.images[iid]
            if iid not in recon1.images:
                if img2.camera_id not in recon1.cameras:
                    recon1.add_camera(recon2.cameras[img2.camera_id])
                frame2 = recon2.frames[img2.frame_id]
                if frame2.rig_id not in recon1.rigs:
                    recon1.add_rig(recon2.rigs[frame2.rig_id])
                if frame2.frame_id not in recon1.frames:
                    recon1.add_frame(frame2)
                recon1.add_image(img2)
            recon1.register_frame(recon2.images[iid].frame_id)
    from colmap_tpu.scene.types import TrackElement

    for pid, p in recon2.points3D.items():
        track = [
            el for el in p.track
            if el.image_id in recon1.images
            and recon1.images[el.image_id].points2D_p3d[el.point2D_idx] == -1
        ]
        if len(track) >= 2:
            recon1.add_point3D(p.xyz, track, color=p.color)
    write_model(recon1, args.output_path, fmt="bin")
    print(
        f"Merged -> {args.output_path}: {recon1.num_reg_frames()} frames, "
        f"{recon1.num_points3D()} points"
    )


def _cmd_image_undistorter(args):
    from PIL import Image as PILImage

    from colmap_tpu.image.undistortion import undistort_camera, undistort_image
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    output_type = getattr(args, "output_type", "COLMAP")
    if output_type == "PMVS":
        from colmap_tpu.cli.extra_commands2 import export_pmvs

        export_pmvs(recon, args.image_path, args.output_path)
        print(f"PMVS workspace -> {args.output_path}")
        return
    if output_type == "CMP-MVS":
        from colmap_tpu.cli.extra_commands2 import export_cmp_mvs

        export_cmp_mvs(recon, args.image_path, args.output_path)
        print(f"CMP-MVS workspace -> {args.output_path}")
        return
    os.makedirs(os.path.join(args.output_path, "images"), exist_ok=True)
    new_cams = {}
    for cid, cam in recon.cameras.items():
        new_cams[cid] = undistort_camera(cam)
    for iid in recon.reg_image_ids():
        image = recon.images[iid]
        src = os.path.join(args.image_path, image.name)
        if not os.path.exists(src):
            continue
        img = np.asarray(PILImage.open(src))
        out = undistort_image(img, recon.cameras[image.camera_id], new_cams[image.camera_id])
        dst = os.path.join(args.output_path, "images", image.name)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        PILImage.fromarray(out.astype(np.uint8)).save(dst)
    for cid in recon.cameras:
        recon.cameras[cid] = new_cams[cid]
    write_model(recon, os.path.join(args.output_path, "sparse"), fmt="bin")
    print(f"Undistorted -> {args.output_path}")


def _cmd_patch_match_stereo(args):
    from colmap_tpu.mvs.workspace import (
        CachedWorkspace,
        run_patch_match_workspace,
    )
    from colmap_tpu.scene.reconstruction_io import read_model

    ws = args.workspace_path
    recon = read_model(os.path.join(ws, "sparse"))
    # Memory-bounded streaming of image pages (reference: Workspace
    # cache_size GB option, mvs/workspace.h:46-136).
    images = CachedWorkspace(ws, cache_size_gb=args.cache_size).image_map(recon)
    problems = run_patch_match_workspace(
        recon, images, ws, geom_consistency=args.geom_consistency,
        write_consistency_graph=args.write_consistency_graph,
    )
    print(f"PatchMatch: processed {len(problems)} reference images")


def _cmd_stereo_fusion(args):
    from colmap_tpu.mvs.workspace import run_fusion_workspace
    from colmap_tpu.scene.reconstruction_io import read_model

    ws = args.workspace_path
    recon = read_model(os.path.join(ws, "sparse"))
    pts, normals, vis = run_fusion_workspace(recon, ws, args.output_path)
    print(f"Fused {len(pts)} points -> {args.output_path}")




def _cmd_poisson_mesher(args):
    from colmap_tpu.mvs.meshing import PoissonMeshingOptions, poisson_mesh
    from colmap_tpu.utils.ply import read_ply, write_ply_mesh

    data = read_ply(args.input_path)
    if "normals" not in data:
        print("Input PLY has no normals; Poisson meshing requires oriented points")
        sys.exit(1)
    options = PoissonMeshingOptions(
        depth=args.depth, point_weight=args.point_weight, trim=args.trim
    )
    verts, faces, colors = poisson_mesh(
        data["points"], data["normals"], data.get("colors"), options
    )
    write_ply_mesh(args.output_path, verts, faces, colors)
    print(f"Meshed {len(verts)} vertices, {len(faces)} faces -> {args.output_path}")


def _cmd_delaunay_mesher(args):
    from colmap_tpu.mvs.fusion import read_fused_vis
    from colmap_tpu.mvs.meshing import DelaunayMeshingOptions, delaunay_meshing
    from colmap_tpu.scene.reconstruction_io import read_model
    from colmap_tpu.utils.ply import read_ply, write_ply_mesh

    ws = args.input_path
    fused = os.path.join(ws, "fused.ply")
    if not os.path.exists(fused):
        print(f"Missing {fused}; run stereo_fusion first")
        sys.exit(1)
    data = read_ply(fused)
    vis_path = fused + ".vis"
    vis = (
        read_fused_vis(vis_path)
        if os.path.exists(vis_path)
        else [np.zeros(0, np.uint32)] * len(data["points"])
    )
    recon = read_model(os.path.join(ws, "sparse"))
    centers = {
        iid: np.asarray(recon.cam_from_world(iid).inverse().t)
        for iid in recon.reg_image_ids()
    }
    options = DelaunayMeshingOptions(
        quality_regularization=args.quality_regularization
    )
    verts, faces = delaunay_meshing(data["points"], vis, centers, options)
    write_ply_mesh(args.output_path, verts, faces)
    print(f"Meshed {len(verts)} vertices, {len(faces)} faces -> {args.output_path}")


def _cmd_mesh_texturer(args):
    from PIL import Image as PILImage

    from colmap_tpu.mvs.texturing import (
        TextureMappingOptions,
        texture_mesh,
        write_obj,
    )
    from colmap_tpu.mvs.workspace import _pinhole_K
    from colmap_tpu.scene.reconstruction_io import read_model
    from colmap_tpu.utils.ply import read_ply_mesh

    m = read_ply_mesh(args.input_path)
    recon = read_model(args.sparse_path)
    views = []
    images = {}
    for iid in recon.reg_image_ids():
        img = recon.images[iid]
        cam = recon.cameras[img.camera_id]
        pose = recon.cam_from_world(iid)
        ipath = os.path.join(args.image_path, img.name)
        if not os.path.exists(ipath):
            continue
        images[iid] = np.asarray(PILImage.open(ipath).convert("RGB"))
        views.append({
            "K": _pinhole_K(cam), "R": pose.rotmat(), "t": np.asarray(pose.t),
            "width": cam.width, "height": cam.height, "image_key": iid,
        })
    options = TextureMappingOptions(patch_size=args.patch_size)
    atlas, uvs, labels = texture_mesh(
        m["vertices"], m["faces"], views, images, options
    )
    write_obj(args.output_path, m["vertices"], m["faces"], uvs, atlas)
    n_tex = int((labels >= 0).sum())
    print(f"Textured {n_tex}/{len(m['faces'])} faces -> {args.output_path}")


def _cmd_mesh_simplifier(args):
    from colmap_tpu.mvs.simplification import simplify_mesh
    from colmap_tpu.utils.ply import read_ply_mesh, write_ply_mesh

    m = read_ply_mesh(args.input_path)
    verts, faces = simplify_mesh(m["vertices"], m["faces"], args.factor)
    write_ply_mesh(args.output_path, verts, faces)
    print(
        f"Simplified {len(m['faces'])} -> {len(faces)} faces "
        f"({len(verts)} vertices) -> {args.output_path}"
    )


def _cmd_color_extractor(args):
    from PIL import Image as PILImage

    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    loaded = {}
    for pid, p in recon.points3D.items():
        votes = []
        for el in p.track:
            image = recon.images[el.image_id]
            if el.image_id not in loaded:
                path = os.path.join(args.image_path, image.name)
                loaded[el.image_id] = (
                    np.asarray(PILImage.open(path).convert("RGB"))
                    if os.path.exists(path) else None
                )
            img = loaded[el.image_id]
            if img is None:
                continue
            x, y = image.points2D_xy[el.point2D_idx]
            xi = int(np.clip(round(x), 0, img.shape[1] - 1))
            yi = int(np.clip(round(y), 0, img.shape[0] - 1))
            votes.append(img[yi, xi])
        if votes:
            p.color = np.mean(votes, axis=0).astype(np.uint8)
    write_model(recon, args.output_path, fmt="bin")
    print(f"Extracted colors -> {args.output_path}")


def _cmd_model_transformer(args):
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    # Transform file: one line "scale qw qx qy qz tx ty tz".
    vals = [float(v) for v in open(args.transform_path).read().split()]
    recon.transform(vals[0], np.array(vals[1:5]), np.array(vals[5:8]))
    write_model(recon, args.output_path, fmt="bin")
    print(f"Transformed -> {args.output_path}")


def _cmd_model_cropper(args):
    from colmap_tpu.scene.reconstruction_io import read_model, write_model

    recon = read_model(args.input_path)
    lo = np.array([float(v) for v in args.boundary.split(",")[:3]])
    hi = np.array([float(v) for v in args.boundary.split(",")[3:6]])
    for pid in list(recon.points3D.keys()):
        xyz = recon.points3D[pid].xyz
        if np.any(xyz < lo) or np.any(xyz > hi):
            recon.delete_point3D(pid)
    write_model(recon, args.output_path, fmt="bin")
    print(f"Cropped to {recon.num_points3D()} points -> {args.output_path}")


def _cmd_point_filtering(args):
    from colmap_tpu.scene.reconstruction_io import read_model, write_model
    from colmap_tpu.sfm.filtering import filter_points3D

    recon = read_model(args.input_path)
    n = filter_points3D(
        recon,
        max_reproj_error=args.max_reproj_error,
        min_tri_angle_deg=args.min_tri_angle,
    )
    # Minimum track length.
    for pid in list(recon.points3D.keys()):
        if len(recon.points3D[pid].track) < args.min_track_len:
            recon.delete_point3D(pid)
    write_model(recon, args.output_path, fmt="bin")
    print(f"Filtered {n} observations -> {args.output_path}")


def _cmd_project_generator(args):
    from colmap_tpu.controllers.option_manager import OptionManager

    om = OptionManager(
        database_path=args.database_path or "",
        image_path=args.image_path or "",
    )
    om.write(args.output_path)
    print(f"Wrote project file -> {args.output_path}")


def _cmd_database_merger(args):
    from colmap_tpu.scene.database import Database
    from colmap_tpu.utils.types import pair_id_to_image_pair

    db1 = Database(args.database_path1)
    db2 = Database(args.database_path2)
    out = Database(args.merged_database_path)
    id_map = {}
    for db in (db1, db2):
        cam_map = {}
        for cid, cam in db.read_cameras().items():
            import dataclasses as _dc

            cam_map[cid] = out.write_camera(_dc.replace(cam, camera_id=0),
                                            use_camera_id=False)
        local = {}
        for (iid, name, cid) in db.read_images():
            new_id = out.write_image(name, cam_map[cid])
            local[iid] = new_id
            kp = db.read_keypoints(iid)
            if len(kp):
                out.write_keypoints(new_id, kp)
            desc = db.read_descriptors(iid)
            if len(desc):
                out.write_descriptors(new_id, desc)
        for (pair_id, m) in db.read_all_matches():
            a, b = pair_id_to_image_pair(pair_id)
            if a in local and b in local:
                out.write_matches(local[a], local[b], m)
        for (a, b, g) in db.read_all_two_view_geometries():
            if g is not None and a in local and b in local:
                out.write_two_view_geometry(local[a], local[b], g)
    out.commit()
    print(f"Merged -> {args.merged_database_path}: {out.num_images()} images")
    db1.close(); db2.close(); out.close()


def _cmd_pose_prior_mapper(args):
    """Mapper followed by robust alignment to prior positions.

    reference behavior: pose_prior_mapper (exe/sfm.cc) — incremental mapping
    with pose-prior-constrained alignment.
    """
    from colmap_tpu.estimators.alignment import align_reconstruction_to_pose_priors
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.reconstruction_io import write_model
    from colmap_tpu.sfm.incremental_pipeline import (
        IncrementalPipeline,
        IncrementalPipelineOptions,
    )

    db = Database(args.database_path, must_exist=True)
    priors = {}
    for pid, prior in db.read_pose_priors().items():
        if prior["position"] is not None:
            priors[prior["data_id"]] = prior["position"]
    models = IncrementalPipeline(IncrementalPipelineOptions(), db).run()
    os.makedirs(args.output_path, exist_ok=True)
    for i, recon in enumerate(models):
        align_reconstruction_to_pose_priors(
            recon, priors, robust_max_error=args.prior_position_max_error
        )
        out = os.path.join(args.output_path, str(i))
        write_model(recon, out, fmt="bin")
        print(f"Model {i}: {recon.num_reg_frames()} frames -> {out}")
    db.close()




def _cmd_automatic_reconstructor(args):
    from colmap_tpu.controllers.automatic import (
        AutomaticReconstructionOptions,
        DataType,
        Quality,
        run_automatic_reconstruction,
    )

    options = AutomaticReconstructionOptions(
        workspace_path=args.workspace_path,
        image_path=args.image_path,
        data_type=DataType(args.data_type),
        quality=Quality(args.quality),
        camera_model=args.camera_model,
        single_camera=not args.per_image_camera,
        dense=args.dense,
    )
    models = run_automatic_reconstruction(options)
    print(f"Reconstructed {len(models)} model(s) -> {args.workspace_path}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="colmap_tpu",
        description="TPU-native SfM/MVS with COLMAP-compatible data formats",
    )
    p.add_argument("--log_level", type=int, default=0,
                   help="VLOG verbosity: 0 info, 1/2 increasing detail "
                        "(reference: glog --v)")
    p.add_argument("--profile_dir", default="",
                   help="capture a device profile of the command into this "
                        "directory (jax.profiler trace; the reference's "
                        "PROFILING_ENABLED gperftools analog)")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("automatic_reconstructor")
    c.add_argument("--workspace_path", required=True)
    c.add_argument("--image_path", required=True)
    c.add_argument("--data_type", default="individual",
                   choices=["individual", "video", "internet"])
    c.add_argument("--quality", default="high",
                   choices=["low", "medium", "high", "extreme"])
    c.add_argument("--camera_model", default="SIMPLE_RADIAL")
    c.add_argument("--per_image_camera", action="store_true")
    c.add_argument("--dense", action="store_true")
    c.set_defaults(fn=_cmd_automatic_reconstructor)

    c = sub.add_parser("database_creator")
    c.add_argument("--database_path", required=True)
    c.set_defaults(fn=_cmd_database_creator)

    c = sub.add_parser("feature_extractor")
    c.add_argument("--database_path", required=True)
    c.add_argument("--image_path", required=True)
    c.add_argument("--camera_model", default="SIMPLE_RADIAL")
    c.add_argument("--camera_params", default=None)
    c.add_argument("--per_image_camera", action="store_true")
    c.add_argument("--max_num_features", type=int, default=8192)
    c.add_argument("--mask_path", default=None)
    c.add_argument("--camera_mask_path", default=None)
    c.add_argument("--descriptor_type", default="sift",
                   choices=["sift", "aliked"])
    c.add_argument("--aliked_weights_path", default=None)
    c.set_defaults(fn=_cmd_feature_extractor)

    c = sub.add_parser("exhaustive_matcher")
    c.add_argument("--database_path", required=True)
    c.set_defaults(fn=_cmd_exhaustive_matcher)

    c = sub.add_parser("sequential_matcher")
    c.add_argument("--database_path", required=True)
    c.add_argument("--overlap", type=int, default=10)
    c.set_defaults(fn=_cmd_sequential_matcher)

    c = sub.add_parser("matches_importer")
    c.add_argument("--database_path", required=True)
    c.add_argument("--match_list_path", required=True)
    c.set_defaults(fn=_cmd_matches_importer)

    c = sub.add_parser("mapper")
    c.add_argument("--database_path", required=True)
    c.add_argument("--image_path", default=None)
    c.add_argument("--output_path", required=True)
    c.add_argument("--quiet", action="store_true")
    c.set_defaults(fn=_cmd_mapper)

    c = sub.add_parser("global_mapper")
    c.add_argument("--database_path", required=True)
    c.add_argument("--image_path", default=None)
    c.add_argument("--output_path", required=True)
    c.add_argument("--quiet", action="store_true")
    c.set_defaults(fn=_cmd_global_mapper)

    c = sub.add_parser("bundle_adjuster")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--max_num_iterations", type=int, default=100)
    c.set_defaults(fn=_cmd_bundle_adjuster)

    c = sub.add_parser("point_triangulator")
    c.add_argument("--database_path", required=True)
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.set_defaults(fn=_cmd_point_triangulator)

    c = sub.add_parser("model_converter")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--output_type", required=True)
    c.set_defaults(fn=_cmd_model_converter)

    c = sub.add_parser("model_analyzer")
    c.add_argument("--path", required=True)
    c.set_defaults(fn=_cmd_model_analyzer)

    c = sub.add_parser("model_aligner")
    c.add_argument("--input_path", required=True)
    c.add_argument("--ref_model_path", required=True)
    c.add_argument("--output_path", required=True)
    c.set_defaults(fn=_cmd_model_aligner)

    c = sub.add_parser("model_merger")
    c.add_argument("--input_path1", required=True)
    c.add_argument("--input_path2", required=True)
    c.add_argument("--output_path", required=True)
    c.set_defaults(fn=_cmd_model_merger)

    c = sub.add_parser("image_undistorter")
    c.add_argument("--image_path", required=True)
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--output_type", default="COLMAP",
                   choices=["COLMAP", "PMVS", "CMP-MVS"])
    c.set_defaults(fn=_cmd_image_undistorter)

    c = sub.add_parser("patch_match_stereo")
    c.add_argument("--geom_consistency", action="store_true",
                   help="second pass with geometric-consistency cost")
    c.add_argument("--write_consistency_graph", action="store_true",
                   help="write per-pixel consistent-view lists "
                        "(reference: --PatchMatchStereo.write_consistency_graph)")
    c.add_argument("--cache_size", type=float, default=32.0,
                   help="image page cache budget in GB "
                        "(reference: --PatchMatchStereo.cache_size)")
    c.add_argument("--workspace_path", required=True)
    c.set_defaults(fn=_cmd_patch_match_stereo)

    c = sub.add_parser("stereo_fusion")
    c.add_argument("--workspace_path", required=True)
    c.add_argument("--output_path", required=True)
    c.set_defaults(fn=_cmd_stereo_fusion)


    c = sub.add_parser("poisson_mesher")
    c.add_argument("--input_path", required=True, help="fused.ply with normals")
    c.add_argument("--output_path", required=True)
    c.add_argument("--depth", type=int, default=8)
    c.add_argument("--point_weight", type=float, default=1.0)
    c.add_argument("--trim", type=float, default=3.0)
    c.set_defaults(fn=_cmd_poisson_mesher)

    c = sub.add_parser("delaunay_mesher")
    c.add_argument("--input_path", required=True,
                   help="dense workspace with fused.ply(.vis) and sparse/")
    c.add_argument("--output_path", required=True)
    c.add_argument("--quality_regularization", type=float, default=1.0)
    c.set_defaults(fn=_cmd_delaunay_mesher)

    c = sub.add_parser("mesh_texturer")
    c.add_argument("--input_path", required=True, help="mesh PLY")
    c.add_argument("--sparse_path", required=True)
    c.add_argument("--image_path", required=True)
    c.add_argument("--output_path", required=True, help="output OBJ")
    c.add_argument("--patch_size", type=int, default=16)
    c.set_defaults(fn=_cmd_mesh_texturer)

    c = sub.add_parser("mesh_simplifier")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--factor", type=float, default=0.1,
                   help="fraction of faces to keep")
    c.set_defaults(fn=_cmd_mesh_simplifier)

    c = sub.add_parser("color_extractor")
    c.add_argument("--image_path", required=True)
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.set_defaults(fn=_cmd_color_extractor)

    c = sub.add_parser("model_transformer")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--transform_path", required=True)
    c.set_defaults(fn=_cmd_model_transformer)

    c = sub.add_parser("model_cropper")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--boundary", required=True, help="x0,y0,z0,x1,y1,z1")
    c.set_defaults(fn=_cmd_model_cropper)

    c = sub.add_parser("point_filtering")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--max_reproj_error", type=float, default=4.0)
    c.add_argument("--min_tri_angle", type=float, default=1.5)
    c.add_argument("--min_track_len", type=int, default=2)
    c.set_defaults(fn=_cmd_point_filtering)

    c = sub.add_parser("project_generator")
    c.add_argument("--database_path", default="")
    c.add_argument("--image_path", default="")
    c.add_argument("--output_path", required=True)
    c.set_defaults(fn=_cmd_project_generator)

    c = sub.add_parser("database_merger")
    c.add_argument("--database_path1", required=True)
    c.add_argument("--database_path2", required=True)
    c.add_argument("--merged_database_path", required=True)
    c.set_defaults(fn=_cmd_database_merger)

    c = sub.add_parser("pose_prior_mapper")
    c.add_argument("--database_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--prior_position_max_error", type=float, default=5.0)
    c.set_defaults(fn=_cmd_pose_prior_mapper)

    from colmap_tpu.cli.extra_commands import register as register_extra
    from colmap_tpu.cli.extra_commands2 import register as register_extra2

    register_extra(sub)
    register_extra2(sub)

    return p


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    from colmap_tpu.utils import logging as _logging
    from colmap_tpu.utils.jax_cache import enable as _enable_jax_cache

    _enable_jax_cache()
    _logging.set_verbosity(getattr(args, "log_level", 0))
    # Join a multi-host cluster when launched under one (no-op single-host).
    from colmap_tpu.parallel import multihost as _multihost

    _multihost.initialize()
    profile_dir = getattr(args, "profile_dir", "")
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
        try:
            args.fn(args)
        finally:
            jax.profiler.stop_trace()
        _logging.info("Profile written to %s", profile_dir)
    else:
        args.fn(args)


if __name__ == "__main__":
    main()
