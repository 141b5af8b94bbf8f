"""CLI batch 4: feature_importer, guided_geometric_verifier,
image_rectifier, image_undistorter_standalone, advancing_front_mesher,
and PMVS/CMP-MVS undistortion export.

reference behavior: exe/feature.cc RunFeatureImporter,
exe/colmap.cc guided_geometric_verifier registration,
exe/image.cc RunImageRectifier/RunImageUndistorterStandalone,
exe/mvs.cc RunAdvancingFrontMesher, controllers/undistorters.cc
PMVSUndistorter/CMPMVSUndistorter.
"""

from __future__ import annotations

import os
import sys

import numpy as np


# ---------------------------------------------------------------------------
# feature_importer


def _load_sift_features_from_text(path):
    """Text format (reference: feature/sift.cc:1696
    LoadSiftFeaturesFromTextFile): header `NUM DIM`, then per line
    `x y scale orientation d0 ... d127` with DIM == 128 uint8 values."""
    with open(path, "r") as f:
        header = f.readline().split()
        n, dim = int(header[0]), int(header[1])
        if dim != 128:
            raise ValueError(f"SIFT features must have 128 dims, got {dim}")
        kp = np.zeros((n, 4), dtype=np.float32)
        desc = np.zeros((n, dim), dtype=np.uint8)
        for i in range(n):
            vals = f.readline().split()
            kp[i] = [float(v) for v in vals[:4]]
            d = np.asarray([float(v) for v in vals[4 : 4 + dim]])
            if (d < 0).any() or (d > 255).any():
                raise ValueError("descriptor values must be in [0, 255]")
            desc[i] = np.clip(np.round(d), 0, 255).astype(np.uint8)
    return kp, desc


def _cmd_feature_importer(args):
    from colmap_tpu.controllers.feature_pipeline import ImageReaderOptions
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.types import Camera
    from colmap_tpu.sensor import models as camera_models

    db = Database(args.database_path)
    reader = ImageReaderOptions(
        camera_model=args.camera_model,
        single_camera=not args.per_image_camera,
        camera_params=args.camera_params,
    )
    if args.image_list_path:
        with open(args.image_list_path) as f:
            names = [ln.strip() for ln in f if ln.strip()]
    else:
        names = sorted(
            f
            for f in os.listdir(args.image_path)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"))
        )
    model_id = camera_models.MODEL_NAME_TO_ID[reader.camera_model]
    existing = {name: iid for (iid, name, _) in db.read_images()}
    camera_id = None
    n_imported = 0
    for name in names:
        feat_path = os.path.join(args.import_path, name + ".txt")
        if not os.path.exists(feat_path):
            print(f"SKIP: no features at {feat_path}")
            continue
        if camera_id is None or not reader.single_camera:
            from PIL import Image as PILImage

            with PILImage.open(os.path.join(args.image_path, name)) as im:
                w, h = im.size
            cam = Camera.create(0, model_id, 1.2 * max(w, h), w, h)
            if reader.camera_params:
                cam.params = np.array(
                    [float(v) for v in reader.camera_params.split(",")]
                )
                cam.has_prior_focal_length = True
            camera_id = db.write_camera(cam, use_camera_id=False)
        image_id = existing.get(name) or db.write_image(name, camera_id)
        kp, desc = _load_sift_features_from_text(feat_path)
        if not db.exists_keypoints(image_id):
            db.write_keypoints(image_id, kp)
            db.write_descriptors(image_id, desc)
            n_imported += 1
    db.commit()
    db.close()
    print(f"Imported features for {n_imported} images")


# ---------------------------------------------------------------------------
# image_rectifier


def _cmd_image_rectifier(args):
    from PIL import Image as PILImage

    from colmap_tpu.image.rectification import rectify_and_undistort_stereo_images
    from colmap_tpu.image.undistortion import UndistortOptions
    from colmap_tpu.scene.reconstruction_io import read_model

    recon = read_model(args.input_path)
    name_to_id = {img.name: iid for iid, img in recon.images.items()}
    with open(args.stereo_pairs_list) as f:
        pairs = [ln.split() for ln in f if ln.strip()]
    options = UndistortOptions(
        blank_pixels=args.blank_pixels,
        min_scale=args.min_scale,
        max_scale=args.max_scale,
        max_image_size=args.max_image_size,
    )
    n = 0
    for name1, name2 in pairs:
        if name1 not in name_to_id or name2 not in name_to_id:
            print(f"SKIP: pair {name1} {name2} not in reconstruction")
            continue
        id1, id2 = name_to_id[name1], name_to_id[name2]
        img1 = np.asarray(PILImage.open(os.path.join(args.image_path, name1)))
        img2 = np.asarray(PILImage.open(os.path.join(args.image_path, name2)))
        cam1 = recon.cameras[recon.images[id1].camera_id]
        cam2 = recon.cameras[recon.images[id2].camera_id]
        cam2_from_cam1 = recon.cam_from_world(id2).compose(
            recon.cam_from_world(id1).inverse()
        )
        r1, r2, ucam, Q = rectify_and_undistort_stereo_images(
            img1, img2, cam1, cam2, cam2_from_cam1, options
        )
        stem = f"{os.path.splitext(name1)[0]}-{os.path.splitext(name2)[0]}"
        outdir = os.path.join(args.output_path, stem)
        os.makedirs(outdir, exist_ok=True)
        PILImage.fromarray(np.asarray(r1, dtype=np.uint8)).save(
            os.path.join(outdir, os.path.basename(name1))
        )
        PILImage.fromarray(np.asarray(r2, dtype=np.uint8)).save(
            os.path.join(outdir, os.path.basename(name2))
        )
        np.savetxt(os.path.join(outdir, "Q.txt"), Q)
        n += 1
    print(f"Rectified {n} stereo pairs -> {args.output_path}")


# ---------------------------------------------------------------------------
# image_undistorter_standalone


def _cmd_image_undistorter_standalone(args):
    from PIL import Image as PILImage

    from colmap_tpu.image.undistortion import (
        UndistortOptions,
        undistort_camera,
        undistort_image,
    )
    from colmap_tpu.scene.types import Camera
    from colmap_tpu.sensor import models as camera_models

    options = UndistortOptions(
        blank_pixels=args.blank_pixels,
        min_scale=args.min_scale,
        max_scale=args.max_scale,
        max_image_size=args.max_image_size,
    )
    os.makedirs(args.output_path, exist_ok=True)
    n = 0
    # Input line format (reference: exe/image.cc:465-468):
    #   image_name CAMERA_MODEL camera_params...
    with open(args.input_file) as f:
        for ln in f:
            parts = ln.split()
            if not parts:
                continue
            name, model_name = parts[0], parts[1]
            params = np.array([float(v) for v in parts[2:]])
            src = os.path.join(args.image_path, name)
            img = np.asarray(PILImage.open(src))
            h, w = img.shape[:2]
            cam = Camera(
                camera_id=1,
                model_id=camera_models.MODEL_NAME_TO_ID[model_name],
                width=w,
                height=h,
                params=params,
            )
            ucam = undistort_camera(cam, options)
            out = undistort_image(img, cam, ucam)
            dst = os.path.join(args.output_path, name)
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            PILImage.fromarray(np.asarray(out, dtype=np.uint8)).save(dst)
            n += 1
    print(f"Undistorted {n} images -> {args.output_path}")


# ---------------------------------------------------------------------------
# advancing_front_mesher


def _cmd_advancing_front_mesher(args):
    from colmap_tpu.mvs.meshing import (
        AdvancingFrontMeshingOptions,
        advancing_front_mesh,
    )
    from colmap_tpu.utils.ply import read_ply, write_ply_mesh

    data = read_ply(args.input_path)
    options = AdvancingFrontMeshingOptions(
        radius_ratio_bound=args.radius_ratio_bound,
    )
    verts, faces = advancing_front_mesh(data["points"], options)
    colors = data.get("colors")
    write_ply_mesh(args.output_path, verts, faces, colors)
    print(f"Meshed {len(verts)} vertices, {len(faces)} faces -> {args.output_path}")


# ---------------------------------------------------------------------------
# PMVS / CMP-MVS undistortion export (used by image_undistorter --output_type)


def _write_projection_matrix(path, camera, cam_from_world, header="CONTOUR"):
    """reference: controllers/undistorters.cc WriteProjectionMatrix —
    P = K [R|t], preceded by a header line."""
    from colmap_tpu.image.rectification import _calibration_matrix

    K = _calibration_matrix(camera)
    P = K @ cam_from_world.matrix3x4()
    with open(path, "w") as f:
        if header:
            f.write(header + "\n")
        for row in P:
            f.write(" ".join(f"{v:.12g}" for v in row) + "\n")


def export_pmvs(recon, image_dir, output_path, options=None):
    """PMVS workspace layout (reference: controllers/undistorters.cc:315-556):
    pmvs/visualize/%08d.jpg, pmvs/txt/%08d.txt, pmvs/models/, vis.dat,
    option-all, run scripts."""
    from PIL import Image as PILImage

    from colmap_tpu.image.undistortion import (
        UndistortOptions,
        undistort_camera,
        undistort_image,
    )

    options = options or UndistortOptions()
    base = os.path.join(output_path, "pmvs")
    for sub in ("visualize", "txt", "models"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    reg_ids = recon.reg_image_ids()
    ucams = {}
    for idx, iid in enumerate(reg_ids):
        image = recon.images[iid]
        cam = recon.cameras[image.camera_id]
        if image.camera_id not in ucams:
            ucams[image.camera_id] = undistort_camera(cam, options)
        ucam = ucams[image.camera_id]
        src = os.path.join(image_dir, image.name)
        if os.path.exists(src):
            img = np.asarray(PILImage.open(src).convert("RGB"))
            out = undistort_image(img, cam, ucam)
            PILImage.fromarray(np.asarray(out, dtype=np.uint8)).save(
                os.path.join(base, "visualize", f"{idx:08d}.jpg")
            )
        _write_projection_matrix(
            os.path.join(base, "txt", f"{idx:08d}.txt"),
            ucam,
            recon.cam_from_world(iid),
        )
    # vis.dat: per image, the set of co-visible images (reference :420-455).
    id_to_idx = {iid: i for i, iid in enumerate(reg_ids)}
    with open(os.path.join(base, "vis.dat"), "w") as f:
        f.write("VISDATA\n")
        f.write(f"{len(reg_ids)}\n")
        for idx, iid in enumerate(reg_ids):
            image = recon.images[iid]
            visible = set()
            for p3d_id in image.points2D_p3d:
                if p3d_id < 0 or p3d_id not in recon.points3D:
                    continue
                for el in recon.points3D[p3d_id].track:
                    if el.image_id != iid and el.image_id in id_to_idx:
                        visible.add(id_to_idx[el.image_id])
            f.write(f"{idx} {len(visible)}")
            for v in sorted(visible):
                f.write(f" {v}")
            f.write("\n")
    # option-all (reference :529-556).
    with open(os.path.join(base, "option-all"), "w") as f:
        f.write("# Generated by colmap_tpu - all images, no clustering.\n")
        f.write("level 1\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n")
        f.write(f"CPU {os.cpu_count() or 1}\n")
        f.write("setEdge 0\nuseBound 0\nuseVisData 1\nsequence -1\n")
        f.write("maxAngle 10\nquad 2.0\n")
        f.write(f"timages {len(reg_ids)}")
        for i in range(len(reg_ids)):
            f.write(f" {i}")
        f.write("\noimages 0\n")
    with open(os.path.join(output_path, "run-pmvs.sh"), "w") as f:
        f.write("# Usage: ./run-pmvs.sh PMVS_EXE_PATH\n")
        f.write("PMVS_EXE_PATH=$1\n")
        f.write("$PMVS_EXE_PATH/pmvs2 pmvs/ option-all\n")


def export_cmp_mvs(recon, image_dir, output_path, options=None):
    """CMP-MVS layout (reference: controllers/undistorters.cc:601-631):
    %05d.jpg + %05d_P.txt with CONTOUR header."""
    from PIL import Image as PILImage

    from colmap_tpu.image.undistortion import (
        UndistortOptions,
        undistort_camera,
        undistort_image,
    )

    options = options or UndistortOptions()
    os.makedirs(output_path, exist_ok=True)
    ucams = {}
    for idx, iid in enumerate(recon.reg_image_ids()):
        image = recon.images[iid]
        cam = recon.cameras[image.camera_id]
        if image.camera_id not in ucams:
            ucams[image.camera_id] = undistort_camera(cam, options)
        ucam = ucams[image.camera_id]
        src = os.path.join(image_dir, image.name)
        if os.path.exists(src):
            img = np.asarray(PILImage.open(src).convert("RGB"))
            out = undistort_image(img, cam, ucam)
            PILImage.fromarray(np.asarray(out, dtype=np.uint8)).save(
                os.path.join(output_path, f"{idx + 1:05d}.jpg")
            )
        _write_projection_matrix(
            os.path.join(output_path, f"{idx + 1:05d}_P.txt"),
            ucam,
            recon.cam_from_world(iid),
        )


# ---------------------------------------------------------------------------


def register(sub):
    c = sub.add_parser("feature_importer")
    c.add_argument("--database_path", required=True)
    c.add_argument("--image_path", required=True)
    c.add_argument("--import_path", required=True)
    c.add_argument("--image_list_path", default=None)
    c.add_argument("--camera_model", default="SIMPLE_RADIAL")
    c.add_argument("--camera_params", default=None)
    c.add_argument("--per_image_camera", action="store_true")
    c.set_defaults(fn=_cmd_feature_importer)

    c = sub.add_parser("guided_geometric_verifier")
    c.add_argument("--database_path", required=True)
    c.set_defaults(
        fn=lambda args: _guided_geometric_verifier(args)
    )

    c = sub.add_parser("image_rectifier")
    c.add_argument("--image_path", required=True)
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--stereo_pairs_list", required=True)
    c.add_argument("--blank_pixels", type=float, default=0.0)
    c.add_argument("--min_scale", type=float, default=0.2)
    c.add_argument("--max_scale", type=float, default=2.0)
    c.add_argument("--max_image_size", type=int, default=-1)
    c.set_defaults(fn=_cmd_image_rectifier)

    c = sub.add_parser("image_undistorter_standalone")
    c.add_argument("--image_path", required=True)
    c.add_argument("--input_file", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--blank_pixels", type=float, default=0.0)
    c.add_argument("--min_scale", type=float, default=0.2)
    c.add_argument("--max_scale", type=float, default=2.0)
    c.add_argument("--max_image_size", type=int, default=-1)
    c.set_defaults(fn=_cmd_image_undistorter_standalone)

    c = sub.add_parser("advancing_front_mesher")
    c.add_argument("--input_path", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--radius_ratio_bound", type=float, default=5.0)
    c.set_defaults(fn=_cmd_advancing_front_mesher)


def _guided_geometric_verifier(args):
    from colmap_tpu.cli.extra_commands import _cmd_geometric_verifier

    args.guided_matching = True
    _cmd_geometric_verifier(args)
