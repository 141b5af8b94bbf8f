"""Sparse model exporters: NVM, Bundler, CAM.

reference behavior: src/colmap/scene/reconstruction_io.h:46-90 and
exe/model.cc:633-679 (model_converter output types).
"""

from __future__ import annotations

import os

import numpy as np

from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.scene.types import INVALID_POINT3D
from colmap_tpu.sensor import models as camera_models


def write_nvm(recon: Reconstruction, path: str, skip_distortion: bool = False):
    """VisualSfM NVM_V3 export (reference: WriteNVM, reconstruction_io.cc).

    NVM supports a single radial distortion coefficient; other models are
    written with zero distortion.
    """
    reg = recon.reg_image_ids()
    with open(path, "w") as f:
        f.write("NVM_V3\n\n")
        f.write(f"{len(reg)}\n")
        img_row = {}
        for row, iid in enumerate(reg):
            img_row[iid] = row
            image = recon.images[iid]
            cam = recon.cameras[image.camera_id]
            pose = recon.cam_from_world(iid)
            focal = cam.mean_focal_length()
            center = pose.projection_center()
            q = pose.quat / np.linalg.norm(pose.quat)
            # NVM uses radial coefficient with inverted sign convention.
            mid = int(cam.model_id)
            k = 0.0
            if mid in (
                int(camera_models.CameraModelId.SIMPLE_RADIAL),
                int(camera_models.CameraModelId.RADIAL),
            ):
                k = -float(cam.params[3])
            f.write(
                f"{image.name} {focal} {q[0]} {q[1]} {q[2]} {q[3]} "
                f"{center[0]} {center[1]} {center[2]} {k} 0\n"
            )
        f.write(f"\n{recon.num_points3D()}\n")
        for pid, p in recon.points3D.items():
            track = [el for el in p.track if el.image_id in img_row]
            f.write(
                f"{p.xyz[0]} {p.xyz[1]} {p.xyz[2]} "
                f"{int(p.color[0])} {int(p.color[1])} {int(p.color[2])} {len(track)}"
            )
            for el in track:
                image = recon.images[el.image_id]
                cam = recon.cameras[image.camera_id]
                xy = image.points2D_xy[el.point2D_idx]
                # NVM stores measurements relative to the principal point.
                pp = camera_models.principal_point_idxs(int(cam.model_id))
                cx, cy = cam.params[pp[0]], cam.params[pp[1]]
                f.write(f" {img_row[el.image_id]} {el.point2D_idx} {xy[0] - cx} {xy[1] - cy}")
            f.write("\n")


def write_bundler(recon: Reconstruction, path: str, list_path: str = None):
    """Bundler v0.3 export (reference: WriteBundler).

    Bundler convention: camera looks down -z; x right, y up.
    """
    reg = recon.reg_image_ids()
    with open(path, "w") as f:
        f.write("# Bundle file v0.3\n")
        f.write(f"{len(reg)} {recon.num_points3D()}\n")
        img_row = {}
        for row, iid in enumerate(reg):
            img_row[iid] = row
            image = recon.images[iid]
            cam = recon.cameras[image.camera_id]
            pose = recon.cam_from_world(iid)
            R = pose.rotmat()
            t = pose.t
            # Convert COLMAP (x right, y down, z front) to Bundler
            # (x right, y up, z back): flip rows 2 and 3.
            flip = np.diag([1.0, -1.0, -1.0])
            Rb = flip @ R
            tb = flip @ t
            focal = cam.mean_focal_length()
            mid = int(cam.model_id)
            k1 = k2 = 0.0
            if mid == int(camera_models.CameraModelId.SIMPLE_RADIAL):
                k1 = float(cam.params[3])
            elif mid == int(camera_models.CameraModelId.RADIAL):
                k1, k2 = float(cam.params[3]), float(cam.params[4])
            f.write(f"{focal} {k1} {k2}\n")
            for r in Rb:
                f.write(f"{r[0]} {r[1]} {r[2]}\n")
            f.write(f"{tb[0]} {tb[1]} {tb[2]}\n")
        for pid, p in recon.points3D.items():
            f.write(f"{p.xyz[0]} {p.xyz[1]} {p.xyz[2]}\n")
            f.write(f"{int(p.color[0])} {int(p.color[1])} {int(p.color[2])}\n")
            track = [el for el in p.track if el.image_id in img_row]
            f.write(f"{len(track)}")
            for el in track:
                image = recon.images[el.image_id]
                cam = recon.cameras[image.camera_id]
                pp = camera_models.principal_point_idxs(int(cam.model_id))
                cx, cy = cam.params[pp[0]], cam.params[pp[1]]
                xy = image.points2D_xy[el.point2D_idx]
                # Bundler measurements: center-origin, y up.
                f.write(
                    f" {img_row[el.image_id]} {el.point2D_idx} "
                    f"{xy[0] - cx} {-(xy[1] - cy)}"
                )
            f.write("\n")
    if list_path:
        with open(list_path, "w") as f:
            for iid in reg:
                f.write(recon.images[iid].name + "\n")


def write_cam_files(recon: Reconstruction, out_dir: str):
    """One .cam file per registered image (reference: WriteCam)."""
    os.makedirs(out_dir, exist_ok=True)
    for iid in recon.reg_image_ids():
        image = recon.images[iid]
        cam = recon.cameras[image.camera_id]
        pose = recon.cam_from_world(iid)
        R = pose.rotmat()
        t = pose.t
        focal = cam.mean_focal_length()
        w = max(cam.width, cam.height)
        name = os.path.splitext(image.name)[0] + ".cam"
        pp = camera_models.principal_point_idxs(int(cam.model_id))
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(
                f"{t[0]} {t[1]} {t[2]} "
                + " ".join(str(v) for v in R.reshape(-1))
                + "\n"
            )
            f.write(
                f"{focal / w} 0 0 1 "
                f"{cam.params[pp[0]] / cam.width} {cam.params[pp[1]] / cam.height}\n"
            )
