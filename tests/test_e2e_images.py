"""Full-native end-to-end: rendered images -> SIFT -> matching ->
verification -> incremental mapping -> compare with ground truth.

reference test strategy: scene/synthetic.cc SynthesizeImages (:773) renders
per-point feature patches into images so the whole pipeline (including
extraction+matching) can run without real data.
"""

import os

import numpy as np
import pytest

from colmap_tpu.controllers.feature_pipeline import (
    ImageReaderOptions,
    MatchingPipelineOptions,
    run_exhaustive_matching,
    run_feature_extraction,
)
from colmap_tpu.estimators.alignment import compare_reconstructions
from colmap_tpu.feature.sift import SiftOptions
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.scene.types import Camera, Frame, Image, Pose, Rig, TrackElement
from colmap_tpu.sfm.incremental_pipeline import (
    IncrementalPipeline,
    IncrementalPipelineOptions,
)
from colmap_tpu.utils.types import SensorType


def _render_scene(tmp_path, n_images=6, n_points=100, size=480, seed=0):
    """Render synthetic views of a 3D point cloud with per-point patches."""
    rng = np.random.default_rng(seed)
    f = 1.2 * size
    w = h = size
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])

    # Large angular spread of the point cloud relative to the camera ring
    # keeps the two-view geometry well conditioned.
    pts = rng.standard_normal((n_points, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= rng.uniform(1.2, 2.0, (n_points, 1))

    # Per-point appearance: random 11x11 patch (same in every view).
    P = 13
    from scipy.ndimage import gaussian_filter

    patches = gaussian_filter(rng.uniform(0.0, 1.0, (n_points, P, P)), (0, 0.7, 0.7))
    patches = (patches - patches.min()) / (patches.max() - patches.min())

    gt = Reconstruction()
    cam = Camera(camera_id=1, model_id=1, width=w, height=h,
                 params=np.array([f, f, w / 2, h / 2]), has_prior_focal_length=True)
    gt.add_camera(cam)

    img_dir = tmp_path / "images"
    os.makedirs(img_dir, exist_ok=True)

    from colmap_tpu.scene.synthetic import _rotation_between

    names = []
    for i in range(n_images):
        # Viewpoints on a sphere sector (keep overlap high).
        theta = 0.5 * (i / max(n_images - 1, 1) - 0.5)
        phi = 0.25 * rng.standard_normal()
        view_dir = np.array(
            [np.sin(theta), np.sin(phi), -np.cos(theta) * np.cos(phi)]
        )
        view_dir /= np.linalg.norm(view_dir)
        center = -4.0 * view_dir
        quat = _rotation_between(view_dir, np.array([0.0, 0.0, 1.0]))
        pose = Pose(quat, Pose(quat, np.zeros(3)).apply(-center[None])[0])

        # Geometrically consistent rendering: each point carries a small
        # textured 3D plane (tangent to the sphere), texture-mapped by exact
        # ray-plane intersection so keypoints correspond to true 3D points
        # across all views.
        Xc = pose.apply(pts)
        uv = (Xc[:, :2] / Xc[:, 2:]) * f + np.array([w / 2, h / 2])
        img = np.zeros((h, w), dtype=np.float64)
        R_cw = pose.rotmat()
        cam_center = pose.projection_center()
        patch_world = 0.11  # patch half-size in world units
        for j in range(n_points):
            if Xc[j, 2] <= 0:
                continue
            x, y = uv[j]
            if not (P < x < w - P * 2 and P < y < h - P * 2):
                continue
            n_pl = pts[j] / np.linalg.norm(pts[j])  # outward normal
            e1 = np.cross(n_pl, [0.0, 0.0, 1.0])
            if np.linalg.norm(e1) < 1e-6:
                e1 = np.cross(n_pl, [0.0, 1.0, 0.0])
            e1 /= np.linalg.norm(e1)
            e2 = np.cross(n_pl, e1)
            # Bounding box: project the 4 plane corners.
            corners = np.stack(
                [pts[j] + patch_world * (su * e1 + sv * e2)
                 for su in (-1, 1) for sv in (-1, 1)]
            )
            cc = pose.apply(corners)
            cuv = (cc[:, :2] / cc[:, 2:]) * f + np.array([w / 2, h / 2])
            x0, y0 = np.floor(cuv.min(axis=0)).astype(int) - 1
            x1_, y1_ = np.ceil(cuv.max(axis=0)).astype(int) + 1
            x0, y0 = max(x0, 0), max(y0, 0)
            x1_, y1_ = min(x1_, w - 1), min(y1_, h - 1)
            if x1_ <= x0 or y1_ <= y0:
                continue
            ys_, xs_ = np.mgrid[y0:y1_, x0:x1_]
            rays = np.stack(
                [(xs_ - w / 2) / f, (ys_ - h / 2) / f, np.ones_like(xs_, dtype=float)],
                axis=-1,
            )
            d_world = rays @ R_cw  # Rᵀ applied row-wise
            denom = d_world @ n_pl
            tnum = (pts[j] - cam_center) @ n_pl
            with np.errstate(divide="ignore", invalid="ignore"):
                tpar = tnum / denom
            Xw = cam_center + tpar[..., None] * d_world
            lu = ((Xw - pts[j]) @ e1) / patch_world  # [-1, 1]
            lv = ((Xw - pts[j]) @ e2) / patch_world
            inside = (np.abs(lu) < 1) & (np.abs(lv) < 1) & (denom > 1e-9)
            pu = np.clip((lu + 1) / 2 * (P - 1), 0, P - 1)
            pv = np.clip((lv + 1) / 2 * (P - 1), 0, P - 1)
            pui = pu.astype(int)
            pvi = pv.astype(int)
            val = patches[j][pvi, pui]
            img[y0:y1_, x0:x1_] += np.where(inside, val, 0.0)
        img = np.clip(img, 0, 1.5) / 1.5
        name = f"view{i:03d}.png"
        names.append(name)
        from PIL import Image as PILImage

        PILImage.fromarray((img * 255).astype(np.uint8)).save(img_dir / name)

        image_id = i + 1
        rig = Rig(rig_id=image_id, ref_sensor_id=(int(SensorType.CAMERA), 1))
        gt.add_rig(rig)
        frame = Frame(
            frame_id=image_id, rig_id=image_id, rig_from_world=pose,
            data_ids=[(int(SensorType.CAMERA), 1, image_id)],
        )
        gt.add_frame(frame)
        gt_img = Image(image_id=image_id, name=name, camera_id=1, frame_id=image_id)
        gt.add_image(gt_img)
        gt.register_frame(image_id)
    return str(img_dir), names, gt, f


@pytest.mark.slow
def test_full_pipeline_from_images(tmp_path):
    img_dir, names, gt, focal = _render_scene(tmp_path)

    db = Database(":memory:")
    image_ids = run_feature_extraction(
        db, img_dir, names,
        ImageReaderOptions(
            camera_model="PINHOLE",
            camera_params=f"{focal},{focal},240,240",
        ),
        SiftOptions(max_num_features=2000),
    )
    assert len(image_ids) == len(names)
    for iid in image_ids:
        assert len(db.read_keypoints(iid)) > 50

    n_verified = run_exhaustive_matching(db)
    assert n_verified >= len(names) - 1, f"only {n_verified} verified pairs"

    import dataclasses
    from colmap_tpu.sfm.incremental_mapper import IncrementalMapperOptions

    opts = IncrementalPipelineOptions(
        mapper=IncrementalMapperOptions(
            init_min_num_inliers=50, abs_pose_min_num_inliers=15
        )
    )
    pipeline = IncrementalPipeline(opts, db)
    models = pipeline.run()
    assert models, "no model reconstructed"
    recon = models[0]
    assert recon.num_reg_frames() >= len(names) - 1
    cmp = compare_reconstructions(recon, gt)
    assert cmp["num_common_images"] >= len(names) - 1
    # Loose tolerances: unwarped patch rendering quantizes keypoints.
    assert cmp["max_rotation_error_deg"] < 2.0
    assert cmp["max_center_error"] < 0.25
