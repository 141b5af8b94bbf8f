"""Vectorized observation/point filtering.

reference behavior: src/colmap/sfm/observation_manager.h:50-200
(FilterPoints3D: reprojection error, triangulation angle, negative depth).
All per-observation math is batched into one jitted call over padded
(point x view) arrays instead of the reference's per-point loops.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.sensor import models as camera_models
from colmap_tpu.utils.bucketing import bucket_size


@partial(jax.jit, static_argnums=(0,))
def _filter_kernel(model_id, quat, t, cam_params, xyz, obs_xy, valid):
    """Per-(point, view) reprojection errors + per-point max tri angle.

    quat/t: (P, V, 4/3) cam_from_world per observation; cam_params (P, V, K);
    xyz (P, 3); obs_xy (P, V, 2); valid (P, V).
    Returns (errors (P, V) px, depths (P, V), min_cos (P,)).
    """
    from colmap_tpu.geometry import rotation as rot

    Xc = rot.quat_rotate(quat, xyz[:, None, :]) + t
    depth = Xc[..., 2]
    if isinstance(model_id, tuple):
        mi = jnp.round(cam_params[..., -1]).astype(jnp.int32)
        proj, ok = jax.vmap(jax.vmap(
            lambda idx, p, x: camera_models.img_from_cam_switch(
                model_id, idx, p, x
            )
        ))(mi, cam_params[..., :-1], Xc)
    else:
        proj, ok = camera_models.img_from_cam(model_id, cam_params, Xc)
    err = jnp.linalg.norm(proj - obs_xy, axis=-1)
    err = jnp.where(ok & valid, err, jnp.inf)
    err = jnp.where(valid, err, 0.0)

    # Triangulation angle: rays from camera centers to the point.
    centers = -rot.quat_rotate(rot.quat_conjugate(rot.quat_normalize(quat)), t)
    rays = xyz[:, None, :] - centers
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-30)
    cos_pair = jnp.einsum("pvi,pwi->pvw", rays, rays)
    pair_valid = valid[:, :, None] & valid[:, None, :]
    V = valid.shape[1]
    eye = jnp.eye(V, dtype=bool)[None]
    cos_pair = jnp.where(pair_valid & ~eye, jnp.abs(cos_pair), 1.0)
    min_cos = jnp.min(cos_pair.reshape(cos_pair.shape[0], -1), axis=-1)
    return err, depth, min_cos


def filter_points3D(
    recon: Reconstruction,
    max_reproj_error: float,
    min_tri_angle_deg: float,
    point_ids: List[int] = None,
    max_views: int = 32,
) -> int:
    """Filter observations/points; returns number of deleted observations.

    Matches the reference semantics: drop observations with error above
    threshold or negative depth; then drop points whose track fell below 2
    or whose maximum pairwise triangulation angle is below the minimum.
    """
    if point_ids is None:
        point_ids = list(recon.points3D.keys())
    point_ids = [p for p in point_ids if p in recon.points3D]
    if not point_ids:
        return 0

    # Heterogeneous camera models dispatch via lax.switch on a trailing
    # model-position column (reference handles any mix per problem,
    # observation_manager.h:50-200 is model-agnostic through Camera).
    model_ids = sorted({int(c.model_id) for c in recon.cameras.values()})
    if len(model_ids) == 1:
        model_id = model_ids[0]
        n_params = camera_models.model_num_params(model_id)
        model_pos = None
    else:
        model_id = tuple(model_ids)
        model_pos = {m: k for k, m in enumerate(model_ids)}
        n_params = max(
            camera_models.model_num_params(m) for m in model_ids
        ) + 1

    P = len(point_ids)
    Pb = bucket_size(P, 64)
    V = max_views
    quat = np.zeros((Pb, V, 4))
    quat[..., 0] = 1.0
    tvec = np.zeros((Pb, V, 3))
    params = np.zeros((Pb, V, n_params))
    params[..., 0] = 1.0
    xyz = np.zeros((Pb, 3))
    obs_xy = np.zeros((Pb, V, 2))
    valid = np.zeros((Pb, V), dtype=bool)
    track_refs = []

    pose_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    for i, pid in enumerate(point_ids):
        point = recon.points3D[pid]
        xyz[i] = point.xyz
        refs = []
        for v, el in enumerate(point.track[:V]):
            img = recon.images[el.image_id]
            if el.image_id not in pose_cache:
                pose = recon.cam_from_world(el.image_id)
                pose_cache[el.image_id] = (pose.quat, pose.t)
            q, tt = pose_cache[el.image_id]
            quat[i, v] = q
            tvec[i, v] = tt
            cam = recon.cameras[img.camera_id]
            if model_pos is None:
                params[i, v] = cam.params
            else:
                params[i, v, : len(cam.params)] = cam.params
                params[i, v, -1] = model_pos[int(cam.model_id)]
            obs_xy[i, v] = img.points2D_xy[el.point2D_idx]
            valid[i, v] = True
            refs.append(el)
        track_refs.append(refs)

    err, depth, min_cos = _filter_kernel(
        model_id,
        jnp.asarray(quat), jnp.asarray(tvec), jnp.asarray(params),
        jnp.asarray(xyz), jnp.asarray(obs_xy), jnp.asarray(valid),
    )
    err = np.asarray(err)
    depth = np.asarray(depth)
    max_angle = np.rad2deg(np.arccos(np.clip(np.asarray(min_cos), -1, 1)))

    num_deleted = 0
    for i, pid in enumerate(point_ids):
        if pid not in recon.points3D:
            continue
        refs = track_refs[i]
        bad = [
            el
            for v, el in enumerate(refs)
            if depth[i, v] <= 0 or err[i, v] > max_reproj_error
        ]
        for el in bad:
            if pid in recon.points3D:
                recon.delete_observation(el.image_id, el.point2D_idx)
                num_deleted += 1
        if pid not in recon.points3D:
            continue
        if len(recon.points3D[pid].track) < 2:
            num_deleted += len(recon.points3D[pid].track)
            recon.delete_point3D(pid)
            continue
        if max_angle[i] < min_tri_angle_deg:
            num_deleted += len(recon.points3D[pid].track)
            recon.delete_point3D(pid)
    return num_deleted
