"""Build BAProblem arrays from a Reconstruction and write results back.

reference behavior: the problem-construction role of
CreateDefaultBundleAdjuster + BundleAdjustmentConfig
(estimators/bundle_adjustment.h:46-233) and the SoA upload of the Caspar
backend (bundle_adjustment_caspar.h:71-100).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators.bundle_adjustment import BAProblem
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.scene.types import INVALID_POINT3D, Pose
from colmap_tpu.utils.dtypes import floatx


def problem_from_reconstruction(
    recon: Reconstruction,
    image_ids: Optional[List[int]] = None,
    point_ids: Optional[List[int]] = None,
    dtype=floatx(),
    bucket: bool = True,
) -> Tuple[BAProblem, Dict]:
    """Pack (a subset of) a reconstruction into BAProblem arrays.

    Only observations where both the image and the 3D point are selected are
    included. Returns (problem, index) where index maps array rows back to
    ids: {"image_ids", "camera_ids", "point_ids", "model_id"}.

    With ``bucket=True`` the frame/point/observation counts are padded to
    powers of two (weight-0 rows / identity padding) so repeated BA calls in
    the incremental mapper reuse compiled programs instead of recompiling
    per size.
    """
    if image_ids is None:
        image_ids = recon.reg_image_ids()
    image_ids = list(image_ids)
    img_row = {iid: i for i, iid in enumerate(image_ids)}

    camera_ids = sorted({recon.images[i].camera_id for i in image_ids})
    cam_row = {cid: i for i, cid in enumerate(camera_ids)}
    model_ids = sorted({int(recon.cameras[c].model_id) for c in camera_ids})
    if len(model_ids) == 1:
        model_id = model_ids[0]
        cam_params = np.stack([recon.cameras[c].params for c in camera_ids])
    else:
        # Heterogeneous camera models (reference handles any mix per problem,
        # bundle_adjustment_ceres.h:40-116): rows padded to the largest
        # model's param count plus a trailing model-position column consumed
        # by the residual's lax.switch dispatch.
        from colmap_tpu.sensor import models as camera_models

        model_id = tuple(model_ids)
        model_pos = {m: k for k, m in enumerate(model_ids)}
        p_max = max(camera_models.model_num_params(m) for m in model_ids)
        cam_params = np.zeros((len(camera_ids), p_max + 1))
        for row, cid in enumerate(camera_ids):
            cam = recon.cameras[cid]
            cam_params[row, : len(cam.params)] = cam.params
            cam_params[row, -1] = model_pos[int(cam.model_id)]

    if point_ids is None:
        pid_set = set()
        for iid in image_ids:
            for pid in recon.images[iid].points2D_p3d:
                if pid != INVALID_POINT3D:
                    pid_set.add(int(pid))
        point_ids = sorted(pid_set)
    point_ids = list(point_ids)
    pt_row = {pid: i for i, pid in enumerate(point_ids)}

    quat = np.stack([recon.cam_from_world(i).quat for i in image_ids])
    t = np.stack([recon.cam_from_world(i).t for i in image_ids])
    points = np.stack([recon.points3D[p].xyz for p in point_ids]) if point_ids else np.zeros((0, 3))

    obs_frame, obs_cam, obs_point, obs_xy = [], [], [], []
    for iid in image_ids:
        image = recon.images[iid]
        fi = img_row[iid]
        ci = cam_row[image.camera_id]
        for p2d_idx, pid in enumerate(image.points2D_p3d):
            if pid == INVALID_POINT3D or int(pid) not in pt_row:
                continue
            obs_frame.append(fi)
            obs_cam.append(ci)
            obs_point.append(pt_row[int(pid)])
            obs_xy.append(image.points2D_xy[p2d_idx])

    n_obs = len(obs_frame)
    quat_np = quat
    t_np = t
    points_np = points
    obs_frame_np = np.array(obs_frame, dtype=np.int32)
    obs_cam_np = np.array(obs_cam, dtype=np.int32)
    obs_point_np = np.array(obs_point, dtype=np.int32)
    obs_xy_np = np.array(obs_xy, dtype=np.float64).reshape(n_obs, 2)
    obs_w_np = np.ones(n_obs)

    if bucket:
        from colmap_tpu.utils.bucketing import bucket_size, pad_rows

        fb = bucket_size(len(image_ids), 8)
        pb = bucket_size(max(len(point_ids), 1), 64)
        ob = bucket_size(max(n_obs, 1), 256)
        # Frame padding: identity quats keep quaternion math well defined.
        pad_q = np.tile(np.array([1.0, 0, 0, 0]), (fb - len(image_ids), 1))
        quat_np = np.concatenate([quat, pad_q]) if fb > len(image_ids) else quat
        t_np = pad_rows(t, fb)
        points_np = pad_rows(points, pb)
        obs_frame_np = pad_rows(obs_frame_np, ob)
        obs_cam_np = pad_rows(obs_cam_np, ob)
        obs_point_np = pad_rows(obs_point_np, ob)
        obs_xy_np = pad_rows(obs_xy_np, ob)
        obs_w_np = pad_rows(obs_w_np, ob)

    problem = BAProblem(
        quat=jnp.asarray(quat_np, dtype=dtype),
        t=jnp.asarray(t_np, dtype=dtype),
        cam_params=jnp.asarray(cam_params, dtype=dtype),
        points=jnp.asarray(points_np, dtype=dtype),
        obs_frame=jnp.asarray(obs_frame_np),
        obs_cam=jnp.asarray(obs_cam_np),
        obs_point=jnp.asarray(obs_point_np),
        obs_xy=jnp.asarray(obs_xy_np, dtype=dtype),
        obs_w=jnp.asarray(obs_w_np, dtype=dtype),
    )
    index = {
        "image_ids": image_ids,
        "camera_ids": camera_ids,
        "point_ids": point_ids,
        "model_id": model_id if isinstance(model_id, tuple) else int(model_id),
    }
    return problem, index


def update_reconstruction(recon: Reconstruction, problem: BAProblem, index: Dict):
    """Write optimized poses / intrinsics / points back into the scene."""
    for row, iid in enumerate(index["image_ids"]):
        pose = Pose(
            np.asarray(problem.quat[row], dtype=np.float64),
            np.asarray(problem.t[row], dtype=np.float64),
        )
        recon.set_cam_from_world(iid, pose.normalize())
    for row, cid in enumerate(index["camera_ids"]):
        n = len(recon.cameras[cid].params)
        recon.cameras[cid].params = np.asarray(
            problem.cam_params[row][:n], dtype=np.float64
        )
    pts = np.asarray(problem.points, dtype=np.float64)
    for row, pid in enumerate(index["point_ids"]):
        recon.points3D[pid].xyz = pts[row]


def rig_problem_from_reconstruction(
    recon: Reconstruction,
    frame_ids: Optional[List[int]] = None,
    point_ids: Optional[List[int]] = None,
    dtype=None,
):
    """Pack a reconstruction with non-trivial rigs into RigBAProblem arrays.

    Frames carry rig_from_world; each (rig_id, sensor) pair gets one
    sensor_from_rig row (reference sensors are identity and masked
    constant by the solver's default masks).

    Returns (problem, index) with index keys: frame_ids, sensor_keys
    (list of (rig_id, sensor)), camera_ids, point_ids, model_id,
    ref_sensor_rows.
    """
    from colmap_tpu.estimators.bundle_adjustment_rig import RigBAProblem
    from colmap_tpu.scene.types import SensorType

    if dtype is None:
        dtype = floatx()
    if frame_ids is None:
        frame_ids = recon.reg_frame_ids()
    frame_ids = list(frame_ids)
    frame_row = {fid: i for i, fid in enumerate(frame_ids)}

    # Enumerate (rig, sensor) pairs present in the selected frames.
    sensor_keys: List[Tuple[int, Tuple[int, int]]] = []
    sensor_row: Dict[Tuple[int, Tuple[int, int]], int] = {}
    ref_rows: List[int] = []
    image_rows = []  # (image_id, frame_row, sensor_row, camera_id)
    for fid in frame_ids:
        frame = recon.frames[fid]
        rig = recon.rigs[frame.rig_id]
        for iid in frame.image_ids():
            image = recon.images[iid]
            sensor = (int(SensorType.CAMERA), image.camera_id)
            key = (frame.rig_id, sensor)
            if key not in sensor_row:
                sensor_row[key] = len(sensor_keys)
                sensor_keys.append(key)
                if rig.is_ref_sensor(sensor):
                    ref_rows.append(sensor_row[key])
            image_rows.append((iid, frame_row[fid], sensor_row[key], image.camera_id))

    camera_ids = sorted({c for (_, _, _, c) in image_rows})
    cam_row = {cid: i for i, cid in enumerate(camera_ids)}
    model_ids = sorted({int(recon.cameras[c].model_id) for c in camera_ids})
    if len(model_ids) == 1:
        model_id = model_ids[0]
        cam_params = np.stack([recon.cameras[c].params for c in camera_ids])
    else:
        # Heterogeneous rig problem (reference handles any model mix,
        # bundle_adjustment_ceres.h:40-116): same padded-row + trailing
        # model-position-column scheme as problem_from_reconstruction.
        from colmap_tpu.sensor import models as camera_models

        model_id = tuple(model_ids)
        model_pos = {m: k for k, m in enumerate(model_ids)}
        p_max = max(camera_models.model_num_params(m) for m in model_ids)
        cam_params = np.zeros((len(camera_ids), p_max + 1))
        for row, cid in enumerate(camera_ids):
            cam = recon.cameras[cid]
            cam_params[row, : len(cam.params)] = cam.params
            cam_params[row, -1] = model_pos[int(cam.model_id)]

    if point_ids is None:
        pid_set = set()
        for (iid, _, _, _) in image_rows:
            for pid in recon.images[iid].points2D_p3d:
                if pid != INVALID_POINT3D:
                    pid_set.add(int(pid))
        point_ids = sorted(pid_set)
    pt_row = {pid: i for i, pid in enumerate(point_ids)}

    quat = np.stack([recon.frames[f].rig_from_world.quat for f in frame_ids])
    t = np.stack([recon.frames[f].rig_from_world.t for f in frame_ids])
    sq, st = [], []
    for (rig_id, sensor) in sensor_keys:
        pose = recon.rigs[rig_id].sensor_from_rig(sensor)
        sq.append(pose.quat)
        st.append(pose.t)
    points = (
        np.stack([recon.points3D[p].xyz for p in point_ids])
        if point_ids else np.zeros((0, 3))
    )

    obs_frame, obs_sensor, obs_cam, obs_point, obs_xy = [], [], [], [], []
    for (iid, fr, sr, cid) in image_rows:
        image = recon.images[iid]
        for p2d_idx, pid in enumerate(image.points2D_p3d):
            if pid == INVALID_POINT3D or int(pid) not in pt_row:
                continue
            obs_frame.append(fr)
            obs_sensor.append(sr)
            obs_cam.append(cam_row[cid])
            obs_point.append(pt_row[int(pid)])
            obs_xy.append(image.points2D_xy[p2d_idx])

    n_obs = len(obs_frame)
    problem = RigBAProblem(
        quat=jnp.asarray(quat, dtype=dtype),
        t=jnp.asarray(t, dtype=dtype),
        sensor_quat=jnp.asarray(np.stack(sq), dtype=dtype),
        sensor_t=jnp.asarray(np.stack(st), dtype=dtype),
        cam_params=jnp.asarray(cam_params, dtype=dtype),
        points=jnp.asarray(points, dtype=dtype),
        obs_frame=jnp.asarray(np.asarray(obs_frame, np.int32)),
        obs_sensor=jnp.asarray(np.asarray(obs_sensor, np.int32)),
        obs_cam=jnp.asarray(np.asarray(obs_cam, np.int32)),
        obs_point=jnp.asarray(np.asarray(obs_point, np.int32)),
        obs_xy=jnp.asarray(np.asarray(obs_xy, np.float64).reshape(n_obs, 2), dtype=dtype),
        obs_w=jnp.ones(n_obs, dtype=dtype),
    )
    index = {
        "frame_ids": frame_ids,
        "sensor_keys": sensor_keys,
        "camera_ids": camera_ids,
        "point_ids": list(point_ids),
        "model_id": model_id if isinstance(model_id, tuple) else int(model_id),
        "ref_sensor_rows": ref_rows,
    }
    return problem, index


def update_reconstruction_rig(recon: Reconstruction, problem, index: Dict):
    """Write back rig-aware BA results: frame poses, sensor_from_rig,
    intrinsics, points."""
    for row, fid in enumerate(index["frame_ids"]):
        pose = Pose(
            np.asarray(problem.quat[row], dtype=np.float64),
            np.asarray(problem.t[row], dtype=np.float64),
        )
        recon.frames[fid].rig_from_world = pose.normalize()
    for row, (rig_id, sensor) in enumerate(index["sensor_keys"]):
        rig = recon.rigs[rig_id]
        if rig.is_ref_sensor(sensor):
            continue
        rig.sensors[tuple(sensor)] = Pose(
            np.asarray(problem.sensor_quat[row], dtype=np.float64),
            np.asarray(problem.sensor_t[row], dtype=np.float64),
        ).normalize()
    for row, cid in enumerate(index["camera_ids"]):
        n = len(recon.cameras[cid].params)
        recon.cameras[cid].params = np.asarray(
            problem.cam_params[row][:n], dtype=np.float64
        )
    pts = np.asarray(problem.points, dtype=np.float64)
    for row, pid in enumerate(index["point_ids"]):
        recon.points3D[pid].xyz = pts[row]
