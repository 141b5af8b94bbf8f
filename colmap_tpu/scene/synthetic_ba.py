"""Synthetic bundle-adjustment problem generator (array-level, fast).

Generates BAProblem instances directly as arrays (no Reconstruction
round-trip) for solver tests and benchmarks — the counterpart of the
reference's benchmark fixtures (benchmark/runtime/bundle_adjustment.cc:61-196
builds synthetic problems of N frames x M points with noise).
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax
import jax.numpy as jnp

from colmap_tpu.estimators.bundle_adjustment import BAProblem
from colmap_tpu.sensor import models as camera_models


def synthetic_ba_problem(
    num_frames: int = 50,
    num_points: int = 2000,
    obs_per_point: int = 6,
    model_id: int = int(camera_models.CameraModelId.SIMPLE_RADIAL),
    pixel_noise: float = 0.5,
    pose_noise: float = 0.02,
    point_noise: float = 0.02,
    seed: int = 0,
    dtype=jnp.float32,
):
    """Cameras on a sphere of radius 5 looking at unit-sphere points.

    Returns (problem, gt_problem, model_id). Generation runs on the host
    CPU backend when available (setup must not compile one-off programs on
    a tunneled accelerator); benchmark callers device_put the result.
    """
    try:
        ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        return _synthetic_ba_problem_impl(
            num_frames, num_points, obs_per_point, model_id, pixel_noise,
            pose_noise, point_noise, seed, dtype,
        )


def _synthetic_ba_problem_impl(
    num_frames, num_points, obs_per_point, model_id, pixel_noise,
    pose_noise, point_noise, seed, dtype,
):
    rng = np.random.default_rng(seed)

    # Ground-truth scene.
    pts = rng.standard_normal((num_points, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= rng.uniform(0.5, 1.0, (num_points, 1))

    view_dirs = rng.standard_normal((num_frames, 3))
    view_dirs /= np.linalg.norm(view_dirs, axis=1, keepdims=True)
    centers = 5.0 * view_dirs

    # cam_from_world: rotation taking -view_dir to +z.
    quats = np.zeros((num_frames, 4))
    for i in range(num_frames):
        a = -view_dirs[i]
        b = np.array([0.0, 0.0, 1.0])
        c = np.cross(a, b)
        w = 1.0 + float(a @ b)
        q = np.array([w, *c]) if w > 1e-8 else np.array([0.0, 1.0, 0.0, 0.0])
        quats[i] = q / np.linalg.norm(q)
    ts = np.zeros((num_frames, 3))
    from colmap_tpu.scene.types import Pose

    for i in range(num_frames):
        ts[i] = -Pose(quats[i], np.zeros(3)).apply(centers[i][None])[0] * -1.0
        ts[i] = Pose(quats[i], np.zeros(3)).apply(-centers[i][None])[0]

    if model_id == int(camera_models.CameraModelId.SIMPLE_RADIAL):
        params = np.array([[1280.0, 512.0, 384.0, 0.02]])
    elif model_id == int(camera_models.CameraModelId.PINHOLE):
        params = np.array([[1280.0, 1280.0, 512.0, 384.0]])
    else:
        params = camera_models.initialize_params(model_id, 1280.0, 1024, 768)[None]

    # Observations: each point seen by obs_per_point random frames.
    # Sorted by point id (repeat is already sorted) -> sorted segment-sum
    # fast path in the solver.
    obs_point = np.repeat(np.arange(num_points), obs_per_point)
    obs_frame = rng.integers(0, num_frames, num_points * obs_per_point)
    obs_cam = np.zeros_like(obs_frame)

    # Project with the GT state to get measurements.
    gt = BAProblem(
        quat=jnp.asarray(quats, dtype=dtype),
        t=jnp.asarray(ts, dtype=dtype),
        cam_params=jnp.asarray(params, dtype=dtype),
        points=jnp.asarray(pts, dtype=dtype),
        obs_frame=jnp.asarray(obs_frame, dtype=jnp.int32),
        obs_cam=jnp.asarray(obs_cam, dtype=jnp.int32),
        obs_point=jnp.asarray(obs_point, dtype=jnp.int32),
        obs_xy=jnp.zeros((len(obs_frame), 2), dtype=dtype),
        obs_w=jnp.ones(len(obs_frame), dtype=dtype),
    )
    from colmap_tpu.geometry import rotation as rot

    Xc = rot.quat_rotate(gt.quat[gt.obs_frame], gt.points[gt.obs_point]) + gt.t[gt.obs_frame]
    xy, valid = camera_models.img_from_cam(
        model_id, gt.cam_params[0], Xc, check_cheirality=True
    )
    # Stay on device: a host round-trip here costs nothing on CPU but on a
    # tunneled accelerator the first jit-output fetch of a process can
    # stall for minutes (observed on the axon TPU relay) — generator setup
    # must never be the thing that pays it.
    w = valid.astype(dtype)
    xy_noisy = xy + jnp.asarray(
        rng.normal(0, pixel_noise, (len(obs_frame), 2)), dtype=dtype
    )
    gt = gt._replace(obs_xy=xy, obs_w=w)

    # Noisy initial state.
    quats_n = quats + rng.normal(0, pose_noise * 0.2, quats.shape)
    quats_n /= np.linalg.norm(quats_n, axis=1, keepdims=True)
    ts_n = ts + rng.normal(0, pose_noise, ts.shape)
    pts_n = pts + rng.normal(0, point_noise, pts.shape)
    problem = gt._replace(
        quat=jnp.asarray(quats_n, dtype=dtype),
        t=jnp.asarray(ts_n, dtype=dtype),
        points=jnp.asarray(pts_n, dtype=dtype),
        obs_xy=xy_noisy,
    )
    return problem, gt, model_id
