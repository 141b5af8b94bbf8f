"""Rig-aware bundle adjustment: frames + sensor_from_rig + intrinsics.

reference behavior: src/colmap/estimators/bundle_adjustment.* with rigs —
the reprojection chain is cam_from_world = sensor_from_rig * rig_from_world
(cost_functions/reprojection_error.h rig-aware variants), where frames own
rig_from_world and each non-reference sensor owns one sensor_from_rig pose
shared across all its frames. This module extends the LM+Schur+PCG solver
(bundle_adjustment.py — see its docstring for the TPU design rationale)
with the extra 6-dof sensor block family; the plain solver remains the fast
path for trivial (mono) rigs.

Problem layout additions:
    sensors: sensor_quat (G, 4), sensor_t (G, 3)   sensor_from_rig
    observations: obs_sensor (O,) int32 index into sensors
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from colmap_tpu.estimators.bundle_adjustment import (
    BAOptions,
    _inv3x3_spd,
    _quat_exp,
    _robust_cost,
    _robust_weight,
)
from colmap_tpu.geometry import rotation as rot
from colmap_tpu.sensor import models as camera_models


class RigBAProblem(NamedTuple):
    quat: jnp.ndarray  # (F, 4) rig_from_world rotation
    t: jnp.ndarray  # (F, 3)
    sensor_quat: jnp.ndarray  # (G, 4) sensor_from_rig rotation
    sensor_t: jnp.ndarray  # (G, 3)
    cam_params: jnp.ndarray  # (C, P)
    points: jnp.ndarray  # (N, 3)
    obs_frame: jnp.ndarray  # (O,)
    obs_sensor: jnp.ndarray  # (O,)
    obs_cam: jnp.ndarray  # (O,)
    obs_point: jnp.ndarray  # (O,)
    obs_xy: jnp.ndarray  # (O, 2)
    obs_w: jnp.ndarray  # (O,)


class RigBAMasks(NamedTuple):
    frame_mask: jnp.ndarray  # (F,)
    frame_trans_mask: jnp.ndarray  # (F, 3)
    sensor_mask: jnp.ndarray  # (G,) 0 for reference sensors (identity)
    cam_mask: jnp.ndarray  # (C, P)
    point_mask: jnp.ndarray  # (N,)


def default_masks(problem: RigBAProblem, model_id: int, options: BAOptions,
                  ref_sensors=(0,), const_frames=None) -> RigBAMasks:
    F = problem.quat.shape[0]
    G = problem.sensor_quat.shape[0]
    C, P = problem.cam_params.shape
    N = problem.points.shape[0]
    dtype = problem.points.dtype
    frame_mask = jnp.ones(F, dtype=dtype)
    if const_frames is not None:
        frame_mask = frame_mask.at[jnp.asarray(const_frames)].set(0.0)
    frame_trans_mask = jnp.ones((F, 3), dtype=dtype) * frame_mask[:, None]
    sensor_mask = jnp.ones(G, dtype=dtype)
    for s in ref_sensors:
        sensor_mask = sensor_mask.at[s].set(0.0)
    import numpy as np

    cam_mask_np = np.zeros((C, P))
    if isinstance(model_id, tuple):
        # Heterogeneous problem (reference: bundle_adjustment_ceres.h:40-116
        # handles any model mix): per-camera masks decoded from the trailing
        # model-position column; the column itself stays constant.
        model_pos = np.rint(np.asarray(problem.cam_params[:, -1])).astype(int)
        per_row_models = [int(model_id[p]) for p in model_pos]
    else:
        per_row_models = [int(model_id)] * C
    for row, mid in enumerate(per_row_models):
        if options.refine_focal_length:
            for i in camera_models.focal_length_idxs(mid):
                cam_mask_np[row, i] = 1.0
        if options.refine_principal_point:
            for i in camera_models.principal_point_idxs(mid):
                cam_mask_np[row, i] = 1.0
        if options.refine_extra_params:
            for i in camera_models.extra_params_idxs(mid):
                cam_mask_np[row, i] = 1.0
    cam_mask = jnp.asarray(cam_mask_np, dtype=dtype)
    point_mask = jnp.ones(N, dtype=dtype)
    return RigBAMasks(frame_mask, frame_trans_mask, sensor_mask, cam_mask, point_mask)


def fix_gauge_two_frames(masks: RigBAMasks, frame1: int, frame2: int) -> RigBAMasks:
    frame_mask = masks.frame_mask.at[frame1].set(0.0)
    ftm = masks.frame_trans_mask.at[frame1].set(0.0)
    ftm = ftm.at[frame2, 0].set(0.0)
    return masks._replace(frame_mask=frame_mask, frame_trans_mask=ftm)


def make_residual_fn(model_id: int):
    """f(dframe(6), dsensor(6), dcam(P), dX(3), state...) -> (2,).

    model_id may be a static int or a static tuple of distinct model ids
    (heterogeneous rig problem); in the tuple case cam_params rows are
    (Pmax + 1,) with a trailing model-position column consumed by a
    lax.switch dispatch (same scheme as the non-rig packed BA)."""
    mixed = isinstance(model_id, tuple)

    def f(dframe, dsensor, dcam, dX, fq, ft, sq, st, cam_params, X, xy):
        dqf = _quat_exp(dframe[:3])
        qf = rot.quat_multiply(dqf, fq)
        tf = ft + dframe[3:]
        dqs = _quat_exp(dsensor[:3])
        qs = rot.quat_multiply(dqs, sq)
        ts = st + dsensor[3:]
        X_rig = rot.quat_rotate(qf, X + dX) + tf
        Xc = rot.quat_rotate(qs, X_rig) + ts
        if mixed:
            mi = jnp.round(cam_params[..., -1]).astype(jnp.int32)
            proj, _ = camera_models.img_from_cam_switch(
                model_id, mi, (cam_params + dcam)[..., :-1], Xc,
                check_cheirality=False,
            )
        else:
            proj, _ = camera_models.img_from_cam(
                model_id, cam_params + dcam, Xc, check_cheirality=False
            )
        return proj - xy

    return f


def compute_residuals(problem: RigBAProblem, model_id: int):
    f = make_residual_fn(model_id)
    P = problem.cam_params.shape[1]
    dtype = problem.points.dtype

    def per_obs(fi, si, ci, pi, xy):
        return f(
            jnp.zeros(6, dtype), jnp.zeros(6, dtype), jnp.zeros(P, dtype),
            jnp.zeros(3, dtype),
            problem.quat[fi], problem.t[fi],
            problem.sensor_quat[si], problem.sensor_t[si],
            problem.cam_params[ci], problem.points[pi], xy,
        )

    return jax.vmap(per_obs)(
        problem.obs_frame, problem.obs_sensor, problem.obs_cam,
        problem.obs_point, problem.obs_xy,
    )


def compute_cost(problem: RigBAProblem, model_id: int, options: BAOptions):
    r = compute_residuals(problem, model_id)
    sq = jnp.sum(r * r, axis=-1)
    sq = jnp.where(jnp.isfinite(sq), sq, 0.0)
    return 0.5 * jnp.sum(
        _robust_cost(sq, options.loss, options.loss_scale) * problem.obs_w
    )


def _obs_jacobians(problem: RigBAProblem, model_id: int, options: BAOptions):
    f = make_residual_fn(model_id)
    P = problem.cam_params.shape[1]
    dtype = problem.points.dtype

    def per_obs(fi, si, ci, pi, xy):
        args = (
            jnp.zeros(6, dtype), jnp.zeros(6, dtype), jnp.zeros(P, dtype),
            jnp.zeros(3, dtype),
            problem.quat[fi], problem.t[fi],
            problem.sensor_quat[si], problem.sensor_t[si],
            problem.cam_params[ci], problem.points[pi], xy,
        )
        r = f(*args)
        Jf, Js, Jc, Jx = jax.jacfwd(f, argnums=(0, 1, 2, 3))(*args)
        return r, Jf, Js, Jc, Jx

    r, Jf, Js, Jc, Jx = jax.vmap(per_obs)(
        problem.obs_frame, problem.obs_sensor, problem.obs_cam,
        problem.obs_point, problem.obs_xy,
    )
    sq = jnp.sum(r * r, axis=-1)
    w = _robust_weight(sq, options.loss, options.loss_scale) * problem.obs_w
    finite = (
        jnp.all(jnp.isfinite(r), axis=-1)
        & jnp.all(jnp.isfinite(Jf.reshape(Jf.shape[0], -1)), axis=-1)
        & jnp.all(jnp.isfinite(Js.reshape(Js.shape[0], -1)), axis=-1)
        & jnp.all(jnp.isfinite(Jc.reshape(Jc.shape[0], -1)), axis=-1)
        & jnp.all(jnp.isfinite(Jx.reshape(Jx.shape[0], -1)), axis=-1)
    )
    w = jnp.where(finite, w, 0.0)
    sw = jnp.sqrt(w)[:, None]
    r = jnp.where(finite[:, None], r, 0.0) * sw
    return r, Jf * sw[..., None], Js * sw[..., None], Jc * sw[..., None], Jx * sw[..., None]


def _apply_masks(Jf, Js, Jc, Jx, problem, masks: RigBAMasks, options: BAOptions):
    fm = masks.frame_mask[problem.obs_frame]
    rot_m = fm * (1.0 if options.refine_rotations else 0.0)
    pose_mask = jnp.concatenate(
        [
            jnp.broadcast_to(rot_m[:, None], fm.shape + (3,)),
            masks.frame_trans_mask[problem.obs_frame],
        ],
        axis=-1,
    )
    Jf = Jf * pose_mask[:, None, :]
    sm = masks.sensor_mask[problem.obs_sensor]
    Js = Js * sm[:, None, None]
    Jc = Jc * masks.cam_mask[problem.obs_cam][:, None, :]
    Jx = Jx * masks.point_mask[problem.obs_point][:, None, None]
    return Jf, Js, Jc, Jx


class _RigSchurOps(NamedTuple):
    Jf: jnp.ndarray
    Js: jnp.ndarray
    Jc: jnp.ndarray
    Jx: jnp.ndarray
    Hpp_inv: jnp.ndarray
    lam_f: jnp.ndarray
    lam_s: jnp.ndarray
    lam_c: jnp.ndarray


def _seg(vals, idx, n, sorted_=False):
    return jax.ops.segment_sum(vals, idx, num_segments=n, indices_are_sorted=sorted_)


def _build_schur(problem, Jf, Js, Jc, Jx, lam, options):
    F = problem.quat.shape[0]
    G = problem.sensor_quat.shape[0]
    C = problem.cam_params.shape[0]
    N = problem.points.shape[0]
    srt = options.obs_sorted_by_point
    Hpp = _seg((Jx[:, :, :, None] * Jx[:, :, None, :]).sum(1),
               problem.obs_point, N, srt)
    diag_pp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp_damped = Hpp + jax.vmap(jnp.diag)(lam * diag_pp + 1e-12)
    Hpp_inv = _inv3x3_spd(Hpp_damped)
    lam_f = lam * _seg((Jf * Jf).sum(1), problem.obs_frame, F)
    lam_s = lam * _seg((Js * Js).sum(1), problem.obs_sensor, G)
    lam_c = lam * _seg((Jc * Jc).sum(1), problem.obs_cam, C)
    return _RigSchurOps(Jf, Js, Jc, Jx, Hpp_inv, lam_f, lam_s, lam_c)


def _schur_matvec(problem, ops: _RigSchurOps, xf, xs, xc, srt=False):
    F = problem.quat.shape[0]
    G = problem.sensor_quat.shape[0]
    C = problem.cam_params.shape[0]
    N = problem.points.shape[0]
    u = (
        (ops.Jf * xf[problem.obs_frame][:, None, :]).sum(-1)
        + (ops.Js * xs[problem.obs_sensor][:, None, :]).sum(-1)
        + (ops.Jc * xc[problem.obs_cam][:, None, :]).sum(-1)
    )
    hcc_f = _seg((ops.Jf * u[:, :, None]).sum(1), problem.obs_frame, F)
    hcc_s = _seg((ops.Js * u[:, :, None]).sum(1), problem.obs_sensor, G)
    hcc_c = _seg((ops.Jc * u[:, :, None]).sum(1), problem.obs_cam, C)
    w = _seg((ops.Jx * u[:, :, None]).sum(1), problem.obs_point, N, srt)
    y = (ops.Hpp_inv * w[:, None, :]).sum(-1)
    v = (ops.Jx * y[problem.obs_point][:, None, :]).sum(-1)
    hcp_f = _seg((ops.Jf * v[:, :, None]).sum(1), problem.obs_frame, F)
    hcp_s = _seg((ops.Js * v[:, :, None]).sum(1), problem.obs_sensor, G)
    hcp_c = _seg((ops.Jc * v[:, :, None]).sum(1), problem.obs_cam, C)
    return (
        hcc_f - hcp_f + ops.lam_f * xf,
        hcc_s - hcp_s + ops.lam_s * xs,
        hcc_c - hcp_c + ops.lam_c * xc,
    )


def _pcg(problem, ops, bf, bs, bc, options):
    F = problem.quat.shape[0]
    G = problem.sensor_quat.shape[0]
    C = problem.cam_params.shape[0]
    diag_f = _seg((ops.Jf * ops.Jf).sum(1), problem.obs_frame, F) + ops.lam_f
    diag_s = _seg((ops.Js * ops.Js).sum(1), problem.obs_sensor, G) + ops.lam_s
    diag_c = _seg((ops.Jc * ops.Jc).sum(1), problem.obs_cam, C) + ops.lam_c
    Mf = jnp.where(diag_f > 1e-12, 1.0 / diag_f, 0.0)
    Ms = jnp.where(diag_s > 1e-12, 1.0 / diag_s, 0.0)
    Mc = jnp.where(diag_c > 1e-12, 1.0 / diag_c, 0.0)

    def dot(a, b):
        return sum(jnp.sum(x * y) for x, y in zip(a, b))

    x = (jnp.zeros_like(bf), jnp.zeros_like(bs), jnp.zeros_like(bc))
    r = (bf, bs, bc)
    z = (Mf * r[0], Ms * r[1], Mc * r[2])
    p = z
    rz = dot(r, z)

    def body(i, state):
        x, r, p, rz = state
        Ap = _schur_matvec(problem, ops, *p, options.obs_sorted_by_point)
        pAp = dot(p, Ap)
        alpha = jnp.where(jnp.abs(pAp) > 1e-30, rz / pAp, 0.0)
        x = tuple(xi + alpha * pi for xi, pi in zip(x, p))
        r = tuple(ri - alpha * Ai for ri, Ai in zip(r, Ap))
        z = (Mf * r[0], Ms * r[1], Mc * r[2])
        rz_new = dot(r, z)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = tuple(zi + beta * pi for zi, pi in zip(z, p))
        return x, r, p, rz_new

    state = (x, r, p, rz)
    state = jax.lax.fori_loop(0, options.pcg_iterations, body, state)
    return state[0]


def _apply_update(problem: RigBAProblem, df, ds, dc, dx):
    quat = rot.quat_normalize(
        rot.quat_multiply(_quat_exp(df[:, :3]), problem.quat)
    )
    squat = rot.quat_normalize(
        rot.quat_multiply(_quat_exp(ds[:, :3]), problem.sensor_quat)
    )
    return problem._replace(
        quat=quat,
        t=problem.t + df[:, 3:],
        sensor_quat=squat,
        sensor_t=problem.sensor_t + ds[:, 3:],
        cam_params=problem.cam_params + dc,
        points=problem.points + dx,
    )


@partial(jax.jit, static_argnums=(1, 2))
def lm_step(problem: RigBAProblem, model_id: int, options: BAOptions,
            masks: RigBAMasks, lam, nu):
    """One rig-aware LM iteration (same damping rule as lm_step in
    bundle_adjustment.py)."""
    cost = compute_cost(problem, model_id, options)
    r, Jf, Js, Jc, Jx = _obs_jacobians(problem, model_id, options)
    Jf, Js, Jc, Jx = _apply_masks(Jf, Js, Jc, Jx, problem, masks, options)

    F = problem.quat.shape[0]
    G = problem.sensor_quat.shape[0]
    C = problem.cam_params.shape[0]
    N = problem.points.shape[0]
    srt = options.obs_sorted_by_point
    gf = -_seg((Jf * r[:, :, None]).sum(1), problem.obs_frame, F)
    gs = -_seg((Js * r[:, :, None]).sum(1), problem.obs_sensor, G)
    gc = -_seg((Jc * r[:, :, None]).sum(1), problem.obs_cam, C)
    gx = -_seg((Jx * r[:, :, None]).sum(1), problem.obs_point, N, srt)

    ops = _build_schur(problem, Jf, Js, Jc, Jx, lam, options)
    y = (ops.Hpp_inv * gx[:, None, :]).sum(-1)
    v = (Jx * y[problem.obs_point][:, None, :]).sum(-1)
    bf = gf - _seg((Jf * v[:, :, None]).sum(1), problem.obs_frame, F)
    bs = gs - _seg((Js * v[:, :, None]).sum(1), problem.obs_sensor, G)
    bc = gc - _seg((Jc * v[:, :, None]).sum(1), problem.obs_cam, C)

    df, ds, dc = _pcg(problem, ops, bf, bs, bc, options)

    u = (
        (Jf * df[problem.obs_frame][:, None, :]).sum(-1)
        + (Js * ds[problem.obs_sensor][:, None, :]).sum(-1)
        + (Jc * dc[problem.obs_cam][:, None, :]).sum(-1)
    )
    w = _seg((Jx * u[:, :, None]).sum(1), problem.obs_point, N, srt)
    dx = (ops.Hpp_inv * (gx - w)[:, None, :]).sum(-1)

    new_problem = _apply_update(problem, df, ds, dc, dx)
    new_cost = compute_cost(new_problem, model_id, options)

    diag_f = _seg((Jf * Jf).sum(1), problem.obs_frame, F)
    diag_s = _seg((Js * Js).sum(1), problem.obs_sensor, G)
    diag_c = _seg((Jc * Jc).sum(1), problem.obs_cam, C)
    diag_x = _seg((Jx * Jx).sum(1), problem.obs_point, N, srt)
    pred = 0.5 * (
        jnp.sum(df * gf) + jnp.sum(ds * gs) + jnp.sum(dc * gc) + jnp.sum(dx * gx)
        + lam * (
            jnp.sum(diag_f * df * df) + jnp.sum(diag_s * ds * ds)
            + jnp.sum(diag_c * dc * dc) + jnp.sum(diag_x * dx * dx)
        )
    )
    rho = (cost - new_cost) / jnp.maximum(pred, 1e-30)
    accepted = (new_cost < cost) & (pred > 0)
    out_problem = jax.tree.map(
        lambda a, b: jnp.where(accepted, b, a), problem, new_problem
    )
    shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
    new_lam = jnp.where(
        accepted,
        jnp.clip(lam * shrink, options.min_lambda, options.max_lambda),
        jnp.minimum(lam * nu, options.max_lambda),
    )
    new_nu = jnp.where(accepted, 2.0, nu * 2.0)
    return out_problem, new_lam, new_nu, cost, new_cost, accepted


@partial(jax.jit, static_argnums=(1, 2))
def lm_solve_fused(problem: RigBAProblem, model_id: int, options: BAOptions,
                   masks: RigBAMasks):
    dtype = problem.points.dtype
    lam0 = jnp.asarray(options.initial_lambda, dtype=dtype)
    nu0 = jnp.asarray(2.0, dtype=dtype)
    cost0 = compute_cost(problem, model_id, options)

    def cond(state):
        problem, lam, nu, it, last_cost, done = state
        return (~done) & (it < options.max_iterations)

    def body(state):
        problem, lam, nu, it, last_cost, done = state
        problem, lam, nu, cost, new_cost, accepted = lm_step(
            problem, model_id, options, masks, lam, nu
        )
        rel = jnp.abs(last_cost - new_cost) / jnp.maximum(new_cost, 1e-30)
        done_now = (accepted & (rel < options.function_tolerance)) | (
            (~accepted) & (lam >= options.max_lambda)
        )
        last_cost = jnp.where(accepted, new_cost, last_cost)
        return problem, lam, nu, it + 1, last_cost, done_now

    state = (problem, lam0, nu0, jnp.asarray(0), cost0, jnp.asarray(False))
    problem, lam, nu, it, last_cost, _ = jax.lax.while_loop(cond, body, state)
    return problem, compute_cost(problem, model_id, options), it


def solve(problem: RigBAProblem, model_id: int,
          options: Optional[BAOptions] = None,
          masks: Optional[RigBAMasks] = None):
    if options is None:
        options = BAOptions()
    if masks is None:
        masks = default_masks(problem, model_id, options)
    initial_cost = float(compute_cost(problem, model_id, options))
    problem, final_cost, n_iters = lm_solve_fused(problem, model_id, options, masks)
    return problem, {
        "initial_cost": initial_cost,
        "final_cost": float(final_cost),
        "num_iterations": int(n_iters),
    }
