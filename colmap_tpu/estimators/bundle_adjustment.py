"""TPU-native bundle adjustment: Levenberg-Marquardt + Schur + PCG.

reference behavior: src/colmap/estimators/bundle_adjustment{.h,_ceres.h,
_caspar.h}. The design follows the Caspar GPU backend's structure
(bundle_adjustment_caspar.h:107-120: LM with PCG on the point-Schur-reduced
camera system) rather than Ceres' sparse direct factorizations, because the
Schur complement is the only formulation that maps to TPUs: the reduced
normal-equation matvec is two segment-sum passes over the observation
arrays — pure gathers, small dense per-observation matmuls, and scatter-adds
that XLA fuses into a handful of kernels. No sparse matrix is ever formed.

Problem layout (struct-of-arrays, fixed shapes; padding rows carry weight 0):
    frame poses:  quat (F, 4), t (F, 3)           cam_from_world
    cameras:      params (C, P)                    one model id per problem
    points:       xyz (N, 3)
    observations: obs_frame/obs_cam/obs_point (O,), obs_xy (O, 2), obs_w (O,)

Parameterization: local tangent deltas — rotation via left-multiplied
quaternion exponential, translation additive, camera params masked additive,
points additive. Gauge fixing and constant blocks via per-block masks
(reference: BundleAdjustmentConfig, bundle_adjustment.h:46-233).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rotation as rot
from colmap_tpu.sensor import models as camera_models


class BAProblem(NamedTuple):
    quat: jnp.ndarray  # (F, 4) cam_from_world rotation
    t: jnp.ndarray  # (F, 3)
    cam_params: jnp.ndarray  # (C, P)
    points: jnp.ndarray  # (N, 3)
    obs_frame: jnp.ndarray  # (O,) int32
    obs_cam: jnp.ndarray  # (O,) int32
    obs_point: jnp.ndarray  # (O,) int32
    obs_xy: jnp.ndarray  # (O, 2)
    obs_w: jnp.ndarray  # (O,) float: 0 = padding/invalid


@dataclasses.dataclass(frozen=True)
class BAOptions:
    """Solver envelope per the Caspar defaults (bundle_adjustment_caspar.h:
    107-120: 200 LM iters max, 20 PCG iters/step) and Ceres-compatible
    termination."""

    max_iterations: int = 50
    pcg_iterations: int = 30
    pcg_rtol: float = 1e-2
    initial_lambda: float = 1e-4
    min_lambda: float = 1e-10
    max_lambda: float = 1e10
    function_tolerance: float = 1e-6
    loss: str = "trivial"  # trivial | huber | cauchy
    loss_scale: float = 1.0
    refine_focal_length: bool = True
    refine_principal_point: bool = False
    refine_extra_params: bool = True
    refine_points: bool = True
    refine_poses: bool = True
    refine_rotations: bool = True  # False: stage-1 global BA (positions only)
    # Set when obs arrays are sorted by obs_point: enables XLA's sorted
    # segment-sum fast path for the large point-side reductions.
    obs_sorted_by_point: bool = False


class BAMasks(NamedTuple):
    """Variability masks. 1.0 = free, 0.0 = constant (gauge/config)."""

    frame_mask: jnp.ndarray  # (F,) pose blocks free?
    frame_trans_mask: jnp.ndarray  # (F, 3) per-component translation freedom
    cam_mask: jnp.ndarray  # (C, P) per-parameter freedom
    point_mask: jnp.ndarray  # (N,)


def default_masks(problem: BAProblem, model_id: int, options: BAOptions,
                  const_frames=None, const_points=None) -> BAMasks:
    F = problem.quat.shape[0]
    C, P = problem.cam_params.shape
    N = problem.points.shape[0]
    dtype = problem.points.dtype
    frame_mask = jnp.ones(F, dtype=dtype)
    if const_frames is not None:
        frame_mask = frame_mask.at[jnp.asarray(const_frames)].set(0.0)
    if not options.refine_poses:
        frame_mask = jnp.zeros(F, dtype=dtype)
    frame_trans_mask = jnp.ones((F, 3), dtype=dtype) * frame_mask[:, None]
    cam_mask = jnp.zeros((C, P), dtype=dtype)
    mid = int(model_id)
    if options.refine_focal_length:
        for i in camera_models.focal_length_idxs(mid):
            cam_mask = cam_mask.at[:, i].set(1.0)
    if options.refine_principal_point:
        for i in camera_models.principal_point_idxs(mid):
            cam_mask = cam_mask.at[:, i].set(1.0)
    if options.refine_extra_params:
        for i in camera_models.extra_params_idxs(mid):
            cam_mask = cam_mask.at[:, i].set(1.0)
    point_mask = jnp.ones(N, dtype=dtype) if options.refine_points else jnp.zeros(N, dtype=dtype)
    if const_points is not None:
        point_mask = point_mask.at[jnp.asarray(const_points)].set(0.0)
    return BAMasks(frame_mask, frame_trans_mask, cam_mask, point_mask)


def fix_gauge_two_frames(masks: BAMasks, frame1: int, frame2: int) -> BAMasks:
    """Gauge TWO_CAMS_FROM_WORLD (bundle_adjustment.h): frame1 fully fixed,
    frame2's translation x-component fixed (scale gauge)."""
    frame_mask = masks.frame_mask.at[frame1].set(0.0)
    ftm = masks.frame_trans_mask.at[frame1].set(0.0)
    ftm = ftm.at[frame2, 0].set(0.0)
    return masks._replace(frame_mask=frame_mask, frame_trans_mask=ftm)


def _quat_exp(w):
    """so(3) tangent (..., 3) -> unit quaternion, small-angle safe."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + 1e-30)
    half = 0.5 * theta
    sinc = jnp.where(theta2 > 1e-12, jnp.sin(half) / theta, 0.5 - theta2 / 48.0)
    return jnp.concatenate([jnp.cos(half), sinc * w], axis=-1)


def _robust_weight(sq_norm, loss: str, scale: float):
    """IRLS weight ρ'(s) for squared residual norm s."""
    if loss == "trivial":
        return jnp.ones_like(sq_norm)
    s = sq_norm / (scale * scale)
    if loss == "huber":
        return jnp.where(s <= 1.0, 1.0, 1.0 / jnp.sqrt(jnp.maximum(s, 1e-30)))
    if loss == "cauchy":
        return 1.0 / (1.0 + s)
    raise ValueError(loss)


def _robust_cost(sq_norm, loss: str, scale: float):
    if loss == "trivial":
        return sq_norm
    a2 = scale * scale
    s = sq_norm / a2
    if loss == "huber":
        return jnp.where(s <= 1.0, sq_norm, a2 * (2.0 * jnp.sqrt(jnp.maximum(s, 0.0)) - 1.0))
    if loss == "cauchy":
        return a2 * jnp.log1p(s)
    raise ValueError(loss)


def make_residual_fn(model_id: int):
    """Per-observation reprojection residual over local deltas.

    Returns f(dpose (6,), dcam (P,), dX (3,), quat, t, cam_params, X, xy)
    -> (2,) residual; differentiating at delta=0 gives the exact Jacobians
    w.r.t. the local parameterization (reference: cost_functions/
    reprojection_error.h, with analytic jacobians replaced by jax autodiff
    of the same projection chain).
    """

    def f(dpose, dcam, dX, quat, t, cam_params, X, xy):
        dq = _quat_exp(dpose[:3])
        q = rot.quat_multiply(dq, quat)
        tt = t + dpose[3:]
        Xc = rot.quat_rotate(q, X + dX) + tt
        proj, _ = camera_models.img_from_cam(
            model_id, cam_params + dcam, Xc, check_cheirality=False
        )
        return proj - xy

    return f


def compute_residuals(problem: BAProblem, model_id: int):
    """(O, 2) reprojection residuals at the current state."""
    f = make_residual_fn(model_id)
    P = problem.cam_params.shape[1]
    dtype = problem.points.dtype

    def per_obs(fi, ci, pi, xy):
        return f(
            jnp.zeros(6, dtype), jnp.zeros(P, dtype), jnp.zeros(3, dtype),
            problem.quat[fi], problem.t[fi], problem.cam_params[ci],
            problem.points[pi], xy,
        )

    return jax.vmap(per_obs)(
        problem.obs_frame, problem.obs_cam, problem.obs_point, problem.obs_xy
    )


def compute_cost(problem: BAProblem, model_id: int, options: BAOptions):
    r = compute_residuals(problem, model_id)
    sq = jnp.sum(r * r, axis=-1)
    sq = jnp.where(jnp.isfinite(sq), sq, 0.0)
    return 0.5 * jnp.sum(_robust_cost(sq, options.loss, options.loss_scale) * problem.obs_w)


def _obs_jacobians(problem: BAProblem, model_id: int, options: BAOptions):
    """Weighted per-observation residuals + Jacobian blocks.

    Returns r (O,2), Jp (O,2,6), Jc (O,2,P), Jx (O,2,3) — already scaled by
    sqrt(robust IRLS weight * obs weight); non-finite rows zeroed.
    """
    f = make_residual_fn(model_id)
    P = problem.cam_params.shape[1]
    dtype = problem.points.dtype

    def per_obs(fi, ci, pi, xy):
        args = (
            jnp.zeros(6, dtype), jnp.zeros(P, dtype), jnp.zeros(3, dtype),
            problem.quat[fi], problem.t[fi], problem.cam_params[ci],
            problem.points[pi], xy,
        )
        r = f(*args)
        Jp, Jc, Jx = jax.jacfwd(f, argnums=(0, 1, 2))(*args)
        return r, Jp, Jc, Jx

    r, Jp, Jc, Jx = jax.vmap(per_obs)(
        problem.obs_frame, problem.obs_cam, problem.obs_point, problem.obs_xy
    )
    sq = jnp.sum(r * r, axis=-1)
    w = _robust_weight(sq, options.loss, options.loss_scale) * problem.obs_w
    finite = (
        jnp.all(jnp.isfinite(r), axis=-1)
        & jnp.all(jnp.isfinite(Jp.reshape(Jp.shape[0], -1)), axis=-1)
        & jnp.all(jnp.isfinite(Jc.reshape(Jc.shape[0], -1)), axis=-1)
        & jnp.all(jnp.isfinite(Jx.reshape(Jx.shape[0], -1)), axis=-1)
    )
    w = jnp.where(finite, w, 0.0)
    sw = jnp.sqrt(w)[:, None]
    r = jnp.where(finite[:, None], r, 0.0) * sw
    Jp = Jp * sw[..., None]
    Jc = Jc * sw[..., None]
    Jx = Jx * sw[..., None]
    return r, Jp, Jc, Jx


def _apply_masks(Jp, Jc, Jx, problem, masks: BAMasks, options: BAOptions):
    fm = masks.frame_mask[problem.obs_frame]  # (O,)
    rot_m = fm * (1.0 if options.refine_rotations else 0.0)
    pose_mask = jnp.concatenate(
        [
            jnp.broadcast_to(rot_m[:, None], fm.shape + (3,)),
            masks.frame_trans_mask[problem.obs_frame],
        ],
        axis=-1,
    )  # (O, 6)
    Jp = Jp * pose_mask[:, None, :]
    Jc = Jc * masks.cam_mask[problem.obs_cam][:, None, :]
    Jx = Jx * masks.point_mask[problem.obs_point][:, None, None]
    return Jp, Jc, Jx


def _inv3x3_spd(A, eps=1e-12):
    """Batched closed-form inverse of (damped) SPD 3x3 blocks."""
    # Adjugate / determinant.
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f_ = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    # symmetric: A = [[a,b,c],[b,d,e],[c,e,f]]
    co00 = d * f_ - e * e
    co01 = c * e - b * f_
    co02 = b * e - c * d
    co11 = a * f_ - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    inv = jnp.stack(
        [co00, co01, co02, co01, co11, co12, co02, co12, co22], axis=-1
    ).reshape(A.shape) * inv_det[..., None, None]
    return inv


class _SchurOperators(NamedTuple):
    """Closures-free data for the reduced-system matvec."""

    Jp: jnp.ndarray
    Jc: jnp.ndarray
    Jx: jnp.ndarray
    Hpp_inv: jnp.ndarray  # (N, 3, 3) damped point-block inverses
    lam_diag_pose: jnp.ndarray  # (F, 6) LM damping diagonal
    lam_diag_cam: jnp.ndarray  # (C, P)


def _build_schur(problem, Jp, Jc, Jx, lam, options):
    # NOTE: point-side reductions honor options.obs_sorted_by_point.
    F = problem.quat.shape[0]
    C, P = problem.cam_params.shape
    N = problem.points.shape[0]

    Hpp = jax.ops.segment_sum(
        (Jx[:, :, :, None] * Jx[:, :, None, :]).sum(1), problem.obs_point, num_segments=N,
        indices_are_sorted=options.obs_sorted_by_point,
    )
    diag_pp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    # Levenberg diagonal damping: H + lam * diag(H) (Ceres-style scaling),
    # floored to keep padded/unobserved blocks invertible-safe.
    damp = lam * diag_pp + 1e-12
    Hpp_damped = Hpp + jax.vmap(jnp.diag)(damp)
    Hpp_inv = _inv3x3_spd(Hpp_damped)

    diag_pose = jax.ops.segment_sum(
        (Jp * Jp).sum(1), problem.obs_frame, num_segments=F
    )
    diag_cam = jax.ops.segment_sum(
        (Jc * Jc).sum(1), problem.obs_cam, num_segments=C
    )
    return _SchurOperators(
        Jp, Jc, Jx, Hpp_inv, lam * diag_pose, lam * diag_cam
    )


def _schur_matvec(problem, ops: _SchurOperators, xp, xc, sorted_by_point=False):
    """(S + λD) @ x for the reduced camera system.

    S = H_cc - H_cp H_pp⁻¹ H_pc, evaluated matrix-free:
    per-observation J u products, point-block reductions, scatter-adds.
    xp: (F, 6) pose direction; xc: (C, P) camera-intrinsics direction.
    """
    F = problem.quat.shape[0]
    C = problem.cam_params.shape[0]
    N = problem.points.shape[0]
    # u_o = Jp_o xp_f + Jc_o xc_c  (residual-space product, (O, 2))
    u = (ops.Jp * xp[problem.obs_frame][:, None, :]).sum(-1) + (ops.Jc * xc[problem.obs_cam][:, None, :]).sum(-1)
    # H_cc x part: scatter Jᵀ u.
    hcc_p = jax.ops.segment_sum(
        (ops.Jp * u[:, :, None]).sum(1), problem.obs_frame, num_segments=F
    )
    hcc_c = jax.ops.segment_sum(
        (ops.Jc * u[:, :, None]).sum(1), problem.obs_cam, num_segments=C
    )
    # H_pc x: per-point 3-vector w_n = Σ_o Jx_oᵀ u_o.
    w = jax.ops.segment_sum(
        (ops.Jx * u[:, :, None]).sum(1), problem.obs_point, num_segments=N,
        indices_are_sorted=sorted_by_point,
    )
    y = (ops.Hpp_inv * w[:, None, :]).sum(-1)
    # H_cp y: v_o = Jx_o y_n; scatter Jpᵀ v, Jcᵀ v.
    v = (ops.Jx * y[problem.obs_point][:, None, :]).sum(-1)
    hcp_p = jax.ops.segment_sum(
        (ops.Jp * v[:, :, None]).sum(1), problem.obs_frame, num_segments=F
    )
    hcp_c = jax.ops.segment_sum(
        (ops.Jc * v[:, :, None]).sum(1), problem.obs_cam, num_segments=C
    )
    out_p = hcc_p - hcp_p + ops.lam_diag_pose * xp
    out_c = hcc_c - hcp_c + ops.lam_diag_cam * xc
    return out_p, out_c


def _pcg(problem, ops, bp, bc, options):
    """Jacobi-preconditioned CG on the reduced camera system."""
    F = problem.quat.shape[0]
    C = problem.cam_params.shape[0]
    # Jacobi preconditioner from H_cc diagonal + damping.
    diag_p = jax.ops.segment_sum(
        (ops.Jp * ops.Jp).sum(1), problem.obs_frame, num_segments=F
    ) + ops.lam_diag_pose
    diag_c = jax.ops.segment_sum(
        (ops.Jc * ops.Jc).sum(1), problem.obs_cam, num_segments=C
    ) + ops.lam_diag_cam
    Mp = jnp.where(diag_p > 1e-12, 1.0 / diag_p, 0.0)
    Mc = jnp.where(diag_c > 1e-12, 1.0 / diag_c, 0.0)

    def dot(ap, ac, bp_, bc_):
        return jnp.sum(ap * bp_) + jnp.sum(ac * bc_)

    xp = jnp.zeros_like(bp)
    xc = jnp.zeros_like(bc)
    rp, rc = bp, bc
    zp, zc = Mp * rp, Mc * rc
    pp, pc = zp, zc
    rz = dot(rp, rc, zp, zc)
    b_norm = jnp.sqrt(dot(bp, bc, bp, bc))

    def body(i, state):
        xp, xc, rp, rc, pp, pc, rz = state
        Ap_p, Ap_c = _schur_matvec(problem, ops, pp, pc, options.obs_sorted_by_point)
        pAp = dot(pp, pc, Ap_p, Ap_c)
        alpha = jnp.where(jnp.abs(pAp) > 1e-30, rz / pAp, 0.0)
        xp = xp + alpha * pp
        xc = xc + alpha * pc
        rp = rp - alpha * Ap_p
        rc = rc - alpha * Ap_c
        zp, zc = Mp * rp, Mc * rc
        rz_new = dot(rp, rc, zp, zc)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        pp = zp + beta * pp
        pc = zc + beta * pc
        return xp, xc, rp, rc, pp, pc, rz_new

    state = (xp, xc, rp, rc, pp, pc, rz)
    state = jax.lax.fori_loop(0, options.pcg_iterations, body, state)
    return state[0], state[1]


def _apply_update(problem: BAProblem, dp, dc, dx):
    quat = rot.quat_normalize(rot.quat_multiply(_quat_exp(dp[:, :3]), problem.quat))
    return problem._replace(
        quat=quat,
        t=problem.t + dp[:, 3:],
        cam_params=problem.cam_params + dc,
        points=problem.points + dx,
    )


@partial(jax.jit, static_argnums=(1, 2))
def lm_step(problem: BAProblem, model_id: int, options: BAOptions,
            masks: BAMasks, lam, nu):
    """One LM iteration: build, solve, tentatively update.

    Damping follows Nielsen's gain-ratio rule (as Ceres' default
    trust-region strategy): on success λ *= max(1/3, 1-(2ρ-1)³), ν=2;
    on failure λ *= ν, ν *= 2.

    Returns (new_problem, new_lambda, new_nu, cost, new_cost, accepted).
    """
    cost = compute_cost(problem, model_id, options)
    r, Jp, Jc, Jx = _obs_jacobians(problem, model_id, options)
    Jp, Jc, Jx = _apply_masks(Jp, Jc, Jx, problem, masks, options)

    F = problem.quat.shape[0]
    C = problem.cam_params.shape[0]
    N = problem.points.shape[0]
    # Gradient blocks g = -Jᵀ r.
    gp = -jax.ops.segment_sum(
        (Jp * r[:, :, None]).sum(1), problem.obs_frame, num_segments=F
    )
    gc = -jax.ops.segment_sum(
        (Jc * r[:, :, None]).sum(1), problem.obs_cam, num_segments=C
    )
    gx = -jax.ops.segment_sum(
        (Jx * r[:, :, None]).sum(1), problem.obs_point, num_segments=N,
        indices_are_sorted=options.obs_sorted_by_point,
    )

    ops = _build_schur(problem, Jp, Jc, Jx, lam, options)
    # Reduced RHS: b = g_c - H_cp H_pp⁻¹ g_p.
    y = (ops.Hpp_inv * gx[:, None, :]).sum(-1)
    v = (Jx * y[problem.obs_point][:, None, :]).sum(-1)
    bp = gp - jax.ops.segment_sum(
        (Jp * v[:, :, None]).sum(1), problem.obs_frame, num_segments=F
    )
    bc = gc - jax.ops.segment_sum(
        (Jc * v[:, :, None]).sum(1), problem.obs_cam, num_segments=C
    )

    dp, dc = _pcg(problem, ops, bp, bc, options)

    # Back-substitute point updates: dx = H_pp⁻¹ (g_x - H_pc dcam).
    u = (Jp * dp[problem.obs_frame][:, None, :]).sum(-1) + (Jc * dc[problem.obs_cam][:, None, :]).sum(-1)
    w = jax.ops.segment_sum(
        (Jx * u[:, :, None]).sum(1), problem.obs_point, num_segments=N,
        indices_are_sorted=options.obs_sorted_by_point,
    )
    dx = (ops.Hpp_inv * (gx - w)[:, None, :]).sum(-1)

    new_problem = _apply_update(problem, dp, dc, dx)
    new_cost = compute_cost(new_problem, model_id, options)

    # Gain ratio ρ = actual reduction / model-predicted reduction, where
    # pred = 0.5 (δᵀ b + λ δᵀ D δ) with b = -Jᵀr and D = diag(JᵀJ).
    diag_pose = jax.ops.segment_sum(
        (Jp * Jp).sum(1), problem.obs_frame, num_segments=F
    )
    diag_cam = jax.ops.segment_sum(
        (Jc * Jc).sum(1), problem.obs_cam, num_segments=C
    )
    diag_pt = jax.ops.segment_sum(
        (Jx * Jx).sum(1), problem.obs_point, num_segments=N,
        indices_are_sorted=options.obs_sorted_by_point,
    )
    pred = 0.5 * (
        jnp.sum(dp * gp) + jnp.sum(dc * gc) + jnp.sum(dx * gx)
        + lam * (
            jnp.sum(diag_pose * dp * dp)
            + jnp.sum(diag_cam * dc * dc)
            + jnp.sum(diag_pt * dx * dx)
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
def lm_solve_fused(problem: BAProblem, model_id: int, options: BAOptions,
                   masks: BAMasks):
    """Full LM solve as ONE device program (while_loop over lm_step).

    Early exit on function tolerance or lambda saturation — no host syncs
    between iterations. Returns (problem, final_cost, num_iterations).
    """
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


def solve(problem: BAProblem, model_id: int, options: Optional[BAOptions] = None,
          masks: Optional[BAMasks] = None, verbose: bool = False):
    """Run LM to convergence. Fused device loop (host loop when verbose).

    Returns (problem, summary dict).
    """
    if options is None:
        options = BAOptions()
    if masks is None:
        masks = default_masks(problem, model_id, options)
    initial_cost = float(compute_cost(problem, model_id, options))

    if not verbose:
        problem, final_cost, n_iters = lm_solve_fused(
            problem, model_id, options, masks
        )
        return problem, {
            "initial_cost": initial_cost,
            "final_cost": float(final_cost),
            "num_iterations": int(n_iters),
        }

    lam = jnp.asarray(options.initial_lambda, dtype=problem.points.dtype)
    nu = jnp.asarray(2.0, dtype=problem.points.dtype)
    cost_prev = initial_cost
    n_iters = 0
    for it in range(options.max_iterations):
        problem, lam, nu, cost, new_cost, accepted = lm_step(
            problem, model_id, options, masks, lam, nu
        )
        n_iters += 1
        print(
            f"  LM it {it}: cost {float(cost):.6e} -> {float(new_cost):.6e} "
            f"accepted={bool(accepted)} lam={float(lam):.2e}"
        )
        if bool(accepted):
            rel = abs(cost_prev - float(new_cost)) / max(float(new_cost), 1e-30)
            cost_prev = float(new_cost)
            if rel < options.function_tolerance:
                break
        elif float(lam) >= options.max_lambda:
            break
    final_cost = float(compute_cost(problem, model_id, options))
    return problem, {
        "initial_cost": initial_cost,
        "final_cost": final_cost,
        "num_iterations": n_iters,
    }
