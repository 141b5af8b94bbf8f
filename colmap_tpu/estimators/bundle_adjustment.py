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
    # Reduced-camera-system solver: "auto" picks dense Schur (explicit S +
    # Cholesky, exact) when 6F + C*P <= dense_schur_max_dim and PCG beyond
    # (reference: Ceres solver auto-selection,
    # bundle_adjustment_ceres.h:68-76).
    solver_type: str = "auto"  # "auto" | "dense_schur" | "pcg"
    dense_schur_max_dim: int = 4096


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
    import numpy as np

    cam_mask_np = np.zeros((C, P))
    if isinstance(model_id, tuple):
        # Heterogeneous problem: per-camera masks from the trailing
        # model-position column; the column itself stays constant.
        model_pos = np.rint(
            np.asarray(problem.cam_params[:, -1])).astype(int)
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


def make_residual_fn(model_id):
    """Per-observation reprojection residual over local deltas.

    Returns f(dpose (6,), dcam (P,), dX (3,), quat, t, cam_params, X, xy)
    -> (2,) residual; differentiating at delta=0 gives the exact Jacobians
    w.r.t. the local parameterization (reference: cost_functions/
    reprojection_error.h, with analytic jacobians replaced by jax autodiff
    of the same projection chain).

    model_id may be a static int (single camera model) or a static tuple of
    distinct model ids (heterogeneous problem, reference:
    bundle_adjustment_ceres.h:40-116 instantiates per-model cost functors).
    In the tuple case each cam_params row is (Pmax + 1,): parameters padded
    to the largest model plus a trailing model-position column consumed by
    a lax.switch dispatch (its integer cast has zero tangent, so Jacobians
    w.r.t. the extra column vanish identically).
    """
    mixed = isinstance(model_id, tuple)

    def f(dpose, dcam, dX, quat, t, cam_params, X, xy):
        dq = _quat_exp(dpose[:3])
        q = rot.quat_multiply(dq, quat)
        tt = t + dpose[3:]
        Xc = rot.quat_rotate(q, X + dX) + tt
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


# ---------------------------------------------------------------------------
# Packed (scatter- and gather-free) LM path.
#
# TPU rationale: both jax.ops.segment_sum (scatter-add) and row gathers are
# serialized per row on TPU (measured v5e: 3.5 ms per 300k-row segment-sum,
# ~1.3-4 ms per 300k-row gather) while a one-hot matmul doing the same data
# movement runs on the MXU at ~0.6 ms. The packed layout therefore uses ONE
# observation layout — point-major: observations sorted by point and padded
# to a common per-point capacity capp (N, capp) — in which every point-side
# reduction (H_pp blocks, g_x, back-substitution) is a dense reshaped einsum
# with no data movement at all, and every frame/camera-side access goes
# through one-hot matmuls:
#   * parameter fetch (quat/t/cam per obs): onehot(frame) @ table at
#     Precision.HIGHEST — exact (each output row is 1.0 * row, and the
#     bf16x6 decomposition of HIGHEST reproduces f32 products exactly);
#   * reductions (gradients, H_cc blocks, Schur corrections):
#     onehot(frame)^T @ contributions at HIGHEST — f32-accurate to ~1e-6.
# The cross-layout permutations of the previous frame-major/point-major dual
# layout are gone entirely. The one-hot operand is generated on the fly by an
# integer compare (fused by XLA into the matmul operand read; chunked via
# lax.scan when O * F would exceed a memory budget).
#
# The reduced camera system (6F + C*P square) is solved either by explicit
# dense Schur assembly + Cholesky (exact; MXU matmuls; the default up to
# dense_schur_max_dim) or by matrix-free PCG whose matvec uses the same
# one-hot fetch/reduce ops (reference envelope:
# bundle_adjustment_caspar.h:107-120; selection mirrors
# bundle_adjustment_ceres.h:68-76).


class PackedMaps(NamedTuple):
    frame_pm: jnp.ndarray  # (N, capp) int32 frame id per slot (dummy -> 0)
    cam_pm: jnp.ndarray  # (N, capp) int32 camera id per slot (dummy -> 0)


class _ObsMasks(NamedTuple):
    """Per-observation mask arrays, constant across LM iterations (hoisted
    out of the solve loop)."""

    pose: jnp.ndarray  # (Opm, 6)
    cam: jnp.ndarray  # (Opm, P)
    point: jnp.ndarray  # (Opm,)


# One-hot chunk budget: max elements of the (chunk, n) one-hot operand that
# a single matmul materializes (f32). 2^27 elems = 512 MB worst case if XLA
# does materialize it; in practice the compare fuses into the matmul.
_OH_CHUNK_ELEMS = 1 << 27

_DN_FETCH = (((1,), (0,)), ((), ()))
_DN_REDUCE = (((0,), (0,)), ((), ()))


def _oh_fetch(table, ids):
    """Exact row fetch table[ids] as a one-hot MXU matmul.

    (n, d) table, (O,) int ids -> (O, d). Precision.HIGHEST makes each
    output row exactly 1.0 * table[row]."""
    n = table.shape[0]
    O = ids.shape[0]
    flat_d = 1
    for s in table.shape[1:]:
        flat_d *= s
    t2 = table.reshape(n, flat_d)

    def one(ids_ch):
        oh = (ids_ch[:, None] == jnp.arange(n, dtype=ids_ch.dtype)).astype(
            t2.dtype
        )
        return jax.lax.dot_general(
            oh, t2, _DN_FETCH, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=t2.dtype,
        )

    if O * n <= _OH_CHUNK_ELEMS:
        out = one(ids)
    else:
        n_ch = -(-(O * n) // _OH_CHUNK_ELEMS)
        B = -(-O // n_ch)
        O_pad = B * n_ch
        ids_p = jnp.concatenate(
            [ids, jnp.zeros(O_pad - O, ids.dtype)]
        ) if O_pad != O else ids
        out = jax.lax.map(one, ids_p.reshape(n_ch, B)).reshape(O_pad, flat_d)
        out = out[:O]
    return out.reshape((O,) + table.shape[1:])


def _oh_reduce(contrib, ids, n):
    """Segment-sum of contrib rows into n segments as a one-hot matmul.

    (O, d) contrib, (O,) ids -> (n, d); ~1e-6 relative accuracy at
    Precision.HIGHEST (vs a serialized scatter-add at ~6x the cost)."""
    O = contrib.shape[0]
    flat_d = 1
    for s in contrib.shape[1:]:
        flat_d *= s
    c2 = contrib.reshape(O, flat_d)

    def one(args):
        c_ch, ids_ch = args
        oh = (ids_ch[:, None] == jnp.arange(n, dtype=ids_ch.dtype)).astype(
            c_ch.dtype
        )
        return jax.lax.dot_general(
            oh, c_ch, _DN_REDUCE, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=c_ch.dtype,
        )

    if O * n <= _OH_CHUNK_ELEMS:
        out = one((c2, ids))
    else:
        n_ch = -(-(O * n) // _OH_CHUNK_ELEMS)
        B = -(-O // n_ch)
        O_pad = B * n_ch
        if O_pad != O:
            c2 = jnp.concatenate(
                [c2, jnp.zeros((O_pad - O, flat_d), c2.dtype)]
            )
            ids = jnp.concatenate([ids, jnp.zeros(O_pad - O, ids.dtype)])

        def body(acc, args):
            return acc + one(args), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((n, flat_d), c2.dtype),
            (c2.reshape(n_ch, B, flat_d), ids.reshape(n_ch, B)),
        )
    return out.reshape((n,) + contrib.shape[1:])


def pack_problem(problem: BAProblem, align: int = 2,
                 capf: Optional[int] = None, capp: Optional[int] = None):
    """Repack observations into the point-major padded layout (host).

    Returns (packed BAProblem with Opm = N*capp observations in point-major
    order, PackedMaps, capacities dict). Dummy slots carry obs_w = 0 and
    frame/cam id 0 (their Jacobian rows are zeroed by the weight, so the
    one-hot reductions receive exact zeros from them). capp may be forced by
    the caller (sharded packing needs uniform capacities across shards);
    capf is accepted for API compatibility and ignored.
    """
    import numpy as np

    F = int(problem.quat.shape[0])
    N = int(problem.points.shape[0])
    obs_frame = np.asarray(problem.obs_frame)
    obs_cam = np.asarray(problem.obs_cam)
    obs_point = np.asarray(problem.obs_point)
    obs_xy = np.asarray(problem.obs_xy)
    obs_w = np.asarray(problem.obs_w)
    O = len(obs_frame)

    counts_p = np.bincount(obs_point, minlength=N)
    if capp is None:
        capp = int(max(1, -(-int(counts_p.max(initial=0)) // align) * align))
    assert int(counts_p.max(initial=0)) <= capp, "capp too small"
    Opm = N * capp

    order = np.argsort(obs_point, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts_p)]).astype(np.int64)
    # rank of each (sorted) observation within its point
    rank = np.arange(O, dtype=np.int64) - starts[obs_point[order]]
    slots = obs_point[order].astype(np.int64) * capp + rank

    frame_pm = np.zeros(Opm, dtype=np.int32)
    cam_pm = np.zeros(Opm, dtype=np.int32)
    p_xy = np.zeros((Opm, 2), dtype=obs_xy.dtype)
    p_w = np.zeros(Opm, dtype=obs_w.dtype)
    frame_pm[slots] = obs_frame[order]
    cam_pm[slots] = obs_cam[order]
    p_xy[slots] = obs_xy[order]
    p_w[slots] = obs_w[order]

    packed = problem._replace(
        obs_frame=jnp.asarray(frame_pm),
        obs_cam=jnp.asarray(cam_pm),
        obs_point=jnp.asarray(
            np.repeat(np.arange(N, dtype=np.int32), capp)
        ),
        obs_xy=jnp.asarray(p_xy),
        obs_w=jnp.asarray(p_w),
    )
    maps = PackedMaps(
        frame_pm=jnp.asarray(frame_pm.reshape(N, capp)),
        cam_pm=jnp.asarray(cam_pm.reshape(N, capp)),
    )
    counts_f = np.bincount(obs_frame, minlength=F)
    capf_out = int(max(1, -(-int(counts_f.max(initial=0)) // align) * align))
    return packed, maps, {"capf": capf_out, "capp": capp}


def _psum(x, axis_name):
    """psum when running as a shard_map shard; identity single-device.

    The sharded packed solver co-partitions points WITH their observations
    (each device holds its own local point-major packing), so all point-side
    state stays device-local and the only communication is psums of
    camera-system-sized arrays (6F + C*P floats) — the TPU-native analogue
    of Caspar's single-GPU LM+PCG (bundle_adjustment_caspar.h:107-120)
    scaled over ICI.
    """
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def _fetch_obs_params(problem: BAProblem):
    """Per-observation (quat, t, cam_params, X) in the point-major layout.

    quat/t enter via one exact one-hot matmul over the (F, 7) pose table;
    cam_params via a one-hot over C; X is a broadcast of the native point
    array — no gathers anywhere."""
    N = problem.points.shape[0]
    Opm = problem.obs_xy.shape[0]
    capp = Opm // N
    pose_tab = jnp.concatenate([problem.quat, problem.t], axis=1)  # (F, 7)
    pose_obs = _oh_fetch(pose_tab, problem.obs_frame)
    cam_obs = _oh_fetch(problem.cam_params, problem.obs_cam)
    X_obs = jnp.broadcast_to(
        problem.points[:, None, :], (N, capp, 3)
    ).reshape(Opm, 3)
    return pose_obs[:, :4], pose_obs[:, 4:7], cam_obs, X_obs


def _residuals_packed(problem: BAProblem, model_id: int, capf: int = 0,
                      maps: Optional[PackedMaps] = None):
    """compute_residuals specialized to the point-major packed layout.
    (capf/maps accepted for API compatibility; unused.)"""
    f = make_residual_fn(model_id)
    P = problem.cam_params.shape[1]
    dtype = problem.points.dtype
    q_obs, t_obs, cam_obs, X_obs = _fetch_obs_params(problem)

    def per_obs(quat, t, cam, X, xy):
        return f(
            jnp.zeros(6, dtype), jnp.zeros(P, dtype), jnp.zeros(3, dtype),
            quat, t, cam, X, xy,
        )

    return jax.vmap(per_obs)(q_obs, t_obs, cam_obs, X_obs, problem.obs_xy)


def compute_cost_packed(problem: BAProblem, model_id: int,
                        options: BAOptions, capf: int = 0,
                        maps: Optional[PackedMaps] = None,
                        axis_name: Optional[str] = None):
    r = _residuals_packed(problem, model_id)
    sq = jnp.sum(r * r, axis=-1)
    sq = jnp.where(jnp.isfinite(sq), sq, 0.0)
    return _psum(0.5 * jnp.sum(
        _robust_cost(sq, options.loss, options.loss_scale) * problem.obs_w
    ), axis_name)


def _obs_jacobians_packed(problem: BAProblem, model_id: int,
                          options: BAOptions, capf: int = 0,
                          maps: Optional[PackedMaps] = None):
    """_obs_jacobians in the point-major packed layout."""
    f = make_residual_fn(model_id)
    P = problem.cam_params.shape[1]
    dtype = problem.points.dtype
    q_obs, t_obs, cam_obs, X_obs = _fetch_obs_params(problem)

    def per_obs(quat, t, cam, X, xy):
        args = (
            jnp.zeros(6, dtype), jnp.zeros(P, dtype), jnp.zeros(3, dtype),
            quat, t, cam, X, xy,
        )
        r = f(*args)
        Jp, Jc, Jx = jax.jacfwd(f, argnums=(0, 1, 2))(*args)
        return r, Jp, Jc, Jx

    r, Jp, Jc, Jx = jax.vmap(per_obs)(
        q_obs, t_obs, cam_obs, X_obs, problem.obs_xy
    )
    Opm = problem.obs_xy.shape[0]
    sq = jnp.sum(r * r, axis=-1)
    w = _robust_weight(sq, options.loss, options.loss_scale) * problem.obs_w
    finite = (
        jnp.all(jnp.isfinite(r), axis=-1)
        & jnp.all(jnp.isfinite(Jp.reshape(Opm, -1)), axis=-1)
        & jnp.all(jnp.isfinite(Jc.reshape(Opm, -1)), axis=-1)
        & jnp.all(jnp.isfinite(Jx.reshape(Opm, -1)), axis=-1)
    )
    w = jnp.where(finite, w, 0.0)
    sw = jnp.sqrt(w)[:, None]
    r = jnp.where(finite[:, None], r, 0.0) * sw
    return r, Jp * sw[..., None], Jc * sw[..., None], Jx * sw[..., None]


def _packed_obs_masks(problem: BAProblem, masks: BAMasks,
                      options: BAOptions) -> _ObsMasks:
    """Per-observation mask arrays via exact one-hot fetches. Constant
    across the LM loop — compute once per solve."""
    N = problem.points.shape[0]
    Opm = problem.obs_xy.shape[0]
    capp = Opm // N
    rot_m = masks.frame_mask * (1.0 if options.refine_rotations else 0.0)
    pose_tab = jnp.concatenate(
        [
            jnp.broadcast_to(rot_m[:, None], masks.frame_trans_mask.shape),
            masks.frame_trans_mask,
        ],
        axis=-1,
    )  # (F, 6)
    pose = _oh_fetch(pose_tab, problem.obs_frame)
    cam = _oh_fetch(masks.cam_mask, problem.obs_cam)
    point = jnp.broadcast_to(
        masks.point_mask[:, None], (N, capp)
    ).reshape(Opm)
    return _ObsMasks(pose=pose, cam=cam, point=point)


def _outer2(a, b):
    """Per-row outer product summed over the residual axis:
    (O, r, d), (O, r, e) -> (O, d, e). Written as broadcast-multiply-sum:
    XLA lowers the equivalent einsum to a tiny batched dot_general that
    runs ~5x slower on TPU (measured v5e: 4.9 ms vs 1.0 ms at 400k rows)."""
    return (a[..., :, None] * b[..., None, :]).sum(-3)


class _PackedOperators(NamedTuple):
    Jp: jnp.ndarray  # (Opm, 2, 6)
    Jc: jnp.ndarray  # (Opm, 2, P)
    Jx_pm: jnp.ndarray  # (N, capp, 2, 3)
    Hpp_inv: jnp.ndarray  # (N, 3, 3)
    lam_diag_pose: jnp.ndarray  # (F, 6)
    lam_diag_cam: jnp.ndarray  # (C, P)
    fids: jnp.ndarray  # (Opm,)
    cids: jnp.ndarray  # (Opm,)


def _packed_matvec(ops: _PackedOperators, maps: PackedMaps, xp, xc,
                   axis_name: Optional[str] = None):
    """Gather-free (S + λD) @ x on the reduced camera system.

    All data movement is one-hot matmuls; point-side work is native in the
    point-major layout. Sharded (axis_name set): per-observation work is
    local; the only collective is one psum of the (F, 6) + (C, P) output —
    a few KB per PCG iteration over ICI."""
    F = xp.shape[0]
    C = xc.shape[0]
    N, capp = ops.Jx_pm.shape[:2]
    Opm = N * capp
    # u_o = Jp_o xp_f + Jc_o xc_c — one-hot fetches + dense einsums.
    xp_obs = _oh_fetch(xp, ops.fids)  # (Opm, 6)
    xc_obs = _oh_fetch(xc, ops.cids)  # (Opm, P)
    u = (
        (ops.Jp * xp_obs[:, None, :]).sum(-1)
        + (ops.Jc * xc_obs[:, None, :]).sum(-1)
    )  # (Opm, 2)
    # H_cc x.
    hcc_p = _oh_reduce((ops.Jp * u[:, :, None]).sum(1), ops.fids, F)
    hcc_c = _oh_reduce((ops.Jc * u[:, :, None]).sum(1), ops.cids, C)
    # Point side: native.
    u_pm = u.reshape(N, capp, 2)
    w = (ops.Jx_pm * u_pm[..., None]).sum((1, 2))
    y = (ops.Hpp_inv * w[:, None, :]).sum(-1)
    v = (ops.Jx_pm * y[:, None, None, :]).sum(-1).reshape(Opm, 2)
    hcp_p = _oh_reduce((ops.Jp * v[:, :, None]).sum(1), ops.fids, F)
    hcp_c = _oh_reduce((ops.Jc * v[:, :, None]).sum(1), ops.cids, C)
    sum_p, sum_c = _psum((hcc_p - hcp_p, hcc_c - hcp_c), axis_name)
    out_p = sum_p + ops.lam_diag_pose * xp
    out_c = sum_c + ops.lam_diag_cam * xc
    return out_p, out_c


def _packed_pcg(ops, maps, bp, bc, options: BAOptions,
                axis_name: Optional[str] = None):
    F = bp.shape[0]
    C = bc.shape[0]
    # Block-Jacobi preconditioner from the 6x6 H_cc pose blocks
    # (Ceres SCHUR_JACOBI): one batched 6x6 inverse per frame; scalar
    # Jacobi for the (few) camera-intrinsics parameters.
    Hcc_blocks = _oh_reduce(
        _outer2(ops.Jp, ops.Jp).reshape(-1, 36), ops.fids, F,
    ).reshape(F, 6, 6)
    diag_c_part = _oh_reduce(
        (ops.Jc * ops.Jc).sum(1), ops.cids, C
    )
    Hcc_blocks, diag_c_part = _psum((Hcc_blocks, diag_c_part), axis_name)
    Hcc_blocks = Hcc_blocks + jax.vmap(jnp.diag)(ops.lam_diag_pose + 1e-10)
    Mp_blocks = jnp.linalg.inv(Hcc_blocks)
    diag_c = diag_c_part + ops.lam_diag_cam
    Mc = jnp.where(diag_c > 1e-12, 1.0 / diag_c, 0.0)

    def precond(rp, rc):
        return jnp.einsum("fde,fe->fd", Mp_blocks, rp), Mc * rc

    def dot(ap, ac, bp_, bc_):
        return jnp.sum(ap * bp_) + jnp.sum(ac * bc_)

    xp = jnp.zeros_like(bp)
    xc = jnp.zeros_like(bc)
    rp, rc = bp, bc
    zp, zc = precond(rp, rc)
    pp, pc = zp, zc
    rz = dot(rp, rc, zp, zc)

    def body(i, state):
        xp, xc, rp, rc, pp, pc, rz = state
        Ap_p, Ap_c = _packed_matvec(ops, maps, pp, pc, axis_name)
        pAp = dot(pp, pc, Ap_p, Ap_c)
        alpha = jnp.where(jnp.abs(pAp) > 1e-30, rz / pAp, 0.0)
        xp = xp + alpha * pp
        xc = xc + alpha * pc
        rp = rp - alpha * Ap_p
        rc = rc - alpha * Ap_c
        zp, zc = precond(rp, rc)
        rz_new = dot(rp, rc, zp, zc)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        pp = zp + beta * pp
        pc = zc + beta * pc
        return xp, xc, rp, rc, pp, pc, rz_new

    state = (xp, xc, rp, rc, pp, pc, rz)
    state = jax.lax.fori_loop(0, options.pcg_iterations, body, state)
    return state[0], state[1]


def _lm_step_packed_impl(problem: BAProblem, maps: PackedMaps, model_id: int,
                         options: BAOptions, masks: BAMasks, lam, nu, cost,
                         axis_name: Optional[str] = None,
                         obs_masks: Optional[_ObsMasks] = None):
    """One LM iteration in the point-major packed layout; `cost` is the
    (already computed) cost at the current state — carried across iterations
    so each step pays exactly one residual pass plus one Jacobian pass.

    With axis_name set this runs as a shard_map shard: the shard owns a
    point chunk plus ALL observations of those points in point-major
    layout; frame/camera reductions are psummed (camera-system-sized, a few
    KB), point-side state stays local."""
    F = problem.quat.shape[0]
    C, P = problem.cam_params.shape
    N = problem.points.shape[0]
    Opm = problem.obs_xy.shape[0]
    capp = Opm // N
    fids = problem.obs_frame
    cids = problem.obs_cam

    if obs_masks is None:
        obs_masks = _packed_obs_masks(problem, masks, options)

    r, Jp, Jc, Jx = _obs_jacobians_packed(problem, model_id, options)
    Jp = Jp * obs_masks.pose[:, None, :]
    Jc = Jc * obs_masks.cam[:, None, :]
    Jx = Jx * obs_masks.point[:, None, None]

    Jx_pm = Jx.reshape(N, capp, 2, 3)
    r_pm = r.reshape(N, capp, 2)

    # Gradient blocks g = -Jᵀ r (one-hot reduces; frame/cam psummed).
    gp = -_oh_reduce((Jp * r[:, :, None]).sum(1), fids, F)
    gc = -_oh_reduce((Jc * r[:, :, None]).sum(1), cids, C)
    diag_pose = _oh_reduce((Jp * Jp).sum(1), fids, F)
    diag_cam = _oh_reduce((Jc * Jc).sum(1), cids, C)
    gp, gc, diag_pose, diag_cam = _psum(
        (gp, gc, diag_pose, diag_cam), axis_name
    )
    gx = -(Jx_pm * r_pm[..., None]).sum((1, 2))

    # Point Hessian blocks + damped inverse (point-side: shard-local).
    Hpp = _outer2(Jx.reshape(N, capp * 2, 3), Jx.reshape(N, capp * 2, 3))
    diag_pp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    damp = lam * diag_pp + 1e-12
    Hpp_inv = _inv3x3_spd(Hpp + jax.vmap(jnp.diag)(damp))

    ops = _PackedOperators(
        Jp, Jc, Jx_pm, Hpp_inv, lam * diag_pose, lam * diag_cam, fids, cids
    )

    # Reduced RHS: b = g_c - H_cp H_pp⁻¹ g_p.
    y = (Hpp_inv * gx[:, None, :]).sum(-1)
    v = (Jx_pm * y[:, None, None, :]).sum(-1).reshape(Opm, 2)
    corr_p = _oh_reduce((Jp * v[:, :, None]).sum(1), fids, F)
    corr_c = _oh_reduce((Jc * v[:, :, None]).sum(1), cids, C)
    corr_p, corr_c = _psum((corr_p, corr_c), axis_name)
    bp = gp - corr_p
    bc = gc - corr_c

    D = 6 * F + C * P
    use_dense = options.solver_type == "dense_schur" or (
        options.solver_type == "auto" and D <= options.dense_schur_max_dim
    )
    if use_dense:
        dp, dc = _dense_schur_solve(
            problem, maps, Jp, Jc, Jx, Hpp_inv,
            lam * diag_pose, lam * diag_cam, bp, bc,
            axis_name=axis_name,
        )
    else:
        dp, dc = _packed_pcg(ops, maps, bp, bc, options, axis_name)

    # Back-substitution: dx = H_pp⁻¹ (g_x - H_pc [dp; dc]).
    dp_obs = _oh_fetch(dp, fids)
    dc_obs = _oh_fetch(dc, cids)
    u = (
        (Jp * dp_obs[:, None, :]).sum(-1)
        + (Jc * dc_obs[:, None, :]).sum(-1)
    )
    w = (Jx_pm * u.reshape(N, capp, 2)[..., None]).sum((1, 2))
    dx = (Hpp_inv * (gx - w)[:, None, :]).sum(-1)

    new_problem = _apply_update(problem, dp, dc, dx)
    new_cost = compute_cost_packed(
        new_problem, model_id, options, 0, maps, axis_name
    )

    diag_pt = (Jx_pm * Jx_pm).sum((1, 2))
    # Point-side gain-ratio terms are shard-local -> one scalar psum.
    pt_terms = _psum(
        jnp.sum(dx * gx) + lam * jnp.sum(diag_pt * dx * dx), axis_name
    )
    pred = 0.5 * (
        jnp.sum(dp * gp) + jnp.sum(dc * gc) + pt_terms
        + lam * (
            jnp.sum(diag_pose * dp * dp)
            + jnp.sum(diag_cam * dc * dc)
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
    # Cost at the (possibly unchanged) output state: new_cost if accepted.
    out_cost = jnp.where(accepted, new_cost, cost)
    return out_problem, new_lam, new_nu, cost, new_cost, accepted, out_cost


@partial(jax.jit, static_argnums=(2, 3))
def lm_step_packed(problem: BAProblem, maps: PackedMaps, model_id: int,
                   options: BAOptions, masks: BAMasks, lam, nu):
    """One LM iteration in the packed layout (same semantics as lm_step)."""
    cost = compute_cost_packed(problem, model_id, options, 0, maps)
    out = _lm_step_packed_impl(
        problem, maps, model_id, options, masks, lam, nu, cost
    )
    return out[:6]


def _lm_solve_fused_packed(problem: BAProblem, maps: PackedMaps,
                           model_id: int, options: BAOptions, masks: BAMasks,
                           axis_name: Optional[str] = None):
    """Full packed LM solve as one device program (see lm_solve_fused).

    With axis_name, runs as a shard_map shard: every scalar driving the
    while_loop (costs, lambda, accepted) is psum-replicated, so all shards
    take identical branches."""
    dtype = problem.points.dtype
    lam0 = jnp.asarray(options.initial_lambda, dtype=dtype)
    nu0 = jnp.asarray(2.0, dtype=dtype)
    cost0 = compute_cost_packed(problem, model_id, options, 0, maps,
                                axis_name)
    # Mask arrays are constants of the solve: hoisted out of the loop.
    obs_masks = _packed_obs_masks(problem, masks, options)

    def cond(state):
        problem, lam, nu, it, cur_cost, last_cost, done = state
        return (~done) & (it < options.max_iterations)

    def body(state):
        problem, lam, nu, it, cur_cost, last_cost, done = state
        problem, lam, nu, cost, new_cost, accepted, cur_cost = (
            _lm_step_packed_impl(
                problem, maps, model_id, options, masks, lam, nu, cur_cost,
                axis_name, obs_masks=obs_masks,
            )
        )
        rel = jnp.abs(last_cost - new_cost) / jnp.maximum(new_cost, 1e-30)
        done_now = (accepted & (rel < options.function_tolerance)) | (
            (~accepted) & (lam >= options.max_lambda)
        )
        last_cost = jnp.where(accepted, new_cost, last_cost)
        return problem, lam, nu, it + 1, cur_cost, last_cost, done_now

    state = (
        problem, lam0, nu0, jnp.asarray(0), cost0, cost0, jnp.asarray(False)
    )
    state = jax.lax.while_loop(cond, body, state)
    problem = state[0]
    return problem, state[4], state[3]


@partial(jax.jit, static_argnums=(2, 3))
def lm_solve_fused_packed(problem: BAProblem, maps: PackedMaps, model_id: int,
                          options: BAOptions, masks: BAMasks):
    """Full packed LM solve as one device program (see lm_solve_fused)."""
    return _lm_solve_fused_packed(problem, maps, model_id, options, masks)


def _bucket_fine(n: int, minimum: int = 2) -> int:
    """Power-of-two shape bucket (floor `minimum`).

    Bounds XLA compiles to O(log n) per call site — the incremental
    mapper's local BAs otherwise compile a fresh LM program per
    registration at ~25 s each. Pure pow2 (rather than 1.5x stops)
    costs up to 2x padded BA compute, but on the tiny per-registration
    problems the mapper solves, an extra compile (25 s) dwarfs the padded
    compute (milliseconds on the MXU); fewer, coarser buckets win
    wall-clock outright (measured r5: 10 distinct LM compiles = 205 s of
    a 15-frame mapping run)."""
    b = max(minimum, 2)
    while b < n:
        b *= 2
    return b


def _pad_problem_buckets(problem: BAProblem, masks: BAMasks):
    """Pad frame/point counts to fine buckets. Padded frames carry the
    identity quaternion and zero masks; padded points carry zero masks and
    no observations — their residual/Jacobian contributions are exactly
    zero, so results match the unpadded solve."""
    F = int(problem.quat.shape[0])
    N = int(problem.points.shape[0])
    F_pad = _bucket_fine(F, 8)
    N_pad = _bucket_fine(N, 256)
    if F_pad == F and N_pad == N:
        return problem, masks, (F, N)
    dtype = problem.points.dtype
    quat = jnp.concatenate([
        problem.quat,
        jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (F_pad - F, 1)),
    ]) if F_pad != F else problem.quat
    t = jnp.concatenate([
        problem.t, jnp.zeros((F_pad - F, 3), dtype)
    ]) if F_pad != F else problem.t
    points = jnp.concatenate([
        problem.points, jnp.zeros((N_pad - N, 3), dtype)
    ]) if N_pad != N else problem.points
    problem = problem._replace(quat=quat, t=t, points=points)
    masks = masks._replace(
        frame_mask=jnp.concatenate([
            masks.frame_mask, jnp.zeros(F_pad - F, dtype)
        ]) if F_pad != F else masks.frame_mask,
        frame_trans_mask=jnp.concatenate([
            masks.frame_trans_mask, jnp.zeros((F_pad - F, 3), dtype)
        ]) if F_pad != F else masks.frame_trans_mask,
        point_mask=jnp.concatenate([
            masks.point_mask, jnp.zeros(N_pad - N, dtype)
        ]) if N_pad != N else masks.point_mask,
    )
    return problem, masks, (F, N)


# ---------------------------------------------------------------------------
# Background compile warming.
#
# XLA compiles of the fused LM program cost ~25 s each (remote compiler on
# the tunneled TPU; similar locally). The incremental mapper's problem
# sizes grow monotonically through a known ladder of pow2 buckets, so the
# NEXT bucket along each axis is predictable: compile it on a background
# thread while the foreground registers images with the current bucket's
# program. jit dispatch is thread-safe; a warm call populates the same
# in-process executable cache (and the persistent cache) the foreground
# lookup hits.

_WARM_POOL = None
_WARM_SEEN: set = set()
# key -> Future of the in-flight warm compile. A foreground solve_packed
# whose program is being warmed WAITS on the future instead of launching a
# duplicate compile of the same program (jit does not dedup concurrent
# compiles of one signature, and duplicate requests also contend on the
# remote compile service).
_WARM_FUTURES: dict = {}


def _warm_key(F, N, capp, C, P, model_id, options, dtype):
    return (F, N, capp, C, P, model_id, hash(options), str(dtype))


def _warm_pool():
    global _WARM_POOL
    if _WARM_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _WARM_POOL = ThreadPoolExecutor(
            max_workers=3, thread_name_prefix="ba-warm"
        )
    return _WARM_POOL


def warm_packed_solver(F: int, N: int, capp: int, C: int, P: int,
                       model_id, options: BAOptions, dtype) -> None:
    """Compile (and cache) the fused packed LM program for one shape bucket
    by running it on an all-zero problem. Zero obs_w/masks make every step
    a rejected no-op, so the while_loop terminates after ~9 iterations of
    trivial device work; the compile is the point."""
    import numpy as _np

    Opm = N * capp
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype=dtype), (F, 1))
    problem = BAProblem(
        quat=quat,
        t=jnp.zeros((F, 3), dtype=dtype),
        cam_params=jnp.ones((C, P), dtype=dtype),
        points=jnp.zeros((N, 3), dtype=dtype),
        obs_frame=jnp.zeros(Opm, dtype=jnp.int32),
        obs_cam=jnp.zeros(Opm, dtype=jnp.int32),
        obs_point=jnp.asarray(
            _np.repeat(_np.arange(N, dtype=_np.int32), capp)
        ),
        obs_xy=jnp.zeros((Opm, 2), dtype=dtype),
        obs_w=jnp.zeros(Opm, dtype=dtype),
    )
    maps = PackedMaps(
        frame_pm=jnp.zeros((N, capp), dtype=jnp.int32),
        cam_pm=jnp.zeros((N, capp), dtype=jnp.int32),
    )
    masks = BAMasks(
        frame_mask=jnp.zeros(F, dtype=dtype),
        frame_trans_mask=jnp.zeros((F, 3), dtype=dtype),
        cam_mask=jnp.zeros((C, P), dtype=dtype),
        point_mask=jnp.zeros(N, dtype=dtype),
    )
    compute_cost(problem, model_id, options)
    lm_solve_fused_packed(problem, maps, model_id, options, masks)


def warm_packed_solver_async(F: int, N: int, capp: int, C: int, P: int,
                             model_id, options: BAOptions, dtype) -> None:
    """Schedule warm_packed_solver on the background pool (deduplicated)."""
    import os as _os

    if _os.environ.get("COLMAP_TPU_NO_WARM"):
        return
    try:
        key = _warm_key(F, N, capp, C, P, model_id, options, dtype)
    except TypeError:
        return
    if key in _WARM_SEEN:
        return
    _WARM_SEEN.add(key)

    def job():
        try:
            warm_packed_solver(F, N, capp, C, P, model_id, options, dtype)
        except Exception:
            pass  # warms are best-effort; the foreground compiles anyway

    _WARM_FUTURES[key] = _warm_pool().submit(job)


def _schedule_neighbor_warms(F: int, N: int, capp: int, C: int, P: int,
                             model_id, options: BAOptions, dtype,
                             max_frames: Optional[int] = None) -> None:
    """Warm the growth-adjacent buckets of (F, N, capp): the incremental
    register loop only ever moves to a doubled bucket along some axis."""
    try:
        # The current bucket is being compiled by the foreground call;
        # never waste a background worker re-warming it.
        _WARM_SEEN.add(
            (F, N, capp, C, P, model_id, hash(options), str(dtype))
        )
    except TypeError:
        pass
    F2 = F * 2 if (max_frames is None or F < _bucket_fine(max_frames, 8)) \
        else F
    # Keep speculation narrow: a wide neighbor fan queues 25 s compiles
    # the run never uses AND delays the ones it does (the compile service
    # processes warms and foreground requests from the same queue;
    # measured r5: a 6-neighbor fan produced 20 live LM programs on a
    # 15-frame scene).
    for nf, nn, nc in ((F, N * 2, capp), (F2, N * 2, capp)):
        if (nf, nn, nc) != (F, N, capp):
            warm_packed_solver_async(nf, nn, nc, C, P, model_id, options,
                                     dtype)


def solve_packed(problem: BAProblem, model_id: int,
                 options: Optional[BAOptions] = None,
                 masks: Optional[BAMasks] = None,
                 bucket_shapes: bool = True):
    """Pack + solve + unpack. Parameters keep their layout (only the
    observation arrays are permuted internally), so results drop into the
    same write-back paths as solve(). bucket_shapes pads frame/point/capp
    sizes to fine buckets so repeated calls at drifting sizes (the
    incremental register loop) reuse compiled programs."""
    if options is None:
        options = BAOptions()
    if masks is None:
        masks = default_masks(problem, model_id, options)
    F0 = int(problem.quat.shape[0])
    N0 = int(problem.points.shape[0])
    capp_kw = {}
    if bucket_shapes:
        problem, masks, (F0, N0) = _pad_problem_buckets(problem, masks)
        import numpy as _np

        counts_p = _np.bincount(
            _np.asarray(problem.obs_point),
            minlength=problem.points.shape[0],
        )
        # Floor 16: track lengths cross 8 routinely as a scene grows, and
        # every capp doubling doubles the live (F, N, capp) program
        # lattice. 16 slots/point of padded compute is noise on the MXU;
        # a fresh 25 s LM compile is not.
        capp_kw["capp"] = _bucket_fine(int(counts_p.max(initial=1)), 16)
        C, P = problem.cam_params.shape
        shape_args = (
            int(problem.quat.shape[0]), int(problem.points.shape[0]),
            capp_kw["capp"], int(C), int(P), model_id, options,
            problem.points.dtype,
        )
        # If a background warm of exactly this program is in flight, wait
        # for it — the subsequent jit lookup is then a cache hit.
        try:
            fut = _WARM_FUTURES.get(_warm_key(*shape_args))
        except TypeError:
            fut = None
        if fut is not None:
            fut.result()
        _schedule_neighbor_warms(*shape_args)
    packed, maps, _ = pack_problem(problem, **capp_kw)
    initial_cost = float(compute_cost(packed, model_id, options))
    solved, final_cost, n_iters = lm_solve_fused_packed(
        packed, maps, model_id, options, masks
    )
    out = problem._replace(
        quat=solved.quat[:F0], t=solved.t[:F0],
        cam_params=solved.cam_params, points=solved.points[:N0],
        obs_frame=problem.obs_frame, obs_cam=problem.obs_cam,
        obs_point=problem.obs_point, obs_xy=problem.obs_xy,
        obs_w=problem.obs_w,
    )
    return out, {
        "initial_cost": initial_cost,
        "final_cost": float(final_cost),
        "num_iterations": int(n_iters),
    }


# ---------------------------------------------------------------------------
# Dense Schur path (Ceres DENSE_SCHUR analogue).
#
# For models up to a few hundred frames the reduced camera matrix
# S = H_cc - H_cp H_pp^-1 H_pc is small (6F + C*P square). Building it
# explicitly turns the entire solve into MXU matmuls + one Cholesky:
# S_corr = Q^T Q with Q = blockdiag(L_n^T) [W | Wc] assembled per point
# chunk via one-hot einsums (L_n = chol(Hpp_n^-1)). This replaces 20+ PCG
# matvecs with one exact solve — the same size-based selection the
# reference uses (bundle_adjustment_ceres.h:68-76: dense <= 50/200 images,
# sparse beyond, ITERATIVE_SCHUR at the largest sizes).


def _chol3x3(A, eps=1e-20):
    """Batched closed-form Cholesky of SPD 3x3 blocks (lower L, A = L L^T)."""
    a11 = jnp.sqrt(jnp.maximum(A[..., 0, 0], eps))
    l21 = A[..., 1, 0] / a11
    l31 = A[..., 2, 0] / a11
    a22 = jnp.sqrt(jnp.maximum(A[..., 1, 1] - l21 * l21, eps))
    l32 = (A[..., 2, 1] - l31 * l21) / a22
    a33 = jnp.sqrt(jnp.maximum(A[..., 2, 2] - l31 * l31 - l32 * l32, eps))
    z = jnp.zeros_like(a11)
    return jnp.stack(
        [
            jnp.stack([a11, z, z], axis=-1),
            jnp.stack([l21, a22, z], axis=-1),
            jnp.stack([l31, l32, a33], axis=-1),
        ],
        axis=-2,
    )


def _dense_schur_solve(problem, maps, Jp, Jc, Jx, Hpp_inv, lam_diag_pose,
                       lam_diag_cam, bp, bc, point_chunk: int = 8192,
                       use_bf16: bool = True,
                       axis_name: Optional[str] = None):
    """Solve (S + lam D) [dp; dc] = [bp; bc] by explicit dense Schur.

    All inputs are point-major; assembly needs no data movement beyond the
    chunked one-hot dot_generals. Sharded: each shard accumulates S over its
    own points; one psum of the D x D matrix assembles the global S, and the
    Cholesky runs replicated (D = 6F + C*P is small whenever this path is
    selected)."""
    F = problem.quat.shape[0]
    C, P = problem.cam_params.shape
    N = problem.points.shape[0]
    Opm = problem.obs_xy.shape[0]
    capp = Opm // N
    D = 6 * F + C * P
    dtype = Jp.dtype
    fids = problem.obs_frame
    cids = problem.obs_cam

    # Per-observation coupling blocks, then T = W L per point-major slot
    # (Hpp_inv = L L^T). Broadcast-multiply-sum instead of batched tiny
    # dot_generals (see _outer2).
    W = _outer2(Jp, Jx).reshape(N, capp, 6, 3)
    Wc = _outer2(Jc, Jx).reshape(N, capp, P, 3)
    L = _chol3x3(Hpp_inv)  # (N, 3, 3)
    T = (W[..., :, None] * L[:, None, None, :, :]).sum(-2)  # (N, capp, 6, 3)
    Tc = (Wc[..., :, None] * L[:, None, None, :, :]).sum(-2)
    frame_pm = maps.frame_pm
    cam_pm = maps.cam_pm

    # Pad N to a chunk multiple.
    n_chunks = -(-N // point_chunk)
    N_pad = n_chunks * point_chunk
    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros((N_pad - N,) + x.shape[1:], x.dtype)], axis=0
    ) if N_pad != N else x
    T = pad(T)
    Tc = pad(Tc)
    frame_pm = pad(frame_pm)
    cam_pm = pad(cam_pm)

    # MXU-native: bf16 operands with f32 accumulation. S entries are
    # O(150k)-term sums, so the f32 accumulator keeps the Schur matrix
    # accurate to ~1e-3 relative — ample for an LM *step* (the gain-ratio
    # test guards against any bad direction).
    qdtype = jnp.bfloat16 if use_bf16 else dtype
    # Contract over the (point, residual-component) dims directly with
    # dot_general — no (B*3, D) reshape, which XLA lowered to a slow
    # layout-change copy of the Q blocks.
    dn = (((0, 1), (0, 1)), ((), ()))
    arangeF = jnp.arange(F, dtype=frame_pm.dtype)
    arangeC = jnp.arange(C, dtype=cam_pm.dtype)

    def chunk_corr(carry, inputs):
        T_ch, Tc_ch, f_ch, c_ch = inputs  # (B, capp, 6/P, 3), (B, capp)
        # Q blocks (B, 3, F, 6) + (B, 3, C, P), built by an unrolled
        # broadcast over the (small, static) capp axis — the equivalent
        # one-hot einsum lowers to a slow tiny batched matmul.
        B = T_ch.shape[0]
        Qp = jnp.zeros((B, 3, F, 6), qdtype)
        Qc = jnp.zeros((B, 3, C, P), qdtype)
        for k in range(T_ch.shape[1]):
            ohf = (f_ch[:, k, None] == arangeF).astype(qdtype)  # (B, F)
            ohc = (c_ch[:, k, None] == arangeC).astype(qdtype)  # (B, C)
            Tk = jnp.swapaxes(T_ch[:, k], 1, 2).astype(qdtype)  # (B, 3, 6)
            Tck = jnp.swapaxes(Tc_ch[:, k], 1, 2).astype(qdtype)
            Qp = Qp + ohf[:, None, :, None] * Tk[:, :, None, :]
            Qc = Qc + ohc[:, None, :, None] * Tck[:, :, None, :]
        pp, pc, cc = carry
        pp = pp + jax.lax.dot_general(
            Qp, Qp, dn, preferred_element_type=jnp.float32
        )  # (F, 6, F, 6)
        pc = pc + jax.lax.dot_general(
            Qp, Qc, dn, preferred_element_type=jnp.float32
        )  # (F, 6, C, P)
        cc = cc + jax.lax.dot_general(
            Qc, Qc, dn, preferred_element_type=jnp.float32
        )  # (C, P, C, P)
        return (pp, pc, cc), None

    (S_pp, S_pc, S_cc), _ = jax.lax.scan(
        chunk_corr,
        (
            jnp.zeros((F, 6, F, 6), jnp.float32),
            jnp.zeros((F, 6, C, P), jnp.float32),
            jnp.zeros((C, P, C, P), jnp.float32),
        ),
        (
            T.reshape(n_chunks, point_chunk, capp, 6, 3),
            Tc.reshape(n_chunks, point_chunk, capp, P, 3),
            frame_pm.reshape(n_chunks, point_chunk, capp),
            cam_pm.reshape(n_chunks, point_chunk, capp),
        ),
    )
    S_corr = jnp.concatenate(
        [
            jnp.concatenate(
                [S_pp.reshape(6 * F, 6 * F), S_pc.reshape(6 * F, C * P)],
                axis=1,
            ),
            jnp.concatenate(
                [
                    S_pc.reshape(6 * F, C * P).T,
                    S_cc.reshape(C * P, C * P),
                ],
                axis=1,
            ),
        ],
        axis=0,
    ).astype(dtype)

    # Dense H_cc: pose blocks are frame-diagonal; cam-cam blocks are
    # cam-diagonal; pose-cam couples through the joint (frame, cam) id.
    Hpp_blocks = _oh_reduce(
        _outer2(Jp, Jp).reshape(Opm, 36), fids, F
    ).reshape(F, 6, 6)
    idx = jnp.arange(F)
    Hcc_pose = jnp.zeros((F, 6, F, 6), dtype)
    Hcc_pose = Hcc_pose.at[idx, :, idx, :].set(Hpp_blocks)
    # Pose-cam coupling: per obs, Jp^T Jc accumulated into (frame, cam)
    # via a joint-id one-hot reduce (n = F*C, chunk-guarded).
    cross = _outer2(Jp, Jc).reshape(Opm, 6 * P)
    joint = fids * C + cids
    Hcc_pc = _oh_reduce(cross, joint, F * C).reshape(F, C, 6, P)
    Hcc_pc = jnp.transpose(Hcc_pc, (0, 2, 1, 3))  # (F, 6, C, P)
    # Cam-cam: block-diagonal in the camera id.
    cc_blocks = _oh_reduce(
        _outer2(Jc, Jc).reshape(Opm, P * P), cids, C
    ).reshape(C, P, P)
    idc = jnp.arange(C)
    Hcc_cc = jnp.zeros((C, P, C, P), dtype)
    Hcc_cc = Hcc_cc.at[idc, :, idc, :].set(cc_blocks)
    top = jnp.concatenate(
        [Hcc_pose.reshape(6 * F, 6 * F), Hcc_pc.reshape(6 * F, C * P)], axis=1
    )
    bot = jnp.concatenate(
        [Hcc_pc.reshape(6 * F, C * P).T, Hcc_cc.reshape(C * P, C * P)], axis=1
    )
    Hcc = jnp.concatenate([top, bot], axis=0)

    lam_diag = jnp.concatenate(
        [lam_diag_pose.reshape(-1), lam_diag_cam.reshape(-1)]
    )
    S = _psum(Hcc - S_corr, axis_name) + jnp.diag(lam_diag + 1e-10)
    b = jnp.concatenate([bp.reshape(-1), bc.reshape(-1)])
    chol = jnp.linalg.cholesky(S)
    d = jax.scipy.linalg.cho_solve((chol, True), b)
    # Fall back to a tiny ridge solve if S was not SPD (chol -> NaN).
    bad = ~jnp.all(jnp.isfinite(chol))
    d_ridge = jnp.linalg.solve(S + 1e-6 * jnp.eye(D, dtype=dtype), b)
    d = jnp.where(bad, d_ridge, d)
    return d[: 6 * F].reshape(F, 6), d[6 * F :].reshape(C, P)
