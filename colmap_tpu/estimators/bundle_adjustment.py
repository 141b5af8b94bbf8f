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
# Packed (scatter-free) LM path.
#
# TPU rationale: jax.ops.segment_sum lowers to scatter-add, which the TPU
# serializes (~5 ms per 300k-observation reduction measured on v5e) — the
# reduced-system matvec needs five of them per PCG iteration. The packed
# layout removes every scatter: observations are sorted by frame and padded
# to a common per-frame capacity (frame-major flat layout, typically <10%
# padding), so frame-side reductions become dense reshapen sums; camera
# reductions become a one-hot matmul (C is tiny); point-side reductions run
# in a second, point-major padded layout connected to the first by two
# static permutations (one (O, 2) gather each way per matvec). Everything
# else is dense einsums on the MXU/VPU.


class PackedMaps(NamedTuple):
    p2f: jnp.ndarray  # (N*capp,) int32 -> [0, Of]; Of = dummy row
    f2p: jnp.ndarray  # (Of,) int32 -> [0, N*capp]; N*capp = dummy row
    cam_onehot: jnp.ndarray  # (Of, C) float, dummy rows zero
    # Binary camera one-hot (dummy rows select camera 0): turns the
    # per-observation cam_params gather — a slow small-row gather on TPU —
    # into one (Of, C) @ (C, P) MXU matmul.
    cam_onehot_bin: jnp.ndarray  # (Of, C) float
    # Point-major frame/camera ids (dummy slots -> 0), hoisted out of the
    # LM loop: these are constants of the packing, not of the iterate.
    frame_pm: jnp.ndarray  # (N, capp) int32
    cam_pm: jnp.ndarray  # (N, capp) int32


def pack_problem(problem: BAProblem, align: int = 8,
                 capf: Optional[int] = None, capp: Optional[int] = None):
    """Repack observations into the frame-major padded layout (host).

    Returns (packed BAProblem with Of = F*capf observations, PackedMaps,
    capacities dict). Dummy rows carry obs_w = 0. capf/capp may be forced
    by the caller (sharded packing needs uniform capacities across shards).
    """
    import numpy as np

    F = int(problem.quat.shape[0])
    C = int(problem.cam_params.shape[0])
    N = int(problem.points.shape[0])
    obs_frame = np.asarray(problem.obs_frame)
    obs_cam = np.asarray(problem.obs_cam)
    obs_point = np.asarray(problem.obs_point)
    obs_xy = np.asarray(problem.obs_xy)
    obs_w = np.asarray(problem.obs_w)
    O = len(obs_frame)

    counts_f = np.bincount(obs_frame, weights=None, minlength=F)
    if capf is None:
        capf = int(max(1, -(-int(counts_f.max()) // align) * align))
    assert int(counts_f.max(initial=0)) <= capf, "capf too small"
    Of = F * capf
    order = np.argsort(obs_frame, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts_f)]).astype(np.int64)

    # Frame-major flat slots.
    slot_of_obs = np.empty(O, dtype=np.int64)  # original obs -> flat slot
    flat_valid = np.zeros(Of, dtype=bool)
    flat_src = np.zeros(Of, dtype=np.int64)  # flat slot -> original obs
    for f in range(F):
        n = int(counts_f[f])
        sl = np.arange(f * capf, f * capf + n)
        src = order[starts[f] : starts[f] + n]
        slot_of_obs[src] = sl
        flat_src[sl] = src
        flat_valid[sl] = True

    def scatter_flat(a, fill=0):
        out = np.full((Of,) + a.shape[1:], fill, dtype=a.dtype)
        out[flat_valid] = a[flat_src[flat_valid]]
        return out

    p_frame = np.repeat(np.arange(F, dtype=obs_frame.dtype), capf)
    p_cam = scatter_flat(obs_cam)
    p_point = scatter_flat(obs_point)
    p_xy = scatter_flat(obs_xy)
    p_w = np.zeros(Of, dtype=obs_w.dtype)
    p_w[flat_valid] = obs_w[flat_src[flat_valid]]

    # Point-major padded layout over flat slots.
    counts_p = np.bincount(obs_point, minlength=N)
    if capp is None:
        capp = int(max(1, -(-int(counts_p.max()) // align) * align))
    p2f = np.full(N * capp, Of, dtype=np.int32)  # dummy -> Of
    f2p = np.full(Of, N * capp, dtype=np.int32)  # dummy -> N*capp
    order_p = np.argsort(obs_point, kind="stable")
    starts_p = np.concatenate([[0], np.cumsum(counts_p)]).astype(np.int64)
    for n in range(N):
        k = int(counts_p[n])
        src = order_p[starts_p[n] : starts_p[n] + k]
        slots = slot_of_obs[src]
        p2f[n * capp : n * capp + k] = slots
        f2p[slots] = n * capp + np.arange(k)

    dt = np.asarray(problem.points).dtype
    onehot = np.zeros((Of, C), dtype=dt)
    onehot[np.arange(Of), p_cam] = p_w  # weight folded: dummy rows zero
    onehot_bin = np.zeros((Of, C), dtype=dt)
    onehot_bin[np.arange(Of), p_cam] = 1.0

    # Point-major frame/camera ids (constants of the packing).
    frame_pm = np.zeros(N * capp, dtype=np.int32)
    cam_pm = np.zeros(N * capp, dtype=np.int32)
    real = p2f < Of
    frame_pm[real] = (p2f[real] // capf).astype(np.int32)
    cam_pm[real] = p_cam[p2f[real]].astype(np.int32)

    packed = problem._replace(
        obs_frame=jnp.asarray(p_frame),
        obs_cam=jnp.asarray(p_cam),
        obs_point=jnp.asarray(p_point),
        obs_xy=jnp.asarray(p_xy),
        obs_w=jnp.asarray(p_w),
    )
    maps = PackedMaps(
        p2f=jnp.asarray(p2f), f2p=jnp.asarray(f2p),
        cam_onehot=jnp.asarray(np.minimum(onehot, 1.0)),
        cam_onehot_bin=jnp.asarray(onehot_bin),
        frame_pm=jnp.asarray(frame_pm.reshape(N, capp)),
        cam_pm=jnp.asarray(cam_pm.reshape(N, capp)),
    )
    return packed, maps, {"capf": capf, "capp": capp}


def _psum(x, axis_name):
    """psum when running as a shard_map shard; identity single-device.

    The sharded packed solver co-partitions points WITH their observations
    (each device holds its own local frame-major packing), so every
    cross-layout permutation stays device-local and the only communication
    is psums of camera-system-sized arrays (6F + C*P floats) — the
    TPU-native analogue of Caspar's single-GPU LM+PCG
    (bundle_adjustment_caspar.h:107-120) scaled over ICI.
    """
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def _to_pm(x_flat, p2f, N, capp):
    """Frame-major flat (Of, ...) -> point-major (N, capp, ...)."""
    ext = jnp.concatenate(
        [x_flat, jnp.zeros((1,) + x_flat.shape[1:], x_flat.dtype)], axis=0
    )
    return ext[p2f].reshape((N, capp) + x_flat.shape[1:])


def _to_fm(x_pm_flat, f2p):
    """Point-major flat (N*capp, ...) -> frame-major flat (Of, ...)."""
    ext = jnp.concatenate(
        [x_pm_flat, jnp.zeros((1,) + x_pm_flat.shape[1:], x_pm_flat.dtype)],
        axis=0,
    )
    return ext[f2p]


def _cam_params_per_obs(problem: BAProblem, maps: Optional[PackedMaps],
                        capf: int):
    """(F, capf, P) per-observation camera parameters.

    With maps, an (Of, C) @ (C, P) MXU matmul on the binary camera one-hot;
    the fallback is the per-row gather (the slow small-row path on TPU,
    kept for callers without a PackedMaps)."""
    F = problem.quat.shape[0]
    P = problem.cam_params.shape[1]
    if maps is not None:
        # Exact one-hot fetch: HIGHEST precision keeps the MXU path but
        # forbids the default single-pass bf16 lowering, which would
        # silently quantize camera params (e.g. a ~1000px focal to ±2px)
        # inside every cost/Jacobian evaluation on TPU.
        cam_obs = jax.lax.dot_general(
            maps.cam_onehot_bin, problem.cam_params,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=problem.cam_params.dtype,
        )  # (Of, P)
    else:
        cam_obs = problem.cam_params[problem.obs_cam]
    return cam_obs.reshape(F, capf, P)


def _residuals_packed(problem: BAProblem, model_id: int, capf: int,
                      maps: Optional[PackedMaps] = None):
    """compute_residuals specialized to the frame-major packed layout:
    quat/t enter as broadcasts over (F, capf) instead of per-observation
    gathers (the gathers of tiny 3/4-float rows are the slow path on TPU)."""
    f = make_residual_fn(model_id)
    P = problem.cam_params.shape[1]
    dtype = problem.points.dtype
    F = problem.quat.shape[0]

    def per_obs(quat, t, cam, pi, xy):
        return f(
            jnp.zeros(6, dtype), jnp.zeros(P, dtype), jnp.zeros(3, dtype),
            quat, t, cam, problem.points[pi], xy,
        )

    per_frame = jax.vmap(per_obs, in_axes=(None, None, 0, 0, 0))
    r = jax.vmap(per_frame)(
        problem.quat, problem.t,
        _cam_params_per_obs(problem, maps, capf),
        problem.obs_point.reshape(F, capf),
        problem.obs_xy.reshape(F, capf, 2),
    )
    return r.reshape(F * capf, 2)


def compute_cost_packed(problem: BAProblem, model_id: int,
                        options: BAOptions, capf: int,
                        maps: Optional[PackedMaps] = None,
                        axis_name: Optional[str] = None):
    r = _residuals_packed(problem, model_id, capf, maps)
    sq = jnp.sum(r * r, axis=-1)
    sq = jnp.where(jnp.isfinite(sq), sq, 0.0)
    return _psum(0.5 * jnp.sum(
        _robust_cost(sq, options.loss, options.loss_scale) * problem.obs_w
    ), axis_name)


def _obs_jacobians_packed(problem: BAProblem, model_id: int,
                          options: BAOptions, capf: int,
                          maps: Optional[PackedMaps] = None):
    """_obs_jacobians in the packed layout (broadcast pose gathers)."""
    f = make_residual_fn(model_id)
    P = problem.cam_params.shape[1]
    dtype = problem.points.dtype
    F = problem.quat.shape[0]

    def per_obs(quat, t, cam, pi, xy):
        args = (
            jnp.zeros(6, dtype), jnp.zeros(P, dtype), jnp.zeros(3, dtype),
            quat, t, cam, problem.points[pi], xy,
        )
        r = f(*args)
        Jp, Jc, Jx = jax.jacfwd(f, argnums=(0, 1, 2))(*args)
        return r, Jp, Jc, Jx

    per_frame = jax.vmap(per_obs, in_axes=(None, None, 0, 0, 0))
    r, Jp, Jc, Jx = jax.vmap(per_frame)(
        problem.quat, problem.t,
        _cam_params_per_obs(problem, maps, capf),
        problem.obs_point.reshape(F, capf),
        problem.obs_xy.reshape(F, capf, 2),
    )
    Of = F * capf
    r = r.reshape(Of, 2)
    Jp = Jp.reshape(Of, 2, 6)
    Jc = Jc.reshape(Of, 2, P)
    Jx = Jx.reshape(Of, 2, 3)
    sq = jnp.sum(r * r, axis=-1)
    w = _robust_weight(sq, options.loss, options.loss_scale) * problem.obs_w
    finite = (
        jnp.all(jnp.isfinite(r), axis=-1)
        & jnp.all(jnp.isfinite(Jp.reshape(Of, -1)), axis=-1)
        & jnp.all(jnp.isfinite(Jc.reshape(Of, -1)), axis=-1)
        & jnp.all(jnp.isfinite(Jx.reshape(Of, -1)), axis=-1)
    )
    w = jnp.where(finite, w, 0.0)
    sw = jnp.sqrt(w)[:, None]
    r = jnp.where(finite[:, None], r, 0.0) * sw
    return r, Jp * sw[..., None], Jc * sw[..., None], Jx * sw[..., None]


class _PackedOperators(NamedTuple):
    Jp_fm: jnp.ndarray  # (F, capf, 2, 6)
    Jc_fm: jnp.ndarray  # (Of, 2, P)
    Jx_pm: jnp.ndarray  # (N, capp, 2, 3)
    Hpp_inv: jnp.ndarray  # (N, 3, 3)
    lam_diag_pose: jnp.ndarray
    lam_diag_cam: jnp.ndarray


def _packed_matvec(ops: _PackedOperators, maps: PackedMaps, xp, xc,
                   axis_name: Optional[str] = None):
    """Scatter-free (S + λD) @ x on the reduced camera system.

    Sharded (axis_name set): all per-observation work is local to the
    shard's own dual layout; the only collective is one psum of the
    (F, 6) + (C, P) output — a few KB per PCG iteration over ICI."""
    F, capf = ops.Jp_fm.shape[:2]
    N, capp = ops.Jx_pm.shape[:2]
    # u_o = Jp_o xp_f + Jc_o xc_c — all dense.
    u_fm = jnp.einsum("fkrd,fd->fkr", ops.Jp_fm, xp).reshape(F * capf, 2)
    xc_obs = maps.cam_onehot @ xc  # (Of, P)
    u_fm = u_fm + jnp.einsum("orp,op->or", ops.Jc_fm, xc_obs)
    # H_cc x.
    hcc_p = jnp.einsum(
        "fkrd,fkr->fd", ops.Jp_fm, u_fm.reshape(F, capf, 2)
    )
    prod_c = jnp.einsum("orp,or->op", ops.Jc_fm, u_fm)
    hcc_c = maps.cam_onehot.T @ prod_c
    # Point side in point-major layout.
    u_pm = _to_pm(u_fm, maps.p2f, N, capp)
    w = jnp.einsum("nkrd,nkr->nd", ops.Jx_pm, u_pm)
    y = jnp.einsum("nde,ne->nd", ops.Hpp_inv, w)
    v_pm = jnp.einsum("nkrd,nd->nkr", ops.Jx_pm, y)
    v_fm = _to_fm(v_pm.reshape(N * capp, 2), maps.f2p)
    hcp_p = jnp.einsum(
        "fkrd,fkr->fd", ops.Jp_fm, v_fm.reshape(F, capf, 2)
    )
    prod_c2 = jnp.einsum("orp,or->op", ops.Jc_fm, v_fm)
    hcp_c = maps.cam_onehot.T @ prod_c2
    sum_p, sum_c = _psum((hcc_p - hcp_p, hcc_c - hcp_c), axis_name)
    out_p = sum_p + ops.lam_diag_pose * xp
    out_c = sum_c + ops.lam_diag_cam * xc
    return out_p, out_c


def _packed_pcg(ops, maps, bp, bc, options: BAOptions,
                axis_name: Optional[str] = None):
    F, capf = ops.Jp_fm.shape[:2]
    # Block-Jacobi preconditioner from the 6x6 H_cc pose blocks
    # (Ceres SCHUR_JACOBI): one batched 6x6 inverse per frame; scalar
    # Jacobi for the (few) camera-intrinsics parameters.
    Hcc_blocks = jnp.einsum("fkrd,fkre->fde", ops.Jp_fm, ops.Jp_fm)
    prod = jnp.einsum("orp,orp->op", ops.Jc_fm, ops.Jc_fm)
    diag_c_part = maps.cam_onehot.T @ prod
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
                         axis_name: Optional[str] = None):
    """One LM iteration in the packed layout; `cost` is the (already
    computed) cost at the current state — carried across iterations so
    each step pays exactly one residual pass plus one Jacobian pass.

    With axis_name set this runs as a shard_map shard: the shard owns a
    point chunk plus ALL observations of those points in its own dual
    frame-/point-major layout; frame/camera reductions are psummed
    (camera-system-sized, a few KB), point-side state stays local."""
    F = problem.quat.shape[0]
    C, P = problem.cam_params.shape
    N = problem.points.shape[0]
    Of = problem.obs_xy.shape[0]
    capf = Of // F
    capp = maps.p2f.shape[0] // N

    r, Jp, Jc, Jx = _obs_jacobians_packed(problem, model_id, options, capf, maps)
    Jp, Jc, Jx = _apply_masks(Jp, Jc, Jx, problem, masks, options)

    Jp_fm = Jp.reshape(F, capf, 2, 6)
    # One wide cross-layout permutation instead of two narrow ones: TPU
    # gathers pay per row, so moving [Jx | r] as one (Of, 8) block halves
    # the permutation cost.
    comb = jnp.concatenate([Jx.reshape(Of, 6), r], axis=1)
    comb_pm = _to_pm(comb, maps.p2f, N, capp)  # (N, capp, 8)
    Jx_pm = comb_pm[..., :6].reshape(N, capp, 2, 3)
    r_pm = comb_pm[..., 6:8]

    # Gradient blocks g = -Jᵀ r (dense reductions; frame/cam psummed).
    gp = -jnp.einsum("fkrd,fkr->fd", Jp_fm, r.reshape(F, capf, 2))
    gc = -(maps.cam_onehot.T @ jnp.einsum("orp,or->op", Jc, r))
    diag_pose = jnp.einsum("fkrd,fkrd->fd", Jp_fm, Jp_fm)
    diag_cam = maps.cam_onehot.T @ jnp.einsum("orp,orp->op", Jc, Jc)
    gp, gc, diag_pose, diag_cam = _psum(
        (gp, gc, diag_pose, diag_cam), axis_name
    )
    gx = -jnp.einsum("nkrd,nkr->nd", Jx_pm, r_pm)

    # Point Hessian blocks + damped inverse (point-side: shard-local).
    Hpp = jnp.einsum("nkrd,nkre->nde", Jx_pm, Jx_pm)
    diag_pp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    damp = lam * diag_pp + 1e-12
    Hpp_inv = _inv3x3_spd(Hpp + jax.vmap(jnp.diag)(damp))

    ops = _PackedOperators(
        Jp_fm, Jc, Jx_pm, Hpp_inv, lam * diag_pose, lam * diag_cam
    )

    # Reduced RHS: b = g_c - H_cp H_pp⁻¹ g_p.
    y = jnp.einsum("nde,ne->nd", Hpp_inv, gx)
    v_pm = jnp.einsum("nkrd,nd->nkr", Jx_pm, y)
    v_fm = _to_fm(v_pm.reshape(N * capp, 2), maps.f2p)
    corr_p = jnp.einsum("fkrd,fkr->fd", Jp_fm, v_fm.reshape(F, capf, 2))
    corr_c = maps.cam_onehot.T @ jnp.einsum("orp,or->op", Jc, v_fm)
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
    u_fm = jnp.einsum("fkrd,fd->fkr", Jp_fm, dp).reshape(Of, 2)
    u_fm = u_fm + jnp.einsum("orp,op->or", Jc, maps.cam_onehot @ dc)
    u_pm = _to_pm(u_fm, maps.p2f, N, capp)
    w = jnp.einsum("nkrd,nkr->nd", Jx_pm, u_pm)
    dx = jnp.einsum("nde,ne->nd", Hpp_inv, gx - w)

    new_problem = _apply_update(problem, dp, dc, dx)
    new_cost = compute_cost_packed(
        new_problem, model_id, options, capf, maps, axis_name
    )

    diag_pt = jnp.einsum("nkrd,nkrd->nd", Jx_pm, Jx_pm)
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
    capf = problem.obs_xy.shape[0] // problem.quat.shape[0]
    cost = compute_cost_packed(problem, model_id, options, capf, maps)
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
    capf = problem.obs_xy.shape[0] // problem.quat.shape[0]
    lam0 = jnp.asarray(options.initial_lambda, dtype=dtype)
    nu0 = jnp.asarray(2.0, dtype=dtype)
    cost0 = compute_cost_packed(problem, model_id, options, capf, maps,
                                axis_name)

    def cond(state):
        problem, lam, nu, it, cur_cost, last_cost, done = state
        return (~done) & (it < options.max_iterations)

    def body(state):
        problem, lam, nu, it, cur_cost, last_cost, done = state
        problem, lam, nu, cost, new_cost, accepted, cur_cost = (
            _lm_step_packed_impl(
                problem, maps, model_id, options, masks, lam, nu, cur_cost,
                axis_name,
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


def solve_packed(problem: BAProblem, model_id: int,
                 options: Optional[BAOptions] = None,
                 masks: Optional[BAMasks] = None):
    """Pack + solve + unpack. Parameters keep their layout (only the
    observation arrays are permuted internally), so results drop into the
    same write-back paths as solve()."""
    if options is None:
        options = BAOptions()
    if masks is None:
        masks = default_masks(problem, model_id, options)
    packed, maps, _ = pack_problem(problem)
    initial_cost = float(compute_cost(packed, model_id, options))
    solved, final_cost, n_iters = lm_solve_fused_packed(
        packed, maps, model_id, options, masks
    )
    out = problem._replace(
        quat=solved.quat, t=solved.t,
        cam_params=solved.cam_params, points=solved.points,
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
# chunk via one-hot einsums (L_n = chol(Hpp_n^-1)). This replaces 20 PCG
# matvecs (each paying two cross-layout gathers) with one exact solve —
# the same size-based selection the reference uses
# (bundle_adjustment_ceres.h:68-76: dense <= 50/200 images, sparse beyond,
# ITERATIVE_SCHUR at the largest sizes).


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
                       lam_diag_cam, bp, bc, point_chunk: int = 4096,
                       use_bf16: bool = True,
                       axis_name: Optional[str] = None):
    """Solve (S + lam D) [dp; dc] = [bp; bc] by explicit dense Schur.

    Sharded: each shard accumulates S over its own points; one psum of the
    D x D matrix assembles the global S, and the Cholesky runs replicated
    (D = 6F + C*P is small whenever this path is selected)."""
    F = problem.quat.shape[0]
    C, P = problem.cam_params.shape
    N = problem.points.shape[0]
    Of = problem.obs_xy.shape[0]
    capf = Of // F
    capp = maps.p2f.shape[0] // N
    D = 6 * F + C * P
    dtype = Jp.dtype

    # Per-observation coupling blocks (frame-major flat).
    W = jnp.einsum("ord,ore->ode", Jp, Jx)  # (Of, 6, 3)
    Wc = jnp.einsum("orp,ore->ope", Jc, Jx)  # (Of, P, 3)

    # Point-major layout via ONE wide permutation ([W | Wc] as a flat row —
    # per-row gather cost amortized), then right-multiplied by L_n
    # (Hpp_inv = L L^T).
    L = _chol3x3(Hpp_inv)  # (N, 3, 3)
    comb = jnp.concatenate(
        [W.reshape(Of, 18), Wc.reshape(Of, 3 * P)], axis=1
    )
    comb_pm = _to_pm(comb, maps.p2f, N, capp)  # (N, capp, 18+3P)
    W_pm = comb_pm[..., :18].reshape(N, capp, 6, 3)
    Wc_pm = comb_pm[..., 18:].reshape(N, capp, P, 3)
    T = jnp.einsum("nkde,nef->nkdf", W_pm, L)  # (N, capp, 6, 3)
    Tc = jnp.einsum("nkpe,nef->nkpf", Wc_pm, L)
    # Point-major frame/camera ids are constants of the packing — hoisted
    # into PackedMaps (dummy slots -> 0 with T = 0 rows).
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

    eyeF = jnp.eye(F, dtype=dtype)
    eyeC = jnp.eye(C, dtype=dtype)

    # MXU-native: bf16 operands with f32 accumulation. S entries are
    # O(150k)-term sums, so the f32 accumulator keeps the Schur matrix
    # accurate to ~1e-3 relative — ample for an LM *step* (the gain-ratio
    # test guards against any bad direction).
    qdtype = jnp.bfloat16 if use_bf16 else dtype
    # Contract over the (point, residual-component) dims directly with
    # dot_general — no (B*3, D) reshape, which XLA lowered to a slow
    # layout-change copy of the Q blocks.
    dn = (((0, 1), (0, 1)), ((), ()))

    def chunk_corr(carry, inputs):
        T_ch, Tc_ch, f_ch, c_ch = inputs  # (B, capp, 6/P, 3), (B, capp)
        oh_f = eyeF[f_ch].astype(qdtype)  # (B, capp, F)
        oh_c = eyeC[c_ch].astype(qdtype)  # (B, capp, C)
        # Q blocks: (B, 3, F, 6) + (B, 3, C, P).
        Qp = jnp.einsum("nkf,nkde->nefd", oh_f, T_ch.astype(qdtype))
        Qc = jnp.einsum("nkc,nkpe->necp", oh_c, Tc_ch.astype(qdtype))
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

    # Dense H_cc: pose blocks are frame-diagonal; pose-cam and cam-cam
    # couple through the camera one-hot.
    Jp_fm = Jp.reshape(F, capf, 2, 6)
    Hpp_blocks = jnp.einsum("fkrd,fkre->fde", Jp_fm, Jp_fm)  # (F, 6, 6)
    idx = jnp.arange(F)
    Hcc_pose = jnp.zeros((F, 6, F, 6), dtype)
    Hcc_pose = Hcc_pose.at[idx, :, idx, :].set(Hpp_blocks)
    # Pose-cam coupling: per obs, Jp^T Jc accumulated into (frame, cam).
    cross = jnp.einsum("ord,orp->odp", Jp, Jc)  # (Of, 6, P)
    oh_c_fm = maps.cam_onehot  # (Of, C)
    Hcc_pc = jnp.einsum(
        "odp,oc->odcp", cross, oh_c_fm
    ).reshape(F, capf, 6, C, P).sum(1)  # (F, 6, C, P)
    Hcc_cc = jnp.einsum(
        "orp,oc,orq,oe->cpeq",
        Jc, oh_c_fm, Jc, oh_c_fm,
    )  # (C, P, C, P)
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
