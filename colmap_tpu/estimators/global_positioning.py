"""Global positioning: camera centers + points from bearing directions.

reference behavior: src/colmap/estimators/global_positioning.h:33-120 —
BATA-style objective with per-observation scale variables, random
initialization, Huber loss, solved with (GPU) Ceres. TPU-native
reformulation: the per-observation scale is eliminated in closed form
(min over s of |X_p − c_i − s d|² has s* = dᵀ(X_p − c_i)), leaving the
projection-residual r = (I − d dᵀ)(X_p − c_i) which is LINEAR in the
unknowns — so the whole problem is IRLS over a linear least-squares
system, solved matrix-free with point-Schur elimination + CG exactly like
the BA core: segment-sums over observation arrays.

Degenerate gauge: the objective is invariant to translation and scale, and
its unconstrained global optimum is total collapse (scale → 0) — the reason
the reference constrains its per-observation scales positive. Here the
collapse is excluded by a linear scale anchor: one designated observation's
parallel component is pinned, dᵀ(X_p − c_i) = 1, added as a penalized
pseudo-observation inside the same normal equations (still convex/linear).
The 3-DOF translation gauge is fixed by pinning the best-covered camera's
center (masked out of the CG unknowns) — without it the Schur system has an
exact uniform-shift nullspace that float32 CG cannot tolerate.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from colmap_tpu.utils.dtypes import floatx


@dataclasses.dataclass(frozen=True)
class GlobalPositioningOptions:
    max_num_iterations: int = 100  # IRLS rounds
    cg_iterations: int = 100
    huber_scale: float = 0.1
    function_tolerance: float = 1e-10
    seed: int = 0
    init_scale: float = 1.0
    anchor_weight: float = 100.0


@partial(jax.jit, static_argnums=(6, 7, 8))
def _irls_solve(dirs, obs_cam, obs_point, obs_w, state, anchor, num_cams: int,
                num_points: int, options: GlobalPositioningOptions):
    """One IRLS round on the linear projection-residual system.

    state = (centers (C, 3), points (P, 3)).
    anchor = (cam_idx, point_idx, dir (3,)) — scale-gauge pseudo-observation
    with residual √μ (aᵀ(X_p − c_i) − 1).
    """
    centers, points = state
    d = dirs
    a_cam, a_pt, a_dir = anchor
    # Scale-anchor weight relative to the MEAN observation weight: strong
    # enough to pin the 1-DOF scale gauge, small enough to keep Hpp / the
    # Schur system conditioned for float32 (a sum-scaled weight puts the
    # anchor block ~1e5× above the data blocks and f32 CG diverges).
    mu = options.anchor_weight * jnp.mean(obs_w)

    def proj_apply(v):
        return v - d * jnp.sum(d * v, axis=-1, keepdims=True)

    diff = points[obs_point] - centers[obs_cam]
    r = proj_apply(diff)
    rn2 = jnp.sum(r * r, axis=-1)
    a2 = options.huber_scale**2
    w = jnp.where(rn2 <= a2, 1.0, jnp.sqrt(a2 / jnp.maximum(rn2, 1e-30)))
    w = w * obs_w

    def Pw_apply(v, weights):
        return weights[:, None] * proj_apply(v)

    eye = jnp.eye(3, dtype=d.dtype)
    P_blocks = eye[None] - jnp.einsum("oi,oj->oij", d, d)
    Hpp = jax.ops.segment_sum(
        w[:, None, None] * P_blocks, obs_point, num_segments=num_points
    )
    Q = mu * jnp.einsum("i,j->ij", a_dir, a_dir)
    Hpp = Hpp.at[a_pt].add(Q)
    # Relative ridge: keeps 3x3 inverses finite for weakly-observed points
    # at any float width (an absolute 1e-10 is below f32 resolution).
    tr = jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None]
    eps_rel = jnp.asarray(1e-6 if d.dtype == jnp.float32 else 1e-12, d.dtype)
    Hpp = Hpp + (eps_rel * tr / 3.0 + jnp.asarray(1e-30, d.dtype)) * eye[None]
    Hpp_inv = jnp.linalg.inv(Hpp)

    # Translation-gauge fix: pin the anchor camera's center. The projection
    # residuals and the scale anchor are all invariant to a uniform shift of
    # every center+point, so the point-eliminated Schur system has an exact
    # 3-dim nullspace unless one center is held fixed.
    cam_mask = (jnp.arange(num_cams) != a_cam).astype(d.dtype)[:, None]

    # Anchor residual and gradient contributions.
    r_anchor = jnp.dot(a_dir, points[a_pt] - centers[a_cam]) - 1.0
    g_c = jax.ops.segment_sum(Pw_apply(r, w), obs_cam, num_segments=num_cams)
    g_c = g_c.at[a_cam].add(mu * a_dir * r_anchor)
    g_x = -jax.ops.segment_sum(Pw_apply(r, w), obs_point, num_segments=num_points)
    g_x = g_x.at[a_pt].add(-mu * a_dir * r_anchor)

    def Hcc_apply(xc):
        u = Pw_apply(xc[obs_cam], w)
        out = jax.ops.segment_sum(u, obs_cam, num_segments=num_cams)
        out = out.at[a_cam].add(Q @ xc[a_cam])
        return out

    def Hpc_apply(xc):
        """(P, 3) result of H_pc xc (point rows, camera cols)."""
        u = Pw_apply(xc[obs_cam], w)
        out = -jax.ops.segment_sum(u, obs_point, num_segments=num_points)
        out = out.at[a_pt].add(-(Q @ xc[a_cam]))
        return out

    def Hcp_apply(y):
        """(C, 3) result of H_cp y (camera rows, point cols)."""
        v = Pw_apply(y[obs_point], w)
        out = -jax.ops.segment_sum(v, obs_cam, num_segments=num_cams)
        out = out.at[a_cam].add(-(Q @ y[a_pt]))
        return out

    def schur_matvec(xc):
        xc = xc * cam_mask
        hcc = Hcc_apply(xc)
        hpc = Hpc_apply(xc)
        y = jnp.einsum("pij,pj->pi", Hpp_inv, hpc)
        return (hcc - Hcp_apply(y)) * cam_mask + (1.0 - cam_mask) * xc

    y0 = jnp.einsum("pij,pj->pi", Hpp_inv, g_x)
    b = (g_c - Hcp_apply(y0)) * cam_mask

    diag_c = jax.ops.segment_sum(
        w[:, None] * (1.0 - d * d), obs_cam, num_segments=num_cams
    )
    diag_c = diag_c.at[a_cam].add(mu * a_dir * a_dir)
    M = 1.0 / (diag_c + eps_rel * jnp.mean(diag_c) + jnp.asarray(1e-30, d.dtype))

    xc = jnp.zeros_like(b)
    rr = b
    z = M * rr
    p = z
    rz = jnp.sum(rr * z)
    rz0 = rz

    def body(_, st):
        xc, rr, p, rz = st
        # Freeze once converged: continued f32 CG past convergence breaks
        # down (beta from tiny rz) and reintroduces noise.
        live = (rz > 1e-12 * rz0).astype(rr.dtype)
        Ap = schur_matvec(p)
        alpha = live * rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        xc = xc + alpha * p
        rr = rr - alpha * Ap
        z = M * rr
        rz_new = jnp.sum(rr * z)
        beta = live * rz_new / jnp.maximum(rz, 1e-30)
        p = live * (z + beta * p) + (1.0 - live) * p
        rz = live * rz_new + (1.0 - live) * rz
        return xc, rr, p, rz

    xc, _, _, _ = jax.lax.fori_loop(0, options.cg_iterations, body, (xc, rr, p, rz))
    xc = xc * cam_mask

    dx = jnp.einsum("pij,pj->pi", Hpp_inv, g_x - Hpc_apply(xc))

    new_centers = centers + xc
    new_points = points + dx
    huber_cost = jnp.where(
        rn2 <= a2, rn2,
        2 * options.huber_scale * jnp.sqrt(jnp.maximum(rn2, 0.0)) - a2,
    )
    cost = jnp.sum(huber_cost * obs_w)
    return (new_centers, new_points), cost


def solve_global_positioning(
    num_cams: int,
    num_points: int,
    obs_cam: np.ndarray,
    obs_point: np.ndarray,
    dirs_world: np.ndarray,
    obs_w: Optional[np.ndarray] = None,
    options: Optional[GlobalPositioningOptions] = None,
    init_centers: Optional[np.ndarray] = None,
    init_points: Optional[np.ndarray] = None,
    dtype=floatx(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Estimate camera centers and points from world-frame bearings.

    dirs_world: (O, 3) unit vectors from camera center toward the point
    (already rotated into the world frame). The returned solution fixes the
    similarity gauge by the internal scale anchor; align afterwards as
    needed.
    """
    if options is None:
        options = GlobalPositioningOptions()
    rng = np.random.default_rng(options.seed)
    if init_centers is None:
        init_centers = options.init_scale * rng.standard_normal((num_cams, 3))
    if init_points is None:
        init_points = options.init_scale * rng.standard_normal((num_points, 3))
    if obs_w is None:
        obs_w = np.ones(len(obs_cam))

    d = np.asarray(dirs_world, dtype=np.float64)
    d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-30)

    state = (
        jnp.asarray(init_centers, dtype=dtype),
        jnp.asarray(init_points, dtype=dtype),
    )
    dirs = jnp.asarray(d, dtype=dtype)
    oc = jnp.asarray(np.asarray(obs_cam, dtype=np.int32))
    op = jnp.asarray(np.asarray(obs_point, dtype=np.int32))
    ow = jnp.asarray(np.asarray(obs_w), dtype=dtype)
    # Scale anchor: the first observation of the best-covered camera.
    counts = np.bincount(np.asarray(obs_cam), minlength=num_cams)
    best_cam = int(np.argmax(counts))
    anchor_obs = int(np.nonzero(np.asarray(obs_cam) == best_cam)[0][0])
    anchor = (
        jnp.asarray(int(obs_cam[anchor_obs])),
        jnp.asarray(int(obs_point[anchor_obs])),
        dirs[anchor_obs],
    )

    prev = np.inf
    for it in range(options.max_num_iterations):
        state, cost = _irls_solve(
            dirs, oc, op, ow, state, anchor, num_cams, num_points, options
        )
        c = float(cost)
        if abs(prev - c) < options.function_tolerance * max(c, 1e-12):
            break
        prev = c
    return np.asarray(state[0]), np.asarray(state[1])
