"""Nonlinear relative-pose (essential-matrix) refinement.

reference behavior: the PoseLib-style nonlinear refinement that backs the
reference's two-view estimation (estimators/two_view_geometry.cc pose paths)
— minimize the Sampson error over the 5-dof (R, unit-t) manifold. This is
essential on top of linear solvers: the 8-point algebraic estimate is biased
for narrow-FOV/low-parallax data, while Sampson-GN converges to the ML
estimate in a few iterations. Fully jitted LM over a 5-vector; one program
per (point-count bucket).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rotation as rot
from colmap_tpu.geometry.essential import cross_product_matrix


def _tangent_basis(t):
    """Two unit vectors orthogonal to unit t."""
    # Choose the smallest component axis for stability.
    ref = jnp.where(
        jnp.abs(t[0]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0], t.dtype),
        jnp.asarray([0.0, 1.0, 0.0], t.dtype),
    )
    b1 = jnp.cross(t, ref)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(t, b1)
    return b1, b2


def _sampson_residuals(quat, t, x1, x2):
    E = cross_product_matrix(t) @ rot.quat_to_rotmat(quat)
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = p1 @ E.T
    Etx2 = p2 @ E
    x2tEx1 = jnp.sum(p2 * Ex1, axis=-1)
    denom = jnp.sqrt(
        jnp.maximum(
            Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2,
            1e-30,
        )
    )
    return x2tEx1 / denom


@partial(jax.jit, static_argnames=("num_iterations",))
def refine_relative_pose(quat, t, x1, x2, weights, num_iterations: int = 15):
    """LM on the Sampson error over (R, unit t).

    Args:
        quat: (4,) initial rotation (cam2_from_cam1); t: (3,) translation
        (any scale — normalized internally); x1/x2: (N, 2) normalized
        coordinates; weights: (N,) inlier weights.
    Returns (quat, t_unit, final_rms).
    """
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    def residual_fn(delta, quat, t):
        dq = rot.quat_normalize(
            jnp.concatenate([jnp.ones(1, quat.dtype), 0.5 * delta[:3]])
        )
        q = rot.quat_multiply(dq, quat)
        b1, b2 = _tangent_basis(t)
        tt = t + delta[3] * b1 + delta[4] * b2
        tt = tt / jnp.maximum(jnp.linalg.norm(tt), 1e-12)
        return _sampson_residuals(q, tt, x1, x2) * jnp.sqrt(weights)

    def apply(delta, quat, t):
        dq = rot.quat_normalize(
            jnp.concatenate([jnp.ones(1, quat.dtype), 0.5 * delta[:3]])
        )
        q = rot.quat_normalize(rot.quat_multiply(dq, quat))
        b1, b2 = _tangent_basis(t)
        tt = t + delta[3] * b1 + delta[4] * b2
        tt = tt / jnp.maximum(jnp.linalg.norm(tt), 1e-12)
        return q, tt

    def body(state, _):
        quat, t, lam = state
        zero = jnp.zeros(5, dtype=x1.dtype)
        r = residual_fn(zero, quat, t)
        J = jax.jacfwd(residual_fn)(zero, quat, t)  # (N, 5)
        H = J.T @ J
        g = -J.T @ r
        H_d = H + lam * jnp.diag(jnp.diag(H)) + 1e-12 * jnp.eye(5, dtype=x1.dtype)
        delta = jnp.linalg.solve(H_d, g)
        q_new, t_new = apply(delta, quat, t)
        new_cost = jnp.sum(residual_fn(zero, q_new, t_new) ** 2)
        old_cost = jnp.sum(r**2)
        accept = new_cost < old_cost
        quat = jnp.where(accept, q_new, quat)
        t = jnp.where(accept, t_new, t)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10), jnp.minimum(lam * 5.0, 1e6))
        return (quat, t, lam), None

    lam0 = jnp.asarray(1e-4, dtype=x1.dtype)
    (quat, t, _), _ = jax.lax.scan(body, (quat, t, lam0), None, length=num_iterations)
    r = _sampson_residuals(quat, t, x1, x2)
    w_sum = jnp.maximum(jnp.sum(weights), 1e-12)
    rms = jnp.sqrt(jnp.sum(weights * r * r) / w_sum)
    return quat, t, rms
