"""Global rotation averaging (L1-IRLS, Chatterjee-style).

reference behavior: src/colmap/estimators/rotation_averaging.h:25-102 —
maximum-spanning-tree initialization, an L1 phase, then IRLS with robust
weights, solving a 3N tangent-space linear system each iteration. The
reference factorizes with sparse Cholesky (optim/sparse_cholesky.h); here
the graph-Laplacian normal equations are solved matrix-free with conjugate
gradients — the matvec is two segment-sums over the edge arrays, which is
the TPU-native form (no sparse factorization exists on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.geometry import rotation as rot


@dataclasses.dataclass
class RotationAveragingOptions:
    max_num_l1_iterations: int = 5
    max_num_irls_iterations: int = 50
    irls_loss_width: float = np.deg2rad(5.0)  # Geman-McClure width
    cg_iterations: int = 50
    function_tolerance: float = 1e-8
    # Gravity-stratified mode (reference: rotation_averaging.h:25-102):
    # frames with a gravity prior keep only the 1-DOF yaw about the world
    # gravity axis. With this solver's right-multiplicative world-frame
    # tangent updates the stratification is exact: the constraint
    # R Exp(δ̂) g_w = g_cam reduces to δ ∈ span(g_w), a per-node projector
    # inside the same CG solve — no separate stratified solver needed.
    use_gravity: bool = True


def spanning_tree_init(num_nodes: int, edges: np.ndarray, rel_quats: np.ndarray,
                       weights: np.ndarray) -> np.ndarray:
    """Maximum-spanning-tree rotation initialization.

    edges: (E, 2) [i, j] with rel quats q_ij = R_j ∘ R_i⁻¹ convention.
    Returns (N, 4) quats with node of the largest component at identity.
    """
    order = np.argsort(-np.asarray(weights))
    parent = np.arange(num_nodes)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    adj: Dict[int, List[Tuple[int, int, bool]]] = {i: [] for i in range(num_nodes)}
    for e in order:
        i, j = int(edges[e, 0]), int(edges[e, 1])
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
            adj[i].append((j, e, True))   # forward: q_j = q_ij ⊗ q_i
            adj[j].append((i, e, False))  # backward
    quats = np.tile(np.array([1.0, 0, 0, 0]), (num_nodes, 1))
    visited = np.zeros(num_nodes, dtype=bool)
    # BFS from node 0 (and any other components).
    import collections

    for root in range(num_nodes):
        if visited[root]:
            continue
        visited[root] = True
        dq = collections.deque([root])
        while dq:
            i = dq.popleft()
            for (j, e, fwd) in adj[i]:
                if visited[j]:
                    continue
                visited[j] = True
                q_ij = rel_quats[e]
                if fwd:
                    q_j = np.asarray(
                        rot.quat_multiply(jnp.asarray(q_ij), jnp.asarray(quats[i]))
                    )
                else:
                    q_inv = q_ij * np.array([1.0, -1, -1, -1])
                    q_j = np.asarray(
                        rot.quat_multiply(jnp.asarray(q_inv), jnp.asarray(quats[i]))
                    )
                quats[j] = q_j / np.linalg.norm(q_j)
                dq.append(j)
    return quats


def _quat_log(q):
    """Unit quaternion -> so(3) tangent (..., 3)."""
    q = rot.quat_normalize(q)
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn[..., 0], w)
    scale = jnp.where(vn[..., 0] > 1e-12, angle / jnp.maximum(vn[..., 0], 1e-30), 2.0)
    return v * scale[..., None]


def _quat_exp(w):
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    half = 0.5 * theta
    sinc = jnp.where(theta > 1e-12, jnp.sin(half) / jnp.maximum(theta, 1e-30), 0.5)
    return jnp.concatenate([jnp.cos(half), sinc * w], axis=-1)


def _edge_residuals(quats, edges, rel_quats):
    """r_e = Log(q_rel ⊗ q_i ⊗ q_j⁻¹) — zero when consistent."""
    qi = quats[edges[:, 0]]
    qj = quats[edges[:, 1]]
    pred = rot.quat_multiply(rel_quats, qi)  # predicted q_j
    err = rot.quat_multiply(pred, rot.quat_conjugate(rot.quat_normalize(qj)))
    return _quat_log(err)


def _solve_tangent_cg(edges, r, w, num_nodes, free_mask, iterations,
                      proj=None):
    """Solve min Σ_e w_e |δ_j - δ_i - r_e|² by CG on the weighted Laplacian.

    free_mask: (N,) 1.0 for free nodes, 0 pins the gauge. proj: optional
    (N, 3, 3) per-node tangent projectors (gravity stratification: rank-1
    ĝĝᵀ for gravity-aligned nodes, identity otherwise). Returns (N, 3).
    """
    i_idx = edges[:, 0]
    j_idx = edges[:, 1]

    def constrain(x):
        x = x * free_mask[:, None]
        if proj is not None:
            x = jnp.einsum("nde,ne->nd", proj, x)
        return x

    def matvec(x):
        # A x where A = Lᵀ W L with L the incidence operator.
        d = (x[j_idx] - x[i_idx]) * w[:, None]
        out = jax.ops.segment_sum(d, j_idx, num_segments=num_nodes)
        out -= jax.ops.segment_sum(d, i_idx, num_segments=num_nodes)
        return constrain(out)

    b = jax.ops.segment_sum(r * w[:, None], j_idx, num_segments=num_nodes)
    b -= jax.ops.segment_sum(r * w[:, None], i_idx, num_segments=num_nodes)
    b = constrain(b)

    deg = jax.ops.segment_sum(w, i_idx, num_segments=num_nodes)
    deg += jax.ops.segment_sum(w, j_idx, num_segments=num_nodes)
    M = jnp.where(deg > 1e-12, 1.0 / deg, 0.0)[:, None]

    x = jnp.zeros_like(b)
    rr = b
    z = M * rr
    p = z
    rz = jnp.sum(rr * z)

    def body(_, state):
        x, rr, p, rz = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = M * rr
        rz_new = jnp.sum(rr * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, rr, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iterations, body, (x, rr, p, rz))
    return x


def _align_quat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Minimal rotation (quat) taking direction a to direction b."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    c = np.cross(a, b)
    w = 1.0 + float(np.dot(a, b))
    if w < 1e-9:  # antiparallel: rotate pi about any orthogonal axis
        ortho = np.array([-a[1] - a[2], a[0], a[0]])
        q = np.concatenate([[0.0], ortho])
    else:
        q = np.concatenate([[w], c])
    return q / np.linalg.norm(q)


def _snap_to_gravity(quats: np.ndarray, gravity_cam: np.ndarray,
                     g_world: np.ndarray) -> np.ndarray:
    """Project initial rotations onto the gravity-constraint manifold:
    for each node with a measured camera-frame gravity g_i, replace q by
    the closest rotation with R g_world = g_i (keep the yaw of q)."""
    out = quats.copy()
    for i in range(len(quats)):
        g = gravity_cam[i]
        if not np.all(np.isfinite(g)):
            continue
        # R0: any rotation taking g_world to g_i.
        q0 = _align_quat(g_world, g)
        # Residual R0^-1 R — keep only its rotation about g_world.
        q0_inv = q0 * np.array([1.0, -1, -1, -1])
        qr = np.asarray(rot.quat_multiply(jnp.asarray(q0_inv), jnp.asarray(quats[i])))
        qr = qr / np.linalg.norm(qr)
        v = qr[1:]
        # Yaw about g_world closest to qr: project the vector part.
        proj = np.dot(v, g_world) * g_world
        qy = np.concatenate([[qr[0]], proj])
        n = np.linalg.norm(qy)
        qy = qy / n if n > 1e-12 else np.array([1.0, 0, 0, 0])
        q = np.asarray(rot.quat_multiply(jnp.asarray(q0), jnp.asarray(qy)))
        out[i] = q / np.linalg.norm(q)
    return out


def estimate_rotations(
    num_nodes: int,
    edges: np.ndarray,
    rel_quats: np.ndarray,
    edge_weights: Optional[np.ndarray] = None,
    fixed_nodes: Optional[List[int]] = None,
    options: Optional[RotationAveragingOptions] = None,
    initial_quats: Optional[np.ndarray] = None,
    gravity_cam: Optional[np.ndarray] = None,
    gravity_in_world: Tuple[float, float, float] = (0.0, 1.0, 0.0),
) -> np.ndarray:
    """Estimate absolute rotations (cam_from_world) from relative rotations.

    edges: (E, 2) [i, j]; rel_quats: (E, 4) with q_j = q_rel ⊗ q_i.
    gravity_cam: optional (N, 3) measured gravity direction in each camera
    frame (NaN rows = no prior) — enables the 1-DOF stratified mode
    (reference: rotation_averaging.h:25-102).
    Returns (N, 4) quats (node 0 of each component gauge-fixed unless
    fixed_nodes given).
    """
    if options is None:
        options = RotationAveragingOptions()
    edges = np.asarray(edges, dtype=np.int32)
    rel_quats_np = np.asarray(rel_quats, dtype=np.float64)
    if edge_weights is None:
        edge_weights = np.ones(len(edges))
    if initial_quats is None:
        initial_quats = spanning_tree_init(num_nodes, edges, rel_quats_np, edge_weights)

    proj = None
    g_world = np.asarray(gravity_in_world, dtype=np.float64)
    g_world = g_world / np.linalg.norm(g_world)
    if options.use_gravity and gravity_cam is not None:
        gravity_cam = np.asarray(gravity_cam, dtype=np.float64)
        has_g = np.all(np.isfinite(gravity_cam), axis=1)
        if has_g.any():
            initial_quats = _snap_to_gravity(
                np.asarray(initial_quats), gravity_cam, g_world
            )
            P = np.tile(np.eye(3), (num_nodes, 1, 1))
            P[has_g] = np.outer(g_world, g_world)
            proj = jnp.asarray(P)

    quats = jnp.asarray(initial_quats)
    e = jnp.asarray(edges)
    rq = jnp.asarray(rel_quats_np)
    free = np.ones(num_nodes)
    if fixed_nodes:
        for n in fixed_nodes:
            free[n] = 0.0
    else:
        free[0] = 0.0
    free = jnp.asarray(free)

    sigma = options.irls_loss_width

    @jax.jit
    def iteration(quats, use_l1):
        r = _edge_residuals(quats, e, rq)
        rn = jnp.linalg.norm(r, axis=-1)
        # Rotate residuals into the world frame: with right-multiplicative
        # updates q ← q ⊗ exp(δ), the edge equation becomes exactly
        # δ_j − δ_i = R_jᵀ r (no adjoint approximation needed).
        qj = quats[e[:, 1]]
        r_world = rot.quat_rotate(rot.quat_conjugate(rot.quat_normalize(qj)), r)
        # L1 weights 1/|r|; IRLS Geman-McClure weights sigma²/(r²+sigma²)².
        w_l1 = 1.0 / jnp.maximum(rn, 1e-5)
        gm = sigma**2 / (rn**2 + sigma**2) ** 2
        w = jnp.where(use_l1, w_l1, gm)
        delta = _solve_tangent_cg(e, r_world, w, num_nodes, free,
                                  options.cg_iterations, proj=proj)
        new_quats = rot.quat_normalize(rot.quat_multiply(quats, _quat_exp(delta)))
        return new_quats, jnp.sum(rn)

    prev_cost = np.inf
    for it in range(options.max_num_l1_iterations):
        quats, cost = iteration(quats, jnp.asarray(True))
    for it in range(options.max_num_irls_iterations):
        quats, cost = iteration(quats, jnp.asarray(False))
        c = float(cost)
        if abs(prev_cost - c) < options.function_tolerance * max(c, 1.0):
            break
        prev_cost = c
    return np.asarray(quats)
