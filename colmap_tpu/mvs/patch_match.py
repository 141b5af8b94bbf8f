"""PatchMatch multi-view stereo: checkerboard propagation in JAX.

reference behavior: src/colmap/mvs/patch_match_cuda.cu — per-reference-image
depth+normal estimation with random initialization, plane hypothesis
propagation, bilaterally-weighted NCC photoconsistency over source views,
and an optional geometric-consistency pass (:601). The CUDA kernel sweeps
rows sequentially (:938, wavefront parallel); the TPU-native design instead
uses red-black checkerboard updates (SURVEY §2.9 P6): all pixels of one
color propagate from the other color simultaneously, turning each iteration
into a handful of fused dense array ops over the whole depth map — the same
convergence class as Gipuma-style checkerboard PatchMatch.

Plane model per pixel: depth d plus unit normal n (camera frame, facing the
camera). A neighbor's plane is propagated by intersecting this pixel's ray
with the neighbor's plane; costs are NCC over a square window warped by the
local plane homography into each source view.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PatchMatchOptions:
    """reference: mvs/patch_match.h:55-96 (options subset)."""

    window_radius: int = 2  # 5x5 window
    window_step: int = 1
    num_iterations: int = 5
    num_samples: int = 8  # hypotheses per pixel per iteration
    sigma_spatial: float = 3.0
    sigma_color: float = 0.2
    depth_min: float = 0.1
    depth_max: float = 100.0
    ncc_sigma: float = 0.6
    min_triangulation_angle_deg: float = 1.0
    geom_consistency_weight: float = 0.3
    geom_consistency_max_cost: float = 3.0
    filter_min_ncc: float = 0.1
    filter_min_num_consistent: int = 2
    filter_geom_consistency_max_cost: float = 1.0


class PatchMatchProblem(NamedTuple):
    """Arrays for one reference image and its source views."""

    ref_image: jnp.ndarray  # (H, W) grayscale [0, 1]
    src_images: jnp.ndarray  # (S, H, W)
    K_ref: jnp.ndarray  # (3, 3)
    K_src: jnp.ndarray  # (S, 3, 3)
    # Relative transforms: x_src = R x_ref + t.
    R_rel: jnp.ndarray  # (S, 3, 3)
    t_rel: jnp.ndarray  # (S, 3)
    # Source depth maps from a previous photometric pass; enables the
    # geometric-consistency term (reference: patch_match_cuda.cu:601
    # ComputeGeomConsistencyCost). None = photometric-only.
    src_depths: Optional[jnp.ndarray] = None  # (S, H, W)


def _bilinear(img, y, x):
    H, W = img.shape
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx) + v11 * fy * fx
    )


def _plane_depth_at(d0, n, Kinv_ray0, Kinv_ray):
    """Depth along ray Kinv_ray of the plane through d0*Kinv_ray0 with
    normal n: d = d0 (nᵀ r0) / (nᵀ r)."""
    num = d0 * jnp.sum(n * Kinv_ray0, axis=-1)
    den = jnp.sum(n * Kinv_ray, axis=-1)
    return num / jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)


@partial(jax.jit, static_argnums=(3,))
def _compute_cost(problem: PatchMatchProblem, depth, normal, options: PatchMatchOptions):
    """Aggregated photometric cost (H, W) for per-pixel plane hypotheses.

    Bilaterally-weighted NCC per source view
    (reference: PhotoConsistencyCostComputer, patch_match_cuda.cu:448-599),
    aggregated as the mean over the best half of the source views (stand-in
    for the reference's message-passing pixelwise view selection).
    """
    H, W = problem.ref_image.shape
    S = problem.src_images.shape[0]
    R = options.window_radius
    step = options.window_step
    dtype = depth.dtype

    ys = jnp.arange(H, dtype=dtype)
    xs = jnp.arange(W, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    Kinv = jnp.linalg.inv(problem.K_ref)

    def ray(y, x):
        p = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return jnp.einsum("ij,...j->...i", Kinv, p)

    ray0 = ray(gy, gx)  # (H, W, 3)

    offsets = [
        (dy, dx)
        for dy in range(-R, R + 1, step)
        for dx in range(-R, R + 1, step)
    ]
    n_off = len(offsets)

    # Reference window samples + bilateral weights.
    ref_center = problem.ref_image
    ref_samples = []
    weights = []
    for (dy, dx) in offsets:
        ry = jnp.clip(gy + dy, 0, H - 1)
        rx = jnp.clip(gx + dx, 0, W - 1)
        val = _bilinear(problem.ref_image, ry, rx)
        ref_samples.append(val)
        w_sp = np.exp(-(dy * dy + dx * dx) / (2 * options.sigma_spatial**2))
        w_col = jnp.exp(
            -((val - ref_center) ** 2) / (2 * options.sigma_color**2)
        )
        weights.append(w_sp * w_col)
    ref_stack = jnp.stack(ref_samples)  # (K, H, W)
    w_stack = jnp.stack(weights)
    w_sum = jnp.sum(w_stack, axis=0) + 1e-8

    # For each window offset: plane-induced depth then projection per src.
    costs = []
    for s in range(S):
        Rr = problem.R_rel[s]
        tr = problem.t_rel[s]
        Ks = problem.K_src[s]
        src = problem.src_images[s]

        src_samples = []
        for (dy, dx), ref_val in zip(offsets, ref_samples):
            py = gy + dy
            px = gx + dx
            r = ray(py, px)
            d = _plane_depth_at(depth, normal, ray0, r)
            X = r * d[..., None]
            Xs = jnp.einsum("ij,...j->...i", Rr, X) + tr
            ps = jnp.einsum("ij,...j->...i", Ks, Xs)
            z = jnp.where(jnp.abs(ps[..., 2]) < 1e-8, 1e-8, ps[..., 2])
            sx = ps[..., 0] / z
            sy = ps[..., 1] / z
            inb = (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1) & (ps[..., 2] > 0)
            val = _bilinear(src, jnp.clip(sy, 0, H - 1), jnp.clip(sx, 0, W - 1))
            src_samples.append(jnp.where(inb, val, jnp.nan))
        src_stack = jnp.stack(src_samples)  # (K, H, W)

        ok = jnp.isfinite(src_stack)
        w_eff = jnp.where(ok, w_stack, 0.0)
        w_eff_sum = jnp.sum(w_eff, axis=0) + 1e-8
        src_f = jnp.where(ok, src_stack, 0.0)
        # Weighted NCC.
        mu_r = jnp.sum(w_eff * ref_stack, axis=0) / w_eff_sum
        mu_s = jnp.sum(w_eff * src_f, axis=0) / w_eff_sum
        var_r = jnp.sum(w_eff * (ref_stack - mu_r) ** 2, axis=0) / w_eff_sum
        var_s = jnp.sum(w_eff * (src_f - mu_s) ** 2, axis=0) / w_eff_sum
        cov = jnp.sum(w_eff * (ref_stack - mu_r) * (src_f - mu_s), axis=0) / w_eff_sum
        ncc = cov / jnp.sqrt(jnp.maximum(var_r * var_s, 1e-10))
        frac_valid = jnp.sum(w_eff, axis=0) / w_sum
        cost = 1.0 - jnp.clip(ncc, -1.0, 1.0)
        cost = jnp.where(frac_valid > 0.5, cost, 2.0)

        if problem.src_depths is not None:
            # Geometric consistency: forward-backward reprojection error of
            # the center pixel through the source view's own depth map
            # (reference: ComputeGeomConsistencyCost, patch_match_cuda.cu:601).
            X = ray0 * depth[..., None]
            Xs = jnp.einsum("ij,...j->...i", Rr, X) + tr
            ps = jnp.einsum("ij,...j->...i", Ks, Xs)
            z = jnp.where(jnp.abs(ps[..., 2]) < 1e-8, 1e-8, ps[..., 2])
            sx = ps[..., 0] / z
            sy = ps[..., 1] / z
            inb = (
                (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1)
                & (ps[..., 2] > 0)
            )
            d_src = _bilinear(
                problem.src_depths[s],
                jnp.clip(sy, 0, H - 1), jnp.clip(sx, 0, W - 1),
            )
            Kinv_s = jnp.linalg.inv(Ks)
            p_src = jnp.stack([sx, sy, jnp.ones_like(sx)], axis=-1)
            X_src = jnp.einsum("ij,...j->...i", Kinv_s, p_src) * d_src[..., None]
            X_back = jnp.einsum("ji,...j->...i", Rr, X_src - tr)
            p_back = jnp.einsum("ij,...j->...i", problem.K_ref, X_back)
            zb = jnp.where(jnp.abs(p_back[..., 2]) < 1e-8, 1e-8, p_back[..., 2])
            bx = p_back[..., 0] / zb
            by = p_back[..., 1] / zb
            err = jnp.sqrt((bx - gx) ** 2 + (by - gy) ** 2)
            geom_ok = inb & (d_src > 0) & (p_back[..., 2] > 0)
            geom_cost = jnp.where(
                geom_ok,
                jnp.minimum(err, options.geom_consistency_max_cost),
                options.geom_consistency_max_cost,
            )
            cost = cost + options.geom_consistency_weight * geom_cost

        costs.append(cost)

    cost_all = jnp.stack(costs)  # (S, H, W)
    # Best-half aggregation over source views.
    k = max(1, S // 2)
    topk = -jax.lax.top_k(-jnp.moveaxis(cost_all, 0, -1), k)[0]
    return jnp.mean(topk, axis=-1), cost_all


def _random_normals(key, shape, dtype):
    """Random unit normals facing the camera (nz < 0)."""
    v = jax.random.normal(key, shape + (3,), dtype=dtype)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    nz = -jnp.abs(v[..., 2])
    return jnp.concatenate([v[..., :2], nz[..., None]], axis=-1)


@partial(jax.jit, static_argnums=(2,))
def _pm_iteration(problem, state, options: PatchMatchOptions, key, parity):
    """One red-black half-iteration: pixels with (y+x)%2 == parity update
    from propagated neighbor planes + random refinements."""
    depth, normal, cost = state
    H, W = depth.shape
    dtype = depth.dtype
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    active = (gy + gx) % 2 == parity

    Kinv = jnp.linalg.inv(problem.K_ref)
    p_h = jnp.stack([gx.astype(dtype), gy.astype(dtype), jnp.ones((H, W), dtype)], axis=-1)
    ray0 = jnp.einsum("ij,...j->...i", Kinv, p_h)

    candidates = []
    # 1) Neighbor propagation (4-neighborhood): intersect own ray with the
    # neighbor's plane.
    for (dy, dx) in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nd = jnp.roll(depth, (-dy, -dx), axis=(0, 1))
        nn = jnp.roll(normal, (-dy, -dx), axis=(0, 1))
        # Neighbor ray (at the neighbor's own pixel).
        n_ray = jnp.roll(ray0, (-dy, -dx), axis=(0, 1))
        d_prop = _plane_depth_at(nd, nn, n_ray, ray0)
        d_prop = jnp.clip(d_prop, options.depth_min, options.depth_max)
        candidates.append((d_prop, nn))
    # 2) Random re-sampling + perturbation.
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d_rand = jax.random.uniform(
        k1, (H, W), dtype, options.depth_min, options.depth_max
    )
    n_rand = _random_normals(k2, (H, W), dtype)
    candidates.append((d_rand, n_rand))
    # Perturbed depth (half/double interval shrink).
    pert = 1.0 + 0.1 * jax.random.normal(k3, (H, W), dtype)
    candidates.append((jnp.clip(depth * pert, options.depth_min, options.depth_max), normal))
    # Perturbed normal.
    n_pert = normal + 0.2 * jax.random.normal(k4, (H, W, 3), dtype)
    n_pert = n_pert / jnp.maximum(jnp.linalg.norm(n_pert, axis=-1, keepdims=True), 1e-8)
    n_pert = n_pert.at[..., 2].set(-jnp.abs(n_pert[..., 2]))
    candidates.append((depth, n_pert))

    best_depth, best_normal, best_cost = depth, normal, cost
    for (d_c, n_c) in candidates:
        c_c, _ = _compute_cost(problem, d_c, n_c, options)
        better = (c_c < best_cost) & active
        best_depth = jnp.where(better, d_c, best_depth)
        best_normal = jnp.where(better[..., None], n_c, best_normal)
        best_cost = jnp.where(better, c_c, best_cost)
    return best_depth, best_normal, best_cost


def patch_match(
    problem: PatchMatchProblem,
    options: Optional[PatchMatchOptions] = None,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Estimate (depth, normal, cost) maps for the reference image."""
    if options is None:
        options = PatchMatchOptions()
    H, W = problem.ref_image.shape
    dtype = problem.ref_image.dtype
    key = jax.random.PRNGKey(seed)
    k0, k1, key = jax.random.split(key, 3)
    depth = jax.random.uniform(k0, (H, W), dtype, options.depth_min, options.depth_max)
    normal = _random_normals(k1, (H, W), dtype)
    cost, _ = _compute_cost(problem, depth, normal, options)
    state = (depth, normal, cost)
    for it in range(options.num_iterations):
        for parity in (0, 1):
            key, sub = jax.random.split(key)
            state = _pm_iteration(problem, state, options, sub, parity)
    depth, normal, cost = state
    return np.asarray(depth), np.asarray(normal), np.asarray(cost)


def filter_depth_map(depth, cost, options: PatchMatchOptions):
    """Photometric filtering: mask out high-cost estimates
    (reference: patch_match_cuda filtering by min_ncc)."""
    ncc = 1.0 - cost
    mask = ncc >= options.filter_min_ncc
    return np.where(mask, depth, 0.0), mask
