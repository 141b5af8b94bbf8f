"""Brute-force descriptor matching on the MXU.

reference behavior: src/colmap/feature/matcher.{h,cc} (SIFT brute-force:
similarity = dot products of normalized descriptors, ratio test on arccos
"angle distances", cross check, max_distance 0.7 rad, max_ratio 0.8,
max_num_matches 32768) and guided matching via the epipolar constraint
(matcher.h:129 MatchGuided).

TPU-first: one (padded) D1 · D2ᵀ uint8->f32 matmul per pair feeds the MXU;
best/second-best, ratio, cross-check and the epipolar mask are fused
elementwise ops on the similarity matrix. Pairs batch by vmapping at fixed
feature capacity.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MatchingOptions:
    """reference: feature/matcher.h:60-90 (SiftMatchingOptions)."""

    max_ratio: float = 0.8
    max_distance: float = 0.7  # radians of descriptor angle
    cross_check: bool = True
    max_num_matches: int = 32768
    guided_max_error: float = 4.0  # px epipolar distance for guided matching


def _normalize_desc(d):
    d = d.astype(jnp.float32)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def _best_two(sim):
    """(best, second-best, argmax) per row via two VPU max passes."""
    idx = jnp.argmax(sim, axis=1)
    best = jnp.take_along_axis(sim, idx[:, None], axis=1)[:, 0]
    cols = jnp.arange(sim.shape[1])
    masked = jnp.where(cols[None, :] == idx[:, None], -jnp.inf, sim)
    second = jnp.max(masked, axis=1)
    return best, second, idx


@partial(jax.jit, static_argnames=("options",))
def match_similarity(
    d1, d2, mask1, mask2, options: MatchingOptions = MatchingOptions()
):
    """Compute match indices between two padded descriptor sets.

    d1: (N, 128) uint8; d2: (M, 128) uint8; mask1/mask2 valid-row masks.
    Returns (idx2_for_each_1 (N,), valid (N,)) after ratio/distance/cross
    checks — the canonical "best match per left feature" form.
    """
    n1 = _normalize_desc(d1)
    n2 = _normalize_desc(d2)
    sim = n1 @ n2.T  # (N, M) on the MXU
    neg = -jnp.inf
    sim = jnp.where(mask1[:, None] & mask2[None, :], sim, neg)

    # Best and second best per row. Two max passes instead of
    # jax.lax.top_k(sim, 2): XLA:TPU lowers top_k to a full row sort of the
    # (N, M) similarity matrix, which dominates the whole matcher.
    best_sim, second_sim, idx2 = _best_two(sim)

    # Angle distances (arccos of similarity), as the reference's
    # FindBestMatchesOneWay.
    dist_best = jnp.arccos(jnp.clip(best_sim, -1.0, 1.0))
    dist_second = jnp.arccos(jnp.clip(second_sim, -1.0, 1.0))
    ok = jnp.isfinite(best_sim)
    ok &= dist_best <= options.max_distance
    ok &= dist_best <= options.max_ratio * dist_second

    if options.cross_check:
        # Best per column.
        best_idx1 = jnp.argmax(sim, axis=0)  # (M,)
        ok &= jnp.take(best_idx1, idx2) == jnp.arange(sim.shape[0])
    ok &= mask1
    return idx2, ok


def match_descriptors(
    d1: np.ndarray, d2: np.ndarray, options: MatchingOptions = MatchingOptions()
) -> np.ndarray:
    """Host wrapper: (N, 128) x (M, 128) uint8 -> (K, 2) uint32 matches."""
    if len(d1) == 0 or len(d2) == 0:
        return np.zeros((0, 2), dtype=np.uint32)
    idx2, ok = match_similarity(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.ones(len(d1), dtype=bool), jnp.ones(len(d2), dtype=bool),
        options,
    )
    ok = np.asarray(ok)
    idx1 = np.nonzero(ok)[0]
    matches = np.stack([idx1, np.asarray(idx2)[idx1]], axis=1).astype(np.uint32)
    if len(matches) > options.max_num_matches:
        matches = matches[: options.max_num_matches]
    return matches


@partial(jax.jit, static_argnames=("options",))
def match_guided_similarity(
    d1, d2, xy1, xy2, F, mask1, mask2,
    options: MatchingOptions = MatchingOptions(),
):
    """Guided matching: like match_similarity but candidates must satisfy
    the epipolar constraint |x2ᵀ F x1| distance <= guided_max_error px.

    reference behavior: FeatureMatcher::MatchGuided (matcher.cc) — re-runs
    matching with the geometric mask after two-view verification.
    """
    n1 = _normalize_desc(d1)
    n2 = _normalize_desc(d2)
    sim = n1 @ n2.T
    ones1 = jnp.ones_like(xy1[:, :1])
    ones2 = jnp.ones_like(xy2[:, :1])
    p1 = jnp.concatenate([xy1, ones1], axis=1)  # (N, 3)
    p2 = jnp.concatenate([xy2, ones2], axis=1)  # (M, 3)
    Fx1 = p1 @ F.T  # lines in image 2: (N, 3)
    Ftx2 = p2 @ F  # lines in image 1: (M, 3)
    # Symmetric epipolar distances.
    num = jnp.abs(jnp.einsum("mi,ni->nm", p2, Fx1))  # (N, M)
    d_2 = num / jnp.maximum(
        jnp.sqrt(Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2)[:, None], 1e-12
    )
    d_1 = num / jnp.maximum(
        jnp.sqrt(Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2)[None, :], 1e-12
    )
    geo_ok = (d_1 <= options.guided_max_error) & (d_2 <= options.guided_max_error)
    sim = jnp.where(
        geo_ok & mask1[:, None] & mask2[None, :], sim, -jnp.inf
    )
    best_sim, second_sim, idx2 = _best_two(sim)
    dist_best = jnp.arccos(jnp.clip(best_sim, -1.0, 1.0))
    dist_second = jnp.arccos(jnp.clip(second_sim, -1.0, 1.0))
    ok = jnp.isfinite(best_sim)
    ok &= dist_best <= options.max_distance
    ok &= dist_best <= options.max_ratio * dist_second
    if options.cross_check:
        best_idx1 = jnp.argmax(sim, axis=0)
        ok &= jnp.take(best_idx1, idx2) == jnp.arange(sim.shape[0])
    ok &= mask1
    return idx2, ok


def match_guided(
    d1, d2, xy1, xy2, F, options: MatchingOptions = MatchingOptions()
) -> np.ndarray:
    if len(d1) == 0 or len(d2) == 0:
        return np.zeros((0, 2), dtype=np.uint32)
    idx2, ok = match_guided_similarity(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.asarray(xy1, dtype=jnp.float32), jnp.asarray(xy2, dtype=jnp.float32),
        jnp.asarray(F, dtype=jnp.float32),
        jnp.ones(len(d1), dtype=bool), jnp.ones(len(d2), dtype=bool),
        options,
    )
    ok = np.asarray(ok)
    idx1 = np.nonzero(ok)[0]
    return np.stack([idx1, np.asarray(idx2)[idx1]], axis=1).astype(np.uint32)


def match_pairs_batched(
    descriptors: list, pair_idxs: np.ndarray, capacity: int = 8192,
    options: MatchingOptions = MatchingOptions(),
):
    """Batch many pairs through one vmapped matcher call.

    descriptors: list of (Ni, 128) uint8 arrays; pair_idxs: (B, 2) indices
    into that list. Returns list of (Ki, 2) uint32 match arrays.
    """
    B = len(pair_idxs)
    if B == 0:
        return []
    d = np.zeros((len(descriptors), capacity, 128), dtype=np.uint8)
    m = np.zeros((len(descriptors), capacity), dtype=bool)
    for i, desc in enumerate(descriptors):
        k = min(len(desc), capacity)
        d[i, :k] = desc[:k]
        m[i, :k] = True
    d = jnp.asarray(d)
    m = jnp.asarray(m)
    i1 = jnp.asarray(pair_idxs[:, 0])
    i2 = jnp.asarray(pair_idxs[:, 1])

    fn = jax.vmap(lambda a, b, ma, mb: match_similarity(a, b, ma, mb, options))
    idx2, ok = fn(d[i1], d[i2], m[i1], m[i2])
    idx2 = np.asarray(idx2)
    ok = np.asarray(ok)
    out = []
    for b in range(B):
        sel = np.nonzero(ok[b])[0]
        out.append(np.stack([sel, idx2[b][sel]], axis=1).astype(np.uint32))
    return out
