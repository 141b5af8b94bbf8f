"""Vectorized hypothesis-batch RANSAC / LO-RANSAC.

reference behavior: src/colmap/optim/ransac.h:95-199 and loransac.h:78-130.
The reference's sequential trial loop with multi-threading (P3 in SURVEY §2.9)
is replaced by the TPU-native formulation: sample K hypotheses at once, score
all K x N point residuals as one fused batch (MXU/VPU), take the best by
masked support count, and iterate batches inside ``lax.while_loop`` with the
standard adaptive trial bound for early exit. Semantics match the reference
within K-granularity.

The harness is generic over the model via three closures:
    estimate(keys_points...) -> models   (vmapped minimal solver; may return
                                          S solutions per sample, NaN-padded)
    residual(model, data) -> (N,) squared errors
All shapes are static; ``mask`` marks valid data rows (padding-safe).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RansacOptions:
    """reference: optim/ransac.h:50-77."""

    max_error: float = 4.0  # pixels (or normalized units, caller converts)
    min_inlier_ratio: float = 0.1
    confidence: float = 0.99
    min_num_trials: int = 32
    max_num_trials: int = 8192
    batch_size: int = 64  # hypotheses scored per while_loop step
    # multiplier on the dynamic number of trials (dyn_num_trials_multiplier)
    dyn_num_trials_multiplier: float = 3.0


class RansacResult(NamedTuple):
    model: jnp.ndarray  # best model parameters
    num_inliers: jnp.ndarray  # scalar int
    inlier_mask: jnp.ndarray  # (N,) bool
    num_trials: jnp.ndarray  # scalar int
    success: jnp.ndarray  # scalar bool


def _dyn_max_trials(num_inliers, num_samples, min_sample_size, confidence, multiplier):
    """Adaptive trial count (optim/ransac.h:179-199)."""
    ratio = num_inliers / jnp.maximum(num_samples, 1)
    nom = jnp.log(jnp.maximum(1.0 - confidence, 1e-30))
    denom = jnp.log(jnp.maximum(1.0 - ratio**min_sample_size, 1e-30))
    # denom in (-inf, 0); trials = nom/denom * multiplier
    trials = jnp.where(denom < -1e-12, multiplier * nom / denom, jnp.inf)
    return trials


def ransac(
    key: jax.Array,
    num_data: int,
    min_sample_size: int,
    sample_estimate_fn: Callable,
    residual_fn: Callable,
    options: RansacOptions,
    mask: Optional[jnp.ndarray] = None,
    local_refine_fn: Optional[Callable] = None,
    max_error=None,
):
    """Run vectorized (LO-)RANSAC.

    Args:
        key: PRNG key.
        num_data: static data count N (padded).
        min_sample_size: m, points per minimal sample.
        sample_estimate_fn: (sample_idxs (K, m)) -> models (M, ...) where
            M = K * solutions_per_sample; invalid models NaN.
        residual_fn: (models (M, ...)) -> (M, N) squared residuals.
        options: RansacOptions; max_error compared against sqrt(residual).
        mask: (N,) bool validity of data rows.
        local_refine_fn: optional (model, inlier_weights (N,)) -> model;
            applied to the best model each round (LO-RANSAC inner step).

    Returns: RansacResult.
    """
    if mask is None:
        mask = jnp.ones(num_data, dtype=bool)
    num_valid = jnp.sum(mask)
    # max_error may be passed as a traced scalar so per-camera thresholds
    # don't fragment the jit cache of callers.
    if max_error is None:
        max_error = options.max_error
    max_sq = max_error**2
    K = options.batch_size

    def propose_and_score(key):
        # Uniform independent sampling; degenerate (duplicate-index) samples
        # produce degenerate models that simply score poorly.
        # Bias sampling to valid rows by sampling from valid count then
        # translating through the sorted index list.
        valid_idx = jnp.nonzero(mask, size=num_data, fill_value=0)[0]
        r = jax.random.randint(key, (K, min_sample_size), 0, jnp.maximum(num_valid, 1))
        sample_idxs = valid_idx[r]
        models = sample_estimate_fn(sample_idxs)
        res = residual_fn(models)  # (M, N)
        inl = (res <= max_sq) & mask[None, :]
        support = jnp.sum(inl, axis=-1)
        # Invalid (NaN) models score 0.
        model_ok = jnp.all(jnp.isfinite(models.reshape(models.shape[0], -1)), axis=-1)
        support = jnp.where(model_ok, support, 0)
        best = jnp.argmax(support)
        return models[best], support[best]

    def best_of(model_a, support_a, model_b, support_b):
        take_b = support_b > support_a
        model = jax.tree.map(lambda a, b: jnp.where(take_b, b, a), model_a, model_b)
        return model, jnp.maximum(support_a, support_b)

    key, sub = jax.random.split(key)
    model0, support0 = propose_and_score(sub)
    if local_refine_fn is not None:
        model0, support0 = _try_refine(
            model0, support0, residual_fn, local_refine_fn, mask, max_sq
        )

    def cond(state):
        key, model, support, trials = state
        dyn = _dyn_max_trials(
            support, num_valid, min_sample_size, options.confidence,
            options.dyn_num_trials_multiplier,
        )
        return (trials < options.max_num_trials) & (
            (trials < options.min_num_trials) | (trials < dyn)
        )

    def body(state):
        key, model, support, trials = state
        key, sub = jax.random.split(key)
        new_model, new_support = propose_and_score(sub)
        model, support = best_of(model, support, new_model, new_support)
        if local_refine_fn is not None:
            model, support = _try_refine(
                model, support, residual_fn, local_refine_fn, mask, max_sq
            )
        return key, model, support, trials + K

    key, model, support, trials = jax.lax.while_loop(
        cond, body, (key, model0, support0, jnp.asarray(K))
    )

    res = residual_fn(jax.tree.map(lambda x: x[None], model))[0]
    inlier_mask = (res <= max_sq) & mask
    num_inliers = jnp.sum(inlier_mask)
    success = num_inliers >= jnp.maximum(
        min_sample_size, options.min_inlier_ratio * num_valid
    )
    return RansacResult(model, num_inliers, inlier_mask, trials, success)


def _try_refine(model, support, residual_fn, local_refine_fn, mask, max_sq):
    """LO step: refit on current inliers, keep if support improves."""
    res = residual_fn(jax.tree.map(lambda x: x[None], model))[0]
    weights = ((res <= max_sq) & mask).astype(res.dtype)
    refined = local_refine_fn(model, weights)
    refined_ok = jnp.all(
        jnp.isfinite(jax.tree.leaves(jax.tree.map(jnp.ravel, refined))[0])
    )
    res_r = residual_fn(jax.tree.map(lambda x: x[None], refined))[0]
    support_r = jnp.where(refined_ok, jnp.sum((res_r <= max_sq) & mask), 0)
    take = support_r > support
    model = jax.tree.map(lambda a, b: jnp.where(take, b, a), model, refined)
    return model, jnp.maximum(support, support_r)
