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
    # Sampling strategy (reference: optim/random_sampler.h and
    # optim/progressive_sampler.h). "progressive" = PROSAC-style: early
    # batches draw from the top of a quality ordering, the pool grows
    # toward all data as trials accumulate.
    sampling: str = "uniform"  # "uniform" | "progressive"
    # Trials after which the progressive pool covers all data.
    progressive_full_pool_trials: int = 2048
    # Support measurement (reference: optim/support_measurement.h).
    # "inlier_count" = InlierSupportMeasurer; "m_estimator" = MSAC-style
    # truncated-residual score (MEstimatorSupportMeasurer).
    support: str = "inlier_count"  # "inlier_count" | "m_estimator"
    # LO-RANSAC structure: the local refinement runs BETWEEN trial rounds
    # (lo_outer_rounds refits total), not inside every while_loop body.
    # Rationale (TPU): the refit's small-matrix eigendecomposition costs
    # ~10x a propose-and-score body; the reference's LORANSAC likewise
    # refits only on new-best models, O(log trials) times
    # (optim/loransac.h:78-130), not per trial batch.
    lo_outer_rounds: int = 8


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
    quality_order: Optional[jnp.ndarray] = None,
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
        quality_order: optional (N,) data indices sorted best-quality-first;
            enables PROSAC-style progressive sampling when
            options.sampling == "progressive" (reference:
            optim/progressive_sampler.{h,cc}).

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
    msac = options.support == "m_estimator"

    # Valid rows first; within the valid block, best-quality first when a
    # quality ordering is given (progressive sampling pool layout).
    if options.sampling == "progressive" and quality_order is not None:
        rank = jnp.zeros(num_data, dtype=jnp.int32).at[quality_order].set(
            jnp.arange(num_data, dtype=jnp.int32)
        )
        sort_key = jnp.where(mask, rank, rank + num_data)
        valid_idx = jnp.argsort(sort_key)
        progressive = True
    else:
        valid_idx = jnp.nonzero(mask, size=num_data, fill_value=0)[0]
        progressive = False

    def _score(models, res):
        inl = (res <= max_sq) & mask[None, :]
        count = jnp.sum(inl, axis=-1)
        if msac:
            # MSAC truncated-residual score, higher = better (reference:
            # MEstimatorSupportMeasurer compares total truncated cost).
            score = jnp.sum(
                jnp.where(mask[None, :], jnp.maximum(max_sq - res, 0.0), 0.0),
                axis=-1,
            )
        else:
            score = count.astype(res.dtype)
        model_ok = jnp.all(jnp.isfinite(models.reshape(models.shape[0], -1)), axis=-1)
        return jnp.where(model_ok, score, 0.0), jnp.where(model_ok, count, 0)

    def propose_and_score(key, trials):
        # Uniform independent sampling; degenerate (duplicate-index) samples
        # produce degenerate models that simply score poorly.
        if progressive:
            # Pool grows linearly with trials from the minimal sample size
            # to all valid data (PROSAC growth schedule, batched).
            frac = jnp.minimum(
                trials.astype(jnp.float32) / options.progressive_full_pool_trials,
                1.0,
            )
            pool = (
                min_sample_size
                + frac * (num_valid.astype(jnp.float32) - min_sample_size)
            ).astype(jnp.int32)
            pool = jnp.clip(pool, min_sample_size, jnp.maximum(num_valid, 1))
        else:
            pool = jnp.maximum(num_valid, 1)
        r = jax.random.randint(key, (K, min_sample_size), 0, pool)
        sample_idxs = valid_idx[r]
        models = sample_estimate_fn(sample_idxs)
        res = residual_fn(models)  # (M, N)
        score, count = _score(models, res)
        best = jnp.argmax(score)
        return models[best], score[best], count[best]

    def best_of(model_a, score_a, count_a, model_b, score_b, count_b):
        take_b = score_b > score_a
        model = jax.tree.map(lambda a, b: jnp.where(take_b, b, a), model_a, model_b)
        return (
            model,
            jnp.maximum(score_a, score_b),
            jnp.where(take_b, count_b, count_a),
        )

    key, sub = jax.random.split(key)
    model0, score0, count0 = propose_and_score(sub, jnp.asarray(0))
    if local_refine_fn is not None:
        model0, score0, count0 = _try_refine(
            model0, score0, count0, residual_fn, local_refine_fn, mask, max_sq, msac
        )

    def continue_p(count, trials):
        dyn = _dyn_max_trials(
            count, num_valid, min_sample_size, options.confidence,
            options.dyn_num_trials_multiplier,
        )
        return (trials < options.max_num_trials) & (
            (trials < options.min_num_trials) | (trials < dyn)
        )

    # The early-exit flag lives IN the state and every update is guarded by
    # it: under vmap (pair-batched verification) the while_loop runs until
    # every lane is done, but finished lanes freeze — so batched results are
    # bit-identical to the unbatched per-pair run. A lane without enough
    # valid rows for a minimal sample can never succeed: mark it done
    # immediately instead of spinning to max_num_trials.
    done0 = ~continue_p(count0, jnp.asarray(K)) | (
        num_valid < min_sample_size
    )

    def cond(state):
        return ~state[5]

    def body(state):
        key, model, score, count, trials, done = state
        key2, sub = jax.random.split(key)
        new_model, new_score, new_count = propose_and_score(sub, trials)
        c_model, c_score, c_count = best_of(
            model, score, count, new_model, new_score, new_count
        )
        upd = ~done
        model = jax.tree.map(
            lambda a, b: jnp.where(upd, b, a), model, c_model
        )
        score = jnp.where(upd, c_score, score)
        count = jnp.where(upd, c_count, count)
        trials = jnp.where(upd, trials + K, trials)
        key = jnp.where(upd, key2, key)
        done = done | ~continue_p(count, trials)
        return key, model, score, count, trials, done

    state = (key, model0, score0, count0, jnp.asarray(K), done0)
    if local_refine_fn is None:
        state = jax.lax.while_loop(cond, body, state)
    else:
        # Chunked trial rounds with one refit between rounds (see
        # lo_outer_rounds): a fori over rounds whose inner while_loop stops
        # at a traced trial watermark — ONE compiled loop body plus ONE
        # refit block, executed lo_outer_rounds times.
        R = max(1, options.lo_outer_rounds)

        def outer_body(rnd, state):
            limit = ((rnd + 1) * options.max_num_trials) // R

            def cond_r(state):
                return (~state[5]) & (state[4] < limit)

            state = jax.lax.while_loop(cond_r, body, state)
            key_s, model_s, score_s, count_s, trials_s, done_s = state
            r_model, r_score, r_count = _try_refine(
                model_s, score_s, count_s, residual_fn, local_refine_fn,
                mask, max_sq, msac,
            )
            done_s = done_s | ~continue_p(r_count, trials_s)
            return (key_s, r_model, r_score, r_count, trials_s, done_s)

        state = jax.lax.fori_loop(0, R, outer_body, state)
    key, model, score, count, trials, _done = state

    res = residual_fn(jax.tree.map(lambda x: x[None], model))[0]
    inlier_mask = (res <= max_sq) & mask
    num_inliers = jnp.sum(inlier_mask)
    success = num_inliers >= jnp.maximum(
        min_sample_size, options.min_inlier_ratio * num_valid
    )
    return RansacResult(model, num_inliers, inlier_mask, trials, success)


def _try_refine(
    model, score, count, residual_fn, local_refine_fn, mask, max_sq, msac=False
):
    """LO step: refit on current inliers, keep if support improves."""
    res = residual_fn(jax.tree.map(lambda x: x[None], model))[0]
    weights = ((res <= max_sq) & mask).astype(res.dtype)
    refined = local_refine_fn(model, weights)
    refined_ok = jnp.all(
        jnp.isfinite(jax.tree.leaves(jax.tree.map(jnp.ravel, refined))[0])
    )
    res_r = residual_fn(jax.tree.map(lambda x: x[None], refined))[0]
    count_r = jnp.where(refined_ok, jnp.sum((res_r <= max_sq) & mask), 0)
    if msac:
        score_r = jnp.where(
            refined_ok,
            jnp.sum(jnp.where(mask, jnp.maximum(max_sq - res_r, 0.0), 0.0)),
            0.0,
        )
    else:
        score_r = count_r.astype(res_r.dtype)
    take = score_r > score
    model = jax.tree.map(lambda a, b: jnp.where(take, b, a), model, refined)
    return (
        model,
        jnp.maximum(score, score_r),
        jnp.where(take, count_r, count),
    )
