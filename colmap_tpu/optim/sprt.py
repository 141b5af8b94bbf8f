"""Sequential probability ratio test (SPRT) for early model rejection.

reference behavior: src/colmap/optim/sprt.{h,cc} — Wald's SPRT from
"Randomized RANSAC with Sequential Probability Ratio Test" (Matas & Chum):
evaluate points one at a time, accumulate the likelihood ratio
lambda *= (delta/epsilon) for inliers and ((1-delta)/(1-epsilon)) for
outliers, reject the hypothesis once lambda exceeds the decision
threshold A.

On TPU the batched hypothesis scoring makes per-point early exit
pointless for throughput (all residuals of a batch are computed by one
fused program — SURVEY §2.9 P3), so this module keeps the *semantics*:
a vectorized chunked evaluation that reports, per hypothesis, whether
SPRT would have rejected it and after how many points — usable both as
a pre-filter before expensive local optimization and for parity tests.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SPRTOptions:
    """reference: optim/sprt.h SPRT::Options."""

    delta: float = 0.01  # P(inlier | bad model)
    epsilon: float = 0.1  # P(inlier | good model)
    eval_time_ratio: float = 200.0  # t_M: model eval / point eval time
    num_models_per_sample: float = 1.0  # m_S


def decision_threshold(options: SPRTOptions) -> float:
    """Wald's decision threshold A, solved by the fixed-point iteration
    A = C t_m/m_s + 1 + log A (reference: sprt.cc UpdateDecisionThreshold)."""
    d, e = options.delta, options.epsilon
    C = (1.0 - d) * float(jnp.log((1.0 - d) / (1.0 - e))) + d * float(
        jnp.log(d / e)
    )
    K = options.eval_time_ratio * C / options.num_models_per_sample + 1.0
    A = K
    for _ in range(100):
        A_new = K + float(jnp.log(A))
        if abs(A_new - A) < 1.5e-8:
            break
        A = A_new
    return A


def sprt_evaluate(
    residuals_sq: jnp.ndarray,
    mask: jnp.ndarray,
    max_residual_sq,
    options: SPRTOptions = SPRTOptions(),
):
    """Run the SPRT over each hypothesis' residual sequence.

    Args:
        residuals_sq: (M, N) squared residuals per hypothesis.
        mask: (N,) valid data rows.
        max_residual_sq: inlier threshold on the squared residual.

    Returns:
        (accepted (M,) bool, num_evaluated (M,) int32) — whether each
        hypothesis survives the test and the 1-based index of the point at
        which it was rejected (N for survivors).
    """
    A = decision_threshold(options)
    log_A = jnp.log(A)
    d, e = options.delta, options.epsilon
    log_in = jnp.log(d / e)  # inlier: delta/epsilon < 1
    log_out = jnp.log((1.0 - d) / (1.0 - e))  # outlier: > 1

    inl = (residuals_sq <= max_residual_sq) & mask[None, :]
    step = jnp.where(
        mask[None, :], jnp.where(inl, log_in, log_out), 0.0
    )  # (M, N)
    cum = jnp.cumsum(step, axis=-1)
    rejected_at = cum > log_A
    any_reject = jnp.any(rejected_at, axis=-1)
    first = jnp.argmax(rejected_at, axis=-1) + 1
    n = residuals_sq.shape[-1]
    num_evaluated = jnp.where(any_reject, first, n).astype(jnp.int32)
    return ~any_reject, num_evaluated
