"""Tests for PROSAC/MSAC RANSAC options, combination sampler, and SPRT.

reference test strategy: optim/ransac_test.cc, optim/sprt (no standalone
test in reference; semantics checked here against hand-computed Wald
ratios).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colmap_tpu.optim.ransac import RansacOptions, ransac
from colmap_tpu.optim.samplers import all_combinations, shuffled_combinations
from colmap_tpu.optim.sprt import SPRTOptions, decision_threshold, sprt_evaluate


def _line_problem(seed=0, n=200, inlier_ratio=0.5, noise=0.01):
    """2D line fitting y = a x + b: minimal sample = 2 points."""
    rng = np.random.default_rng(seed)
    a, b = 0.7, -0.3
    n_in = int(n * inlier_ratio)
    x = rng.uniform(-1, 1, n)
    y = a * x + b + rng.normal(0, noise, n)
    y[n_in:] = rng.uniform(-3, 3, n - n_in)
    pts = jnp.asarray(np.stack([x, y], axis=1), dtype=jnp.float32)

    def estimate(sample_idxs):
        p = pts[sample_idxs]  # (K, 2, 2)
        x1, y1 = p[:, 0, 0], p[:, 0, 1]
        x2, y2 = p[:, 1, 0], p[:, 1, 1]
        slope = (y2 - y1) / (x2 - x1)
        intercept = y1 - slope * x1
        return jnp.stack([slope, intercept], axis=1)

    def residual(models):
        pred = models[:, 0:1] * pts[None, :, 0] + models[:, 1:2]
        return (pred - pts[None, :, 1]) ** 2

    return pts, estimate, residual, (a, b), n_in


@pytest.mark.parametrize("support", ["inlier_count", "m_estimator"])
def test_ransac_support_modes(support):
    pts, estimate, residual, (a, b), n_in = _line_problem()
    options = RansacOptions(max_error=0.05, support=support, batch_size=32)
    result = ransac(
        jax.random.PRNGKey(0), len(pts), 2, estimate, residual, options
    )
    assert bool(result.success)
    assert int(result.num_inliers) >= 0.9 * n_in
    np.testing.assert_allclose(float(result.model[0]), a, atol=0.05)
    np.testing.assert_allclose(float(result.model[1]), b, atol=0.05)


def test_ransac_progressive_sampling():
    pts, estimate, residual, (a, b), n_in = _line_problem(seed=3)
    # Quality order: inliers first (ids 0..n_in-1 are inliers by
    # construction) — PROSAC should find the model quickly.
    order = jnp.arange(len(pts), dtype=jnp.int32)
    options = RansacOptions(
        max_error=0.05, sampling="progressive", batch_size=32
    )
    result = ransac(
        jax.random.PRNGKey(1), len(pts), 2, estimate, residual, options,
        quality_order=order,
    )
    assert bool(result.success)
    assert int(result.num_inliers) >= 0.9 * n_in
    np.testing.assert_allclose(float(result.model[0]), a, atol=0.05)


def test_combination_sampler():
    c = all_combinations(5, 2)
    assert c.shape == (10, 2)
    assert len(np.unique(c, axis=0)) == 10
    assert (c[:, 0] < c[:, 1]).all()
    s = shuffled_combinations(5, 2, np.random.default_rng(0))
    assert len(np.unique(s, axis=0)) == 10
    with pytest.raises(ValueError):
        all_combinations(100, 10, max_count=1000)


def test_sprt_rejects_bad_models():
    options = SPRTOptions(delta=0.01, epsilon=0.1)
    A = decision_threshold(options)
    assert A > 1.0
    n = 500
    mask = jnp.ones(n, dtype=bool)
    # Good hypothesis: 40% inliers (residual 0); bad: ~0%.
    res_good = jnp.asarray(
        np.where(np.arange(n) % 5 < 2, 0.0, 100.0), dtype=jnp.float32
    )
    res_bad = jnp.full(n, 100.0, dtype=jnp.float32)
    accepted, num_eval = sprt_evaluate(
        jnp.stack([res_good, res_bad]), mask, 1.0, options
    )
    assert bool(accepted[0])
    assert not bool(accepted[1])
    # The bad hypothesis must be rejected well before the end.
    assert int(num_eval[1]) < n
    assert int(num_eval[0]) == n


def test_sprt_masked_points_ignored():
    options = SPRTOptions()
    n = 100
    mask = jnp.zeros(n, dtype=bool)
    res = jnp.full((1, n), 100.0, dtype=jnp.float32)
    accepted, num_eval = sprt_evaluate(res, mask, 1.0, options)
    assert bool(accepted[0])  # nothing evaluated -> no rejection
