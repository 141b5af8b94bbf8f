"""Robust multi-view triangulation tests.

reference analogue: estimators/triangulation_test.cc — exact recovery from
clean data and robustness to outlier observations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators.triangulation import (
    TriangulationOptions,
    estimate_triangulation,
)


def _track(rng, V, X, outliers=0, pad_to=None):
    """V cameras on a ring observing world point X."""
    Rs, ts, xs = [], [], []
    for v in range(V):
        ang = 2 * np.pi * v / max(V, 1) * 0.15
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        C = np.array([3 * np.sin(ang), 0.2 * v, -3 + 0.3 * np.cos(ang)])
        t = -R @ C
        Xc = R @ X + t
        xs.append(Xc[:2] / Xc[2])
        Rs.append(R)
        ts.append(t)
    xs = np.asarray(xs)
    for k in range(outliers):
        xs[k] += 0.25 * (1 + k)  # gross angular errors
    V_pad = pad_to or V
    R = np.zeros((V_pad, 3, 3))
    t = np.zeros((V_pad, 3))
    x = np.zeros((V_pad, 2))
    R[:V] = Rs
    t[:V] = ts
    x[:V] = xs
    mask = np.arange(V_pad) < V
    return (
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(x), jnp.asarray(mask)
    )


def test_clean_track_exact():
    rng = np.random.default_rng(0)
    X = np.array([0.3, -0.2, 5.0])
    R, t, x, mask = _track(rng, 6, X)
    out = estimate_triangulation(R, t, x, mask, TriangulationOptions())
    assert bool(out["success"])
    assert int(out["num_inliers"]) == 6
    np.testing.assert_allclose(np.asarray(out["xyz"]), X, atol=1e-6)


def test_outlier_observations_rejected():
    rng = np.random.default_rng(1)
    X = np.array([-0.4, 0.1, 6.0])
    R, t, x, mask = _track(rng, 8, X, outliers=2)
    out = estimate_triangulation(R, t, x, mask, TriangulationOptions())
    assert bool(out["success"])
    inl = np.asarray(out["inlier_mask"])
    assert not inl[0] and not inl[1]
    assert inl[2:8].all()
    np.testing.assert_allclose(np.asarray(out["xyz"]), X, atol=1e-5)


def test_padding_mask_respected():
    rng = np.random.default_rng(2)
    X = np.array([0.0, 0.5, 4.0])
    R, t, x, mask = _track(rng, 4, X, pad_to=8)
    out = estimate_triangulation(R, t, x, mask, TriangulationOptions())
    assert bool(out["success"])
    assert int(out["num_inliers"]) == 4
    assert not np.asarray(out["inlier_mask"])[4:].any()


def test_batched_vmap():
    rng = np.random.default_rng(3)
    tracks = [_track(rng, 5, np.array([0.1 * i, 0.0, 5.0]), pad_to=6)
              for i in range(4)]
    R = jnp.stack([t[0] for t in tracks])
    t_ = jnp.stack([t[1] for t in tracks])
    x = jnp.stack([t[2] for t in tracks])
    m = jnp.stack([t[3] for t in tracks])
    out = jax.vmap(
        lambda a, b, c, d: estimate_triangulation(
            a, b, c, d, TriangulationOptions()
        )
    )(R, t_, x, m)
    assert np.asarray(out["success"]).all()
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(out["xyz"])[i], [0.1 * i, 0.0, 5.0], atol=1e-5
        )


def test_degenerate_two_identical_views():
    # Same camera twice: no triangulation angle -> failure.
    rng = np.random.default_rng(4)
    X = np.array([0.0, 0.0, 5.0])
    R = jnp.asarray(np.stack([np.eye(3)] * 2))
    t = jnp.zeros((2, 3))
    x = jnp.asarray(np.stack([X[:2] / X[2]] * 2))
    mask = jnp.ones(2, dtype=bool)
    out = estimate_triangulation(R, t, x, mask, TriangulationOptions())
    assert not bool(out["success"])
