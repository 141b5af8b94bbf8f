"""Batched pair-block verification vs the per-pair path.

The batched verifier must produce the same configurations and inlier sets
as per-pair estimate_two_view_geometry (guaranteed by the guarded early-exit
in optim/ransac.py) — this is the regression test the blocked matcher
pipeline relies on (reference analog: verifier thread pool equivalence,
controllers/feature_matching_utils.h:50-133).
"""

import pytest

pytestmark = pytest.mark.slow


import numpy as np

from colmap_tpu.estimators.two_view_batch import (
    estimate_two_view_geometries_batched,
)
from colmap_tpu.estimators.two_view_geometry import (
    TwoViewGeometryOptions,
    estimate_two_view_geometry,
)
from tests.test_ransac_two_view import _make_pair


def _pairs(seed0=10, n=6):
    items = []
    for s in range(n):
        rng = np.random.default_rng(seed0 + s)
        calibrated = s % 2 == 0
        outlier_ratio = [0.2, 0.4, 0.9][s % 3]  # incl. a degenerate pair
        cam1, x1, cam2, x2, matches, _, _ = _make_pair(
            rng, calibrated=calibrated, n_points=100 + 40 * s,
            outlier_ratio=outlier_ratio,
        )
        cam1.camera_id = 2 * s + 1
        cam2.camera_id = 2 * s + 2
        items.append((cam1, x1, cam2, x2, matches))
    return items


def test_batched_matches_per_pair_results():
    items = _pairs()
    options = TwoViewGeometryOptions()
    batched = estimate_two_view_geometries_batched(items, options)
    for item, g_b in zip(items, batched):
        g_s = estimate_two_view_geometry(*item, options)
        assert g_b.config == g_s.config, (g_b.config, g_s.config)
        inl_b = set(map(tuple, np.asarray(g_b.inlier_matches)))
        inl_s = set(map(tuple, np.asarray(g_s.inlier_matches)))
        assert inl_b == inl_s


def test_batched_mixed_calibration_and_pose():
    items = _pairs(seed0=30, n=3)
    options = TwoViewGeometryOptions(compute_relative_pose=True)
    batched = estimate_two_view_geometries_batched(items, options)
    for item, g_b in zip(items, batched):
        g_s = estimate_two_view_geometry(*item, options)
        assert g_b.config == g_s.config
        if g_s.cam2_from_cam1 is not None:
            assert g_b.cam2_from_cam1 is not None
            assert np.allclose(
                np.abs(g_b.cam2_from_cam1.quat),
                np.abs(g_s.cam2_from_cam1.quat), atol=1e-8,
            )


def test_batched_empty_and_tiny():
    assert estimate_two_view_geometries_batched([], TwoViewGeometryOptions()) == []
    rng = np.random.default_rng(3)
    cam1, x1, cam2, x2, matches, _, _ = _make_pair(rng, calibrated=True)
    items = [(cam1, x1, cam2, x2, matches[:5])]  # below min_num_inliers
    out = estimate_two_view_geometries_batched(items, TwoViewGeometryOptions())
    from colmap_tpu.scene.types import TwoViewGeometryConfig

    assert out[0].config == int(TwoViewGeometryConfig.DEGENERATE)
