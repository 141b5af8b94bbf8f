"""Feature extraction and matching tests.

reference test strategy: feature/sift_test.cc (keypoint presence and
geometric consistency on synthetic patterns), feature/matcher tests.
"""

import numpy as np
import pytest

from colmap_tpu.feature.matcher import (
    MatchingOptions,
    match_descriptors,
    match_guided,
    match_pairs_batched,
)
from colmap_tpu.feature.sift import SiftOptions, extract_sift


def _render_pattern(rng, size=256, n_blobs=40, shift=(0, 0), angle=0.0):
    """Gaussian blob field; analytic, reproducible, warpable."""
    H = W = size
    ys, xs = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W), dtype=np.float64)
    centers = rng.uniform(30, size - 30, (n_blobs, 2))
    sigmas = rng.uniform(2.0, 6.0, n_blobs)
    amps = rng.uniform(0.4, 1.0, n_blobs) * np.sign(rng.standard_normal(n_blobs))
    c, s = np.cos(angle), np.sin(angle)
    cx0, cy0 = W / 2, H / 2
    for (cx, cy), sg, a in zip(centers, sigmas, amps):
        # Transform blob center.
        x2 = c * (cx - cx0) - s * (cy - cy0) + cx0 + shift[0]
        y2 = s * (cx - cx0) + c * (cy - cy0) + cy0 + shift[1]
        img += a * np.exp(-((xs - x2) ** 2 + (ys - y2) ** 2) / (2 * sg**2))
    img = (img - img.min()) / (img.max() - img.min() + 1e-12)
    return img.astype(np.float32), centers, sigmas


def test_sift_detects_blobs():
    rng = np.random.default_rng(0)
    img, centers, sigmas = _render_pattern(rng)
    kp, desc = extract_sift(img, SiftOptions(max_num_features=500))
    assert len(kp) >= 20
    assert desc.shape[1] == 128
    assert desc.dtype == np.uint8
    # A good fraction of blob centers have a keypoint within a few pixels.
    found = 0
    for (cx, cy) in centers:
        d = np.min(np.hypot(kp[:, 0] - cx, kp[:, 1] - cy))
        if d < 3.0:
            found += 1
    assert found >= 0.5 * len(centers)


def test_sift_match_translated():
    """Keypoints must match across a translated copy with consistent offset."""
    rng = np.random.default_rng(1)
    img1, _, _ = _render_pattern(rng, shift=(0, 0))
    rng = np.random.default_rng(1)
    img2, _, _ = _render_pattern(rng, shift=(13, -7))
    kp1, d1 = extract_sift(img1, SiftOptions(max_num_features=500))
    kp2, d2 = extract_sift(img2, SiftOptions(max_num_features=500))
    matches = match_descriptors(d1, d2)
    assert len(matches) >= 15
    dx = kp2[matches[:, 1], 0] - kp1[matches[:, 0], 0]
    dy = kp2[matches[:, 1], 1] - kp1[matches[:, 0], 1]
    # The majority offset equals the translation.
    good = (np.abs(dx - 13) < 2.5) & (np.abs(dy + 7) < 2.5)
    assert good.mean() > 0.7, f"inlier ratio {good.mean():.2f} over {len(matches)}"


def test_match_descriptors_identity():
    rng = np.random.default_rng(2)
    d = rng.integers(0, 256, (100, 128), dtype=np.uint8)
    matches = match_descriptors(d, d)
    # Every descriptor matches itself (ratio test may drop near-duplicates).
    assert len(matches) >= 90
    eq = matches[:, 0] == matches[:, 1]
    assert eq.all()


def test_match_ratio_test_rejects_ambiguous():
    rng = np.random.default_rng(3)
    base = rng.integers(30, 220, (50, 128), dtype=np.int64)
    # d2 contains two equally-noisy copies of each -> best/second-best
    # distances are comparable and the ratio test must reject.
    noise1 = rng.integers(-15, 16, base.shape)
    noise2 = rng.integers(-15, 16, base.shape)
    d2 = np.concatenate([base + noise1, base + noise2]).astype(np.uint8)
    matches = match_descriptors(base.astype(np.uint8), d2)
    assert len(matches) < 5


def test_match_pairs_batched():
    rng = np.random.default_rng(4)
    descs = [rng.integers(0, 256, (64, 128), dtype=np.uint8) for _ in range(4)]
    descs.append(descs[0].copy())  # pair (0, 4) matches fully
    pairs = np.array([[0, 1], [0, 4]])
    out = match_pairs_batched(descs, pairs, capacity=128)
    assert len(out) == 2
    assert len(out[1]) >= 60
    assert (out[1][:, 0] == out[1][:, 1]).all()


def test_match_guided_epipolar_filter():
    rng = np.random.default_rng(5)
    n = 60
    d = rng.integers(0, 256, (n, 128), dtype=np.uint8)
    xy1 = rng.uniform(0, 500, (n, 2)).astype(np.float32)
    # True geometry: pure horizontal shift -> F ~ [e]_x for translation (1,0,0):
    # y2 = y1 (epipolar lines horizontal).
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float64)
    xy2 = xy1 + np.array([20.0, 0.0], dtype=np.float32)
    matches = match_guided(d, d, xy1, xy2, F)
    assert len(matches) >= n - 5
    # Corrupt the y-coordinates of half of image-2 points -> those violate
    # the constraint and are dropped.
    xy2_bad = xy2.copy()
    xy2_bad[: n // 2, 1] += 50.0
    matches2 = match_guided(d, d, xy1, xy2_bad, F)
    matched1 = set(matches2[:, 0].tolist())
    assert all(i not in matched1 for i in range(n // 2))


def test_sift_dsp_and_upright_variants():
    """DSP-SIFT and upright options (reference: sift.h:62-84,
    domain_size_pooling / upright)."""
    import numpy as np

    from colmap_tpu.feature.sift import SiftOptions, extract_sift

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, size=(128, 128)) * 64).astype(np.uint8)
    # A few strong blobs.
    yy, xx = np.mgrid[0:128, 0:128]
    for (cy, cx, s) in [(32, 40, 4), (80, 90, 6), (100, 30, 5)]:
        img = np.maximum(
            img,
            (220 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2))).astype(
                np.uint8
            ),
        )
    kp_std, d_std = extract_sift(img, SiftOptions(max_num_features=128))
    kp_dsp, d_dsp = extract_sift(
        img,
        SiftOptions(max_num_features=128, domain_size_pooling=True,
                    dsp_num_scales=4),
    )
    assert len(kp_dsp) > 0
    assert d_dsp.shape[1] == 128
    # DSP changes descriptors but not detections.
    assert len(kp_dsp) == len(kp_std)
    assert not np.array_equal(d_dsp, d_std)

    kp_up, d_up = extract_sift(
        img, SiftOptions(max_num_features=128, upright=True)
    )
    assert len(kp_up) > 0
    # Upright: single orientation per location, all zero.
    assert np.allclose(kp_up[:, 3], 0.0, atol=1e-6)

    kp_l2, d_l2 = extract_sift(
        img, SiftOptions(max_num_features=128, normalization="L2")
    )
    # uint8 descriptors scaled by 512: L2 norm ~512.
    norms = np.linalg.norm(d_l2.astype(np.float64), axis=1)
    assert np.all(norms > 0)


def test_sift_affine_shape_invariance():
    """Affine-covariant shape estimation (reference: sift.h
    estimate_affine_shape via VLFeat covdet): descriptors survive an
    anisotropic stretch noticeably better than plain SIFT, and keypoints
    come back as 6-col affine frames."""
    rng = np.random.default_rng(11)
    img, _, _ = _render_pattern(rng, size=200, n_blobs=35)
    # Anisotropic stretch: 1.6x in x only.
    stretch = 1.6
    H, W = img.shape
    xs = np.arange(int(W * stretch)) / stretch
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 2)
    fx = xs - x0
    img_s = (img[:, x0] * (1 - fx) + img[:, x0 + 1] * fx).astype(np.float32)

    def match_rate(affine):
        opts = SiftOptions(
            max_num_features=300, num_octaves=3,
            estimate_affine_shape=affine,
        )
        kp1, d1 = extract_sift(img, opts)
        kp2, d2 = extract_sift(img_s, opts)
        if len(kp1) == 0 or len(kp2) == 0:
            return 0.0, kp1, kp2
        m = match_descriptors(d1, d2, MatchingOptions(max_ratio=0.9))
        if len(m) == 0:
            return 0.0, kp1, kp2
        # Geometrically consistent matches under the known stretch.
        p1 = kp1[m[:, 0], :2]
        p2 = kp2[m[:, 1], :2]
        good = (
            (np.abs(p1[:, 0] * stretch - p2[:, 0]) < 4.0)
            & (np.abs(p1[:, 1] - p2[:, 1]) < 4.0)
        )
        return good.sum() / max(len(kp1), 1), kp1, kp2

    rate_aff, kp1a, _ = match_rate(True)
    rate_plain, _, _ = match_rate(False)
    assert kp1a.shape[1] == 6
    assert rate_aff > 0.15
    assert rate_aff > rate_plain * 1.2, (rate_aff, rate_plain)
