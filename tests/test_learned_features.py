"""ALIKED + LightGlue native JAX implementations.

reference test strategy: feature/aliked.cc + onnx_matchers are exercised
through extraction/matching smoke tests; here with deterministic random
weights (official checkpoints require downloads this environment lacks).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.feature.aliked import (
    AlikedOptions,
    extract_aliked,
    init_params as aliked_init,
)
from colmap_tpu.feature.lightglue import (
    LightGlueOptions,
    init_params as lg_init,
    match_lightglue,
)


def test_aliked_extraction_shapes_and_determinism():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(96, 128), dtype=np.uint8)
    options = AlikedOptions(max_num_keypoints=256, detection_threshold=0.05)
    params = aliked_init(options, seed=1)
    kp1, d1 = extract_aliked(img, params, options)
    kp2, d2 = extract_aliked(img, params, options)
    assert kp1.shape[1] == 4
    assert d1.shape[1] == options.descriptor_dim
    np.testing.assert_array_equal(kp1, kp2)
    np.testing.assert_array_equal(d1, d2)
    if len(d1):
        np.testing.assert_allclose(
            np.linalg.norm(d1, axis=1), 1.0, atol=1e-5
        )
        # Keypoints inside image bounds.
        assert (kp1[:, 0] >= 0).all() and (kp1[:, 0] <= 128).all()
        assert (kp1[:, 1] >= 0).all() and (kp1[:, 1] <= 96).all()


def test_aliked_keypoints_repeatable_under_shift():
    """Detections on a shifted copy move with the content (conv net is
    shift-equivariant up to border effects)."""
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 1, size=(128, 160)).astype(np.float32)
    img1 = (base * 255).astype(np.uint8)
    shift = 8
    img2 = np.roll(img1, shift, axis=1)
    options = AlikedOptions(max_num_keypoints=128, detection_threshold=0.05)
    params = aliked_init(options, seed=2)
    kp1, _ = extract_aliked(img1, params, options)
    kp2, _ = extract_aliked(img2, params, options)
    if len(kp1) == 0 or len(kp2) == 0:
        pytest.skip("random-weight detector found no keypoints")
    # Interior keypoints of img1 should reappear shifted in img2.
    interior = kp1[(kp1[:, 0] > 16) & (kp1[:, 0] < 160 - 16 - shift)]
    matched = 0
    for kp in interior[:50]:
        target = kp[:2] + np.array([shift, 0.0])
        dist = np.linalg.norm(kp2[:, :2] - target, axis=1)
        if len(dist) and dist.min() < 1.0:
            matched += 1
    assert matched > 0.5 * min(len(interior), 50)


def test_lightglue_matches_identical_sets():
    """Identical descriptor sets must match one-to-one (any weights)."""
    rng = np.random.default_rng(3)
    n = 64
    desc = rng.normal(size=(n, 128)).astype(np.float32)
    kpts = rng.uniform(0, 512, size=(n, 2)).astype(np.float32)
    options = LightGlueOptions(
        num_layers=2, max_num_keypoints=128, filter_threshold=0.0
    )
    params = lg_init(options, seed=4)
    matches = match_lightglue(
        desc, kpts, desc, kpts, (512, 512), (512, 512), params, options
    )
    assert len(matches) > 0.8 * n
    correct = (matches[:, 0] == matches[:, 1]).mean()
    assert correct > 0.9


def test_lightglue_permutation_consistency():
    """Permuting the second set permutes the matches accordingly."""
    rng = np.random.default_rng(5)
    n = 48
    desc = rng.normal(size=(n, 128)).astype(np.float32)
    kpts = rng.uniform(0, 256, size=(n, 2)).astype(np.float32)
    perm = rng.permutation(n)
    options = LightGlueOptions(
        num_layers=2, max_num_keypoints=64, filter_threshold=0.0
    )
    params = lg_init(options, seed=6)
    matches = match_lightglue(
        desc, kpts, desc[perm], kpts[perm], (256, 256), (256, 256),
        params, options,
    )
    assert len(matches) > 0.7 * n
    correct = (perm[matches[:, 1]] == matches[:, 0]).mean()
    assert correct > 0.9


def test_aliked_lightglue_pipeline_wiring(tmp_path):
    """extractor_type='aliked' + matcher_type='lightglue' run end-to-end
    through the DB pipeline (reference: extractor/matcher type dispatch,
    feature/extractor.h:94 + matcher.h:108)."""
    import os

    from PIL import Image as PILImage

    from colmap_tpu.controllers.feature_pipeline import (
        ImageReaderOptions,
        MatchingPipelineOptions,
        run_exhaustive_matching,
        run_feature_extraction,
    )
    from colmap_tpu.feature.sift import SiftOptions
    from colmap_tpu.scene.database import Database

    rng = np.random.default_rng(7)
    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    base = rng.integers(0, 255, size=(80, 96), dtype=np.uint8)
    # Two near-identical images: the same content gives identical
    # descriptors, which any-weights LightGlue matches one-to-one.
    PILImage.fromarray(base).save(img_dir / "a.png")
    PILImage.fromarray(base).save(img_dir / "b.png")

    db = Database(str(tmp_path / "db.db"))
    ids = run_feature_extraction(
        db, str(img_dir),
        reader_options=ImageReaderOptions(extractor_type="aliked"),
        sift_options=SiftOptions(max_num_features=256),
    )
    assert len(ids) == 2
    kp = db.read_keypoints(ids[0])
    desc = db.read_descriptors(ids[0])
    assert len(kp) > 0 and desc.shape[1] == 128

    run_exhaustive_matching(
        db,
        MatchingPipelineOptions(
            matcher_type="lightglue",
            min_num_inliers=5,
            lightglue_options=LightGlueOptions(
                num_layers=2, filter_threshold=0.0, max_num_keypoints=512
            ),
        ),
    )
    n_matches = sum(len(m) for (_, m) in db.read_all_matches())
    assert n_matches > 0
    db.close()
