"""Retrieval tests: k-means vocabulary, visual index, vocab-tree pairing.

reference test strategy: retrieval/visual_index_test.cc,
retrieval/inverted_index tests.
"""

import numpy as np

from colmap_tpu.retrieval.visual_index import (
    VisualIndex,
    build_vocabulary,
    vocab_tree_pairs,
)


def _clustered_descriptors(rng, n_clusters, per_cluster, noise=5.0):
    centers = rng.uniform(0, 255, (n_clusters, 128))
    descs = centers[np.repeat(np.arange(n_clusters), per_cluster)]
    descs = descs + rng.normal(0, noise, descs.shape)
    return np.clip(descs, 0, 255), centers


def test_kmeans_vocabulary():
    rng = np.random.default_rng(0)
    descs, centers = _clustered_descriptors(rng, 16, 50)
    vocab = build_vocabulary(descs, num_words=16, num_iterations=30)
    # Every true center has a nearby centroid.
    for c in centers:
        d = np.linalg.norm(vocab - c, axis=1).min()
        assert d < 30.0


def test_visual_index_retrieves_similar():
    rng = np.random.default_rng(1)
    # Each "image" draws descriptors from its own subset of clusters; image
    # pairs sharing clusters must score higher.
    n_clusters = 24
    centers = rng.uniform(0, 255, (n_clusters, 128))

    def make_image(cluster_ids, n=60):
        picks = rng.choice(cluster_ids, n)
        return np.clip(centers[picks] + rng.normal(0, 4.0, (n, 128)), 0, 255)

    images = {
        1: make_image([0, 1, 2, 3]),
        2: make_image([0, 1, 2, 4]),  # similar to 1
        3: make_image([10, 11, 12, 13]),
        4: make_image([10, 11, 14, 15]),  # similar to 3
        5: make_image([20, 21, 22, 23]),
    }
    all_desc = np.concatenate(list(images.values()))
    index = VisualIndex.create(all_desc, num_words=64, num_iterations=20)
    for iid, d in images.items():
        index.add(iid, d)
    res = index.query(images[1], num_images=2, exclude_image_id=1)
    assert res[0].image_id == 2
    res = index.query(images[3], num_images=2, exclude_image_id=3)
    assert res[0].image_id == 4


def test_vocab_tree_pairs():
    rng = np.random.default_rng(2)
    centers = rng.uniform(0, 255, (30, 128))

    def make_image(cluster_ids, n=50):
        picks = rng.choice(cluster_ids, n)
        return np.clip(centers[picks] + rng.normal(0, 4.0, (n, 128)), 0, 255)

    groups = {
        1: [0, 1, 2], 2: [0, 1, 3], 3: [1, 2, 3],   # group A
        4: [10, 11, 12], 5: [10, 11, 13], 6: [11, 12, 13],  # group B
    }
    descs = {iid: make_image(cl) for iid, cl in groups.items()}
    pairs = vocab_tree_pairs(descs, num_words=64, num_neighbors=2)
    # Pairs should connect within groups, not across.
    for (a, b) in pairs:
        same_a = a <= 3 and b <= 3
        same_b = a >= 4 and b >= 4
        assert same_a or same_b, f"cross-group pair {(a, b)}"
    assert len(pairs) >= 4


def test_vote_and_verify_scores_true_match_higher():
    """reference: retrieval/vote_and_verify_test.cc — a consistent
    similarity-related geometry set scores high; random geometry low."""
    import numpy as np

    from colmap_tpu.retrieval.vote_and_verify import (
        VoteAndVerifyOptions,
        vote_and_verify,
    )

    rng = np.random.default_rng(0)
    n = 80
    xy = rng.uniform(0, 800, size=(n, 2))
    scale = rng.uniform(1.0, 3.0, size=n)
    ori = rng.uniform(-np.pi, np.pi, size=n)
    g1 = np.column_stack([xy, scale, ori])
    # g2: similarity transform of g1 (s=1.4, rot=0.3, t=(50, -20)).
    s, a = 1.4, 0.3
    R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    xy2 = s * xy @ R.T + np.array([50.0, -20.0])
    g2 = np.column_stack([xy2, scale * s, ori + a])
    score_true = vote_and_verify(g1, g2)
    assert score_true > 20

    g2_rand = np.column_stack([
        rng.uniform(0, 800, size=(n, 2)), scale, ori
    ])
    score_rand = vote_and_verify(g1, g2_rand)
    assert score_rand < score_true / 2


def test_query_with_spatial_verification():
    import numpy as np

    from colmap_tpu.retrieval.visual_index import VisualIndex

    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, size=(300, 128)).astype(np.float32)
    index = VisualIndex.create(base, num_words=32)

    # Two database images share descriptors with the query; image 1 is
    # geometrically consistent, image 2 is scrambled.
    desc = rng.integers(0, 256, size=(60, 128)).astype(np.float32)
    xy = rng.uniform(0, 640, size=(60, 2))
    kp_q = np.column_stack([xy, np.ones(60), np.zeros(60)])
    kp_consistent = np.column_stack([xy + 10.0, np.ones(60), np.zeros(60)])
    kp_scrambled = np.column_stack([
        rng.uniform(0, 640, size=(60, 2)), np.ones(60), np.zeros(60)
    ])
    index.add(1, desc, kp_consistent)
    index.add(2, desc, kp_scrambled)

    results = index.query_with_verification(desc, kp_q, num_images=2)
    assert results[0].image_id == 1


def test_tree_vocabulary_descent_matches_exhaustive():
    """Tree descent must agree with exhaustive leaf-centroid argmin on
    well-separated clusters (reference: visual_index tree quantization)."""
    from colmap_tpu.retrieval.visual_index import build_vocabulary_tree

    rng = np.random.default_rng(1)
    descs, centers = _clustered_descriptors(rng, 24, 40, noise=2.0)
    tree = build_vocabulary_tree(descs, branching=3, depth=3, seed=1)
    assert tree.num_words == 27
    words = tree.assign(descs)
    assert words.shape == (len(descs),)
    assert words.min() >= 0 and words.max() < 27
    # Exhaustive assignment against flattened leaf centroids.
    leaf = tree.leaf_centroids
    d2 = ((descs[:, None, :] - leaf[None]) ** 2).sum(-1)
    exact = d2.argmin(1)
    # Tree descent is approximate; on well-separated clusters it should
    # agree with the exhaustive answer for the vast majority.
    agreement = float((words == exact).mean())
    assert agreement > 0.9
    # Same-cluster descriptors should map to the same word.
    per = 40
    same = sum(
        len(set(words[i * per:(i + 1) * per].tolist())) == 1 for i in range(24)
    )
    assert same >= 16


def test_tree_index_retrieval_parity():
    """Hierarchical index retrieves the right neighbors like the flat one."""
    rng = np.random.default_rng(2)
    base, _ = _clustered_descriptors(rng, 32, 30, noise=3.0)
    per_image = 60
    images = {
        i: base[i * per_image:(i + 1) * per_image] for i in range(8)
    }
    index = VisualIndex.create_tree(base, branching=4, depth=3, seed=2)
    assert index.num_words == 64
    for iid, d in images.items():
        index.add(iid, d)
    # Query with a noisy copy of image 3's descriptors: it must rank first.
    q = np.clip(images[3] + rng.normal(0, 2.0, images[3].shape), 0, 255)
    res = index.query(q, num_images=3)
    assert res and res[0].image_id == 3


def test_rank_images_bow_corpus_scale():
    """Batched BoW matmul ranking retrieves cluster-mates at corpus scale
    (the TPU-native path behind vocab_tree_pairs for >50 images;
    reference scoring model: retrieval TF-IDF ranking)."""
    from colmap_tpu.retrieval.visual_index import (
        VisualIndex, build_vocabulary_tree, rank_images_bow,
    )

    rng = np.random.default_rng(0)
    n_images, n_feat, n_clusters = 120, 64, 6
    pools = rng.integers(0, 256, (n_clusters, 256, 128)).astype(np.float32)
    cluster_of = np.repeat(np.arange(n_clusters), n_images // n_clusters)
    descs = {}
    for i in range(n_images):
        sel = rng.choice(256, n_feat, replace=False)
        d = pools[cluster_of[i], sel] + rng.normal(0, 10.0, (n_feat, 128))
        descs[i] = np.clip(d, 0, 255).astype(np.float32)
    train = np.concatenate([descs[i] for i in range(0, n_images, 3)])
    tree = build_vocabulary_tree(train, branching=8, depth=3,
                                 num_iterations=4, max_samples_per_node=128)
    ranked = rank_images_bow(descs, VisualIndex(tree), num_neighbors=5)
    hits = total = 0
    for iid, results in ranked.items():
        assert len(results) == 5
        for r in results:
            hits += int(cluster_of[r.image_id] == cluster_of[iid])
            total += 1
    assert hits / total > 0.9  # chance would be ~0.16


def test_vocab_tree_pairs_batched_path_connects_clusters():
    from colmap_tpu.retrieval.visual_index import vocab_tree_pairs

    rng = np.random.default_rng(1)
    n_images, n_feat = 60, 48  # > 50 -> batched BoW path
    pools = rng.integers(0, 256, (3, 128, 128)).astype(np.float32)
    cluster_of = np.repeat(np.arange(3), 20)
    descs = {}
    for i in range(n_images):
        sel = rng.choice(128, n_feat, replace=False)
        descs[i] = np.clip(
            pools[cluster_of[i], sel] + rng.normal(0, 8.0, (n_feat, 128)),
            0, 255,
        ).astype(np.float32)
    pairs = vocab_tree_pairs(descs, num_words=128, num_neighbors=4)
    assert len(pairs) > 0
    same = sum(1 for (a, b) in pairs if cluster_of[a] == cluster_of[b])
    assert same / len(pairs) > 0.9


def test_shipped_vocab_tree_fixture():
    """The in-repo pretrained tree loads and retrieves (the reference
    downloads its trees at runtime, retrieval/resources.cc; this repo
    ships a small synthetic-trained one for egress-free environments)."""
    from colmap_tpu.retrieval.visual_index import (
        VisualIndex, default_vocab_tree_path, load_vocab_tree,
        rank_images_bow,
    )

    path = default_vocab_tree_path()
    assert path is not None, "fixture colmap_tpu/data/vocab_tree_small.npz missing"
    tree = load_vocab_tree(path)
    assert tree.num_words == 512
    rng = np.random.default_rng(3)
    pools = rng.integers(0, 256, (4, 128, 128)).astype(np.float32)
    cluster_of = np.repeat(np.arange(4), 15)
    descs = {}
    for i in range(60):
        sel = rng.choice(128, 32, replace=False)
        descs[i] = np.clip(
            pools[cluster_of[i], sel] + rng.normal(0, 8.0, (32, 128)),
            0, 255,
        ).astype(np.float32)
    ranked = rank_images_bow(descs, VisualIndex(tree), num_neighbors=5)
    hits = total = 0
    for iid, results in ranked.items():
        for r in results:
            hits += int(cluster_of[r.image_id] == cluster_of[iid])
            total += 1
    # Uniform-random test descriptors sit far off the SIFT manifold the
    # tree was trained on, so quantization is coarse; well above the 0.25
    # chance rate still demonstrates the fixture loads and discriminates.
    assert hits / total > 0.5
