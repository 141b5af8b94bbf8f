"""Samplers for the hypothesis-batch RANSAC harness.

reference behavior: src/colmap/optim/{random,progressive,combination}_sampler.*
— the random and progressive (PROSAC) strategies live inside
optim/ransac.py (options.sampling); this module provides the
CombinationSampler equivalent: deterministic enumeration of all
C(n, m) minimal samples, used where the sample space is small enough to
cover exhaustively (e.g. view pairs in multi-view triangulation RANSAC,
estimators/triangulation.h:52).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np


def all_combinations(n: int, m: int, max_count: int = 1 << 20) -> np.ndarray:
    """All C(n, m) index combinations as an (C, m) int32 array.

    reference: optim/combination_sampler.cc enumerates combinations in
    shuffled order; here the full set is materialized so the batch scorer
    covers every sample in one pass (shuffling is irrelevant when all
    hypotheses are scored).
    """
    from math import comb

    count = comb(n, m)
    if count > max_count:
        raise ValueError(
            f"C({n},{m}) = {count} exceeds max_count={max_count}; "
            "use random sampling instead"
        )
    out = np.fromiter(
        (i for c in combinations(range(n), m) for i in c),
        dtype=np.int32,
        count=count * m,
    )
    return out.reshape(count, m)


def shuffled_combinations(
    n: int, m: int, rng: np.random.Generator, max_count: int = 1 << 20
) -> np.ndarray:
    """All combinations in random order (matches the reference sampler's
    shuffle-once behavior for reproducible partial sweeps)."""
    combos = all_combinations(n, m, max_count)
    rng.shuffle(combos)
    return combos
