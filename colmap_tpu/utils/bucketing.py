"""Shape bucketing: pad dynamic sizes to powers of two.

XLA compiles one program per distinct input shape; incremental SfM naturally
produces a new shape every step (match counts, observation counts, model
sizes). Padding every dynamic dimension up to the next power of two (with
validity masks) bounds the number of compilations to O(log n) per call site
— the standard TPU serving trick applied to the SfM pipeline.
"""

from __future__ import annotations

import numpy as np


def bucket_size(n: int, min_bucket: int = 64) -> int:
    if n <= min_bucket:
        return min_bucket
    return 1 << int(np.ceil(np.log2(n)))


def pad_rows(arr: np.ndarray, target: int, fill=0):
    """Pad axis 0 of arr to target rows with a constant fill."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    if n >= target:
        return arr[:target]
    pad_shape = (target - n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], axis=0)
