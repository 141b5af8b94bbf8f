"""Umeyama similarity / affine / translation transform solvers, batched.

reference behavior: src/colmap/estimators/solvers/{similarity,affine,
translation}_transform.* — used by model alignment, merging, and evaluation
(ATE) paths.
"""

from __future__ import annotations

import jax.numpy as jnp

from colmap_tpu.estimators.solvers.p3p import kabsch


def umeyama(src, dst, weights=None, with_scale=True):
    """Weighted Umeyama alignment: dst ≈ s R src + t.

    src, dst: (..., N, 3). Returns (scale (...), R (..., 3, 3), t (..., 3)).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-30)
    src_c = jnp.sum(src * weights[..., None], axis=-2) / wsum
    dst_c = jnp.sum(dst * weights[..., None], axis=-2) / wsum
    src0 = src - src_c[..., None, :]
    dst0 = dst - dst_c[..., None, :]
    cov = jnp.einsum("...ni,...nj,...n->...ij", dst0, src0, weights) / wsum[..., None]
    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    D = jnp.ones(cov.shape[:-2] + (3,), dtype=src.dtype)
    D = D.at[..., 2].set(jnp.sign(det))
    R = U @ (D[..., None] * Vt)
    if with_scale:
        var_src = jnp.sum(jnp.sum(src0**2, axis=-1) * weights, axis=-1) / wsum[..., 0]
        scale = jnp.sum(S * D, axis=-1) / jnp.maximum(var_src, 1e-30)
    else:
        scale = jnp.ones(cov.shape[:-2], dtype=src.dtype)
    t = dst_c - scale[..., None] * jnp.einsum("...ij,...j->...i", R, src_c)
    return scale, R, t


__all__ = ["umeyama", "kabsch"]
