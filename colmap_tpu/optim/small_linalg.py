"""Batched small-matrix eigh/SVD as pure XLA ops (no LAPACK custom calls).

Motivation (measured on the TPU): XLA lowers ``jnp.linalg.eigh`` to an
iterative ``@Eigh`` custom call configured for 100 Jacobi iterations; inside
the vmapped RANSAC trial loop one batched 9x9 eigh costs ~110 ms per loop
step and accounted for 91% of two-view verification device time. For n <= ~16
a fixed-sweep *parallel cyclic Jacobi* — rotations applied as batched n x n
matmuls, fully unrolled — runs the same decomposition in ~1-2 ms and keeps
the whole RANSAC step on the VPU/MXU.

Convergence: cyclic Jacobi is quadratically convergent; for n = 9, 7 sweeps
reach f32 machine precision and 9 sweeps f64 (validated against
jnp.linalg.eigh in tests/test_solvers.py).

reference analogue: PoseLib's small fixed-size eigen routines inside the
minimal solvers (estimators/solvers/poselib_utils.h).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


def bmm_small(a, b):
    """Batched (..., m, k) @ (..., k, n) for tiny m/k/n as a broadcast
    multiply-sum. XLA lowers batched tiny dot_generals to an MXU path that
    runs ~5x slower than this on TPU (a 3x3 batched matmul at 8192 batch
    measures ~5 ms as dot_general vs ~1 ms as mult-sum)."""
    return (a[..., :, :, None] * b[..., None, :, :]).sum(-2)


@lru_cache(maxsize=None)
def _round_robin(n: int):
    """Tournament pairing: rounds of disjoint (p, q) index pairs covering
    all n*(n-1)/2 pairs (dummy slot for odd n)."""
    m = n + (n % 2)
    arr = list(range(m))
    rounds = []
    for _ in range(m - 1):
        pairs = sorted(
            (min(arr[i], arr[m - 1 - i]), max(arr[i], arr[m - 1 - i]))
            for i in range(m // 2)
            if arr[i] < n and arr[m - 1 - i] < n
        )
        rounds.append(tuple(pairs))
        arr = [arr[0], arr[-1]] + arr[1:-1]
    return tuple(rounds)


def eigh_small(A, sweeps: int | None = None):
    """Symmetric eigendecomposition of (..., n, n), ascending eigenvalues.

    Drop-in for jnp.linalg.eigh on small n (<= ~16). Eigenvector signs may
    differ from LAPACK (both are valid)."""
    n = A.shape[-1]
    dtype = A.dtype
    if sweeps is None:
        sweeps = 9 if dtype == jnp.float64 else 7
    eye = jnp.eye(n, dtype=dtype)
    V0 = jnp.broadcast_to(eye, A.shape)
    A0 = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    rounds = _round_robin(n)

    def one_sweep(_, AV):
        A, V = AV
        for pairs in rounds:
            ps = np.asarray([p for p, _ in pairs])
            qs = np.asarray([q for _, q in pairs])
            if len(pairs) == 1 and n <= 4:
                # Static scalar reads (gathers with index arrays cost ~1 ms
                # each on the TPU at RANSAC batch sizes).
                (p0, q0) = pairs[0]
                app = A[..., p0, p0][..., None]
                aqq = A[..., q0, q0][..., None]
                apq = A[..., p0, q0][..., None]
            else:
                app = A[..., ps, ps]
                aqq = A[..., qs, qs]
                apq = A[..., ps, qs]
            # Algebraic rotation (Golub & Van Loan 8.4): no trig — XLA
            # CPU's f64 arctan2 is only ~3e-8 accurate, which would cap
            # the whole decomposition at f32 quality.
            # RANGE-SAFE rotation: this environment's XLA:CPU implements
            # f64 as double-float with f32 EXPONENT range (x*y or x+y
            # beyond ~3.4e38 -> NaN, quotients below ~1e-38 flush to 0).
            # Therefore: decide to skip negligible rotations BEFORE forming
            # tau, so every intermediate stays within f32 range. Skipping
            # when |apq|*1e12 < |diff| bounds |tau| <= 5e11 (tau^2 <=
            # 2.5e23, in range); the skipped rotations perturb eigenvalues
            # by O((apq/diff)^2) ~ 1e-24 and vectors by O(1e-12).
            diff = aqq - app
            skip = (apq == 0) | (jnp.abs(apq) * 1e12 < jnp.abs(diff))
            denom = 2.0 * apq
            skip = skip | (denom == 0)
            tau = diff / jnp.where(skip, 1.0, denom)
            tau = jnp.where(skip, 0.0, tau)
            t = jnp.sign(tau) / (
                jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)
            )
            t = jnp.where(tau == 0, 1.0, t)
            t = jnp.where(skip, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            # J = I with [[c, s], [-s, c]] blocks at the (p, q) pairs;
            # A <- Jᵀ A J zeroes every A[p, q] of this round.
            if len(pairs) == 1 and n <= 4:
                # Single rotation on a tiny matrix: build J by stacking
                # scalars — each batched .at[] set lowers to a ~1 ms
                # dynamic-update-slice on the TPU, dominating 3x3 SVDs.
                (p, q) = pairs[0]
                c1 = c[..., 0]
                s1 = s[..., 0]
                one = jnp.ones_like(c1)
                zero_ = jnp.zeros_like(c1)
                cols = []
                for col in range(n):
                    rows = []
                    for row in range(n):
                        if row == p and col == p:
                            rows.append(c1)
                        elif row == q and col == q:
                            rows.append(c1)
                        elif row == p and col == q:
                            rows.append(s1)
                        elif row == q and col == p:
                            rows.append(-s1)
                        elif row == col:
                            rows.append(one)
                        else:
                            rows.append(zero_)
                    cols.append(jnp.stack(rows, axis=-1))
                J = jnp.stack(cols, axis=-1)
            else:
                J = jnp.broadcast_to(eye, A.shape)
                J = J.at[..., ps, ps].set(c)
                J = J.at[..., qs, qs].set(c)
                J = J.at[..., ps, qs].set(s)
                J = J.at[..., qs, ps].set(-s)
            # HIGHEST precision: default matmuls run through bf16 units on
            # both the TPU MXU and this host's AMX-BF16 CPU backend, which
            # would quantize the whole decomposition to ~3 digits.
            hi = jax.lax.Precision.HIGHEST
            A = jnp.matmul(
                jnp.matmul(jnp.swapaxes(J, -1, -2), A, precision=hi),
                J, precision=hi,
            )
            V = jnp.matmul(V, J, precision=hi)
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        return A, V

    # Small n (3x3/4x4 — the SVD/rotation workhorses inside RANSAC trial
    # loops): fully unroll — a fori_loop here costs ~ms per iteration in
    # loop-state copies on the TPU, dwarfing the arithmetic. Larger n:
    # fori_loop over sweeps keeps compiled program size (and TPU compile
    # time) ~sweeps-times smaller than a full unroll.
    if n <= 4:
        AV = (A0, V0)
        for i in range(sweeps):
            AV = one_sweep(i, AV)
        A, V = AV
    else:
        A, V = jax.lax.fori_loop(0, sweeps, one_sweep, (A0, V0))
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def svd3x3(E, sweeps: int | None = None):
    """SVD of (..., 3, 3): returns (U, S, Vt) with S descending and U, V
    orthonormal (right-handed completion of the third column).

    Built on eigh_small(EᵀE); accurate whenever the two largest singular
    values are non-degenerate-zero — the case on the RANSAC hot paths
    (rank-2 projection of F / essential-manifold projection of E, where
    s0, s1 > 0 for any non-degenerate sample; degenerate samples are
    NaN-poisoned and rejected by the model-validity mask upstream)."""
    EtE = jnp.matmul(jnp.swapaxes(E, -1, -2), E,
                     precision=jax.lax.Precision.HIGHEST)
    w, V = eigh_small(EtE, sweeps=sweeps)
    # Ascending -> descending.
    w = w[..., ::-1]
    V = V[..., ::-1]
    S = jnp.sqrt(jnp.maximum(w, 0.0))
    EV = jnp.matmul(E, V, precision=jax.lax.Precision.HIGHEST)
    eps = jnp.asarray(1e-30, E.dtype)
    u0 = EV[..., 0] / jnp.maximum(S[..., 0, None], eps)
    u1 = EV[..., 1] / jnp.maximum(S[..., 1, None], eps)
    # Re-orthogonalize u1 against u0 (guards clustered singular values).
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(
        jnp.linalg.norm(u1, axis=-1, keepdims=True), eps
    )
    u2 = jnp.cross(u0, u1)
    # Align the completed third column with E v2 (its sign is free only
    # when s2 = 0; for full-rank inputs the reconstruction needs it).
    sign2 = jnp.sign(jnp.sum(u2 * EV[..., 2], axis=-1, keepdims=True))
    u2 = u2 * jnp.where(sign2 == 0, 1.0, sign2)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, S, jnp.swapaxes(V, -1, -2)


def nullspace_small(A, k: int):
    """Orthonormal null-space basis (..., n, k) of A (..., m, n) with m < n.

    Last k columns of the full Q from a Householder QR of Aᵀ — a DIRECT
    method: ~m static reflection steps of cheap vector ops, no iteration,
    no matmuls, no scatters. This is the hot-path replacement for
    "eigh(AᵀA) smallest eigenvectors" inside the vmapped RANSAC minimal
    solvers (the reference reaches the same nullspaces through PoseLib's
    dense elimination). For rank-deficient samples the returned columns
    still lie inside the (larger) null space; degenerate models score
    poorly downstream exactly as before.
    """
    m = A.shape[-2]
    n = A.shape[-1]
    assert m < n, "nullspace_small expects a wide matrix"
    B = jnp.swapaxes(A, -1, -2)  # (..., n, m)
    refl = []
    for j in range(m):
        x = B[..., j:, j]
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1))
        sign = jnp.where(x[..., 0] >= 0, 1.0, -1.0)
        alpha = -sign * norm
        v = x.at[..., 0].add(-alpha)
        vn = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        v = v / jnp.maximum(vn, 1e-30)
        scale = jnp.where(vn[..., 0] > 1e-30, 2.0, 0.0)[..., None]
        w = (v[..., :, None] * B[..., j:, :]).sum(-2)
        B = B.at[..., j:, :].add(
            -scale[..., None, :] * v[..., :, None] * w[..., None, :]
        )
        refl.append((j, v, scale))
    Q = jnp.broadcast_to(
        jnp.eye(n, dtype=A.dtype), A.shape[:-2] + (n, n)
    )
    for j, v, scale in reversed(refl):
        w = (v[..., :, None] * Q[..., j:, :]).sum(-2)
        Q = Q.at[..., j:, :].add(
            -scale[..., None, :] * v[..., :, None] * w[..., None, :]
        )
    return Q[..., :, m:m + k]
