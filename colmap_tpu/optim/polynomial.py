"""Closed-form low-degree polynomial root finding, batched and jit-safe.

reference behavior: src/colmap/math/polynomial.{h,cc} uses companion-matrix
eigenvalues, which require nonsymmetric eig (unavailable on TPU). Here cubic
roots use the trigonometric/Cardano closed form and quartics use Ferrari's
resolvent — branch-free ``where`` selections over arbitrary batch shapes.
Complex/invalid roots are flagged via the returned mask.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_quadratic(a, b, c):
    """Real roots of a x^2 + b x + c. Returns (roots (..., 2), mask)."""
    disc = b * b - 4 * a * c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # Numerically stable form.
    q = -0.5 * (b + jnp.sign(b) * sq)
    safe_a = jnp.where(jnp.abs(a) < 1e-30, 1.0, a)
    safe_q = jnp.where(jnp.abs(q) < 1e-30, 1.0, q)
    r1 = q / safe_a
    r2 = c / safe_q
    lin = jnp.abs(a) < 1e-30
    r_lin = -c / jnp.where(jnp.abs(b) < 1e-30, 1.0, b)
    roots = jnp.stack(
        [jnp.where(lin, r_lin, r1), jnp.where(lin, r_lin, r2)], axis=-1
    )
    mask = jnp.stack([ok | lin, (ok & ~lin)], axis=-1)
    return roots, mask


def solve_cubic(a, b, c, d):
    """Real roots of a x^3 + b x^2 + c x + d (a assumed nonzero).

    Returns (roots (..., 3), mask (..., 3)) — mask marks real roots; invalid
    entries repeat the first real root (always exists for a cubic).
    """
    safe_a = jnp.where(jnp.abs(a) < 1e-30, 1.0, a)
    b_, c_, d_ = b / safe_a, c / safe_a, d / safe_a
    # Depressed cubic t^3 + p t + q with x = t - b/3.
    p = c_ - b_ * b_ / 3.0
    q = 2.0 * b_**3 / 27.0 - b_ * c_ / 3.0 + d_
    shift = -b_ / 3.0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # Case disc > 0: one real root (Cardano).
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    root_single = u + v + shift

    # Case disc <= 0: three real roots (trigonometric).
    p_neg = jnp.minimum(p, -1e-30)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    k = jnp.arange(3.0)
    t3 = m[..., None] * jnp.cos(theta[..., None] - 2.0 * jnp.pi * k / 3.0)
    roots3 = t3 + shift[..., None]

    three = (disc <= 0)[..., None]
    roots = jnp.where(three, roots3, root_single[..., None])
    mask = jnp.concatenate(
        [jnp.ones_like(three), three, three], axis=-1
    )
    return roots, mask


def solve_quartic(a, b, c, d, e):
    """Real roots of a x^4 + b x^3 + c x^2 + d x + e via Ferrari.

    Returns (roots (..., 4), mask (..., 4)).
    """
    safe_a = jnp.where(jnp.abs(a) < 1e-30, 1.0, a)
    b_, c_, d_, e_ = b / safe_a, c / safe_a, d / safe_a, e / safe_a
    # Depressed quartic y^4 + p y^2 + q y + r with x = y - b/4.
    p = c_ - 3.0 * b_**2 / 8.0
    q = d_ - b_ * c_ / 2.0 + b_**3 / 8.0
    r = e_ - b_ * d_ / 4.0 + b_**2 * c_ / 16.0 - 3.0 * b_**4 / 256.0
    shift = -b_ / 4.0

    # Resolvent cubic: m^3 + 2 p m^2 + (p^2 - 4 r) m - q^2 = 0; need m > 0.
    mroots, mmask = solve_cubic(
        jnp.ones_like(p), 2.0 * p, p * p - 4.0 * r, -q * q
    )
    # Pick the largest real positive root.
    mcand = jnp.where(mmask, mroots, -jnp.inf)
    m = jnp.max(mcand, axis=-1)
    m_pos = m > 1e-12

    sqm = jnp.sqrt(jnp.maximum(m, 0.0))
    safe_sqm = jnp.where(sqm < 1e-30, 1.0, sqm)
    # y^2 ± sqm y + (p + m)/2 ∓ q/(2 sqm) = 0
    half = (p + m) / 2.0
    qterm = q / (2.0 * safe_sqm)
    r1, m1 = solve_quadratic(jnp.ones_like(m), sqm, half - qterm)
    r2, m2 = solve_quadratic(jnp.ones_like(m), -sqm, half + qterm)

    # Degenerate q≈0: biquadratic y^4 + p y^2 + r = 0.
    z, zm = solve_quadratic(jnp.ones_like(p), p, r)
    z_ok = zm & (z >= 0)
    sz = jnp.sqrt(jnp.maximum(z, 0.0))
    biq_roots = jnp.concatenate([sz, -sz], axis=-1)
    biq_mask = jnp.concatenate([z_ok, z_ok], axis=-1)

    use_biq = (jnp.abs(q) < 1e-12) | ~m_pos
    roots = jnp.where(
        use_biq[..., None],
        biq_roots,
        jnp.concatenate([r1, r2], axis=-1),
    )
    mask = jnp.where(
        use_biq[..., None],
        biq_mask,
        jnp.concatenate([m1, m2], axis=-1),
    )
    return roots + shift[..., None], mask
