"""Precision selection helpers.

The geometric host paths prefer float64 (matching the reference's double
precision, e.g. scene/reconstruction.h Eigen::Vector3d) when JAX x64 is
enabled (tests, CPU pipelines); on TPU — where x64 is unavailable and f32
is the native precision — they silently degrade to float32 instead of
emitting per-call truncation warnings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def floatx():
    """float64 when x64 is enabled, else float32 (no warning)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
