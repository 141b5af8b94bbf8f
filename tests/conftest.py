"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

The real TPU is reserved for benchmarks (bench.py); unit tests exercise the
same code paths on CPU where float64 is available for tight geometric
tolerances, and an 8-device virtual mesh validates all sharded code.

Note: the environment's sitecustomize force-registers the axon TPU platform
and overrides JAX_PLATFORMS, so the override must go through jax.config
*after* importing jax but before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# No background compile warming under tests: concurrent warm-thread and
# main-thread XLA:CPU compiles in one long-lived process can segfault
# inside backend_compile_and_load (reproduced at test_rig_mapper with the
# r5 warm pool; same crash class as the historical serial-suite failure).
# Warming exists to hide compile latency in pipelines/benches, which tests
# do not measure.
os.environ.setdefault("COLMAP_TPU_NO_WARM", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persist compiled executables across test runs (compiles dominate suite
# wall-clock; the cache turns repeat runs into warm starts).
from colmap_tpu.utils.jax_cache import enable as _enable_jax_cache  # noqa: E402

_enable_jax_cache()


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    A full serial suite run accumulates hundreds of live XLA:CPU
    executables in one process; past ~120 tests the NEXT big compile
    segfaults inside backend_compile_and_load (reproduced twice at
    test_generalized_pose; the same test passes in a fresh process).
    Dropping the in-memory caches between modules keeps the process lean —
    the persistent compilation cache makes re-compiles cheap warm loads.
    """
    yield
    jax.clear_caches()
