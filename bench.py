"""Driver benchmark: one JSON line with the headline metric + extras.

Headline (north-star, BASELINE.md): packed bundle-adjustment LM
iterations/s on the accelerator (Ceres-vs-Caspar analogue, reference:
benchmark/runtime/bundle_adjustment.cc:113-196). One LM iteration =
residuals + Jacobians + Schur-reduced camera solve + tentative update on a
200 frames x 50k points x 300k observations synthetic problem in f32.

vs_baseline = speedup over the same solver on the host CPU (stand-in for
the reference's CPU Ceres until reference binaries can be timed on
identical scenes — see BASELINE.md).

The "extra" dict carries the rest of the runtime suite (VERDICT r1 item 3:
extraction img/s, matching + verification pairs/s, PatchMatch px/s,
incremental mapping frames/s, 8-device sharded-BA scaling). Set
COLMAP_TPU_BENCH_FAST=1 to emit only the headline.
"""

import json
import os
import sys

# The sharded-scaling extra needs a multi-device CPU backend alongside the
# accelerator; this must be set before jax initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

from colmap_tpu.utils.jax_cache import enable as _enable_jax_cache  # noqa: E402

_enable_jax_cache()


def main():
    from benchmarks import runtime as rt

    accel = jax.devices()[0]
    headline = rt.bench_ba_packed(device=accel)

    # CPU reference rate for vs_baseline (3 iterations is enough to rate).
    vs_baseline = 1.0
    try:
        cpu = jax.devices("cpu")[0]
        cpu_res = rt.bench_ba_packed(device=cpu, n_iters=3)
        cpu_rate = cpu_res["value"]
        if cpu_rate:
            vs_baseline = headline["value"] / cpu_rate
    except Exception:
        pass

    extra = {}
    if not os.environ.get("COLMAP_TPU_BENCH_FAST"):
        for bench in (
            rt.bench_ba_sharded_scaling,
            rt.bench_extraction,
            rt.bench_matching,
            rt.bench_verification,
            rt.bench_patch_match,
            rt.bench_incremental_mapping,
        ):
            try:
                res = bench()
            except Exception as exc:
                print(f"[bench] {bench.__name__} failed: {exc!r}",
                      file=sys.stderr)
                continue
            if res is not None:
                extra[res["metric"]] = {
                    "value": res["value"], "unit": res["unit"],
                    **res.get("detail", {}),
                }

    print(
        json.dumps(
            {
                "metric": headline["metric"],
                "value": headline["value"],
                "unit": headline["unit"],
                "vs_baseline": round(vs_baseline, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
