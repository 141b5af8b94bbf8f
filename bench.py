"""Benchmark: bundle-adjustment LM iterations/s on TPU vs host CPU.

North-star metric from BASELINE.md: BA iterations/s (Ceres-vs-Caspar
analogue, reference: benchmark/runtime/bundle_adjustment.cc:113-196).
One LM iteration = full Jacobian build + Schur reduction + PCG solve +
update on a synthetic problem (200 frames x 50k points x 300k observations,
f32 — the Caspar default precision).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is the speedup over the same solver on the host CPU (the
stand-in for the reference's CPU Ceres baseline until reference wall-clocks
are measured on identical scenes).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def time_lm(device, problem, masks, model_id, options, n_iters=10):
    from colmap_tpu.estimators import bundle_adjustment as ba

    problem = jax.device_put(problem, device)
    masks = jax.device_put(masks, device)
    lam = jax.device_put(jnp.asarray(1e-4, dtype=jnp.float32), device)
    nu = jax.device_put(jnp.asarray(2.0, dtype=jnp.float32), device)

    # Warmup/compile.
    out = ba.lm_step(problem, model_id, options, masks, lam, nu)
    jax.block_until_ready(out)

    start = time.perf_counter()
    p, l, n = problem, lam, nu
    for _ in range(n_iters):
        p, l, n, cost, new_cost, acc = ba.lm_step(p, model_id, options, masks, l, n)
    jax.block_until_ready((p, l, n))
    elapsed = time.perf_counter() - start
    return n_iters / elapsed, float(new_cost)


def main():
    from colmap_tpu.estimators import bundle_adjustment as ba
    from colmap_tpu.scene.synthetic_ba import synthetic_ba_problem

    problem, _gt, model_id = synthetic_ba_problem(
        num_frames=200, num_points=50_000, obs_per_point=6, dtype=jnp.float32,
        pixel_noise=0.5, pose_noise=0.02, point_noise=0.02,
    )
    options = ba.BAOptions(max_iterations=1, pcg_iterations=20,
                           obs_sorted_by_point=True)
    masks = ba.default_masks(problem, model_id, options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)

    devices = jax.devices()
    accel = devices[0]
    tpu_rate, _ = time_lm(accel, problem, masks, model_id, options)

    try:
        cpu = jax.devices("cpu")[0]
        cpu_rate, _ = time_lm(cpu, problem, masks, model_id, options, n_iters=3)
    except Exception:
        cpu_rate = None

    vs_baseline = tpu_rate / cpu_rate if cpu_rate else 1.0
    print(
        json.dumps(
            {
                "metric": "ba_lm_iterations_per_s_200f_50kp_300ko",
                "value": round(tpu_rate, 3),
                "unit": "iter/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
