"""Benchmark: bundle-adjustment LM iterations/s on TPU vs host CPU.

North-star metric from BASELINE.md: BA iterations/s (Ceres-vs-Caspar
analogue, reference: benchmark/runtime/bundle_adjustment.cc:113-196).
One LM iteration = residuals + Jacobians + reduced-camera-system solve
(dense Schur: explicit S via MXU matmuls + Cholesky — the packed,
scatter-free path) + tentative update, on a synthetic problem
(200 frames x 50k points x 300k observations, f32 — the Caspar default
precision).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is the speedup over the same solver on the host CPU (the
stand-in for the reference's CPU Ceres baseline until reference
wall-clocks are measured on identical scenes).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


N_ITERS = 10


def time_packed_solve(device, packed, maps, masks, model_id, options):
    from colmap_tpu.estimators import bundle_adjustment as ba

    packed = jax.device_put(packed, device)
    maps = jax.device_put(maps, device)
    masks = jax.device_put(masks, device)

    # Warmup/compile.
    out = ba.lm_solve_fused_packed(packed, maps, model_id, options, masks)
    float(out[1])

    start = time.perf_counter()
    out = ba.lm_solve_fused_packed(packed, maps, model_id, options, masks)
    final_cost = float(out[1])  # host transfer forces completion
    n_done = int(out[2])
    elapsed = time.perf_counter() - start
    return n_done / elapsed, final_cost


def main():
    from colmap_tpu.estimators import bundle_adjustment as ba
    from colmap_tpu.scene.synthetic_ba import synthetic_ba_problem

    problem, _gt, model_id = synthetic_ba_problem(
        num_frames=200, num_points=50_000, obs_per_point=6, dtype=jnp.float32,
        pixel_noise=0.5, pose_noise=0.02, point_noise=0.02,
    )
    options = ba.BAOptions(
        max_iterations=N_ITERS, pcg_iterations=20, function_tolerance=0.0
    )
    masks = ba.default_masks(problem, model_id, options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    packed, maps, _caps = ba.pack_problem(problem)

    accel = jax.devices()[0]
    tpu_rate, _ = time_packed_solve(accel, packed, maps, masks, model_id, options)

    try:
        cpu = jax.devices("cpu")[0]
        cpu_options = ba.BAOptions(
            max_iterations=3, pcg_iterations=20, function_tolerance=0.0
        )
        cpu_rate, _ = time_packed_solve(
            cpu, packed, maps, masks, model_id, cpu_options
        )
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
