"""Sharded PACKED fused LM solver vs the single-device packed path.

VERDICT r1 item 1: the distributed fast path must be the packed
scatter-free solver (the benchmarked one), not the unpacked lm_step.
These tests pin (a) numerical agreement of the shard_map program with
solve_packed on the 8-device virtual CPU mesh and (b) convergence of the
full sharded solve on a synthetic problem.
Reference analog: bundle_adjustment_caspar.h:107-120 (LM+PCG throughput).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.parallel import sharded_ba
from colmap_tpu.scene.synthetic_ba import synthetic_ba_problem


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return sharded_ba.make_mesh(jax.devices()[:8], axis_name="d")


def test_sharded_packed_matches_single_device(mesh):
    problem, gt, model_id = synthetic_ba_problem(
        num_frames=12, num_points=300, obs_per_point=5, dtype=jnp.float64,
        pixel_noise=0.3, pose_noise=0.01, point_noise=0.01, seed=7,
    )
    options = ba.BAOptions(
        max_iterations=8, pcg_iterations=40, function_tolerance=0.0,
        solver_type="pcg",
    )
    masks = ba.default_masks(problem, model_id, options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)

    ref_problem, ref_summary = ba.solve_packed(problem, model_id, options, masks)
    out, summary = sharded_ba.solve_sharded_packed(
        problem, model_id, options, masks, mesh=mesh, axis_name="d"
    )

    assert summary["num_devices"] == 8
    # Same LM trajectory: identical iteration count and near-identical cost.
    assert summary["num_iterations"] == ref_summary["num_iterations"]
    np.testing.assert_allclose(
        summary["final_cost"], ref_summary["final_cost"], rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out.quat), np.asarray(ref_problem.quat), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out.points), np.asarray(ref_problem.points), atol=1e-7
    )


def test_sharded_packed_converges_and_improves(mesh):
    problem, gt, model_id = synthetic_ba_problem(
        num_frames=10, num_points=240, obs_per_point=5, dtype=jnp.float64,
        pixel_noise=0.0, pose_noise=0.01, point_noise=0.01, seed=11,
    )
    options = ba.BAOptions(max_iterations=30, pcg_iterations=40)
    masks = ba.default_masks(problem, model_id, options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    masks = masks._replace(cam_mask=jnp.zeros_like(masks.cam_mask))
    out, summary = sharded_ba.solve_sharded_packed(
        problem, model_id, options, masks, mesh=mesh, axis_name="d"
    )
    assert summary["final_cost"] < 1e-3 * summary["initial_cost"]


def test_pack_problem_sharded_partition_roundtrip(mesh):
    problem, _gt, model_id = synthetic_ba_problem(
        num_frames=6, num_points=100, obs_per_point=4, dtype=jnp.float64,
        seed=3,
    )
    n_dev = 8
    stacked, maps, info = sharded_ba.pack_problem_sharded(problem, n_dev)
    n_loc = info["n_loc"]
    assert stacked.points.shape == (n_dev, n_loc, 3)
    # Every original observation appears exactly once across shards
    # (obs_w > 0 marks real rows in the packed layout).
    total_real = sum(
        float(jnp.sum(stacked.obs_w[d] > 0)) for d in range(n_dev)
    )
    assert total_real == problem.obs_xy.shape[0]
    # Per-shard packed cost sums to the global cost.
    options = ba.BAOptions()
    capf = info["capf"]
    total = 0.0
    for d in range(n_dev):
        shard = stacked._replace(
            points=stacked.points[d], obs_frame=stacked.obs_frame[d],
            obs_cam=stacked.obs_cam[d], obs_point=stacked.obs_point[d],
            obs_xy=stacked.obs_xy[d], obs_w=stacked.obs_w[d],
        )
        shard_maps = jax.tree.map(lambda x: x[d], maps)
        total += float(ba.compute_cost_packed(
            shard, model_id, options, capf, shard_maps
        ))
    np.testing.assert_allclose(
        total, float(ba.compute_cost(problem, model_id, options)), rtol=1e-10
    )
