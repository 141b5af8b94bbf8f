"""Sharded BA on the 8-device virtual CPU mesh must match single-device BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.parallel import sharded_ba
from colmap_tpu.scene.synthetic_ba import synthetic_ba_problem


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return sharded_ba.make_mesh(jax.devices()[:8])


def test_sharded_matches_single_device(mesh):
    problem, gt, model_id = synthetic_ba_problem(
        num_frames=12, num_points=300, obs_per_point=5, dtype=jnp.float64,
        pixel_noise=0.0, seed=3,
    )
    options = ba.BAOptions(max_iterations=1, pcg_iterations=20)
    masks = ba.default_masks(problem, model_id, options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)

    lam = jnp.asarray(1e-4, dtype=jnp.float64)
    nu = jnp.asarray(2.0, dtype=jnp.float64)
    ref = ba.lm_step(problem, model_id, options, masks, lam, nu)

    padded = sharded_ba.pad_observations(problem, 8)
    sp = sharded_ba.shard_problem(padded, mesh)
    step = sharded_ba.sharded_lm_step(mesh, model_id, options)
    out = step(sp, masks, lam, nu)

    # Same LM step result (costs and updated parameters).
    np.testing.assert_allclose(float(ref[3]), float(out[3]), rtol=1e-10)
    np.testing.assert_allclose(float(ref[4]), float(out[4]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ref[0].points), np.asarray(out[0].points), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(ref[0].quat), np.asarray(out[0].quat), atol=1e-10
    )


def test_sharded_solve_converges(mesh):
    problem, gt, model_id = synthetic_ba_problem(
        num_frames=10, num_points=200, obs_per_point=5, dtype=jnp.float64,
        pixel_noise=0.0, pose_noise=0.01, point_noise=0.01, seed=5,
    )
    options = ba.BAOptions(max_iterations=30, pcg_iterations=40)
    masks = ba.default_masks(problem, model_id, options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    masks = masks._replace(cam_mask=jnp.zeros_like(masks.cam_mask))
    padded = sharded_ba.pad_observations(problem, 8)
    _, summary = sharded_ba.solve_sharded(
        padded, model_id, options, masks, mesh=mesh
    )
    assert summary["num_devices"] == 8
    assert summary["final_cost"] < 1e-3 * summary["initial_cost"]
