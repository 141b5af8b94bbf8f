"""Bundle adjustment tests: noisy synthetic scenes must converge to GT.

reference test strategy: estimators/bundle_adjustment_test.cc and
bundle_adjustment_caspar_test.cc (Caspar validated against Ceres results;
here validated against ground truth + cost reduction invariants).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.estimators.ba_setup import problem_from_reconstruction, update_reconstruction
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, add_noise, synthesize_dataset
from colmap_tpu.sensor import models as camera_models


def _make_problem(seed=0, noise_pose=0.05, noise_point=0.05, noise_px=0.0,
                  model_id=int(camera_models.CameraModelId.SIMPLE_RADIAL)):
    if model_id == int(camera_models.CameraModelId.SIMPLE_RADIAL):
        params = (1280.0, 512.0, 384.0, 0.05)
    elif model_id == int(camera_models.CameraModelId.PINHOLE):
        params = (1280.0, 1280.0, 512.0, 384.0)
    elif model_id == int(camera_models.CameraModelId.OPENCV):
        params = (1280.0, 1280.0, 512.0, 384.0, 0.02, -0.01, 0.001, 0.001)
    opt = SyntheticDatasetOptions(
        num_rigs=4, num_frames_per_rig=3, num_points3D=150, seed=seed,
        camera_model_id=model_id, camera_params=params,
        num_points2D_without_point3D=0,
    )
    recon = synthesize_dataset(opt)
    gt = {
        "poses": {i: recon.cam_from_world(i) for i in recon.reg_image_ids()},
        "points": {p: recon.points3D[p].xyz.copy() for p in recon.points3D},
    }
    rng = np.random.default_rng(seed + 1)
    add_noise(
        recon, rng,
        rig_from_world_translation_stddev=noise_pose,
        rig_from_world_rotation_stddev=noise_pose * 20,
        point3D_stddev=noise_point,
        point2D_stddev=noise_px,
    )
    return recon, gt


def test_cost_and_residuals():
    recon, _ = _make_problem(noise_pose=0.0, noise_point=0.0)
    problem, index = problem_from_reconstruction(recon)
    r = ba.compute_residuals(problem, index["model_id"])
    # Perfect scene: zero reprojection residuals (padded rows carry w=0).
    r_real = jnp.abs(r) * problem.obs_w[:, None]
    assert float(jnp.max(r_real)) < 1e-6
    cost = ba.compute_cost(problem, index["model_id"], ba.BAOptions())
    assert float(cost) < 1e-10


def test_ba_converges_to_ground_truth():
    recon, gt = _make_problem(seed=1, noise_pose=0.03, noise_point=0.05)
    # Gauge frames must sit at ground truth for exact recovery.
    recon.set_cam_from_world(1, gt["poses"][1].copy())
    recon.set_cam_from_world(2, gt["poses"][2].copy())
    problem, index = problem_from_reconstruction(recon)
    options = ba.BAOptions(max_iterations=50, pcg_iterations=50, pcg_rtol=1e-4)
    masks = ba.default_masks(problem, index["model_id"], options)
    # Gauge: fix the two first frames (poses known up to similarity).
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    # Keep intrinsics constant for exact GT comparison.
    masks = masks._replace(cam_mask=jnp.zeros_like(masks.cam_mask))
    # Fixing both frames entirely pins the gauge fully:
    fm = masks.frame_mask.at[1].set(0.0)
    ftm = masks.frame_trans_mask.at[1].set(0.0)
    masks = masks._replace(frame_mask=fm, frame_trans_mask=ftm)

    solved, summary = ba.solve(problem, index["model_id"], options, masks)
    assert summary["final_cost"] < 1e-8 * max(summary["initial_cost"], 1.0)

    update_reconstruction(recon, solved, index)
    # Poses recover ground truth.
    for iid, pose_gt in gt["poses"].items():
        pose = recon.cam_from_world(iid)
        assert pose.angle_to(pose_gt) < np.deg2rad(1e-3)
        np.testing.assert_allclose(pose.t, pose_gt.t, atol=1e-4)
    for pid, xyz_gt in gt["points"].items():
        np.testing.assert_allclose(recon.points3D[pid].xyz, xyz_gt, atol=1e-4)


def test_ba_with_intrinsics_refinement():
    recon, gt = _make_problem(seed=2, noise_pose=0.02, noise_point=0.03)
    # Perturb focal length too.
    for cam in recon.cameras.values():
        cam.params = cam.params.copy()
        cam.params[0] *= 1.02
    problem, index = problem_from_reconstruction(recon)
    options = ba.BAOptions(max_iterations=60, pcg_iterations=60)
    masks = ba.default_masks(problem, index["model_id"], options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    solved, summary = ba.solve(problem, index["model_id"], options, masks)
    # Should reach near-zero cost (exact data, sufficient dof).
    assert summary["final_cost"] < 1e-6 * max(summary["initial_cost"], 1.0)


@pytest.mark.parametrize(
    "model_id",
    [int(camera_models.CameraModelId.PINHOLE), int(camera_models.CameraModelId.OPENCV)],
)
def test_ba_other_models(model_id):
    recon, gt = _make_problem(seed=3, noise_pose=0.02, noise_point=0.02, model_id=model_id)
    # Self-consistent gauge: fix the first two frames at ground truth.
    recon.set_cam_from_world(1, gt["poses"][1].copy())
    recon.set_cam_from_world(2, gt["poses"][2].copy())
    problem, index = problem_from_reconstruction(recon)
    options = ba.BAOptions(max_iterations=40, pcg_iterations=60)
    masks = ba.default_masks(problem, index["model_id"], options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    fm = masks.frame_mask.at[1].set(0.0)
    ftm = masks.frame_trans_mask.at[1].set(0.0)
    masks = masks._replace(
        cam_mask=jnp.zeros_like(masks.cam_mask), frame_mask=fm, frame_trans_mask=ftm
    )
    solved, summary = ba.solve(problem, index["model_id"], options, masks)
    assert summary["final_cost"] < 1e-6 * max(summary["initial_cost"], 1.0)


def test_ba_huber_with_outliers():
    recon, gt = _make_problem(seed=4, noise_pose=0.02, noise_point=0.03)
    recon.set_cam_from_world(1, gt["poses"][1].copy())
    recon.set_cam_from_world(2, gt["poses"][2].copy())
    problem, index = problem_from_reconstruction(recon)
    # Corrupt 5% of observations.
    rng = np.random.default_rng(0)
    n_obs = problem.obs_xy.shape[0]
    n_bad = n_obs // 20
    bad = rng.choice(n_obs, n_bad, replace=False)
    obs_xy = np.array(problem.obs_xy)
    obs_xy[bad] += rng.uniform(50, 200, (n_bad, 2))
    problem = problem._replace(obs_xy=jnp.asarray(obs_xy))
    options = ba.BAOptions(
        max_iterations=60, pcg_iterations=50, loss="huber", loss_scale=2.0
    )
    masks = ba.default_masks(problem, index["model_id"], options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    fm = masks.frame_mask.at[1].set(0.0)
    ftm = masks.frame_trans_mask.at[1].set(0.0)
    masks = masks._replace(
        cam_mask=jnp.zeros_like(masks.cam_mask), frame_mask=fm, frame_trans_mask=ftm
    )
    solved, _ = ba.solve(problem, index["model_id"], options, masks)
    update_reconstruction(recon, solved, index)
    # Robust loss keeps pose error small despite outliers.
    errs = [
        recon.cam_from_world(iid).angle_to(gt["poses"][iid])
        for iid in gt["poses"]
    ]
    assert np.median(errs) < np.deg2rad(0.1)


def test_ba_constant_points():
    """refine_points=False leaves structure untouched."""
    recon, _ = _make_problem(seed=5, noise_pose=0.02, noise_point=0.0)
    problem, index = problem_from_reconstruction(recon)
    pts_before = np.asarray(problem.points).copy()
    options = ba.BAOptions(max_iterations=20, refine_points=False)
    masks = ba.default_masks(problem, index["model_id"], options)
    masks = masks._replace(cam_mask=jnp.zeros_like(masks.cam_mask))
    solved, summary = ba.solve(problem, index["model_id"], options, masks)
    np.testing.assert_array_equal(np.asarray(solved.points), pts_before)
    assert summary["final_cost"] < summary["initial_cost"]


def test_solve_packed_matches_unpacked():
    """Packed scatter-free LM (dense Schur / PCG) reproduces the plain
    solver's optimum (reference: Ceres solver-type selection keeps results
    identical across DENSE_SCHUR / ITERATIVE_SCHUR)."""
    import numpy as np

    from colmap_tpu.scene.synthetic_ba import synthetic_ba_problem

    problem, _gt, model_id = synthetic_ba_problem(
        num_frames=12, num_points=300, obs_per_point=6, dtype=jnp.float32
    )
    rng = np.random.default_rng(1)
    problem = problem._replace(
        points=problem.points
        + 0.02 * jnp.asarray(rng.normal(size=problem.points.shape), jnp.float32),
        t=problem.t
        + 0.01 * jnp.asarray(rng.normal(size=problem.t.shape), jnp.float32),
    )
    options = ba.BAOptions(max_iterations=40, pcg_iterations=40)
    masks = ba.fix_gauge_two_frames(
        ba.default_masks(problem, model_id, options), 0, 1
    )
    s_ref, sum_ref = ba.solve(problem, model_id, options, masks)
    s_pack, sum_pack = ba.solve_packed(problem, model_id, options, masks)
    assert sum_pack["final_cost"] <= sum_ref["final_cost"] * 1.05 + 1e-6
    # Forced PCG path agrees too.
    options_pcg = ba.BAOptions(
        max_iterations=40, pcg_iterations=40, solver_type="pcg"
    )
    s_pcg, sum_pcg = ba.solve_packed(problem, model_id, options_pcg, masks)
    assert sum_pcg["final_cost"] <= sum_ref["final_cost"] * 1.05 + 1e-6
