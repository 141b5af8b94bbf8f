"""Global mapper tests: rotation averaging, positioning, end-to-end.

reference test strategy: estimators/rotation_averaging tests,
global_positioning tests, controllers/global_pipeline_test.cc (synthetic
database with relative poses -> ReconstructionNear ground truth).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from colmap_tpu.estimators.alignment import compare_reconstructions
from colmap_tpu.estimators.global_positioning import solve_global_positioning
from colmap_tpu.estimators.rotation_averaging import estimate_rotations
from colmap_tpu.estimators.solvers.similarity import umeyama
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.scene.types import Pose
from colmap_tpu.sfm.global_pipeline import GlobalPipeline, GlobalPipelineOptions


def _random_quats(rng, n):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def _relative_quat(q1, q2):
    """q_rel with q2 = q_rel ⊗ q1."""
    import jax.numpy as jnp

    from colmap_tpu.geometry import rotation as rot

    return np.asarray(
        rot.quat_multiply(jnp.asarray(q2), rot.quat_conjugate(jnp.asarray(q1)))
    )


def test_rotation_averaging_exact():
    rng = np.random.default_rng(0)
    n = 20
    gt = _random_quats(rng, n)
    edges, rels = [], []
    # Ring + random chords.
    for i in range(n):
        edges.append((i, (i + 1) % n))
    for _ in range(2 * n):
        i, j = rng.choice(n, 2, replace=False)
        edges.append((int(i), int(j)))
    for (i, j) in edges:
        rels.append(_relative_quat(gt[i], gt[j]))
    est = estimate_rotations(n, np.asarray(edges), np.asarray(rels))
    # Compare up to global rotation: q_err = est_i ⊗ gt_i⁻¹ must be constant.
    import jax.numpy as jnp

    from colmap_tpu.geometry import rotation as rot

    # Gauge is a right-multiplied world rotation: gt_i^-1 ⊗ est_i constant.
    err = np.array(
        rot.quat_multiply(rot.quat_conjugate(jnp.asarray(gt)), jnp.asarray(est))
    )
    ref = err[0] / np.linalg.norm(err[0])
    for e in err:
        e = e / np.linalg.norm(e)
        angle = 2 * np.arccos(min(1.0, abs(float(np.dot(e, ref)))))
        assert np.rad2deg(angle) < 0.05


def test_rotation_averaging_with_outliers():
    rng = np.random.default_rng(1)
    n = 25
    gt = _random_quats(rng, n)
    edges, rels = [], []
    for i in range(n):
        edges.append((i, (i + 1) % n))
    for _ in range(4 * n):
        i, j = rng.choice(n, 2, replace=False)
        edges.append((int(i), int(j)))
    for k, (i, j) in enumerate(edges):
        if k % 10 == 9:  # 10% outlier edges
            rels.append(_random_quats(rng, 1)[0])
        else:
            rels.append(_relative_quat(gt[i], gt[j]))
    est = estimate_rotations(n, np.asarray(edges), np.asarray(rels))
    import jax.numpy as jnp

    from colmap_tpu.geometry import rotation as rot

    err = np.asarray(
        rot.quat_multiply(rot.quat_conjugate(jnp.asarray(gt)), jnp.asarray(est))
    )
    ref = err[0] / np.linalg.norm(err[0])
    angles = []
    for e in err:
        e = e / np.linalg.norm(e)
        angles.append(np.rad2deg(2 * np.arccos(min(1.0, abs(float(np.dot(e, ref)))))))
    assert np.median(angles) < 0.5


def test_global_positioning_recovers_geometry():
    rng = np.random.default_rng(2)
    n_cams, n_pts = 12, 80
    centers_gt = 5.0 * rng.standard_normal((n_cams, 3))
    points_gt = rng.standard_normal((n_pts, 3))
    obs_cam, obs_point, dirs = [], [], []
    for p in range(n_pts):
        for c in rng.choice(n_cams, 6, replace=False):
            d = points_gt[p] - centers_gt[c]
            dirs.append(d / np.linalg.norm(d))
            obs_cam.append(c)
            obs_point.append(p)
    centers, points = solve_global_positioning(
        n_cams, n_pts, np.asarray(obs_cam), np.asarray(obs_point), np.asarray(dirs)
    )
    # Solution defined up to similarity: align and compare.
    import jax.numpy as jnp

    s, R, t = umeyama(jnp.asarray(centers), jnp.asarray(centers_gt))
    aligned = float(s) * centers @ np.asarray(R).T + np.asarray(t)
    err = np.linalg.norm(aligned - centers_gt, axis=1)
    assert err.max() < 1e-3 * 5.0
    aligned_pts = float(s) * points @ np.asarray(R).T + np.asarray(t)
    assert np.linalg.norm(aligned_pts - points_gt, axis=1).max() < 1e-2


@pytest.mark.parametrize("has_rel_pose", [True, False])
def test_global_pipeline_end_to_end(has_rel_pose):
    """has_rel_pose=False is the realistic path: relative poses are NOT
    stored in the database and must be decomposed from E on the fly —
    exactly what the global_mapper CLI does on real data (reference:
    controllers/global_pipeline.cc decomposes via
    EstimateTwoViewGeometryPose)."""
    opt = SyntheticDatasetOptions(
        num_rigs=1,
        num_frames_per_rig=8,
        num_points3D=150,
        num_points2D_without_point3D=5,
        seed=31,
        two_view_geometry_has_relative_pose=has_rel_pose,
        camera_has_prior_focal_length=True,
    )
    db = Database(":memory:")
    gt = synthesize_dataset(opt, database=db)
    pipeline = GlobalPipeline(GlobalPipelineOptions(), db)
    recon = pipeline.run()
    assert recon is not None
    assert recon.num_reg_frames() == 8
    cmp = compare_reconstructions(recon, gt)
    assert cmp["num_common_images"] == 8
    assert cmp["max_rotation_error_deg"] < 0.5
    assert cmp["max_center_error"] < 0.05


def test_rotation_averaging_gravity_stratified():
    """1-DOF stratified mode (reference: rotation_averaging.h:25-102):
    with exact gravity priors on every frame, noisy relative rotations
    perturb only the yaw; the stratified solution must (a) satisfy the
    gravity constraint exactly and (b) beat the unstratified solution."""
    import jax.numpy as jnp

    from colmap_tpu.geometry import rotation as rot
    from colmap_tpu.estimators.rotation_averaging import (
        RotationAveragingOptions,
    )

    rng = np.random.default_rng(7)
    n = 20
    g_world = np.array([0.0, 1.0, 0.0])
    gt = _random_quats(rng, n)
    gravity_cam = np.stack([
        np.asarray(rot.quat_rotate(jnp.asarray(q), jnp.asarray(g_world)))
        for q in gt
    ])
    edges, rels = [], []
    for i in range(n):
        edges.append((i, (i + 1) % n))
    for _ in range(3 * n):
        i, j = rng.choice(n, 2, replace=False)
        edges.append((int(i), int(j)))
    for (i, j) in edges:
        q = _relative_quat(gt[i], gt[j])
        # Noise ~2 deg on every edge.
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        ang = np.deg2rad(rng.normal(0, 2.0))
        dq = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
        q = np.asarray(rot.quat_multiply(jnp.asarray(dq), jnp.asarray(q)))
        rels.append(q / np.linalg.norm(q))

    def errs(est):
        err = np.asarray(rot.quat_multiply(
            rot.quat_conjugate(jnp.asarray(gt)), jnp.asarray(est)))
        # Gauge here is a yaw about g_world; compare angular distance after
        # removing the best common gauge rotation.
        ref = err[0] / np.linalg.norm(err[0])
        out = []
        for e in err:
            e = e / np.linalg.norm(e)
            out.append(np.rad2deg(
                2 * np.arccos(min(1.0, abs(float(np.dot(e, ref)))))))
        return np.asarray(out)

    est_plain = estimate_rotations(
        n, np.asarray(edges), np.asarray(rels),
        options=RotationAveragingOptions(use_gravity=False),
    )
    est_grav = estimate_rotations(
        n, np.asarray(edges), np.asarray(rels),
        gravity_cam=gravity_cam,
        options=RotationAveragingOptions(),
    )
    # (a) constraint satisfied to numerical precision.
    for i in range(n):
        g_pred = np.asarray(rot.quat_rotate(
            jnp.asarray(est_grav[i]), jnp.asarray(g_world)))
        assert np.linalg.norm(g_pred - gravity_cam[i]) < 1e-9
    # (b) stratified strictly better than unstratified on this noise.
    assert np.median(errs(est_grav)) < np.median(errs(est_plain))


def test_global_pipeline_with_gravity_priors():
    opt = SyntheticDatasetOptions(
        num_rigs=1,
        num_frames_per_rig=8,
        num_points3D=120,
        num_points2D_without_point3D=5,
        seed=11,
        two_view_geometry_has_relative_pose=False,
        camera_has_prior_focal_length=True,
        prior_gravity=True,
    )
    db = Database(":memory:")
    gt = synthesize_dataset(opt, database=db)
    pipeline = GlobalPipeline(GlobalPipelineOptions(), db)
    recon = pipeline.run()
    assert recon is not None
    assert recon.num_reg_frames() == 8
    cmp = compare_reconstructions(recon, gt)
    assert cmp["max_rotation_error_deg"] < 0.5
    assert cmp["max_center_error"] < 0.05
