"""Tests for polynomial roots and minimal solvers.

reference test strategy: estimators/solvers/*_test.cc — random geometric
configurations with exact data must be recovered to machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colmap_tpu.estimators.solvers.epipolar import (
    essential_eight_point,
    essential_five_point,
    fundamental_eight_point,
    fundamental_seven_point,
    homography_dlt,
    homography_transfer_error,
)
from colmap_tpu.estimators.solvers.p3p import kabsch, p3p
from colmap_tpu.estimators.solvers.similarity import umeyama
from colmap_tpu.geometry.essential import (
    decompose_essential_matrix,
    essential_from_pose,
    pose_from_essential_matrix,
    sampson_error,
)
from colmap_tpu.geometry.rigid3 import Rigid3
from colmap_tpu.geometry import rotation as rot
from colmap_tpu.optim.polynomial import solve_cubic, solve_quartic


def test_solve_cubic_vs_numpy():
    rng = np.random.default_rng(0)
    for _ in range(50):
        coeffs = rng.standard_normal(4)
        coeffs[0] = np.sign(coeffs[0]) * max(abs(coeffs[0]), 0.1)
        roots, mask = solve_cubic(*[jnp.asarray(c) for c in coeffs])
        np_roots = np.roots(coeffs)
        real = sorted(r.real for r in np_roots if abs(r.imag) < 1e-8)
        got = sorted(np.asarray(roots)[np.asarray(mask)])
        # At least the real roots are found.
        assert len(got) >= len(real)
        for r in real:
            assert min(abs(g - r) for g in got) < 1e-6


def test_solve_quartic_vs_numpy():
    rng = np.random.default_rng(1)
    found_total, expected_total = 0, 0
    for _ in range(100):
        coeffs = rng.standard_normal(5)
        coeffs[0] = np.sign(coeffs[0]) * max(abs(coeffs[0]), 0.1)
        roots, mask = solve_quartic(*[jnp.asarray(c) for c in coeffs])
        np_roots = np.roots(coeffs)
        real = [r.real for r in np_roots if abs(r.imag) < 1e-8]
        got = np.asarray(roots)[np.asarray(mask)]
        expected_total += len(real)
        for r in real:
            if len(got) and min(abs(g - r) for g in got) < 1e-5 * max(1, abs(r)):
                found_total += 1
    assert found_total >= 0.98 * expected_total


def _random_two_view(rng, n, noise=0.0):
    """Generate normalized-coordinate correspondences from a random pose."""
    axis = rng.standard_normal(3)
    angle = rng.uniform(0.1, 0.5)
    q = np.asarray(rot.quat_from_axis_angle(jnp.asarray(axis), angle))
    t = rng.standard_normal(3)
    t /= np.linalg.norm(t)
    pose = Rigid3(jnp.asarray(q), jnp.asarray(t))  # cam2_from_cam1
    # Points in front of both cameras.
    X = rng.uniform(-2, 2, (n, 3))
    X[:, 2] = rng.uniform(4, 10, n)
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = np.asarray(pose.apply(jnp.asarray(X)))
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    x1 += rng.normal(0, noise, x1.shape)
    x2 += rng.normal(0, noise, x2.shape)
    return jnp.asarray(x1), jnp.asarray(x2), pose, jnp.asarray(X)


def test_essential_eight_point():
    rng = np.random.default_rng(2)
    x1, x2, pose, _ = _random_two_view(rng, 30)
    E = essential_eight_point(x1, x2)
    E_gt = essential_from_pose(pose)
    err = sampson_error(E, x1, x2)
    assert float(jnp.max(err)) < 1e-12
    # E defined up to scale/sign.
    E_n = np.asarray(E) / np.linalg.norm(np.asarray(E))
    E_gt_n = np.asarray(E_gt) / np.linalg.norm(np.asarray(E_gt))
    assert min(np.abs(E_n - E_gt_n).max(), np.abs(E_n + E_gt_n).max()) < 1e-6


def test_essential_five_point():
    """Nistér 5pt must recover the exact ground-truth E among its solutions.

    reference: estimators/solvers/essential_matrix* (PoseLib 5pt);
    close-root-pair isolation exercised implicitly across seeds.
    """
    rng = np.random.default_rng(7)
    n_exact = 0
    n_trials = 20
    for _ in range(n_trials):
        x1, x2, pose, _ = _random_two_view(rng, 5)
        E_gt = np.array(essential_from_pose(pose))
        E_gt /= np.linalg.norm(E_gt)
        Es = np.asarray(essential_five_point(x1, x2))
        best = np.inf
        n_valid = 0
        for E in Es:
            if not np.all(np.isfinite(E)):
                continue
            n_valid += 1
            # Every returned solution satisfies the 5 constraints.
            err = np.asarray(sampson_error(jnp.asarray(E), x1, x2))
            assert err.max() < 1e-10
            En = E / np.linalg.norm(E)
            best = min(best, np.abs(En - E_gt).max(), np.abs(En + E_gt).max())
        assert n_valid >= 1
        if best < 1e-5:
            n_exact += 1
    assert n_exact >= 0.9 * n_trials


def test_essential_five_point_vmapped():
    rng = np.random.default_rng(8)
    s1, s2 = [], []
    for _ in range(4):
        x1, x2, _, _ = _random_two_view(rng, 5)
        s1.append(x1)
        s2.append(x2)
    Es = jax.vmap(essential_five_point)(jnp.stack(s1), jnp.stack(s2))
    assert Es.shape == (4, 10, 3, 3)
    # Each batch entry has at least one finite solution.
    finite = np.isfinite(np.asarray(Es)).all(axis=(2, 3))
    assert finite.any(axis=1).all()


def test_fundamental_eight_point():
    rng = np.random.default_rng(3)
    x1n, x2n, pose, _ = _random_two_view(rng, 40)
    K = np.array([[700.0, 0, 400], [0, 700, 300], [0, 0, 1]])
    x1 = (np.asarray(x1n) @ K[:2, :2].T) + K[:2, 2]
    x2 = (np.asarray(x2n) @ K[:2, :2].T) + K[:2, 2]
    F = fundamental_eight_point(jnp.asarray(x1), jnp.asarray(x2))
    # Epipolar constraint in pixels.
    ones = np.ones((len(x1), 1))
    p1 = np.concatenate([x1, ones], axis=1)
    p2 = np.concatenate([x2, ones], axis=1)
    resid = np.abs(np.einsum("ni,ij,nj->n", p2, np.asarray(F), p1))
    assert resid.max() < 1e-8


def test_fundamental_seven_point():
    rng = np.random.default_rng(4)
    x1, x2, pose, _ = _random_two_view(rng, 7)
    Fs = fundamental_seven_point(x1, x2)
    # At least one solution satisfies the constraint for all 7 points.
    ones = jnp.ones((7, 1))
    p1 = jnp.concatenate([x1, ones], axis=1)
    p2 = jnp.concatenate([x2, ones], axis=1)
    best = np.inf
    for i in range(3):
        F = Fs[i]
        if not bool(jnp.all(jnp.isfinite(F))):
            continue
        resid = jnp.abs(jnp.einsum("ni,ij,nj->n", p2, F, p1))
        best = min(best, float(jnp.max(resid)))
    assert best < 1e-9


def test_homography_dlt():
    rng = np.random.default_rng(5)
    H_gt = np.array([[1.1, 0.02, 3.0], [-0.01, 0.95, -2.0], [1e-4, -2e-4, 1.0]])
    x1 = rng.uniform(-1, 1, (20, 2))
    p1 = np.concatenate([x1, np.ones((20, 1))], axis=1)
    p2 = p1 @ H_gt.T
    x2 = p2[:, :2] / p2[:, 2:]
    H = homography_dlt(jnp.asarray(x1), jnp.asarray(x2))
    err = homography_transfer_error(H, jnp.asarray(x1), jnp.asarray(x2))
    assert float(jnp.max(err)) < 1e-12


def test_pose_from_essential():
    rng = np.random.default_rng(6)
    x1, x2, pose, X = _random_two_view(rng, 25)
    E = essential_from_pose(pose)
    R, t, points, num_valid, ok = pose_from_essential_matrix(E, x1, x2)
    assert int(num_valid) == 25
    np.testing.assert_allclose(np.asarray(R), np.asarray(pose.rotmat()), atol=1e-6)
    t_gt = np.asarray(pose.t) / np.linalg.norm(np.asarray(pose.t))
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-6)


def test_kabsch():
    rng = np.random.default_rng(7)
    q = rot.quat_from_axis_angle(jnp.asarray(rng.standard_normal(3)), 0.7)
    R_gt = np.asarray(rot.quat_to_rotmat(q))
    t_gt = rng.standard_normal(3)
    src = rng.standard_normal((10, 3))
    dst = src @ R_gt.T + t_gt
    R, t = kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-9)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-9)


def test_umeyama():
    rng = np.random.default_rng(8)
    q = rot.quat_from_axis_angle(jnp.asarray(rng.standard_normal(3)), 0.5)
    R_gt = np.asarray(rot.quat_to_rotmat(q))
    s_gt = 2.5
    t_gt = rng.standard_normal(3)
    src = rng.standard_normal((15, 3))
    dst = s_gt * src @ R_gt.T + t_gt
    s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst))
    assert abs(float(s) - s_gt) < 1e-9
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-9)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-8)


def test_p3p():
    rng = np.random.default_rng(9)
    n_success = 0
    for trial in range(20):
        q = rot.quat_from_axis_angle(jnp.asarray(rng.standard_normal(3)), rng.uniform(0, 1))
        R_gt = np.asarray(rot.quat_to_rotmat(q))
        t_gt = rng.standard_normal(3)
        # Generate valid camera-frame points, then map them to world space.
        Y = rng.uniform(-2, 2, (3, 3))
        Y[:, 2] = rng.uniform(1, 8, 3)
        X = (Y - t_gt) @ R_gt  # R⁻¹ (Y - t)
        rays = Y / np.linalg.norm(Y, axis=1, keepdims=True)
        Rs, ts = p3p(jnp.asarray(X), jnp.asarray(rays))
        best_rot_err = np.inf
        for i in range(4):
            R = np.asarray(Rs[i])
            t = np.asarray(ts[i])
            if not np.all(np.isfinite(R)):
                continue
            rot_err = np.abs(R - R_gt).max()
            t_err = np.abs(t - t_gt).max()
            best_rot_err = min(best_rot_err, max(rot_err, t_err))
        if best_rot_err < 1e-6:
            n_success += 1
    assert n_success >= 18  # nearly all random configs must be solved exactly


def test_p3p_vmapped():
    rng = np.random.default_rng(10)
    B = 50
    X = rng.uniform(-2, 2, (B, 3, 3))
    X[..., 2] = rng.uniform(2, 5, (B, 3))
    rays = X / np.linalg.norm(X, axis=-1, keepdims=True)  # identity pose
    Rs, ts = jax.vmap(p3p)(jnp.asarray(X), jnp.asarray(rays))
    assert Rs.shape == (B, 4, 3, 3)
    found = 0
    for b in range(B):
        for i in range(4):
            if np.all(np.isfinite(np.asarray(Rs[b, i]))):
                if np.abs(np.asarray(Rs[b, i]) - np.eye(3)).max() < 1e-5 and np.abs(
                    np.asarray(ts[b, i])
                ).max() < 1e-5:
                    found += 1
                    break
    assert found >= 0.9 * B
