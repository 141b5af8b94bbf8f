"""Tests for quaternion / Rigid3 / Sim3 ops.

reference test strategy: src/colmap/geometry/rigid3_test.cc,
src/colmap/geometry/sim3_test.cc, geometry/pose_test.cc.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colmap_tpu.geometry import rotation as rot
from colmap_tpu.geometry.rigid3 import Rigid3, Sim3, interpolate


def random_quats(rng, n):
    q = rng.standard_normal((n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def test_quat_rotate_matches_rotmat():
    rng = np.random.default_rng(0)
    q = random_quats(rng, 100)
    v = jnp.asarray(rng.standard_normal((100, 3)))
    rotated = rot.quat_rotate(q, v)
    via_mat = jnp.einsum("nij,nj->ni", rot.quat_to_rotmat(q), v)
    np.testing.assert_allclose(rotated, via_mat, atol=1e-12)


def test_quat_mul_compose():
    rng = np.random.default_rng(1)
    q1, q2 = random_quats(rng, 50), random_quats(rng, 50)
    v = jnp.asarray(rng.standard_normal((50, 3)))
    lhs = rot.quat_rotate(rot.quat_multiply(q1, q2), v)
    rhs = rot.quat_rotate(q1, rot.quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_rotmat_to_quat_roundtrip():
    rng = np.random.default_rng(2)
    q = random_quats(rng, 200)
    # Canonical sign.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q2 = rot.rotmat_to_quat(rot.quat_to_rotmat(q))
    np.testing.assert_allclose(q, q2, atol=1e-9)


def test_rotmat_to_quat_near_identity_and_pi():
    # Exactly the degenerate branches.
    for angle in [0.0, 1e-8, np.pi - 1e-8, np.pi]:
        for axis in [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]]:
            q = rot.quat_from_axis_angle(jnp.asarray(axis, dtype=jnp.float64), angle)
            m = rot.quat_to_rotmat(q)
            q2 = rot.rotmat_to_quat(m)
            m2 = rot.quat_to_rotmat(q2)
            np.testing.assert_allclose(m, m2, atol=1e-7)


def test_quat_angle():
    axis = jnp.asarray([0.0, 0.0, 1.0])
    q = rot.quat_from_axis_angle(axis, 0.3)
    assert abs(float(rot.quat_angle(q)) - 0.3) < 1e-12
    q2 = rot.quat_from_axis_angle(axis, 0.5)
    assert abs(float(rot.quat_angle(q, q2)) - 0.2) < 1e-12


def test_average_quaternions():
    axis = jnp.asarray([1.0, 0.0, 0.0])
    q1 = rot.quat_from_axis_angle(axis, 0.1)
    q2 = rot.quat_from_axis_angle(axis, 0.3)
    avg = rot.average_quaternions(jnp.stack([q1, q2]))
    assert abs(float(rot.quat_angle(avg)) - 0.2) < 1e-9
    # Weighted: all weight on q1.
    avg = rot.average_quaternions(jnp.stack([q1, q2]), jnp.asarray([1.0, 1e-12]))
    assert abs(float(rot.quat_angle(avg)) - 0.1) < 1e-5


def test_rigid3_inverse_compose():
    rng = np.random.default_rng(3)
    a = Rigid3(random_quats(rng, 30), jnp.asarray(rng.standard_normal((30, 3))))
    b = Rigid3(random_quats(rng, 30), jnp.asarray(rng.standard_normal((30, 3))))
    pts = jnp.asarray(rng.standard_normal((30, 3)))
    np.testing.assert_allclose(a.inverse().apply(a.apply(pts)), pts, atol=1e-10)
    np.testing.assert_allclose(
        a.compose(b).apply(pts), a.apply(b.apply(pts)), atol=1e-10
    )


def test_rigid3_projection_center():
    rng = np.random.default_rng(4)
    cam_from_world = Rigid3(
        random_quats(rng, 10), jnp.asarray(rng.standard_normal((10, 3)))
    )
    centers = cam_from_world.projection_center()
    # The center maps to the origin of the camera frame.
    np.testing.assert_allclose(
        cam_from_world.apply(centers), np.zeros((10, 3)), atol=1e-12
    )


def test_rigid3_matrix_roundtrip():
    rng = np.random.default_rng(5)
    a = Rigid3(random_quats(rng, 20), jnp.asarray(rng.standard_normal((20, 3))))
    m = a.matrix3x4()
    b = Rigid3.from_matrix(m)
    pts = jnp.asarray(rng.standard_normal((20, 3)))
    np.testing.assert_allclose(a.apply(pts), b.apply(pts), atol=1e-9)


def test_sim3():
    rng = np.random.default_rng(6)
    s = Sim3(
        jnp.asarray(rng.uniform(0.5, 2.0, 15)),
        random_quats(rng, 15),
        jnp.asarray(rng.standard_normal((15, 3))),
    )
    pts = jnp.asarray(rng.standard_normal((15, 3)))
    np.testing.assert_allclose(s.inverse().apply(s.apply(pts)), pts, atol=1e-10)
    s2 = Sim3(
        jnp.asarray(rng.uniform(0.5, 2.0, 15)),
        random_quats(rng, 15),
        jnp.asarray(rng.standard_normal((15, 3))),
    )
    np.testing.assert_allclose(
        s.compose(s2).apply(pts), s.apply(s2.apply(pts)), atol=1e-10
    )


def test_sim3_transform_rigid():
    """cam_from_b(world-point transformed) must equal s * cam_from_a(point)."""
    rng = np.random.default_rng(7)
    cam_from_a = Rigid3(random_quats(rng, 8), jnp.asarray(rng.standard_normal((8, 3))))
    b_from_a = Sim3(
        jnp.asarray(rng.uniform(0.5, 2.0, 8)),
        random_quats(rng, 8),
        jnp.asarray(rng.standard_normal((8, 3))),
    )
    cam_from_b = b_from_a.transform_rigid(cam_from_a)
    pts_a = jnp.asarray(rng.standard_normal((8, 3)))
    pts_b = b_from_a.apply(pts_a)
    # Scene rescaled by s: the rigid result equals s x_cam.
    np.testing.assert_allclose(
        cam_from_b.apply(pts_b),
        b_from_a.scale[:, None] * cam_from_a.apply(pts_a),
        atol=1e-9,
    )


def test_interpolate():
    a = Rigid3.identity((), dtype=jnp.float64)
    axis = jnp.asarray([0.0, 1.0, 0.0])
    b = Rigid3(rot.quat_from_axis_angle(axis, 1.0), jnp.asarray([2.0, 0.0, 0.0]))
    mid = interpolate(a, b, jnp.asarray(0.5))
    assert abs(float(rot.quat_angle(mid.quat)) - 0.5) < 1e-9
    np.testing.assert_allclose(mid.t, [1.0, 0.0, 0.0], atol=1e-12)


def test_jit_and_vmap_compatible():
    rng = np.random.default_rng(8)
    a = Rigid3(random_quats(rng, 4), jnp.asarray(rng.standard_normal((4, 3))))
    pts = jnp.asarray(rng.standard_normal((4, 3)))
    out = jax.jit(lambda t, p: t.apply(p))(a, pts)
    np.testing.assert_allclose(out, a.apply(pts), atol=1e-12)
