"""DEGENSAC: F estimation robust to a dominant plane.

reference test analogue: estimators/fundamental_matrix_degensac_test.cc —
a scene where most correspondences lie on one plane must still yield an F
that explains the off-plane structure.
"""

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators.degensac import (
    degensac_recover_f,
    fundamental_from_plane_and_parallax,
    is_h_degenerate,
)
from colmap_tpu.estimators.solvers.epipolar import homography_dlt
from colmap_tpu.geometry.essential import (
    essential_from_pose,
    squared_epipolar_line_distance,
)
from colmap_tpu.geometry.rigid3 import Rigid3
from colmap_tpu.geometry import rotation as rot
from colmap_tpu.optim.ransac import RansacOptions


def _plane_scene(rng, n_plane=80, n_off=20):
    """Camera pair viewing a dominant plane plus off-plane points."""
    axis = rng.standard_normal(3)
    q = np.asarray(rot.quat_from_axis_angle(jnp.asarray(axis), 0.3))
    t = np.array([1.0, 0.2, 0.1])
    pose = Rigid3(jnp.asarray(q), jnp.asarray(t))
    # World plane Z = 6 + 0.2 X + 0.1 Y.
    xy = rng.uniform(-3, 3, (n_plane, 2))
    z = 6.0 + 0.2 * xy[:, 0] + 0.1 * xy[:, 1]
    X_plane = np.column_stack([xy, z])
    X_off = rng.uniform(-2, 2, (n_off, 3))
    X_off[:, 2] = rng.uniform(3, 10, n_off)
    X = np.concatenate([X_plane, X_off])
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = np.asarray(pose.apply(jnp.asarray(X)))
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    return jnp.asarray(x1), jnp.asarray(x2), pose


def test_plane_and_parallax_f():
    rng = np.random.default_rng(11)
    x1, x2, pose = _plane_scene(rng)
    # Exact H from plane points.
    H = homography_dlt(x1[:80], x2[:80])
    F_gt = essential_from_pose(pose)  # normalized coords: F == E
    F = fundamental_from_plane_and_parallax(
        H, x1[80], x2[80], x1[81], x2[81]
    )
    err = squared_epipolar_line_distance(F, x1, x2)
    assert float(jnp.max(err)) < 1e-10


def test_degensac_recovers_off_plane_f():
    rng = np.random.default_rng(12)
    x1, x2, pose = _plane_scene(rng, n_plane=90, n_off=10)
    n = x1.shape[0]
    mask = jnp.ones(n, dtype=bool)
    H = homography_dlt(x1[:90], x2[:90])

    # A degenerate F: one that only explains the plane (H-compatible).
    # Build it from the H plus two *on-plane* points — rank-2 but wrong.
    F_degen = fundamental_from_plane_and_parallax(
        H, x1[0], x2[0], x1[1], x2[1]
    )
    opts = RansacOptions(max_error=1e-3)
    from colmap_tpu.estimators.degensac import degensac_recover_f

    res_d = squared_epipolar_line_distance(F_degen, x1, x2)
    f_inl = res_d <= opts.max_error**2
    from colmap_tpu.estimators.solvers.epipolar import homography_transfer_error

    h_err = homography_transfer_error(H, x1, x2)
    h_inl = h_err <= opts.max_error**2
    assert bool(is_h_degenerate(int(f_inl.sum()), int((f_inl & h_inl).sum())))

    F_best, n_inl, inl, recovered = degensac_recover_f(
        jax.random.PRNGKey(0), x1, x2, mask, F_degen, f_inl, H, h_inl, opts
    )
    assert bool(recovered)
    err = squared_epipolar_line_distance(F_best, x1, x2)
    # The recovered F explains the full scene including off-plane points.
    assert int((err <= opts.max_error**2).sum()) == n


def test_two_view_geometry_degensac_option():
    from colmap_tpu.estimators.two_view_geometry import (
        TwoViewGeometryOptions,
        estimate_two_view_geometry,
    )
    from colmap_tpu.scene.types import Camera

    rng = np.random.default_rng(13)
    x1n, x2n, pose = _plane_scene(rng, n_plane=85, n_off=15)
    f, w, h = 600.0, 800, 600
    x1 = np.asarray(x1n) * f + [w / 2, h / 2]
    x2 = np.asarray(x2n) * f + [w / 2, h / 2]
    from colmap_tpu.sensor import models as camera_models

    cam = Camera(camera_id=1,
                 model_id=camera_models.MODEL_NAME_TO_ID["SIMPLE_PINHOLE"],
                 width=w, height=h,
                 params=np.array([f, w / 2, h / 2]),
                 has_prior_focal_length=False)
    matches = np.column_stack([np.arange(len(x1))] * 2).astype(np.uint32)
    import dataclasses as _dc

    opt = TwoViewGeometryOptions(use_degensac=True, detect_watermark=False)
    opt.ransac = _dc.replace(opt.ransac, max_error=1.0)
    g = estimate_two_view_geometry(cam, x1, cam, x2, matches, opt, seed=4)
    # With DEGENSAC the pair is not classified planar-degenerate and the
    # inlier set covers the off-plane structure too.
    assert len(g.inlier_matches) >= 95
