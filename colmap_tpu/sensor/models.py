"""Camera models: vectorized project / unproject for all 18 COLMAP models.

reference behavior: src/colmap/sensor/models.h (CameraModelId enum at :90-119,
per-model param layouts at the InitializeParamsInfo definitions). Rather than
the reference's CRTP-class-per-model with scalar methods, every model here is
a pair of pure functions operating on whole point batches:

    img_from_cam(model_id, params, uvw)  -> (xy, valid)
    cam_from_img(model_id, params, xy)   -> (uv, valid)   # uv on z=1 plane

``model_id`` is a static Python int (the common case: one model per camera
batch). For mixed-model batches use :func:`img_from_cam_switch` which
dispatches with ``lax.switch`` over padded parameter rows.

Conventions (identical to the reference):
- image coords: upper-left corner (0, 0); pixel centers at (i+0.5, j+0.5).
- projection: normalize (u,v,w) -> (u/w, v/w), distort, then focal+pp.
- fisheye models first map through the equidistant fisheye transform
  (u,v) -> (u,v)·atan(r)/r and distort in theta-space
  (models.h BasePerspectiveFisheyeCameraModel::FisheyeFromNormal).
- undistortion is Newton iteration on x + d(x) = x0 with a trust region
  (models.h IterativeUndistortion), here with a fixed iteration count so it
  compiles to a static XLA loop.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_NUM_PARAMS = 16  # RadTanThinPrismFisheye


class CameraModelId(enum.IntEnum):
    """reference: src/colmap/sensor/models.h:90-119."""

    INVALID = -1
    SIMPLE_PINHOLE = 0
    PINHOLE = 1
    SIMPLE_RADIAL = 2
    RADIAL = 3
    OPENCV = 4
    OPENCV_FISHEYE = 5
    FULL_OPENCV = 6
    FOV = 7
    SIMPLE_RADIAL_FISHEYE = 8
    RADIAL_FISHEYE = 9
    THIN_PRISM_FISHEYE = 10
    RAD_TAN_THIN_PRISM_FISHEYE = 11
    SIMPLE_DIVISION = 12
    DIVISION = 13
    SIMPLE_FISHEYE = 14
    FISHEYE = 15
    EUCM = 16
    EQUIRECTANGULAR = 17


# name, num_params, focal idxs, principal point idxs, extra (distortion) idxs.
_MODEL_TABLE = {
    CameraModelId.SIMPLE_PINHOLE: ("SIMPLE_PINHOLE", 3, (0,), (1, 2), ()),
    CameraModelId.PINHOLE: ("PINHOLE", 4, (0, 1), (2, 3), ()),
    CameraModelId.SIMPLE_RADIAL: ("SIMPLE_RADIAL", 4, (0,), (1, 2), (3,)),
    CameraModelId.RADIAL: ("RADIAL", 5, (0,), (1, 2), (3, 4)),
    CameraModelId.OPENCV: ("OPENCV", 8, (0, 1), (2, 3), (4, 5, 6, 7)),
    CameraModelId.OPENCV_FISHEYE: ("OPENCV_FISHEYE", 8, (0, 1), (2, 3), (4, 5, 6, 7)),
    CameraModelId.FULL_OPENCV: (
        "FULL_OPENCV", 12, (0, 1), (2, 3), (4, 5, 6, 7, 8, 9, 10, 11)),
    CameraModelId.FOV: ("FOV", 5, (0, 1), (2, 3), (4,)),
    CameraModelId.SIMPLE_RADIAL_FISHEYE: (
        "SIMPLE_RADIAL_FISHEYE", 4, (0,), (1, 2), (3,)),
    CameraModelId.RADIAL_FISHEYE: ("RADIAL_FISHEYE", 5, (0,), (1, 2), (3, 4)),
    CameraModelId.THIN_PRISM_FISHEYE: (
        "THIN_PRISM_FISHEYE", 12, (0, 1), (2, 3), tuple(range(4, 12))),
    CameraModelId.RAD_TAN_THIN_PRISM_FISHEYE: (
        "RAD_TAN_THIN_PRISM_FISHEYE", 16, (0, 1), (2, 3), tuple(range(4, 16))),
    CameraModelId.SIMPLE_DIVISION: ("SIMPLE_DIVISION", 4, (0,), (1, 2), (3,)),
    CameraModelId.DIVISION: ("DIVISION", 5, (0, 1), (2, 3), (4,)),
    CameraModelId.SIMPLE_FISHEYE: ("SIMPLE_FISHEYE", 3, (0,), (1, 2), ()),
    CameraModelId.FISHEYE: ("FISHEYE", 4, (0, 1), (2, 3), ()),
    CameraModelId.EUCM: ("EUCM", 6, (0, 1), (2, 3), (4, 5)),
    CameraModelId.EQUIRECTANGULAR: ("EQUIRECTANGULAR", 2, (), (), ()),
}

MODEL_NAME_TO_ID = {v[0]: k for k, v in _MODEL_TABLE.items()}
MODEL_ID_TO_NAME = {int(k): v[0] for k, v in _MODEL_TABLE.items()}


def model_num_params(model_id) -> int:
    return _MODEL_TABLE[CameraModelId(int(model_id))][1]


def focal_length_idxs(model_id):
    return _MODEL_TABLE[CameraModelId(int(model_id))][2]


def principal_point_idxs(model_id):
    return _MODEL_TABLE[CameraModelId(int(model_id))][3]


def extra_params_idxs(model_id):
    return _MODEL_TABLE[CameraModelId(int(model_id))][4]


def initialize_params(model_id, focal_length: float, width: int, height: int):
    """Default parameters for a model (reference: InitializeParams per model)."""
    mid = CameraModelId(int(model_id))
    n = model_num_params(mid)
    params = np.zeros(n, dtype=np.float64)
    if mid == CameraModelId.EQUIRECTANGULAR:
        params[:] = [width, height]
        return params
    f_idxs, pp_idxs = focal_length_idxs(mid), principal_point_idxs(mid)
    for i in f_idxs:
        params[i] = focal_length
    params[pp_idxs[0]] = width / 2.0
    params[pp_idxs[1]] = height / 2.0
    if mid == CameraModelId.FOV:
        params[4] = 1e-2
    elif mid == CameraModelId.EUCM:
        params[4], params[5] = 0.0, 1.0
    return params


def mean_focal_length(model_id, params):
    idxs = list(focal_length_idxs(model_id))
    if not idxs:  # EQUIRECTANGULAR: focal equivalent = width / (2*pi)
        return params[..., 0] / (2.0 * np.pi)
    return sum(params[..., i] for i in idxs) / len(idxs)


def cam_from_img_threshold(model_id, params, threshold):
    """Pixel threshold -> normalized-plane threshold (models.h:1131-1139)."""
    return threshold / mean_focal_length(model_id, params)


# ---------------------------------------------------------------------------
# Distortion functions. Each maps (extra_params, u, v) -> (du, dv), operating
# elementwise on arrays; u/v are coordinates in the normalized (or fisheye
# theta-) plane. Formulas follow the standard model definitions
# (models.h Distortion per model).
# ---------------------------------------------------------------------------


def _dist_none(e, u, v):
    return jnp.zeros_like(u), jnp.zeros_like(v)


def _dist_simple_radial(e, u, v):
    radial = e[0] * (u * u + v * v)
    return u * radial, v * radial


def _dist_radial(e, u, v):
    r2 = u * u + v * v
    radial = e[0] * r2 + e[1] * r2 * r2
    return u * radial, v * radial


def _dist_opencv(e, u, v):
    k1, k2, p1, p2 = e[0], e[1], e[2], e[3]
    u2, v2, uv = u * u, v * v, u * v
    r2 = u2 + v2
    radial = k1 * r2 + k2 * r2 * r2
    du = u * radial + 2 * p1 * uv + p2 * (r2 + 2 * u2)
    dv = v * radial + 2 * p2 * uv + p1 * (r2 + 2 * v2)
    return du, dv


def _dist_opencv_fisheye(e, u, v):
    # theta-space polynomial: k1 θ² + k2 θ⁴ + k3 θ⁶ + k4 θ⁸.
    k1, k2, k3, k4 = e[0], e[1], e[2], e[3]
    t2 = u * u + v * v
    radial = t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
    return u * radial, v * radial


def _dist_full_opencv(e, u, v):
    k1, k2, p1, p2, k3, k4, k5, k6 = (e[i] for i in range(8))
    u2, v2, uv = u * u, v * v, u * v
    r2 = u2 + v2
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1 + k1 * r2 + k2 * r4 + k3 * r6) / (1 + k4 * r2 + k5 * r4 + k6 * r6) - 1
    du = u * radial + 2 * p1 * uv + p2 * (r2 + 2 * u2)
    dv = v * radial + 2 * p2 * uv + p1 * (r2 + 2 * v2)
    return du, dv


def _dist_fov(e, u, v):
    # Devernay-Faugeras FOV model with the reference's Taylor fallbacks
    # (models.h FOVCameraModel::Distortion).
    omega = e[0]
    eps = 1e-4
    r2 = u * u + v * v
    omega2 = omega * omega
    tan_half = jnp.tan(omega / 2)
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    safe_omega = jnp.where(omega2 < eps, 1.0, omega)
    factor_full = jnp.arctan(r * 2 * tan_half) / (r * safe_omega)
    factor_small_omega = (omega2 * r2) / 3 - omega2 / 12 + 1
    factor_small_r = (-2 * tan_half * (4 * r2 * tan_half * tan_half - 3)) / (
        3 * safe_omega
    )
    factor = jnp.where(
        omega2 < eps, factor_small_omega, jnp.where(r2 < eps, factor_small_r, factor_full)
    )
    return u * (factor - 1), v * (factor - 1)


def _undist_fov(e, u, v):
    # Closed-form inverse (models.h FOVCameraModel::Undistortion).
    omega = e[0]
    eps = 1e-4
    r2 = u * u + v * v
    omega2 = omega * omega
    tan_half = jnp.tan(omega / 2)
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    safe_tan = jnp.where(jnp.abs(tan_half) < 1e-30, 1.0, tan_half)
    factor_full = jnp.tan(r * omega) / (r * 2 * safe_tan)
    factor_small_omega = (omega2 * r2) / 3 - omega2 / 12 + 1
    factor_small_r = (omega * (omega2 * r2 + 3)) / (6 * safe_tan)
    factor = jnp.where(
        omega2 < eps, factor_small_omega, jnp.where(r2 < eps, factor_small_r, factor_full)
    )
    return u * factor, v * factor


def _dist_thin_prism(e, u, v):
    k1, k2, p1, p2, k3, k4, sx1, sy1 = (e[i] for i in range(8))
    u2, v2, uv = u * u, v * v, u * v
    r2 = u2 + v2
    r4 = r2 * r2
    radial = k1 * r2 + k2 * r4 + k3 * r4 * r2 + k4 * r4 * r4
    du = u * radial + 2 * p1 * uv + p2 * (r2 + 2 * u2) + sx1 * r2
    dv = v * radial + 2 * p2 * uv + p1 * (r2 + 2 * v2) + sy1 * r2
    return du, dv


def _dist_radtan_thin_prism(e, u, v):
    # 6 radial theta-coefficients, 2 tangential, 4 thin-prism
    # (models.h RadTanThinPrismFisheyeModel::Distortion).
    t2 = u * u + v * v
    th_radial = jnp.ones_like(u)
    tp = jnp.ones_like(u)
    for i in range(6):
        tp = tp * t2
        th_radial = th_radial + e[i] * tp
    p0, p1 = e[6], e[7]
    s0, s1, s2, s3 = e[8], e[9], e[10], e[11]
    x = th_radial * u
    y = th_radial * v
    x2, y2, xy = x * x, y * y, x * y
    r2 = x2 + y2
    r4 = r2 * r2
    dx_tang = 2 * p1 * xy + p0 * (r2 + 2 * x2)
    dy_tang = 2 * p0 * xy + p1 * (r2 + 2 * y2)
    dx_tp = s0 * r2 + s1 * r4
    dy_tp = s2 * r2 + s3 * r4
    return x + dx_tang + dx_tp - u, y + dy_tang + dy_tp - v


def _dist_division(e, u, v):
    # Equivalent additive form of the division model for Newton undistortion
    # (models.h DivisionCameraModel::Distortion).
    k = e[0]
    r2 = u * u + v * v
    factor = k * r2 / (1 + k * r2)
    return -u * factor, -v * factor


# model -> (distortion fn in normalized plane or theta plane, is_fisheye)
_DISTORTIONS = {
    CameraModelId.SIMPLE_PINHOLE: (_dist_none, False),
    CameraModelId.PINHOLE: (_dist_none, False),
    CameraModelId.SIMPLE_RADIAL: (_dist_simple_radial, False),
    CameraModelId.RADIAL: (_dist_radial, False),
    CameraModelId.OPENCV: (_dist_opencv, False),
    CameraModelId.OPENCV_FISHEYE: (_dist_opencv_fisheye, True),
    CameraModelId.FULL_OPENCV: (_dist_full_opencv, False),
    CameraModelId.FOV: (_dist_fov, False),
    CameraModelId.SIMPLE_RADIAL_FISHEYE: (_dist_simple_radial, True),
    CameraModelId.RADIAL_FISHEYE: (_dist_radial, True),
    CameraModelId.THIN_PRISM_FISHEYE: (_dist_thin_prism, True),
    CameraModelId.RAD_TAN_THIN_PRISM_FISHEYE: (_dist_radtan_thin_prism, True),
    CameraModelId.SIMPLE_FISHEYE: (_dist_none, True),
    CameraModelId.FISHEYE: (_dist_none, True),
}


def _fisheye_from_normal(u, v):
    """(u, v) -> (u, v) * atan(r)/r (equidistant fisheye forward map)."""
    r = jnp.sqrt(u * u + v * v)
    scale = jnp.where(r > 1e-12, jnp.arctan(r) / jnp.maximum(r, 1e-30), 1.0)
    return u * scale, v * scale


def _normal_from_fisheye(uu, vv):
    theta = jnp.sqrt(uu * uu + vv * vv)
    theta_cos = theta * jnp.cos(theta)
    scale = jnp.where(
        theta_cos > 1e-12, jnp.sin(theta) / jnp.where(theta_cos > 1e-12, theta_cos, 1.0), 1.0
    )
    return uu * scale, vv * scale


def _split_focal_pp(model_id, params):
    """Indexes the last axis so per-observation parameter batches work."""
    f_idxs = focal_length_idxs(model_id)
    pp_idxs = principal_point_idxs(model_id)
    if len(f_idxs) == 1:
        fx = fy = params[..., f_idxs[0]]
    else:
        fx, fy = params[..., f_idxs[0]], params[..., f_idxs[1]]
    cx, cy = params[..., pp_idxs[0]], params[..., pp_idxs[1]]
    return fx, fy, cx, cy


def _extra(model_id, params):
    idxs = extra_params_idxs(model_id)
    return [params[..., i] for i in idxs]


def _newton_undistort(dist_fn, extra, u0, v0, num_iterations=25):
    """Solve x + d(x) = x0 by Newton iteration with trust region.

    reference behavior: models.h IterativeUndistortion :1141-1200 (100 iters,
    rel/abs step radius 0.1). Here a fixed unrolled-scan loop; Jacobian via
    forward-mode autodiff of the distortion function.
    """

    def residual(uv):
        du, dv = dist_fn(extra, uv[0], uv[1])
        return jnp.stack([uv[0] + du, uv[1] + dv])

    x0 = jnp.stack([u0, v0])

    def body(x, _):
        jac = jax.jacfwd(residual)(x)
        err = residual(x) - x0
        # 2x2 solve with regularized determinant.
        a, b = jac[0, 0], jac[0, 1]
        c, d = jac[1, 0], jac[1, 1]
        det = a * d - b * c
        inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
        dx0 = inv_det * (d * err[0] - b * err[1])
        dx1 = inv_det * (-c * err[0] + a * err[1])
        dx = jnp.stack([dx0, dx1])
        # Trust region.
        step_norm = jnp.linalg.norm(dx)
        max_step = jnp.maximum(jnp.linalg.norm(x) * 0.1, 0.1)
        dx = dx * jnp.minimum(1.0, max_step / jnp.maximum(step_norm, 1e-30))
        return x - dx, None

    x, _ = jax.lax.scan(body, x0, None, length=num_iterations)
    return x[0], x[1]


def _eps(dtype):
    return jnp.finfo(dtype).eps


@partial(jax.jit, static_argnums=(0, 3))
def img_from_cam(model_id, params, uvw, check_cheirality=True):
    """Project camera-frame points to pixel coordinates.

    Args:
        model_id: static int model id.
        params: (num_params,) camera parameters.
        uvw: (..., 3) points in the camera frame.
    Returns:
        xy: (..., 2) pixel coordinates; valid: (...,) bool mask.
    """
    mid = CameraModelId(int(model_id))
    params = jnp.asarray(params)
    uvw = jnp.asarray(uvw)
    u, v, w = uvw[..., 0], uvw[..., 1], uvw[..., 2]
    dtype = uvw.dtype
    eps = _eps(dtype)

    if mid == CameraModelId.EQUIRECTANGULAR:
        width, height = params[..., 0], params[..., 1]
        horizontal = jnp.sqrt(u * u + w * w)
        valid = horizontal + jnp.abs(v) >= eps
        theta = jnp.arctan2(u, w)
        phi = jnp.arctan2(-v, horizontal)
        x = (theta / (2 * jnp.pi) + 0.5) * width
        y = (0.5 - phi / jnp.pi) * height
        return jnp.stack([x, y], axis=-1), valid

    if mid == CameraModelId.EUCM:
        fx, fy, cx, cy = _split_focal_pp(mid, params)
        alpha, beta = params[..., 4], params[..., 5]
        valid = w >= eps if check_cheirality else jnp.abs(w) >= eps
        rho2 = beta * (u * u + v * v) + w * w
        valid = valid & (rho2 >= 0)
        rho = jnp.sqrt(jnp.maximum(rho2, 0.0))
        den = alpha * rho + (1.0 - alpha) * w
        valid = valid & (den >= eps if check_cheirality else jnp.abs(den) >= eps)
        safe_den = jnp.where(jnp.abs(den) < eps, 1.0, den)
        x = fx * u / safe_den + cx
        y = fy * v / safe_den + cy
        return jnp.stack([x, y], axis=-1), valid

    if mid in (CameraModelId.SIMPLE_DIVISION, CameraModelId.DIVISION):
        fx, fy, cx, cy = _split_focal_pp(mid, params)
        k = _extra(mid, params)[0]
        rho = jnp.sqrt(u * u + v * v)
        disc_sq = w * w - 4 * rho * rho * k
        valid = disc_sq >= 0
        disc = jnp.sqrt(jnp.maximum(disc_sq, 0.0))
        denom = w + disc
        valid = valid & (jnp.abs(denom) >= eps)
        r = 2.0 / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
        x = fx * r * u + cx
        y = fy * r * v + cy
        return jnp.stack([x, y], axis=-1), valid

    # Generic perspective / fisheye path.
    dist_fn, is_fisheye = _DISTORTIONS[mid]
    valid = w >= eps if check_cheirality else jnp.abs(w) >= eps
    safe_w = jnp.where(jnp.abs(w) < eps, 1.0, w)
    un, vn = u / safe_w, v / safe_w
    if is_fisheye:
        un, vn = _fisheye_from_normal(un, vn)
    extra = _extra(mid, params)
    du, dv = dist_fn(extra, un, vn)
    xd, yd = un + du, vn + dv
    fx, fy, cx, cy = _split_focal_pp(mid, params)
    x = fx * xd + cx
    y = fy * yd + cy
    return jnp.stack([x, y], axis=-1), valid


def img_from_cam_switch(model_ids: tuple, idx, params, uvw,
                        check_cheirality=True):
    """Mixed-model projection: ``lax.switch`` over a static model tuple.

    reference behavior: per-observation cost functors instantiated per
    camera model (bundle_adjustment_ceres.h:40-116 via CAMERA_MODEL_CASES).
    TPU-native form: one program with a static unroll over the distinct
    models present; ``idx`` selects the branch per call.

    Args:
        model_ids: static tuple of distinct camera model ids present.
        idx: traced int index into model_ids.
        params: (Pmax,) parameter row padded to the max param count.
        uvw: (..., 3) camera-frame points.
    Returns (xy (..., 2), valid (...,)).
    """
    branches = [
        (lambda p, x, m=int(m): img_from_cam(
            m, p[..., :model_num_params(m)], x,
            check_cheirality=check_cheirality,
        ))
        for m in model_ids
    ]
    return jax.lax.switch(idx, branches, params, uvw)


@partial(jax.jit, static_argnums=(0,))
def cam_from_img(model_id, params, xy):
    """Lift pixel coordinates to the normalized z=1 camera plane.

    Returns (uv, valid): uv (..., 2) such that (u, v, 1) is the ray.
    """
    mid = CameraModelId(int(model_id))
    params = jnp.asarray(params)
    xy = jnp.asarray(xy)
    x, y = xy[..., 0], xy[..., 1]
    dtype = xy.dtype
    eps = _eps(dtype)

    if mid == CameraModelId.EQUIRECTANGULAR:
        width, height = params[..., 0], params[..., 1]
        theta = 2 * jnp.pi * (x / width - 0.5)
        phi = jnp.pi * (0.5 - y / height)
        cos_phi = jnp.cos(phi)
        rx = cos_phi * jnp.sin(theta)
        ry = -jnp.sin(phi)
        rz = cos_phi * jnp.cos(theta)
        valid = rz > eps
        safe_rz = jnp.where(jnp.abs(rz) < eps, 1.0, rz)
        return jnp.stack([rx / safe_rz, ry / safe_rz], axis=-1), valid

    if mid == CameraModelId.EUCM:
        fx, fy, cx, cy = _split_focal_pp(mid, params)
        alpha, beta = params[..., 4], params[..., 5]
        u0 = (x - cx) / fx
        v0 = (y - cy) / fy
        r2 = u0 * u0 + v0 * v0
        gamma = 1.0 - alpha
        radicand = 1.0 - (alpha - gamma) * beta * r2
        valid = radicand >= 0
        helper_den = alpha * jnp.sqrt(jnp.maximum(radicand, 0.0)) + gamma
        valid = valid & (helper_den >= eps)
        helper = (1.0 - alpha * alpha * beta * r2) / jnp.where(
            helper_den < eps, 1.0, helper_den
        )
        valid = valid & (helper >= eps)
        safe_helper = jnp.where(jnp.abs(helper) < eps, 1.0, helper)
        return jnp.stack([u0 / safe_helper, v0 / safe_helper], axis=-1), valid

    if mid in (CameraModelId.SIMPLE_DIVISION, CameraModelId.DIVISION):
        fx, fy, cx, cy = _split_focal_pp(mid, params)
        k = _extra(mid, params)[0]
        x0 = (x - cx) / fx
        y0 = (y - cy) / fy
        r2 = x0 * x0 + y0 * y0
        denom = 1.0 + k * r2
        valid = jnp.abs(denom) >= eps
        safe = jnp.where(jnp.abs(denom) < eps, 1.0, denom)
        return jnp.stack([x0 / safe, y0 / safe], axis=-1), valid

    if mid == CameraModelId.FOV:
        fx, fy, cx, cy = _split_focal_pp(mid, params)
        uu = (x - cx) / fx
        vv = (y - cy) / fy
        extra = _extra(mid, params)
        u, v = _undist_fov(extra, uu, vv)
        return jnp.stack([u, v], axis=-1), jnp.ones_like(u, dtype=bool)

    dist_fn, is_fisheye = _DISTORTIONS[mid]
    fx, fy, cx, cy = _split_focal_pp(mid, params)
    uu = (x - cx) / fx
    vv = (y - cy) / fy
    extra = _extra(mid, params)
    if extra:
        # Vectorize the distortion params ALONGSIDE the coordinates:
        # row-batched params (the batched pair-verification path passes
        # per-row camera params) must enter the per-point Newton solve as
        # scalars, not leak their batch shape into the scan carry via the
        # closure.
        n_extra = len(extra)
        extra_arr = jnp.broadcast_to(
            jnp.stack(jnp.broadcast_arrays(*extra), axis=-1)
            if n_extra > 1 else extra[0][..., None],
            uu.shape + (n_extra,),
        )
        undist = jnp.vectorize(
            lambda e, a, b: jnp.stack(
                _newton_undistort(dist_fn, [e[i] for i in range(n_extra)],
                                  a, b)
            ),
            signature="(e),(),()->(2)",
        )
        uv = undist(extra_arr, uu, vv)
        uu, vv = uv[..., 0], uv[..., 1]
    if is_fisheye:
        uu, vv = _normal_from_fisheye(uu, vv)
    return jnp.stack([uu, vv], axis=-1), jnp.ones_like(uu, dtype=bool)


def cam_ray_from_img(model_id, params, xy):
    """Pixel -> unit bearing vector in the camera frame (..., 3)."""
    mid = CameraModelId(int(model_id))
    if mid == CameraModelId.EQUIRECTANGULAR:
        params = jnp.asarray(params)
        xy = jnp.asarray(xy)
        x, y = xy[..., 0], xy[..., 1]
        theta = 2 * jnp.pi * (x / params[0] - 0.5)
        phi = jnp.pi * (0.5 - y / params[1])
        cos_phi = jnp.cos(phi)
        ray = jnp.stack(
            [cos_phi * jnp.sin(theta), -jnp.sin(phi), cos_phi * jnp.cos(theta)], axis=-1
        )
        return ray, jnp.ones(ray.shape[:-1], dtype=bool)
    uv, valid = cam_from_img(model_id, params, xy)
    ones = jnp.ones(uv.shape[:-1] + (1,), dtype=uv.dtype)
    ray = jnp.concatenate([uv, ones], axis=-1)
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    return ray, valid


def img_from_cam_batched(model_id, params_batch, uvw, check_cheirality=True):
    """Per-camera params: params_batch (..., P) matched to uvw (..., 3)."""
    fn = lambda p, x: img_from_cam(model_id, p, x, check_cheirality)
    return jax.vmap(fn)(params_batch, uvw)


def rescale_params(model_id, params, scale_x: float, scale_y: float):
    """Rescale intrinsics for a resized image (models.h Rescale)."""
    mid = CameraModelId(int(model_id))
    params = np.array(params, dtype=np.float64)
    if mid == CameraModelId.EQUIRECTANGULAR:
        params[0] *= scale_x
        params[1] *= scale_y
        return params
    f_idxs = focal_length_idxs(mid)
    pp_idxs = principal_point_idxs(mid)
    if len(f_idxs) == 1:
        params[f_idxs[0]] *= 0.5 * (scale_x + scale_y)
    else:
        params[f_idxs[0]] *= scale_x
        params[f_idxs[1]] *= scale_y
    params[pp_idxs[0]] *= scale_x
    params[pp_idxs[1]] *= scale_y
    return params


def has_bogus_params(
    model_id,
    params,
    width,
    height,
    min_focal_length_ratio,
    max_focal_length_ratio,
    max_extra_param,
):
    """reference behavior: CameraModelHasBogusParams (models.h:912)."""
    mid = CameraModelId(int(model_id))
    params = np.asarray(params)
    if mid == CameraModelId.EQUIRECTANGULAR:
        return False
    for i in focal_length_idxs(mid):
        ratio = params[i] / max(width, height)
        if ratio < min_focal_length_ratio or ratio > max_focal_length_ratio:
            return True
    pp = principal_point_idxs(mid)
    if params[pp[0]] < 0 or params[pp[0]] > width:
        return True
    if params[pp[1]] < 0 or params[pp[1]] > height:
        return True
    for i in extra_params_idxs(mid):
        if abs(params[i]) > max_extra_param:
            return True
    if mid == CameraModelId.EUCM:
        alpha, beta = params[..., 4], params[..., 5]
        if alpha < 0 or alpha > 1 or beta <= 0:
            return True
    return False
