"""Round-trip tests for all camera models.

reference test strategy: src/colmap/sensor/models_test.cc — project a grid of
normalized points through img_from_cam then cam_from_img and assert identity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from colmap_tpu.sensor import models as cm

# model id -> representative params (reference: models_test.cc uses similar).
TEST_PARAMS = {
    cm.CameraModelId.SIMPLE_PINHOLE: [655.5, 386.1, 511.5],
    cm.CameraModelId.PINHOLE: [651.1, 655.5, 386.1, 511.5],
    cm.CameraModelId.SIMPLE_RADIAL: [651.1, 386.1, 511.5, -0.041],
    cm.CameraModelId.RADIAL: [651.1, 386.1, 511.5, -0.041, 0.011],
    cm.CameraModelId.OPENCV: [651.1, 655.5, 386.1, 511.5, -0.041, 0.011, 0.0005, 0.0003],
    cm.CameraModelId.OPENCV_FISHEYE: [651.1, 655.5, 386.1, 511.5, -0.041, 0.011, 0.005, 0.003],
    cm.CameraModelId.FULL_OPENCV: [
        651.1, 655.5, 386.1, 511.5, -0.041, 0.011, 0.0005, 0.0003, 0.002, 0.001, 0.0005, 0.0002],
    cm.CameraModelId.FOV: [651.1, 655.5, 386.1, 511.5, 0.9],
    cm.CameraModelId.SIMPLE_RADIAL_FISHEYE: [651.1, 386.1, 511.5, -0.041],
    cm.CameraModelId.RADIAL_FISHEYE: [651.1, 386.1, 511.5, -0.041, 0.011],
    cm.CameraModelId.THIN_PRISM_FISHEYE: [
        651.1, 655.5, 386.1, 511.5, -0.041, 0.011, 0.0005, 0.0003, 0.002, 0.001, 0.0005, 0.0002],
    cm.CameraModelId.RAD_TAN_THIN_PRISM_FISHEYE: [
        651.1, 655.5, 386.1, 511.5, -0.041, 0.011, 0.002, 0.001, 0.0005, 0.0002,
        0.0005, 0.0003, 0.0001, 0.0001, 0.0001, 0.0001],
    cm.CameraModelId.SIMPLE_DIVISION: [651.1, 386.1, 511.5, -0.041],
    cm.CameraModelId.DIVISION: [651.1, 655.5, 386.1, 511.5, -0.041],
    cm.CameraModelId.SIMPLE_FISHEYE: [651.1, 386.1, 511.5],
    cm.CameraModelId.FISHEYE: [651.1, 655.5, 386.1, 511.5],
    cm.CameraModelId.EUCM: [651.1, 655.5, 386.1, 511.5, 0.6, 1.1],
    cm.CameraModelId.EQUIRECTANGULAR: [2048, 1024],
}


def normalized_grid():
    u = np.linspace(-0.4, 0.4, 9)
    uu, vv = np.meshgrid(u, u)
    pts = np.stack([uu.ravel(), vv.ravel(), np.ones(uu.size)], axis=-1)
    return jnp.asarray(pts)


@pytest.mark.parametrize("model_id", sorted(TEST_PARAMS, key=int))
def test_project_unproject_roundtrip(model_id):
    params = jnp.asarray(TEST_PARAMS[model_id], dtype=jnp.float64)
    pts = normalized_grid()
    xy, valid = cm.img_from_cam(model_id, params, pts)
    assert bool(jnp.all(valid)), f"projection invalid for {model_id.name}"
    uv, valid2 = cm.cam_from_img(model_id, params, xy)
    assert bool(jnp.all(valid2))
    uv3 = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    # Compare as directions (fisheye/equirect round through bearing space).
    expected = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    got = uv3 / jnp.linalg.norm(uv3, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, expected, atol=1e-6)


@pytest.mark.parametrize("model_id", sorted(TEST_PARAMS, key=int))
def test_reproject_consistency(model_id):
    """cam_from_img then img_from_cam reproduces the pixel."""
    params = jnp.asarray(TEST_PARAMS[model_id], dtype=jnp.float64)
    if model_id == cm.CameraModelId.EQUIRECTANGULAR:
        # Forward hemisphere only — CamFromImg rejects back-facing rays.
        x = np.linspace(600, 1400, 7)
        y = np.linspace(200, 800, 5)
    else:
        x = np.linspace(200, 600, 7)
        y = np.linspace(300, 700, 5)
    xx, yy = np.meshgrid(x, y)
    xy = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], axis=-1))
    uv, valid = cm.cam_from_img(model_id, params, xy)
    uvw = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    xy2, valid2 = cm.img_from_cam(model_id, params, uvw)
    mask = np.asarray(valid & valid2)
    assert mask.mean() > 0.9
    np.testing.assert_allclose(
        np.asarray(xy2)[mask], np.asarray(xy)[mask], atol=1e-5
    )


def test_cheirality():
    params = jnp.asarray(TEST_PARAMS[cm.CameraModelId.PINHOLE], dtype=jnp.float64)
    behind = jnp.asarray([[0.1, 0.1, -1.0]])
    _, valid = cm.img_from_cam(cm.CameraModelId.PINHOLE, params, behind)
    assert not bool(valid[0])
    _, valid = cm.img_from_cam(
        cm.CameraModelId.PINHOLE, params, behind, check_cheirality=False
    )
    assert bool(valid[0])


def test_cam_ray_from_img_unit_norm():
    for model_id in [cm.CameraModelId.OPENCV, cm.CameraModelId.EQUIRECTANGULAR]:
        params = jnp.asarray(TEST_PARAMS[model_id], dtype=jnp.float64)
        xy = jnp.asarray([[300.0, 400.0], [100.0, 200.0]])
        ray, valid = cm.cam_ray_from_img(model_id, params, xy)
        np.testing.assert_allclose(
            jnp.linalg.norm(ray, axis=-1), np.ones(2), atol=1e-12
        )


def test_equirectangular_full_sphere():
    params = jnp.asarray([2048.0, 1024.0])
    # Backward-looking point projects fine (unlike perspective models).
    pts = jnp.asarray([[0.0, 0.0, -1.0]])
    xy, valid = cm.img_from_cam(cm.CameraModelId.EQUIRECTANGULAR, params, pts)
    assert bool(valid[0])
    # Azimuth pi -> x at image border.
    assert abs(float(xy[0, 0])) < 1e-6 or abs(float(xy[0, 0]) - 2048) < 1e-6


def test_initialize_params():
    p = cm.initialize_params(cm.CameraModelId.OPENCV, 650.0, 800, 600)
    np.testing.assert_allclose(p, [650, 650, 400, 300, 0, 0, 0, 0])
    p = cm.initialize_params(cm.CameraModelId.SIMPLE_RADIAL, 650.0, 800, 600)
    np.testing.assert_allclose(p, [650, 400, 300, 0])
    p = cm.initialize_params(cm.CameraModelId.EUCM, 650.0, 800, 600)
    np.testing.assert_allclose(p, [650, 650, 400, 300, 0, 1])


def test_model_table():
    assert cm.MODEL_NAME_TO_ID["PINHOLE"] == 1
    assert cm.MODEL_ID_TO_NAME[11] == "RAD_TAN_THIN_PRISM_FISHEYE"
    assert cm.model_num_params(11) == 16
    assert cm.model_num_params(cm.CameraModelId.FULL_OPENCV) == 12


def test_has_bogus_params():
    good = cm.initialize_params(cm.CameraModelId.SIMPLE_RADIAL, 650.0, 800, 600)
    assert not cm.has_bogus_params(2, good, 800, 600, 0.1, 10, 1)
    bad = good.copy()
    bad[3] = 5.0  # huge distortion
    assert cm.has_bogus_params(2, bad, 800, 600, 0.1, 10, 1)
    bad = good.copy()
    bad[0] = 1.0  # tiny focal
    assert cm.has_bogus_params(2, bad, 800, 600, 0.1, 10, 1)


def test_float32_path():
    """The same code must run in f32 (the TPU path)."""
    params = jnp.asarray(TEST_PARAMS[cm.CameraModelId.OPENCV], dtype=jnp.float32)
    pts = jnp.asarray(normalized_grid(), dtype=jnp.float32)
    xy, valid = cm.img_from_cam(cm.CameraModelId.OPENCV, params, pts)
    uv, _ = cm.cam_from_img(cm.CameraModelId.OPENCV, params, xy)
    np.testing.assert_allclose(np.asarray(uv), np.asarray(pts[..., :2]), atol=1e-3)
