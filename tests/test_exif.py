"""EXIF reading + sensor-specs focal estimation.

reference analogue: sensor/bitmap_test.cc EXIF tests and
controllers/image_reader camera initialization.
"""

import numpy as np
import pytest
from PIL import Image

from colmap_tpu.sensor.specs import (
    focal_length_px_from_exif,
    sensor_width_mm,
)
from colmap_tpu.utils.exif import read_exif


def _write_jpeg_with_exif(path, focal_mm=None, f35=None, make=None, model=None):
    img = Image.fromarray(np.zeros((40, 60, 3), dtype=np.uint8))
    exif = Image.Exif()
    if make:
        exif[271] = make
    if model:
        exif[272] = model
    if focal_mm is not None:
        exif[37386] = focal_mm
    if f35 is not None:
        exif[41989] = f35
    img.save(path, exif=exif)


def test_read_exif_focal_35mm(tmp_path):
    p = str(tmp_path / "a.jpg")
    _write_jpeg_with_exif(p, f35=50, make="Canon", model="EOS 5D Mark III")
    exif = read_exif(p)
    assert exif["make"] == "Canon"
    assert abs(exif["focal_length_35mm"] - 50) < 1e-6
    focal, prior = focal_length_px_from_exif(exif, 6000, 4000)
    assert prior
    assert abs(focal - 50 / 36.0 * 6000) < 1e-3


def test_focal_from_sensor_width():
    exif = {"focal_length_mm": 24.0, "make": "NIKON CORPORATION",
            "model": "NIKON D750"}
    focal, prior = focal_length_px_from_exif(exif, 6016, 4016)
    assert prior
    assert abs(focal - 24.0 / 35.9 * 6016) < 1e-3


def test_focal_fallback_default():
    focal, prior = focal_length_px_from_exif({}, 640, 480)
    assert not prior
    assert abs(focal - 1.2 * 640) < 1e-9


def test_sensor_width_lookup_variants():
    assert sensor_width_mm("Canon", "Canon EOS 5D Mark III") == 36.0
    assert sensor_width_mm("SONY", "ILCE-7M2") == 35.8
    assert sensor_width_mm("Acme", "Compact 1/2.3 Zoom") == 6.17
    assert sensor_width_mm("Unknown", "Mystery") is None


def test_read_exif_no_exif(tmp_path):
    p = str(tmp_path / "plain.png")
    Image.fromarray(np.zeros((10, 10), dtype=np.uint8)).save(p)
    assert read_exif(p) == {}


def test_image_reader_uses_exif(tmp_path):
    from colmap_tpu.controllers.feature_pipeline import (
        ImageReaderOptions,
        run_feature_extraction,
    )
    from colmap_tpu.scene.database import Database

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    img = Image.fromarray(arr)
    exif = Image.Exif()
    exif[41989] = 35  # 35mm-equivalent focal
    img.save(str(d / "a.jpg"), exif=exif)

    db = Database(":memory:")
    ids = run_feature_extraction(db, str(d))
    cams = db.read_cameras()
    assert len(cams) == 1
    cam = next(iter(cams.values())) if isinstance(cams, dict) else cams[0]
    assert cam.has_prior_focal_length
    assert abs(cam.params[0] - 35 / 36.0 * 96) < 1e-3


def test_read_exif_gps(tmp_path):
    p = str(tmp_path / "gps.jpg")
    img = Image.fromarray(np.zeros((10, 10, 3), dtype=np.uint8))
    exif = Image.Exif()
    exif[34853] = {1: "N", 2: (40.0, 26.0, 46.0), 3: "W",
                   4: (79.0, 58.0, 56.0), 6: 100.0}
    img.save(p, exif=exif)
    out = read_exif(p)
    assert abs(out["latitude"] - (40 + 26 / 60 + 46 / 3600)) < 1e-9
    assert abs(out["longitude"] + (79 + 58 / 60 + 56 / 3600)) < 1e-9
    assert abs(out["altitude"] - 100.0) < 1e-9


def test_image_reader_writes_gps_pose_prior(tmp_path):
    from colmap_tpu.controllers.feature_pipeline import run_feature_extraction
    from colmap_tpu.scene.database import Database

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
    exif = Image.Exif()
    exif[34853] = {1: "N", 2: (40.0, 0.0, 0.0), 3: "E", 4: (70.0, 0.0, 0.0)}
    img.save(str(d / "g.jpg"), exif=exif)
    db = Database(":memory:")
    ids = run_feature_extraction(db, str(d))
    priors = db.read_pose_priors()
    assert len(priors) == 1
    prior = next(iter(priors.values())) if isinstance(priors, dict) else priors[0]
    pos = prior.position if hasattr(prior, "position") else prior["position"]
    np.testing.assert_allclose(np.asarray(pos).ravel()[:2], [40.0, 70.0])
