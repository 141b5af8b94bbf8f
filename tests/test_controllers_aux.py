"""Tests: option manager, snapshots, synthetic image rendering, vocab-tree
matching integration.

reference test strategy: controllers option tests, synthetic image tests.
"""

import os

import numpy as np
import pytest

from colmap_tpu.controllers.option_manager import OptionManager
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset


def test_option_manager_roundtrip(tmp_path):
    om = OptionManager(database_path="/x/db.db", image_path="/x/images")
    om.apply_flags({
        "Mapper.min_num_matches": "22",
        "Mapper.mapper.init_min_num_inliers": "77",
        "SiftExtraction.max_num_features": "4096",
        "SiftMatching.max_ratio": "0.75",
    })
    assert om.mapper.min_num_matches == 22
    assert om.mapper.mapper.init_min_num_inliers == 77
    assert om.sift.max_num_features == 4096
    assert abs(om.matching.max_ratio - 0.75) < 1e-12

    ini = tmp_path / "project.ini"
    om.write(str(ini))
    om2 = OptionManager.read(str(ini))
    assert om2.database_path == "/x/db.db"
    assert om2.mapper.min_num_matches == 22
    assert om2.sift.max_num_features == 4096
    assert abs(om2.matching.max_ratio - 0.75) < 1e-12


def test_snapshots_and_max_runtime(tmp_path):
    from colmap_tpu.sfm.incremental_pipeline import (
        IncrementalPipeline,
        IncrementalPipelineOptions,
    )

    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=7, num_points3D=80, seed=41,
        camera_has_prior_focal_length=True,
    )
    db = Database(":memory:")
    synthesize_dataset(opt, database=db)
    snap_dir = str(tmp_path / "snaps")
    os.makedirs(snap_dir)
    options = IncrementalPipelineOptions(
        snapshot_path=snap_dir, snapshot_frames_freq=2
    )
    models = IncrementalPipeline(options, db).run()
    assert models and models[0].num_reg_frames() == 7
    snaps = sorted(os.listdir(snap_dir))
    assert len(snaps) >= 2
    from colmap_tpu.scene.reconstruction_io import read_model

    partial = read_model(os.path.join(snap_dir, snaps[0]))
    assert 2 <= partial.num_reg_frames() < 7


def test_render_images_consistent(tmp_path):
    """Rendered synthetic views reproject their 3D points consistently."""
    from colmap_tpu.scene.synthetic_images import render_images

    opt = SyntheticDatasetOptions(
        num_rigs=1, num_frames_per_rig=3, num_points3D=40, seed=8,
        camera_model_id=1, camera_params=(600.0, 600.0, 320.0, 240.0),
        camera_width=640, camera_height=480,
    )
    recon = synthesize_dataset(opt)
    names = render_images(recon, str(tmp_path), patch_world=0.08)
    assert len(names) == 3
    from PIL import Image as PILImage

    for n in names:
        img = np.asarray(PILImage.open(tmp_path / n))
        assert img.shape == (480, 640)
        assert img.max() > 50  # content present


def test_logging_and_timer():
    """Logging/Timer utilities (reference: util/logging.h LOG_HEADING,
    util/timer.{h,cc})."""
    import io
    import logging as pylogging
    import time

    from colmap_tpu.utils import logging as clog

    buf = io.StringIO()
    h = pylogging.StreamHandler(buf)
    h.setFormatter(pylogging.Formatter("%(message)s"))
    logger = pylogging.getLogger("colmap_tpu")
    logger.addHandler(h)
    try:
        clog.set_verbosity(1)
        clog.log_heading("Phase A")
        clog.vlog(1, "detail %d", 42)
        clog.vlog(2, "hidden")
        clog.set_verbosity(0)
        clog.vlog(1, "also hidden")
        t = clog.Timer()
        t.start()
        time.sleep(0.01)
        assert t.elapsed_seconds() >= 0.009
        t.pause()
        e1 = t.elapsed_seconds()
        time.sleep(0.01)
        assert t.elapsed_seconds() == e1
        t.resume()
        t.print_minutes()
        with clog.ScopedTimer("phase"):
            pass
        out = buf.getvalue()
        assert "=== Phase A ===" in out
        assert "detail 42" in out
        assert "hidden" not in out
        assert "Elapsed time:" in out and "[minutes]" in out
        assert "phase:" in out
    finally:
        logger.removeHandler(h)
        clog.set_verbosity(0)
