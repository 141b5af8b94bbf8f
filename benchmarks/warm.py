"""Background compile warming for the mapping/AUC benches.

bench.py runs extras cheapest-first; the incremental-mapping and AUC
extras run several minutes in. Their XLA programs are fully predictable
from the bench scene configs (15/12 frames, 200 points, one
SIMPLE_RADIAL camera), so scheduling those compiles on the BA warm pool
right after the headline lets them ride along under the earlier extras'
wall-clock instead of burning the mapping budget (the initial-pair
essential RANSAC alone compiles ~60 s on the v5e relay).
"""

from __future__ import annotations


def schedule_mapping_warms(num_frames: int = 15) -> None:
    """Best-effort: schedule every program the mapping benches need."""
    import numpy as np

    from colmap_tpu.estimators import bundle_adjustment as ba
    from colmap_tpu.sfm.incremental_mapper import (
        IncrementalMapperOptions,
        PIPELINE_BA_OPTIONS,
    )
    from colmap_tpu.utils.dtypes import floatx

    from colmap_tpu.sensor import models as camera_models

    model_id = int(camera_models.CameraModelId.SIMPLE_RADIAL)
    dtype = floatx()
    F_top = ba._bucket_fine(num_frames, 8)
    for F in sorted({8, F_top}):
        for N in (256, 512):
            ba.warm_packed_solver_async(
                F, N, 16, 1, 4, model_id, PIPELINE_BA_OPTIONS, dtype
            )

    def warm_ransacs():
        try:
            import jax as _jax
            import jax.numpy as jnp

            from colmap_tpu.estimators.pose import (
                AbsolutePoseOptions,
                estimate_absolute_pose,
            )
            from colmap_tpu.estimators.two_view_geometry import _ransac_e
            from colmap_tpu.optim.ransac import RansacOptions
            from colmap_tpu.scene.types import Camera

            mopts = IncrementalMapperOptions()
            ropts = RansacOptions(
                confidence=0.999, min_num_trials=100, max_num_trials=10000,
                min_inlier_ratio=0.25, batch_size=128,
            )
            z = jnp.zeros((256, 2), dtype=dtype)
            _ransac_e(_jax.random.PRNGKey(0), z, z,
                      jnp.zeros(256, dtype=bool), jnp.asarray(1e-3), ropts)
            cam = Camera.create(1, model_id, 1280.0, 1024, 768)
            rng = np.random.default_rng(0)
            pts3 = rng.normal(size=(64, 3)) + np.array([0, 0, 5.0])
            pts2 = rng.uniform(0, 700, (64, 2))
            estimate_absolute_pose(
                cam, pts2, pts3,
                AbsolutePoseOptions(
                    max_error_px=mopts.abs_pose_max_error,
                    min_inlier_ratio=mopts.abs_pose_min_inlier_ratio,
                ),
                seed=mopts.seed,
            )
        except Exception:
            pass

    ba._warm_pool().submit(warm_ransacs)
