"""Reconstruction alignment and comparison.

reference behavior: src/colmap/estimators/alignment.h:42-86
(AlignReconstructions / CompareReconstructions) — Sim3 alignment on common
camera projection centers, then per-image rotation / projection-center
error metrics. Used by tests (ReconstructionNear assertions,
scene/reconstruction_matchers.h) and by model_aligner / evaluation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators.solvers.similarity import umeyama
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.scene.types import Pose


def align_reconstructions(
    src: Reconstruction, dst: Reconstruction, min_common_images: int = 3
) -> Optional[tuple]:
    """Sim3 (scale, quat, t) mapping src world frame to dst world frame,
    estimated from common registered images' projection centers."""
    common = sorted(
        set(src.reg_image_ids()) & set(dst.reg_image_ids())
    )
    if len(common) < min_common_images:
        return None
    src_centers = np.stack(
        [src.cam_from_world(i).projection_center() for i in common]
    )
    dst_centers = np.stack(
        [dst.cam_from_world(i).projection_center() for i in common]
    )
    s, R, t = umeyama(jnp.asarray(src_centers), jnp.asarray(dst_centers))
    from colmap_tpu.geometry import rotation as rot

    quat = np.asarray(rot.rotmat_to_quat(R))
    return float(s), quat, np.asarray(t)


def apply_sim3(recon: Reconstruction, scale: float, quat: np.ndarray, t: np.ndarray):
    recon.transform(scale, quat, t)


def compare_reconstructions(
    recon: Reconstruction, gt: Reconstruction, align: bool = True
) -> Dict:
    """Per-image rotation (deg) and projection-center errors after optional
    Sim3 alignment onto the ground truth.

    reference behavior: CompareReconstructions (alignment.cc) +
    ReconstructionNear matcher (scene/reconstruction_matchers.h).
    """
    import copy

    test = copy.deepcopy(recon)
    if align:
        sim = align_reconstructions(test, gt)
        if sim is None:
            return {"num_common_images": 0}
        apply_sim3(test, *sim)
    common = sorted(set(test.reg_image_ids()) & set(gt.reg_image_ids()))
    rot_errors, center_errors = [], []
    for iid in common:
        p1 = test.cam_from_world(iid)
        p2 = gt.cam_from_world(iid)
        rot_errors.append(np.rad2deg(p1.angle_to(p2)))
        center_errors.append(
            float(np.linalg.norm(p1.projection_center() - p2.projection_center()))
        )
    return {
        "num_common_images": len(common),
        "rotation_errors_deg": np.array(rot_errors),
        "center_errors": np.array(center_errors),
        "max_rotation_error_deg": float(np.max(rot_errors)) if rot_errors else np.inf,
        "max_center_error": float(np.max(center_errors)) if center_errors else np.inf,
    }
