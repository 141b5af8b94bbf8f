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


def align_reconstruction_to_pose_priors(
    recon: Reconstruction,
    prior_positions: Dict[int, np.ndarray],
    robust_max_error: float = 0.0,
    seed: int = 0,
):
    """Sim3-align a reconstruction to per-image prior positions (e.g. GPS).

    reference behavior: AlignReconstructionToPosePriors (alignment.h:42-86)
    — robust (RANSAC-over-triplets) Umeyama between projection centers and
    prior positions when robust_max_error > 0, plain weighted Umeyama
    otherwise. Transforms the reconstruction in place; returns the Sim3
    (scale, quat, t) or None.
    """
    import jax
    import jax.numpy as jnp

    common = [i for i in recon.reg_image_ids() if i in prior_positions]
    if len(common) < 3:
        return None
    src = np.stack([recon.cam_from_world(i).projection_center() for i in common])
    dst = np.stack([np.asarray(prior_positions[i], dtype=np.float64) for i in common])

    from colmap_tpu.geometry import rotation as rot

    if robust_max_error > 0 and len(common) >= 4:
        rng = np.random.default_rng(seed)
        best = None
        for _ in range(256):
            idx = rng.choice(len(common), 3, replace=False)
            s, R, t = umeyama(jnp.asarray(src[idx]), jnp.asarray(dst[idx]))
            pred = float(s) * src @ np.asarray(R).T + np.asarray(t)
            inl = np.linalg.norm(pred - dst, axis=1) <= robust_max_error
            if best is None or inl.sum() > best[0]:
                best = (inl.sum(), inl)
        if best is None or best[0] < 3:
            return None
        inl = best[1]
        s, R, t = umeyama(jnp.asarray(src[inl]), jnp.asarray(dst[inl]))
    else:
        s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst))
    quat = np.asarray(rot.rotmat_to_quat(R))
    recon.transform(float(s), quat, np.asarray(t))
    return (float(s), quat, np.asarray(t))
