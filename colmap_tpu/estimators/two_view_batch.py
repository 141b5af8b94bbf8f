"""Pair-block two-view verification: one device program per pair block.

reference behavior: the reference runs a dedicated verifier thread pool over
individual pairs (controllers/feature_matching_utils.h:50-133). TPU-native
redesign (SURVEY §2.3 "per-pair batched across the whole match set"): the
E/F/H LO-RANSACs are vmapped over a padded pair axis so a whole block of
pairs verifies in ONE device program; only the configuration decision tree
(cheap scalar logic, estimators/two_view_geometry.cc:57-118) stays on host.

The RANSAC core carries its early-exit flag in the loop state with guarded
updates (optim/ransac.py), so the vmapped block produces bit-identical
models/inlier sets to the per-pair path — verified by
tests/test_two_view_batch.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators.solvers.epipolar import fundamental_eight_point
from colmap_tpu.estimators.two_view_geometry import (
    TwoViewGeometryOptions,
    _detect_watermark,
    _estimate_uncalibrated_focals,
    _ransac_e,
    _ransac_f,
    _ransac_h,
    _recover_pose,
    estimate_two_view_geometry,
)
from colmap_tpu.scene.types import (
    Camera,
    TwoViewGeometry,
    TwoViewGeometryConfig,
)
from colmap_tpu.sensor import models as camera_models
from colmap_tpu.utils.bucketing import bucket_size, pad_rows
from colmap_tpu.utils.dtypes import floatx


class _BlockResult(NamedTuple):
    F: jnp.ndarray  # (B, 3, 3)
    H: jnp.ndarray  # (B, 3, 3)
    E: jnp.ndarray  # (B, 3, 3)
    F_from_E: jnp.ndarray  # (B, 3, 3) 8pt refit on the E inliers
    num_f: jnp.ndarray  # (B,)
    num_h: jnp.ndarray
    num_e: jnp.ndarray
    num_fh: jnp.ndarray  # |F inliers ∩ H inliers| (degensac trigger)
    mask_f: jnp.ndarray  # (B, M)
    mask_h: jnp.ndarray
    mask_e: jnp.ndarray


@partial(jax.jit, static_argnames=("ransac_options",))
def _verify_block(key, x1, x2, x1n, x2n, mask, thresh_n,
                  ransac_options) -> _BlockResult:
    """Vmapped E+F+H estimation over a (B, M, 2) pair block.

    E is always computed (its cost is within the F budget and lax branches
    under vmap would run both sides anyway); the host ignores it for
    uncalibrated pairs.
    """

    def single(x1, x2, x1n, x2n, mask, thresh_n):
        kf, ke, kh = jax.random.split(key, 3)
        res_f = _ransac_f(kf, x1, x2, mask, ransac_options)
        res_h = _ransac_h(kh, x1, x2, mask, ransac_options)
        res_e = _ransac_e(ke, x1n, x2n, mask, thresh_n, ransac_options)
        f_from_e = fundamental_eight_point(
            x1, x2, res_e.inlier_mask.astype(x1.dtype)
        )
        num_fh = jnp.sum(res_f.inlier_mask & res_h.inlier_mask)
        return _BlockResult(
            F=res_f.model, H=res_h.model, E=res_e.model, F_from_E=f_from_e,
            num_f=res_f.num_inliers, num_h=res_h.num_inliers,
            num_e=res_e.num_inliers, num_fh=num_fh,
            mask_f=res_f.inlier_mask, mask_h=res_h.inlier_mask,
            mask_e=res_e.inlier_mask,
        )

    return jax.vmap(single)(x1, x2, x1n, x2n, mask, thresh_n)


class _PairTask(NamedTuple):
    index: int  # position in the caller's pair list
    camera1: Camera
    camera2: Camera
    points1: np.ndarray
    points2: np.ndarray
    matches: np.ndarray  # already stationary-filtered
    x1: np.ndarray  # (m, 2) matched coords
    x2: np.ndarray
    x1n: np.ndarray  # normalized coords
    x2n: np.ndarray
    thresh_n: float
    calibrated: bool


def _classify_pair(task: _PairTask, block: _BlockResult, b: int,
                   options: TwoViewGeometryOptions, seed: int,
                   ) -> TwoViewGeometry:
    """Host decision tree on the device block results — mirrors
    estimate_two_view_geometry (reference two_view_geometry.cc:57-118)."""
    g = TwoViewGeometry()
    m = len(task.matches)
    num_f = int(block.num_f[b])
    num_h = int(block.num_h[b])
    num_e = int(block.num_e[b]) if task.calibrated else 0

    if options.use_degensac and num_f >= options.min_num_inliers:
        from colmap_tpu.estimators.degensac import is_h_degenerate

        if bool(is_h_degenerate(num_f, int(block.num_fh[b]))):
            # Rare: recover F via plane-and-parallax on the per-pair path.
            return estimate_two_view_geometry(
                task.camera1, task.points1, task.camera2, task.points2,
                task.matches, options, seed=seed,
            )

    if options.force_H_use:
        best_mask, best_num = block.mask_h[b], num_h
        g.config = int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
        g.H = np.asarray(block.H[b])
    elif (
        task.calibrated
        and num_e >= options.min_num_inliers
        and num_e > options.min_E_F_inlier_ratio * num_f
    ):
        best_mask, best_num = block.mask_e[b], num_e
        g.config = int(TwoViewGeometryConfig.CALIBRATED)
        g.E = np.asarray(block.E[b])
        g.F = np.asarray(block.F_from_E[b])
        if num_h > options.max_H_inlier_ratio * num_e:
            g.config = int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
            g.H = np.asarray(block.H[b])
    elif num_f >= options.min_num_inliers:
        best_mask, best_num = block.mask_f[b], num_f
        g.config = int(TwoViewGeometryConfig.UNCALIBRATED)
        g.F = np.asarray(block.F[b])
        if num_h > options.max_H_inlier_ratio * num_f:
            g.config = int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
            g.H = np.asarray(block.H[b])
        elif options.estimate_focals:
            _estimate_uncalibrated_focals(g, task.camera1, task.camera2)
    elif num_h >= options.min_num_inliers:
        best_mask, best_num = block.mask_h[b], num_h
        g.config = int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC)
        g.H = np.asarray(block.H[b])
    else:
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g

    if best_num < options.min_num_inliers or (
        options.min_inlier_ratio > 0
        and best_num < options.min_inlier_ratio * m
    ):
        g.config = int(TwoViewGeometryConfig.DEGENERATE)
        return g

    if options.detect_watermark and _detect_watermark(
        task.x1, task.x2, np.asarray(best_mask)[:m],
        task.camera1.width, task.camera1.height,
        task.camera2.width, task.camera2.height, options,
    ):
        g.config = int(TwoViewGeometryConfig.WATERMARK)

    g.inlier_matches = (
        task.matches[np.asarray(best_mask)[:m]].astype(np.uint32)
    )

    if options.compute_relative_pose and g.config in (
        int(TwoViewGeometryConfig.CALIBRATED),
        int(TwoViewGeometryConfig.UNCALIBRATED),
        int(TwoViewGeometryConfig.PLANAR_OR_PANORAMIC),
    ):
        _recover_pose(g, task.camera1, task.points1, task.camera2,
                      task.points2)
    return g


def estimate_two_view_geometries_batched(
    items: Sequence[Tuple[Camera, np.ndarray, Camera, np.ndarray, np.ndarray]],
    options: Optional[TwoViewGeometryOptions] = None,
    seed: int = 0,
    max_block_pairs: int = 64,
    normalized_cache: Optional[Dict[int, np.ndarray]] = None,
) -> List[TwoViewGeometry]:
    """Verify many pairs with blocked device programs.

    items: sequence of (camera1, points1, camera2, points2, matches) like
    repeated estimate_two_view_geometry calls. Pairs are grouped by the
    padded match-count bucket (so block shapes — and therefore results —
    match the per-pair path exactly) and vmapped in sub-blocks of up to
    max_block_pairs.

    normalized_cache: optional {id(points_array): normalized} dict letting
    callers reuse per-image normalization across pairs.
    """
    if options is None:
        options = TwoViewGeometryOptions()
    out: List[Optional[TwoViewGeometry]] = [None] * len(items)
    if normalized_cache is None:
        normalized_cache = {}

    def normalized(camera: Camera, points: np.ndarray) -> np.ndarray:
        key = (id(points), camera.camera_id)
        if key not in normalized_cache:
            xn, _ = camera_models.cam_from_img(
                camera.model_id, jnp.asarray(camera.params, dtype=floatx()),
                jnp.asarray(points, dtype=floatx()),
            )
            normalized_cache[key] = np.asarray(xn)
        return normalized_cache[key]

    from colmap_tpu.estimators.spherical import is_spherical

    tasks: List[_PairTask] = []
    for i, (cam1, pts1, cam2, pts2, matches) in enumerate(items):
        matches = np.asarray(matches)
        if options.multiple_models or is_spherical(cam1) or is_spherical(cam2):
            out[i] = estimate_two_view_geometry(
                cam1, pts1, cam2, pts2, matches, options, seed=seed
            )
            continue
        if options.filter_stationary_matches and len(matches) > 0:
            disp = (
                np.asarray(pts1)[matches[:, 0]]
                - np.asarray(pts2)[matches[:, 1]]
            )
            moving = np.sum(disp * disp, axis=1) > (
                options.stationary_matches_max_error**2
            )
            matches = matches[moving]
        if len(matches) < options.min_num_inliers:
            g = TwoViewGeometry()
            g.config = int(TwoViewGeometryConfig.DEGENERATE)
            out[i] = g
            continue
        x1 = np.asarray(pts1)[matches[:, 0]].astype(np.float64)
        x2 = np.asarray(pts2)[matches[:, 1]].astype(np.float64)
        x1n = normalized(cam1, pts1)[matches[:, 0]]
        x2n = normalized(cam2, pts2)[matches[:, 1]]
        thresh_n = 0.5 * (
            cam1.cam_from_img_threshold(options.ransac.max_error)
            + cam2.cam_from_img_threshold(options.ransac.max_error)
        )
        calibrated = bool(
            cam1.has_prior_focal_length and cam2.has_prior_focal_length
        )
        tasks.append(_PairTask(
            index=i, camera1=cam1, camera2=cam2, points1=pts1, points2=pts2,
            matches=matches, x1=x1, x2=x2, x1n=x1n, x2n=x2n,
            thresh_n=float(thresh_n), calibrated=calibrated,
        ))

    # Group by match-count bucket so padded shapes match the per-pair path.
    by_bucket: Dict[int, List[_PairTask]] = {}
    for t in tasks:
        by_bucket.setdefault(bucket_size(len(t.matches), 256), []).append(t)

    key = jax.random.PRNGKey(seed)
    for bucket, group in sorted(by_bucket.items()):
        for start in range(0, len(group), max_block_pairs):
            chunk = group[start:start + max_block_pairs]
            B = _pair_block_size(len(chunk), max_block_pairs)
            x1 = np.zeros((B, bucket, 2), dtype=np.float64)
            x2 = np.zeros_like(x1)
            x1n = np.zeros_like(x1)
            x2n = np.zeros_like(x1)
            mask = np.zeros((B, bucket), dtype=bool)
            thr = np.full(B, 1e-3)
            for b, t in enumerate(chunk):
                m = len(t.matches)
                x1[b] = pad_rows(t.x1, bucket)
                x2[b] = pad_rows(t.x2, bucket)
                x1n[b] = pad_rows(t.x1n, bucket)
                x2n[b] = pad_rows(t.x2n, bucket)
                mask[b, :m] = True
                thr[b] = t.thresh_n
            # Unused lanes replicate lane 0 (results discarded). All-zero
            # lanes would feed degenerate all-zero samples to the batched
            # eigh/solve inside the 5-point solver, whose CPU LAPACK batch
            # kernels can poison EVERY batch element on such inputs — and a
            # zero-valid lane would also spin the RANSAC loop to
            # max_num_trials. Real replicated lanes converge fast and keep
            # the linalg batch well-conditioned.
            for b in range(len(chunk), B):
                x1[b], x2[b] = x1[0], x2[0]
                x1n[b], x2n[b] = x1n[0], x2n[0]
                mask[b] = mask[0]
                thr[b] = thr[0]
            fx = floatx()
            block = _verify_block(
                key,
                jnp.asarray(x1, dtype=fx), jnp.asarray(x2, dtype=fx),
                jnp.asarray(x1n, dtype=fx), jnp.asarray(x2n, dtype=fx),
                jnp.asarray(mask), jnp.asarray(thr, dtype=fx),
                options.ransac,
            )
            block = jax.tree.map(np.asarray, block)  # one host sync
            for b, t in enumerate(chunk):
                out[t.index] = _classify_pair(t, block, b, options, seed)
    return out  # type: ignore[return-value]


def _pair_block_size(n: int, cap: int) -> int:
    """Bucket the pair axis (1, 2, 4, ..., cap) to bound recompiles."""
    b = 1
    while b < n and b < cap:
        b *= 2
    return min(b, cap)
