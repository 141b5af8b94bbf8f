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
def _verify_block(key, coords, mask, thresh_n,
                  ransac_options) -> _BlockResult:
    """Vmapped E+F+H estimation over a pair block.

    coords: (B, M, 8) packed [x1 | x2 | x1n | x2n] — ONE host->device
    transfer per block (the tunnel pays ~50-100 ms latency per transfer;
    four separate arrays dominated the verification wall).

    E is always computed (its cost is within the F budget and lax branches
    under vmap would run both sides anyway); the host ignores it for
    uncalibrated pairs.
    """
    x1 = coords[..., 0:2]
    x2 = coords[..., 2:4]
    x1n = coords[..., 4:6]
    x2n = coords[..., 6:8]

    def single(x1, x2, x1n, x2n, mask, thresh_n):
        kf, ke, kh = jax.random.split(key, 3)
        res_f = _ransac_f(kf, x1, x2, mask, ransac_options)
        res_h = _ransac_h(kh, x1, x2, mask, ransac_options)
        res_e = _ransac_e(ke, x1n, x2n, mask, thresh_n, ransac_options)
        f_from_e = fundamental_eight_point(
            x1, x2, res_e.inlier_mask.astype(x1.dtype)
        )
        num_fh = jnp.sum(res_f.inlier_mask & res_h.inlier_mask)
        # Pack into THREE output arrays (models, counts, masks): the
        # device tunnel pays ~30 ms latency per device->host transfer, so
        # fetching eleven separate results per block dominated the wall.
        models = jnp.stack([res_f.model, res_h.model, res_e.model,
                            f_from_e])  # (4, 3, 3)
        nums = jnp.stack([res_f.num_inliers, res_h.num_inliers,
                          res_e.num_inliers, num_fh])  # (4,)
        masks = jnp.stack([res_f.inlier_mask, res_h.inlier_mask,
                           res_e.inlier_mask], axis=-1)  # (M, 3)
        return models, nums, masks

    return jax.vmap(single)(x1, x2, x1n, x2n, mask, thresh_n)


def _unpack_block(models, nums, masks) -> _BlockResult:
    """Host-side view of the packed block outputs as a _BlockResult."""
    return _BlockResult(
        F=models[:, 0], H=models[:, 1], E=models[:, 2], F_from_E=models[:, 3],
        num_f=nums[:, 0], num_h=nums[:, 1], num_e=nums[:, 2],
        num_fh=nums[:, 3],
        mask_f=masks[..., 0], mask_h=masks[..., 1], mask_e=masks[..., 2],
    )


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

    # Batched normalization prepass: ONE device call per (model, bucket)
    # group instead of one cam_from_img dispatch per image (each dispatch
    # pays the device-tunnel round trip).
    unique: Dict[tuple, tuple] = {}
    for (cam1, pts1, cam2, pts2, _m) in items:
        for cam, pts in ((cam1, pts1), (cam2, pts2)):
            k = (id(pts), cam.camera_id)
            if k not in normalized_cache and k not in unique:
                if not (is_spherical(cam)):
                    unique[k] = (cam, np.asarray(pts))
    groups: Dict[tuple, list] = {}
    for k, (cam, pts) in unique.items():
        b = bucket_size(max(len(pts), 1), 256)
        groups.setdefault(
            (int(cam.model_id), len(cam.params), b), []
        ).append((k, cam, pts))
    for (mid, P, b), members in groups.items():
        pts_all = np.zeros((len(members), b, 2), dtype=floatx())
        params = np.stack(
            [np.asarray(cam.params, dtype=floatx()) for (_k, cam, _p) in members]
        )
        for r, (_k, _cam, pts) in enumerate(members):
            pts_all[r, : len(pts)] = pts
        uv, _ok = camera_models.cam_from_img(
            mid, jnp.asarray(params)[:, None, :], jnp.asarray(pts_all)
        )
        uv = np.asarray(uv)
        for r, (k, _cam, pts) in enumerate(members):
            normalized_cache[k] = uv[r, : len(pts)]

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
    # Two-phase launch/collect: all blocks are prepared and dispatched
    # first (JAX queues them asynchronously), results are fetched after —
    # host prep and device compute of different blocks overlap instead of
    # serializing on one sync per block.
    launches = []
    for bucket, group in sorted(by_bucket.items()):
        for start in range(0, len(group), max_block_pairs):
            chunk = group[start:start + max_block_pairs]
            B = _pair_block_size(len(chunk), max_block_pairs)
            fx = floatx()
            coords = np.zeros((B, bucket, 8), dtype=fx)
            mask = np.zeros((B, bucket), dtype=bool)
            thr = np.full(B, 1e-3)
            for b, t in enumerate(chunk):
                m = len(t.matches)
                coords[b, :m, 0:2] = t.x1
                coords[b, :m, 2:4] = t.x2
                coords[b, :m, 4:6] = t.x1n
                coords[b, :m, 6:8] = t.x2n
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
                coords[b] = coords[0]
                mask[b] = mask[0]
                thr[b] = thr[0]
            block = _verify_block(
                key, jnp.asarray(coords), jnp.asarray(mask),
                jnp.asarray(thr, dtype=fx), options.ransac,
            )
            launches.append((chunk, block))
    for chunk, block in launches:
        block = _unpack_block(*jax.tree.map(np.asarray, block))
        for b, t in enumerate(chunk):
            out[t.index] = _classify_pair(t, block, b, options, seed)
    return out  # type: ignore[return-value]


def _pair_block_size(n: int, cap: int) -> int:
    """Bucket the pair axis (1, 2, 4, ..., cap) to bound recompiles."""
    b = 1
    while b < n and b < cap:
        b *= 2
    return min(b, cap)
