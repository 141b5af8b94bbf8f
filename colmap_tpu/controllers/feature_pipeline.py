"""Feature extraction and matching pipelines (image dir / DB orchestration).

reference behavior: src/colmap/controllers/feature_extraction.cc (3-stage
reader→extractor→writer thread pipeline) and feature_matching.cc (pair
blocks → GPU matcher workers → verifier pool → DB). The thread/queue
machinery collapses into host loops feeding batched device calls
(SURVEY §2.9 P1/P2): images stream through the SIFT program, pair blocks
stream through the vmapped matcher, verification runs the vectorized
two-view RANSAC, and results land in the SQLite database.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from colmap_tpu.estimators.two_view_geometry import (
    TwoViewGeometryOptions,
    estimate_two_view_geometry,
)
from colmap_tpu.feature.matcher import MatchingOptions, match_descriptors
from colmap_tpu.feature.pairing import (
    ExhaustivePairingOptions,
    SequentialPairingOptions,
    exhaustive_pairs,
    sequential_pairs,
)
from colmap_tpu.feature.sift import SiftOptions, extract_sift
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.types import Camera
from colmap_tpu.sensor import models as camera_models


@dataclasses.dataclass
class ImageReaderOptions:
    """reference: controllers/image_reader.h — camera init from EXIF or
    defaults; camera modes single/per-image."""

    camera_model: str = "SIMPLE_RADIAL"
    single_camera: bool = True
    default_focal_length_factor: float = 1.2
    camera_params: Optional[str] = None  # comma-separated explicit params
    # Per-image masks: mask for image "abc/012.jpg" is read from
    # "<mask_path>/abc/012.jpg.png" (or "<stem>.png" fallback); zero-valued
    # mask pixels suppress features (reference: image_reader.h:49-52).
    mask_path: Optional[str] = None
    # One mask applied to every image of the camera
    # (reference: image_reader.h:57 camera_mask_path).
    camera_mask_path: Optional[str] = None
    # Feature extractor type (reference: feature/types.h:43
    # FeatureExtractorType SIFT / ALIKED_N16ROT / ALIKED_N32).
    extractor_type: str = "sift"  # "sift" | "aliked"
    # Optional PyTorch checkpoint with official ALIKED weights; without it
    # a deterministic random initialization is used (documented fallback —
    # this environment cannot download the reference's ONNX models).
    aliked_weights_path: Optional[str] = None


def _load_image_gray(path: str) -> np.ndarray:
    from PIL import Image as PILImage

    img = PILImage.open(path).convert("L")
    return np.asarray(img, dtype=np.uint8)


def _load_mask(reader_options: ImageReaderOptions, name: str) -> Optional[np.ndarray]:
    """Load the feature mask for an image, or None. Zero mask pixels
    suppress keypoints (reference: image_reader.cc:148-172 +
    feature_extraction.cc keypoint masking)."""
    from PIL import Image as PILImage

    path = None
    if reader_options.mask_path:
        cand = os.path.join(reader_options.mask_path, name + ".png")
        if os.path.exists(cand):
            path = cand
        else:
            stem, _ = os.path.splitext(name)
            alt = os.path.join(reader_options.mask_path, stem + ".png")
            if os.path.exists(alt):
                path = alt
            else:
                raise FileNotFoundError(f"Mask at {cand} does not exist")
    elif reader_options.camera_mask_path:
        path = reader_options.camera_mask_path
    if path is None:
        return None
    return np.asarray(PILImage.open(path).convert("L"))


def _apply_mask(kp: np.ndarray, desc: np.ndarray, mask_img: np.ndarray):
    """Drop keypoints on zero mask pixels."""
    x = np.clip(kp[:, 0].astype(np.int64), 0, mask_img.shape[1] - 1)
    y = np.clip(kp[:, 1].astype(np.int64), 0, mask_img.shape[0] - 1)
    keep = mask_img[y, x] != 0
    return kp[keep], desc[keep]


def run_feature_extraction(
    database: Database,
    image_dir: str,
    image_names: Optional[Sequence[str]] = None,
    reader_options: ImageReaderOptions = ImageReaderOptions(),
    sift_options: SiftOptions = SiftOptions(),
) -> List[int]:
    """Extract features for all images in a directory into the database.

    Returns the list of image ids.
    """
    from colmap_tpu.utils.exif import read_exif

    if image_names is None:
        image_names = sorted(
            f
            for f in os.listdir(image_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"))
        )
    model_id = camera_models.MODEL_NAME_TO_ID[reader_options.camera_model]
    camera_id = None
    image_ids = []

    # Reader prefetch (reference: the bounded reader->extractor JobQueue of
    # controllers/feature_extraction.cc:86-470): a worker thread decodes +
    # EXIF-reads ahead of the device extractor, bounded to 4 in flight so
    # host decode overlaps device extraction without unbounded memory. DB
    # writes stay on this (sqlite-owning) thread.
    from concurrent.futures import ThreadPoolExecutor

    def _read_one(name):
        path = os.path.join(image_dir, name)
        img = _load_image_gray(path)
        exif = read_exif(path)
        return name, path, img, exif

    reader = ThreadPoolExecutor(max_workers=1, thread_name_prefix="img-read")
    pending = []
    AHEAD = 4
    name_iter = iter(image_names)
    for name in image_names[:AHEAD]:
        pending.append(reader.submit(_read_one, name))
        next(name_iter)

    while pending:
        name, path, img, exif_cached = pending.pop(0).result()
        nxt = next(name_iter, None)
        if nxt is not None:
            pending.append(reader.submit(_read_one, nxt))
        h, w = img.shape
        if camera_id is None or not reader_options.single_camera:
            # EXIF focal (35mm-equivalent or mm + sensor-width lookup),
            # falling back to the default factor — reference:
            # controllers/image_reader.cc camera init + sensor/specs.*.
            from colmap_tpu.sensor.specs import focal_length_px_from_exif

            exif = exif_cached
            focal, has_prior = focal_length_px_from_exif(
                exif, w, h, reader_options.default_focal_length_factor
            )
            cam = Camera.create(0, model_id, focal, w, h)
            cam.has_prior_focal_length = has_prior
            if reader_options.camera_params:
                cam.params = np.array(
                    [float(v) for v in reader_options.camera_params.split(",")]
                )
                cam.has_prior_focal_length = True
            cam.camera_id = None
            camera_id = database.write_camera(
                Camera(
                    camera_id=0, model_id=model_id, width=w, height=h,
                    params=cam.params, has_prior_focal_length=cam.has_prior_focal_length,
                ),
                use_camera_id=False,
            )
        image_id = database.write_image(name, camera_id)
        # EXIF GPS -> WGS84 pose prior (reference: image_reader.cc pose
        # prior from GPS, coordinate_system=WGS84 which is enum value 0).
        exif_gps = exif_cached
        if "latitude" in exif_gps and "longitude" in exif_gps:
            database.write_pose_prior(
                image_id,
                position=np.array([
                    exif_gps["latitude"], exif_gps["longitude"],
                    exif_gps.get("altitude", 0.0),
                ]),
                coordinate_system=0,  # WGS84
            )
        if reader_options.extractor_type.startswith("aliked"):
            from colmap_tpu.feature.aliked import (
                AlikedOptions,
                extract_aliked,
                init_params,
                load_torch_weights,
            )

            aliked_opts = AlikedOptions(
                max_num_keypoints=sift_options.max_num_features
            )
            if not hasattr(run_feature_extraction, "_aliked_params"):
                if reader_options.aliked_weights_path:
                    run_feature_extraction._aliked_params = load_torch_weights(
                        reader_options.aliked_weights_path, aliked_opts
                    )
                else:
                    run_feature_extraction._aliked_params = init_params(aliked_opts)
            kp, desc = extract_aliked(
                img, run_feature_extraction._aliked_params, aliked_opts
            )
            # Scale float descriptors into the uint8 DB range.
            desc = np.clip((desc + 1.0) * 127.5, 0, 255).astype(np.uint8)
        else:
            kp, desc = extract_sift(img, sift_options)
        mask_img = _load_mask(reader_options, name)
        if mask_img is not None:
            kp, desc = _apply_mask(np.asarray(kp), np.asarray(desc), mask_img)
        # DB keypoint blob: x, y, scale, orientation (4-col format), or the
        # full 6-col affine frame when estimate_affine_shape produced one.
        database.write_keypoints(
            image_id, kp if kp.shape[1] == 6 else kp[:, :4]
        )
        database.write_descriptors(image_id, desc)
        image_ids.append(image_id)
    reader.shutdown(wait=False)
    database.commit()
    return image_ids


@dataclasses.dataclass
class MatchingPipelineOptions:
    matching: MatchingOptions = dataclasses.field(default_factory=MatchingOptions)
    verification: TwoViewGeometryOptions = dataclasses.field(
        default_factory=TwoViewGeometryOptions
    )
    min_num_inliers: int = 15
    # Re-match with the verified epipolar geometry as a constraint
    # (reference: guided matching, controllers/feature_matching_utils.h:133).
    guided_matching: bool = False
    # Matcher type (reference: feature/types.h:47-50 SIFT_BRUTEFORCE /
    # SIFT_LIGHTGLUE / ALIKED_BRUTEFORCE / ALIKED_LIGHTGLUE).
    matcher_type: str = "bruteforce"  # "bruteforce" | "lightglue"
    lightglue_weights_path: Optional[str] = None
    # Overrides LightGlueOptions (layer count, filter threshold, ...).
    lightglue_options: Optional[object] = None


def _match_and_verify_pairs(
    database: Database,
    pairs: Sequence[Tuple[int, int]],
    options: MatchingPipelineOptions,
    block_pairs: int = 256,
):
    """Match + verify a pair list through blocked device programs.

    TPU-native shape (SURVEY §2.9 P2): pairs stream in blocks; each block is
    ONE vmapped matcher program plus a handful of vmapped verification
    programs (grouped by match-count bucket) — replacing the reference's
    per-pair matcher workers + verifier thread pool
    (controllers/feature_matching_utils.h:50-133). Host caches are bounded
    per block (the reference FeatureMatcherCache analog is capacity-bounded
    by construction: descriptors live only for the current block).
    """
    from colmap_tpu.estimators.two_view_batch import (
        estimate_two_view_geometries_batched,
    )
    from colmap_tpu.feature.matcher import match_pairs_batched

    cameras = database.read_cameras()
    images = {iid: (name, cid) for (iid, name, cid) in database.read_images()}
    kp_cache: Dict[int, np.ndarray] = {}

    def get_kp(iid):
        if iid not in kp_cache:
            kp_cache[iid] = database.read_keypoints(iid)
        return kp_cache[iid]

    lightglue_params = None
    if options.matcher_type == "lightglue":
        from colmap_tpu.feature.lightglue import (
            LightGlueOptions,
            init_params as lg_init,
            load_torch_weights as lg_load,
        )

        lg_opts = options.lightglue_options or LightGlueOptions()
        if options.lightglue_weights_path:
            lightglue_params = lg_load(options.lightglue_weights_path, lg_opts)
        else:
            lightglue_params = lg_init(lg_opts)

    pairs = list(pairs)
    n_verified = 0
    # Per-image normalized keypoints are reused across all blocks.
    normalized_cache: Dict[object, np.ndarray] = {}
    for blk_start in range(0, len(pairs), block_pairs):
        block = pairs[blk_start:blk_start + block_pairs]
        block_ids = sorted({i for p in block for i in p})
        descs = {iid: database.read_descriptors(iid) for iid in block_ids}

        if options.matcher_type == "lightglue":
            from colmap_tpu.feature.lightglue import match_lightglue

            match_lists = []
            for (id1, id2) in block:
                cam1 = cameras[images[id1][1]]
                cam2 = cameras[images[id2][1]]
                match_lists.append(match_lightglue(
                    descs[id1].astype(np.float32), get_kp(id1),
                    descs[id2].astype(np.float32), get_kp(id2),
                    (cam1.height, cam1.width), (cam2.height, cam2.width),
                    lightglue_params, lg_opts,
                ))
        else:
            local = {iid: k for k, iid in enumerate(block_ids)}
            cap = max(
                (len(descs[iid]) for iid in block_ids), default=1
            )
            from colmap_tpu.utils.bucketing import bucket_size

            cap = bucket_size(max(cap, 1), 256)
            pair_idxs = np.asarray(
                [(local[a], local[b]) for (a, b) in block], dtype=np.int64
            )
            match_lists = match_pairs_batched(
                [descs[iid] for iid in block_ids], pair_idxs,
                capacity=cap, options=options.matching,
            )

        items = []
        verify_slots = []
        for k, (id1, id2) in enumerate(block):
            matches = match_lists[k]
            database.write_matches(id1, id2, matches)
            if len(matches) < options.min_num_inliers:
                continue
            cam1 = cameras[images[id1][1]]
            cam2 = cameras[images[id2][1]]
            items.append((
                cam1, get_kp(id1)[:, :2], cam2, get_kp(id2)[:, :2], matches
            ))
            verify_slots.append(k)

        geoms = estimate_two_view_geometries_batched(
            items, options.verification, normalized_cache=normalized_cache
        )

        for slot, g, item in zip(verify_slots, geoms, items):
            id1, id2 = block[slot]
            cam1, kp1, cam2, kp2, matches = item
            if (
                options.guided_matching
                and g.F is not None
                and len(g.inlier_matches) > 0
            ):
                from colmap_tpu.feature.matcher import match_guided

                guided = match_guided(
                    descs[id1], descs[id2], kp1, kp2, g.F, options.matching
                )
                if len(guided) > len(g.inlier_matches):
                    g2 = estimate_two_view_geometry(
                        cam1, kp1, cam2, kp2, guided, options.verification
                    )
                    if len(g2.inlier_matches) > len(g.inlier_matches):
                        g = g2
            if len(g.inlier_matches) >= options.min_num_inliers:
                database.write_two_view_geometry(id1, id2, g)
                n_verified += 1
    database.commit()
    return n_verified


def run_exhaustive_matching(
    database: Database,
    options: MatchingPipelineOptions = MatchingPipelineOptions(),
    pairing: ExhaustivePairingOptions = ExhaustivePairingOptions(),
) -> int:
    """reference behavior: CreateExhaustiveFeatureMatcher
    (controllers/feature_matching.cc:330)."""
    image_ids = [iid for (iid, _, _) in database.read_images()]
    n = 0
    for block in exhaustive_pairs(image_ids, pairing):
        n += _match_and_verify_pairs(database, block, options)
    return n


def run_sequential_matching(
    database: Database,
    options: MatchingPipelineOptions = MatchingPipelineOptions(),
    pairing: SequentialPairingOptions = SequentialPairingOptions(),
) -> int:
    """reference behavior: CreateSequentialFeatureMatcher."""
    rows = database.read_images()
    # Sequence order by name (reference orders sequentially by name).
    rows = sorted(rows, key=lambda r: r[1])
    image_ids = [iid for (iid, _, _) in rows]
    pairs = sequential_pairs(image_ids, pairing)
    return _match_and_verify_pairs(database, pairs, options)


def run_matches_import(
    database: Database,
    pairs: Sequence[Tuple[int, int]],
    options: MatchingPipelineOptions = MatchingPipelineOptions(),
) -> int:
    """reference behavior: matches_importer path (verify given pairs)."""
    return _match_and_verify_pairs(database, pairs, options)
