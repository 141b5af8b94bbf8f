"""Line segment detection.

reference behavior: src/colmap/image/line.{h,cc} — `DetectLineSegments`
(vendored LSD, src/thirdparty/LSD) and `ClassifyLineSegmentOrientations`
(line.cc:92-112). The detector here is LSD-inspired but built for this
stack: image gradients and level-line angles are computed as one batched
XLA program, and the sequential region-growing of LSD is replaced by
connected components over quantized level-line orientation bins (host
scipy.ndimage, C speed) followed by a PCA line fit per component with the
same density/length acceptance tests.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


class LineSegmentOrientation(enum.IntEnum):
    """reference: image/line.h LineSegmentOrientation."""

    UNDEFINED = 0
    HORIZONTAL = 1
    VERTICAL = -1


@dataclasses.dataclass
class LineSegment:
    """reference: image/line.h LineSegment {start, end}."""

    start: np.ndarray  # (2,) xy
    end: np.ndarray  # (2,) xy

    @property
    def length(self) -> float:
        return float(np.linalg.norm(self.end - self.start))

    def direction(self) -> np.ndarray:
        d = self.end - self.start
        return d / max(np.linalg.norm(d), 1e-12)


@dataclasses.dataclass
class LineDetectionOptions:
    # Gradient magnitude below which pixels are ignored (LSD: rho).
    min_gradient: float = 5.0
    # Number of orientation bins for the level-line quantization. LSD's
    # angle tolerance of 22.5 deg corresponds to 8 bins over 180 deg.
    num_orientation_bins: int = 8
    # Minimum fraction of component pixels within the fitted rectangle
    # width (LSD density test).
    min_density: float = 0.5
    max_width: float = 3.0


@jax.jit
def _gradients(img):
    """Scharr gradients + level-line angle, one fused XLA program."""
    img = img.astype(jnp.float32)
    kx = jnp.asarray(
        np.array([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]]) / 32.0,
        dtype=jnp.float32,
    )
    ky = kx.T
    pad = jnp.pad(img, 1, mode="edge")
    win = jax.lax.conv_general_dilated(
        pad[None, None], jnp.stack([kx, ky])[:, None],
        window_strides=(1, 1), padding="VALID",
    )[0]
    gx, gy = win[0], win[1]
    mag = jnp.sqrt(gx * gx + gy * gy)
    # Level-line angle: perpendicular to the gradient, in [0, pi).
    angle = jnp.arctan2(gy, gx) + jnp.pi / 2.0
    angle = jnp.where(angle >= jnp.pi, angle - jnp.pi, angle)
    angle = jnp.where(angle < 0, angle + jnp.pi, angle)
    return mag, angle


def detect_line_segments(
    image: np.ndarray,
    min_length: float = 3.0,
    options: LineDetectionOptions = LineDetectionOptions(),
) -> List[LineSegment]:
    """Detect line segments in a grayscale image.

    reference behavior: DetectLineSegments (image/line.cc:52) — returns
    segments with length >= min_length.
    """
    from scipy import ndimage

    img = np.asarray(image, dtype=np.float32)
    if img.ndim == 3:
        img = img.mean(axis=2)
    mag, angle = (np.asarray(a) for a in _gradients(jnp.asarray(img)))

    strong = mag >= options.min_gradient
    nbins = options.num_orientation_bins
    bins = np.minimum((angle / np.pi * nbins).astype(np.int32), nbins - 1)

    segments: List[LineSegment] = []
    min_pixels = max(int(min_length), 3)
    shifted = np.minimum(
        (((angle + np.pi / (2 * nbins)) % np.pi) / np.pi * nbins).astype(np.int32),
        nbins - 1,
    )
    # Two half-shifted binnings so lines straddling a bin edge are not split.
    for b in (bins, shifted):
        for k in range(nbins):
            mask = strong & (b == k)
            if not mask.any():
                continue
            labels, n = ndimage.label(mask, structure=np.ones((3, 3)))
            if n == 0:
                continue
            sizes = np.bincount(labels.ravel())
            for comp in np.nonzero(sizes >= min_pixels)[0]:
                if comp == 0:
                    continue
                ys, xs = np.nonzero(labels == comp)
                w = mag[ys, xs]
                cx, cy = np.average(xs, weights=w), np.average(ys, weights=w)
                dx, dy = xs - cx, ys - cy
                cov = np.array(
                    [
                        [np.average(dx * dx, weights=w), np.average(dx * dy, weights=w)],
                        [np.average(dx * dy, weights=w), np.average(dy * dy, weights=w)],
                    ]
                )
                evals, evecs = np.linalg.eigh(cov)
                major = evecs[:, 1]
                # Rectangle tests: elongated and dense (LSD rectangle
                # approximation + density test).
                half_len = 2.0 * np.sqrt(max(evals[1], 0.0))
                half_wid = 2.0 * np.sqrt(max(evals[0], 0.0))
                if 2 * half_len < min_length or half_wid > options.max_width:
                    continue
                t = dx * major[0] + dy * major[1]
                s = -dx * major[1] + dy * major[0]
                inside = np.abs(s) <= max(half_wid, 1.0)
                if inside.mean() < options.min_density:
                    continue
                t0, t1 = t.min(), t.max()
                if t1 - t0 < min_length:
                    continue
                start = np.array([cx + t0 * major[0], cy + t0 * major[1]])
                end = np.array([cx + t1 * major[0], cy + t1 * major[1]])
                segments.append(LineSegment(start=start, end=end))
    # De-duplicate near-identical segments from the two binnings.
    kept: List[LineSegment] = []
    for seg in sorted(segments, key=lambda s: -s.length):
        dup = False
        for other in kept:
            if (
                np.linalg.norm(seg.start - other.start) < 2.0
                and np.linalg.norm(seg.end - other.end) < 2.0
            ) or (
                np.linalg.norm(seg.start - other.end) < 2.0
                and np.linalg.norm(seg.end - other.start) < 2.0
            ):
                dup = True
                break
        if not dup:
            kept.append(seg)
    return kept


def classify_line_segment_orientations(
    segments: List[LineSegment], tolerance: float = 0.25
) -> List[LineSegmentOrientation]:
    """reference behavior: ClassifyLineSegmentOrientations (line.cc:92-112)."""
    if tolerance > 0.5:
        raise ValueError("tolerance must be <= 0.5")
    out = []
    for seg in segments:
        d = seg.direction()
        if abs(d[0]) + tolerance > 1:
            out.append(LineSegmentOrientation.HORIZONTAL)
        elif abs(d[1]) + tolerance > 1:
            out.append(LineSegmentOrientation.VERTICAL)
        else:
            out.append(LineSegmentOrientation.UNDEFINED)
    return out
