"""Camera sensor-width database for EXIF focal-length estimation.

reference behavior: src/colmap/sensor/specs.{h,cc} + sensor/database.* — a
(make, model) -> sensor width (mm) lookup used by the image reader to turn
an EXIF focal length in mm into pixels. The reference table has thousands
of entries; this one carries the most common sensor formats plus exact
entries for popular bodies, with the same normalized-key lookup and
fallback chain:

  1. FocalLengthIn35mmFilm  -> focal_px = f35 / 36.0 * width
  2. FocalLength (mm) + sensor width from (make, model) lookup
  3. FocalLength (mm) + sensor width inferred from the format keyword in
     the model string (e.g. "1/2.3" compacts)
  4. default_focal_length_factor * max(width, height)
"""

from __future__ import annotations

import re
from typing import Optional

# Common sensor formats (diagonal name -> width in mm).
SENSOR_FORMATS = {
    "1/3.2": 4.54,
    "1/3": 4.80,
    "1/2.7": 5.37,
    "1/2.5": 5.76,
    "1/2.3": 6.17,
    "1/2": 6.40,
    "1/1.8": 7.18,
    "1/1.7": 7.60,
    "1/1.6": 8.08,
    "2/3": 8.80,
    "1": 13.20,
    "4/3": 17.30,
    "apsc": 23.60,
    "aps-c": 23.60,
    "apsh": 27.90,
    "full": 36.00,
}

# (normalized make, normalized model) -> sensor width mm. A compact but
# practically useful subset of the reference table (sensor/specs.cc).
SENSOR_WIDTHS = {
    ("canon", "eos5dmarkii"): 36.0,
    ("canon", "eos5dmarkiii"): 36.0,
    ("canon", "eos5dmarkiv"): 36.0,
    ("canon", "eos6d"): 35.8,
    ("canon", "eos7d"): 22.3,
    ("canon", "eos70d"): 22.5,
    ("canon", "eos80d"): 22.3,
    ("canon", "eos550d"): 22.3,
    ("canon", "eos600d"): 22.3,
    ("canon", "eos650d"): 22.3,
    ("canon", "eos700d"): 22.3,
    ("canon", "eosrebelt2i"): 22.3,
    ("canon", "eosrebelt3i"): 22.3,
    ("canon", "powershotg9"): 7.60,
    ("canon", "powershots110"): 7.60,
    ("nikon", "d90"): 23.6,
    ("nikon", "d3100"): 23.1,
    ("nikon", "d3200"): 23.2,
    ("nikon", "d5100"): 23.6,
    ("nikon", "d5300"): 23.5,
    ("nikon", "d7000"): 23.6,
    ("nikon", "d7100"): 23.5,
    ("nikon", "d600"): 35.9,
    ("nikon", "d610"): 35.9,
    ("nikon", "d750"): 35.9,
    ("nikon", "d800"): 35.9,
    ("nikon", "d810"): 35.9,
    ("nikon", "d850"): 35.9,
    ("sony", "ilce-6000"): 23.5,
    ("sony", "ilce-6300"): 23.5,
    ("sony", "ilce-6400"): 23.5,
    ("sony", "ilce-7"): 35.8,
    ("sony", "ilce-7m2"): 35.8,
    ("sony", "ilce-7m3"): 35.6,
    ("sony", "ilce-7rm2"): 35.9,
    ("sony", "ilce-7rm3"): 35.9,
    ("sony", "dsc-rx100"): 13.2,
    ("sony", "dsc-rx100m3"): 13.2,
    ("fujifilm", "x-t1"): 23.6,
    ("fujifilm", "x-t2"): 23.6,
    ("fujifilm", "x-t3"): 23.5,
    ("fujifilm", "x-t30"): 23.5,
    ("fujifilm", "x100s"): 23.6,
    ("olympus", "e-m10"): 17.3,
    ("olympus", "e-m5markii"): 17.3,
    ("panasonic", "dmc-gh4"): 17.3,
    ("panasonic", "dmc-lx100"): 17.3,
    ("apple", "iphone6"): 4.80,
    ("apple", "iphone6s"): 4.80,
    ("apple", "iphone7"): 4.80,
    ("apple", "iphone8"): 4.80,
    ("apple", "iphonex"): 5.66,
    ("apple", "iphone11"): 5.66,
    ("apple", "iphone12"): 5.78,
    ("apple", "iphone13"): 7.01,
    ("apple", "iphone14"): 7.57,
    ("apple", "iphone15"): 9.80,
    ("google", "pixel3"): 5.50,
    ("google", "pixel4"): 5.50,
    ("google", "pixel6"): 6.40,
    ("google", "pixel7"): 6.40,
    ("samsung", "sm-g950f"): 6.40,
    ("samsung", "sm-g973f"): 6.40,
    ("dji", "fc300x"): 6.17,
    ("dji", "fc330"): 6.17,
    ("dji", "fc550"): 17.3,
    ("dji", "fc6310"): 13.2,
    ("gopro", "hero4black"): 6.17,
    ("gopro", "hero5black"): 6.17,
    ("gopro", "hero7black"): 6.17,
}


def _normalize(s: str) -> str:
    return re.sub(r"[^a-z0-9/.\-]", "", s.lower())


def sensor_width_mm(make: str, model: str) -> Optional[float]:
    """Look up sensor width for (make, model); None if unknown."""
    nm_full = _normalize(make or "")
    nd = _normalize(model or "")
    # Makers append suffixes ("NIKON CORPORATION"); also try the first word.
    first = _normalize((make or "").split()[0]) if (make or "").split() else ""
    makes = [m for m in {nm_full, first} if m]
    models = {nd}
    for m in makes:
        if nd.startswith(m):
            models.add(nd[len(m):])
    for m in makes:
        for d in models:
            if (m, d) in SENSOR_WIDTHS:
                return SENSOR_WIDTHS[(m, d)]
    # Format keyword inside the model string (compacts often embed it).
    for fmt, width in SENSOR_FORMATS.items():
        if fmt in nd:
            return width
    return None


def focal_length_px_from_exif(
    exif: dict, width: int, height: int,
    default_focal_length_factor: float = 1.2,
):
    """EXIF -> (focal_px, has_prior) using the reference's fallback chain.

    exif keys (as parsed by utils.exif.read_exif): focal_length_mm,
    focal_length_35mm, make, model.
    """
    f35 = exif.get("focal_length_35mm")
    if f35 and f35 > 0:
        return f35 / 36.0 * max(width, height), True
    fmm = exif.get("focal_length_mm")
    if fmm and fmm > 0:
        sw = sensor_width_mm(exif.get("make", ""), exif.get("model", ""))
        if sw:
            return fmm / sw * max(width, height), True
    return default_focal_length_factor * max(width, height), False
