"""EXIF metadata extraction via PIL.

reference behavior: sensor/bitmap.cc ExifFocalLength/ExifLatitude/... —
reads FocalLength, FocalLengthIn35mmFilm, Make, Model and GPS tags for
camera initialization and spatial pair generation.
"""

from __future__ import annotations

from typing import Optional


_TAGS = {
    271: "make",            # Make
    272: "model",           # Model
    37386: "focal_length_mm",  # FocalLength
    41989: "focal_length_35mm",  # FocalLengthIn35mmFilm
}

_GPS_IFD = 34853


def _ratio(v) -> Optional[float]:
    try:
        return float(v)
    except Exception:
        try:
            return float(v[0]) / float(v[1])
        except Exception:
            return None


def read_exif(path_or_image) -> dict:
    """Read relevant EXIF fields -> dict (missing keys omitted).

    Keys: make, model, focal_length_mm, focal_length_35mm,
    latitude, longitude, altitude.
    """
    from PIL import Image

    img = path_or_image
    opened = False
    if isinstance(path_or_image, str):
        try:
            img = Image.open(path_or_image)
            opened = True
        except Exception:
            return {}
    out: dict = {}
    try:
        exif = img.getexif()
    except Exception:
        return {}
    if not exif:
        return {}
    for tag, name in _TAGS.items():
        v = exif.get(tag)
        if v is None:
            # FocalLength lives in the Exif sub-IFD in modern files.
            try:
                sub = exif.get_ifd(0x8769)
                v = sub.get(tag)
            except Exception:
                v = None
        if v is None:
            continue
        if name in ("make", "model"):
            out[name] = str(v).strip("\x00 ").strip()
        else:
            r = _ratio(v)
            if r:
                out[name] = r
    # GPS.
    try:
        gps = exif.get_ifd(_GPS_IFD)
    except Exception:
        gps = None
    if gps:
        def dms(values, ref, neg_refs):
            try:
                d = _ratio(values[0]) or 0.0
                m = _ratio(values[1]) or 0.0
                s = _ratio(values[2]) or 0.0
                val = d + m / 60.0 + s / 3600.0
                if ref in neg_refs:
                    val = -val
                return val
            except Exception:
                return None

        lat = gps.get(2)
        if lat is not None:
            v = dms(lat, gps.get(1, "N"), ("S",))
            if v is not None:
                out["latitude"] = v
        lon = gps.get(4)
        if lon is not None:
            v = dms(lon, gps.get(3, "E"), ("W",))
            if v is not None:
                out["longitude"] = v
        alt = gps.get(6)
        if alt is not None:
            a = _ratio(alt)
            if a is not None:
                if gps.get(5, 0) == 1:
                    a = -a
                out["altitude"] = a
    if opened:
        img.close()
    return out
