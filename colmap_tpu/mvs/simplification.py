"""Mesh simplification: quadric edge collapse (native C++) with a
vertex-clustering NumPy fallback.

reference behavior: src/colmap/mvs/mesh_simplification.{h,cc} — CGAL
edge-collapse driven by a stop ratio on the edge count. Here the native
kernel (native/mesh_ops.cpp) implements Garland–Heckbert quadrics directly;
environments without a toolchain fall back to grid vertex clustering.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native", "mesh_ops.cpp",
    )
    if not os.path.exists(src):
        return None
    cache_dir = os.path.join(tempfile.gettempdir(), "colmap_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libmesh_ops.so")
    try:
        if not os.path.exists(lib_path) or (
            os.path.getmtime(lib_path) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(lib_path)
        lib.simplify_mesh.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.POINTER(ctypes.c_int64),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def simplify_mesh(
    vertices: np.ndarray, faces: np.ndarray, factor: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Simplify to ~factor of the original face count (0 < factor <= 1)."""
    vertices = np.ascontiguousarray(vertices, dtype=np.float64)
    faces64 = np.ascontiguousarray(faces, dtype=np.int64)
    target = max(4, int(round(len(faces64) * float(factor))))
    lib = _load()
    if lib is not None:
        out_v = np.empty_like(vertices)
        out_f = np.empty_like(faces64)
        nv = ctypes.c_int64(0)
        nf = ctypes.c_int64(0)
        lib.simplify_mesh(
            vertices, len(vertices), faces64, len(faces64), target,
            out_v, ctypes.byref(nv), out_f, ctypes.byref(nf),
        )
        return (
            out_v[: nv.value].astype(np.float32),
            out_f[: nf.value].astype(np.int32),
        )
    return _cluster_simplify(vertices, faces64, target)


def _cluster_simplify(vertices, faces, target_num_faces):
    """Fallback: uniform-grid vertex clustering sized to hit ~target faces."""
    lo = vertices.min(axis=0)
    hi = vertices.max(axis=0)
    span = max(float((hi - lo).max()), 1e-12)
    # Face count scales ~ quadratically with grid resolution on a surface.
    res = max(2, int(np.sqrt(target_num_faces / 2.0)))
    for _ in range(8):
        cell = np.floor((vertices - lo) / span * res).astype(np.int64)
        key = cell[:, 0] * (res + 1) ** 2 + cell[:, 1] * (res + 1) + cell[:, 2]
        uniq, inv = np.unique(key, return_inverse=True)
        # New vertex = centroid of cluster.
        sums = np.zeros((len(uniq), 3))
        np.add.at(sums, inv, vertices)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
        new_v = sums / cnt[:, None]
        nf = inv[faces]
        keep = (
            (nf[:, 0] != nf[:, 1]) & (nf[:, 1] != nf[:, 2]) & (nf[:, 0] != nf[:, 2])
        )
        nf = nf[keep]
        if len(nf) <= target_num_faces * 1.2 or res <= 2:
            return new_v.astype(np.float32), nf.astype(np.int32)
        res = int(res * 0.8)
    return new_v.astype(np.float32), nf.astype(np.int32)
