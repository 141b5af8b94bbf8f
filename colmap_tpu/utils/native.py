"""Native (C++) host kernels with ctypes bindings and NumPy fallbacks.

reference behavior: the reference keeps host-side graph bookkeeping in C++
(math/union_find.h, correspondence_graph.cc). Here the shared library is
compiled on first use from native/graph_ops.cpp with g++; environments
without a toolchain transparently fall back to NumPy/Python implementations.
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


def _source_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native", "graph_ops.cpp",
    )


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _source_path()
    if not os.path.exists(src):
        return None
    cache_dir = os.path.join(tempfile.gettempdir(), "colmap_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libgraph_ops.so")
    try:
        if not os.path.exists(lib_path) or (
            os.path.getmtime(lib_path) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(lib_path)
        lib.union_find_labels.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
        ]
        lib.build_csr.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def union_find_labels(num_nodes: int, edges_a: np.ndarray, edges_b: np.ndarray) -> np.ndarray:
    """Connected-component root label per node. Native when available."""
    edges_a = np.ascontiguousarray(edges_a, dtype=np.int64)
    edges_b = np.ascontiguousarray(edges_b, dtype=np.int64)
    lib = _load()
    if lib is not None:
        out = np.empty(num_nodes, dtype=np.int64)
        lib.union_find_labels(num_nodes, edges_a, edges_b, len(edges_a), out)
        return out
    # NumPy/Python fallback.
    parent = np.arange(num_nodes, dtype=np.int64)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for a, b in zip(edges_a.tolist(), edges_b.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return np.array([find(i) for i in range(num_nodes)], dtype=np.int64)


def build_csr(rows: np.ndarray, num_rows: int) -> Tuple[np.ndarray, np.ndarray]:
    """Counting-sort CSR: returns (offsets (num_rows+1), order (n,))."""
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    lib = _load()
    if lib is not None:
        offsets = np.empty(num_rows + 1, dtype=np.int64)
        order = np.empty(len(rows), dtype=np.int64)
        lib.build_csr(rows, len(rows), num_rows, offsets, order)
        return offsets, order
    order = np.argsort(rows, kind="stable")
    offsets = np.searchsorted(rows[order], np.arange(num_rows + 1))
    return offsets.astype(np.int64), order.astype(np.int64)
