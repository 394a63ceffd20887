"""Native (C++) host-runtime components, bound via ctypes.

The reference keeps its scene-construction hot path native (kd-tree build,
pcd_scene.cpp:45-184); ours lives in kdtree_builder.cpp, compiled on demand
with g++ into a cached shared library. Everything degrades gracefully to the
numpy implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _lib():
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        src = os.path.join(_HERE, "kdtree_builder.cpp")
        so = os.path.join(_HERE, "_prt_native.so")
        try:
            if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
                with tempfile.TemporaryDirectory() as td:
                    tmp = os.path.join(td, "_prt_native.so")
                    subprocess.run(
                        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                         "-o", tmp, src],
                        check=True,
                        capture_output=True,
                    )
                    os.replace(tmp, so)
            lib = ctypes.CDLL(so)
            lib.prt_build_kdtree.restype = ctypes.c_int
            lib.prt_build_kdtree.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
            _LIB = None
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def build_kdtree_native(points: np.ndarray, leaf_size: int = 10):
    """C++ kd-tree build; same outputs/semantics as the numpy builder.

    Returns (order, parent, child, split_dim, split_v, bbox, bounds, n_nodes)
    or None when the native library is unavailable.
    """
    lib = _lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    cap = max(2 * n, 16)
    parent = np.full(cap, -1, np.int32)
    child = np.full((cap, 2), -1, np.int32)
    split_dim = np.zeros(cap, np.int32)
    split_v = np.zeros(cap, np.float32)
    bbox = np.zeros((cap, 6), np.float32)
    bounds = np.zeros((cap, 2), np.int32)
    order = np.zeros(n, np.int64)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n_nodes = lib.prt_build_kdtree(
        pts.ctypes.data_as(f32p), n, int(leaf_size),
        parent.ctypes.data_as(i32p), child.ctypes.data_as(i32p),
        split_dim.ctypes.data_as(i32p), split_v.ctypes.data_as(f32p),
        bbox.ctypes.data_as(f32p), bounds.ctypes.data_as(i32p),
        order.ctypes.data_as(i64p),
    )
    m = int(n_nodes)
    return (
        order,
        parent[:m].copy(), child[:m].copy(), split_dim[:m].copy(),
        split_v[:m].copy(), bbox[:m].copy(), bounds[:m].copy(), m,
    )
