"""ctypes bindings for the native C++ KD-tree kNN (native/knn/kdtree.cpp).

Compiled on first use with g++ into the repo's build directory; callers fall
back to the device brute-force path (`splatpu.neighbors.knn`) when a compiler
is unavailable.  This is the host-side analog of the reference's Open3D
KDTreeFlann dependency (`shared.py:45-61`) — used for CPU-only data prep and
very large clouds where the O(N^2) device path is wasteful.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "knn" / "kdtree.cpp"
_BUILD_DIR = _SRC.parent / "build"
_SO = _BUILD_DIR / "libsplatpu_knn.so"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _BUILD_DIR.mkdir(parents=True, exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-o", str(_SO), str(_SRC), "-lpthread",
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_SO))
            i32p = ctypes.POINTER(ctypes.c_int32)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.splatpu_knn.argtypes = [
                f32p, ctypes.c_int32, ctypes.c_int32, i32p, f32p, ctypes.c_int32
            ]
            lib.splatpu_knn_query.argtypes = [
                f32p, ctypes.c_int32, f32p, ctypes.c_int32, ctypes.c_int32,
                i32p, f32p, ctypes.c_int32,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def knn_native(points: np.ndarray, k: int, num_threads: int = 0):
    """Exact self-kNN (indices, squared distances), both (N, k), ascending —
    the `shared.py:45-61` contract. Raises RuntimeError if the native library
    cannot be built."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native kNN library unavailable (g++ build failed?)")
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    idx = np.empty((n, k), np.int32)
    d2 = np.empty((n, k), np.float32)
    lib.splatpu_knn(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        k,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return idx, d2


def knn_query_native(points: np.ndarray, queries: np.ndarray, k: int, num_threads: int = 0):
    """kNN of external query points against the cloud (no self-exclusion)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native kNN library unavailable (g++ build failed?)")
    pts = np.ascontiguousarray(points, dtype=np.float32)
    q = np.ascontiguousarray(queries, dtype=np.float32)
    m = q.shape[0]
    idx = np.empty((m, k), np.int32)
    d2 = np.empty((m, k), np.float32)
    lib.splatpu_knn_query(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0],
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m,
        k,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return idx, d2
