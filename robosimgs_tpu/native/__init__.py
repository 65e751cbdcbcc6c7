"""Native (C++) acceleration layer, loaded via ctypes.

Builds on demand with the repo's Makefile (g++ -O3 -fopenmp); every
entry point has a pure-numpy fallback so the package works without a
toolchain. Current components:

  knn_mean_dist — grid-hash 3-NN mean distances for Gaussian scale
                  initialization (native/knn.cpp); the numpy fallback
                  is O(N^2) and only suitable for small N.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libknn.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(
                os.path.join(_NATIVE_DIR, "Makefile")):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.knn_mean_dist.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float)]
            lib.knn_mean_dist.restype = None
            _lib = lib
        except OSError:
            return None
        return _lib


def has_native() -> bool:
    return _load() is not None


def knn_mean_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean distance of each point to its k nearest neighbors (n,)."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lib = _load()
    if lib is None:
        from robosimgs_tpu.core.types import _knn_mean_dist
        return _knn_mean_dist(pts, k=k)
    out = np.empty((n,), np.float32)
    lib.knn_mean_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
