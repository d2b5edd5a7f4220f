"""ctypes binding for the native click distance transform.

The device path is ops/distmaps.py (pure XLA, used inside jitted f-BRS
prediction). This host path serves CPU-side callers — the simulated
clicker, the NoC harness, data tooling — mirroring the reference's
native split (Cython BFS on CPU, closed-form on GPU; SURVEY.md §2.9).

The shared library builds on demand with `make -C native` (plain g++,
no pybind11) and the wrapper degrades to a numpy fallback if no
compiler is available.
"""
from __future__ import annotations

import ctypes
import math
import subprocess
import threading
from os import path
from typing import Optional

import numpy as np

_NATIVE_DIR = path.join(path.dirname(path.dirname(path.dirname(
    path.abspath(__file__)))), "native")
_LIB_PATH = path.join(_NATIVE_DIR, "libmivos_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mivos_get_dist_maps.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float)]
            lib.mivos_get_dist_maps.restype = None
            assert lib.mivos_native_abi_version() == 1
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fallback(points: np.ndarray, height: int, width: int,
              norm: float) -> np.ndarray:
    out = np.full((2, height, width), 1e6, np.float32)
    n = points.shape[0]
    ys = np.arange(height, dtype=np.float32)
    xs = np.arange(width, dtype=np.float32)
    for i in range(n):
        # Integer pixel origins, half-away-from-zero like the native
        # paths' std::lround (Python round() is half-to-even and would
        # put half-pixel clicks one pixel off the C++ result).
        py = math.floor(float(points[i, 0]) + 0.5)
        px = math.floor(float(points[i, 1]) + 0.5)
        if py < 0 or px < 0:
            continue
        layer = 1 if i >= n // 2 else 0
        d = (((ys - py) / norm) ** 2)[:, None] + \
            (((xs - px) / norm) ** 2)[None, :]
        np.minimum(out[layer], d, out=out[layer])
    return out


def get_dist_maps(points: np.ndarray, height: int, width: int,
                  norm_delimiter: float) -> np.ndarray:
    """points: (N, 2) float32 (y, x); first N/2 positive clicks, rest
    negative; coords < 0 = padding. Returns (2, H, W) float32 normalized
    squared distances (1e6 where unreachable) — the reference
    get_dist_maps contract (fbrs/utils/cython/_get_dist_maps.pyx:17)."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is None:
        return _fallback(points, height, width, norm_delimiter)
    out = np.empty((2, height, width), np.float32)
    lib.mivos_get_dist_maps(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        points.shape[0], height, width, ctypes.c_float(norm_delimiter),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
