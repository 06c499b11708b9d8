"""ctypes binding for the native Gaussian-splat library.

Compiles native/dmap_splat.cpp on first use (g++ -O3, cached next to the
source) and exposes the same interface as ops/dmap's numpy golden
implementations. Used by dmap_cli --backend native for offline
preprocessing at production scale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "dmap_splat.cpp")
_SO = os.path.join(_REPO, "native", "libdmap_splat.so")

_lock = threading.Lock()
_lib = None


def _build() -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.gaussian_splat_fixed.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.gaussian_splat_adaptive.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def gaussian_density_fixed_native(shape, points, sigma: float = 4.0,
                                  truncate=None, n_threads: int = 0) -> np.ndarray:
    """Native parity of ops.dmap.gaussian_density_fixed_np."""
    lib = load_library()
    h, w = shape
    pts = np.ascontiguousarray(np.asarray(points, np.float32).reshape(-1, 2))
    out = np.empty((h, w), np.float32)
    truncate = 7.0 / sigma if truncate is None else truncate
    n_threads = n_threads or (os.cpu_count() or 4)
    lib.gaussian_splat_fixed(_fptr(pts), len(pts), h, w,
                             ctypes.c_float(sigma), ctypes.c_float(truncate),
                             _fptr(out), n_threads)
    return out


def gaussian_density_adaptive_native(shape, points, n_threads: int = 0) -> np.ndarray:
    """Native parity of ops.dmap.gaussian_density_adaptive_np
    (kNN sigmas computed host-side, same rule as dmap_gen.py:45-48)."""
    from scipy.spatial import KDTree

    lib = load_library()
    h, w = shape
    pts = np.ascontiguousarray(np.asarray(points, np.float32).reshape(-1, 2))
    if len(pts) == 0:
        return np.zeros((h, w), np.float32)
    if len(pts) > 3:
        tree = KDTree(pts.astype(np.float64), leafsize=2048)
        dists, _ = tree.query(pts, k=4)
        sigmas = ((dists[:, 1] + dists[:, 2] + dists[:, 3]) * 0.1).astype(np.float32)
    else:
        sigmas = np.full(len(pts), 15.0, np.float32)
    sigmas = np.ascontiguousarray(sigmas)
    out = np.empty((h, w), np.float32)
    n_threads = n_threads or (os.cpu_count() or 4)
    lib.gaussian_splat_adaptive(_fptr(pts), _fptr(sigmas), len(pts), h, w,
                                _fptr(out), n_threads)
    return out
