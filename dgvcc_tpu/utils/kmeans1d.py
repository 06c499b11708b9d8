"""Exact (globally optimal) 1-D k-means.

Drop-in for the ``kmeans1d`` package the reference uses for ISW
sensitive-covariance selection (models/ISW/cov_settings.py:4,58):
``cluster(values, k) → (labels, centroids)`` with clusters ordered by
ascending centroid (label 0 = lowest cluster). Unlike Lloyd iteration,
the result is the global optimum, so mask selection is provably
identical to the reference's.

Two backends with identical results:
  * native/kmeans1d.cpp (g++ -O3, compiled on first use) — O(kn log n),
    handles production sizes (dim² up to 512² entries, k=50) in ~1 s;
  * a numpy divide-and-conquer fallback for hosts without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "kmeans1d.cpp")
_SO = os.path.join(_REPO, "native", "libkmeans1d.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        def _bind(path):
            lib = ctypes.CDLL(path)
            lib.kmeans1d_cluster.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
            ]
            return lib

        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                     "-o", _SO],
                    check=True, capture_output=True)
            _lib = _bind(_SO)
        except Exception:
            # recompile failed (e.g. no g++, or checkout mtimes made the
            # prebuilt .so look stale) — still try the existing binary
            # before falling back to the numpy DP
            try:
                if os.path.exists(_SO):
                    _lib = _bind(_SO)
                else:
                    _lib_failed = True
            except Exception:
                _lib_failed = True
        return _lib


def _sse_prefix(v: np.ndarray):
    s = np.concatenate([[0.0], np.cumsum(v)])
    s2 = np.concatenate([[0.0], np.cumsum(v * v)])
    return s, s2


def _cluster_python(v: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Same DP + divide-and-conquer as the C++ backend, vectorized over
    the candidate-split range per node."""
    n = len(v)
    s, s2 = _sse_prefix(v)

    def sse(j, i):  # j may be an array; i is a scalar
        cnt = i - j + 1
        su = s[i + 1] - s[j]
        return np.maximum(s2[i + 1] - s2[j] - su * su / cnt, 0.0)

    idx = np.arange(n)
    prev = sse(np.zeros(n, np.int64), idx)  # layer 0: one cluster
    args = np.zeros((k, n), np.int64)
    for m in range(1, k):
        head = np.full(n + 1, np.inf)
        head[1:] = prev  # head[j] = cost of first j points with m clusters
        cur = np.full(n, np.inf)
        stack = [(m, n - 1, m, n - 1)]
        while stack:
            lo, hi, optlo, opthi = stack.pop()
            if lo > hi:
                continue
            mid = (lo + hi) // 2
            js = np.arange(optlo, min(mid, opthi) + 1)
            costs = head[js] + sse(js, mid)
            t = int(np.argmin(costs))
            bestj = optlo + t
            cur[mid] = costs[t]
            args[m, mid] = bestj
            stack.append((lo, mid - 1, optlo, bestj))
            stack.append((mid + 1, hi, bestj, opthi))
        prev = cur

    labels = np.zeros(n, np.int32)
    centroids = np.zeros(k, np.float64)
    i = n - 1
    for m in range(k - 1, -1, -1):
        j = 0 if m == 0 else int(args[m, i])
        centroids[m] = (s[i + 1] - s[j]) / (i - j + 1)
        labels[j:i + 1] = m
        i = j - 1
    return labels, centroids


def cluster(values, k: int) -> Tuple[List[int], List[float]]:
    """kmeans1d.cluster-compatible: returns (labels list in input order,
    centroids list ascending). k is capped at the number of points."""
    v = np.asarray(values, np.float64).ravel()
    n = len(v)
    if n == 0:
        return [], []
    k = max(1, min(int(k), n))
    order = np.argsort(v, kind="stable")
    v_sorted = np.ascontiguousarray(v[order])

    lib = _load_library()
    if lib is not None:
        labels_sorted = np.zeros(n, np.int32)
        centroids = np.zeros(k, np.float64)
        lib.kmeans1d_cluster(
            v_sorted.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(n), ctypes.c_int64(k),
            labels_sorted.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            centroids.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    else:
        labels_sorted, centroids = _cluster_python(v_sorted, k)

    labels = np.empty(n, np.int32)
    labels[order] = labels_sorted
    return labels.tolist(), centroids.tolist()
