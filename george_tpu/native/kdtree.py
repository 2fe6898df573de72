# -*- coding: utf-8 -*-
"""ctypes bindings for the in-tree C++ neighbor engine (``kdtree.cpp``).

The shared library is compiled on demand with the system toolchain and
cached next to the source; if no compiler is available the callers in
:mod:`george_tpu.neighbors` fall back to scipy. (The reference gets these
structures from out-of-tree sklearn/scipy trees — SURVEY.md §2.5.)
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = [
    "available",
    "radius_neighbors_csr",
    "knn",
    "nd_sort",
    "morton_sort",
]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kdtree.cpp")
_LIB_PATH = os.path.join(_HERE, "_libkdtree.so")
_lock = threading.Lock()
_lib = None
_tried = False

_i64 = ctypes.c_int64
_pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _compile():
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-march=native", "-shared",
        "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(
        cmd, check=True, capture_output=True, timeout=120
    )


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                _compile()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            return None
        lib.kd_build.restype = ctypes.c_void_p
        lib.kd_build.argtypes = [_pd, _i64, _i64]
        lib.kd_free.argtypes = [ctypes.c_void_p]
        lib.kd_radius_count.argtypes = [
            ctypes.c_void_p, _pd, _i64, ctypes.c_double, _pi,
        ]
        lib.kd_radius_fill.argtypes = [
            ctypes.c_void_p, _pd, _i64, ctypes.c_double, _pi, _pi,
        ]
        lib.kd_knn.argtypes = [ctypes.c_void_p, _pd, _i64, _i64, _pi]
        lib.kd_nd_sort.argtypes = [_pd, _i64, _i64, _pi]
        lib.kd_morton_sort.argtypes = [_pd, _i64, _i64, _i64, _pi]
        _lib = lib
        return _lib


def available():
    return _load() is not None


def radius_neighbors_csr(x, radius):
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    n, d = x.shape
    tree = lib.kd_build(x, n, d)
    try:
        counts = np.empty(n, dtype=np.int64)
        lib.kd_radius_count(tree, x, n, float(radius), counts)
        row_ptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=row_ptr[1:])
        nbr_idx = np.empty(int(row_ptr[-1]), dtype=np.int64)
        lib.kd_radius_fill(tree, x, n, float(radius), row_ptr, nbr_idx)
    finally:
        lib.kd_free(tree)
    return nbr_idx, row_ptr


def knn(x, k):
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    n, d = x.shape
    tree = lib.kd_build(x, n, d)
    try:
        out = np.empty((n, int(k)), dtype=np.int64)
        lib.kd_knn(tree, x, n, int(k), out)
    finally:
        lib.kd_free(tree)
    return out


def nd_sort(x):
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    n, d = x.shape
    perm = np.empty(n, dtype=np.int64)
    lib.kd_nd_sort(x, n, d, perm)
    return perm


def morton_sort(x, bits=21):
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    n, d = x.shape
    perm = np.empty(n, dtype=np.int64)
    lib.kd_morton_sort(x, n, d, int(bits), perm)
    return perm
