"""ctypes loader for the native host-side kernels (native/spurfies_io.cpp).

Builds the shared library on first use when a compiler is available; all
call sites fall back to the pure-Python implementations when it is not.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _native_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")


def load_native():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_native_dir(), "libspurfies_io.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _native_dir()], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.spurfies_spacing_subsample.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, u8p
    ]
    lib.spurfies_radius_dedup.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, u8p
    ]
    lib.spurfies_nn_dist.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, f32p,
    ]
    _LIB = lib
    return _LIB


def spacing_subsample(points: np.ndarray, spacing: float):
    """Returns keep indices, or None if the native lib is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    keep = np.zeros(len(pts), dtype=np.uint8)
    lib.spurfies_spacing_subsample(pts, len(pts), spacing, keep)
    return np.nonzero(keep)[0]


def radius_dedup(points: np.ndarray, radius: float):
    lib = load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    keep = np.zeros(len(pts), dtype=np.uint8)
    lib.spurfies_radius_dedup(pts, len(pts), radius, keep)
    return np.nonzero(keep)[0]


def nn_dist(queries: np.ndarray, points: np.ndarray, cell: float,
            max_dist: float):
    lib = load_native()
    if lib is None:
        return None
    q = np.ascontiguousarray(queries, dtype=np.float32)
    p = np.ascontiguousarray(points, dtype=np.float32)
    out = np.zeros(len(q), dtype=np.float32)
    lib.spurfies_nn_dist(q, len(q), p, len(p), cell, max_dist, out)
    return out
