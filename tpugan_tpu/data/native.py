"""ctypes binding for the native host data-loader kernels.

Loads ``native/libtpugan_native.so`` (built by ``make -C native``; an
auto-build is attempted once on first import) and exposes FPS, seed-kNN
patching, radius counting and voxel downsampling. Every entry point has a
pure-numpy fallback in tpugan_tpu.data.sampling — ``available()`` tells the
pipeline which path it is on.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libtpugan_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    # the .so is a build artifact (not tracked in git); make is a no-op
    # when it is already newer than the source
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        if not os.path.exists(_SO_PATH):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.tpugan_fps.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, i64p]
    lib.tpugan_knn_patch.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, i64p]
    lib.tpugan_radius_count.argtypes = [f32p, ctypes.c_int64,
                                        ctypes.c_float, i32p]
    lib.tpugan_voxel_downsample.argtypes = [f32p, ctypes.c_int64,
                                            ctypes.c_float, f32p]
    lib.tpugan_voxel_downsample.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def fps(pts: np.ndarray, k: int, start: int = 0) -> np.ndarray:
    lib = _load()
    assert lib is not None
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.empty(k, np.int64)
    lib.tpugan_fps(pts, pts.shape[0], k, start, out)
    return out


def knn_patch(pts: np.ndarray, seed: int, k: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    pts = np.ascontiguousarray(pts, np.float32)
    k = min(k, pts.shape[0])
    out = np.empty(k, np.int64)
    lib.tpugan_knn_patch(pts, pts.shape[0], seed, k, out)
    return out


def radius_count(pts: np.ndarray, radius: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.empty(pts.shape[0], np.int32)
    lib.tpugan_radius_count(pts, pts.shape[0], radius, out)
    return out


def voxel_downsample(pts: np.ndarray, voxel: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.empty((pts.shape[0], 3), np.float32)
    m = lib.tpugan_voxel_downsample(pts, pts.shape[0], voxel, out)
    return out[:m].copy()
