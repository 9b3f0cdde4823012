"""ctypes binding for the native C++ data-pipeline library.

Builds ``libnvsf_native.so`` lazily with g++ on first use (cached next to
this file); falls back gracefully (``available() -> False``) when no
compiler is present — pure-numpy paths in ``nvsf_tpu.lib.convert`` are used
instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nvsf_native.cpp")
_SO = os.path.join(_DIR, "libnvsf_native.so")
_lock = threading.Lock()
_lib = None
_failed = False

_D = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_F = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.lidar_to_pano_with_intensities.argtypes = [
            _D, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, _D, _D]
        lib.pano_to_lidar_with_intensities.argtypes = [
            _D, _D, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, _D]
        lib.pano_to_lidar_with_intensities.restype = ctypes.c_int64
        lib.velodyne_bin_to_rangeview.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, _F]
        lib.velodyne_bin_to_rangeview.restype = ctypes.c_int32
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def lidar_to_pano_with_intensities(pts, H, W, K, K_hoz, max_depth=80.0):
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float64)
    pano = np.zeros((H, W), np.float64)
    inten = np.zeros((H, W), np.float64)
    lib.lidar_to_pano_with_intensities(
        pts, len(pts), H, W, float(K[0]), float(K[1]), float(K_hoz[0]),
        float(K_hoz[1]), float(max_depth), pano, inten)
    return pano, inten


def pano_to_lidar_with_intensities(pano, inten, K, K_hoz):
    lib = _load()
    pano = np.ascontiguousarray(pano, np.float64)
    inten = np.ascontiguousarray(inten, np.float64)
    H, W = pano.shape
    out = np.zeros((H * W, 4), np.float64)
    m = lib.pano_to_lidar_with_intensities(
        pano, inten, H, W, float(K[0]), float(K[1]), float(K_hoz[0]),
        float(K_hoz[1]), out)
    return out[:m]


def velodyne_bin_to_rangeview(path, H, W, K, K_hoz, max_depth=80.0):
    lib = _load()
    out = np.zeros((H, W, 3), np.float32)
    rc = lib.velodyne_bin_to_rangeview(
        str(path).encode(), H, W, float(K[0]), float(K[1]),
        float(K_hoz[0]), float(K_hoz[1]), float(max_depth), out)
    if rc != 0:
        raise IOError(f"velodyne_bin_to_rangeview({path}) failed rc={rc}")
    return out
