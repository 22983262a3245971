"""ctypes bindings + build driver for the native image ops library.

``build()`` compiles image_ops.cpp with g++ -O3 into image_ops.so next to
this file (no pybind11 needed); ``available()`` reports whether the
library is loadable. The transforms use these ops when present, falling
back to cv2 otherwise; the two are validated against each other in
tests/test_native_ops.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "image_ops.so")
_SRC = os.path.join(_HERE, "image_ops.cpp")

NEAREST, LINEAR, CUBIC = 0, 1, 2

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the shared library (idempotent)."""
    if os.path.isfile(_SO) and not force and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build():  # no-op when the .so is current
        return None
    lib = ctypes.CDLL(_SO)
    fp = ctypes.POINTER(ctypes.c_float)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.resize_f32.argtypes = [fp, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, fp, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int]
    lib.warp_affine_f32.argtypes = [fp, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, fp, ctypes.c_int,
                                    ctypes.c_int, dp, ctypes.c_int]
    lib.hflip_f32.argtypes = [fp, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, fp]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as3d(img: np.ndarray):
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        return img[:, :, None], True
    return img, False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize(img: np.ndarray, dsize, interp: int = LINEAR) -> np.ndarray:
    """cv2.resize equivalent; dsize is (width, height) like cv2."""
    lib = _load()
    assert lib is not None
    src, squeeze = _as3d(img)
    dw, dh = int(dsize[0]), int(dsize[1])
    h, w, c = src.shape
    dst = np.empty((dh, dw, c), np.float32)
    lib.resize_f32(_ptr(src), h, w, c, _ptr(dst), dh, dw, int(interp))
    return dst[:, :, 0] if squeeze else dst


def warp_affine(img: np.ndarray, m: np.ndarray, dsize,
                interp: int = LINEAR) -> np.ndarray:
    """cv2.warpAffine equivalent (constant 0 border)."""
    lib = _load()
    assert lib is not None
    src, squeeze = _as3d(img)
    dw, dh = int(dsize[0]), int(dsize[1])
    h, w, c = src.shape
    m = np.ascontiguousarray(m, np.float64)
    dst = np.empty((dh, dw, c), np.float32)
    lib.warp_affine_f32(
        _ptr(src), h, w, c, _ptr(dst), dh, dw,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), int(interp))
    return dst[:, :, 0] if squeeze else dst


def hflip(img: np.ndarray) -> np.ndarray:
    """cv2.flip(img, 1) equivalent."""
    lib = _load()
    assert lib is not None
    src, squeeze = _as3d(img)
    h, w, c = src.shape
    dst = np.empty_like(src)
    lib.hflip_f32(_ptr(src), h, w, c, _ptr(dst))
    return dst[:, :, 0] if squeeze else dst
