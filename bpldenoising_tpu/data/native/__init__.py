"""ctypes bindings for the native PNG codec (built on first import).

Compiles ``png_codec.cpp`` with the system g++ against zlib into a cached
shared object (keyed on source mtime); falls back by raising on any failure,
letting :mod:`bpldenoising_tpu.data.png_io` use the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["read_png_gray_native", "write_png_gray_native",
           "read_png_rgb_native", "write_png_rgb_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "png_codec.cpp")
_SO = os.path.join(_DIR, "_png_codec.so")


def _build() -> str:
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    # build to a temp name then atomically replace (parallel-import safe)
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return _SO


_lib = ctypes.CDLL(_build())
_lib.png_read_gray.restype = ctypes.c_int
_lib.png_read_gray.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
    ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.c_int),
]
_lib.png_read_rgb.restype = ctypes.c_int
_lib.png_read_rgb.argtypes = _lib.png_read_gray.argtypes
_lib.png_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
_lib.png_write_gray.restype = ctypes.c_int
_lib.png_write_gray.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_double),
    ctypes.c_int,
    ctypes.c_int,
]
_lib.png_write_rgb.restype = ctypes.c_int
_lib.png_write_rgb.argtypes = _lib.png_write_gray.argtypes


def read_png_gray_native(path: str) -> np.ndarray:
    out = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int()
    cols = ctypes.c_int()
    rc = _lib.png_read_gray(path.encode(), ctypes.byref(out),
                            ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"native PNG decode failed ({rc}): {path}")
    try:
        arr = np.ctypeslib.as_array(
            out, shape=(rows.value, cols.value)).copy()
    finally:
        _lib.png_free(out)
    return arr


def write_png_gray_native(path: str, img: np.ndarray) -> None:
    arr = np.ascontiguousarray(np.asarray(img, dtype=np.float64))
    if arr.ndim != 2:
        raise ValueError("expected a 2-D grayscale image")
    rc = _lib.png_write_gray(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.shape[0], arr.shape[1])
    if rc != 0:
        raise IOError(f"native PNG encode failed ({rc}): {path}")


def read_png_rgb_native(path: str) -> np.ndarray:
    """Decode any supported PNG to a planar (3, rows, cols) [0,1] array
    (grayscale sources replicate the channel)."""
    out = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int()
    cols = ctypes.c_int()
    rc = _lib.png_read_rgb(path.encode(), ctypes.byref(out),
                           ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"native PNG decode failed ({rc}): {path}")
    try:
        arr = np.ctypeslib.as_array(
            out, shape=(3, rows.value, cols.value)).copy()
    finally:
        _lib.png_free(out)
    return arr


def write_png_rgb_native(path: str, img: np.ndarray) -> None:
    """Encode a planar (3, rows, cols) [0,1] array as an 8-bit RGB PNG."""
    arr = np.ascontiguousarray(np.asarray(img, dtype=np.float64))
    if arr.ndim != 3 or arr.shape[0] != 3:
        raise ValueError("expected a planar (3, rows, cols) color image")
    rc = _lib.png_write_rgb(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.shape[1], arr.shape[2])
    if rc != 0:
        raise IOError(f"native PNG encode failed ({rc}): {path}")
