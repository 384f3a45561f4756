"""Grayscale PNG IO.

Backend order: the native C++ codec (``bpldenoising_tpu.data.native``, built
against zlib for batch decode throughput) when available, else PIL.
Images are float64 in [0, 1]; 16-bit PNGs are scaled by 1/65535, 8-bit by
1/255 (the reference loads via FileIO/ImageIO into ``Gray{Float64}``,
``src/Datasets.jl:54-65``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_png_gray", "write_png_gray",
           "read_png_color", "write_png_color"]

try:  # native codec is optional; PIL is the fallback oracle
    from .native import (read_png_gray_native, read_png_rgb_native,
                         write_png_gray_native, write_png_rgb_native)
    _HAVE_NATIVE = True
except Exception:  # pragma: no cover
    _HAVE_NATIVE = False


def _read_pil(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        if im.mode in ("I", "I;16", "I;16B"):
            arr = np.asarray(im, dtype=np.float64) / 65535.0
        else:
            arr = np.asarray(im.convert("L"), dtype=np.float64) / 255.0
    return arr


def _write_pil(path: str, img: np.ndarray) -> None:
    from PIL import Image
    arr = np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0)
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8), mode="L").save(path)


def read_png_gray(path: str) -> np.ndarray:
    """Read a PNG as a float64 grayscale array in [0, 1]."""
    if _HAVE_NATIVE:
        try:
            return read_png_gray_native(path)
        except Exception:
            pass
    return _read_pil(path)


def write_png_gray(path: str, img) -> None:
    """Write a [0, 1] float array as an 8-bit grayscale PNG."""
    img = np.asarray(img)
    if _HAVE_NATIVE:
        try:
            write_png_gray_native(path, img)
            return
        except Exception:
            pass
    _write_pil(path, img)


def _read_pil_color(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float64) / 255.0
    return np.moveaxis(arr, -1, 0)          # (H, W, 3) → planar (3, H, W)


def _write_pil_color(path: str, img: np.ndarray) -> None:
    from PIL import Image
    arr = np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0)
    hwc = np.moveaxis(arr, 0, -1)
    Image.fromarray((hwc * 255.0 + 0.5).astype(np.uint8),
                    mode="RGB").save(path)


def read_png_color(path: str) -> np.ndarray:
    """Read a PNG as a PLANAR (3, rows, cols) float64 array in [0, 1]
    (grayscale sources replicate the channel) — the layout the
    vectorial/color model tier consumes."""
    if _HAVE_NATIVE:
        try:
            return read_png_rgb_native(path)
        except Exception:
            pass
    return _read_pil_color(path)


def write_png_color(path: str, img) -> None:
    """Write a planar (3, rows, cols) [0, 1] array as an 8-bit RGB PNG."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[0] != 3:
        raise ValueError(f"expected planar (3, rows, cols), got {img.shape}")
    if _HAVE_NATIVE:
        try:
            write_png_rgb_native(path, img)
            return
        except Exception:
            pass
    _write_pil_color(path, img)
