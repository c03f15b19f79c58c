"""ctypes bindings for the native preprocessing library, with transparent
NumPy fallbacks (the framework works without the .so; `build.sh` makes it)."""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpreprocess.so")
_lib = None
if os.path.isfile(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.fg_ratio_u8.restype = ctypes.c_double
    except OSError:  # pragma: no cover
        _lib = None

HAVE_NATIVE = _lib is not None


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 HWC bilinear resize."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if _lib is not None:
        out = np.empty((dh, dw, c), np.uint8)
        _lib.resize_bilinear_u8(_u8ptr(img), h, w, c, _u8ptr(out), dh, dw)
        return out
    from PIL import Image

    return np.asarray(Image.fromarray(img.squeeze()).resize((dw, dh)),
                      np.uint8).reshape(dh, dw, c)


def resize_nearest(mask: np.ndarray, dh: int, dw: int) -> np.ndarray:
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    if _lib is not None:
        out = np.empty((dh, dw), np.uint8)
        _lib.resize_nearest_u8(_u8ptr(mask), h, w, _u8ptr(out), dh, dw)
        return out
    ys = (np.arange(dh) * h / dh).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(dw) * w / dw).astype(np.int64).clip(0, w - 1)
    return mask[ys][:, xs]


def binarize(mask: np.ndarray, threshold: int = 160) -> np.ndarray:
    mask = np.ascontiguousarray(mask, np.uint8)
    if _lib is not None:
        _lib.binarize_u8(_u8ptr(mask), mask.size, threshold)
        return mask
    return np.where(mask > threshold, 255, 0).astype(np.uint8)


def fg_ratio(mask: np.ndarray) -> float:
    mask = np.ascontiguousarray(mask, np.uint8)
    if _lib is not None:
        return float(_lib.fg_ratio_u8(_u8ptr(mask), mask.size))
    return float((mask > 0).mean())


def white_composite(rgba: np.ndarray) -> np.ndarray:
    """float32 HWC4 in-place white composite; returns the array."""
    rgba = np.ascontiguousarray(rgba, np.float32)
    if _lib is not None:
        h, w, _ = rgba.shape
        _lib.white_composite_f32(
            rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w)
        return rgba
    m = rgba[..., 3:4]
    rgba[..., :3] = rgba[..., :3] * m + (1.0 - m)
    return rgba


def fill_holes(mask01: np.ndarray, iters: int = 5) -> np.ndarray:
    mask = np.ascontiguousarray(mask01, np.float64)
    if _lib is not None:
        h, w = mask.shape
        _lib.fill_holes_f64(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), h, w, iters)
        return mask
    from ..prepare import fill_holes as np_fill

    return np_fill(mask, iters)
