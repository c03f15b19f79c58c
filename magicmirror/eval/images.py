"""Image artifact helpers: grids, parallel JPEG/PNG dumps.

Replaces torchvision ``save_image``/``make_grid`` (reference trainer.py:
564-590) and the Pool(4) JPEG writers (reference trainer.py:768-769) with a
numpy grid builder + a thread pool (PIL encodes release the GIL).
"""
from __future__ import annotations

import math
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255.0).round().astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """(B, H, W, C) → grid image (H', W', C) float in [0,1]."""
    b, h, w, c = images.shape
    ncol = min(nrow, b)
    nrows = math.ceil(b / ncol)
    grid = np.full(((h + padding) * nrows + padding,
                    (w + padding) * ncol + padding, c), pad_value,
                   dtype=images.dtype)
    for i in range(b):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_image_grid(images, path: str, nrow: int = 8, normalize: bool = False):
    images = np.asarray(images)
    if normalize:
        lo, hi = images.min(), images.max()
        images = (images - lo) / max(hi - lo, 1e-5)
    grid = make_grid(images, nrow=nrow)
    if grid.shape[-1] == 1:
        grid = np.repeat(grid, 3, axis=-1)
    Image.fromarray(to_uint8(grid)).save(path)


def save_array_image(img, path: str, quality: int = 100):
    """(H, W, C) or (H, W) float [0,1] → file; JPEG quality 100 like the
    reference (trainer.py:50-51) — JPEG quantization is part of the metric."""
    arr = to_uint8(np.asarray(img))
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    im = Image.fromarray(arr)
    if path.lower().endswith((".jpg", ".jpeg")):
        im.save(path, "JPEG", quality=quality)
    else:
        im.save(path)


def save_images_parallel(images_and_paths, workers: int = 4):
    """Write many (array, path) pairs concurrently (reference Pool(4),
    trainer.py:768-769 — threads instead of processes: PIL drops the GIL)."""
    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(lambda ap: save_array_image(ap[0], ap[1]), images_and_paths))
