"""Dataset base utilities shared by all five loaders.

Host-side PIL preprocessing with the reference's exact augmentation semantics;
outputs NHWC float32 RGBA numpy arrays ready for device transfer (the mask is
channel 3; background pre-composited to white unless bg mode, reference
datasets/bird.py:128-132).
"""
from __future__ import annotations

import os
import random

import numpy as np
from PIL import Image, ImageOps

# optional native fast path (C++); falls back to PIL/numpy transparently
try:
    from .native import fg_ratio as _native_fg_ratio  # noqa: F401
    HAVE_NATIVE = True
except Exception:  # pragma: no cover
    HAVE_NATIVE = False


def load_rgb(path: str) -> Image.Image:
    with open(path, "rb") as f:
        return Image.open(f).convert("RGB")


def load_seg(path: str, threshold: int = 160) -> Image.Image:
    """Binary mask loader (reference datasets/bird.py:24-28: p > 160 → 255)."""
    with open(path, "rb") as f:
        seg = Image.open(f).convert("L")
        return seg.point(lambda p: 255 if p > threshold else 0)


def filter_by_fg_ratio(paths, threshold: str):
    """Keep images whose filename-encoded foreground ratio ``*_0.XX.png`` is
    inside (lo, hi) (reference datasets/bird.py:43-51)."""
    lo, hi = [float(t) for t in threshold.replace(" ", "").split(",")]
    kept = []
    for name in paths:
        ratio = float(name[-8:-4])
        if lo < ratio < hi:
            kept.append(name)
    return kept


def pad_to_square(img: Image.Image, seg: Image.Image):
    """Center-pad both to a square canvas (reference datasets/bird.py:108-114)."""
    W, H = img.size
    side = max(W, H)
    dw, dh = side - W, side - H
    padding = (dw // 2, dh // 2, dw - dw // 2, dh - dh // 2)
    return ImageOps.expand(img, padding), ImageOps.expand(seg, padding)


def cub_style_aug(img: Image.Image, seg: Image.Image):
    """hflip + pad-10 + 95-99% random crop (reference datasets/bird.py:83-99)."""
    if random.uniform(0, 1) < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        seg = seg.transpose(Image.FLIP_LEFT_RIGHT)
    img = ImageOps.expand(img, 10)
    seg = ImageOps.expand(seg, 10)
    W, H = img.size
    w = random.randint(int(0.95 * W), int(0.99 * W))
    h = random.randint(int(0.95 * H), int(0.99 * H))
    left = random.randint(0, W - w)
    upper = random.randint(0, H - h)
    right = random.randint(w - left, W)
    lower = random.randint(h - upper, H)
    return img.crop((left, upper, right, lower)), seg.crop((left, upper, right, lower))


def to_rgba_array(img: Image.Image, seg: Image.Image, bg: bool) -> np.ndarray:
    """→ (H, W, 4) float32; white-composite unless bg mode
    (reference datasets/bird.py:125-132)."""
    rgb = np.asarray(img, np.float32) / 255.0
    mask = (np.asarray(seg, np.float32) / 255.0)
    if mask.ndim == 3:
        mask = mask.max(axis=-1)
    mask = mask[..., None]
    if not bg:
        rgb = rgb * mask + (1.0 - mask)
    return np.concatenate([rgb, mask], axis=-1)


class ImageDataset:
    """Minimal map-style dataset protocol: __len__ + __getitem__ returning
    {'images': (H,W,4) float32, 'path': str, 'label': int, ...}."""

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError
