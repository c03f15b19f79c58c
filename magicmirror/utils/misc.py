"""Misc utilities (reference smr_utils.py:159-255): timers, meters, image
helpers — jnp/numpy instead of torch."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

SMOOTH = 1e-6


class Timer:
    """Wall-clock context timer (reference smr_utils.py:229-238)."""

    def __init__(self, msg: str):
        self.msg = msg
        self.start_time = None

    def __enter__(self):
        self.start_time = time.time()

    def __exit__(self, exc_type, exc_value, exc_tb):
        print(self.msg % (time.time() - self.start_time))


class AverageMeter:
    """Running average (reference smr_utils.py:240-255)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def iou_thresholded(outputs, labels):
    """Thresholded IoU score in {0, 0.1, ..., 1} (reference
    smr_utils.py:172-186)."""
    outputs = jnp.squeeze(outputs)
    labels = jnp.squeeze(labels)
    if outputs.ndim == 2:
        outputs = outputs[None]
        labels = labels[None]
    inter = jnp.sum(jnp.logical_and(outputs, labels), axis=(1, 2))
    union = jnp.sum(jnp.logical_or(outputs, labels), axis=(1, 2))
    iou = (inter + SMOOTH) / (union + SMOOTH)
    return jnp.ceil(jnp.clip(20 * (iou - 0.5), 0, 10)) / 10


def mask_white(gt_data):
    """White-composite the rgb of an NHWC RGBA batch (reference
    smr_utils.py:198-202)."""
    img = gt_data[..., :3]
    m = gt_data[..., 3:4]
    return img * m + (1.0 - m)


def fliplr(img):
    """Horizontal flip, NHWC (reference smr_utils.py:204-208)."""
    return img[:, :, ::-1, :]


def channel_shuffle(rng, img):
    """Random RGB channel permutation keeping the mask channel
    (reference smr_utils.py:210-226)."""
    perms = jnp.asarray([[0, 2, 1, 3], [1, 0, 2, 3], [1, 2, 0, 3],
                         [2, 0, 1, 3], [2, 1, 0, 3]])
    k = jax.random.randint(rng, (), 0, 5)
    return img[..., perms[k]]
