"""Image/mask reconstruction losses (reference networks.py:364-390).

Layout: images are NHWC float in [0,1]; the 4th channel is the mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_iou_loss(pred_mask, gt_mask, eps: float = 1e-6):
    """Soft mask-IoU *loss* (1 - IoU), kaolin ``metrics.render.mask_iou``
    semantics (reference networks.py:377).  Masks: (B, H, W) in [0,1]."""
    B = pred_mask.shape[0]
    p = pred_mask.reshape(B, -1)
    g = gt_mask.reshape(B, -1)
    inter = jnp.sum(p * g, axis=1)
    union = jnp.sum(p + g - p * g, axis=1)
    return 1.0 - jnp.mean(inter / (union + eps))


def _resize_bilinear(x, h, w):
    """(B, H, W, 1) → (B, h, w, 1), matching torch F.interpolate defaults
    (mode='nearest'? no — the reference uses default mode='nearest')."""
    # reference networks.py:381-382 calls F.interpolate without mode →
    # nearest-neighbor down+up sampling
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="nearest")


def contour_loss(pred_mask, gt_mask):
    """Band-pass contour consistency (reference networks.py:379-386): the
    difference between a mask and its 4x down-up resampled self isolates the
    contour; penalize the MSE between pred and gt contours."""
    B, H, W = gt_mask.shape
    g = gt_mask[..., None]
    p = pred_mask[..., None]
    g_c = jnp.abs(g - _resize_bilinear(_resize_bilinear(g, H // 4, W // 4), H, W))
    p_c = jnp.abs(p - _resize_bilinear(_resize_bilinear(p, H // 4, W // 4), H, W))
    return jnp.mean((p_c - g_c) ** 2)


def recon_data(pred_data, gt_data, image_weight: float = 0.1, no_mask: bool = False,
               contour: float = 0.0):
    """L1 image + mask-IoU (+ contour) reconstruction loss
    (reference networks.py:364-390).  pred/gt: (B, H, W, 4) NHWC RGBA."""
    pred_img = pred_data[..., :3]
    pred_mask = pred_data[..., 3]
    gt_img = gt_data[..., :3]
    gt_mask = gt_data[..., 3]

    gt_m = gt_mask[..., None]
    gt_img = gt_img * gt_m + (1.0 - gt_m)
    pred_img = pred_img * gt_m + (1.0 - gt_m)
    loss_image = jnp.mean(jnp.abs(pred_img - gt_img))
    loss_mask = mask_iou_loss(pred_mask, gt_mask)
    if contour > 0:
        loss_mask = loss_mask + contour * contour_loss(pred_mask, gt_mask)
    return image_weight * loss_image + 1.0 * loss_mask
