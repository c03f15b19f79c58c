"""Evaluation metrics: windowed SSIM and mask IoU.

SSIM matches ``pytorch_msssim.ssim`` defaults (reference trainer.py:38, 785:
11x11 Gaussian window, sigma 1.5, K=(0.01, 0.03), data_range=1, averaged over
channels and batch).  Mask IoU is 1 − the kaolin mask-IoU loss
(reference test.py:453's sign note).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..losses.recon import mask_iou_loss


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    coords = np.arange(size) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(img1, img2, data_range: float = 1.0, window_size: int = 11,
         sigma: float = 1.5, K=(0.01, 0.03)):
    """SSIM over NHWC images; returns the scalar mean (pytorch_msssim
    semantics: valid-window convolution, per-channel then averaged)."""
    win = _gaussian_window(window_size, sigma)
    C = img1.shape[-1]
    kernel = jnp.zeros((window_size, window_size, C, C))
    for c in range(C):
        kernel = kernel.at[:, :, c, c].set(win)

    def filt(x):
        # fp32 convolution: TPU convs default to bf16 multiplies, and the
        # var = E[x^2] - E[x]^2 cancellation then yields NEGATIVE window
        # variances large enough to flip the SSIM denominator sign (observed
        # "SSIM = -11.9" on chip); HIGHEST keeps the filter exact in fp32
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)

    C1 = (K[0] * data_range) ** 2
    C2 = (K[1] * data_range) ** 2
    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # clamp tiny negative residual variances (fp32 cancellation floor)
    sigma1_sq = jnp.maximum(filt(img1 * img1) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(filt(img2 * img2) - mu2_sq, 0.0)
    sigma12 = filt(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


def mask_iou_metric(pred_mask, gt_mask):
    """IoU in [0,1] (= 1 − kaolin mask-iou loss; reference test.py:453)."""
    return 1.0 - mask_iou_loss(pred_mask, gt_mask)


def normal_mse(pred_normals, gt_normals, mask=None):
    """Rendered-vs-GT normal-map MSE (reference test_THU.py:389-390)."""
    err = (pred_normals - gt_normals) ** 2
    if mask is not None:
        err = err * mask[..., None]
        return jnp.sum(err) / (jnp.sum(mask) * pred_normals.shape[-1] + 1e-8)
    return jnp.mean(err)
