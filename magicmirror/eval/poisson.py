"""Poisson image editing (Pérez 2003) for seamless composites
(reference poisson_image_editing.py:12-108): sparse Laplacian solve on host
scipy — an offline tool, not a device path."""
from __future__ import annotations

import numpy as np
import scipy.sparse
from scipy.sparse.linalg import spsolve


def _laplacian_matrix(n, m):
    """Banded 2-D Laplacian over an n x m grid (row-major)."""
    mat_D = scipy.sparse.lil_matrix((m, m))
    mat_D.setdiag(-1, -1)
    mat_D.setdiag(4)
    mat_D.setdiag(-1, 1)
    mat_A = scipy.sparse.block_diag([mat_D] * n).tolil()
    mat_A.setdiag(-1, 1 * m)
    mat_A.setdiag(-1, -1 * m)
    return mat_A


def poisson_edit(source, target, mask, offset=(0, 0)):
    """Blend ``source`` into ``target`` where ``mask``>0, matching source
    gradients with target boundary conditions.

    source/target: (H, W, 3) uint8/float; mask: (H, W) {0,255}.
    Returns uint8 (H, W, 3).
    """
    y_max, x_max = target.shape[:2]
    y_min, x_min = 0, 0
    x_range = x_max - x_min
    y_range = y_max - y_min

    # pure-numpy shift of the source by the integer offset
    src = np.zeros_like(target, dtype=np.float64)
    oy, ox = int(offset[1]), int(offset[0])
    sy0, sy1 = max(0, -oy), min(source.shape[0], y_range - oy)
    sx0, sx1 = max(0, -ox), min(source.shape[1], x_range - ox)
    src[sy0 + oy:sy1 + oy, sx0 + ox:sx1 + ox] = source[sy0:sy1, sx0:sx1]

    mask = np.asarray(mask)[y_min:y_max, x_min:x_max].copy()
    mask[mask != 0] = 1

    mat_A = _laplacian_matrix(y_range, x_range)
    laplacian = mat_A.tocsc()

    # outside the mask: identity rows (keep target)
    for y in range(1, y_range - 1):
        for x in range(1, x_range - 1):
            if mask[y, x] == 0:
                k = x + y * x_range
                mat_A[k, k] = 1
                mat_A[k, k + 1] = 0
                mat_A[k, k - 1] = 0
                mat_A[k, k + x_range] = 0
                mat_A[k, k - x_range] = 0
    mat_A = mat_A.tocsc()

    mask_flat = mask.flatten()
    out = np.zeros_like(target, dtype=np.float64)
    for channel in range(target.shape[2]):
        source_flat = src[:, :, channel].flatten()
        target_flat = np.asarray(target, np.float64)[:, :, channel].flatten()
        mat_b = laplacian.dot(source_flat)
        mat_b[mask_flat == 0] = target_flat[mask_flat == 0]
        x = spsolve(mat_A, mat_b)
        out[:, :, channel] = x.reshape(y_range, x_range)
    return np.clip(out, 0, 255).astype(np.uint8)
