"""FID computation (reference fid_score.py:1-266).

Same pipeline: per-directory InceptionV3 pool3 activations → (mu, sigma) →
Fréchet distance with scipy ``sqrtm`` on host (not perf-critical; runs
per-eval).  The activation pass is a jitted Flax forward, batched on device.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .inception import InceptionV3FID, load_fid_params

IMAGE_EXTENSIONS = ("bmp", "jpg", "jpeg", "pgm", "png", "ppm", "tif", "tiff", "webp")

_cached = {}


def _get_model(weights_path=None):
    key = weights_path or "default"
    if key not in _cached:
        model, variables = load_fid_params(weights_path)
        fwd = jax.jit(lambda x: model.apply(variables, x))
        _cached[key] = fwd
    return _cached[key]


def _list_images(path):
    files = []
    for root, _, names in os.walk(path):
        for n in sorted(names):
            if n.split(".")[-1].lower() in IMAGE_EXTENSIONS:
                files.append(os.path.join(root, n))
    return sorted(files)


def get_activations(files, batch_size=64, weights_path=None, image_size=None):
    fwd = _get_model(weights_path)
    acts = []
    for i in range(0, len(files), batch_size):
        chunk = files[i:i + batch_size]
        imgs = []
        for f in chunk:
            im = Image.open(f).convert("RGB")
            if image_size is not None:
                im = im.resize(image_size)
            imgs.append(np.asarray(im, np.float32) / 255.0)
        # pad the final partial batch so one compiled shape serves all batches
        n = len(imgs)
        if n < batch_size:
            imgs += [imgs[-1]] * (batch_size - n)
        x = jnp.asarray(np.stack(imgs))
        a = np.asarray(fwd(x))[:n]
        acts.append(a)
    return np.concatenate(acts, axis=0)


def calculate_activation_statistics(files, batch_size=64, weights_path=None,
                                    image_size=None):
    act = get_activations(files, batch_size, weights_path, image_size)
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """Fréchet distance between two Gaussians (reference fid_score.py:141-196)."""
    from scipy import linalg

    import warnings

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    with warnings.catch_warnings():
        # with < dims samples the covariances are rank-deficient and scipy
        # warns "Matrix is singular"; the standard pytorch-fid numerics
        # below (eps-offset retry on non-finite) already handle it, and the
        # math must stay bit-identical for FID comparability (SURVEY §7
        # trap 5) — so silence the warning rather than regularize earlier
        warnings.filterwarnings("ignore", message=".*singular.*")
        covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    tr_covmean = np.trace(covmean)
    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2 * tr_covmean)


def calculate_fid_given_paths(paths, batch_size=64, cuda=None, dims=2048,
                              weights_path=None):
    """Dir-vs-dir FID (reference fid_score.py:238-250 API; ``cuda`` kept for
    signature parity, ignored on TPU)."""
    for p in paths:
        if not os.path.exists(p):
            raise RuntimeError(f"Invalid path: {p}")
    stats = []
    for p in paths:
        files = _list_images(p)
        stats.append(calculate_activation_statistics(files, batch_size,
                                                     weights_path))
    return calculate_frechet_distance(stats[0][0], stats[0][1],
                                      stats[1][0], stats[1][1])
