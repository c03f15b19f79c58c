"""Mesh regularizers (reference networks.py:392-493).

All functions are pure jnp over attribute arrays + static topology constants
(supplied by ``DiffRender``): the Laplacian rides the MXU as a dense matmul at
V = 642..6890.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def laplacian_flat_loss(delta_vertices, face_normals, laplacian, edge2faces,
                        lambda_lpl: float = 0.1, lambda_flat: float = 0.001):
    """Laplacian smoothness + dihedral flatness (reference networks.py:412-451)."""
    nb_vertices = delta_vertices.shape[1]
    lap = jnp.einsum("vw,bwc->bvc", laplacian, delta_vertices)
    loss_laplacian = jnp.mean(lap ** 2) * nb_vertices * 3

    n1 = face_normals[:, edge2faces[:, 0]]
    n2 = face_normals[:, edge2faces[:, 1]]
    faces_cos = jnp.sum(n1 * n2, axis=2)
    loss_flat = jnp.mean((faces_cos - 1.0) ** 2) * edge2faces.shape[0]
    return lambda_lpl * loss_laplacian + lambda_flat * loss_flat


def _safe_norm(x, axis, eps=1e-12):
    """norm with a defined (zero-free) gradient at 0 — jnp.linalg.norm's
    gradient is NaN at exactly 0, which poisons early training when deltas
    start near zero (torch defines the subgradient 0 there)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def edge_loss(vertices, edges, edge_weight: float = 0.1):
    """Edge-length uniformity (reference networks.py:453-461)."""
    e = vertices[:, edges[:, 0]] - vertices[:, edges[:, 1]]
    edge_length = _safe_norm(e, 2)
    mean_length = jnp.mean(edge_length, axis=1, keepdims=True)
    bias_length = edge_length - mean_length
    return edge_weight * jnp.mean(_safe_norm(bias_length, 1))


def depth_loss(vertices):
    """z^2 regularizer (reference networks.py:463-466)."""
    return jnp.mean(vertices[:, :, 2] ** 2)


def depth_loss_R(vertices, sign_init, ratio: float = 1.0, temp: float = 2.0,
                 eps: float = 0.001):
    """z^2 * exp(temp*(x^2+(y/ratio)^2)) with sign keeping
    (reference networks.py:468-475)."""
    x = jax.lax.stop_gradient(vertices[:, :, 0])
    y = jax.lax.stop_gradient(vertices[:, :, 1])
    z = vertices[:, :, 2]
    r = jnp.exp(temp * (x ** 2 + (y / ratio) ** 2))
    pos = (sign_init >= 0).astype(z.dtype)
    neg = (sign_init < 0).astype(z.dtype)
    loss = pos * (z - eps) ** 2 * r + neg * (z + eps) ** 2 * r
    return jnp.mean(loss)


def depth_loss_C(vertices, sign_init, ratio: float = 1.0, eps: float = 0.001):
    """z^2 * (x^2+(y/ratio)^2) circle variant (reference networks.py:477-485)."""
    x = jax.lax.stop_gradient(vertices[:, :, 0])
    y = jax.lax.stop_gradient(vertices[:, :, 1])
    z = vertices[:, :, 2]
    r = x ** 2 + (y / ratio) ** 2
    pos = (sign_init >= 0).astype(z.dtype)
    neg = (sign_init < 0).astype(z.dtype)
    return jnp.mean(pos * (z - eps) ** 2 * r + neg * (z + eps) ** 2 * r)


def deform_loss(delta_vertices):
    """Mean per-vertex offset norm (reference networks.py:487-493)."""
    norm = _safe_norm(delta_vertices, 2)
    return jnp.mean(norm)


def flip_loss(delta_vertices, flip_index, sign_init, L1: bool = False):
    """z-mirror symmetry on delta vertices with swapped-pair masking
    (reference networks.py:392-410)."""
    Na = delta_vertices
    Nf = Na[:, flip_index]
    Nf = Nf * jnp.array([1.0, 1.0, -1.0], dtype=Na.dtype)
    if L1:
        loss_norm = jnp.abs(Na - Nf)  # (B, V, 3)
        mask_dims = 3
    else:
        loss_norm = _safe_norm(Na - Nf, 2)  # (B, V)
        mask_dims = 2
    # swapped points: same sign as the template → mask 1
    mask_a = jax.nn.relu(jnp.sign(Na[:, :, 2]) * sign_init)
    mask_f = mask_a[:, flip_index]
    mask_f = jax.lax.stop_gradient(mask_f)
    if mask_dims == 3:
        loss_norm = loss_norm * mask_f[..., None]
    else:
        loss_norm = loss_norm * mask_f
    return jnp.mean(loss_norm)
