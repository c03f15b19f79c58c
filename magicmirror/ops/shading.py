"""Spherical-harmonic lighting (closed-form jnp).

Replaces kaolin ``spherical_harmonic_lighting`` (reference networks.py:306):
a 9-coefficient real SH irradiance evaluated at per-pixel unit normals.
Band order matches the reference's light head (reference
network/model_res.py:392-395 biases coefficient 0 — the constant band — to 3).
"""
from __future__ import annotations

import jax.numpy as jnp

# real SH basis constants
_C0 = 0.282094791773878  # 1 / (2 sqrt(pi))
_C1 = 0.488602511902920  # sqrt(3) / (2 sqrt(pi))
_C2n2 = 1.092548430592079  # sqrt(15) / (2 sqrt(pi))
_C20 = 0.315391565252520  # sqrt(5) / (4 sqrt(pi))
_C22 = 0.546274215296040  # sqrt(15) / (4 sqrt(pi))


def spherical_harmonic_bases(normals):
    """9 SH basis values at unit ``normals`` (..., 3) → (..., 9).

    Order: [1, y, z, x, xy, yz, 3z^2-1, xz, x^2-y^2]."""
    x = normals[..., 0]
    y = normals[..., 1]
    z = normals[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            _C0 * one,
            _C1 * y,
            _C1 * z,
            _C1 * x,
            _C2n2 * x * y,
            _C2n2 * y * z,
            _C20 * (3.0 * z * z - 1.0),
            _C2n2 * x * z,
            _C22 * (x * x - y * y),
        ],
        axis=-1,
    )


def spherical_harmonic_lighting(imnormal, lights):
    """Per-pixel lighting coefficient from SH lights.

    imnormal: (B, H, W, 3) unit normals; lights: (B, 9).
    Returns (B, H, W) scalar irradiance.
    """
    bases = spherical_harmonic_bases(imnormal)  # (B, H, W, 9)
    return jnp.einsum("bhwk,bk->bhw", bases, lights)
