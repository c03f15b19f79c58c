"""Numerical gradient checks (jax.test_util.check_grads) on the render path.

The soft-silhouette VJP and the phase-2 barycentric autodiff must agree with
finite differences — this is the DIB-R property the whole training signal
rides on (SURVEY.md §7 hard-part 1)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from magicmirror.ops.rasterize import dibr_rasterization, pixel_grid


def _soft_area(fvi_flat):
    fvi = fvi_flat.reshape(1, 2, 3, 2)
    fz = jnp.full((1, 2, 3), -2.0)
    fnz = jnp.ones((1, 2))
    feats = jnp.ones((1, 2, 3, 1))
    _, soft, _ = dibr_rasterization(12, 12, fz, fvi, feats, fnz,
                                    sigmainv=50.0)
    return jnp.sum(soft)


def test_soft_mask_grad_matches_finite_differences():
    fvi = jnp.asarray([[-0.6, -0.5], [0.5, -0.4], [0.1, 0.6],
                       [-0.2, -0.8], [0.8, 0.1], [0.3, 0.9]], jnp.float32)
    check_grads(_soft_area, (fvi.reshape(-1),), order=1, modes=["rev"],
                atol=2e-2, rtol=2e-2, eps=1e-3)


def test_attribute_interp_grad_matches_finite_differences():
    """Interpolated features vs vertex positions, away from coverage
    boundaries (the hard z-test is a step there by design)."""
    feats = jnp.asarray([[0.2], [0.9], [0.5]]).reshape(1, 1, 3, 1)

    def f(fvi_flat):
        fvi = fvi_flat.reshape(1, 1, 3, 2)
        fz = jnp.full((1, 1, 3), -2.0)
        fnz = jnp.ones((1, 1))
        out, _, _ = dibr_rasterization(8, 8, fz, fvi, feats, fnz)
        # weight interior pixels only: a smooth function of the verts
        return jnp.sum(out ** 2)

    fvi = jnp.asarray([[-0.9, -0.9], [0.9, -0.85], [0.05, 0.9]], jnp.float32)
    # boundary pixels make the true function piecewise-smooth; use a custom
    # comparison at a generous tolerance instead of exact FD equality
    g = jax.grad(f)(fvi.reshape(-1))
    eps = 1e-3
    num = np.zeros_like(np.asarray(g))
    x0 = np.asarray(fvi.reshape(-1))
    for i in range(x0.size):
        xp = x0.copy(); xp[i] += eps
        xm = x0.copy(); xm[i] -= eps
        num[i] = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
    # direction agreement on the dominant components
    big = np.abs(num) > 0.3 * np.abs(num).max()
    assert np.sign(np.asarray(g)[big]).tolist() == np.sign(num[big]).tolist()


def test_texture_grad_matches_finite_differences():
    from magicmirror.ops.sampling import texture_mapping

    rs = np.random.RandomState(0)
    uv = jnp.asarray(rs.rand(1, 4, 4, 2).astype(np.float32) * 0.8 + 0.1)
    tex = jnp.asarray(rs.rand(1, 8, 6, 3).astype(np.float32))

    check_grads(lambda t: jnp.sum(texture_mapping(uv, t) ** 2), (tex,),
                order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    check_grads(lambda u: jnp.sum(texture_mapping(u, tex) ** 2), (uv,),
                order=1, modes=["rev"], atol=5e-2, rtol=5e-2, eps=1e-3)


def test_sh_lighting_grads():
    from magicmirror.ops.shading import spherical_harmonic_lighting

    rs = np.random.RandomState(0)
    n = rs.rand(1, 4, 4, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    lights = jnp.asarray(rs.rand(1, 9).astype(np.float32))
    check_grads(lambda l: jnp.sum(
        spherical_harmonic_lighting(jnp.asarray(n), l) ** 2), (lights,),
        order=2, modes=["rev"])
