"""Pallas phase-1 kernel vs the XLA scan implementation (interpret mode on
CPU; the same kernel compiles for real on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicmirror.ops.rasterize import _rasterize_phase1, dibr_rasterization, pixel_grid
from magicmirror.ops.pallas.rasterize_tpu import rasterize_phase1_pallas


@pytest.mark.parametrize("F", [7, 60])
def test_pallas_matches_xla(F, rng):
    H = W = 16
    px, py = pixel_grid(H, W)
    fvi = jnp.asarray(rng.uniform(-1, 1, (F, 3, 2)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(-4, -2, (F, 3)).astype(np.float32))
    fnz = jnp.asarray(rng.uniform(-1, 1, F).astype(np.float32))

    idx_ref, sum_ref = _rasterize_phase1(px, py, fvi, fz, fnz, 7000.0, 64)
    idx_pl, sum_pl = rasterize_phase1_pallas(px, py, fvi, fz, fnz, 7000.0,
                                             tile_pixels=128, chunk=64,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_pl), np.asarray(idx_ref))
    # culled far-away faces contribute < 1e-14 to sumlog — tolerances loose
    np.testing.assert_allclose(np.asarray(sum_pl), np.asarray(sum_ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_backend_end_to_end(rng):
    """Full dibr_rasterization with backend='pallas' (interpret) vs 'xla'."""
    H = W = 16
    F = 24
    fvi = jnp.asarray(rng.uniform(-1, 1, (2, F, 3, 2)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(-4, -2, (2, F, 3)).astype(np.float32))
    fnz = jnp.asarray(rng.uniform(-1, 1, (2, F)).astype(np.float32))
    feats = jnp.asarray(rng.rand(2, F, 3, 2).astype(np.float32))

    o1, s1, i1 = dibr_rasterization(H, W, fz, fvi, feats, fnz, backend="xla")
    o2, s2, i2 = dibr_rasterization(H, W, fz, fvi, feats, fnz, backend="pallas")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)


def test_pallas_soft_gradient(rng):
    """The custom VJP must route soft-mask gradients to face vertices."""
    def loss(fvi):
        fz = jnp.full((1, 3), -2.0)
        fnz = jnp.ones((1,))
        px, py = pixel_grid(16, 16)
        _, sumlog = rasterize_phase1_pallas(px, py, fvi, fz, fnz, 70.0,
                                            tile_pixels=128, chunk=64,
                                            interpret=True)
        return jnp.sum(1.0 - jnp.exp(sumlog))

    fvi = jnp.asarray([[[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]]], jnp.float32)
    g = jax.grad(loss)(fvi)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    # apex up grows coverage
    assert np.asarray(g)[0, 2, 1] > 0


@pytest.mark.parametrize("band_rows", [4, 8])
def test_banded_matches_xla(band_rows, rng):
    H = W = 32
    F = 40
    px, py = pixel_grid(H, W)
    fvi = jnp.asarray(rng.uniform(-1, 1, (F, 3, 2)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(-4, -2, (F, 3)).astype(np.float32))
    fnz = jnp.asarray(rng.uniform(-1, 1, F).astype(np.float32))
    idx_ref, sum_ref = _rasterize_phase1(px, py, fvi, fz, fnz, 7000.0, 64)
    idx_b, sum_b = rasterize_phase1_pallas(px, py, fvi, fz, fnz, 7000.0,
                                           chunk=64, interpret=True,
                                           width=W, band_rows=band_rows)
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(sum_b), np.asarray(sum_ref),
                               atol=5e-4, rtol=1e-4)


def test_line_soft_mode_close_to_exact(rng):
    """'line' soft distance differs from 'exact' only in corner Voronoi
    regions — the aggregated silhouette must stay close at real sigmainv."""
    H = W = 32
    F = 30
    px, py = pixel_grid(H, W)
    fvi = jnp.asarray(rng.uniform(-1, 1, (F, 3, 2)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(-4, -2, (F, 3)).astype(np.float32))
    fnz = jnp.asarray(rng.uniform(-1, 1, F).astype(np.float32))
    idx_e, sum_e = _rasterize_phase1(px, py, fvi, fz, fnz, 7000.0, 64,
                                     soft_mode="exact")
    idx_l, sum_l = _rasterize_phase1(px, py, fvi, fz, fnz, 7000.0, 64,
                                     soft_mode="line")
    np.testing.assert_array_equal(np.asarray(idx_e), np.asarray(idx_l))
    soft_e = 1 - np.exp(np.asarray(sum_e))
    soft_l = 1 - np.exp(np.asarray(sum_l))
    # line-mode silhouette is a superset (underestimates distance): soft_l >= soft_e
    assert (soft_l >= soft_e - 1e-4).all()
    assert np.abs(soft_l - soft_e).mean() < 0.02


@pytest.mark.parametrize("soft_mode", ["exact", "line"])
def test_banded_kernel_soft_modes(soft_mode, rng):
    H = W = 32
    F = 40
    px, py = pixel_grid(H, W)
    fvi = jnp.asarray(rng.uniform(-1, 1, (F, 3, 2)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(-4, -2, (F, 3)).astype(np.float32))
    fnz = jnp.asarray(rng.uniform(-1, 1, F).astype(np.float32))
    idx_ref, sum_ref = _rasterize_phase1(px, py, fvi, fz, fnz, 7000.0, 64,
                                         soft_mode=soft_mode)
    idx_b, sum_b = rasterize_phase1_pallas(px, py, fvi, fz, fnz, 7000.0,
                                           chunk=64, interpret=True, width=W,
                                           band_rows=8, soft_mode=soft_mode)
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(sum_b), np.asarray(sum_ref),
                               atol=5e-4, rtol=1e-4)
