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


def test_fused_standard_matches_two_phase(rng):
    """Fused kernel (winner uv/normal selected in-kernel) vs the two-phase
    path: identical outputs + working gradients."""
    from magicmirror.render.renderer import DiffRender
    import os

    tmpl = os.path.join(os.path.dirname(__file__), "..", "template",
                        "sphere.obj")
    dr_fused = DiffRender(tmpl, 32, backend="pallas", soft_mode="line")
    dr_ref = DiffRender(tmpl, 32, backend="xla", soft_mode="line")
    V = dr_fused.num_vertices
    B = 2
    att = {
        "azimuths": jnp.asarray(rng.uniform(-180, 180, B).astype(np.float32)),
        "elevations": jnp.asarray(rng.uniform(0, 30, B).astype(np.float32)),
        "distances": jnp.full((B,), 2.5, jnp.float32),
        "biases": jnp.zeros((B, 2), jnp.float32),
        "vertices": jnp.broadcast_to(dr_fused.vertices_init[None], (B, V, 3)),
        "delta_vertices": jnp.zeros((B, V, 3), jnp.float32),
        "textures": jnp.asarray(rng.rand(B, 64, 32, 3).astype(np.float32)),
        "lights": jnp.asarray(
            np.tile([[3.0, 0, 0, 0, 0, 0, 0, 0, 0]], (B, 1)).astype(np.float32)),
        "bg": None,
    }
    rgba_f, att_f = dr_fused.render(**att)
    rgba_r, att_r = dr_ref.render(**att)
    np.testing.assert_allclose(np.asarray(rgba_f), np.asarray(rgba_r),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(att_f["imnormal"]),
                               np.asarray(att_r["imnormal"]), atol=1e-4)

    # gradient parity on a scalar loss
    def loss(dr, verts):
        a = dict(att)
        a["vertices"] = verts
        rgba, _ = dr.render(**a)
        return jnp.mean(rgba ** 2)

    g_f = jax.grad(lambda v: loss(dr_fused, v))(att["vertices"])
    g_r = jax.grad(lambda v: loss(dr_ref, v))(att["vertices"])
    assert np.isfinite(np.asarray(g_f)).all()
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), atol=5e-4)
