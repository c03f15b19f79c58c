"""Ragged cell-windowed texture kernel vs the dense masked path.

The kernel computes ``texture_mapping(uv) * mask`` (the only form the
renderer consumes, reference networks.py:307-313) by per-cell candidate-set
reduction; the dense tent-matmul (ops/sampling.py) is the oracle.  Interpret
mode on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magicmirror.ops.pallas import texture_cells as tc
from magicmirror.ops.pallas.texture_cells import (
    _masked_dense, cell_shape, default_chunk_capacity, supported,
    texture_render)

B, H, W = 2, 64, 64
HT, WT = 128, 64


@pytest.fixture(scope="module")
def scene():
    rs = np.random.RandomState(0)
    uv = jnp.asarray(rs.rand(B, H, W, 2), jnp.float32)
    tex = jnp.asarray(rs.rand(B, HT, WT, 3), jnp.float32)
    mask = jnp.asarray((rs.rand(B, H, W) > 0.4).astype(np.float32))
    return uv, tex, mask


def test_supported_gating():
    assert supported(H, W, HT, WT, 3)
    assert not supported(H, W, HT, WT, 4)     # C != 3
    assert not supported(H, W, 48, WT, 3)     # Ht % 32
    assert not supported(H, W, 32 * 40, WT, 3)  # NBLK > 31
    assert supported(256, 256, 512, 256, 3)   # the bench shape
    assert supported(128, 256, 512, 256, 3)   # THuman ratio-2 shape


def test_forward_matches_dense_masked(scene):
    uv, tex, mask = scene
    out, dropped = texture_render(uv, tex, mask, interpret=True)
    ref = _masked_dense(uv, tex, mask)
    assert np.all(np.asarray(dropped) == 0)
    # kernel holds the texture in bf16 (like the dense path's tent matmul);
    # only summation order differs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=8e-3)
    # background must be EXACTLY zero
    np.testing.assert_array_equal(
        np.asarray(out) * (1.0 - np.asarray(mask))[..., None], 0.0)


def test_forward_out_of_range_uv(scene):
    _, tex, mask = scene
    rs = np.random.RandomState(1)
    uv = jnp.asarray(rs.uniform(-0.3, 1.3, (B, H, W, 2)), jnp.float32)
    out, dropped = texture_render(uv, tex, mask, interpret=True)
    ref = _masked_dense(uv, tex, mask)
    assert np.all(np.asarray(dropped) == 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=8e-3)


def test_gradients_route_through_dense_math(scene, monkeypatch):
    uv, tex, mask = scene
    # MAGICMIRROR_TEX_BWD=dense: the legacy dense-VJP route.  Linear loss ->
    # cotangent independent of the (bf16-rounded) primal, so the custom-vjp
    # grads must match the dense path's EXACTLY
    monkeypatch.setenv("MAGICMIRROR_TEX_BWD", "dense")

    def loss_k(u, t):
        o, _ = texture_render(u, t, mask, interpret=True)
        return jnp.sum(o * 3.0)

    def loss_d(u, t):
        return jnp.sum(_masked_dense(u, t, mask) * 3.0)

    gk = jax.grad(loss_k, argnums=(0, 1))(uv, tex)
    gd = jax.grad(loss_d, argnums=(0, 1))(uv, tex)
    for a, b in zip(gk, gd):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _knot_safe_uv(rs, b, h, w, Ht, Wt):
    """uv whose texel coordinates land mid-cell (frac 0.5): the tent
    gradient is DISCONTINUOUS at integer texel coords, and two separately
    -jitted graphs can round a knot-adjacent coordinate to opposite sides
    (FMA/fusion 1-ulp differences — CLAUDE.md: bitwise only within ONE
    jit), flipping a whole tap's gradient.  Mid-cell coordinates keep both
    formulations on the same side of every knot."""
    xi = rs.randint(0, Wt - 1, (b, h, w)).astype(np.float32) + 0.5
    yi = rs.randint(0, Ht - 1, (b, h, w)).astype(np.float32) + 0.5
    # invert _uv_to_texels: x = u*Wt - 0.5, y = (1-v)*Ht - 0.5
    u = (xi + 0.5) / Wt
    v = 1.0 - (yi + 0.5) / Ht
    return jnp.asarray(np.stack([u, v], axis=-1), jnp.float32)


def _grad_pair(uv, tex, mask, weights):
    """(streamed-kernel grads, dense grads) for a weighted-sum loss."""
    def loss_k(u, t, m):
        o, _ = texture_render(u, t, m, interpret=True)
        return jnp.sum(o * weights)

    def loss_d(u, t, m):
        return jnp.sum(_masked_dense(u, t, m) * weights)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(uv, tex, mask)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(uv, tex, mask)
    return gk, gd


def test_streamed_backward_matches_dense(scene):
    """The streamed Pallas backward (VERDICT r4 item 4) vs the dense
    tent-matmul VJP: d_texcoord and d_textures agree to bf16 summation
    -order tolerance; d_texmask agrees at covered pixels (uncovered ones
    are zero by design — downstream drops the hard-mask cotangent)."""
    _, tex, mask = scene
    rs = np.random.RandomState(7)
    uv = _knot_safe_uv(rs, B, H, W, HT, WT)
    weights = jnp.asarray(rs.randn(B, H, W, 3), jnp.float32)
    (g_uv, g_tex, g_m), (d_uv, d_tex, d_m) = _grad_pair(uv, tex, mask,
                                                        weights)
    scale_uv = float(jnp.max(jnp.abs(d_uv))) or 1.0
    assert float(jnp.max(jnp.abs(g_uv - d_uv))) / scale_uv < 2e-2
    scale_t = float(jnp.max(jnp.abs(d_tex))) or 1.0
    assert float(jnp.max(jnp.abs(g_tex - d_tex))) / scale_t < 2e-2
    cov = np.asarray(mask) > 0.5
    dm_err = np.abs(np.asarray(g_m) - np.asarray(d_m))[cov]
    assert dm_err.max() / (float(jnp.max(jnp.abs(d_m))) or 1.0) < 2e-2
    np.testing.assert_array_equal(np.asarray(g_m)[~cov], 0.0)


def test_streamed_backward_x_windowed():
    """Wt > 128 engages the x-windowed stream in the backward too."""
    from magicmirror.ops.pallas.texture_cells import n_x_windows

    rs = np.random.RandomState(5)
    Ht2, Wt2 = 128, 256
    assert n_x_windows(Wt2) == 2
    uv = _knot_safe_uv(rs, B, H, W, Ht2, Wt2)
    tex = jnp.asarray(rs.rand(B, Ht2, Wt2, 3), jnp.float32)
    mask = jnp.asarray((rs.rand(B, H, W) > 0.4).astype(np.float32))
    weights = jnp.asarray(rs.randn(B, H, W, 3), jnp.float32)
    (g_uv, g_tex, _), (d_uv, d_tex, _) = _grad_pair(uv, tex, mask, weights)
    assert (float(jnp.max(jnp.abs(g_uv - d_uv)))
            / (float(jnp.max(jnp.abs(d_uv))) or 1.0)) < 2e-2
    assert (float(jnp.max(jnp.abs(g_tex - d_tex)))
            / (float(jnp.max(jnp.abs(d_tex))) or 1.0)) < 2e-2


def test_streamed_backward_overflow_fallback(scene, monkeypatch):
    """Stream overflow -> BOTH forward and backward take the dense
    formulation (the cond in _texture_cells_bwd)."""
    _, tex, mask = scene
    rs = np.random.RandomState(11)
    uv = _knot_safe_uv(rs, B, H, W, HT, WT)
    monkeypatch.setenv("MAGICMIRROR_TEX_CAP", "2")
    weights = jnp.full((B, H, W, 3), 2.0, jnp.float32)
    (g_uv, g_tex, _), (d_uv, d_tex, _) = _grad_pair(uv, tex, mask, weights)
    np.testing.assert_allclose(np.asarray(g_uv), np.asarray(d_uv), atol=4e-3)
    np.testing.assert_allclose(np.asarray(g_tex), np.asarray(d_tex),
                               atol=4e-3)


def test_overflow_falls_back_dense_exact(scene, monkeypatch):
    uv, tex, mask = scene
    monkeypatch.setenv("MAGICMIRROR_TEX_CAP", "2")  # force stream overflow
    out, dropped = texture_render(uv, tex, mask, interpret=True)
    assert np.all(np.asarray(dropped) > 0)
    ref = _masked_dense(uv, tex, mask)
    # same formulation (the cond routes to the dense branch); XLA may fuse
    # the bf16 contraction differently under lax.cond than in the eager
    # oracle, so bit-equality is not guaranteed — one-ulp tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=4e-3)


def test_default_capacity_covers_bench_cells():
    ch, cw = cell_shape(256, 256)
    nc = (256 // ch) * (256 // cw)
    assert default_chunk_capacity(nc) >= 2 * nc


def test_x_windowed_path_matches_dense():
    """Wt > 128 engages the 128-col x-window stream (the bench shape);
    accumulating over a cell's touched windows must still be exact
    bilinear."""
    from magicmirror.ops.pallas.texture_cells import n_x_windows

    rs = np.random.RandomState(3)
    Ht2, Wt2 = 128, 256
    assert n_x_windows(Wt2) == 2
    uv = jnp.asarray(rs.rand(B, H, W, 2), jnp.float32)
    tex = jnp.asarray(rs.rand(B, Ht2, Wt2, 3), jnp.float32)
    mask = jnp.asarray((rs.rand(B, H, W) > 0.3).astype(np.float32))
    out, dropped = texture_render(uv, tex, mask, interpret=True)
    ref = _masked_dense(uv, tex, mask)
    assert np.all(np.asarray(dropped) == 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=8e-3)
    # straddling taps: uv concentrated around the window boundary x=128
    uvb = jnp.asarray(
        np.stack([np.full((B, H, W), 0.5) + rs.uniform(-0.02, 0.02,
                                                       (B, H, W)),
                  rs.rand(B, H, W)], -1), jnp.float32)
    out2, d2 = texture_render(uvb, tex, mask, interpret=True)
    ref2 = _masked_dense(uvb, tex, mask)
    assert np.all(np.asarray(d2) == 0)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=8e-3)


def test_renderer_integration_parity(monkeypatch):
    """DiffRender with the cell kernel forced on == forced off (v4 path)."""
    from magicmirror.render.renderer import DiffRender

    rng = np.random.RandomState(0)
    dr = DiffRender("template/sphere.obj", H, ratio=1.0, backend="pallas")
    V = dr.num_vertices
    att = {
        "azimuths": jnp.asarray(rng.uniform(-180, 180, B), jnp.float32),
        "elevations": jnp.asarray(rng.uniform(0, 30, B), jnp.float32),
        "distances": jnp.asarray(rng.uniform(2, 4, B), jnp.float32),
        "biases": jnp.asarray(rng.uniform(-0.2, 0.2, (B, 2)), jnp.float32),
        "vertices": jnp.asarray(
            dr.vertices_init[None] + rng.uniform(-0.05, 0.05, (B, V, 3)),
            jnp.float32),
        "textures": jnp.asarray(rng.rand(B, 2 * H, W, 3), jnp.float32),
        "lights": jnp.asarray(
            np.concatenate([np.full((B, 1), 3.0),
                            rng.uniform(-0.1, 0.1, (B, 8))], 1), jnp.float32),
        "bg": None,
        "delta_vertices": jnp.zeros((B, V, 3), jnp.float32),
    }
    monkeypatch.setattr(tc, "_FORCE", "1")
    rgba_on, att_on = dr.render(**att)
    assert "dropped_tex_chunks" in att_on
    assert np.all(np.asarray(att_on["dropped_tex_chunks"]) == 0)
    monkeypatch.setattr(tc, "_FORCE", "0")
    rgba_off, att_off = dr.render(**att)
    assert "dropped_tex_chunks" not in att_off
    np.testing.assert_allclose(np.asarray(rgba_on), np.asarray(rgba_off),
                               atol=8e-3)
