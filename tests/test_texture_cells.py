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


def test_gradients_route_through_dense_math(scene):
    uv, tex, mask = scene

    # linear loss -> cotangent independent of the (bf16-rounded) primal, so
    # the custom-vjp grads must match the dense path's EXACTLY
    def loss_k(u, t):
        o, _ = texture_render(u, t, mask, interpret=True)
        return jnp.sum(o * 3.0)

    def loss_d(u, t):
        return jnp.sum(_masked_dense(u, t, mask) * 3.0)

    gk = jax.grad(loss_k, argnums=(0, 1))(uv, tex)
    gd = jax.grad(loss_d, argnums=(0, 1))(uv, tex)
    for a, b in zip(gk, gd):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
