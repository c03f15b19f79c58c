"""v4 Pallas rasterizer vs the XLA golden path (interpret mode on CPU).

Covers: forward idx/soft parity, fused winner-attribute parity, the Pallas
backward kernel vs golden autodiff, and the capacity-overflow counter."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magicmirror.geometry import camera as cam
from magicmirror.geometry import mesh as mesh_ops
from magicmirror.geometry.obj_io import load_obj
from magicmirror.ops.rasterize import dibr_rasterization
from magicmirror.ops.pallas.rasterize_v4 import (
    rasterize_fused_v4, rasterize_plain_v4)

H = W = 64
B = 2


@pytest.fixture(scope="module")
def scene():
    mesh = load_obj("template/sphere.obj", with_materials=True)
    v = mesh_ops.normalize_template(mesh.vertices, 1.0)
    faces = mesh.faces.astype(np.int32)
    rng = np.random.RandomState(0)
    verts = jnp.asarray(v[None] + rng.uniform(-0.05, 0.05, (B,) + v.shape),
                        jnp.float32)
    proj = cam.perspective_projection(math.atan(1.0 / 2.5) * 2, ratio=1.0)
    cpos = cam.camera_position_from_spherical_angles(
        jnp.asarray([2.5, 3.5], jnp.float32),
        jnp.asarray([10.0, 20.0], jnp.float32),
        jnp.asarray([30.0, -120.0], jnp.float32), degrees=True)
    tr = cam.generate_transformation_matrix(
        cpos, jnp.zeros((B, 3), jnp.float32),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), (B, 3)))
    fvc, fvi, fn = cam.prepare_vertices(verts, jnp.asarray(faces), proj, tr)
    face_uvs = jnp.asarray(mesh.uvs[mesh.face_uvs_idx])
    return dict(fvi=fvi, fz=fvc[:, :, :, 2], fnz=fn[:, :, 2], fn=fn,
                face_uvs=face_uvs, F=faces.shape[0])


def test_plain_forward_matches_golden(scene):
    fvi, fz, fnz, F = scene["fvi"], scene["fz"], scene["fnz"], scene["F"]
    attrs = [jnp.ones((B, F, 3, 1), jnp.float32)]
    _, soft_g, idx_g = dibr_rasterization(H, W, fz, fvi, attrs, fnz,
                                          soft_mode="line")
    idx, sumlog, dropped = rasterize_plain_v4(fvi, fz, fnz, height=H, width=W)
    assert np.all(np.asarray(dropped) == 0)
    assert np.array_equal(np.asarray(idx.reshape(B, H, W)), np.asarray(idx_g))
    soft = (1.0 - jnp.exp(sumlog)).reshape(B, H, W)
    np.testing.assert_allclose(np.asarray(soft), np.asarray(soft_g),
                               atol=3e-4)


def test_fused_attrs_match_golden(scene):
    fvi, fz, fnz = scene["fvi"], scene["fz"], scene["fnz"]
    fn, face_uvs, F = scene["fn"], scene["face_uvs"], scene["F"]
    attrs = [jnp.ones((B, F, 3, 1), jnp.float32),
             jnp.broadcast_to(face_uvs[None], (B, F, 3, 2)),
             fn[:, :, None, :].repeat(3, axis=2)]
    feats, soft_g, idx_g = dibr_rasterization(H, W, fz, fvi, attrs, fnz,
                                              soft_mode="line")
    idx, soft, uv, normal, hard, dropped = rasterize_fused_v4(
        fvi, fz, fnz, face_uvs, fn, height=H, width=W)
    assert np.all(np.asarray(dropped) == 0)
    assert np.array_equal(np.asarray(idx.reshape(B, H, W)),
                          np.asarray(idx_g))
    np.testing.assert_allclose(np.asarray(uv.reshape(B, H, W, 2)),
                               np.asarray(feats[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(normal.reshape(B, H, W, 3)),
                               np.asarray(feats[2]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hard.reshape(B, H, W, 1)),
                               np.asarray(feats[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(soft.reshape(B, H, W)),
                               np.asarray(soft_g), atol=3e-4)


def test_pallas_backward_matches_golden_autodiff(scene):
    fvi, fz, fnz, F = scene["fvi"], scene["fz"], scene["fnz"], scene["F"]
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(B, H, W), jnp.float32)

    def loss_golden(fvi_):
        attrs = [jnp.ones((B, F, 3, 1), jnp.float32)]
        _, soft, _ = dibr_rasterization(H, W, fz, fvi_, attrs, fnz,
                                        soft_mode="line")
        return jnp.sum(soft * w)

    def loss_v4(fvi_):
        _, sumlog, _ = rasterize_plain_v4(fvi_, fz, fnz, height=H, width=W)
        return jnp.sum((1.0 - jnp.exp(sumlog)).reshape(B, H, W) * w)

    g_g = jax.grad(loss_golden)(fvi)
    g_v = jax.grad(loss_v4)(fvi)
    scale = float(jnp.max(jnp.abs(g_g)))
    assert float(jnp.max(jnp.abs(g_g - g_v))) < 1e-4 * scale


def test_fused_backward_full(scene):
    fvi, fz, fnz = scene["fvi"], scene["fz"], scene["fnz"]
    fn, face_uvs, F = scene["fn"], scene["face_uvs"], scene["F"]
    rng = np.random.RandomState(2)
    w_s = jnp.asarray(rng.randn(B, H * W), jnp.float32)
    w_uv = jnp.asarray(rng.randn(B, H * W, 2), jnp.float32)
    w_n = jnp.asarray(rng.randn(B, H * W, 3), jnp.float32)

    def loss_golden(fvi_, uvs_, fn_):
        attrs = [jnp.broadcast_to(uvs_[None], (B, F, 3, 2)),
                 fn_[:, :, None, :].repeat(3, axis=2)]
        (uv_im, n_im), soft, _ = dibr_rasterization(
            H, W, fz, fvi_, attrs, fnz, soft_mode="line")
        return (jnp.sum(soft.reshape(B, -1) * w_s)
                + jnp.sum(uv_im.reshape(B, -1, 2) * w_uv)
                + jnp.sum(n_im.reshape(B, -1, 3) * w_n))

    def loss_v4(fvi_, uvs_, fn_):
        _, soft, uv, normal, _, _ = rasterize_fused_v4(
            fvi_, fz, fnz, uvs_, fn_, height=H, width=W)
        return (jnp.sum(soft * w_s) + jnp.sum(uv * w_uv)
                + jnp.sum(normal * w_n))

    gg = jax.grad(loss_golden, argnums=(0, 1, 2))(fvi, face_uvs, fn)
    gv = jax.grad(loss_v4, argnums=(0, 1, 2))(fvi, face_uvs, fn)
    for a, b in zip(gg, gv):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale


def test_overflow_counter(scene):
    """A tiny capacity must REPORT drops, not silently cap."""
    fvi, fz, fnz = scene["fvi"], scene["fz"], scene["fnz"]
    _, _, dropped = rasterize_plain_v4(fvi, fz, fnz, height=H, width=W,
                                       capacity=8)
    assert np.all(np.asarray(dropped) > 0)
    _, _, d0 = rasterize_plain_v4(fvi, fz, fnz, height=H, width=W)
    assert np.all(np.asarray(d0) == 0)


def _close_camera_scene(n=8, seed=3, deform=0.08):
    mesh = load_obj("template/sphere.obj", with_materials=True)
    v = mesh_ops.normalize_template(mesh.vertices, 1.0)
    faces = mesh.faces.astype(np.int32)
    proj = cam.perspective_projection(math.atan(1.0 / 2.5) * 2, ratio=1.0)
    rng = np.random.RandomState(seed)
    dists = jnp.asarray([2.0] * (n // 2) + list(rng.uniform(2, 7, n - n // 2)),
                        jnp.float32)
    cpos = cam.camera_position_from_spherical_angles(
        dists, jnp.asarray(rng.uniform(0, 30, n), jnp.float32),
        jnp.asarray(rng.uniform(-180, 180, n), jnp.float32), degrees=True)
    tr = cam.generate_transformation_matrix(
        cpos, jnp.zeros((n, 3), jnp.float32),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), (n, 3)))
    verts = jnp.asarray(v[None] + rng.uniform(-deform, deform,
                                              (n,) + v.shape), jnp.float32)
    _, fvi, fn = cam.prepare_vertices(verts, jnp.asarray(faces), proj, tr)
    fz = jnp.zeros((n, faces.shape[0], 3), jnp.float32)
    return fvi, fz, fn[:, :, 2]


def test_default_capacity_covers_close_cameras():
    """The auto capacity must be lossless at the CLOSEST training camera
    (dist_range 2~7) with deformed vertices, at every auto cell config —
    the round-1 silent-drop failure mode (VERDICT weak #4)."""
    fvi, fz, fnz = _close_camera_scene()
    for size in (64, 128, 256):
        _, _, dropped = rasterize_plain_v4(fvi, fz, fnz, height=size,
                                           width=size)
        assert np.all(np.asarray(dropped) == 0), size


def test_column_binning_matches_golden(scene):
    """Forced 2-column cells: forward + gradient parity with golden."""
    fvi, fz, fnz, F = scene["fvi"], scene["fz"], scene["fnz"], scene["F"]
    attrs = [jnp.ones((B, F, 3, 1), jnp.float32)]
    _, soft_g, idx_g = dibr_rasterization(H, W, fz, fvi, attrs, fnz,
                                          soft_mode="line")
    idx, sumlog, dropped = rasterize_plain_v4(fvi, fz, fnz, height=H,
                                              width=W, band_rows=4, n_cols=2)
    assert np.all(np.asarray(dropped) == 0)
    assert np.array_equal(np.asarray(idx.reshape(B, H, W)), np.asarray(idx_g))
    soft = (1.0 - jnp.exp(sumlog)).reshape(B, H, W)
    np.testing.assert_allclose(np.asarray(soft), np.asarray(soft_g),
                               atol=3e-4)

    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(B, H * W), jnp.float32)

    def loss_v4(fvi_):
        _, sl, _ = rasterize_plain_v4(fvi_, fz, fnz, height=H, width=W,
                                      band_rows=4, n_cols=2)
        return jnp.sum((1.0 - jnp.exp(sl)) * w)

    def loss_g(fvi_):
        _, s, _ = dibr_rasterization(H, W, fz, fvi_, attrs, fnz,
                                     soft_mode="line")
        return jnp.sum(s.reshape(B, -1) * w)

    g_v = jax.grad(loss_v4)(fvi)
    g_g = jax.grad(loss_g)(fvi)
    scale = float(jnp.max(jnp.abs(g_g)))
    assert float(jnp.max(jnp.abs(g_g - g_v))) < 1e-4 * scale


def test_stream_v5_bitwise_matches_v4(scene):
    """The v5 stream forward must be BITWISE identical to v4 (dead capacity
    slots are exact identities), outputs and gradients both."""
    from magicmirror.ops.pallas.rasterize_v4 import (rasterize_fused_v4,
                                                     rasterize_fused_v5)

    fvi, fz, fnz = scene["fvi"], scene["fz"], scene["fnz"]
    fn, face_uvs = scene["fn"], scene["face_uvs"]
    o4 = rasterize_fused_v4(fvi, fz, fnz, face_uvs, fn, height=H, width=W)
    o5 = rasterize_fused_v5(fvi, fz, fnz, face_uvs, fn, height=H, width=W)
    for a, b in zip(o4, o5):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def loss(fvi_, which):
        _, soft, uv, normal, _, _ = which(fvi_, fz, fnz, face_uvs, fn,
                                          height=H, width=W)
        return (jnp.sum(soft * jnp.sin(soft)) + jnp.sum(uv * 0.3)
                + jnp.sum(normal ** 2))

    g4 = jax.grad(lambda a: loss(a, rasterize_fused_v4))(fvi)
    g5 = jax.grad(lambda a: loss(a, rasterize_fused_v5))(fvi)
    assert np.array_equal(np.asarray(g4), np.asarray(g5))


def test_stream_v5_empty_cells_defaults():
    """Cells with zero faces must come out as background (idx -1, soft 0,
    attrs 0) — they get no stream entries, only the pre-zeroed outputs."""
    from magicmirror.ops.pallas.rasterize_v4 import rasterize_fused_v5

    F = 4
    rng = np.random.RandomState(0)
    # a tiny off-center triangle cluster leaves most cells empty
    fvi = jnp.asarray(0.1 * rng.rand(B, F, 3, 2) + 0.5, jnp.float32)
    fz = jnp.asarray(-2.0 + 0.1 * rng.rand(B, F, 3), jnp.float32)
    fnz = jnp.ones((B, F), jnp.float32)
    face_uvs = jnp.asarray(rng.rand(F, 3, 2), jnp.float32)
    fn = jnp.asarray(rng.rand(B, F, 3), jnp.float32)
    idx, soft, uv, normal, hard, dropped = rasterize_fused_v5(
        fvi, fz, fnz, face_uvs, fn, height=H, width=W)
    idx = np.asarray(idx.reshape(B, H, W))
    assert (idx[:, :, : W // 4] == -1).all()          # far-left cells empty
    assert np.allclose(np.asarray(soft.reshape(B, H, W))[:, :, : W // 4], 0.0)


def test_rank_compaction_binning_bitwise(scene):
    """The cumsum-rank one-hot bin+gather (the sort-free production path)
    must reproduce the sort-based _bin_lists + _gather_rows bitwise —
    lists, counts, dropped, and the banded rows — including capacity
    overflow and F < capacity."""
    from magicmirror.ops.pallas.rasterize_v4 import (
        _bin_gather_rows, _bin_lists, _face_rows, _gather_rows)

    fvi, fz, fnz = scene["fvi"], scene["fz"], scene["fnz"]
    F = scene["F"]
    for (n_bands, n_cols, cap, Ft) in [(8, 2, 96, F), (8, 2, 24, F),
                                       (8, 2, 96, 12), (4, 1, 64, F)]:
        fv, fzz, fn_ = fvi[:, :Ft], fz[:, :Ft], fnz[:, :Ft]
        rows = jax.vmap(_face_rows)(fv, fzz, fn_)
        lists0, dropped0 = jax.vmap(
            lambda v, n: _bin_lists(v, n, n_bands, cap, n_cols))(fv, fn_)
        banded0 = _gather_rows(rows, lists0)
        banded1, lists1, counts1, dropped1 = _bin_gather_rows(
            rows, fv, fn_, n_bands, cap, n_cols)
        assert (np.asarray(lists0) == np.asarray(lists1)).all()
        assert (np.asarray(dropped0) == np.asarray(dropped1)).all()
        assert (np.asarray(counts1) == np.asarray(
            (lists0 < Ft).sum(2))).all()
        assert (np.asarray(banded0) == np.asarray(banded1)).all()
