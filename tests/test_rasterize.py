"""Soft rasterizer unit tests (SURVEY.md §4: single triangle + icosphere,
forward images AND gradients)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicmirror.ops.rasterize import dibr_rasterization, pixel_grid

H = W = 16


def tri(verts_xy, z=(-2.0, -2.0, -2.0), nz=1.0):
    """Build single-face batch inputs from 3 NDC xy verts."""
    fvi = jnp.asarray(verts_xy, jnp.float32)[None, None]  # (1,1,3,2)
    fz = jnp.asarray(z, jnp.float32)[None, None]  # (1,1,3)
    fnz = jnp.asarray([[nz]], jnp.float32)
    feats = jnp.ones((1, 1, 3, 1), jnp.float32)
    return fz, fvi, feats, fnz


def test_single_triangle_coverage():
    # large CCW triangle covering the image center
    fz, fvi, feats, fnz = tri([[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]])
    out, soft, face_idx = dibr_rasterization(H, W, fz, fvi, feats, fnz)
    hard = np.asarray(out[0, :, :, 0])
    fi = np.asarray(face_idx[0])
    # center covered
    assert hard[H // 2, W // 2] == 1.0
    assert fi[H // 2, W // 2] == 0
    # corners uncovered
    assert hard[0, 0] == 0.0 and fi[0, 0] == -1
    assert hard[0, W - 1] == 0.0
    # soft mask ~1 inside, small far outside
    s = np.asarray(soft[0])
    assert s[H // 2, W // 2] > 0.99
    assert s[0, 0] < 0.05


def test_backface_culled():
    fz, fvi, feats, fnz = tri([[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]], nz=-1.0)
    out, soft, face_idx = dibr_rasterization(H, W, fz, fvi, feats, fnz)
    assert np.asarray(out).max() == 0.0
    assert np.asarray(soft).max() == 0.0
    assert np.asarray(face_idx).max() == -1


def test_zbuffer_orders_faces():
    # two overlapping triangles; face 1 is closer (larger camera z)
    fvi = jnp.asarray([
        [[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]],
        [[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]],
    ], jnp.float32)[None]
    fz = jnp.asarray([[[-3.0] * 3, [-2.0] * 3]], jnp.float32)
    fnz = jnp.asarray([[1.0, 1.0]], jnp.float32)
    feats = jnp.stack([jnp.zeros((1, 3, 1)), jnp.ones((1, 3, 1))], 1).astype(jnp.float32)
    out, soft, face_idx = dibr_rasterization(H, W, fz, fvi, feats, fnz)
    assert np.asarray(face_idx[0])[H // 2, W // 2] == 1
    assert np.asarray(out[0])[H // 2, W // 2, 0] == 1.0


def test_barycentric_interpolation_linear():
    """Interpolating vertex features must reproduce a linear function of xy."""
    verts = [[-0.8, -0.8], [0.8, -0.8], [0.0, 0.8]]
    fz, fvi, _, fnz = tri(verts)
    # feature = x + 2y at each vertex
    f = jnp.asarray([[v[0] + 2 * v[1] for v in verts]], jnp.float32)[..., None][None]
    f = f.reshape(1, 1, 3, 1)
    out, _, face_idx = dibr_rasterization(64, 64, fz, fvi, f, fnz)
    px, py = pixel_grid(64, 64)
    expect = (px + 2 * py).reshape(64, 64)
    got = np.asarray(out[0, :, :, 0])
    covered = np.asarray(face_idx[0]) >= 0
    assert covered.sum() > 100
    np.testing.assert_allclose(got[covered], np.asarray(expect)[covered], atol=1e-4)


def test_chunked_matches_unchunked():
    rs = np.random.RandomState(3)
    F = 37
    fvi = jnp.asarray(rs.uniform(-1, 1, (2, F, 3, 2)).astype(np.float32))
    fz = jnp.asarray(rs.uniform(-4, -2, (2, F, 3)).astype(np.float32))
    fnz = jnp.asarray(rs.uniform(-1, 1, (2, F)).astype(np.float32))
    feats = jnp.asarray(rs.rand(2, F, 3, 2).astype(np.float32))
    o1, s1, i1 = dibr_rasterization(H, W, fz, fvi, feats, fnz, chunk=8)
    o2, s2, i2 = dibr_rasterization(H, W, fz, fvi, feats, fnz, chunk=64)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_soft_mask_gradient_direction():
    """DIB-R's key property: gradient flows through the soft silhouette to
    OFF-silhouette faces.  Shrinking loss = sum(soft) must pull verts inward."""
    verts0 = jnp.asarray([[[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]]], jnp.float32)

    def soft_sum(v):
        fvi = v[None]
        fz = jnp.full((1, 1, 3), -2.0)
        fnz = jnp.ones((1, 1))
        feats = jnp.ones((1, 1, 3, 1))
        _, soft, _ = dibr_rasterization(32, 32, fz, fvi, feats, fnz,
                                        sigmainv=70.0)
        return jnp.sum(soft)

    g = jax.grad(soft_sum)(verts0)
    g = np.asarray(g[0])
    assert np.isfinite(g).all()
    # growing the triangle grows coverage: gradient of sum(soft) w.r.t. the
    # apex y must be positive (moving apex up increases covered area)
    assert g[2, 1] > 0
    # left vertex moving left (negative x) increases coverage
    assert g[0, 0] < 0


def test_hard_gradient_through_attributes():
    """Gradients must flow through barycentric interpolation to vertex xy."""
    def loss(v):
        fvi = v[None]
        fz = jnp.full((1, 1, 3), -2.0)
        fnz = jnp.ones((1, 1))
        feats = jnp.asarray([[0.0], [1.0], [0.0]]).reshape(1, 1, 3, 1)
        out, _, _ = dibr_rasterization(16, 16, fz, fvi, feats, fnz)
        return jnp.sum(out ** 2)

    v = jnp.asarray([[[-0.8, -0.8], [0.8, -0.8], [0.0, 0.8]]], jnp.float32)
    g = jax.grad(loss)(v)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_vs_bruteforce_oracle():
    """Cross-check the scan implementation against a dead-simple O(P*F)
    numpy rasterizer on random meshes."""
    rs = np.random.RandomState(0)
    F = 11
    fvi = rs.uniform(-1, 1, (F, 3, 2)).astype(np.float32)
    fz = rs.uniform(-4, -2, (F, 3)).astype(np.float32)
    fnz = rs.uniform(-1, 1, F).astype(np.float32)

    h = w = 12
    px, py = [np.asarray(a) for a in pixel_grid(h, w)]
    best = np.full(px.shape, -1, np.int64)
    bestz = np.full(px.shape, -np.inf)
    for f in range(F):
        if fnz[f] <= 0:
            continue
        a, b, c = fvi[f]
        den = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(den) < 1e-10:
            continue
        w0 = ((c[0] - b[0]) * (py - b[1]) - (c[1] - b[1]) * (px - b[0])) / den * -1
        # recompute with the standard formula
        w0 = ((c[0] - b[0]) * (py - b[1]) - (py * 0 + (c[1] - b[1])) * (px - b[0]))
        # use matching formula: cross(c-b, p-b)/den
        w0 = ((c[0] - b[0]) * (py - b[1]) - (c[1] - b[1]) * (px - b[0])) / den
        w1 = ((a[0] - c[0]) * (py - c[1]) - (a[1] - c[1]) * (px - c[0])) / den
        w2 = 1 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        z = w0 * fz[f, 0] + w1 * fz[f, 1] + w2 * fz[f, 2]
        better = inside & (z > bestz)
        bestz = np.where(better, z, bestz)
        best = np.where(better, f, best)

    feats = jnp.ones((1, F, 3, 1), jnp.float32)
    _, _, face_idx = dibr_rasterization(
        h, w, jnp.asarray(fz)[None], jnp.asarray(fvi)[None], feats,
        jnp.asarray(fnz)[None], chunk=4)
    np.testing.assert_array_equal(np.asarray(face_idx[0]).reshape(-1), best)
