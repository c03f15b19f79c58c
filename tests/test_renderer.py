"""Full DiffRender pipeline tests on the real sphere template."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicmirror.render.renderer import DiffRender, deep_copy

TEMPLATE = os.path.join(os.path.dirname(__file__), "..", "template", "sphere.obj")


@pytest.fixture(scope="module")
def dr():
    return DiffRender(TEMPLATE, 32, ratio=1.0, init_ellipsoid=1.0)


def make_att(dr, B=2, azim=0.0):
    V = dr.num_vertices
    rs = np.random.RandomState(0)
    return {
        "azimuths": jnp.full((B,), azim, jnp.float32),
        "elevations": jnp.full((B,), 10.0, jnp.float32),
        "distances": jnp.full((B,), 2.5, jnp.float32),
        "biases": jnp.zeros((B, 2), jnp.float32),
        "vertices": jnp.broadcast_to(dr.vertices_init[None], (B, V, 3)),
        "delta_vertices": jnp.zeros((B, V, 3), jnp.float32),
        "textures": jnp.asarray(rs.rand(B, 64, 32, 3).astype(np.float32)),
        "lights": jnp.asarray(
            np.tile([[3.0, 0, 0, 0, 0, 0, 0, 0, 0]], (B, 1)).astype(np.float32)),
        "bg": None,
    }


def test_render_shapes_and_coverage(dr):
    rgba, att = dr.render(**make_att(dr))
    assert rgba.shape == (2, 32, 32, 4)
    img = np.asarray(rgba)
    assert np.isfinite(img).all()
    assert img.min() >= 0 and img.max() <= 1
    mask = img[0, :, :, 3]
    # the sphere at distance 2.5 covers the image center, not the corners
    assert mask[16, 16] > 0.9
    assert mask[0, 0] < 0.1
    # the ellipsoid projects roughly symmetric coverage
    assert abs(mask[:, :16].sum() - mask[:, 16:].sum()) / mask.sum() < 0.15
    assert "face_normals" in att and "imnormal" in att


def test_render_camera_moves_object(dr):
    att = make_att(dr)
    rgba0, _ = dr.render(**att)
    att_b = dict(att)
    att_b["biases"] = jnp.asarray([[0.4, 0.0], [0.4, 0.0]], jnp.float32)
    rgba1, _ = dr.render(**att_b)
    m0 = np.asarray(rgba0[0, :, :, 3])
    m1 = np.asarray(rgba1[0, :, :, 3])
    # moving the look-at target in +x shifts the silhouette
    c0 = (m0 * np.arange(32)[None, :]).sum() / m0.sum()
    c1 = (m1 * np.arange(32)[None, :]).sum() / m1.sum()
    assert abs(c1 - c0) > 2.0


def test_render_distance_shrinks(dr):
    att = make_att(dr)
    far = dict(att)
    far["distances"] = jnp.full((2,), 5.0, jnp.float32)
    near_m = np.asarray(dr.render(**att)[0][0, :, :, 3])
    far_m = np.asarray(dr.render(**far)[0][0, :, :, 3])
    assert far_m.sum() < near_m.sum() * 0.6


def test_render_jit_and_grad(dr):
    att = make_att(dr)

    @jax.jit
    def loss(vertices, textures, lights):
        a = dict(att)
        a["vertices"] = vertices
        a["textures"] = textures
        a["lights"] = lights
        rgba, _ = dr.render(**a)
        return jnp.mean(rgba ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(att["vertices"], att["textures"],
                                          att["lights"])
    for gi in g:
        arr = np.asarray(gi)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0


def test_render_white_vs_bg_mode(dr):
    att = make_att(dr)
    white, _ = dr.render(**att)
    att_bg = dict(att)
    att_bg["bg"] = jnp.zeros((2, 32, 32, 3), jnp.float32)
    black, _ = dr.render(no_mask=True, **att_bg)
    # outside the silhouette: white mode is 1, bg mode is 0
    m = np.asarray(white[0, :, :, 3]) < 0.01
    assert np.asarray(white[0, :, :, :3])[m].mean() > 0.95
    assert np.asarray(black[0, :, :, :3])[m].mean() < 0.05


def test_deep_copy_detach(dr):
    att = make_att(dr)
    att2 = deep_copy(att, index=jnp.asarray([1, 0]), detach=True)
    np.testing.assert_allclose(np.asarray(att2["distances"]),
                               np.asarray(att["distances"][::-1]))


def test_flagship_642_geometry(dr):
    assert dr.num_vertices == 642
    assert dr.num_faces == 1280
    assert dr.face_uvs.shape == (1280, 3, 2)
    # edges: closed manifold → E = 3F/2
    assert dr.edges.shape[0] == 1920


def test_dense_template_routes_to_v6(monkeypatch):
    """Renderer-level DENSE_THRESHOLD dispatch (VERDICT r4 item 3): the
    pallas backend must route dense templates (SMPL 13,776 f >= 2048) to the
    v6 flat interval stream and sparse ones (sphere 1,280 f) to the banded
    v5/v4 path — this pins the exact code path the trainer takes on SMPL
    (render/renderer.py DENSE_THRESHOLD routing), end-to-end through
    DiffRender.render, with output parity vs the XLA golden renderer."""
    from magicmirror.ops.pallas import rasterize_v4 as r4
    from magicmirror.ops.pallas import rasterize_v6 as r6

    calls = {"v6": 0, "v5": 0, "v4": 0}
    real_v6, real_v5, real_v4 = (r6.rasterize_fused_v6,
                                 r4.rasterize_fused_v5,
                                 r4.rasterize_fused_v4)

    def spy(name, real):
        def wrapped(*a, **k):
            calls[name] += 1
            return real(*a, **k)
        return wrapped

    monkeypatch.setattr(r6, "rasterize_fused_v6", spy("v6", real_v6))
    monkeypatch.setattr(r4, "rasterize_fused_v5", spy("v5", real_v5))
    monkeypatch.setattr(r4, "rasterize_fused_v4", spy("v4", real_v4))

    smpl = os.path.join(os.path.dirname(__file__), "..", "template",
                        "smpl_uv.obj")
    for template, expect in ((smpl, "v6"), (TEMPLATE, "v5")):
        dr_p = DiffRender(template, 32, ratio=1.0, backend="pallas")
        dr_x = DiffRender(template, 32, ratio=1.0, backend="xla")
        att = make_att(dr_p, B=1)
        before = dict(calls)
        rgba_p, out_att = dr_p.render(**att)
        assert calls[expect] == before[expect] + 1, (template, calls)
        assert int(np.asarray(out_att.get(
            "dropped_faces", jnp.zeros(1))).sum()) == 0
        rgba_x, _ = dr_x.render(**att)
        np.testing.assert_allclose(np.asarray(rgba_p), np.asarray(rgba_x),
                                   atol=3e-4)
