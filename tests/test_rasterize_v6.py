"""v6 flat interval-stream rasterizer parity (interpret mode on CPU).

v6 must reproduce the banded v5 semantics exactly: the in-kernel overlap
mask re-applies `_overlap_cells`'s truncation face-for-face, so idx / uv /
normal / hard are bitwise-equal and `soft` differs only by the commutative
reordering of its per-pixel (1-p) product (block-slop faces multiply by
exactly 1.0).  Golden-path tolerances mirror tests/test_big_templates.py.
Reference semantics target: kaolin dibr_rasterization, reference
networks.py:297-299.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magicmirror.geometry import camera as cam
from magicmirror.geometry import mesh as mesh_ops
from magicmirror.geometry.obj_io import load_obj
from magicmirror.ops.rasterize import dibr_rasterization
from magicmirror.ops.pallas.rasterize_v4 import rasterize_fused_v5
from magicmirror.ops.pallas.rasterize_v6 import (
    _block_stream, default_block_capacity, rasterize_fused_v6)

H = W = 32
B = 2


def _scene(template, dist):
    mesh = load_obj(f"template/{template}", with_materials=True)
    v = mesh_ops.normalize_template(mesh.vertices, 1.0)
    faces = mesh.faces.astype(np.int32)
    rng = np.random.RandomState(0)
    verts = jnp.asarray(v[None] + rng.uniform(-0.03, 0.03, (B,) + v.shape),
                        jnp.float32)
    proj = cam.perspective_projection(math.atan(1.0 / 2.5) * 2, ratio=1.0)
    cpos = cam.camera_position_from_spherical_angles(
        jnp.asarray([dist, dist + 0.5], jnp.float32),
        jnp.asarray([15.0, 5.0], jnp.float32),
        jnp.asarray([40.0, -120.0], jnp.float32), degrees=True)
    tr = cam.generate_transformation_matrix(
        cpos, jnp.zeros((B, 3), jnp.float32),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), (B, 3)))
    fvc, fvi, fn = cam.prepare_vertices(verts, jnp.asarray(faces), proj, tr)
    face_uvs = jnp.asarray(mesh.uvs[mesh.face_uvs_idx])
    return dict(fvi=fvi, fz=fvc[:, :, :, 2], fnz=fn[:, :, 2], fn=fn,
                face_uvs=face_uvs, F=faces.shape[0])


@pytest.mark.parametrize("dist", [2.0, 6.0])
def test_v6_matches_v5_sphere(dist):
    """Same truncation set => bitwise idx/uv/normal/hard, reordered soft."""
    s = _scene("sphere.obj", dist)
    args = (s["fvi"], s["fz"], s["fnz"], s["face_uvs"], s["fn"])
    o5 = rasterize_fused_v5(*args, height=H, width=W)
    o6 = rasterize_fused_v6(*args, height=H, width=W)
    assert int(np.asarray(o5[5]).sum()) == 0
    assert int(np.asarray(o6[5]).sum()) == 0
    for k in (0, 2, 3, 4):  # idx, uv, normal, hard
        assert np.array_equal(np.asarray(o5[k]), np.asarray(o6[k])), k
    np.testing.assert_allclose(np.asarray(o5[1]), np.asarray(o6[1]),
                               atol=1e-6)


@pytest.mark.parametrize("template,dist", [("sphere2.obj", 2.0),
                                           ("smpl_uv.obj", 2.0),
                                           ("smpl_uv.obj", 6.0)])
def test_v6_fwd_golden(template, dist):
    """dist 6 is the dense regime: the template collapses into a couple of
    cells — the configuration the banded capacity cannot absorb."""
    s = _scene(template, dist)
    fvi, fz, fnz, fn = s["fvi"], s["fz"], s["fnz"], s["fn"]
    face_uvs, F = s["face_uvs"], s["F"]
    attrs = [jnp.ones((B, F, 3, 1), jnp.float32),
             jnp.broadcast_to(face_uvs[None], (B, F, 3, 2)),
             fn[:, :, None, :].repeat(3, axis=2)]
    feats_g, soft_g, idx_g = dibr_rasterization(
        H, W, fz, fvi, attrs, fnz, soft_mode="line")
    idx, soft, uv, normal, hard, dropped = rasterize_fused_v6(
        fvi, fz, fnz, face_uvs, fn, height=H, width=W)
    assert int(np.asarray(dropped).sum()) == 0
    assert np.array_equal(np.asarray(idx.reshape(B, H, W)),
                          np.asarray(idx_g))
    np.testing.assert_allclose(np.asarray(soft.reshape(B, H, W)),
                               np.asarray(soft_g), atol=3e-4)
    np.testing.assert_allclose(np.asarray(uv.reshape(B, H, W, 2)),
                               np.asarray(feats_g[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(normal.reshape(B, H, W, 3)),
                               np.asarray(feats_g[2]), atol=1e-5)


def test_v6_bwd_golden():
    s = _scene("smpl_uv.obj", 2.5)
    fvi, fz, fnz, fn = s["fvi"], s["fz"], s["fnz"], s["fn"]
    face_uvs, F = s["face_uvs"], s["F"]

    def loss_v6(fvi, fz, fn):
        _, soft, uv, normal, hard, _ = rasterize_fused_v6(
            fvi, fz, fnz, face_uvs, fn, height=H, width=W)
        return (jnp.sum(soft * jnp.sin(soft)) + jnp.sum(uv * 0.3)
                + jnp.sum(normal ** 2))

    def loss_golden(fvi, fz, fn):
        attrs = [jnp.ones((B, F, 3, 1), jnp.float32),
                 jnp.broadcast_to(face_uvs[None], (B, F, 3, 2)),
                 fn[:, :, None, :].repeat(3, axis=2)]
        feats, soft, _ = dibr_rasterization(
            H, W, fz, fvi, attrs, fnz, soft_mode="line")
        return (jnp.sum(soft * jnp.sin(soft)) + jnp.sum(feats[1] * 0.3)
                + jnp.sum(feats[2] ** 2))

    g6 = jax.grad(loss_v6, argnums=(0, 1, 2))(fvi, fz, fn)
    gg = jax.grad(loss_golden, argnums=(0, 1, 2))(fvi, fz, fn)
    for a, b in zip(g6, gg):
        na = float(jnp.linalg.norm(a))
        nb = float(jnp.linalg.norm(b))
        assert np.isfinite(na) and np.isfinite(nb)
        denom = max(nb, 1e-6)
        assert float(jnp.linalg.norm(a - b)) / denom < 2e-3


def test_v6_dropped_counting(monkeypatch):
    """Stream overflow is counted, never silent."""
    monkeypatch.setenv("MAGICMIRROR_STREAM_CAPACITY", "8")
    s = _scene("sphere.obj", 2.0)
    *_, dropped = rasterize_fused_v6(s["fvi"], s["fz"], s["fnz"],
                                     s["face_uvs"], s["fn"], height=H,
                                     width=W)
    assert int(np.asarray(dropped).max()) > 0


def test_block_stream_unit():
    """Handcrafted bitmap -> live-first cell-major stream with first/last
    flags and counted overflow."""
    NC, F, chunk, nblk = 3, 32, 8, 4
    overlap = np.zeros((NC, F), bool)
    overlap[0, 3] = True        # cell 0: block 0
    overlap[0, 26] = True       # cell 0: block 3
    overlap[2, 8:11] = True     # cell 2: block 1
    pk, nlive, dropped = _block_stream(jnp.asarray(overlap), nblk, chunk, 6)
    pk = np.asarray(pk)
    assert int(nlive) == 3 and int(dropped) == 0
    cell = pk & 0xFFF
    blk = (pk >> 12) & 0x3FFF
    first = (pk >> 26) & 1
    last = (pk >> 27) & 1
    assert list(cell[:3]) == [0, 0, 2]
    assert list(blk[:3]) == [0, 3, 1]
    assert list(first[:3]) == [1, 0, 1]
    assert list(last[:3]) == [0, 1, 1]
    # overflow: capacity 2 drops one entry
    _, nlive2, dropped2 = _block_stream(jnp.asarray(overlap), nblk, chunk, 2)
    assert int(nlive2) == 2 and int(dropped2) == 1


def test_block_capacity_defaults():
    # backward (chunk 128) always gets the full lossless bitmap bound
    assert default_block_capacity(13776, 64, 128) == 64 * 108
    # forward caps at the SMEM-feasible 12800 for the densest meshes
    # (1.26x the worst adversarial sweep: 10176 at SMPL 256²)
    assert default_block_capacity(13776, 64, 8) == 12800
    assert default_block_capacity(1280, 4, 8) == 4 * 160
