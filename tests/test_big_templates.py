"""Big-template parity: sphere2 (5,120 f) and SMPL (13,776 f — the
reference's human workload, networks.py:177-178, template/smpl_uv.obj)
through the v4 Pallas kernel vs the XLA golden path, forward AND backward
(interpret mode on CPU; small raster so the F·P interpret cost stays
bounded — the full-scale numbers live in benchmarks/bench_big_templates.py
/ BIGTEMPLATES.json)."""
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
    default_capacity, rasterize_fused_v4)

H = W = 32
B = 1


def _scene(template, dist):
    mesh = load_obj(f"template/{template}", with_materials=True)
    v = mesh_ops.normalize_template(mesh.vertices, 1.0)
    faces = mesh.faces.astype(np.int32)
    rng = np.random.RandomState(0)
    verts = jnp.asarray(v[None] + rng.uniform(-0.03, 0.03, (B,) + v.shape),
                        jnp.float32)
    proj = cam.perspective_projection(math.atan(1.0 / 2.5) * 2, ratio=1.0)
    cpos = cam.camera_position_from_spherical_angles(
        jnp.asarray([dist], jnp.float32), jnp.asarray([15.0], jnp.float32),
        jnp.asarray([40.0], jnp.float32), degrees=True)
    tr = cam.generate_transformation_matrix(
        cpos, jnp.zeros((B, 3), jnp.float32),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), (B, 3)))
    fvc, fvi, fn = cam.prepare_vertices(verts, jnp.asarray(faces), proj, tr)
    face_uvs = jnp.asarray(mesh.uvs[mesh.face_uvs_idx])
    return dict(fvi=fvi, fz=fvc[:, :, :, 2], fnz=fn[:, :, 2], fn=fn,
                face_uvs=face_uvs, F=faces.shape[0])


@pytest.mark.parametrize("template,dist", [("sphere2.obj", 2.0),
                                           ("smpl_uv.obj", 2.0)])
def test_big_template_fwd_parity(template, dist):
    s = _scene(template, dist)
    fvi, fz, fnz, fn = s["fvi"], s["fz"], s["fnz"], s["fn"]
    face_uvs, F = s["face_uvs"], s["F"]
    attrs = [jnp.ones((B, F, 3, 1), jnp.float32),
             jnp.broadcast_to(face_uvs[None], (B, F, 3, 2)),
             fn[:, :, None, :].repeat(3, axis=2)]
    feats_g, soft_g, idx_g = dibr_rasterization(
        H, W, fz, fvi, attrs, fnz, soft_mode="line")
    idx, soft, uv, normal, hard, dropped = rasterize_fused_v4(
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


def test_smpl_bwd_parity():
    s = _scene("smpl_uv.obj", 2.5)
    fvi, fz, fnz, fn = s["fvi"], s["fz"], s["fnz"], s["fn"]
    face_uvs, F = s["face_uvs"], s["F"]

    def loss_v4(fvi, fz, fn):
        _, soft, uv, normal, hard, _ = rasterize_fused_v4(
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

    g4 = jax.grad(loss_v4, argnums=(0, 1, 2))(fvi, fz, fn)
    gg = jax.grad(loss_golden, argnums=(0, 1, 2))(fvi, fz, fn)
    for a, b in zip(g4, gg):
        na = float(jnp.linalg.norm(a))
        nb = float(jnp.linalg.norm(b))
        assert np.isfinite(na) and np.isfinite(nb)
        denom = max(nb, 1e-6)
        assert float(jnp.linalg.norm(a - b)) / denom < 2e-3


def test_big_template_capacity_defaults():
    """Auto capacity must not silently exceed VMEM-feasible bounds and must
    cover the uniform share with the 4x margin for the big meshes."""
    for F in (1280, 5120, 13776):
        for n_cells in (4, 64):
            cap = default_capacity(F, n_cells)
            assert cap % 8 == 0
            assert cap >= min(F, 4 * F // n_cells)
