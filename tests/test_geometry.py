"""Geometry layer tests: OBJ I/O round trips, topology precompute, and camera
math checked against the reference formulas (re-implemented in torch inside
the test as an independent oracle — reference smr_utils.py:257-311)."""
import os

import numpy as np
import pytest

from magicmirror.geometry import (
    Mesh,
    camera_position_from_spherical_angles,
    generate_transformation_matrix,
    load_obj,
    save_mesh,
)
from magicmirror.geometry import mesh as mesh_ops

TEMPLATE_DIR = os.path.join(os.path.dirname(__file__), "..", "template")


def test_load_sphere_obj_counts():
    m = load_obj(os.path.join(TEMPLATE_DIR, "sphere.obj"), with_materials=True)
    assert m.vertices.shape == (642, 3)
    assert m.faces.shape == (1280, 3)
    assert m.uvs.shape == (3840, 2)
    assert m.face_uvs_idx.shape == (1280, 3)
    assert m.faces.min() == 0 and m.faces.max() == 641


def test_load_smpl_obj():
    m = load_obj(os.path.join(TEMPLATE_DIR, "smpl_uv_642.obj"), with_materials=True)
    assert m.vertices.shape == (642, 3)
    assert m.faces.shape == (1280, 3)
    assert m.uvs.shape[0] == 941


def test_save_mesh_roundtrip(tmp_path):
    m = load_obj(os.path.join(TEMPLATE_DIR, "sphere.obj"))
    out = str(tmp_path / "roundtrip.obj")
    save_mesh(out, m.vertices, m.faces, m.uvs)
    m2 = load_obj(out)
    np.testing.assert_allclose(m.vertices, m2.vertices, atol=1e-6)
    np.testing.assert_array_equal(m.faces, m2.faces)
    np.testing.assert_allclose(m.uvs, m2.uvs, atol=1e-6)


def test_save_mesh_byte_format(tmp_path):
    """The writer must be byte-compatible with reference smr_utils.py:188-196."""
    v = np.array([[0.5, -1.25, 3.0]], dtype=np.float32)
    f = np.array([[0, 0, 0]], dtype=np.int32)
    vt = np.array([[0.25, 0.75]], dtype=np.float32)
    out = str(tmp_path / "fmt.obj")
    save_mesh(out, v, f, vt)
    text = open(out).read()
    assert text == (
        "v %f %f %f\n" % (0.5, -1.25, 3.0)
        + "vt %f %f\n" % (0.25, 0.75)
        + "f 1 1 1\n"
    )


def test_normalize_template_range():
    m = load_obj(os.path.join(TEMPLATE_DIR, "sphere.obj"))
    v = mesh_ops.normalize_template(m.vertices, init_ellipsoid=1.0)
    assert v[:, 0].min() == pytest.approx(-0.9, abs=1e-5)
    assert v[:, 0].max() == pytest.approx(0.9, abs=1e-5)
    # z squashed to half then 0.9
    assert v[:, 2].max() == pytest.approx(0.45, abs=1e-5)


def test_flip_index_is_involution_on_sphere():
    m = load_obj(os.path.join(TEMPLATE_DIR, "sphere.obj"))
    v = mesh_ops.normalize_template(m.vertices)
    fi = mesh_ops.flip_index(v)
    # flipping twice returns to start for a symmetric template
    assert (fi[fi] == np.arange(len(fi))).mean() > 0.99
    # flipped partner mirrors z
    np.testing.assert_allclose(v[fi][:, 2], -v[:, 2], atol=1e-3)


def test_edge2faces_sphere():
    m = load_obj(os.path.join(TEMPLATE_DIR, "sphere.obj"))
    edges, e2f = mesh_ops.edge2faces(m.faces)
    # closed icosphere: E = F * 3 / 2
    assert edges.shape == (1920, 2)
    assert e2f.shape == (1920, 2)
    # every edge's two faces both contain the edge's vertices
    f = m.faces
    for e in [0, 7, 500, 1919]:
        for s in range(2):
            face = f[e2f[e, s]]
            assert edges[e, 0] in face and edges[e, 1] in face
    # two incident faces differ on interior edges of a closed mesh
    assert (e2f[:, 0] != e2f[:, 1]).all()


def test_uniform_laplacian():
    faces = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    L = mesh_ops.uniform_laplacian(4, faces)
    # vertex 0 neighbors: 1, 2, 3 → deg 3
    np.testing.assert_allclose(L[0], [-1, 1 / 3, 1 / 3, 1 / 3], atol=1e-6)
    # vertex 1 neighbors: 0, 2 → deg 2
    np.testing.assert_allclose(L[1], [1 / 2, -1, 1 / 2, 0], atol=1e-6)
    # rows sum to zero
    np.testing.assert_allclose(L.sum(1), 0, atol=1e-6)


def test_camera_math_matches_reference_formulas():
    """Cross-check against the literal torch formulas of smr_utils.py:257-311."""
    import torch

    rs = np.random.RandomState(1)
    dist = rs.uniform(2, 7, 5).astype(np.float32)
    elev = rs.uniform(0, 30, 5).astype(np.float32)
    azim = rs.uniform(-180, 180, 5).astype(np.float32)
    look_at = rs.uniform(-0.3, 0.3, (5, 3)).astype(np.float32)
    up = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (5, 1))

    # torch oracle (independent re-statement of the reference formulas)
    import math as m
    td, te, ta = torch.tensor(dist), torch.tensor(elev), torch.tensor(azim)
    te_r, ta_r = m.pi / 180 * te, m.pi / 180 * ta
    tx = td * torch.cos(te_r) * torch.sin(ta_r)
    ty = td * torch.sin(te_r)
    tz = td * torch.cos(te_r) * torch.cos(ta_r)
    tpos = torch.stack([tx, ty, tz], dim=1)
    z_axis = tpos - torch.tensor(look_at)
    z_axis = z_axis / z_axis.norm(dim=1, keepdim=True)
    x_axis = torch.cross(torch.tensor(up), z_axis, dim=1)
    x_axis = x_axis / x_axis.norm(dim=1, keepdim=True)
    y_axis = torch.cross(z_axis, x_axis, dim=1)
    rot = torch.stack([x_axis, y_axis, z_axis], dim=2)
    trans = -tpos.unsqueeze(1) @ rot
    t_tf = torch.cat([rot, trans], dim=1)

    pos = camera_position_from_spherical_angles(dist, elev, azim)
    tf = generate_transformation_matrix(pos, look_at, up)

    np.testing.assert_allclose(np.asarray(pos), tpos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf), t_tf.numpy(), atol=1e-5)


def test_face_clocks():
    import jax.numpy as jnp

    # CCW triangle in xy plane
    v = jnp.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    f = np.array([[0, 1, 2]])
    clocks = mesh_ops.face_clocks(v, f)
    assert clocks.shape == (1, 1)
