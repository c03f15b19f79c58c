"""Mesh topology precomputation (host-side NumPy, one-time setup).

Provides the jnp-framework equivalents of what the reference computes in
``DiffRender.__init__`` (reference networks.py:165-256): template
normalization + ellipsoid squash, vertex flip index, unique-edge table,
edge→face table for the flat loss, and the uniform graph Laplacian
(kaolin ``uniform_laplacian``), plus ``face_clocks`` signed areas
(reference smr_utils.py:20-53).
"""
from __future__ import annotations

import numpy as np


def normalize_template(vertices: np.ndarray, init_ellipsoid: float = 1.0) -> np.ndarray:
    """Normalize template vertices to [-1,1] and apply the ellipsoid squash +
    0.9 shrink, matching reference networks.py:181-194 exactly."""
    v = np.asarray(vertices, dtype=np.float32)
    v_max = v.max(axis=0, keepdims=True)
    v_min = v.min(axis=0, keepdims=True)
    v = (v - v_min) / (v_max - v_min)
    v = v * 2.0 - 1.0
    if init_ellipsoid != -1:
        v[:, 2] = v[:, 2] / 2.0  # depth = height/2; z differs from x axis
        if init_ellipsoid != 1:
            v[:, 0] = v[:, 0] / init_ellipsoid
            v[:, 2] = v[:, 2] / init_ellipsoid
    v *= 0.9  # scale a little small
    return v


def flip_index(vertices: np.ndarray) -> np.ndarray:
    """Index of each vertex's nearest z-mirrored partner (reference
    networks.py:214-217): argmin over pairwise distance to z-negated verts."""
    v = np.asarray(vertices, dtype=np.float32)
    v_flip = v.copy()
    v_flip[:, 2] *= -1
    d2 = ((v[:, None, :] - v_flip[None, :, :]) ** 2).sum(-1)
    return np.argmin(d2, axis=1).astype(np.int32)


def unique_edges(faces: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted unique undirected edges (E,2) and the inverse map (3F,) from the
    per-face edge list [v0v1, v1v2, v2v0] stacked per corner, matching the
    ordering the reference builds at networks.py:220-224."""
    faces = np.asarray(faces)
    f01 = faces[:, 0:2]
    f12 = faces[:, 1:3]
    f20 = faces[:, [2, 0]]
    edges = np.concatenate([f01, f12, f20], axis=0)
    edges = np.sort(edges, axis=1)
    uniq, inverse = np.unique(edges, axis=0, return_inverse=True)
    return uniq.astype(np.int32), inverse.astype(np.int64)


def edge2faces(faces: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(edges (E,2), edge2faces (E,2)) — for each unique edge, the (up to two)
    incident face ids, semantics of reference networks.py:219-246.

    For boundary edges with a single incident face, both slots hold that face
    (making the flat-loss cosine exactly 1 there — zero loss, as desired).
    """
    faces = np.asarray(faces)
    num_faces = faces.shape[0]
    uniq, inverse = unique_edges(faces)
    face_ids = np.tile(np.arange(num_faces, dtype=np.int64), 3)
    e2f = np.zeros((uniq.shape[0], 2), dtype=np.int64)
    slot = np.zeros(uniq.shape[0], dtype=np.int64)
    # stable fill: first occurrence → slot 0, second → slot 1
    order = np.argsort(inverse, kind="stable")
    for k in order:
        e = inverse[k]
        s = min(slot[e], 1)
        e2f[e, s] = face_ids[k]
        slot[e] += 1
    # boundary edges: duplicate the single face into slot 1
    boundary = slot == 1
    e2f[boundary, 1] = e2f[boundary, 0]
    return uniq, e2f.astype(np.int32)


def uniform_laplacian(num_vertices: int, faces: np.ndarray) -> np.ndarray:
    """Dense uniform graph Laplacian L (V,V): L[i,j] = 1/deg(i) for neighbors,
    L[i,i] = -1 (kaolin ``ops.mesh.uniform_laplacian`` semantics, used at
    reference networks.py:249).  Dense is fine at V=642..6890 and keeps the
    Laplacian usable as a single MXU matmul."""
    edges, _ = unique_edges(np.asarray(faces))
    adj = np.zeros((num_vertices, num_vertices), dtype=np.float32)
    adj[edges[:, 0], edges[:, 1]] = 1.0
    adj[edges[:, 1], edges[:, 0]] = 1.0
    deg = adj.sum(axis=1)
    L = adj / np.maximum(deg, 1.0)[:, None]
    L -= np.eye(num_vertices, dtype=np.float32)
    # isolated vertices: kaolin zeroes their rows
    L[deg == 0] = 0.0
    return L


def face_clocks(vertices, faces):
    """Signed (clockwise-ness) areas of projected faces, reference
    smr_utils.py:20-53.  vertices (B,V,3)/(B,V,2), faces (F,3) → (B,F)."""
    import jax.numpy as jnp

    fv = vertices[:, np.asarray(faces).reshape(-1), :]
    fv = fv.reshape(vertices.shape[0], -1, 3, vertices.shape[-1])
    d0 = fv[:, :, 0] - fv[:, :, 1]
    d1 = fv[:, :, 1] - fv[:, :, 2]
    x1, x2, x3 = d0[..., 0:1], d0[..., 1:2], d0[..., 2:3]
    y1, y2, y3 = d1[..., 0:1], d1[..., 1:2], d1[..., 2:3]
    clocks = 0.5 * ((x2 * y3 - x3 * y2) + (x3 * y1 - x1 * y3) + (x1 * y2 - x2 * y1))
    return jnp.squeeze(clocks, axis=-1)
