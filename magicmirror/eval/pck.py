"""Keypoint-transfer PCK evaluation (reference PCK/test_kp.py — the vendored
UMR/CMR harness is not runnable in the reference tree, PCK/test_kp.py:19-22
imports a missing package; here the two transfer strategies are reimplemented
against OUR model outputs, SURVEY.md §2 row 'PCK eval').

Two source→target keypoint transfer strategies:
  * texture-flow transfer (reference test_kp.py:124-157): invert the source
    texture flow at the keypoint to find its UV, read the target flow there;
  * camera+shape transfer (reference test_kp.py:159-192): nearest visible
    projected mesh vertex in the source view, re-projected in the target view.

PCK@α: fraction of transferred keypoints within α·max(H, W) of ground truth
(reference test_kp.py:313-323).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..geometry import camera as cam


def transfer_via_texture_flow(kps_src, flow_src, flow_tgt):
    """kps_src: (K, 2) xy in [-1,1]; flow_*: (H, W, 2) texture flows mapping
    UV-grid positions to image xy in [-1,1].  Returns (K, 2) target xy.

    For each keypoint, find the UV cell whose source-flow lands nearest the
    keypoint, then read the target flow at that UV cell."""
    H, W, _ = flow_src.shape
    fs = np.asarray(flow_src).reshape(-1, 2)
    ft = np.asarray(flow_tgt).reshape(-1, 2)
    kps = np.asarray(kps_src)
    d2 = ((fs[None, :, :] - kps[:, None, :]) ** 2).sum(-1)  # (K, HW)
    nearest = d2.argmin(axis=1)
    return ft[nearest]


def project_vertices(vertices, azimuths, elevations, distances, biases,
                     cam_proj):
    """Project (V, 3) vertices under one predicted camera → ((V, 2) NDC xy,
    (V,) camera z)."""
    B = np.asarray(azimuths).reshape(-1).shape[0]
    object_pos = jnp.concatenate(
        [jnp.asarray(biases).reshape(B, 2), jnp.zeros((B, 1))], axis=1)
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (B, 3))
    pos = cam.camera_position_from_spherical_angles(
        jnp.asarray(distances).reshape(B), jnp.asarray(elevations).reshape(B),
        jnp.asarray(azimuths).reshape(B))
    tf = cam.generate_transformation_matrix(pos, object_pos, up)
    vc = cam.transform_vertices(jnp.asarray(vertices)[None], tf)
    vi = cam.project_vertices(vc, cam_proj)
    return np.asarray(vi[0]), np.asarray(vc[0, :, 2])


def transfer_via_camera(kps_src, verts, cam_src, cam_tgt, cam_proj):
    """cam_* = (azimuths, elevations, distances, biases) for one example."""
    vi_s, z_s = project_vertices(verts, *cam_src, cam_proj=cam_proj)
    vi_t, _ = project_vertices(verts, *cam_tgt, cam_proj=cam_proj)
    # prefer visible (nearer) vertices: penalize depth in the matching cost
    kps = np.asarray(kps_src)
    d2 = ((vi_s[None, :, :] - kps[:, None, :]) ** 2).sum(-1)
    d2 = d2 + 1e-3 * (z_s.max() - z_s)[None, :]  # farther → worse match
    nearest = d2.argmin(axis=1)
    return vi_t[nearest]


def pck(pred_kps, gt_kps, visible, img_size, alphas=(0.1, 0.15)):
    """pred/gt: (K, 2) in [-1,1]; visible: (K,) bool; img_size: (H, W)."""
    H, W = img_size
    # distances in pixels: NDC spans 2 across each axis
    scale = np.array([W / 2.0, H / 2.0])
    d = np.linalg.norm((np.asarray(pred_kps) - np.asarray(gt_kps)) * scale,
                       axis=1)
    thresh_base = max(H, W)
    out = {}
    vis = np.asarray(visible, bool)
    for a in alphas:
        if vis.sum() == 0:
            out[a] = 0.0
        else:
            out[a] = float((d[vis] < a * thresh_base).mean())
    return out
