"""Keypoint-transfer PCK evaluation — reference-faithful math
(reference PCK/test_kp.py; the vendored UMR/CMR harness there is not
runnable — PCK/test_kp.py:19-22 imports a missing package — so the transfer
strategies are reimplemented here against OUR model outputs, SURVEY.md §2
row 'PCK eval').

Two source→target keypoint transfer strategies:
  * texture-flow transfer (reference test_kp.py:124-157): rasterize each
    source keypoint to a Gaussian heatmap (reference PCK/kp_utils.py:42-70),
    bilinear-sample it at every face's flow positions, argmax the face, and
    answer with that face's mean position under the target flow (itself read
    by bilinear-sampling an identity coordinate grid, test_kp.py:131-143);
  * camera+shape transfer (reference test_kp.py:159-192): keypoint → nearest
    projected mean-shape vertex in the source view → that vertex's nearest
    foreground pixel in the target view (two chamfer nearest-neighbor
    passes; no depth term — visibility comes through the target mask).

PCK scoring (reference test_kp.py:246-258, 313-323): errors are L2 in the
[-1,1] keypoint frame scaled by (1 + 2·padding_frac)/2 (the padded-bbox to
bbox-diameter conversion), thresholded at α ∈ {0.1, 0.15}, accumulated PER
KEYPOINT across all pairs and then averaged over keypoints.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..geometry import camera as cam
from ..ops.sampling import grid_sample


def draw_labelmap(img, pt, sigma):
    """Write an unnormalized Gaussian (center value 1) into ``img`` (H, W)
    at pixel ``pt`` = (x, y); window is ±3σ and REPLACES the region —
    replicates reference PCK/kp_utils.py:42-70 exactly (incl. int() window
    truncation)."""
    img = np.asarray(img, np.float32).copy()
    ul = [int(pt[0] - 3 * sigma), int(pt[1] - 3 * sigma)]
    br = [int(pt[0] + 3 * sigma + 1), int(pt[1] + 3 * sigma + 1)]
    if (ul[0] >= img.shape[1] or ul[1] >= img.shape[0]
            or br[0] < 0 or br[1] < 0):
        return img
    size = 6 * sigma + 1
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    x0 = y0 = size // 2
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
    g_x = max(0, -ul[0]), min(br[0], img.shape[1]) - ul[0]
    g_y = max(0, -ul[1]), min(br[1], img.shape[0]) - ul[1]
    img_x = max(0, ul[0]), min(br[0], img.shape[1])
    img_y = max(0, ul[1]), min(br[1], img.shape[0])
    img[img_y[0]:img_y[1], img_x[0]:img_x[1]] = g[g_y[0]:g_y[1],
                                                  g_x[0]:g_x[1]]
    return img


def _sgrid(H, W):
    """Identity coordinate grid (H, W, 2) of (x, y) in [-1,1] at pixel
    centers — torch ``affine_grid`` identity, align_corners=False (reference
    PCK/kp_utils.py:13-24; y = -1 at row 0)."""
    xs = (2.0 * np.arange(W) + 1.0) / W - 1.0
    ys = (2.0 * np.arange(H) + 1.0) / H - 1.0
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx, gy], -1).astype(np.float32)


def _flow_faces(flow):
    """Normalize a flow argument to (nf, T, 2): (H, W, 2) grids become
    H·W single-sample faces."""
    flow = np.asarray(flow, np.float32)
    if flow.ndim == 3 and flow.shape[-1] == 2 and flow.shape[0] != flow.shape[1]:
        return flow  # already (nf, T, 2)
    if flow.ndim == 3:
        return flow.reshape(-1, 1, 2)
    return flow.reshape(flow.shape[0], -1, 2)


def transfer_via_texture_flow(kps_src, flow_src, flow_tgt, image_size=256,
                              sigma=3):
    """kps_src: (K, 2) xy in [-1,1] (y down, row-0-top image frame);
    flow_*: (nf, T, 2) per-face image positions in [-1,1] (or an (H, W, 2)
    grid, treated as H·W one-sample faces).  Returns (K, 2) target xy.

    Reference math (test_kp.py:124-157): heatmap argmax over faces under the
    source flow, mean target-flow position of the winning face."""
    fs = _flow_faces(flow_src)
    ft = _flow_faces(flow_tgt)
    nf, T, _ = ft.shape
    H = W = int(image_size)

    # p2face: bilinear-sample the identity grid at the target flow, mean
    # over the face's samples (test_kp.py:131-143)
    sgrid = _sgrid(H, W)[None]                              # (1, H, W, 2)
    p2f = grid_sample(jnp.asarray(sgrid), jnp.asarray(ft[None]))
    p2face = np.asarray(p2f)[0].mean(axis=1)                # (nf, 2)

    # k2face: Gaussian heatmaps sampled at the source flow
    # (test_kp.py:144-155; kp -> pixel via (kp+1)/2 * size)
    kps = np.asarray(kps_src, np.float32)
    K = kps.shape[0]
    hp = np.zeros((K, H, W), np.float32)
    kp_pix = (kps + 1.0) / 2.0 * image_size
    for k in range(K):
        hp[k] = draw_labelmap(hp[k], (kp_pix[k, 0], kp_pix[k, 1]), sigma)
    resp = grid_sample(jnp.asarray(hp[..., None]),
                       jnp.asarray(np.broadcast_to(fs[None], (K, nf, T, 2))))
    k2face = np.asarray(resp)[..., 0].mean(axis=2)          # (K, nf)
    k2face_idx = k2face.argmax(axis=1)
    return p2face[k2face_idx]


def project_vertices(vertices, azimuths, elevations, distances, biases,
                     cam_proj):
    """Project (V, 3) vertices under one predicted camera → ((V, 2) NDC xy,
    (V,) camera z).  NDC is the model frame: +y up, row 0 = top."""
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


def transfer_via_camera(kps_src, verts, cam_src, cam_tgt, cam_proj,
                        mask_tgt=None):
    """cam_* = (azimuths, elevations, distances, biases) for one example;
    ``mask_tgt`` (H, W) foreground mask of the target image (row 0 = top).

    Reference math (test_kp.py:159-192): kp → nearest projected vertex in
    the source view; answer = that vertex's nearest foreground pixel in the
    target view.  Without a mask the vertex's target projection is returned
    directly (degenerate fg = every pixel).  All coordinates are in the
    model NDC frame (+y up)."""
    vi_s, _ = project_vertices(verts, *cam_src, cam_proj=cam_proj)
    vi_t, _ = project_vertices(verts, *cam_tgt, cam_proj=cam_proj)
    kps = np.asarray(kps_src)
    # kp2proj: nearest projected vertex per keypoint (source view)
    d2 = ((vi_s[None, :, :] - kps[:, None, :]) ** 2).sum(-1)
    kp2proj_idx = d2.argmin(axis=1)
    if mask_tgt is None:
        return vi_t[kp2proj_idx]
    # proj2fg: nearest target foreground pixel per projected vertex
    mask = np.asarray(mask_tgt)
    H, W = mask.shape
    sg = _sgrid(H, W)
    sg = np.stack([sg[..., 0], -sg[..., 1]], -1)  # model frame: +y up
    fg_coords = sg[mask > 0.5]                    # (P, 2)
    if fg_coords.shape[0] == 0:
        return vi_t[kp2proj_idx]
    d2v = ((vi_t[:, None, :] - fg_coords[None, :, :]) ** 2).sum(-1)
    proj2fg_idx = d2v.argmin(axis=1)
    return fg_coords[proj2fg_idx[kp2proj_idx]]


def pck_errors(pred_kps, gt_kps, padding_frac=0.0):
    """Normalized transfer errors (K,): L2 in the [-1,1] keypoint frame ×
    (1 + 2·padding_frac)/2 = err_img / max_bbox_dim
    (reference test_kp.py:246-258)."""
    err_scaling = (1.0 + 2.0 * padding_frac) / 2.0
    d = np.asarray(pred_kps, np.float64) - np.asarray(gt_kps, np.float64)
    return np.sqrt((d * d).sum(axis=-1)) * err_scaling


def pck_aggregate(errs, vis, alphas=(0.1, 0.15)):
    """errs/vis: (N, K) stacked over pairs.  Per-keypoint accuracy averaged
    over keypoints (reference test_kp.py:313-323)."""
    errs = np.asarray(errs, np.float64)
    vis = np.asarray(vis, np.float64)
    n_vis = vis.sum(axis=0)
    out = {}
    for a in alphas:
        correct = ((errs < a) * vis).sum(axis=0)
        valid = n_vis > 0
        out[a] = float((correct[valid] / n_vis[valid]).mean()) if valid.any() \
            else 0.0
    return out


def pck(pred_kps, gt_kps, visible, padding_frac=0.0, alphas=(0.1, 0.15)):
    """Single-pair PCK@α over visible keypoints (reference thresholds on the
    normalized error, test_kp.py:319-322)."""
    d = pck_errors(pred_kps, gt_kps, padding_frac)
    vis = np.asarray(visible, bool)
    out = {}
    for a in alphas:
        out[a] = float((d[vis] < a).mean()) if vis.sum() else 0.0
    return out
