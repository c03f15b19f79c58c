"""DIB-R–style soft rasterization, TPU-first.

Replaces kaolin's CUDA ``dibr_rasterization`` (called at reference
networks.py:297-299).  Same observable semantics:

  * hard pass: per pixel, the closest front-facing covering face wins the
    z-buffer; its attributes are barycentrically interpolated in image space;
  * soft pass: a differentiable silhouette where every front face contributes
    probability p = exp(-sigmainv * d^2) (d = image-space distance from the
    pixel to the triangle, 0 inside) aggregated as 1 - prod(1 - p).

Design for XLA/TPU instead of a CUDA translation:

  * Phase 1 streams over fixed-size face chunks with ``lax.scan`` carrying
    (best_z, best_idx, sum log(1-p)) per pixel — static shapes, no
    data-dependent control flow, rematerialized backward via ``jax.checkpoint``.
    Winner *selection* runs under stop_gradient (argmax is not differentiable).
  * Phase 2 re-gathers only the winning face per pixel and recomputes its
    barycentric weights differentiably — O(pixels), not O(pixels × faces),
    which is where hard-rasterization gradients come from (the DIB-R paper's
    analytic backward, expressed as plain autodiff on the gather).
  * The soft silhouette is exact over *all* faces (kaolin truncates to the 30
    nearest within a 0.02 box; with sigmainv=7000 the tail is < 1e-60, so the
    results agree) and its gradient reaches every face near the boundary.

A Pallas TPU kernel (magicmirror/ops/pallas/rasterize_tpu.py) accelerates
phase 1; this file is the reference/golden path and the phase-2 epilogue.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_DEN_EPS = 1e-10
_P_CLAMP = 1.0 - 1e-7


def _cross2(ux, uy, vx, vy):
    return ux * vy - uy * vx


def _segment_dist2(px, py, ax, ay, bx, by):
    """Squared distance from point p to segment ab (all (..., ) arrays)."""
    abx = bx - ax
    aby = by - ay
    apx = px - ax
    apy = py - ay
    t = (apx * abx + apy * aby) / (abx * abx + aby * aby + 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return dx * dx + dy * dy


def pixel_grid(height: int, width: int):
    """NDC pixel-center coordinates; row 0 is the image top (y = +1 side)."""
    ys = 1.0 - (2.0 * jnp.arange(height, dtype=jnp.float32) + 1.0) / height
    xs = (2.0 * jnp.arange(width, dtype=jnp.float32) + 1.0) / width - 1.0
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    return px.reshape(-1), py.reshape(-1)


def _face_pixel_terms(px, py, fvi, fz, fnz, sigmainv, soft_mode="exact"):
    """Per (pixel, face) quantities for one face chunk.

    px, py: (P,); fvi: (C, 3, 2); fz: (C, 3); fnz: (C,).
    Returns z_interp (P, C) with -inf where not covering, and log(1-p) (P, C).

    soft_mode:
      'exact' — d = min distance to the triangle's three edge SEGMENTS
                (kaolin DIB-R semantics);
      'line'  — d = max signed distance to the edge LINES, reusing the
                barycentric cross products (~40% fewer ops; only corner
                Voronoi regions differ, where d is underestimated by at most
                the corner angle factor — invisible at sigmainv=7000).
    """
    ax, ay = fvi[:, 0, 0], fvi[:, 0, 1]
    bx, by = fvi[:, 1, 0], fvi[:, 1, 1]
    cx, cy = fvi[:, 2, 0], fvi[:, 2, 1]
    p_x = px[:, None]
    p_y = py[:, None]

    den = _cross2(bx - ax, by - ay, cx - ax, cy - ay)[None, :]  # (1, C)
    safe_den = jnp.where(jnp.abs(den) > _DEN_EPS, den, 1.0)
    cross0 = _cross2(cx[None] - bx[None], cy[None] - by[None],
                     p_x - bx[None], p_y - by[None])
    cross1 = _cross2(ax[None] - cx[None], ay[None] - cy[None],
                     p_x - cx[None], p_y - cy[None])
    w0 = cross0 / safe_den
    w1 = cross1 / safe_den
    w2 = 1.0 - w0 - w1

    front = fnz[None, :] > 0.0
    nondegenerate = jnp.abs(den) > _DEN_EPS
    inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & nondegenerate & front

    z = w0 * fz[None, :, 0] + w1 * fz[None, :, 1] + w2 * fz[None, :, 2]
    z_sel = jnp.where(inside, z, -jnp.inf)

    if soft_mode == "line":
        def rlen(ux, uy, vx, vy):
            dx = vx - ux
            dy = vy - uy
            return jax.lax.rsqrt(dx * dx + dy * dy + 1e-12)

        cross2_ = den - cross0 - cross1
        sgn = jnp.where(den >= 0, 1.0, -1.0)  # CW-projected faces flip signs
        d_line = jnp.maximum(
            jnp.maximum(-sgn * cross0 * rlen(bx, by, cx, cy)[None],
                        -sgn * cross1 * rlen(cx, cy, ax, ay)[None]),
            -sgn * cross2_ * rlen(ax, ay, bx, by)[None])
        # line distance leaks along edge-line extensions — floor it with the
        # (axis-aligned) bbox distance, a lower bound on the true distance
        xs = fvi[:, :, 0]
        ys = fvi[:, :, 1]
        dbx = jnp.maximum(xs.min(1)[None] - p_x, p_x - xs.max(1)[None])
        dby = jnp.maximum(ys.min(1)[None] - p_y, p_y - ys.max(1)[None])
        d_line = jnp.maximum(d_line, jnp.maximum(dbx, dby))
        d2 = jnp.maximum(d_line, 0.0) ** 2
    else:
        d2e0 = _segment_dist2(p_x, p_y, ax[None], ay[None], bx[None], by[None])
        d2e1 = _segment_dist2(p_x, p_y, bx[None], by[None], cx[None], cy[None])
        d2e2 = _segment_dist2(p_x, p_y, cx[None], cy[None], ax[None], ay[None])
        d2 = jnp.minimum(jnp.minimum(d2e0, d2e1), d2e2)
    d2 = jnp.where(inside, 0.0, d2)
    p_soft = jnp.where(front, _P_CLAMP * jnp.exp(-d2 * sigmainv), 0.0)
    log1mp = jnp.log1p(-p_soft)
    return z_sel, log1mp


def _rasterize_phase1(px, py, face_vertices_image, face_vertices_z, face_normals_z,
                      sigmainv, chunk: int, soft_mode: str = "exact"):
    """Scan over face chunks → (best_idx (P,), sumlog (P,)) for ONE mesh.

    face arrays are padded to a multiple of ``chunk`` with backfacing faces.
    """
    F = face_vertices_image.shape[0]
    pad = (-F) % chunk
    if pad:
        face_vertices_image = jnp.concatenate(
            [face_vertices_image, jnp.zeros((pad, 3, 2), face_vertices_image.dtype)], 0)
        face_vertices_z = jnp.concatenate(
            [face_vertices_z, jnp.zeros((pad, 3), face_vertices_z.dtype)], 0)
        face_normals_z = jnp.concatenate(
            [face_normals_z, jnp.full((pad,), -1.0, face_normals_z.dtype)], 0)
    n_chunks = (F + pad) // chunk
    fvi = face_vertices_image.reshape(n_chunks, chunk, 3, 2)
    fz = face_vertices_z.reshape(n_chunks, chunk, 3)
    fnz = face_normals_z.reshape(n_chunks, chunk)

    P = px.shape[0]
    init = (
        jnp.full((P,), -jnp.inf, jnp.float32),
        jnp.full((P,), -1, jnp.int32),
        jnp.zeros((P,), jnp.float32),
    )

    @jax.checkpoint
    def body(carry, xs):
        best_z, best_idx, sumlog = carry
        fvi_c, fz_c, fnz_c, base = xs
        z_sel, log1mp = _face_pixel_terms(px, py, fvi_c, fz_c, fnz_c, sigmainv,
                                          soft_mode=soft_mode)
        # selection is not differentiable — phase 2 recomputes the winner's math
        z_sel_ng = jax.lax.stop_gradient(z_sel)
        chunk_best = jnp.argmax(z_sel_ng, axis=1)
        chunk_z = jnp.take_along_axis(z_sel_ng, chunk_best[:, None], axis=1)[:, 0]
        take = chunk_z > best_z
        best_z = jnp.where(take, chunk_z, best_z)
        best_idx = jnp.where(take, chunk_best.astype(jnp.int32) + base, best_idx)
        sumlog = sumlog + jnp.sum(log1mp, axis=1)
        return (best_z, best_idx, sumlog), None

    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    (best_z, best_idx, sumlog), _ = jax.lax.scan(body, init, (fvi, fz, fnz, bases))
    return best_idx, sumlog


def _interpolate_selected(px, py, best_idx, face_vertices_image, face_vertices_z,
                          face_features):
    """Differentiable phase 2 for ONE mesh: gather the winning face per pixel,
    recompute its barycentric weights, interpolate features.

    best_idx: (P,) int32; face_features: (F, 3, C).
    Returns (features (P, C), hard_mask (P,)).
    """
    safe = jnp.maximum(best_idx, 0)
    F = face_vertices_image.shape[0]
    C = face_features.shape[-1]
    # ONE gather of a packed (F, 3*(2+C)) table instead of several — gathers
    # are the TPU bottleneck of this phase
    packed = jnp.concatenate(
        [face_vertices_image.reshape(F, 6), face_features.reshape(F, 3 * C)],
        axis=1)
    g = packed[safe]  # (P, 6 + 3C)
    fv = g[:, :6].reshape(-1, 3, 2)
    feats = g[:, 6:].reshape(-1, 3, C)

    ax, ay = fv[:, 0, 0], fv[:, 0, 1]
    bx, by = fv[:, 1, 0], fv[:, 1, 1]
    cx, cy = fv[:, 2, 0], fv[:, 2, 1]
    den = _cross2(bx - ax, by - ay, cx - ax, cy - ay)
    den = jnp.where(jnp.abs(den) > _DEN_EPS, den, 1.0)
    w0 = _cross2(cx - bx, cy - by, px - bx, py - by) / den
    w1 = _cross2(ax - cx, ay - cy, px - cx, py - cy) / den
    w2 = 1.0 - w0 - w1
    w = jnp.stack([w0, w1, w2], axis=-1)
    # numerical safety at edges: clip into the simplex and renormalize
    w = jnp.clip(w, 0.0, 1.0)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-12)

    hard = (best_idx >= 0).astype(jnp.float32)
    out = jnp.einsum("pk,pkc->pc", w, feats) * hard[:, None]
    return out, hard


def _dibr_single(height, width, face_vertices_z, face_vertices_image, face_features,
                 face_normals_z, sigmainv=7000.0, chunk=256, soft_mode="exact"):
    px, py = pixel_grid(height, width)
    best_idx, sumlog = _rasterize_phase1(
        px, py, face_vertices_image, face_vertices_z, face_normals_z, sigmainv,
        chunk, soft_mode=soft_mode)
    feats, hard = _interpolate_selected(
        px, py, best_idx, face_vertices_image, face_vertices_z, face_features)
    soft = 1.0 - jnp.exp(sumlog)
    return feats, soft, hard, best_idx


def dibr_rasterization(height, width, face_vertices_z, face_vertices_image,
                       face_features, face_normals_z, sigmainv=7000.0,
                       chunk: int = 256, backend: str = "xla",
                       soft_mode: str = "exact"):
    """Batched soft rasterization; API mirrors kaolin ``dibr_rasterization``.

    Args:
      height, width: output image size (static).
      face_vertices_z: (B, F, 3) camera-space z per face vertex (more negative
        = farther; the camera looks down -z).
      face_vertices_image: (B, F, 3, 2) NDC xy per face vertex.
      face_features: a tensor (B, F, 3, C) or a list of such tensors (each its
        own channel count) to interpolate.
      face_normals_z: (B, F) camera-space normal z (faces with <= 0 culled).
      sigmainv: sharpness of the soft silhouette (kaolin default 7000).
      chunk: faces per scan step (static; trades peak memory for speed).
      backend: "xla" (this file) or "pallas" (TPU kernel phase 1).

    Returns:
      (image_features, soft_mask (B,H,W), face_idx (B,H,W) with -1 = none)
      where image_features matches the structure of ``face_features`` with
      shapes (B, H, W, C_i).
    """
    is_list = isinstance(face_features, (list, tuple))
    feats_list = list(face_features) if is_list else [face_features]
    splits = [f.shape[-1] for f in feats_list]
    feats = jnp.concatenate(feats_list, axis=-1)

    if backend == "pallas":
        from .pallas.rasterize_tpu import rasterize_phase1_pallas

        px, py = pixel_grid(height, width)
        # keep the (tile_pixels x chunk) working set inside the ~16MB VMEM:
        # tile ≈ 1024 px (band_rows rows of `width`) — ~20 live (tp, chunk)
        # fp32 temps must fit beside the banded face table
        band_rows = max(1, 1024 // width)
        while band_rows > 1 and height % band_rows:
            band_rows //= 2
        best_idx, sumlog = jax.vmap(
            lambda fvi, fz, fnz: rasterize_phase1_pallas(
                px, py, fvi, fz, fnz, sigmainv, width=width,
                band_rows=band_rows, soft_mode=soft_mode)
        )(face_vertices_image, face_vertices_z, face_normals_z)
        # per-image lax.map beats batched vmap gathers here (17.8 → 11.3 ms
        # at batch 32, 256²); it is a scan, so still fully differentiable
        out, hard = jax.lax.map(
            lambda args: _interpolate_selected(px, py, *args),
            (best_idx, face_vertices_image, face_vertices_z, feats))
        soft = 1.0 - jnp.exp(sumlog)
    else:
        out, soft, hard, best_idx = jax.vmap(
            lambda fz, fvi, ff, fnz: _dibr_single(
                height, width, fz, fvi, ff, fnz, sigmainv=sigmainv, chunk=chunk,
                soft_mode=soft_mode)
        )(face_vertices_z, face_vertices_image, feats, face_normals_z)

    B = feats.shape[0]
    out = out.reshape(B, height, width, -1)
    soft = soft.reshape(B, height, width)
    face_idx = best_idx.reshape(B, height, width)

    if is_list:
        outs = []
        start = 0
        for c in splits:
            outs.append(out[..., start:start + c])
            start += c
        return tuple(outs), soft, face_idx
    return out, soft, face_idx
