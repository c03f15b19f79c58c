"""Pallas TPU kernel for rasterization phase 1 (SURVEY.md §2.2: "THE hard
kernel" replacing kaolin's CUDA DIB-R rasterizer).

Computes, per pixel, the winning (closest front-facing covering) face id and
the soft-silhouette log-accumulator sum_f log(1-p_f) — the two O(pixels x
faces) reductions.  Phase 2 (differentiable barycentric interpolation of the
winner) stays in XLA (magicmirror/ops/rasterize.py).

Kernel design:
  * grid over pixel tiles (TP pixels per program); all face data for the mesh
    is packed into one (14, F) VMEM-resident array (~70 KB at F=1280 — far
    under the 16 MB VMEM budget, so faces load once per program);
  * the face loop runs in chunks of C=128 (one lane row per face) with a
    per-chunk tile-bbox cull: a chunk whose faces' (margin-expanded) bboxes
    all miss this tile's bbox skips its math entirely via jnp.where on a
    cheap test — with spatially-coherent face ordering this cuts most work;
  * the (TP, C) blocks map to (sublane, lane) VPU tiles; no MXU needed.

Gradient story: the hard winner needs no gradient (phase 2 re-derives it);
the soft sum gets a custom VJP whose backward recomputes through the XLA
scan implementation — forward throughput (the serving/bench path) is pure
Pallas, training backward reuses the already-validated autodiff path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed face-row layout (reciprocal edge lengths serve the 'line' soft mode)
(_AX, _AY, _BX, _BY, _CX, _CY, _Z0, _Z1, _Z2, _FNZ, _XMIN, _XMAX, _YMIN,
 _YMAX, _RL0, _RL1, _RL2) = range(17)
_NROWS = 17

_DEN_EPS = 1e-10
_P_CLAMP = 1.0 - 1e-7
# faces farther than this (NDC) from a pixel contribute p < exp(-7000*.035^2)
# ≈ 2e-4 at the default sigmainv=7000 — tighter than kaolin's boxlen=0.02
# candidate search, safe to cull
_SOFT_MARGIN = 0.035


def _pack_faces(fvi, fz, fnz, chunk: int):
    """(F,3,2)/(F,3)/(F,) → (_NROWS, F_pad) packed rows, F padded to
    ``chunk``.  Rows _RL* hold reciprocal edge lengths (for the 'line' soft
    mode) in the cross-product order: edge (b,c), (c,a), (a,b)."""
    F = fvi.shape[0]
    pad = (-F) % chunk
    if pad:
        fvi = jnp.concatenate([fvi, jnp.zeros((pad, 3, 2), fvi.dtype)], 0)
        fz = jnp.concatenate([fz, jnp.zeros((pad, 3), fz.dtype)], 0)
        fnz = jnp.concatenate([fnz, jnp.full((pad,), -1.0, fnz.dtype)], 0)
    xs = fvi[:, :, 0]
    ys = fvi[:, :, 1]

    def rlen(i, j):
        d = fvi[:, j] - fvi[:, i]
        return jax.lax.rsqrt(jnp.sum(d * d, axis=1) + 1e-12)

    rows = [fvi[:, 0, 0], fvi[:, 0, 1], fvi[:, 1, 0], fvi[:, 1, 1],
            fvi[:, 2, 0], fvi[:, 2, 1], fz[:, 0], fz[:, 1], fz[:, 2], fnz,
            xs.min(1), xs.max(1), ys.min(1), ys.max(1),
            rlen(1, 2), rlen(2, 0), rlen(0, 1)]
    return jnp.stack(rows, axis=0)


def _kernel(px_ref, py_ref, faces_ref, idx_ref, sumlog_ref, *, n_chunks,
            chunk, sigmainv):
    p_x = px_ref[:]  # (TP, 1) — pixels on sublanes, faces on lanes
    p_y = py_ref[:]
    TP = p_x.shape[0]

    tile_xmin = jnp.min(p_x) - _SOFT_MARGIN
    tile_xmax = jnp.max(p_x) + _SOFT_MARGIN
    tile_ymin = jnp.min(p_y) - _SOFT_MARGIN
    tile_ymax = jnp.max(p_y) + _SOFT_MARGIN

    def body(c, carry):
        best_z, best_idx, sumlog = carry
        f = faces_ref[:, pl.ds(c * chunk, chunk)]  # (14, C)
        # tile bbox is already margin-expanded; face bboxes are exact
        overlap = ((f[_XMIN] <= tile_xmax) & (f[_XMAX] >= tile_xmin)
                   & (f[_YMIN] <= tile_ymax) & (f[_YMAX] >= tile_ymin)
                   & (f[_FNZ] > 0.0))

        def compute(carry):
            best_z, best_idx, sumlog = carry
            ax, ay = f[_AX][None], f[_AY][None]  # (1, C)
            bx, by = f[_BX][None], f[_BY][None]
            cx, cy = f[_CX][None], f[_CY][None]
            den = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            safe_den = jnp.where(jnp.abs(den) > _DEN_EPS, den, 1.0)
            cross0 = (cx - bx) * (p_y - by) - (cy - by) * (p_x - bx)
            cross1 = (ax - cx) * (p_y - cy) - (ay - cy) * (p_x - cx)
            w0 = cross0 / safe_den
            w1 = cross1 / safe_den
            w2 = 1.0 - w0 - w1
            valid = overlap[None] & (jnp.abs(den) > _DEN_EPS)
            inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & valid
            z = w0 * f[_Z0][None] + w1 * f[_Z1][None] + w2 * f[_Z2][None]
            z = jnp.where(inside, z, -jnp.inf)  # (TP, C)

            cb = jnp.argmax(z, axis=1, keepdims=True)  # (TP, 1)
            cz = jnp.max(z, axis=1, keepdims=True)
            take = cz > best_z
            best_z = jnp.where(take, cz, best_z)
            best_idx = jnp.where(take, cb.astype(jnp.int32) + c * chunk,
                                 best_idx)

            def seg_d2(qx, qy, rx, ry):
                ex = rx - qx
                ey = ry - qy
                t = ((p_x - qx) * ex + (p_y - qy) * ey) / (ex * ex + ey * ey + 1e-12)
                t = jnp.clip(t, 0.0, 1.0)
                dx = p_x - qx - t * ex
                dy = p_y - qy - t * ey
                return dx * dx + dy * dy

            d2 = jnp.minimum(jnp.minimum(seg_d2(ax, ay, bx, by),
                                         seg_d2(bx, by, cx, cy)),
                             seg_d2(cx, cy, ax, ay))
            d2 = jnp.where(inside, 0.0, d2)
            p_soft = jnp.where(overlap[None],
                               _P_CLAMP * jnp.exp(-d2 * sigmainv), 0.0)
            sumlog = sumlog + jnp.sum(jnp.log1p(-p_soft), axis=1,
                                      keepdims=True)
            return best_z, best_idx, sumlog

        return jax.lax.cond(jnp.any(overlap), compute, lambda c_: c_,
                            (best_z, best_idx, sumlog))

    init = (jnp.full((TP, 1), -jnp.inf, jnp.float32),
            jnp.full((TP, 1), -1, jnp.int32),
            jnp.zeros((TP, 1), jnp.float32))
    best_z, best_idx, sumlog = jax.lax.fori_loop(0, n_chunks, body, init)
    idx_ref[:] = best_idx
    sumlog_ref[:] = sumlog


def _phase1_pallas_fwd_impl(px, py, faces_packed, *, tp, chunk, sigmainv,
                            interpret):
    P = px.shape[0]
    n_tiles = P // tp
    Fp = faces_packed.shape[1]
    n_chunks = Fp // chunk
    # pixels on the sublane axis: (P, 1) arrays, (tp, 1) blocks — last block
    # dim equals the array dim, sublane dim divisible by 8 (Mosaic tiling)
    px2 = px.reshape(P, 1)
    py2 = py.reshape(P, 1)

    kernel = functools.partial(_kernel, n_chunks=n_chunks, chunk=chunk,
                               sigmainv=sigmainv)
    best_idx, sumlog = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tp, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NROWS, Fp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tp, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
        ],
        interpret=interpret,
    )(px2, py2, faces_packed)
    return best_idx.reshape(P), sumlog.reshape(P)


# ---------------------------------------------------------------- banded path
# True culling: faces are binned into horizontal image bands (count-and-pad in
# XLA), one band per pixel tile; the kernel's face loop runs a *dynamic* trip
# count = ceil(band_count / chunk).  A per-chunk lax.cond cannot skip work on
# TPU (Mosaic predicates both branches) — a dynamic loop bound can.

_ID_ROW = _NROWS  # extra packed row: original face id (exact in f32 up to 2^24)


def _bin_faces(fvi, fz, fnz, n_bands: int, chunk: int, margin: float,
               capacity: int | None = None, extra_rows=None):
    """→ (banded (NB, _NROWS+1, K) f32, counts (NB,) i32).  K = F padded (or
    ``capacity`` when set — bands overflowing the capacity drop the excess
    faces, trading exactness for a STATIC kernel trip count); backfaces and
    degenerate faces are dropped at binning time (they contribute to neither
    the z-test nor the soft mask)."""
    F = fvi.shape[0]
    K = capacity if capacity is not None else F + ((-F) % chunk)
    ys = fvi[:, :, 1]
    ymin_f = ys.min(1) - margin
    ymax_f = ys.max(1) + margin
    # bands partition NDC y=[-1,1] top-down (row 0 = y=+1)
    edges = 1.0 - 2.0 * jnp.arange(n_bands + 1, dtype=jnp.float32) / n_bands
    band_top = edges[:-1][:, None]  # (NB, 1) upper y
    band_bot = edges[1:][:, None]
    alive = fnz > 0.0
    overlap = (ymax_f[None, :] >= band_bot) & (ymin_f[None, :] <= band_top) \
        & alive[None, :]  # (NB, F)
    counts = jnp.minimum(overlap.sum(axis=1), K).astype(jnp.int32)
    # count-and-pad: rank of each face within its band
    rank = jnp.cumsum(overlap, axis=1) - 1
    slot = jnp.where(overlap & (rank < K), rank, K)  # K = drop bucket
    ids = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None], (n_bands, F))
    lists = jnp.full((n_bands, K + 1), 0, jnp.int32)
    lists = jax.vmap(lambda l, s, i: l.at[s].set(i, mode="drop"))(
        lists, slot, ids)
    lists = lists[:, :K]  # (NB, K) face ids, garbage past counts[b]

    packed = _pack_faces(fvi, fz, fnz, chunk)  # (_NROWS, F_padded)
    packed = jnp.concatenate(
        [packed, jnp.arange(packed.shape[1], dtype=jnp.float32)[None]],
        axis=0)  # (_NROWS+1, F_padded)
    if extra_rows is not None:
        pad_f = packed.shape[1] - extra_rows.shape[1]
        if pad_f:
            extra_rows = jnp.concatenate(
                [extra_rows, jnp.zeros((extra_rows.shape[0], pad_f),
                                       extra_rows.dtype)], axis=1)
        packed = jnp.concatenate([packed, extra_rows], axis=0)
    banded = packed[:, lists]  # (_NROWS+1, NB, K) via fancy gather
    banded = jnp.transpose(banded, (1, 0, 2))  # (NB, _NROWS+1, K)
    # mask out the padding tail: mark entries past count as backfacing
    lane = jnp.broadcast_to(jnp.arange(K)[None], (n_bands, K))
    tail = lane >= counts[:, None]
    banded = banded.at[:, _FNZ, :].set(
        jnp.where(tail, -1.0, banded[:, _FNZ, :]))
    return banded, counts


def _banded_kernel(counts_ref, px_ref, py_ref, faces_ref, idx_ref, sumlog_ref,
                   *, chunk, sigmainv, soft_mode="exact"):
    b = pl.program_id(0)
    count = counts_ref[b]
    p_x = px_ref[:]  # (TP, 1)
    p_y = py_ref[:]
    TP = p_x.shape[0]

    def body(c, carry):
        best_z, best_idx, sumlog = carry
        f = faces_ref[0, :, pl.ds(c * chunk, chunk)]  # (_NROWS+1, C)
        ax, ay = f[_AX][None], f[_AY][None]
        bx, by = f[_BX][None], f[_BY][None]
        cx, cy = f[_CX][None], f[_CY][None]
        alive = f[_FNZ] > 0.0
        den = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        safe_den = jnp.where(jnp.abs(den) > _DEN_EPS, den, 1.0)
        cross0 = (cx - bx) * (p_y - by) - (cy - by) * (p_x - bx)
        cross1 = (ax - cx) * (p_y - cy) - (ay - cy) * (p_x - cx)
        w0 = cross0 / safe_den
        w1 = cross1 / safe_den
        w2 = 1.0 - w0 - w1
        valid = alive[None] & (jnp.abs(den) > _DEN_EPS)
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & valid
        z = w0 * f[_Z0][None] + w1 * f[_Z1][None] + w2 * f[_Z2][None]
        z = jnp.where(inside, z, -jnp.inf)

        cz = jnp.max(z, axis=1, keepdims=True)  # (TP, 1)
        onehot = (z == cz) & inside
        # first winner on ties: lowest lane via min over masked ids
        cid = jnp.min(jnp.where(onehot, f[_ID_ROW][None], jnp.inf), axis=1,
                      keepdims=True)
        take = cz > best_z
        best_z = jnp.where(take, cz, best_z)
        best_idx = jnp.where(take, cid, best_idx)

        if soft_mode == "line":
            crs2 = den - cross0 - cross1
            sgn = jnp.where(den >= 0, 1.0, -1.0)
            d_line = jnp.maximum(
                jnp.maximum(-sgn * cross0 * f[_RL0][None],
                            -sgn * cross1 * f[_RL1][None]),
                -sgn * crs2 * f[_RL2][None])
            dbx = jnp.maximum(f[_XMIN][None] - p_x, p_x - f[_XMAX][None])
            dby = jnp.maximum(f[_YMIN][None] - p_y, p_y - f[_YMAX][None])
            d_line = jnp.maximum(d_line, jnp.maximum(dbx, dby))
            d2 = jnp.maximum(d_line, 0.0) ** 2
        else:
            def seg_d2(qx, qy, rx, ry):
                ex = rx - qx
                ey = ry - qy
                t = ((p_x - qx) * ex + (p_y - qy) * ey) / (ex * ex + ey * ey + 1e-12)
                t = jnp.clip(t, 0.0, 1.0)
                dx = p_x - qx - t * ex
                dy = p_y - qy - t * ey
                return dx * dx + dy * dy

            d2 = jnp.minimum(jnp.minimum(seg_d2(ax, ay, bx, by),
                                         seg_d2(bx, by, cx, cy)),
                             seg_d2(cx, cy, ax, ay))
        d2 = jnp.where(inside, 0.0, d2)
        p_soft = jnp.where(alive[None], _P_CLAMP * jnp.exp(-d2 * sigmainv), 0.0)
        sumlog = sumlog + jnp.sum(jnp.log1p(-p_soft), axis=1, keepdims=True)
        return best_z, best_idx, sumlog

    init = (jnp.full((TP, 1), -jnp.inf, jnp.float32),
            jnp.full((TP, 1), jnp.inf, jnp.float32),
            jnp.zeros((TP, 1), jnp.float32))
    n_chunks = (count + chunk - 1) // chunk  # dynamic trip count
    best_z, best_idx, sumlog = jax.lax.fori_loop(0, n_chunks, body, init)
    covered = best_z > -jnp.inf
    idx_ref[:] = jnp.where(covered, best_idx, -1.0).astype(jnp.int32)
    sumlog_ref[:] = sumlog


def _phase1_banded_impl(px, py, fvi, fz, fnz, sigmainv, width, band_rows,
                        chunk, interpret, soft_mode="exact"):
    """px/py must be the full row-major H x W grid; one band per tile."""
    P = px.shape[0]
    H = P // width
    n_bands = H // band_rows
    tp = band_rows * width
    banded, counts = _bin_faces(fvi, fz, fnz, n_bands, chunk, _SOFT_MARGIN)
    K = banded.shape[2]
    px2 = px.reshape(P, 1)
    py2 = py.reshape(P, 1)

    kernel = functools.partial(_banded_kernel, chunk=chunk, sigmainv=sigmainv,
                               soft_mode=soft_mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec((tp, 1), lambda b, c_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 1), lambda b, c_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NROWS + 1, K), lambda b, c_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tp, 1), lambda b, c_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 1), lambda b, c_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    best_idx, sumlog = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
        ],
        interpret=interpret,
    )(counts, px2, py2, banded)
    return best_idx.reshape(P), sumlog.reshape(P)


def _image_kernel(counts_ref, faces_ref, idx_ref, sumlog_ref, *, chunk,
                  sigmainv, n_bands, band_rows, height, width,
                  static_chunks=None, soft_mode="exact"):
    """v3: ONE program rasterizes the whole image, looping bands internally —
    amortizes per-program overhead.  With ``static_chunks`` (capacity-capped
    bins) every loop bound is static: a dynamic while-loop costs ~20us of
    pipeline flush PER BAND on TPU, which dominated the v2/v3-dynamic
    kernels; the static variant trades a bounded face-capacity per band for
    straight-line pipelining."""
    tp = band_rows * width

    def band_body(b, _):
        count = counts_ref[b]
        # pixel coords of this band from iota (no pixel inputs at all)
        r = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
        flat = b * tp + r
        row = flat // width
        col = flat - row * width
        p_x = (2.0 * col.astype(jnp.float32) + 1.0) / width - 1.0
        p_y = 1.0 - (2.0 * row.astype(jnp.float32) + 1.0) / height

        def body(c, carry):
            best_z, best_idx, sumlog = carry
            f = faces_ref[b, :, pl.ds(c * chunk, chunk)]  # (_NROWS+1, C)
            ax, ay = f[_AX][None], f[_AY][None]
            bx, by = f[_BX][None], f[_BY][None]
            cx, cy = f[_CX][None], f[_CY][None]
            alive = f[_FNZ] > 0.0
            den = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            safe_den = jnp.where(jnp.abs(den) > _DEN_EPS, den, 1.0)
            cross0 = (cx - bx) * (p_y - by) - (cy - by) * (p_x - bx)
            cross1 = (ax - cx) * (p_y - cy) - (ay - cy) * (p_x - cx)
            w0 = cross0 / safe_den
            w1 = cross1 / safe_den
            w2 = 1.0 - w0 - w1
            valid = alive[None] & (jnp.abs(den) > _DEN_EPS)
            inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & valid
            z = w0 * f[_Z0][None] + w1 * f[_Z1][None] + w2 * f[_Z2][None]
            z = jnp.where(inside, z, -jnp.inf)
            cz = jnp.max(z, axis=1, keepdims=True)
            onehot = (z == cz) & inside
            cid = jnp.min(jnp.where(onehot, f[_ID_ROW][None], jnp.inf),
                          axis=1, keepdims=True)
            take = cz > best_z
            best_z = jnp.where(take, cz, best_z)
            best_idx = jnp.where(take, cid, best_idx)

            if soft_mode == "line":
                crs2 = den - cross0 - cross1
                sgn = jnp.where(den >= 0, 1.0, -1.0)
                d_line = jnp.maximum(
                    jnp.maximum(-sgn * cross0 * f[_RL0][None],
                                -sgn * cross1 * f[_RL1][None]),
                    -sgn * crs2 * f[_RL2][None])
                # floor with the bbox distance (line dist leaks along
                # edge extensions)
                dbx = jnp.maximum(f[_XMIN][None] - p_x, p_x - f[_XMAX][None])
                dby = jnp.maximum(f[_YMIN][None] - p_y, p_y - f[_YMAX][None])
                d_line = jnp.maximum(d_line, jnp.maximum(dbx, dby))
                d2 = jnp.maximum(d_line, 0.0) ** 2
            else:
                def seg_d2(qx, qy, rx, ry):
                    ex = rx - qx
                    ey = ry - qy
                    t = ((p_x - qx) * ex + (p_y - qy) * ey) / (
                        ex * ex + ey * ey + 1e-12)
                    t = jnp.clip(t, 0.0, 1.0)
                    dx = p_x - qx - t * ex
                    dy = p_y - qy - t * ey
                    return dx * dx + dy * dy

                d2 = jnp.minimum(jnp.minimum(seg_d2(ax, ay, bx, by),
                                             seg_d2(bx, by, cx, cy)),
                                 seg_d2(cx, cy, ax, ay))
            d2 = jnp.where(inside, 0.0, d2)
            p_soft = jnp.where(alive[None],
                               _P_CLAMP * jnp.exp(-d2 * sigmainv), 0.0)
            sumlog = sumlog + jnp.sum(jnp.log1p(-p_soft), axis=1,
                                      keepdims=True)
            return best_z, best_idx, sumlog

        init = (jnp.full((tp, 1), -jnp.inf, jnp.float32),
                jnp.full((tp, 1), jnp.inf, jnp.float32),
                jnp.zeros((tp, 1), jnp.float32))
        if static_chunks is not None:
            # STATIC bound (trace-time constant): no dynamic-loop pipeline
            # flush, and fori_loop (vs Python unrolling) keeps one body's
            # worth of live VMEM temps
            best_z, best_idx, sumlog = jax.lax.fori_loop(
                0, static_chunks, body, init)
        else:
            n_chunks = (count + chunk - 1) // chunk
            best_z, best_idx, sumlog = jax.lax.fori_loop(0, n_chunks, body,
                                                         init)
        covered = best_z > -jnp.inf
        idx_ref[pl.ds(b * tp, tp), :] = jnp.where(
            covered, best_idx, -1.0).astype(jnp.int32)
        sumlog_ref[pl.ds(b * tp, tp), :] = sumlog
        return 0

    jax.lax.fori_loop(0, n_bands, band_body, 0)


# whole-image kernel is viable while the per-band face table fits VMEM
_IMAGE_KERNEL_VMEM_BUDGET = 6 * 1024 * 1024


def _band_capacity(F_padded: int, n_bands: int, chunk: int) -> int:
    """Static per-band face capacity: generous (12x the uniform share — far
    above the worst density we measure for close/far cameras), overridable
    via MAGICMIRROR_BAND_CAPACITY, clamped to [chunk, F]."""
    import os as _os

    env = _os.environ.get("MAGICMIRROR_BAND_CAPACITY")
    if env:
        cap = int(env)
    else:
        cap = 12 * F_padded // n_bands
    cap = -(-cap // chunk) * chunk
    return max(chunk, min(cap, F_padded))


def _phase1_image_impl(fvi, fz, fnz, sigmainv, height, width, band_rows,
                       chunk, interpret, soft_mode="exact"):
    P = height * width
    n_bands = height // band_rows
    F_padded = fvi.shape[0] + ((-fvi.shape[0]) % chunk)
    capacity = _band_capacity(F_padded, n_bands, chunk)
    banded, counts = _bin_faces(fvi, fz, fnz, n_bands, chunk, _SOFT_MARGIN,
                                capacity=capacity)
    K = banded.shape[2]

    kernel = functools.partial(_image_kernel, chunk=chunk, sigmainv=sigmainv,
                               n_bands=n_bands, band_rows=band_rows,
                               height=height, width=width,
                               static_chunks=K // chunk, soft_mode=soft_mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_bands, _NROWS + 1, K), lambda g, c_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((P, 1), lambda g, c_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda g, c_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    best_idx, sumlog = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
        ],
        interpret=interpret,
    )(counts, banded)
    return best_idx.reshape(P), sumlog.reshape(P)


def _sumlog_xla(px, py, fvi, fz, fnz, sigmainv, soft_mode="exact"):
    """Reference soft-accumulator used for the backward pass (matches the
    scan implementation in ops/rasterize.py)."""
    from ..rasterize import _rasterize_phase1

    _, sumlog = _rasterize_phase1(px, py, fvi, fz, fnz, sigmainv, chunk=256,
                                  soft_mode=soft_mode)
    return sumlog


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _phase1(px, py, fvi, fz, fnz, sigmainv, tp, chunk, interpret, width,
            band_rows, soft_mode):
    if width is not None:
        height = px.shape[0] // width
        n_bands = height // band_rows
        F_padded = fvi.shape[0] + ((-fvi.shape[0]) % chunk)
        K = _band_capacity(F_padded, n_bands, chunk)
        if n_bands * (_NROWS + 1) * K * 4 <= _IMAGE_KERNEL_VMEM_BUDGET:
            # v3: whole image in one program (amortized launch overhead)
            return _phase1_image_impl(fvi, fz, fnz, sigmainv, height, width,
                                      band_rows, chunk, interpret,
                                      soft_mode=soft_mode)
        # v2: one pixel band per grid step, dynamic face-loop bounds
        return _phase1_banded_impl(px, py, fvi, fz, fnz, sigmainv, width,
                                   band_rows, chunk, interpret,
                                   soft_mode=soft_mode)
    # fallback: y-sorted faces + per-chunk bbox test (static trip count)
    ymin = jnp.min(fvi[:, :, 1], axis=1)
    order = jnp.argsort(ymin)
    faces_packed = _pack_faces(fvi[order], fz[order], fnz[order], chunk)
    best_sorted, sumlog = _phase1_pallas_fwd_impl(
        px, py, faces_packed, tp=tp, chunk=chunk, sigmainv=sigmainv,
        interpret=interpret)
    best_idx = jnp.where(best_sorted >= 0,
                         order[jnp.maximum(best_sorted, 0)].astype(jnp.int32),
                         -1)
    return best_idx, sumlog


def _phase1_fwd(px, py, fvi, fz, fnz, sigmainv, tp, chunk, interpret, width,
                band_rows, soft_mode):
    out = _phase1(px, py, fvi, fz, fnz, sigmainv, tp, chunk, interpret,
                  width, band_rows, soft_mode)
    return out, (px, py, fvi, fz, fnz)


def _phase1_bwd(sigmainv, tp, chunk, interpret, width, band_rows, soft_mode,
                res, cots):
    px, py, fvi, fz, fnz = res
    _, g_sumlog = cots
    # best_idx is integer (no cotangent); route the sumlog cotangent through
    # the XLA implementation's autodiff (forward values match to ~1e-6)
    _, vjp_fn = jax.vjp(
        lambda v: _sumlog_xla(px, py, v, fz, fnz, sigmainv, soft_mode), fvi)
    (g_fvi,) = vjp_fn(g_sumlog)
    return (None, None, g_fvi, jnp.zeros_like(fz), jnp.zeros_like(fnz))


_phase1.defvjp(_phase1_fwd, _phase1_bwd)


def rasterize_phase1_pallas(px, py, fvi, fz, fnz, sigmainv=7000.0,
                            tile_pixels: int = 1024, chunk: int = 128,
                            interpret: bool | None = None,
                            width: int | None = None, band_rows: int = 8,
                            soft_mode: str = "exact"):
    """Phase-1 rasterization for ONE mesh (vmap over batch at the call site).

    px, py: (P,) NDC pixel centers (the caller's H*W row-major grid).
    When ``width`` is given and the image divides into ``band_rows`` bands,
    the banded (face-binning, dynamic-trip-count) kernel runs — the fast
    path; otherwise the static chunk-loop kernel.
    Returns (best_idx (P,) int32, sumlog (P,)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = px.shape[0]
    use_banded = (width is not None and P % width == 0
                  and (P // width) % band_rows == 0)
    if use_banded:
        return _phase1(px, py, fvi, fz, fnz, float(sigmainv), tile_pixels,
                       chunk, interpret, width, band_rows, soft_mode)
    pad = (-P) % tile_pixels
    if pad:
        px = jnp.concatenate([px, jnp.full((pad,), 2.0, px.dtype)])
        py = jnp.concatenate([py, jnp.full((pad,), 2.0, py.dtype)])
    best_idx, sumlog = _phase1(px, py, fvi, fz, fnz, float(sigmainv),
                               tile_pixels, chunk, interpret, None, band_rows,
                               soft_mode)
    return best_idx[:P], sumlog[:P]


# --------------------------------------------------- fused standard pipeline
# The renderer's standard attributes (mask=coverage, uv, face normal) can be
# selected for the winning face INSIDE the kernel — the winner's barycentrics
# are live at z-test time — which removes the separate phase-2 gather pass.
# Extra packed rows after the id row: u0,u1,u2, v0,v1,v2, nx,ny,nz.
_FUSED_BASE = _NROWS + 1
(_UA, _UB, _UC, _VA, _VB, _VC, _NXR, _NYR, _NZR) = range(
    _FUSED_BASE, _FUSED_BASE + 9)
_FUSED_ROWS = _FUSED_BASE + 9


def _image_kernel_fused(counts_ref, faces_ref, out_ref, *, chunk, sigmainv,
                        n_bands, band_rows, height, width, static_chunks,
                        soft_mode):
    # single packed (P, 8) output: a (P,1) VMEM window pads its lane dim to
    # 128 (33.5 MB each at 256²!) — packing the 7 logical outputs into one
    # 8-lane buffer keeps the whole output at one window's footprint.
    # columns: 0=winner id (f32), 1=sumlog, 2=u, 3=v, 4..6=normal, 7=pad
    tp = band_rows * width

    def band_body(b, _):
        r = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
        flat = b * tp + r
        row = flat // width
        col = flat - row * width
        p_x = (2.0 * col.astype(jnp.float32) + 1.0) / width - 1.0
        p_y = 1.0 - (2.0 * row.astype(jnp.float32) + 1.0) / height

        def body(c, carry):
            best_z, best_idx, sumlog, bu, bv, bnx, bny, bnz = carry
            f = faces_ref[b, :, pl.ds(c * chunk, chunk)]  # (_FUSED_ROWS, C)
            ax, ay = f[_AX][None], f[_AY][None]
            bx, by = f[_BX][None], f[_BY][None]
            cx, cy = f[_CX][None], f[_CY][None]
            alive = f[_FNZ] > 0.0
            den = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            safe_den = jnp.where(jnp.abs(den) > _DEN_EPS, den, 1.0)
            cross0 = (cx - bx) * (p_y - by) - (cy - by) * (p_x - bx)
            cross1 = (ax - cx) * (p_y - cy) - (ay - cy) * (p_x - cx)
            w0 = cross0 / safe_den
            w1 = cross1 / safe_den
            w2 = 1.0 - w0 - w1
            valid = alive[None] & (jnp.abs(den) > _DEN_EPS)
            inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & valid
            z = w0 * f[_Z0][None] + w1 * f[_Z1][None] + w2 * f[_Z2][None]
            z = jnp.where(inside, z, -jnp.inf)
            cz = jnp.max(z, axis=1, keepdims=True)
            onehot = (z == cz) & inside
            cid = jnp.min(jnp.where(onehot, f[_ID_ROW][None], jnp.inf),
                          axis=1, keepdims=True)
            sel = onehot & (f[_ID_ROW][None] == cid)
            u_px = w0 * f[_UA][None] + w1 * f[_UB][None] + w2 * f[_UC][None]
            v_px = w0 * f[_VA][None] + w1 * f[_VB][None] + w2 * f[_VC][None]
            cu = jnp.sum(jnp.where(sel, u_px, 0.0), axis=1, keepdims=True)
            cv = jnp.sum(jnp.where(sel, v_px, 0.0), axis=1, keepdims=True)
            cnx = jnp.sum(jnp.where(sel, f[_NXR][None], 0.0), axis=1,
                          keepdims=True)
            cny = jnp.sum(jnp.where(sel, f[_NYR][None], 0.0), axis=1,
                          keepdims=True)
            cnz = jnp.sum(jnp.where(sel, f[_NZR][None], 0.0), axis=1,
                          keepdims=True)
            take = cz > best_z
            best_z = jnp.where(take, cz, best_z)
            best_idx = jnp.where(take, cid, best_idx)
            bu = jnp.where(take, cu, bu)
            bv = jnp.where(take, cv, bv)
            bnx = jnp.where(take, cnx, bnx)
            bny = jnp.where(take, cny, bny)
            bnz = jnp.where(take, cnz, bnz)

            if soft_mode == "line":
                crs2 = den - cross0 - cross1
                sgn = jnp.where(den >= 0, 1.0, -1.0)
                d_line = jnp.maximum(
                    jnp.maximum(-sgn * cross0 * f[_RL0][None],
                                -sgn * cross1 * f[_RL1][None]),
                    -sgn * crs2 * f[_RL2][None])
                dbx = jnp.maximum(f[_XMIN][None] - p_x, p_x - f[_XMAX][None])
                dby = jnp.maximum(f[_YMIN][None] - p_y, p_y - f[_YMAX][None])
                d_line = jnp.maximum(d_line, jnp.maximum(dbx, dby))
                d2 = jnp.maximum(d_line, 0.0) ** 2
            else:
                def seg_d2(qx, qy, rx, ry):
                    ex = rx - qx
                    ey = ry - qy
                    t = ((p_x - qx) * ex + (p_y - qy) * ey) / (
                        ex * ex + ey * ey + 1e-12)
                    t = jnp.clip(t, 0.0, 1.0)
                    dx = p_x - qx - t * ex
                    dy = p_y - qy - t * ey
                    return dx * dx + dy * dy

                d2 = jnp.minimum(jnp.minimum(seg_d2(ax, ay, bx, by),
                                             seg_d2(bx, by, cx, cy)),
                                 seg_d2(cx, cy, ax, ay))
            d2 = jnp.where(inside, 0.0, d2)
            p_soft = jnp.where(alive[None],
                               _P_CLAMP * jnp.exp(-d2 * sigmainv), 0.0)
            sumlog = sumlog + jnp.sum(jnp.log1p(-p_soft), axis=1,
                                      keepdims=True)
            return (best_z, best_idx, sumlog, bu, bv, bnx, bny, bnz)

        zeros = jnp.zeros((tp, 1), jnp.float32)
        init = (jnp.full((tp, 1), -jnp.inf, jnp.float32),
                jnp.full((tp, 1), jnp.inf, jnp.float32), zeros,
                zeros, zeros, zeros, zeros, zeros)
        best_z, best_idx, sumlog, bu, bv, bnx, bny, bnz = jax.lax.fori_loop(
            0, static_chunks, body, init)
        covered = best_z > -jnp.inf
        sl = pl.ds(b * tp, tp)
        idx_f = jnp.where(covered, best_idx, -1.0)
        # Mosaic can't concat/store 1-lane strips; select columns of a
        # (tp, 8) block against a lane iota instead (pure vector ops)
        col = jax.lax.broadcasted_iota(jnp.int32, (tp, 8), 1)
        packed = jnp.zeros((tp, 8), jnp.float32)
        for i, val in enumerate([idx_f, sumlog, bu, bv, bnx, bny, bnz]):
            packed = jnp.where(col == i, val, packed)
        out_ref[sl, :] = packed
        return 0

    jax.lax.fori_loop(0, n_bands, band_body, 0)


def _fused_impl(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height,
                width, band_rows, chunk, interpret, soft_mode):
    P = height * width
    n_bands = height // band_rows
    F = fvi.shape[0]
    F_padded = F + ((-F) % chunk)
    capacity = _band_capacity(F_padded, n_bands, chunk)
    extra = jnp.stack([
        face_uvs[:, 0, 0], face_uvs[:, 1, 0], face_uvs[:, 2, 0],
        face_uvs[:, 0, 1], face_uvs[:, 1, 1], face_uvs[:, 2, 1],
        face_normals[:, 0], face_normals[:, 1], face_normals[:, 2]], axis=0)
    banded, counts = _bin_faces(fvi, fz, fnz, n_bands, chunk, _SOFT_MARGIN,
                                capacity=capacity, extra_rows=extra)
    K = banded.shape[2]
    kernel = functools.partial(
        _image_kernel_fused, chunk=chunk, sigmainv=sigmainv, n_bands=n_bands,
        band_rows=band_rows, height=height, width=width,
        static_chunks=K // chunk, soft_mode=soft_mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_bands, _FUSED_ROWS, K), lambda g, c_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, 8), lambda g, c_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.float32),
        interpret=interpret,
    )(counts, banded)
    idx = out[:, 0].astype(jnp.int32)
    return (idx, out[:, 1], out[:, 2], out[:, 3], out[:, 4], out[:, 5],
            out[:, 6])


def rasterize_standard_pallas(fvi, fz, fnz, face_uvs, face_normals,
                              sigmainv=7000.0, height=256, width=256,
                              band_rows=None, chunk=128,
                              interpret=None, soft_mode="line"):
    """Fused standard rasterization for ONE mesh: returns
    (face_idx (P,), soft (P,), uv (P,2), normal (P,3), hard (P,)).

    Forward is one Pallas kernel (phase-1 + winner attribute selection);
    backward routes attribute cotangents through the differentiable XLA
    phase-2 recompute at the saved winner indices, and the soft cotangent
    through the scan implementation — same gradient semantics as the
    two-phase path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if band_rows is None:
        band_rows = max(1, 1024 // width)
        while band_rows > 1 and height % band_rows:
            band_rows //= 2
    return _fused_vjp(fvi, fz, fnz, face_uvs, face_normals,
                      float(sigmainv), int(height), int(width),
                      int(band_rows), int(chunk), bool(interpret), soft_mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _fused_vjp(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height, width,
               band_rows, chunk, interpret, soft_mode):
    idx, sumlog, u, v, nx, ny, nz = _fused_impl(
        fvi, fz, fnz, face_uvs, face_normals, sigmainv, height, width,
        band_rows, chunk, interpret, soft_mode)
    soft = 1.0 - jnp.exp(sumlog)
    uv = jnp.stack([u, v], axis=-1)
    normal = jnp.stack([nx, ny, nz], axis=-1)
    hard = (idx >= 0).astype(jnp.float32)
    return idx, soft, uv, normal, hard


def _fused_fwd(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height, width,
               band_rows, chunk, interpret, soft_mode):
    out = _fused_vjp(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height,
                     width, band_rows, chunk, interpret, soft_mode)
    idx, soft = out[0], out[1]
    return out, (fvi, fz, fnz, face_uvs, face_normals, idx, soft)


def _fused_bwd(sigmainv, height, width, band_rows, chunk, interpret,
               soft_mode, res, cots):
    from ..rasterize import _interpolate_selected, pixel_grid

    fvi, fz, fnz, face_uvs, face_normals, idx, soft = res
    _, g_soft, g_uv, g_normal, _ = cots
    px, py = pixel_grid(height, width)

    # attribute cotangents through the differentiable phase-2 recompute
    def attrs(fvi_, uvs_, normals_):
        F = fvi_.shape[0]
        feats = jnp.concatenate(
            [uvs_, jnp.broadcast_to(normals_[:, None, :], (F, 3, 3))], axis=-1)
        out, _ = _interpolate_selected(px, py, idx, fvi_, fz, feats)
        return out[:, :2], out[:, 2:5]

    _, vjp_attrs = jax.vjp(attrs, fvi, face_uvs, face_normals)
    g_fvi_a, g_uvs, g_normals = vjp_attrs((g_uv, g_normal))

    # soft cotangent through the scan implementation:
    # soft = 1 - exp(sumlog) ⇒ d soft / d sumlog = soft - 1
    g_sumlog = g_soft * (soft - 1.0)
    _, vjp_soft = jax.vjp(
        lambda v: _sumlog_xla(px, py, v, fz, fnz, sigmainv, soft_mode), fvi)
    (g_fvi_s,) = vjp_soft(g_sumlog)

    return (g_fvi_a + g_fvi_s, jnp.zeros_like(fz), jnp.zeros_like(fnz),
            g_uvs, g_normals)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)
