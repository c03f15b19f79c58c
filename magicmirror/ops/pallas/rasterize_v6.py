"""v6 — flat interval-stream rasterization for DENSE templates.

The v4/v5 banded layout materializes a rectangular (n_cells, capacity, R)
face-row array.  Dense meshes break that rectangle: at the FAR end of the
reference camera range (dist 7, reference train.py:125-127) the whole
template shrinks into a handful of 8x128-pixel cells, so one cell holds an
F-fraction of all faces (measured 0.27F for SMPL-13776 at 256², 0.34F for
THuman 256x128 — benchmarks/probe_cell_density.py) while the batch's CLOSE
cameras need many cells.  A per-cell capacity that covers both is
0.3-0.4F x n_cells slots — 190 MB of VMEM at SMPL/256² (the row tiles pad
R=26 lanes to 128), far past the 128 MB physical VMEM, and its banded
gather would dominate the frame anyway.  The reference's CUDA rasterizer
(kaolin dibr, reference networks.py:297-299) never faces this because it
bins into DYNAMIC per-tile lists; XLA/Mosaic need static shapes.

v6 drops the gather entirely:

  * The kernel reads the per-face row table FLAT, in original face order
    (one (F8, R) VMEM block — 7 MB at SMPL — instead of banded copies).
  * The stream entries are (cell, 8-face block) pairs: every aligned
    8-row block of the table that contains >= 1 face overlapping the
    cell.  The bitmap comes straight from the existing `_overlap_cells`
    predicate reduced 8:1 — no per-(cell, face) compaction, no capacity
    rectangle; a single batched sort per image compacts the bitmap into
    the live-first stream.
  * Block slop (faces sharing an 8-block with a candidate but not
    themselves overlapping the cell) is masked IN-KERNEL with the exact
    `_overlap_cells` arithmetic, so the computed soft/z/attribute values
    match v5's binning semantics face-for-face (idx/uv/normal/hard are
    bitwise; the soft product only reorders its commutative factor
    sequence).  Mesh face order is spatially coherent for real templates,
    so touched blocks ~= overlap pairs / 8 plus a small boundary term.
  * The backward walks the same table transposed — (R, F128) — with
    128-face blocks, and ACCUMULATES moments straight into a per-face
    (16, F128) output: the per-cell G scatter-add of the banded backward
    (serial on TPU) disappears.

Capacity is TOTAL (stream entries per image), not per-cell: overflow is
counted in `dropped` (units: 8-face blocks) and sized by
benchmarks/probe_cell_density.py over the adversarial camera sweeps.

Semantics target: kaolin dibr_rasterization as called at reference
networks.py:297-299; parity pinned against the v5/golden paths in
tests/test_rasterize_v6.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_v4 import (  # row layout + shared glue
    A0X, A0Y, A0C, A1X, A1Y, A1C, A2X, A2Y, A2C, ZX, ZY, ZC,
    BXMIN, BXMAX, BYMIN, BYMAX, FID, UX, UY, UC, VX, VY, VC,
    NXR, NYR, NZR, _P_CLAMP, _SOFT_MARGIN, _Z_FLOOR, _Z_INIT,
    _STREAM_COMPILER_PARAMS, _auto_cells, _coeffs13, _face_rows,
    _overlap_cells, _uncell)

_BIGKEY = jnp.int32(2 ** 30)


def default_block_capacity(num_faces: int, n_cells: int, chunk: int) -> int:
    """Static per-image stream capacity in (cell, block) entries.

    Upper bound: every block of every cell (n_cells * ceil(F/chunk)) — the
    bitmap size, always lossless.  pk rides the scalar-prefetch path
    (SMEM), which handles ~1 MB for the whole batch (the banded v5 market
    config ran at 881 KB), so the backward (chunk 128, bitmap <= ~7 K
    entries) always gets the full lossless bound, while the forward
    (chunk 8) caps at 12800 entries — 1.26x the worst adversarial-sweep
    measurement (10,176 at SMPL-13776/256², benchmarks/
    probe_cell_density.py::probe_v6_blocks; overflow is COUNTED in
    `dropped`).  Env MAGICMIRROR_STREAM_CAPACITY overrides (fwd chunk
    only)."""
    import os

    nblk = -(-num_faces // chunk)
    full = n_cells * nblk
    if chunk != 8:
        return full
    env = os.environ.get("MAGICMIRROR_STREAM_CAPACITY")
    if env:
        return min(int(env), full)
    return min(full, max(512, min(4 * num_faces, 12800)))


def _block_stream(overlap, nblk: int, chunk_pad: int, tkc: int):
    """(NC, F) overlap bool -> live-first (cell, block) stream.

    Returns (pk (tkc,) i32 packing cell | blk << 12 | first << 26 |
    last << 27, nlive () i32, dropped () i32 — stream entries past tkc).
    Dead entries decode to cell == 0xFFF (the kernel never executes them).
    """
    NC = overlap.shape[0]
    F = overlap.shape[1]
    # packing field widths (ADVICE r4): cell gets bits 0-11 with 0xFFF as
    # the dead sentinel, blk gets bits 12-25 — overflow would silently
    # corrupt the decode (wrong pixels / wrong faces), so fail loudly
    assert NC < 0xFFF, f"v6 stream packs cell in 12 bits; n_cells={NC}"
    assert nblk <= 0x3FFF, f"v6 stream packs blk in 14 bits; nblk={nblk}"
    pad = nblk * chunk_pad - F
    ov = jnp.concatenate(
        [overlap, jnp.zeros((NC, pad), bool)], axis=1) if pad else overlap
    touched = ov.reshape(NC, nblk, chunk_pad).any(axis=2)       # (NC, nblk)
    total = touched.sum().astype(jnp.int32)
    cells = jnp.arange(NC, dtype=jnp.int32)[:, None]
    blks = jnp.arange(nblk, dtype=jnp.int32)[None, :]
    key = jnp.where(touched, cells * nblk + blks, _BIGKEY)
    skey = jnp.sort(key.reshape(-1))[:tkc]                      # live first
    live = skey < _BIGKEY
    cell = jnp.where(live, skey // nblk, 0xFFF)
    blk = jnp.where(live, skey - (skey // nblk) * nblk, 0)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), cell[:-1]])
    nxt = jnp.concatenate([cell[1:], jnp.full((1,), -2, jnp.int32)])
    first = (cell != prev).astype(jnp.int32)
    last = (cell != nxt).astype(jnp.int32)
    pk = cell | blk << 12 | first << 26 | last << 27
    nlive = jnp.minimum(total, tkc)
    dropped = jnp.maximum(total - tkc, 0)
    return pk.astype(jnp.int32), nlive, dropped


def _cell_edges(cell, n_bands, n_cols):
    """NDC edges of a cell, replicating `_overlap_cells`'s arithmetic
    bitwise (yedges = 1 - 2*i/NB descending, xedges = -1 + 2*j/NC)."""
    band = cell // n_cols
    colb = cell - band * n_cols
    bf = band.astype(jnp.float32)
    cf = colb.astype(jnp.float32)
    y_hi = 1.0 - (2.0 * bf) / n_bands            # yedges[band]
    y_lo = 1.0 - (2.0 * (bf + 1.0)) / n_bands    # yedges[band + 1]
    x_lo = -1.0 + (2.0 * cf) / n_cols            # xedges[colb]
    x_hi = -1.0 + (2.0 * (cf + 1.0)) / n_cols    # xedges[colb + 1]
    return band, colb, y_lo, y_hi, x_lo, x_hi


# ------------------------------------------------------------ forward kernel
def _fwd6_kernel(nlive_ref, pk_ref, rows_ref, o_idx, o_sumlog, o_u, o_v,
                 o_nx, o_ny, o_nz, acc, *, npix, width, height, sigmainv,
                 n_cols, n_bands):
    """_fwd_stream_kernel with flat block addressing + the in-kernel
    overlap mask (`_overlap_cells` arithmetic) that zeroes block-slop
    faces' soft mass — reproducing the banned-face truncation of the
    banded path exactly.

    pk is a BLOCKED SMEM operand ((1, tkc) per image), not scalar
    prefetch: prefetch operands are whole-array SMEM-resident, and
    B x tkc x 4 B = 1.6 MB at the default fwd capacity blows the 1 MB
    SMEM (measured: Mosaic compile error at sphere2/256²/b32)."""
    b = pl.program_id(0)
    log_pc = float(np.log(_P_CLAMP))
    cell_w = width // n_cols
    band_rows_ = npix // cell_w

    o_idx[...] = jnp.full(o_idx.shape, -1, jnp.int32)
    for o in (o_sumlog, o_u, o_v, o_nx, o_ny, o_nz):
        o[...] = jnp.zeros(o.shape, jnp.float32)

    def body(t, carry):
        p = pk_ref[0, 0, t]
        cell = p & 0xFFF
        blk = (p >> 12) & 0x3FFF
        first = (p >> 26) & 1
        last = (p >> 27) & 1

        band, colb, y_lo, y_hi, x_lo, x_hi = _cell_edges(
            cell, n_bands, n_cols)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
        r = lane // cell_w
        xi = lane - r * cell_w
        row = band * band_rows_ + r
        col = colb * cell_w + xi
        p_x = col.astype(jnp.float32) * (2.0 / width) + (1.0 / width - 1.0)
        p_y = row.astype(jnp.float32) * (-2.0 / height) + (1.0 - 1.0 / height)

        @pl.when(first == 1)
        def _():
            acc[0:8] = jnp.full((8, npix), _Z_INIT, jnp.float32)
            acc[8:16] = jnp.full((8, npix), jnp.inf, jnp.float32)
            acc[16:24] = jnp.ones((8, npix), jnp.float32)
            acc[24:64] = jnp.zeros((40, npix), jnp.float32)

        base = pl.multiple_of(blk * 8, 8)
        f = rows_ref[0, pl.ds(base, 8), :]                      # (8, R)

        def col1(j):
            return f[:, j:j + 1]                                # (8, 1)

        # overlap mask: same ops/margin as _overlap_cells (fnz test not
        # needed — backface rows are already dead: their p is exactly 0)
        ov = ((col1(BYMAX) + _SOFT_MARGIN >= y_lo)
              & (col1(BYMIN) - _SOFT_MARGIN <= y_hi)
              & (col1(BXMAX) + _SOFT_MARGIN >= x_lo)
              & (col1(BXMIN) - _SOFT_MARGIN <= x_hi))           # (8, 1)

        d0 = col1(A0X) * p_x + col1(A0Y) * p_y + col1(A0C)      # (8, npix)
        d1 = col1(A1X) * p_x + col1(A1Y) * p_y + col1(A1C)
        d2 = col1(A2X) * p_x + col1(A2Y) * p_y + col1(A2C)
        dl = jnp.maximum(jnp.maximum(d0, d1), d2)
        inside = (dl <= 0.0) & ov
        z = col1(ZX) * p_x + col1(ZY) * p_y + col1(ZC)
        zi = jnp.where(inside, z, _Z_INIT)
        best_z = acc[0:8]
        take = zi > best_z
        acc[0:8] = jnp.where(take, zi, best_z)
        acc[8:16] = jnp.where(take, col1(FID), acc[8:16])
        dbx = jnp.maximum(col1(BXMIN) - p_x, p_x - col1(BXMAX))
        dby = jnp.maximum(col1(BYMIN) - p_y, p_y - col1(BYMAX))
        dl2 = jnp.maximum(dl, jnp.maximum(dbx, dby))
        dpos = jnp.maximum(dl2, 0.0)
        p_soft = jnp.where(ov, jnp.exp(dpos * dpos * (-sigmainv) + log_pc),
                           0.0)
        acc[16:24] = acc[16:24] * (1.0 - p_soft)
        u = col1(UX) * p_x + col1(UY) * p_y + col1(UC)
        v = col1(VX) * p_x + col1(VY) * p_y + col1(VC)
        acc[24:32] = jnp.where(take, u, acc[24:32])
        acc[32:40] = jnp.where(take, v, acc[32:40])
        acc[40:48] = jnp.where(take, col1(NXR), acc[40:48])
        acc[48:56] = jnp.where(take, col1(NYR), acc[48:56])
        acc[56:64] = jnp.where(take, col1(NZR), acc[56:64])

        @pl.when(last == 1)
        def _():
            bz = acc[0:8]
            bid = acc[8:16]
            prod = acc[16:24]
            zmax = jnp.max(bz, axis=0, keepdims=True)           # (1, npix)
            covered = zmax > _Z_FLOOR
            winner = bz >= zmax
            idsel = jnp.min(jnp.where(winner, bid, jnp.inf), axis=0,
                            keepdims=True)
            idxf = jnp.where(covered, idsel, -1.0)
            p4 = prod[0:4] * prod[4:8]
            p2 = p4[0:2] * p4[2:4]
            prod_all = p2[0:1] * p2[1:2]
            o_idx[0, pl.ds(cell, 1), 0, :] = idxf.astype(jnp.int32)
            o_sumlog[0, pl.ds(cell, 1), 0, :] = jnp.log(prod_all)
            sel = winner & (bid == idsel) & covered
            for o, sl in ((o_u, acc[24:32]), (o_v, acc[32:40]),
                          (o_nx, acc[40:48]), (o_ny, acc[48:56]),
                          (o_nz, acc[56:64])):
                o[0, pl.ds(cell, 1), 0, :] = jnp.sum(
                    jnp.where(sel, sl, 0.0), axis=0, keepdims=True)
        return carry

    jax.lax.fori_loop(0, nlive_ref[b], body, 0)


def _fwd6_call(pk, nlive, rows_flat, *, n_bands, npix, width, height,
               sigmainv, interpret, n_cols):
    B, F8, R = rows_flat.shape
    n_cells = n_bands * n_cols
    cell_w = width // n_cols
    band_rows_ = npix // cell_w
    out_shape = [jax.ShapeDtypeStruct((B, n_cells, 1, npix), jnp.int32)] + [
        jax.ShapeDtypeStruct((B, n_cells, 1, npix), jnp.float32)
        for _ in range(6)]
    kernel = functools.partial(_fwd6_kernel, npix=npix, width=width,
                               height=height, sigmainv=sigmainv,
                               n_cols=n_cols, n_bands=n_bands)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            # (1, 1, tkc) block == the trailing array dims (any tkc legal);
            # a (1, tkc) block trips Mosaic's (8, 128)-divisibility check
            pl.BlockSpec((1, 1, pk.shape[1]), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, F8, R), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, n_cells, 1, npix),
                                lambda b, *_: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)] * 7,
        scratch_shapes=[pltpu.VMEM((64, npix), jnp.float32)],
    )
    outs = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                          compiler_params=_STREAM_COMPILER_PARAMS,
                          interpret=interpret)(
        nlive, pk[:, None, :], rows_flat)
    return [_uncell(o, B, n_bands, n_cols, band_rows_, cell_w) for o in outs]


# ----------------------------------------------------------- backward kernel
def _bwd6_kernel(nlive_ref, pk_ref, rowsT_ref, g_ref, out_ref, *, npix,
                 width, height, sigmainv, n_cols, n_bands):
    """_bwd_stream_kernel with flat 128-face windows and per-face output
    ACCUMULATION (faces shared by several cells sum in VMEM — the banded
    path's (NC, 16, K) G + serial scatter-add disappears).  The overlap
    mask zeroes block-slop faces: their truncated-forward gradient is
    exactly zero."""
    b = pl.program_id(0)
    out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)
    cell_w = width // n_cols
    band_rows_ = npix // cell_w
    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    eye128 = (ii == jj).astype(jnp.float32)

    def body(t, carry):
        p = pk_ref[0, 0, t]
        cell = p & 0xFFF
        w_idx = (p >> 12) & 0x3FFF
        woff = pl.multiple_of(w_idx * 128, 128)

        def rowv(j):
            return rowsT_ref[0, j:j + 1, pl.ds(woff, 128)]      # (1, 128)

        a0x, a0y, a0c = rowv(A0X), rowv(A0Y), rowv(A0C)
        a1x, a1y, a1c = rowv(A1X), rowv(A1Y), rowv(A1C)
        a2x, a2y, a2c = rowv(A2X), rowv(A2Y), rowv(A2C)
        xmin, xmax = rowv(BXMIN), rowv(BXMAX)
        ymin, ymax = rowv(BYMIN), rowv(BYMAX)

        band, colb, y_lo, y_hi, x_lo, x_hi = _cell_edges(
            cell, n_bands, n_cols)
        ov = ((ymax + _SOFT_MARGIN >= y_lo) & (ymin - _SOFT_MARGIN <= y_hi)
              & (xmax + _SOFT_MARGIN >= x_lo)
              & (xmin - _SOFT_MARGIN <= x_hi))                  # (1, 128)

        def sub(s, acc):
            lane = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
            flat = s * 128 + lane
            r = flat // cell_w
            xi = flat - r * cell_w
            row = band * band_rows_ + r
            col = colb * cell_w + xi
            p_x = col.astype(jnp.float32) * (2.0 / width) + (
                1.0 / width - 1.0)
            p_y = row.astype(jnp.float32) * (-2.0 / height) + (
                1.0 - 1.0 / height)
            grow = g_ref[0, pl.ds(cell, 1), s, :]               # (1, 128)
            g = jax.lax.dot_general(                            # (128, 1)
                eye128, grow, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

            d0 = a0x * p_x + a0y * p_y + a0c                    # (128, 128)
            d1 = a1x * p_x + a1y * p_y + a1c
            d2 = a2x * p_x + a2y * p_y + a2c
            dl = jnp.maximum(jnp.maximum(d0, d1), d2)
            dbx = jnp.maximum(xmin - p_x, p_x - xmax)
            dby = jnp.maximum(ymin - p_y, p_y - ymax)
            dl2 = jnp.maximum(dl, jnp.maximum(dbx, dby))
            dpos = jnp.maximum(dl2, 0.0)
            p_soft = _P_CLAMP * jnp.exp(dpos * dpos * (-sigmainv))
            gl = jnp.where(ov, g * (2.0 * sigmainv) * dpos
                           * (p_soft / (1.0 - p_soft)), 0.0)

            mline = (dl >= dbx) & (dl >= dby)
            m0 = (d0 >= d1) & (d0 >= d2)
            m1 = jnp.logical_not(m0) & (d1 >= d2)
            m2 = jnp.logical_not(m0) & jnp.logical_not(m1)
            w0 = jnp.where(mline & m0, gl, 0.0)
            w1 = jnp.where(mline & m1, gl, 0.0)
            w2 = jnp.where(mline & m2, gl, 0.0)
            mb = jnp.logical_not(mline)
            mbx = mb & (dbx >= dby)
            mby = mb & jnp.logical_not(mbx)
            wxmin = jnp.where(mbx & ((xmin - p_x) >= (p_x - xmax)), gl, 0.0)
            wxmax = jnp.where(mbx & ((xmin - p_x) < (p_x - xmax)), -gl, 0.0)
            wymin = jnp.where(mby & ((ymin - p_y) >= (p_y - ymax)), gl, 0.0)
            wymax = jnp.where(mby & ((ymin - p_y) < (p_y - ymax)), -gl, 0.0)

            def mom(w):
                return (jnp.sum(w * p_x, axis=0, keepdims=True),
                        jnp.sum(w * p_y, axis=0, keepdims=True),
                        jnp.sum(w, axis=0, keepdims=True))

            terms = mom(w0) + mom(w1) + mom(w2) + (
                jnp.sum(wxmin, axis=0, keepdims=True),
                jnp.sum(wxmax, axis=0, keepdims=True),
                jnp.sum(wymin, axis=0, keepdims=True),
                jnp.sum(wymax, axis=0, keepdims=True))
            return tuple(a + tt for a, tt in zip(acc, terms))

        init = tuple(jnp.zeros((1, 128), jnp.float32) for _ in range(13))
        acc = jax.lax.fori_loop(0, npix // 128, sub, init)
        for j in range(13):
            out_ref[0, j:j + 1, pl.ds(woff, 128)] = (
                out_ref[0, j:j + 1, pl.ds(woff, 128)] + acc[j])
        return carry

    jax.lax.fori_loop(0, nlive_ref[b], body, 0)


def _bwd6_call(pk, nlive, rowsT_flat, g_banded, *, n_cells, npix, width,
               height, sigmainv, interpret, n_cols, n_bands):
    B, R, F128 = rowsT_flat.shape
    kernel = functools.partial(_bwd6_kernel, npix=npix, width=width,
                               height=height, sigmainv=sigmainv,
                               n_cols=n_cols, n_bands=n_bands)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, pk.shape[1]), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, F128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cells, npix // 128, 128),
                         lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, F128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 16, F128), jnp.float32),
        compiler_params=_STREAM_COMPILER_PARAMS,
        interpret=interpret)(nlive, pk[:, None, :], rowsT_flat, g_banded)


def _pad_rows(rows, chunk):
    """(B, F+1, R) -> (B, F8, R): strip the sentinel row (the flat kernel
    never indexes it) and pad to the chunk multiple with copies of it
    (dead rows are exact no-ops in both kernels)."""
    B, Fp1, R = rows.shape
    F = Fp1 - 1
    pad = (-F) % chunk
    if pad == 0:
        return rows[:, :F]
    dead = jnp.broadcast_to(rows[:, F:F + 1], (B, pad, R))
    return jnp.concatenate([rows[:, :F], dead], axis=1)


def _soft_backward6(fvi, fz, fnz, g_sumlog, *, sigmainv, height, width,
                    band_rows, interpret, n_cols):
    B, F = fvi.shape[0], fvi.shape[1]
    n_bands = height // band_rows
    cell_w = width // n_cols
    n_cells = n_bands * n_cols
    npix = band_rows * cell_w
    nblk = -(-F // 128)
    tkc = default_block_capacity(F, n_cells, 128)
    rows = jax.vmap(_face_rows)(fvi, fz, fnz)              # (B, F+1, R_PLAIN)
    rowsT = jnp.transpose(_pad_rows(rows, 128), (0, 2, 1))  # (B, R, F128)
    overlap = jax.vmap(
        lambda v, n: _overlap_cells(v, n, n_bands, n_cols))(fvi, fnz)
    pk, nlive, _ = jax.vmap(
        lambda o: _block_stream(o, nblk, 128, tkc))(overlap)
    g_c = g_sumlog.reshape(B, n_bands, band_rows, n_cols, cell_w)
    g_c = jnp.transpose(g_c, (0, 1, 3, 2, 4))              # cell-major
    g_packed = g_c.reshape(B, n_cells, npix // 128, 128)
    G = _bwd6_call(pk, nlive, rowsT, g_packed, n_cells=n_cells, npix=npix,
                   width=width, height=height, sigmainv=sigmainv,
                   interpret=interpret, n_cols=n_cols, n_bands=n_bands)

    def per_image(G_i, fvi_i):
        g13 = jnp.transpose(G_i[:13, :F])                  # (F, 13) — no
        _, vjp = jax.vjp(_coeffs13, fvi_i)                 # scatter needed
        return vjp(g13)[0]

    return jax.vmap(per_image)(G, fvi)


# ------------------------------------------------------------------- public
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused6(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height, width,
            band_rows, interpret, n_cols):
    n_bands = height // band_rows
    n_cells = n_bands * n_cols
    npix = band_rows * (width // n_cols)
    F = fvi.shape[1]
    nblk = -(-F // 8)
    tkc = default_block_capacity(F, n_cells, 8)
    rows = jax.vmap(
        lambda v, z, n, fn: _face_rows(v, z, n, face_uvs, fn))(
        fvi, fz, fnz, face_normals)
    rows_flat = _pad_rows(rows, 8)
    overlap = jax.vmap(
        lambda v, n: _overlap_cells(v, n, n_bands, n_cols))(fvi, fnz)
    pk, nlive, dropped = jax.vmap(
        lambda o: _block_stream(o, nblk, 8, tkc))(overlap)
    idx, sumlog, u, v, nx, ny, nz = _fwd6_call(
        pk, nlive, rows_flat, n_bands=n_bands, npix=npix, width=width,
        height=height, sigmainv=sigmainv, interpret=interpret,
        n_cols=n_cols)
    soft = 1.0 - jnp.exp(sumlog)
    uv = jnp.stack([u, v], axis=-1)
    normal = jnp.stack([nx, ny, nz], axis=-1)
    hard = (idx >= 0).astype(jnp.float32)
    return idx, soft, uv, normal, hard, dropped


def _fused6_fwd(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height,
                width, band_rows, interpret, n_cols):
    out = _fused6(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height,
                  width, band_rows, interpret, n_cols)
    idx, soft = out[0], out[1]
    return out, (fvi, fz, fnz, face_uvs, face_normals, idx, soft)


def _fused6_bwd(sigmainv, height, width, band_rows, interpret, n_cols, res,
                cots):
    from ..rasterize import _interpolate_selected, pixel_grid

    fvi, fz, fnz, face_uvs, face_normals, idx, soft = res
    _, g_soft, g_uv, g_normal, _, _ = cots
    px, py = pixel_grid(height, width)

    def attrs(fvi_b, uvs, normals_b):
        F = uvs.shape[0]

        def one(fvi_i, idx_i, normals_i):
            feats = jnp.concatenate(
                [jnp.broadcast_to(uvs, (F, 3, 2)),
                 jnp.broadcast_to(normals_i[:, None, :], (F, 3, 3))],
                axis=-1)
            out, _ = _interpolate_selected(px, py, idx_i, fvi_i,
                                           jnp.zeros((F, 3)), feats)
            return out[:, :2], out[:, 2:5]

        return jax.vmap(one)(fvi_b, idx, normals_b)

    _, vjp_attrs = jax.vjp(attrs, fvi, face_uvs, face_normals)
    g_fvi_a, g_uvs, g_normals = vjp_attrs((g_uv, g_normal))

    g_sumlog = g_soft * (soft - 1.0)
    g_fvi_s = _soft_backward6(fvi, fz, fnz, g_sumlog, sigmainv=sigmainv,
                              height=height, width=width,
                              band_rows=band_rows, interpret=interpret,
                              n_cols=n_cols)
    return (g_fvi_a + g_fvi_s, jnp.zeros_like(fz), jnp.zeros_like(fnz),
            g_uvs, g_normals)


_fused6.defvjp(_fused6_fwd, _fused6_bwd)

# v6 handles the dense templates the banded layout cannot (see module
# docstring); the crossover is where the banded VMEM block or its gather
# stops being the cheap option.
DENSE_THRESHOLD = 2048


def v6_enabled(dense_default: bool) -> bool:
    """Renderer routing: env MAGICMIRROR_RASTER_V6=1 forces the interval
    stream for every template, =0 disables it; unset follows the
    density default."""
    import os

    v = os.environ.get("MAGICMIRROR_RASTER_V6")
    if v == "1":
        return True
    if v == "0":
        return False
    return dense_default


def rasterize_fused_v6(fvi, fz, fnz, face_uvs, face_normals, sigmainv=7000.0,
                       height=256, width=256, band_rows=None, capacity=None,
                       interpret=None, n_cols=None):
    """Flat interval-stream fused rasterization — same contract as
    :func:`rasterize_fused_v5`; `capacity` is accepted for signature parity
    but v6's stream capacity is total-per-image (see
    :func:`default_block_capacity`).  `dropped` counts 8-face stream
    blocks past that capacity (0 == lossless)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    height, width = int(height), int(width)
    if band_rows is None or n_cols is None:
        abr, anc = _auto_cells(height, width)
        band_rows = band_rows or abr
        n_cols = n_cols or anc
    assert (height % band_rows == 0 and width % n_cols == 0
            and (band_rows * (width // n_cols)) % 128 == 0), (
        "v6 kernel needs H %% band_rows == 0 and cell npix %% 128 == 0")
    return _fused6(fvi, fz, fnz, face_uvs, face_normals, float(sigmainv),
                   height, width, int(band_rows), bool(interpret),
                   int(n_cols))
