"""Ragged cell-windowed texture sampling — the candidate-set reduction of
the tent-matmul UV sampler (docs/DESIGN.md round-3 lever 1).

The dense MXU formulation (ops/sampling.py::texture_mapping_mxu) multiplies
a (P, Ht) tent-weight matrix that is 99.6% structural zeros into the texture
and materializes a (P, Wt*C) intermediate in HBM (3.2 GB bf16 at 256^2 b32).
Per (8x128)-pixel cell, though, the covered pixels' bilinear taps touch only
a handful of 32-texel-row blocks (measured on the sphere template across the
training camera range: p50 = 3 blocks, p99 = 10, max = 16 of 16 — see
benchmarks/measure_uv_blocks.py).  This kernel exploits that:

  * XLA side: per cell, find the touched 32-row blocks of the texture
    (bitmask -> sorted list) and emit a flattened, cell-major stream of
    chunks, each naming up to 4 blocks (a K = 128 window).  Mean live
    chunks per image ~58 vs 256 dense at 256^2 — the FLOP cut.
  * Pallas side: grid over images.  The whole bf16 texture, the cell-major
    y/x pixel coordinates, and the output live in VMEM.  One dynamic-bound
    ``fori_loop`` walks the image's live chunks (ONE pipeline flush per
    image, not per cell — the v4 lesson): build the (128, npix) tent-weight
    tile for the chunk's rows, dynamic-slice the 4 texture blocks, one
    MXU contraction per channel into a per-cell (Wt, npix) accumulator.
    On the cell's last chunk, the x-axis tent contraction runs IN-KERNEL
    (VPU sublane reduction) — the (P, Wt*C) intermediate never exists.
  * Exactness: a pixel whose taps fall outside its cell's selected blocks
    is impossible by construction (blocks are derived from those very taps).
    Stream overflow past the static chunk capacity is counted and the
    caller falls back to the dense path via ``lax.cond`` — the result is
    ALWAYS exact; capacity only decides which formulation runs.

Background (mask == 0) pixels output EXACTLY 0 (their y is parked at a far
sentinel), i.e. the kernel computes ``texture_mapping(uv) * mask`` — which
is the only form the renderer consumes (reference networks.py:307-313
multiplies texcolor by the coverage mask).  Gradients route through the
mathematically-identical masked XLA formulation via ``jax.custom_vjp``.

Reference semantics target: kaolin ``texture_mapping`` bilinear, as called
at reference networks.py:305.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 32        # texel rows per block
BPC = 4        # blocks per chunk -> K = BS * BPC = 128
XBS = 128      # texel cols per x-window (lane-dim slices need 128-multiples)
_FAR_Y = -1.0e6    # y sentinel for uncovered pixels (weights vanish)
_FAR_ROW = 1.0e7   # row sentinel for invalid block slots (weights vanish)

# latched at import (trace-time env reads are silently sticky under jit):
# "1" forces the cell path on (interpret mode off-TPU — for tests),
# "0" forces it off, unset = on when the backend is TPU
_FORCE = os.environ.get("MAGICMIRROR_TEX_CELLS")


def enabled() -> bool:
    """Whether the renderer should route masked texture sampling here."""
    if _FORCE == "1":
        return True
    if _FORCE == "0":
        return False
    return jax.default_backend() == "tpu"


def cell_shape(height: int, width: int):
    """(cell_h, cell_w): ~1024-pixel cells, cell width <= 128."""
    cw = min(width, 128)
    ch = max(1, 1024 // cw)
    while ch > 1 and height % ch:
        ch //= 2
    return ch, cw


def default_chunk_capacity(n_cells: int, n_xw: int = 1) -> int:
    """Static per-image chunk capacity: 3x the cell count covers the
    adversarial camera sweep with headroom (worst measured 101 live
    chunks at 64 cells for the sphere, benchmarks/measure_uv_blocks.py);
    x-windowing (n_xw > 1) multiplies entries for window-straddling cells,
    and dense-UV meshes (sphere2's fine atlas overflowed 3x by 8 chunks in
    the round-4 adversarial sweep) need 4x.  Oversizing is free at run
    time — the kernel walks live chunks only.  Overflow is counted and the
    caller falls back to the dense path (still exact).  Env
    MAGICMIRROR_TEX_CAP overrides."""
    env = os.environ.get("MAGICMIRROR_TEX_CAP")
    if env:
        return int(env)
    return 3 * n_cells if n_xw <= 1 else 4 * n_cells


def n_x_windows(Wt: int) -> int:
    """Number of 128-col x-windows (1 = no x-windowing, full-width wx).
    MAGICMIRROR_TEX_XW=0 disables x-windowing (perf A/B: windowing halves
    the per-chunk MXU flops but multiplies the chunk count for
    window-straddling cells — which side wins is overhead-dependent)."""
    if os.environ.get("MAGICMIRROR_TEX_XW") == "0":
        return 1
    return Wt // XBS if (Wt % XBS == 0 and Wt > XBS) else 1


def _build_chunks(yc, xc, mask_c, Ht: int, Wt: int, tcap: int):
    """Flattened cell-major chunk stream from cell-layout tap coordinates.

    yc/xc: (B, NC, npix) f32 texel row/col; mask_c: (B, NC, npix) bool.
    A chunk is (4 row blocks of 32 texels) × (one 128-col x-window); a
    cell emits touched-row-chunks × touched-x-windows entries (the x-tent
    windows partition the x axis, so summing over them is exact bilinear).
    Returns (pk1, pk2, nlive, dropped):
      pk1 (B, tcap) i32: cell | first << 16 | last << 17
      pk2 (B, tcap) i32: 4 x 5-bit row-block ids (NBLK == invalid)
                         | x-window id << 20 (3 bits)
      nlive (B,) i32 live chunk count (<= tcap), dropped (B,) i32 overflow.
    """
    B, NC, npix = yc.shape
    NBLK = Ht // BS
    NXB = n_x_windows(Wt)
    assert NBLK <= 31, "5-bit block packing needs Ht/32 <= 31"
    assert NXB <= 8, "3-bit x-window packing needs Wt/128 <= 8"
    maxc = -(-NBLK // BPC)

    r0 = jnp.clip(jnp.floor(yc), 0, Ht - 1)
    r1 = jnp.clip(jnp.floor(yc) + 1, 0, Ht - 1)
    b0 = (r0 // BS).astype(jnp.int32)
    b1 = (r1 // BS).astype(jnp.int32)
    blk_iota = jnp.arange(NBLK, dtype=jnp.int32)
    touched = jnp.zeros((B, NC, NBLK), bool)
    for bb in (b0, b1):
        eq = (bb[..., None] == blk_iota) & mask_c[..., None]
        touched = touched | eq.any(axis=2)
    cnt = touched.sum(-1).astype(jnp.int32)                     # (B, NC)
    # sorted block list per cell: touched ids ascending, then NBLK pad
    bkey = jnp.where(touched, blk_iota[None, None], NBLK)
    blist = jnp.sort(bkey, axis=-1)                             # (B, NC, NBLK)
    blist_p = jnp.concatenate(
        [blist, jnp.full((B, NC, (-NBLK) % BPC + BPC), NBLK, jnp.int32)], -1)
    nchunks = -(-cnt // BPC)                                    # (B, NC)

    # touched x-windows per cell (sorted ids ascending, NXB pad)
    if NXB > 1:
        x0 = jnp.clip(jnp.floor(xc), 0, Wt - 1)
        x1 = jnp.clip(jnp.floor(xc) + 1, 0, Wt - 1)
        xb_iota = jnp.arange(NXB, dtype=jnp.int32)
        touched_x = jnp.zeros((B, NC, NXB), bool)
        for xxb in ((x0 // XBS).astype(jnp.int32),
                    (x1 // XBS).astype(jnp.int32)):
            eqx = (xxb[..., None] == xb_iota) & mask_c[..., None]
            touched_x = touched_x | eqx.any(axis=2)
        nxb = touched_x.sum(-1).astype(jnp.int32)               # (B, NC)
        xkey = jnp.where(touched_x, xb_iota[None, None], NXB)
        xlist = jnp.sort(xkey, axis=-1)                         # (B, NC, NXB)
    else:
        nxb = (nchunks > 0).astype(jnp.int32)
        xlist = jnp.zeros((B, NC, 1), jnp.int32)

    # empty cells get ZERO chunks — the kernel pre-zeroes the output block
    # per image, so untouched cells are already correct.  Slot layout per
    # cell: s = xw_idx * maxc + ci (all row chunks, per touched x-window).
    S = maxc * NXB
    si = jnp.arange(S, dtype=jnp.int32)
    xw_idx = si // maxc
    ci = si - xw_idx * maxc
    live = ((ci[None, None, :] < nchunks[..., None])
            & (xw_idx[None, None, :] < nxb[..., None]))         # (B, NC, S)
    cell_ids = jnp.broadcast_to(
        jnp.arange(NC, dtype=jnp.int32)[None, :, None], live.shape)
    slot = cell_ids * S + si[None, None, :]
    key = jnp.where(live, slot, NC * S)
    order = jnp.argsort(key.reshape(B, -1), axis=-1)            # live first
    nlive_total = live.reshape(B, -1).sum(-1).astype(jnp.int32)
    dropped = jnp.maximum(nlive_total - tcap, 0)
    nlive = jnp.minimum(nlive_total, tcap)

    take = order[:, :tcap]                                      # (B, tcap)

    def gsel(arr3):  # (B, NC, S) -> (B, tcap) along flattened (NC, S)
        return jnp.take_along_axis(
            jnp.broadcast_to(arr3, live.shape).reshape(B, -1), take, 1)

    t_cell = jnp.take_along_axis(cell_ids.reshape(B, -1), take, 1)
    t_ci = gsel(ci[None, None, :])
    t_xw = gsel(xw_idx[None, None, :])
    t_live = jnp.take_along_axis(live.reshape(B, -1), take, 1)
    t_n = gsel(nchunks[..., None])
    t_nx = gsel(nxb[..., None])
    first = ((t_ci == 0) & (t_xw == 0)).astype(jnp.int32)
    last = ((t_ci == t_n - 1) & (t_xw == t_nx - 1)).astype(jnp.int32)
    # dead slots -> garbage cell NC, standalone chunk, invalid blocks
    cell_f = jnp.where(t_live, t_cell, NC)
    pk1 = cell_f | jnp.where(t_live, first, 1) << 16 | (
        jnp.where(t_live, last, 1) << 17)
    base = jnp.where(t_live, t_cell, 0)
    bsel = jnp.arange(B)[:, None]
    # row-block ids of the chunk: blist[cell, ci*BPC + j]
    js = t_ci[..., None] * BPC + jnp.arange(BPC, dtype=jnp.int32)
    blk = jnp.take_along_axis(
        blist_p.reshape(B, NC, -1)[bsel, base], js, axis=-1)    # (B, tcap, BPC)
    blk = jnp.where(t_live[..., None], blk, NBLK)
    # x-window id of the chunk: xlist[cell, xw_idx]
    xb = jnp.take_along_axis(xlist[bsel, base],
                             jnp.minimum(t_xw, xlist.shape[-1] - 1)[..., None],
                             axis=-1)[..., 0]
    xb = jnp.clip(jnp.where(t_live, xb, 0), 0, max(NXB - 1, 0))
    pk2 = (blk[..., 0] | blk[..., 1] << 5 | blk[..., 2] << 10
           | blk[..., 3] << 15 | xb << 20)
    return (pk1.astype(jnp.int32), pk2.astype(jnp.int32),
            nlive.astype(jnp.int32), dropped.astype(jnp.int32))


def _tex_kernel(pk1_ref, pk2_ref, nlive_ref, tex_ref, yc_ref, xc_ref,
                out_ref, acc, *, Ht, Wt, NC, npix, NBLK, NXB):
    """Per image: zero the output once, then walk the live chunk stream.

    Contraction order is x-FIRST: z_c = win_c (K, XW) @ wx (XW, npix) on the
    MXU, then the row weights reduce over K sublanes — the (Wt, npix)
    accumulator of the naive order (3 MB zero-init per cell + re-read at the
    cell finalize, measured 3.7 + 3.4 ms/batch) never exists.  With
    NXB > 1 the x axis is additionally windowed into 128-col blocks (the
    tent windows partition x, so accumulating over a cell's touched windows
    is exact bilinear at ~1/NXB the MXU work).  Mathematically identical to
    the dense path; bf16 rounding differs only by summation order."""
    b = pl.program_id(0)
    K = BS * BPC
    XW = XBS if NXB > 1 else Wt

    out_ref[...] = jnp.zeros((1, NC + 1, 8, npix), jnp.float32)

    def body(t, carry):
        p1 = pk1_ref[b, t]
        p2 = pk2_ref[b, t]
        cell = p1 & 0xFFFF
        first = (p1 >> 16) & 1
        last = (p1 >> 17) & 1
        xb = (p2 >> 20) & 7

        @pl.when(first == 1)
        def _():
            acc[...] = jnp.zeros((8, npix), jnp.float32)

        # (K, 1) row coordinates of the chunk's window, invalid -> far
        kio = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        jj = kio // BS
        rr = kio - jj * BS
        blkv = (p2 >> (5 * jj)) & 31
        rowv = jnp.where(blkv < NBLK, (BS * blkv + rr).astype(jnp.float32),
                         _FAR_ROW)
        y = yc_ref[0, pl.ds(cell, 1), :]                        # (1, npix)
        w = jax.nn.relu(1.0 - jnp.abs(rowv - y))                # (K, npix)

        xv = xc_ref[0, pl.ds(cell, 1), :]                       # (1, npix)
        xi = (jax.lax.broadcasted_iota(jnp.int32, (XW, 1), 0)
              + xb * XW).astype(jnp.float32)
        wx = jax.nn.relu(1.0 - jnp.abs(xi - xv)).astype(jnp.bfloat16)

        xoff = pl.multiple_of(xb * XW, XW)
        part = [acc[0:1], acc[1:2], acc[2:3]]
        for c in range(3):
            parts = []
            for j in range(BPC):
                bj = jnp.clip((p2 >> (5 * j)) & 31, 0, NBLK - 1)
                if NXB > 1:
                    parts.append(tex_ref[0, pl.ds(c * Ht + BS * bj, BS),
                                         pl.ds(xoff, XW)])
                else:
                    parts.append(tex_ref[0, pl.ds(c * Ht + BS * bj, BS), :])
            win = jnp.concatenate(parts, axis=0)                # (K, XW) bf16
            z = jax.lax.dot_general(
                win, wx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # (K, npix)
            part[c] = part[c] + jnp.sum(w * z, axis=0, keepdims=True)
        acc[0:3] = jnp.concatenate(part, axis=0)

        @pl.when(last == 1)
        def _():
            out_ref[0, pl.ds(cell, 1)] = acc[...][None]
        return carry

    jax.lax.fori_loop(0, nlive_ref[b], body, 0)


def _tex_call(pk1, pk2, nlive, texT, yc, xc, *, Ht, Wt, NC, npix, interpret):
    B = texT.shape[0]
    kernel = functools.partial(_tex_kernel, Ht=Ht, Wt=Wt, NC=NC, npix=npix,
                               NBLK=Ht // BS, NXB=n_x_windows(Wt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3 * Ht, Wt), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, npix), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, npix), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NC + 1, 8, npix), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, npix), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NC + 1, 8, npix), jnp.float32),
        interpret=interpret,
    )(pk1, pk2, nlive, texT, yc, xc)


def _to_cells(img, ch, cw):
    """(B, H, W) image layout -> (B, NC, npix) cell-major."""
    B, H, W = img.shape
    x = img.reshape(B, H // ch, ch, W // cw, cw)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(B, (H // ch) * (W // cw), ch * cw)


def _from_cells(cells, H, W, ch, cw, C):
    """(B, NC, npix, C) -> (B, H, W, C)."""
    B = cells.shape[0]
    x = cells.reshape(B, H // ch, W // cw, ch, cw, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, C)


def _masked_dense(texcoord, textures, texmask):
    from ..sampling import texture_mapping_mxu

    return texture_mapping_mxu(texcoord, textures) * texmask[..., None]


# --------------------------------------------------------------------------
# streamed backward (VERDICT r4 item 4): walk the SAME live chunk stream as
# the forward and emit d_textures / d_y / d_x — the dense tent-matmul VJP
# materialized a (P, Ht) weight matrix and a (P, Wt*C) intermediate that are
# 99.6% structural zeros, the exact waste the forward kernel eliminated.
#
# Per chunk (3 stacked-channel MXU dots vs the forward's 1):
#   z3 = win3 @ wx      — recompute the forward interpolation partial
#   t3 = win3 @ dwx     — x-tent derivative partial
#   dW3 = (w*g)3 @ wxᵀ  — texture cotangent for the chunk's 4 row blocks
#   d_y += Σ g·dwy·z3,  d_x += Σ g·w·t3   (VPU sublane reductions)
# d_textures accumulates by read-modify-write into a per-image (3Ht, Wt)
# VMEM block (serial chunk walk per image → no write races).
#
# d_texmask is returned as Σ_c g·out (exact at covered pixels; ZERO at
# uncovered ones where the dense VJP would give g·texcolor(clipped-uv)) —
# downstream always drops it: the rasterizers' custom VJPs discard the hard
# -mask cotangent (rasterize_v4._fused_bwd ignores cots[4]).
# --------------------------------------------------------------------------


def _tex_bwd_kernel(pk1_ref, pk2_ref, nlive_ref, tex_ref, yc_ref, xc_ref,
                    g_ref, dtex_ref, dy_ref, dx_ref, *,
                    Ht, Wt, NC, npix, NBLK, NXB):
    b = pl.program_id(0)
    K = BS * BPC
    XW = XBS if NXB > 1 else Wt

    dtex_ref[...] = jnp.zeros((1, 3 * Ht, Wt), jnp.float32)
    dy_ref[...] = jnp.zeros((1, NC, npix), jnp.float32)
    dx_ref[...] = jnp.zeros((1, NC, npix), jnp.float32)

    def body(t, carry):
        p1 = pk1_ref[b, t]
        p2 = pk2_ref[b, t]
        cell = p1 & 0xFFFF
        xb = (p2 >> 20) & 7

        kio = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        jj = kio // BS
        rr = kio - jj * BS
        blkv = (p2 >> (5 * jj)) & 31
        rowv = jnp.where(blkv < NBLK, (BS * blkv + rr).astype(jnp.float32),
                         _FAR_ROW)
        y = yc_ref[0, pl.ds(cell, 1), :]                        # (1, npix)
        d = rowv - y                                            # (K, npix)
        w = jax.nn.relu(1.0 - jnp.abs(d))
        dwy = jnp.where(w > 0.0,
                        jnp.where(d >= 0.0, 1.0, -1.0), 0.0)    # dw/dy

        xv = xc_ref[0, pl.ds(cell, 1), :]                       # (1, npix)
        xi = (jax.lax.broadcasted_iota(jnp.int32, (XW, 1), 0)
              + xb * XW).astype(jnp.float32)
        dxw = xi - xv                                           # (XW, npix)
        wx_f = jax.nn.relu(1.0 - jnp.abs(dxw))
        wx = wx_f.astype(jnp.bfloat16)
        dwx = jnp.where(wx_f > 0.0,
                        jnp.where(dxw >= 0.0, 1.0, -1.0),
                        0.0).astype(jnp.bfloat16)               # dwx/dxv

        xoff = pl.multiple_of(xb * XW, XW)
        wins = []
        for c in range(3):
            for j in range(BPC):
                bj = jnp.clip((p2 >> (5 * j)) & 31, 0, NBLK - 1)
                if NXB > 1:
                    wins.append(tex_ref[0, pl.ds(c * Ht + BS * bj, BS),
                                        pl.ds(xoff, XW)])
                else:
                    wins.append(tex_ref[0, pl.ds(c * Ht + BS * bj, BS), :])
        win3 = jnp.concatenate(wins, axis=0)                    # (3K, XW)
        z3 = jax.lax.dot_general(
            win3, wx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (3K, npix)
        t3 = jax.lax.dot_general(
            win3, dwx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (3K, npix)

        g_cell = g_ref[0, pl.ds(cell, 1)]                       # (1, 8, npix)
        dy_c = jnp.zeros((1, npix), jnp.float32)
        dx_c = jnp.zeros((1, npix), jnp.float32)
        a_parts = []
        for c in range(3):
            gc = g_cell[0, c:c + 1, :]                          # (1, npix)
            zs = z3[c * K:(c + 1) * K]
            ts = t3[c * K:(c + 1) * K]
            dy_c += gc * jnp.sum(dwy * zs, axis=0, keepdims=True)
            dx_c += gc * jnp.sum(w * ts, axis=0, keepdims=True)
            a_parts.append(w * gc)                              # (K, npix)
        a3 = jnp.concatenate(a_parts, axis=0).astype(jnp.bfloat16)
        dW3 = jax.lax.dot_general(
            a3, wx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (3K, XW)

        dy_ref[0, pl.ds(cell, 1), :] += dy_c
        dx_ref[0, pl.ds(cell, 1), :] += dx_c
        for c in range(3):
            for j in range(BPC):
                bj = jnp.clip((p2 >> (5 * j)) & 31, 0, NBLK - 1)
                # invalid slots (blkv >= NBLK) have w == 0 rows -> adding
                # zeros to the clipped target block is a no-op
                seg = dW3[c * K + j * BS:c * K + (j + 1) * BS]  # (BS, XW)
                if NXB > 1:
                    cur = dtex_ref[0, pl.ds(c * Ht + BS * bj, BS),
                                   pl.ds(xoff, XW)]
                    dtex_ref[0, pl.ds(c * Ht + BS * bj, BS),
                             pl.ds(xoff, XW)] = cur + seg
                else:
                    cur = dtex_ref[0, pl.ds(c * Ht + BS * bj, BS), :]
                    dtex_ref[0, pl.ds(c * Ht + BS * bj, BS), :] = cur + seg
        return carry

    jax.lax.fori_loop(0, nlive_ref[b], body, 0)


def _tex_bwd_call(pk1, pk2, nlive, texT, yc, xc, g_cells, *,
                  Ht, Wt, NC, npix, interpret):
    B = texT.shape[0]
    kernel = functools.partial(_tex_bwd_kernel, Ht=Ht, Wt=Wt, NC=NC,
                               npix=npix, NBLK=Ht // BS,
                               NXB=n_x_windows(Wt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3 * Ht, Wt), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, npix), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, npix), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, 8, npix), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3 * Ht, Wt), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, npix), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, npix), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 3 * Ht, Wt), jnp.float32),
            jax.ShapeDtypeStruct((B, NC, npix), jnp.float32),
            jax.ShapeDtypeStruct((B, NC, npix), jnp.float32),
        ],
        interpret=interpret,
    )(pk1, pk2, nlive, texT, yc, xc, g_cells)


def bwd_stream_enabled() -> bool:
    """MAGICMIRROR_TEX_BWD=dense routes gradients through the dense tent
    -matmul VJP instead of the streamed kernel (A/B + fallback knob)."""
    return os.environ.get("MAGICMIRROR_TEX_BWD") != "dense"


def _uv_to_texels(texcoord, Ht, Wt):
    """uv in [0,1]^2 (v up, kaolin convention) -> float texel coords, the
    exact arithmetic of texture_mapping_mxu (ops/sampling.py:157-160)."""
    uv = jnp.clip(texcoord, 0.0, 1.0)
    gx = uv[..., 0] * 2.0 - 1.0
    gy = -(uv[..., 1] * 2.0 - 1.0)
    x = ((gx + 1.0) * Wt - 1.0) * 0.5
    y = ((gy + 1.0) * Ht - 1.0) * 0.5
    return y, x


def _prep_cells(texcoord, texmask, Ht, Wt, ch, cw):
    """texcoord/texmask -> cell-layout tap coordinates (the differentiable
    prefix of the kernel path; its jax.vjp chains d_y/d_x -> d_texcoord,
    including the mask sentinel's gradient block and the uv clip)."""
    y, x = _uv_to_texels(texcoord, Ht, Wt)
    m = texmask > 0.5
    yc = _to_cells(jnp.where(m, y, _FAR_Y), ch, cw)
    xc = _to_cells(x, ch, cw)
    return yc, xc


def _texture_cells_fwd_impl(texcoord, textures, texmask, interpret):
    B, H, W, _ = texcoord.shape
    _, Ht, Wt, C = textures.shape
    assert C == 3
    ch, cw = cell_shape(H, W)
    NC = (H // ch) * (W // cw)
    npix = ch * cw
    tcap = default_chunk_capacity(NC, n_x_windows(Wt))

    yc, xc = _prep_cells(texcoord, texmask, Ht, Wt, ch, cw)
    mc = _to_cells((texmask > 0.5).astype(jnp.float32), ch, cw) > 0.5
    pk1, pk2, nlive, dropped = _build_chunks(yc, xc, mc, Ht, Wt, tcap)

    texT = jnp.transpose(textures, (0, 3, 1, 2)).reshape(
        B, C * Ht, Wt).astype(jnp.bfloat16)

    def kernel_branch(_):
        cells = _tex_call(pk1, pk2, nlive, texT, yc, xc, Ht=Ht, Wt=Wt,
                          NC=NC, npix=npix, interpret=interpret)
        cells = jnp.transpose(cells[:, :NC, :3, :], (0, 1, 3, 2))
        return _from_cells(cells, H, W, ch, cw, 3)

    def dense_branch(_):
        return _masked_dense(texcoord, textures, texmask)

    out = jax.lax.cond(jnp.any(dropped > 0), dense_branch, kernel_branch,
                       operand=None)
    return out, dropped, (pk1, pk2, nlive)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _texture_cells(texcoord, textures, texmask, interpret):
    out, dropped, _ = _texture_cells_fwd_impl(texcoord, textures, texmask,
                                              interpret)
    return out, dropped


def _texture_cells_fwd(texcoord, textures, texmask, interpret):
    out, dropped, stream = _texture_cells_fwd_impl(texcoord, textures,
                                                   texmask, interpret)
    return (out, dropped), (texcoord, textures, texmask, out, dropped,
                            stream)


def _texture_cells_bwd(interpret, res, g):
    texcoord, textures, texmask, out, dropped, stream = res
    g_out, _ = g  # dropped is an int diagnostic — no cotangent

    if not bwd_stream_enabled():
        _, vjp = jax.vjp(_masked_dense, texcoord, textures, texmask)
        return vjp(g_out)

    pk1, pk2, nlive = stream
    B, H, W, _ = texcoord.shape
    _, Ht, Wt, C = textures.shape
    ch, cw = cell_shape(H, W)
    NC = (H // ch) * (W // cw)
    npix = ch * cw

    (yc, xc), vjp_prep = jax.vjp(
        lambda tc: _prep_cells(tc, texmask, Ht, Wt, ch, cw), texcoord)
    texT = jnp.transpose(textures, (0, 3, 1, 2)).reshape(
        B, C * Ht, Wt).astype(jnp.bfloat16)
    # cotangent in cell layout, channels on 8-padded sublanes
    gc3 = jnp.stack([_to_cells(g_out[..., c], ch, cw) for c in range(3)],
                    axis=2)                                     # (B, NC, 3, npix)
    g_cells = jnp.concatenate(
        [gc3, jnp.zeros((B, NC, 5, npix), gc3.dtype)], axis=2)

    def stream_branch(_):
        dtexT, dyc, dxc = _tex_bwd_call(
            pk1, pk2, nlive, texT, yc, xc, g_cells, Ht=Ht, Wt=Wt, NC=NC,
            npix=npix, interpret=interpret)
        d_texcoord, = vjp_prep((dyc, dxc))
        d_textures = jnp.transpose(
            dtexT.reshape(B, C, Ht, Wt), (0, 2, 3, 1))
        return d_texcoord, d_textures

    def dense_branch(_):
        # forward rendered this image set via the dense fallback (stream
        # overflow) — differentiate the same formulation
        _, vjp = jax.vjp(
            lambda tc, tex: _masked_dense(tc, tex, texmask),
            texcoord, textures)
        return vjp(g_out)

    d_texcoord, d_textures = jax.lax.cond(
        jnp.any(dropped > 0), dense_branch, stream_branch, operand=None)
    # exact at covered pixels (out = texcolor there); ZERO at uncovered
    # ones unlike the dense VJP's g·texcolor(clipped-uv) — downstream
    # always discards this cotangent (the rasterizers' custom VJPs drop
    # the hard-mask gradient), see module note above
    d_texmask = jnp.sum(g_out * out, axis=-1)
    return d_texcoord, d_textures, d_texmask


_texture_cells.defvjp(_texture_cells_fwd, _texture_cells_bwd)


def texture_render(texcoord, textures, texmask, interpret=None):
    """Masked bilinear UV sampling: ``texture_mapping(uv) * mask`` with the
    ragged cell-windowed Pallas kernel (exact; dense fallback on stream
    overflow).  Returns ((B, H, W, 3), dropped (B,) i32 diagnostic —
    overflowed chunk count; nonzero means the dense fallback ran, the
    result is exact either way).

    texcoord (B, H, W, 2); textures (B, Ht, Wt, 3); texmask (B, H, W) hard
    coverage in {0, 1}.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _texture_cells(texcoord, textures, texmask, bool(interpret))


def supported(height: int, width: int, tex_h: int, tex_w: int, C: int) -> bool:
    """Static applicability of the kernel path."""
    if C != 3 or tex_h // BS > 31 or tex_h % BS:
        return False
    if n_x_windows(tex_w) > 8:
        return False
    ch, cw = cell_shape(height, width)
    if height % ch or width % cw:
        return False
    npix = ch * cw
    return npix % 128 == 0 and npix >= 256
