"""v4 Pallas TPU rasterizer — faces-on-sublanes x pixels-on-lanes.

Replaces kaolin's CUDA ``dibr_rasterization`` phase 1 (reference
networks.py:297-299) with a layout designed for the VPU's (8, 128) tiles:

  * Every per-(pixel, face) quantity is an *affine function of the pixel
    coordinate*: signed edge-line distances, the z plane, and the winner's
    uv come precomputed as (coef_x, coef_y, const) rows per face (XLA does
    the O(F) precompute).  The kernel is then pure FMA + select on full
    (8, NPIX) tiles — no cross-lane reductions, no wasted lanes.
  * Faces stream 8-at-a-time on the SUBLANE axis: an attribute is an (8, 1)
    column slice broadcast against the (1, NPIX) pixel row.  Each sublane
    slot keeps its own (best_z, best_id, partial sumlog) carry; one 8-way
    sublane merge per band at the end replaces the per-chunk argmax that
    dominated the v1-v3 kernels ((TP, 1) carries wasted 127/128 lanes).
  * Faces are binned into horizontal bands (capacity-capped, static trip
    counts — a dynamic bound costs a ~20us pipeline flush); the bin step
    now REPORTS overflow: ``dropped`` counts (band, face) pairs that fell
    past the capacity so callers can log/assert instead of silently
    corrupting images and gradients.
  * The fused variant selects the winner's uv/normal inside the kernel
    (the barycentrics are live at z-test time), removing the separate
    phase-2 gather pass from the serving path entirely.
  * The backward pass is ALSO a Pallas kernel: the soft-silhouette
    cotangent is reduced to gradients of the per-face affine coefficients
    (pixels on sublanes, faces on lanes, moment sums over sublanes), then
    chained through the XLA coefficient precompute with ``jax.vjp``.  No
    more recompute-through-the-XLA-scan backward.

Soft mode is 'line' (signed edge-line distance with a bbox floor), matching
``ops/rasterize.py``'s 'line' golden path; 'exact' (segment distances)
callers should use the v3 kernel or the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------- row layout
(A0X, A0Y, A0C, A1X, A1Y, A1C, A2X, A2Y, A2C,
 ZX, ZY, ZC, BXMIN, BXMAX, BYMIN, BYMAX, FID) = range(17)
R_PLAIN = 17
(UX, UY, UC, VX, VY, VC, NXR, NYR, NZR) = range(R_PLAIN, R_PLAIN + 9)
R_FUSED = R_PLAIN + 9

_DEN_EPS = 1e-10
_P_CLAMP = 1.0 - 1e-7
# The stream kernels' fori_loop bodies carry enough live (TPS, 128) temps
# that XLA's default 16 MB scoped-vmem budget overflows marginally at large
# batch (b48/128²: 16.05M, a 52K overshoot).  v5e has 128 MB of physical
# VMEM per core; raise the per-kernel ceiling instead of shrinking tiles.
_STREAM_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024)
_SOFT_MARGIN = 0.035   # p < 2e-4 at sigmainv=7000 beyond this distance
_BIG_D = 3.0e4         # "infinitely far" line distance for dead faces
_DEAD_Z = -1.0e30      # z for degenerate-but-front faces (never "covered")
_Z_FLOOR = -1.0e29     # covered threshold: real z >> this >> _DEAD_Z
_Z_INIT = -3.0e38


def _raw_line_coeffs(fvi):
    """Affine coefficients of the three signed edge-line distances and the
    bbox, per face.  d_i(p) = Aix*px + Aiy*py + Aic is the distance of p to
    edge-line i, positive OUTSIDE (the reference 'line' soft mode,
    ops/rasterize.py:100-119).  Shared between the forward row packing and
    the backward jax.vjp chain so the two can never drift."""
    ax, ay = fvi[:, 0, 0], fvi[:, 0, 1]
    bx, by = fvi[:, 1, 0], fvi[:, 1, 1]
    cx, cy = fvi[:, 2, 0], fvi[:, 2, 1]
    den = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    sgn = jnp.where(den >= 0.0, 1.0, -1.0)
    # cross0 = (cx-bx)(py-by) - (cy-by)(px-bx): affine in p
    c0x, c0y = -(cy - by), (cx - bx)
    c0c = (cy - by) * bx - (cx - bx) * by
    # cross1 = (ax-cx)(py-cy) - (ay-cy)(px-cx)
    c1x, c1y = -(ay - cy), (ax - cx)
    c1c = (ay - cy) * cx - (ax - cx) * cy
    # cross2 = den - cross0 - cross1
    c2x, c2y = -c0x - c1x, -c0y - c1y
    c2c = den - c0c - c1c

    def rl(ux, uy, vx, vy):
        dx, dy = vx - ux, vy - uy
        return jax.lax.rsqrt(dx * dx + dy * dy + 1e-12)

    s0 = -sgn * rl(bx, by, cx, cy)   # cross0's edge is b->c
    s1 = -sgn * rl(cx, cy, ax, ay)   # cross1's edge is c->a
    s2 = -sgn * rl(ax, ay, bx, by)   # cross2's edge is a->b
    xs, ys = fvi[:, :, 0], fvi[:, :, 1]
    coeffs = dict(
        a0x=s0 * c0x, a0y=s0 * c0y, a0c=s0 * c0c,
        a1x=s1 * c1x, a1y=s1 * c1y, a1c=s1 * c1c,
        a2x=s2 * c2x, a2y=s2 * c2y, a2c=s2 * c2c,
        xmin=xs.min(1), xmax=xs.max(1), ymin=ys.min(1), ymax=ys.max(1),
    )
    aux = dict(den=den, c0x=c0x, c0y=c0y, c0c=c0c, c1x=c1x, c1y=c1y, c1c=c1c)
    return coeffs, aux


_COEFF13_KEYS = ("a0x", "a0y", "a0c", "a1x", "a1y", "a1c",
                 "a2x", "a2y", "a2c", "xmin", "xmax", "ymin", "ymax")


def _coeffs13(fvi):
    """(F, 3, 2) -> (F, 13) line+bbox coefficients, unmasked (the backward
    chain: cotangents for dead faces are identically zero already)."""
    c, _ = _raw_line_coeffs(fvi)
    return jnp.stack([c[k] for k in _COEFF13_KEYS], axis=1)


def _affine_interp(aux, v0, v1, v2):
    """Affine coefficients of w0*v0 + w1*v1 + w2*v2 over the face plane."""
    den = aux["den"]
    inv = 1.0 / jnp.where(jnp.abs(den) > _DEN_EPS, den, 1.0)
    d0, d1 = v0 - v2, v1 - v2
    gx = (aux["c0x"] * d0 + aux["c1x"] * d1) * inv
    gy = (aux["c0y"] * d0 + aux["c1y"] * d1) * inv
    gc = v2 + (aux["c0c"] * d0 + aux["c1c"] * d1) * inv
    return gx, gy, gc


def _face_rows(fvi, fz, fnz, face_uvs=None, face_normals=None):
    """Pack per-face kernel rows -> (F+1, R) f32; row F is the dead sentinel
    that padded band slots point at.  Backfacing faces are fully dead (their
    soft term is masked in the golden path too); degenerate front faces keep
    their line distances (they still emit soft mass, matching
    ops/rasterize.py:126) but can never win the z-buffer."""
    F = fvi.shape[0]
    c, aux = _raw_line_coeffs(fvi)
    front = fnz > 0.0
    nondeg = jnp.abs(aux["den"]) > _DEN_EPS
    zok = front & nondeg

    def mk(x, dead=0.0):
        return jnp.where(front, x, dead)

    zx, zy, zc = _affine_interp(aux, fz[:, 0], fz[:, 1], fz[:, 2])
    rows = [mk(c["a0x"]), mk(c["a0y"]), mk(c["a0c"], _BIG_D),
            mk(c["a1x"]), mk(c["a1y"]), mk(c["a1c"]),
            mk(c["a2x"]), mk(c["a2y"]), mk(c["a2c"]),
            jnp.where(zok, zx, 0.0), jnp.where(zok, zy, 0.0),
            jnp.where(zok, zc, _DEAD_Z),
            mk(c["xmin"]), mk(c["xmax"]), mk(c["ymin"]), mk(c["ymax"]),
            jnp.arange(F, dtype=jnp.float32)]
    if face_uvs is not None:
        ux, uy, uc = _affine_interp(aux, face_uvs[:, 0, 0], face_uvs[:, 1, 0],
                                    face_uvs[:, 2, 0])
        vx, vy, vc = _affine_interp(aux, face_uvs[:, 0, 1], face_uvs[:, 1, 1],
                                    face_uvs[:, 2, 1])
        z0 = jnp.zeros_like(ux)
        rows += [jnp.where(zok, ux, z0), jnp.where(zok, uy, z0),
                 jnp.where(zok, uc, z0), jnp.where(zok, vx, z0),
                 jnp.where(zok, vy, z0), jnp.where(zok, vc, z0),
                 face_normals[:, 0], face_normals[:, 1], face_normals[:, 2]]
    packed = jnp.stack(rows, axis=1)  # (F, R)
    dead = jnp.zeros((1, packed.shape[1]), packed.dtype)
    dead = dead.at[0, A0C].set(_BIG_D).at[0, ZC].set(_DEAD_Z)
    dead = dead.at[0, FID].set(-1.0)
    return jnp.concatenate([packed, dead], axis=0)


# ------------------------------------------------------------------- binning
def _bin_lists(fvi, fnz, n_bands: int, capacity: int, n_cols: int = 1):
    """2-D cell face lists -> (lists (NB*NC, K) i32 into rows[F+1],
    dropped () i32 = #(cell, face) pairs past the capacity).  Cells are
    horizontal bands split into ``n_cols`` column blocks: at 256² the
    closest training camera (dist_range 2~7) packs up to 188 faces into one
    full-width band but only 118 into a half-width cell, so the column
    split is what lets the static capacity stay at 128 without drops.
    Backfaces are dropped at bin time (no z/soft contribution)."""
    F = fvi.shape[0]
    overlap = _overlap_cells(fvi, fnz, n_bands, n_cols)
    counts = overlap.sum(axis=1).astype(jnp.int32)
    dropped = jnp.maximum(counts - capacity, 0).sum()
    # count-and-pad WITHOUT a scatter (XLA TPU scatters are serial — the
    # scatter formulation cost 4.8 ms at B=32/F=1280): sort each cell's face
    # ids keyed so overlapping faces come first in id order, then clamp the
    # non-overlapping tail to the dead-sentinel index F.
    ids = jnp.arange(F, dtype=jnp.int32)[None, :]
    key = jnp.where(overlap, ids, ids + F)
    if F < capacity:  # tiny meshes: pad so lists is always (NC, capacity)
        key = jnp.concatenate(
            [key, jnp.full((key.shape[0], capacity - F), 2 * F, jnp.int32)],
            axis=1)
    skey = jnp.sort(key, axis=1)[:, :capacity]
    lists = jnp.where(skey < F, skey, F)
    return lists, dropped


def _overlap_cells(fvi, fnz, n_bands: int, n_cols: int):
    """(F, 3, 2), (F,) -> (NC, F) bool cell-overlap mask (the binning
    predicate of :func:`_bin_lists`, factored so the rank-compaction path
    can reuse it).  Backfaces excluded."""
    F = fvi.shape[0]
    ys = fvi[:, :, 1]
    ymin = ys.min(1) - _SOFT_MARGIN
    ymax = ys.max(1) + _SOFT_MARGIN
    yedges = 1.0 - 2.0 * jnp.arange(n_bands + 1, dtype=jnp.float32) / n_bands
    yov = ((ymax[None, :] >= yedges[1:][:, None])
           & (ymin[None, :] <= yedges[:-1][:, None])
           & (fnz > 0.0)[None, :])                          # (NB, F)
    if n_cols > 1:
        xs = fvi[:, :, 0]
        xmin = xs.min(1) - _SOFT_MARGIN
        xmax = xs.max(1) + _SOFT_MARGIN
        xedges = -1.0 + 2.0 * jnp.arange(n_cols + 1,
                                         dtype=jnp.float32) / n_cols
        xov = ((xmax[None, :] >= xedges[:-1][:, None])
               & (xmin[None, :] <= xedges[1:][:, None]))    # (NC, F)
        return (yov[:, None, :] & xov[None, :, :]).reshape(
            n_bands * n_cols, F)
    return yov


def _bin_gather_rows(rows, fvi, fnz, n_bands: int, capacity: int,
                     n_cols: int, transposed: bool = False):
    """Fused bin + banded-row gather via cumsum-rank one-hot compaction.

    Produces EXACTLY what ``vmap(_bin_lists)`` + ``_gather_rows`` produce
    (lists are ascending face ids per cell — the sort key there was the id
    itself), but without the O(NC·F log² F) XLA sort: the slot of a live
    face is its exclusive prefix count within the cell (``cumsum``), the
    slot one-hot ``rank == k+1`` IS the gather one-hot, and empty slots
    take the dead sentinel row explicitly.  Exact at HIGHEST precision
    (one nonzero per output).  Falls back to the sort + plain-gather path
    at SMPL scale where the (NC·K, F) one-hot would dominate.

    Layout note (both directions MEASURED on the real chip, round 4): the
    natural "ckf,fr->ckr" contraction puts R = 26 on the 128-lane axis of
    every MXU output tile — nominally wasting 5x of the issue rate — but
    the "fixed" transposed form (R, F) @ (F, NC·K) must then relayout its
    (R, NC·K) output back to (NC, K, R) for the forward kernel, and that
    lane↔sublane transpose costs MORE than the matmul win (bench at pure
    defaults: 2,541 fps natural vs 1,849 fps transposed-everywhere).  So
    the forward keeps the natural orientation; only the BACKWARD asks for
    ``transposed=True``, whose (NC, R, K) consumer layout falls out of the
    transposed contraction with no relayout at all.  Bitwise-identical
    output either way: every element is the one nonzero product.

    rows (B, F+1, R); fvi (B, F, 3, 2); fnz (B, F).
    Returns (banded (B, NC, K, R) — or (B, NC, R, K) when ``transposed``,
    the layout the backward kernel consumes, saving its relayout —
    lists (B, NC, K) i32 into rows[F+1], counts (B, NC) i32,
    dropped (B,) i32).
    """
    B, Fp1, R = rows.shape
    F = Fp1 - 1
    NC = n_bands * n_cols
    K = capacity
    if NC * K * Fp1 > 64_000_000:
        lists, dropped = jax.vmap(
            lambda v, n: _bin_lists(v, n, n_bands, K, n_cols))(fvi, fnz)
        banded = jax.vmap(lambda r, l: r[l])(rows, lists)
        counts = (lists < F).sum(axis=2).astype(jnp.int32)
        if transposed:
            banded = jnp.transpose(banded, (0, 1, 3, 2))
        return banded, lists, counts, dropped

    def one(rows_i, fvi_i, fnz_i):
        overlap = _overlap_cells(fvi_i, fnz_i, n_bands, n_cols)  # (NC, F)
        rank = jnp.cumsum(overlap.astype(jnp.int32), axis=1)     # 1-based
        total = rank[:, -1]
        dropped = jnp.maximum(total - K, 0).sum()
        counts = jnp.minimum(total, K)   # live slots actually filled
        slots = jnp.arange(K, dtype=jnp.int32)
        oh = ((rank[:, None, :] == (slots + 1)[None, :, None])
              & overlap[:, None, :]).astype(jnp.float32)        # (NC, K, F)
        empty = (slots[None, :] >= counts[:, None]).astype(jnp.float32)
        if transposed:
            bandedT = jax.lax.dot_general(                      # (R, NC*K)
                jnp.transpose(rows_i[:F]), oh.reshape(NC * K, F),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            bandedT = bandedT + rows_i[F][:, None] * empty.reshape(1, NC * K)
            bandedT = bandedT.reshape(R, NC, K)
            ids = bandedT[FID]
            lists = jnp.where(ids >= 0.0, ids, float(F)).astype(jnp.int32)
            out = jnp.transpose(bandedT, (1, 0, 2))             # (NC, R, K)
            return out, lists, counts.astype(jnp.int32), dropped
        banded = jnp.einsum("ckf,fr->ckr", oh, rows_i[:F],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        banded = banded + empty[:, :, None] * rows_i[F][None, None, :]
        ids = banded[:, :, FID]
        lists = jnp.where(ids >= 0.0, ids, float(F)).astype(jnp.int32)
        return banded, lists, counts.astype(jnp.int32), dropped

    return jax.vmap(one)(rows, fvi, fnz)


def _gather_rows(rows, lists):
    """Banded row gather (B, F+1, R)[lists (B, NC, K)] -> (B, NC, K, R).

    XLA's TPU row-gather is serial (~2.2 ms at B=32/256²/1280 faces); a
    one-hot MXU matmul does the same selection in ~0.5 ms and is EXACT at
    Precision.HIGHEST (one nonzero term per output, zero terms add 0.0
    exactly; bitwise-parity pinned by the v4/v5 golden tests).  Default
    (bf16) precision corrupts the ±1e30 sentinel rows — do not downgrade.
    Falls back to the plain gather when the one-hot would be huge
    (SMPL-scale meshes: NC·K·F exceeds the arithmetic win)."""
    B_, Fp1, R = rows.shape
    NC, K = lists.shape[1], lists.shape[2]
    if NC * K * Fp1 > 64_000_000:
        return jax.vmap(lambda r, l: r[l])(rows, lists)
    oh = (lists.reshape(B_, NC * K)[:, :, None]
          == jnp.arange(Fp1, dtype=jnp.int32)).astype(jnp.float32)
    # natural orientation (slots on sublanes, R on lanes): the transposed
    # form needs a lane↔sublane relayout of the output that measured
    # slower than its matmul win (see _bin_gather_rows layout note)
    banded = jnp.einsum("bkf,bfr->bkr", oh, rows,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    return banded.reshape(B_, NC, K, R)


def default_capacity(num_faces: int, n_cells: int) -> int:
    """Static per-cell face capacity: 4x the uniform share with a floor of
    160 — sized so an adversarial sweep at the closest training camera
    (dist 2, elev 0-30, ±0.08 vertex deformation) stays lossless for every
    auto cell config (worst measured: 134 @256² 32x2 cells, 284 @128² 16x1;
    see tests/test_rasterize_v4.py).  Rounded to the 8-face chunk.  Env
    MAGICMIRROR_BAND_CAPACITY overrides; overflow is always COUNTED.

    Dense meshes (SMPL-13776) at FAR cameras concentrate an F-fraction of
    faces in a handful of cells (probe: 0.27-0.34F per cell), which no
    per-cell rectangular capacity can absorb — (NC, 0.42F) banded rows is
    190 MB of VMEM at SMPL/256².  Those configs route to the interval
    stream (ops/pallas/rasterize_v6.py) whose capacity is TOTAL, not
    per-cell."""
    import os

    env = os.environ.get("MAGICMIRROR_BAND_CAPACITY")
    if env:
        cap = int(env)
    else:
        cap = max(160, 4 * num_faces // n_cells)
    cap = -(-cap // 8) * 8
    return min(cap, num_faces + ((-num_faces) % 8))


# ------------------------------------------------------------ forward kernel
def _cell_pixel_coords(cell, npix, width, height, n_cols):
    """NDC pixel centers of one (band, column) cell as (1, npix) rows.
    Within a cell, pixels run row-major over (band_rows, width/n_cols)."""
    cell_w = width // n_cols
    band = cell // n_cols
    colb = cell - band * n_cols
    band_rows = npix // cell_w
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    r = lane // cell_w
    xi = lane - r * cell_w
    row = band * band_rows + r
    col = colb * cell_w + xi
    p_x = col.astype(jnp.float32) * (2.0 / width) + (1.0 / width - 1.0)
    p_y = row.astype(jnp.float32) * (-2.0 / height) + (1.0 - 1.0 / height)
    return p_x, p_y


def _uncell(o, B, n_bands, n_cols, band_rows, cell_w):
    """(B, NB*NC, 1, npix) cell-major -> (B, P) image row-major."""
    o = o.reshape(B, n_bands, n_cols, band_rows, cell_w)
    o = jnp.transpose(o, (0, 1, 3, 2, 4))
    return o.reshape(B, n_bands * band_rows * n_cols * cell_w)


def _fwd_kernel(rows_ref, *out_refs, K, npix, width, height, sigmainv, fused,
                n_cols):
    cell = pl.program_id(1)
    p_x, p_y = _cell_pixel_coords(cell, npix, width, height, n_cols)

    log_pc = float(np.log(_P_CLAMP))

    def body(i, carry):
        best_z, best_id, prod = carry[0], carry[1], carry[2]
        base = pl.multiple_of(i * 8, 8)
        f = rows_ref[0, 0, pl.ds(base, 8), :]          # (8, R)

        def col1(j):
            return f[:, j:j + 1]                        # (8, 1)

        d0 = col1(A0X) * p_x + col1(A0Y) * p_y + col1(A0C)   # (8, npix)
        d1 = col1(A1X) * p_x + col1(A1Y) * p_y + col1(A1C)
        d2 = col1(A2X) * p_x + col1(A2Y) * p_y + col1(A2C)
        dl = jnp.maximum(jnp.maximum(d0, d1), d2)
        inside = dl <= 0.0
        z = col1(ZX) * p_x + col1(ZY) * p_y + col1(ZC)
        zi = jnp.where(inside, z, _Z_INIT)
        take = zi > best_z
        best_z = jnp.where(take, zi, best_z)
        best_id = jnp.where(take, col1(FID), best_id)
        dbx = jnp.maximum(col1(BXMIN) - p_x, p_x - col1(BXMAX))
        dby = jnp.maximum(col1(BYMIN) - p_y, p_y - col1(BYMAX))
        dl2 = jnp.maximum(dl, jnp.maximum(dbx, dby))
        dpos = jnp.maximum(dl2, 0.0)
        # accumulate the PRODUCT prod *= (1 - clamp*exp(-s*d^2)) instead of
        # the log1p sum — identical soft mask in f32 (soft = 1 - prod
        # saturates at the same point 1-exp(sumlog) rounds to 1.0) and one
        # transcendental per pair instead of two.  clamp folds into the
        # exponent: clamp*exp(t) = exp(t + log clamp).
        p_soft = jnp.exp(dpos * dpos * (-sigmainv) + log_pc)
        prod = prod * (1.0 - p_soft)
        out = [best_z, best_id, prod]
        if fused:
            bu, bv, bnx, bny, bnz = carry[3:]
            u = col1(UX) * p_x + col1(UY) * p_y + col1(UC)
            v = col1(VX) * p_x + col1(VY) * p_y + col1(VC)
            out += [jnp.where(take, u, bu), jnp.where(take, v, bv),
                    jnp.where(take, col1(NXR), bnx),
                    jnp.where(take, col1(NYR), bny),
                    jnp.where(take, col1(NZR), bnz)]
        return tuple(out)

    zeros = jnp.zeros((8, npix), jnp.float32)
    init = [jnp.full((8, npix), _Z_INIT, jnp.float32),
            jnp.full((8, npix), jnp.inf, jnp.float32),
            jnp.ones((8, npix), jnp.float32)]
    if fused:
        init += [zeros, zeros, zeros, zeros, zeros]
    # NB: Mosaic's fori_loop lowering supports only unroll=1 or full unroll;
    # full unroll inflates live ranges (VMEM OOM at 128^2 in round 1)
    fin = jax.lax.fori_loop(0, K // 8, body, tuple(init))
    best_z, best_id, prod = fin[0], fin[1], fin[2]

    zmax = jnp.max(best_z, axis=0, keepdims=True)          # (1, npix)
    covered = zmax > _Z_FLOOR
    winner = (best_z >= zmax)
    idsel = jnp.min(jnp.where(winner, best_id, jnp.inf), axis=0,
                    keepdims=True)
    idx = jnp.where(covered, idsel, -1.0)
    # Mosaic has no reduce_prod lowering — 3-step pairwise tree instead
    p4 = prod[0:4] * prod[4:8]
    p2 = p4[0:2] * p4[2:4]
    prod_all = p2[0:1] * p2[1:2]
    # report sumlog = log prod for API compatibility (prod == 0 underflow ->
    # -inf -> soft == 1 exactly, same as the saturated log-sum path)
    out_refs[0][0, 0, :, :] = idx.astype(jnp.int32)
    out_refs[1][0, 0, :, :] = jnp.log(prod_all)
    if fused:
        sel = winner & (best_id == idsel) & covered
        for k, battr in enumerate(fin[3:]):
            val = jnp.sum(jnp.where(sel, battr, 0.0), axis=0, keepdims=True)
            out_refs[2 + k][0, 0, :, :] = val


def _fwd_call(rows_banded, *, K, n_bands, npix, width, height, sigmainv,
              fused, interpret, n_cols=1):
    B = rows_banded.shape[0]
    R = rows_banded.shape[-1]
    n_cells = n_bands * n_cols
    cell_w = width // n_cols
    band_rows = npix // cell_w
    n_out = 7 if fused else 2
    out_shape = [jax.ShapeDtypeStruct((B, n_cells, 1, npix), jnp.int32)] + [
        jax.ShapeDtypeStruct((B, n_cells, 1, npix), jnp.float32)
        for _ in range(n_out - 1)]
    kernel = functools.partial(_fwd_kernel, K=K, npix=npix, width=width,
                               height=height, sigmainv=sigmainv, fused=fused,
                               n_cols=n_cols)
    outs = pl.pallas_call(
        kernel,
        grid=(B, n_cells),
        in_specs=[pl.BlockSpec((1, 1, K, R), lambda b, n: (b, n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 1, 1, npix), lambda b, n: (b, n, 0, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=out_shape,
        interpret=interpret,
    )(rows_banded)
    return [_uncell(o, B, n_bands, n_cols, band_rows, cell_w) for o in outs]


# ----------------------------------------------------------- backward kernel
_BWD_TPS = 64  # pixels per sub-tile (sublane axis)


def _bwd_kernel(rowsT_ref, g_ref, out_ref, *, K, npix, width, height,
                sigmainv, n_cols):
    cell = pl.program_id(1)

    def rowv(j):
        return rowsT_ref[0, 0, j:j + 1, :]                 # (1, K)

    a0x, a0y, a0c = rowv(A0X), rowv(A0Y), rowv(A0C)
    a1x, a1y, a1c = rowv(A1X), rowv(A1Y), rowv(A1C)
    a2x, a2y, a2c = rowv(A2X), rowv(A2Y), rowv(A2C)
    xmin, xmax = rowv(BXMIN), rowv(BXMAX)
    ymin, ymax = rowv(BYMIN), rowv(BYMAX)

    cell_w = width // n_cols
    band = cell // n_cols
    colb = cell - band * n_cols
    band_rows = npix // cell_w

    def sub(s, acc):
        # pixel sub-tile on the SUBLANE axis, cell-row-major order
        lane = jax.lax.broadcasted_iota(jnp.int32, (_BWD_TPS, 1), 0)
        flat = s * _BWD_TPS + lane                      # index within cell
        r = flat // cell_w
        xi = flat - r * cell_w
        row = band * band_rows + r
        col = colb * cell_w + xi
        p_x = col.astype(jnp.float32) * (2.0 / width) + (1.0 / width - 1.0)
        p_y = row.astype(jnp.float32) * (-2.0 / height) + (1.0 - 1.0 / height)
        g = g_ref[0, 0, pl.ds(s * _BWD_TPS, _BWD_TPS), :]  # (TPS, 1)

        d0 = a0x * p_x + a0y * p_y + a0c                   # (TPS, K)
        d1 = a1x * p_x + a1y * p_y + a1c
        d2 = a2x * p_x + a2y * p_y + a2c
        dl = jnp.maximum(jnp.maximum(d0, d1), d2)
        dbx = jnp.maximum(xmin - p_x, p_x - xmax)
        dby = jnp.maximum(ymin - p_y, p_y - ymax)
        dl2 = jnp.maximum(dl, jnp.maximum(dbx, dby))
        dpos = jnp.maximum(dl2, 0.0)
        p_soft = _P_CLAMP * jnp.exp(dpos * dpos * (-sigmainv))
        # d sumlog/d dpos = -p/(1-p) * (-2*s*dpos) -> chain with g
        gl = g * (2.0 * sigmainv) * dpos * (p_soft / (1.0 - p_soft))

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
        return tuple(a + t for a, t in zip(acc, terms))

    init = tuple(jnp.zeros((1, K), jnp.float32) for _ in range(13))
    acc = jax.lax.fori_loop(0, npix // _BWD_TPS, sub, init)
    for j in range(13):
        out_ref[0, 0, j:j + 1, :] = acc[j]
    out_ref[0, 0, 13:16, :] = jnp.zeros((3, K), jnp.float32)


def _bwd_call(rowsT, g_banded, *, K, n_cells, npix, width, height, sigmainv,
              interpret, n_cols=1):
    B = rowsT.shape[0]
    R = rowsT.shape[2]
    kernel = functools.partial(_bwd_kernel, K=K, npix=npix, width=width,
                               height=height, sigmainv=sigmainv,
                               n_cols=n_cols)
    return pl.pallas_call(
        kernel,
        grid=(B, n_cells),
        in_specs=[
            pl.BlockSpec((1, 1, R, K), lambda b, n: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npix, 1), lambda b, n: (b, n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 16, K), lambda b, n: (b, n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_cells, 16, K), jnp.float32),
        interpret=interpret,
    )(rowsT, g_banded)


def _bwd_stream_kernel(pk_ref, nlive_ref, rowsT_ref, g_ref, out_ref, *,
                       K128, npix, width, height, sigmainv, n_cols,
                       n_cells):
    """Stream backward: one dynamic loop per image over live (cell,
    128-face-lane window) items.  Windows are disjoint, so each item
    independently reduces its moments over the cell's pixels and writes its
    lane slice — no cross-item state; empty cells/windows stay pre-zeroed.
    Dead (padded) face slots produce exactly-zero moments (their p_soft
    underflows to 0).

    ``g_ref`` is (1, n_cells, npix // 128, 128) — pixels on LANES, exact
    VMEM size.  A (npix, 1) column layout would be lane-padded 128x by
    Mosaic (the whole per-image g block sits in VMEM at once because the
    cell walk is dynamic), which overflowed scoped VMEM at 256² big
    templates.  Each 128-pixel row is transposed to the (128, 1) sublane
    column the moment tiles need via a one-hot MXU matmul — exact at
    HIGHEST precision (one nonzero term per output; same argument as
    _gather_rows)."""
    b = pl.program_id(0)
    out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)
    cell_w = width // n_cols
    band_rows_ = npix // cell_w
    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    eye128 = (ii == jj).astype(jnp.float32)

    def body(t, carry):
        p = pk_ref[b, t]
        cell = p & 0xFFF
        w_idx = (p >> 12) & 0xFFF
        woff = pl.multiple_of(w_idx * 128, 128)

        def rowv(j):
            return rowsT_ref[0, pl.ds(cell, 1), j, pl.ds(woff, 128)]

        a0x, a0y, a0c = rowv(A0X), rowv(A0Y), rowv(A0C)
        a1x, a1y, a1c = rowv(A1X), rowv(A1Y), rowv(A1C)
        a2x, a2y, a2c = rowv(A2X), rowv(A2Y), rowv(A2C)
        xmin, xmax = rowv(BXMIN), rowv(BXMAX)
        ymin, ymax = rowv(BYMIN), rowv(BYMAX)

        band = cell // n_cols
        colb = cell - band * n_cols

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
            grow = g_ref[0, pl.ds(cell, 1), s, :]              # (1, 128)
            g = jax.lax.dot_general(                           # (128, 1)
                eye128, grow, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

            d0 = a0x * p_x + a0y * p_y + a0c                  # (TPS, 128)
            d1 = a1x * p_x + a1y * p_y + a1c
            d2 = a2x * p_x + a2y * p_y + a2c
            dl = jnp.maximum(jnp.maximum(d0, d1), d2)
            dbx = jnp.maximum(xmin - p_x, p_x - xmax)
            dby = jnp.maximum(ymin - p_y, p_y - ymax)
            dl2 = jnp.maximum(dl, jnp.maximum(dbx, dby))
            dpos = jnp.maximum(dl2, 0.0)
            p_soft = _P_CLAMP * jnp.exp(dpos * dpos * (-sigmainv))
            gl = g * (2.0 * sigmainv) * dpos * (p_soft / (1.0 - p_soft))

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
            out_ref[0, pl.ds(cell, 1), j, pl.ds(woff, 128)] = acc[j]
        return carry

    jax.lax.fori_loop(0, nlive_ref[b], body, 0)


def _bwd_stream_call(pk, nlive, rowsT, g_banded, *, K128, n_cells, npix,
                     width, height, sigmainv, interpret, n_cols):
    B = rowsT.shape[0]
    R = rowsT.shape[2]
    kernel = functools.partial(_bwd_stream_kernel, K128=K128, npix=npix,
                               width=width, height=height,
                               sigmainv=sigmainv, n_cols=n_cols,
                               n_cells=n_cells)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n_cells, R, K128), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cells, npix // 128, 128),
                         lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_cells, 16, K128),
                               lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_cells, 16, K128), jnp.float32),
        compiler_params=_STREAM_COMPILER_PARAMS,
        interpret=interpret)(pk, nlive, rowsT, g_banded)


def _soft_backward(fvi, fz, fnz, g_sumlog, *, sigmainv, height, width,
                   band_rows, capacity, interpret, n_cols=1, stream=None):
    """g_sumlog (B, P) -> g_fvi (B, F, 3, 2) via the Pallas moment kernel +
    jax.vjp through the XLA coefficient precompute.  ``stream`` (default:
    stream_enabled()) selects the live-window stream backward; the padded
    capacity rounds up to 128 lanes there."""
    if stream is None:
        stream = stream_enabled()
    B, F = fvi.shape[0], fvi.shape[1]
    n_bands = height // band_rows
    cell_w = width // n_cols
    n_cells = n_bands * n_cols
    npix = band_rows * cell_w
    rows = jax.vmap(_face_rows)(fvi, fz, fnz)              # (B, F+1, R_PLAIN)
    K = -(-capacity // 128) * 128 if stream else capacity
    rowsT, lists, counts, _ = _bin_gather_rows(rows, fvi, fnz, n_bands,
                                               K, n_cols,
                                               transposed=True)
    # (B, NCELL, R, K) — the backward kernel's native layout, produced
    # directly by the transposed contraction (no relayout)
    g_c = g_sumlog.reshape(B, n_bands, band_rows, n_cols, cell_w)
    g_c = jnp.transpose(g_c, (0, 1, 3, 2, 4))              # cell-major
    if stream:
        # pixels on lanes (exact VMEM size; see _bwd_stream_kernel docstring)
        g_packed = g_c.reshape(B, n_cells, npix // 128, 128)
        pk, nlive = jax.vmap(
            lambda c: _build_stream(c, K // 128, n_cells, chunk=128))(counts)
        G = _bwd_stream_call(pk, nlive, rowsT, g_packed, K128=K,
                             n_cells=n_cells, npix=npix, width=width,
                             height=height, sigmainv=sigmainv,
                             interpret=interpret, n_cols=n_cols)
    else:
        g_banded = g_c.reshape(B, n_cells, npix, 1)
        G = _bwd_call(rowsT, g_banded, K=capacity, n_cells=n_cells,
                      npix=npix, width=width, height=height,
                      sigmainv=sigmainv, interpret=interpret,
                      n_cols=n_cols)                       # (B, NCELL, 16, K)

    def per_image(G_i, lists_i, fvi_i):
        vals = jnp.transpose(G_i[:, :13, :], (0, 2, 1)).reshape(-1, 13)
        ids = lists_i.reshape(-1)
        g13 = jnp.zeros((F + 1, 13), jnp.float32).at[ids].add(vals)[:F]
        _, vjp = jax.vjp(_coeffs13, fvi_i)
        return vjp(g13)[0]

    return jax.vmap(per_image)(G, lists, fvi)


# ------------------------------------------------------------- public: plain
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _plain(fvi, fz, fnz, sigmainv, height, width, band_rows, capacity,
           interpret, n_cols):
    n_bands = height // band_rows
    npix = band_rows * (width // n_cols)
    rows = jax.vmap(_face_rows)(fvi, fz, fnz)
    banded, lists, _, dropped = _bin_gather_rows(rows, fvi, fnz, n_bands,
                                                 capacity, n_cols)
    idx, sumlog = _fwd_call(banded, K=capacity, n_bands=n_bands, npix=npix,
                            width=width, height=height, sigmainv=sigmainv,
                            fused=False, interpret=interpret, n_cols=n_cols)
    return idx, sumlog, dropped


def _plain_fwd(fvi, fz, fnz, sigmainv, height, width, band_rows, capacity,
               interpret, n_cols):
    out = _plain(fvi, fz, fnz, sigmainv, height, width, band_rows, capacity,
                 interpret, n_cols)
    return out, (fvi, fz, fnz)


def _plain_bwd(sigmainv, height, width, band_rows, capacity, interpret,
               n_cols, res, cots):
    fvi, fz, fnz = res
    _, g_sumlog, _ = cots
    g_fvi = _soft_backward(fvi, fz, fnz, g_sumlog, sigmainv=sigmainv,
                           height=height, width=width, band_rows=band_rows,
                           capacity=capacity, interpret=interpret,
                           n_cols=n_cols)
    return g_fvi, jnp.zeros_like(fz), jnp.zeros_like(fnz)


_plain.defvjp(_plain_fwd, _plain_bwd)


def _auto_cells(height, width):
    """(band_rows, n_cols): cells of ~1024-2048 px with cell width >= 128.
    The column split halves the worst-case per-cell face count (close
    cameras) so the static capacity can stay tight.  Env overrides
    MAGICMIRROR_BAND_ROWS / MAGICMIRROR_N_COLS exist for tuning sweeps."""
    import os

    n_cols = max(1, width // 128)
    while n_cols > 1 and width % n_cols:
        n_cols //= 2
    n_cols = int(os.environ.get("MAGICMIRROR_N_COLS", n_cols))
    cell_w = width // n_cols
    br = max(1, 1024 // cell_w)
    while br > 1 and height % br:
        br //= 2
    br = int(os.environ.get("MAGICMIRROR_BAND_ROWS", br))
    return br, n_cols


def _auto_band_rows(height, width):
    br = max(1, 2048 // width)
    while br > 1 and height % br:
        br //= 2
    return br


def rasterize_plain_v4(fvi, fz, fnz, sigmainv=7000.0, height=256, width=256,
                       band_rows=None, capacity=None, interpret=None,
                       n_cols=None):
    """Batched phase-1 rasterization (v4 kernel).

    fvi (B, F, 3, 2) NDC xy; fz (B, F, 3) camera z; fnz (B, F) normal z.
    Returns (best_idx (B, P) i32 with -1 = background, sumlog (B, P),
    dropped (B,) i32 = capacity-overflow pair count — 0 means exact).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    height, width = int(height), int(width)
    if band_rows is None or n_cols is None:
        abr, anc = _auto_cells(height, width)
        band_rows = band_rows or abr
        n_cols = n_cols or anc
    n_bands = height // band_rows
    if capacity is None:
        capacity = default_capacity(fvi.shape[1], n_bands * n_cols)
    assert (height % band_rows == 0 and width % n_cols == 0
            and (band_rows * (width // n_cols)) % 128 == 0), (
        "v4 kernel needs H %% band_rows == 0 and cell npix %% 128 == 0")
    return _plain(fvi, fz, fnz, float(sigmainv), height, width,
                  int(band_rows), int(capacity), bool(interpret),
                  int(n_cols))


# ------------------------------------------------------------- public: fused
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _fused(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height, width,
           band_rows, capacity, interpret, n_cols):
    n_bands = height // band_rows
    npix = band_rows * (width // n_cols)
    rows = jax.vmap(
        lambda v, z, n, fn: _face_rows(v, z, n, face_uvs, fn))(
        fvi, fz, fnz, face_normals)
    banded, lists, _, dropped = _bin_gather_rows(rows, fvi, fnz, n_bands,
                                                 capacity, n_cols)
    idx, sumlog, u, v, nx, ny, nz = _fwd_call(
        banded, K=capacity, n_bands=n_bands, npix=npix, width=width,
        height=height, sigmainv=sigmainv, fused=True, interpret=interpret,
        n_cols=n_cols)
    soft = 1.0 - jnp.exp(sumlog)
    uv = jnp.stack([u, v], axis=-1)
    normal = jnp.stack([nx, ny, nz], axis=-1)
    hard = (idx >= 0).astype(jnp.float32)
    return idx, soft, uv, normal, hard, dropped


def _fused_fwd(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height, width,
               band_rows, capacity, interpret, n_cols):
    out = _fused(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height,
                 width, band_rows, capacity, interpret, n_cols)
    idx, soft = out[0], out[1]
    return out, (fvi, fz, fnz, face_uvs, face_normals, idx, soft)


def _fused_bwd(sigmainv, height, width, band_rows, capacity, interpret,
               n_cols, res, cots):
    from ..rasterize import _interpolate_selected, pixel_grid

    fvi, fz, fnz, face_uvs, face_normals, idx, soft = res
    _, g_soft, g_uv, g_normal, _, _ = cots
    px, py = pixel_grid(height, width)

    # attribute cotangents: differentiable phase-2 recompute at the saved
    # winner (the DIB-R analytic backward as autodiff on an O(P) gather)
    def attrs(fvi_b, uvs, normals_b):
        F = uvs.shape[0]

        def one(fvi_i, idx_i, normals_i):
            feats = jnp.concatenate(
                [jnp.broadcast_to(uvs, (F, 3, 2)),
                 jnp.broadcast_to(normals_i[:, None, :], (F, 3, 3))], axis=-1)
            out, _ = _interpolate_selected(px, py, idx_i, fvi_i,
                                           jnp.zeros((F, 3)), feats)
            return out[:, :2], out[:, 2:5]

        return jax.vmap(one)(fvi_b, idx, normals_b)

    _, vjp_attrs = jax.vjp(attrs, fvi, face_uvs, face_normals)
    g_fvi_a, g_uvs, g_normals = vjp_attrs((g_uv, g_normal))

    # soft cotangent: soft = 1 - exp(sumlog) => d soft/d sumlog = soft - 1
    g_sumlog = g_soft * (soft - 1.0)
    g_fvi_s = _soft_backward(fvi, fz, fnz, g_sumlog, sigmainv=sigmainv,
                             height=height, width=width, band_rows=band_rows,
                             capacity=capacity, interpret=interpret,
                             n_cols=n_cols)
    return (g_fvi_a + g_fvi_s, jnp.zeros_like(fz), jnp.zeros_like(fnz),
            g_uvs, g_normals)


_fused.defvjp(_fused_fwd, _fused_bwd)


def rasterize_fused_v4(fvi, fz, fnz, face_uvs, face_normals, sigmainv=7000.0,
                       height=256, width=256, band_rows=None, capacity=None,
                       interpret=None, n_cols=None):
    """Batched fused rasterization: phase 1 + winner uv/normal selection in
    ONE kernel (no phase-2 gather pass on the forward path).

    fvi (B, F, 3, 2); fz (B, F, 3); fnz (B, F); face_uvs (F, 3, 2) shared;
    face_normals (B, F, 3).
    Returns (idx (B,P) i32, soft (B,P), uv (B,P,2), normal (B,P,3),
    hard (B,P), dropped (B,) i32).

    Gradients: uv/normal cotangents route through the differentiable XLA
    phase-2 recompute; the soft cotangent through the Pallas backward kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    height, width = int(height), int(width)
    if band_rows is None or n_cols is None:
        abr, anc = _auto_cells(height, width)
        band_rows = band_rows or abr
        n_cols = n_cols or anc
    n_bands = height // band_rows
    if capacity is None:
        capacity = default_capacity(fvi.shape[1], n_bands * n_cols)
    assert (height % band_rows == 0 and width % n_cols == 0
            and (band_rows * (width // n_cols)) % 128 == 0), (
        "v4 kernel needs H %% band_rows == 0 and cell npix %% 128 == 0")
    return _fused(fvi, fz, fnz, face_uvs, face_normals, float(sigmainv),
                  height, width, int(band_rows), int(capacity),
                  bool(interpret), int(n_cols))


# ------------------------------------------------------- v5: stream forward
# The v4 forward iterates capacity/8 face chunks for EVERY cell — at the
# training cameras only 25-50% of those slots hold live faces (the rest are
# exact identities: dead rows contribute prod *= 1.0 and can never win the
# z-test).  v5 walks a flat, cell-major stream of only the LIVE face chunks
# with ONE dynamic-bound fori_loop per image (one pipeline flush per image,
# the texture_cells lesson) — bitwise-identical outputs, ~occupancy× less
# kernel work.  The backward reuses the v4 capacity kernel unchanged.

def _build_stream(counts, maxc: int, n_cells: int, chunk: int = 8):
    """counts (NC,) i32 -> (pk (NC*maxc,) i32, nlive () i32).

    pk packs cell (12 b) | chunk (12 b) | first (bit 24) | last (bit 25),
    live entries first in cell-major order; entries past nlive are never
    executed.  ``chunk`` is the faces-per-entry granularity (8 sublane rows
    for the forward, 128 lanes for the backward)."""
    nch = -(-counts // chunk)                              # chunks per cell
    ci = jnp.arange(maxc, dtype=jnp.int32)
    live = ci[None, :] < nch[:, None]                      # (NC, maxc)
    cells = jnp.arange(n_cells, dtype=jnp.int32)[:, None]
    slot = cells * maxc + ci[None, :]
    key = jnp.where(live, slot, n_cells * maxc)
    order = jnp.argsort(key.reshape(-1)).astype(jnp.int32)
    cell_t = order // maxc
    ci_t = order - cell_t * maxc
    first = (ci_t == 0).astype(jnp.int32)
    last = (ci_t == nch[cell_t] - 1).astype(jnp.int32)
    pk = cell_t | (ci_t << 12) | (first << 24) | (last << 25)
    nlive = live.sum().astype(jnp.int32)
    return pk.astype(jnp.int32), nlive


def _fwd_stream_kernel(pk_ref, nlive_ref, rows_ref, o_idx, o_sumlog, o_u,
                       o_v, o_nx, o_ny, o_nz, acc, *, npix, width, height,
                       sigmainv, n_cols, n_cells):
    """Per image: pre-zero every cell's outputs, then walk the live chunk
    stream.  acc (64, npix) scratch rows: 0:8 best_z, 8:16 best_id,
    16:24 prod, 24:32 u, 32:40 v, 40:64 normal xyz."""
    b = pl.program_id(0)
    log_pc = float(np.log(_P_CLAMP))
    cell_w = width // n_cols
    band_rows_ = npix // cell_w

    o_idx[...] = jnp.full(o_idx.shape, -1, jnp.int32)
    for o in (o_sumlog, o_u, o_v, o_nx, o_ny, o_nz):
        o[...] = jnp.zeros(o.shape, jnp.float32)

    def body(t, carry):
        p = pk_ref[b, t]
        cell = p & 0xFFF
        chunk = (p >> 12) & 0xFFF
        first = (p >> 24) & 1
        last = (p >> 25) & 1

        band = cell // n_cols
        colb = cell - band * n_cols
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

        base = pl.multiple_of(chunk * 8, 8)
        f = rows_ref[0, pl.ds(cell, 1), pl.ds(base, 8), :][0]   # (8, R)

        def col1(j):
            return f[:, j:j + 1]                                # (8, 1)

        d0 = col1(A0X) * p_x + col1(A0Y) * p_y + col1(A0C)      # (8, npix)
        d1 = col1(A1X) * p_x + col1(A1Y) * p_y + col1(A1C)
        d2 = col1(A2X) * p_x + col1(A2Y) * p_y + col1(A2C)
        dl = jnp.maximum(jnp.maximum(d0, d1), d2)
        inside = dl <= 0.0
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
        p_soft = jnp.exp(dpos * dpos * (-sigmainv) + log_pc)
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


def _fwd_stream_call(pk, nlive, rows_banded, *, n_bands, npix, width, height,
                     sigmainv, interpret, n_cols):
    B = rows_banded.shape[0]
    n_cells = n_bands * n_cols
    cell_w = width // n_cols
    band_rows_ = npix // cell_w
    K8, R = rows_banded.shape[2], rows_banded.shape[3]
    out_shape = [jax.ShapeDtypeStruct((B, n_cells, 1, npix), jnp.int32)] + [
        jax.ShapeDtypeStruct((B, n_cells, 1, npix), jnp.float32)
        for _ in range(6)]
    kernel = functools.partial(_fwd_stream_kernel, npix=npix, width=width,
                               height=height, sigmainv=sigmainv,
                               n_cols=n_cols, n_cells=n_cells)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, n_cells, K8, R),
                               lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, n_cells, 1, npix),
                                lambda b, *_: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)] * 7,
        scratch_shapes=[pltpu.VMEM((64, npix), jnp.float32)],
    )
    outs = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                          compiler_params=_STREAM_COMPILER_PARAMS,
                          interpret=interpret)(pk, nlive, rows_banded)
    return [_uncell(o, B, n_bands, n_cols, band_rows_, cell_w) for o in outs]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _fused_stream(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height,
                  width, band_rows, capacity, interpret, n_cols):
    n_bands = height // band_rows
    n_cells = n_bands * n_cols
    npix = band_rows * (width // n_cols)
    rows = jax.vmap(
        lambda v, z, n, fn: _face_rows(v, z, n, face_uvs, fn))(
        fvi, fz, fnz, face_normals)
    banded, lists, counts, dropped = _bin_gather_rows(
        rows, fvi, fnz, n_bands, capacity, n_cols)
    pk, nlive = jax.vmap(
        lambda c: _build_stream(c, capacity // 8, n_cells))(counts)
    idx, sumlog, u, v, nx, ny, nz = _fwd_stream_call(
        pk, nlive, banded, n_bands=n_bands, npix=npix, width=width,
        height=height, sigmainv=sigmainv, interpret=interpret, n_cols=n_cols)
    soft = 1.0 - jnp.exp(sumlog)
    uv = jnp.stack([u, v], axis=-1)
    normal = jnp.stack([nx, ny, nz], axis=-1)
    hard = (idx >= 0).astype(jnp.float32)
    return idx, soft, uv, normal, hard, dropped


def _fused_stream_fwd(fvi, fz, fnz, face_uvs, face_normals, sigmainv, height,
                      width, band_rows, capacity, interpret, n_cols):
    out = _fused_stream(fvi, fz, fnz, face_uvs, face_normals, sigmainv,
                        height, width, band_rows, capacity, interpret,
                        n_cols)
    idx, soft = out[0], out[1]
    return out, (fvi, fz, fnz, face_uvs, face_normals, idx, soft)


# the backward is IDENTICAL to v4's (capacity kernel + phase-2 recompute)
_fused_stream.defvjp(_fused_stream_fwd, _fused_bwd)


def stream_enabled() -> bool:
    """Whether the renderer should use the v5 stream forward (latched at
    import; MAGICMIRROR_RASTER_STREAM=0 reverts to the v4 capacity loop)."""
    import os

    return os.environ.get("MAGICMIRROR_RASTER_STREAM", "1") != "0"


def rasterize_fused_v5(fvi, fz, fnz, face_uvs, face_normals, sigmainv=7000.0,
                       height=256, width=256, band_rows=None, capacity=None,
                       interpret=None, n_cols=None):
    """v5 stream-forward fused rasterization — same contract and (bitwise)
    results as :func:`rasterize_fused_v4`, ~pair-occupancy× less forward
    work; the backward path is shared with v4."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    height, width = int(height), int(width)
    if band_rows is None or n_cols is None:
        abr, anc = _auto_cells(height, width)
        band_rows = band_rows or abr
        n_cols = n_cols or anc
    n_bands = height // band_rows
    if capacity is None:
        capacity = default_capacity(fvi.shape[1], n_bands * n_cols)
    capacity = -(-int(capacity) // 8) * 8
    n_cells = n_bands * n_cols
    assert n_cells < (1 << 12) and capacity // 8 < (1 << 12), (
        "stream packing: cell/chunk ids must fit 12 bits")
    assert (height % band_rows == 0 and width % n_cols == 0
            and (band_rows * (width // n_cols)) % 128 == 0), (
        "v5 kernel needs H %% band_rows == 0 and cell npix %% 128 == 0")
    return _fused_stream(fvi, fz, fnz, face_uvs, face_normals,
                         float(sigmainv), height, width, int(band_rows),
                         int(capacity), bool(interpret), int(n_cols))
