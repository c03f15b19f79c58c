#!/usr/bin/env python
"""Ablate the texture_cells kernel body to find the per-chunk overhead."""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from magicmirror.ops.pallas.texture_cells import (  # noqa: E402
    BS, BPC, _FAR_ROW, _build_chunks, _to_cells, _uv_to_texels, _FAR_Y,
    cell_shape, default_chunk_capacity)


def make_kernel(level, Ht, Wt, NC, npix, NBLK):
    K = BS * BPC

    def kern(pk1_ref, pk2_ref, nlive_ref, tex_ref, yc_ref, xc_ref, out_ref,
             acc):
        b = pl.program_id(0)

        def body(t, carry):
            p1 = pk1_ref[b, t]
            p2 = pk2_ref[b, t]
            cell = p1 & 0xFFFF
            first = (p1 >> 16) & 1
            last = (p1 >> 17) & 1
            if level >= 1:
                @pl.when(first == 1)
                def _():
                    acc[...] = jnp.zeros((3, Wt, npix), jnp.float32)
            if level >= 2:
                kio = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
                jj = kio // BS
                rr = kio - jj * BS
                blkv = (p2 >> (5 * jj)) & 31
                rowv = jnp.where(blkv < NBLK,
                                 (BS * blkv + rr).astype(jnp.float32),
                                 _FAR_ROW)
                y = yc_ref[0, pl.ds(cell, 1), :]
                w = jax.nn.relu(1.0 - jnp.abs(rowv - y)).astype(jnp.bfloat16)
            if level >= 3:
                wins = []
                for c in range(3):
                    parts = []
                    for j in range(BPC):
                        bj = jnp.clip((p2 >> (5 * j)) & 31, 0, NBLK - 1)
                        parts.append(tex_ref[0, pl.ds(c * Ht + BS * bj, BS), :])
                    wins.append(jnp.concatenate(parts, axis=0))
            if level >= 4:
                for c in range(3):
                    acc[c] = acc[c] + jax.lax.dot_general(
                        wins[c], w, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            if level >= 5:
                @pl.when(last == 1)
                def _():
                    xv = xc_ref[0, pl.ds(cell, 1), :]
                    xi = jax.lax.broadcasted_iota(jnp.int32, (Wt, 1), 0
                                                  ).astype(jnp.float32)
                    wx = jax.nn.relu(1.0 - jnp.abs(xi - xv)).astype(jnp.bfloat16)
                    outs = []
                    for c in range(3):
                        s1 = acc[c].astype(jnp.bfloat16)
                        prod = (wx * s1).astype(jnp.float32)
                        outs.append(jnp.sum(prod, axis=0, keepdims=True))
                    pad = jnp.zeros((8 - 3, npix), jnp.float32)
                    out_ref[0, pl.ds(cell, 1)] = jnp.concatenate(
                        outs + [pad], axis=0)[None]
            if level < 5:
                @pl.when(last == 1)
                def _():
                    out_ref[0, pl.ds(cell, 1)] = jnp.zeros((1, 8, npix),
                                                           jnp.float32)
            return carry

        jax.lax.fori_loop(0, nlive_ref[b], body, 0)

    return kern


def main():
    rs = np.random.RandomState(0)
    B, S = 32, 256
    Ht, Wt = 2 * S, S
    ch, cw = cell_shape(S, S)
    NC = (S // ch) * (S // cw)
    npix = ch * cw
    NBLK = Ht // BS
    tcap = default_chunk_capacity(NC)

    # real uv/mask from the dump
    d = np.load("/tmp/uv_dump.npz")
    uv = jnp.asarray(d["uv"][:B].astype(np.float32))
    hard = jnp.asarray(d["hard"][:B].astype(np.float32))
    tex = jnp.asarray(rs.rand(B, Ht, Wt, 3), jnp.float32)

    y, x = _uv_to_texels(uv, Ht, Wt)
    m = hard > 0.5
    yc = _to_cells(jnp.where(m, y, _FAR_Y), ch, cw)
    xc = _to_cells(x, ch, cw)
    mc = _to_cells(m.astype(jnp.float32), ch, cw) > 0.5
    pk1, pk2, nlive, dropped = jax.jit(
        functools.partial(_build_chunks, Ht=Ht, Wt=Wt, tcap=tcap))(yc, xc, mc)
    print("nlive mean", float(np.mean(np.asarray(nlive))), "dropped",
          int(np.asarray(dropped).sum()))
    texT = jnp.transpose(tex, (0, 3, 1, 2)).reshape(B, 3 * Ht, Wt).astype(
        jnp.bfloat16)

    for level in (1, 4, 5):
        kern = make_kernel(level, Ht, Wt, NC, npix, NBLK)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 3 * Ht, Wt), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NC, npix), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NC, npix), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NC + 1, 8, npix),
                                   lambda b, *_: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((3, Wt, npix), jnp.float32)],
        )
        f = jax.jit(lambda a, b_, c, t, yy, xx: pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NC + 1, 8, npix), jnp.float32),
        )(a, b_, c, t, yy, xx))
        o = f(pk1, pk2, nlive, texT, yc, xc)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(pk1, pk2, nlive, texT, yc, xc)
        jax.block_until_ready(o)
        print(f"level {level}: {(time.perf_counter()-t0)/20*1000:.2f} ms")


if __name__ == "__main__":
    main()
