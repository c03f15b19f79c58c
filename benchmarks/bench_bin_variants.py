"""In-context comparison of binning one-hot formulations (round-3 follow-up).

The sort-free cumsum-rank compaction materializes a (NC*K, F) one-hot and
contracts it with the (F+1, R) coefficient rows at fp32 HIGHEST — per image
that is 64*160 x 1281 x 26 (~0.7 GFLOP through the 6-pass fp32 MXU path)
plus the one-hot's HBM traffic.  Two candidate cuts, both EXACT:

  * bf16 one-hot: 0.0/1.0 are exact in bf16; jnp promotes the dot back to
    f32 HIGHEST, so only the materialized one-hot shrinks (half traffic).
  * int8 one-hot: same argument, quarter traffic; the dot still runs as a
    promoted f32 HIGHEST contraction, not the slow int8 MXU path.

(A bf16x3-split-rows variant with native bf16 dots was exact on paper but
XLA:TPU's dot-merger pre-sums the shared-operand parts in bf16, silently
dropping the lo/llo corrections — see the note in the code.)

Cumulative-prefix timing (camera -> camera+bin), the only methodology that
is trustworthy through the remote-execution tunnel.  Also asserts the
variants are BITWISE equal to the baseline inside one jit.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax

if os.environ.get("MAGICMIRROR_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def bench(f, *args, iters=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from magicmirror.geometry import camera as cam
    from magicmirror.ops.pallas.rasterize_v4 import (
        FID, _auto_cells, _build_stream, _face_rows, _overlap_cells,
        default_capacity)
    from magicmirror.render.renderer import DiffRender

    B = int(os.environ.get("BENCH_BATCH", "32"))
    S = int(os.environ.get("BENCH_SIZE", "256"))
    template = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "template", "sphere.obj")
    dr = DiffRender(template, S, ratio=1.0, backend="pallas")
    rs = np.random.RandomState(0)
    V = dr.num_vertices
    att = {
        "azimuths": jnp.asarray(rs.uniform(-180, 180, B), jnp.float32),
        "elevations": jnp.asarray(rs.uniform(0, 30, B), jnp.float32),
        "distances": jnp.asarray(rs.uniform(2, 4, B), jnp.float32),
        "biases": jnp.asarray(rs.uniform(-0.2, 0.2, (B, 2)), jnp.float32),
        "vertices": jnp.asarray(
            dr.vertices_init[None] + rs.uniform(-0.05, 0.05, (B, V, 3)),
            jnp.float32),
    }
    br, ncols = _auto_cells(S, S)
    n_bands = S // br
    n_cells = n_bands * ncols
    K = default_capacity(dr.num_faces, n_cells)
    F = dr.num_faces

    def camera(a):
        B_ = a["azimuths"].shape[0]
        object_pos = jnp.concatenate([a["biases"], jnp.zeros((B_, 1))], 1)
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B_, 3))
        pos = cam.camera_position_from_spherical_angles(
            a["distances"], a["elevations"], a["azimuths"])
        tf = cam.generate_transformation_matrix(pos, object_pos, up)
        fvc, fvi, fn = cam.prepare_vertices(a["vertices"], dr.faces,
                                            dr.cam_proj, tf)
        return fvi, fvc[:, :, :, 2], fn[:, :, 2], fn

    def rows_of(a):
        fvi, fz, fnz, fn = camera(a)
        rows = jax.vmap(
            lambda v, z, n, f_: _face_rows(v, z, n, dr.face_uvs, f_))(
            fvi, fz, fnz, fn)
        return rows, fvi, fnz

    def oh_counts(fvi_i, fnz_i):
        overlap = _overlap_cells(fvi_i, fnz_i, n_bands, ncols)   # (NC, F)
        rank = jnp.cumsum(overlap.astype(jnp.int32), axis=1)
        total = rank[:, -1]
        counts = jnp.minimum(total, K)
        slots = jnp.arange(K, dtype=jnp.int32)
        oh = ((rank[:, None, :] == (slots + 1)[None, :, None])
              & overlap[:, None, :])                            # (NC, K, F)
        empty = (slots[None, :] >= counts[:, None]).astype(jnp.float32)
        return oh, empty, counts

    def variant_base(rows_i, fvi_i, fnz_i):
        oh, empty, counts = oh_counts(fvi_i, fnz_i)
        banded = jnp.einsum("ckf,fr->ckr", oh.astype(jnp.float32),
                            rows_i[:F], preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        return banded + empty[:, :, None] * rows_i[F][None, None, :], counts

    def variant_bf16oh(rows_i, fvi_i, fnz_i):
        oh, empty, counts = oh_counts(fvi_i, fnz_i)
        banded = jnp.einsum("ckf,fr->ckr", oh.astype(jnp.bfloat16),
                            rows_i[:F], preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        return banded + empty[:, :, None] * rows_i[F][None, None, :], counts

    # NOTE a bf16x3-split variant (rows = hi+lo+llo in three bf16 parts,
    # native bf16 dots) was tried and is EXACT on paper, but XLA:TPU's dot
    # rewrites (slice-of-dot -> dots, then dot merger pre-summing the
    # shared-operand parts IN BF16) silently collapse hi+lo+llo back to
    # bf16(r) — measured 42k mismatches, the lo/llo contributions gone.
    # Do not re-land without a compiler-level guarantee.
    def variant_int8oh(rows_i, fvi_i, fnz_i):
        # int8 one-hot (quarter HBM traffic); jnp promotes int8 x f32 to a
        # f32 dot, so the contraction itself is the same HIGHEST fp32
        # one-nonzero-per-output exact selection as the baseline
        oh, empty, counts = oh_counts(fvi_i, fnz_i)
        banded = jnp.einsum("ckf,fr->ckr", oh.astype(jnp.int8),
                            rows_i[:F], preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        return banded + empty[:, :, None] * rows_i[F][None, None, :], counts

    def mk_stage(variant):
        def stage(a):
            rows, fvi, fnz = rows_of(a)
            banded, counts = jax.vmap(
                lambda r, v, n: variant(r, v, n))(rows, fvi, fnz)
            pk, nlive = jax.vmap(
                lambda c: _build_stream(c, K // 8, n_cells))(counts)
            return banded, pk, nlive
        return stage

    from magicmirror.ops.pallas.rasterize_v4 import _bin_lists

    @jax.jit
    def parity(a):
        rows, fvi, fnz = rows_of(a)
        b0, _ = jax.vmap(lambda r, v, n: variant_base(r, v, n))(
            rows, fvi, fnz)
        b1, _ = jax.vmap(lambda r, v, n: variant_bf16oh(r, v, n))(
            rows, fvi, fnz)
        b2, _ = jax.vmap(lambda r, v, n: variant_int8oh(r, v, n))(
            rows, fvi, fnz)
        # ground truth: sort-based lists + plain row gather
        lists, _ = jax.vmap(
            lambda v, n: _bin_lists(v, n, n_bands, K, ncols))(fvi, fnz)
        gt = jax.vmap(lambda r, l: r[l])(rows, lists).reshape(b0.shape)
        return (jnp.sum((b0 != b1).astype(jnp.int32)),
                jnp.sum((b0 != b2).astype(jnp.int32)),
                jnp.max(jnp.abs(b0 - b2)),
                jnp.sum((b0 != gt).astype(jnp.int32)),
                jnp.sum((b2 != gt).astype(jnp.int32)))

    m1, m2, d2, e0, e2 = parity(att)
    print(f"bitwise mismatches: bf16oh={int(m1)} int8oh={int(m2)} "
          f"(int8oh maxabs {float(d2):.3e}) base-vs-gt={int(e0)} "
          f"int8oh-vs-gt={int(e2)}")

    t_cam = bench(jax.jit(camera), att) * 1e3
    print(f"camera only        : {t_cam:7.2f} ms")
    for name, v in (("base f32 HIGHEST", variant_base),
                    ("bf16 one-hot    ", variant_bf16oh),
                    ("int8 one-hot    ", variant_int8oh)):
        t = bench(jax.jit(mk_stage(v)), att) * 1e3
        print(f"camera+bin {name}: {t:7.2f} ms  (bin Δ {t-t_cam:6.2f})")


if __name__ == "__main__":
    main()
