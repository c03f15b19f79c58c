"""Cumulative-prefix profile of DiffRender.render on TPU: where do the
milliseconds actually go in context?  (Round-3 version: profiles the v5
stream rasterizer + cell-windowed texture pipeline the renderer actually
runs; per-stage deltas are cumulative-prefix differences, the only timing
methodology that proved trustworthy through the remote tunnel.)"""
import os
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import os as _o
_o.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                        "/tmp/jax_tpu_cache")  # reuse tunnel compiles
import jax
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
    from magicmirror.ops.pallas import texture_cells as tc
    from magicmirror.ops.pallas.rasterize_v4 import (
        _auto_cells, _bin_gather_rows, _build_stream, _face_rows,
        default_capacity,
        rasterize_fused_v5)
    from magicmirror.ops.shading import spherical_harmonic_lighting
    from magicmirror.render.renderer import DiffRender

    B = int(os.environ.get("BENCH_BATCH", "32"))
    S = int(os.environ.get("BENCH_SIZE", "256"))
    template = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "template",
                            os.environ.get("BENCH_TEMPLATE", "sphere.obj"))
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
        "textures": jnp.asarray(rs.rand(B, 2 * S, S, 3), jnp.float32),
        "lights": jnp.asarray(rs.rand(B, 9), jnp.float32),
        "bg": None,
        "delta_vertices": jnp.zeros((B, V, 3), jnp.float32),
    }

    br, ncols = _auto_cells(S, S)
    n_bands = S // br
    n_cells = n_bands * ncols
    cap = default_capacity(dr.num_faces, n_cells)
    F = dr.num_faces

    def stage_camera(a):
        B_ = a["azimuths"].shape[0]
        object_pos = jnp.concatenate(
            [a["biases"], jnp.zeros((B_, 1))], axis=1)
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B_, 3))
        pos = cam.camera_position_from_spherical_angles(
            a["distances"], a["elevations"], a["azimuths"])
        tf = cam.generate_transformation_matrix(pos, object_pos, up)
        return cam.prepare_vertices(a["vertices"], dr.faces, dr.cam_proj, tf)

    def stage_prep(a):
        """camera + coeff rows + bin lists + banded gather + stream build —
        everything ahead of the pallas launch."""
        fvc, fvi, fn = stage_camera(a)
        fz, fnz = fvc[:, :, :, 2], fn[:, :, 2]
        rows = jax.vmap(
            lambda v, z, n, f_: _face_rows(v, z, n, dr.face_uvs, f_))(
            fvi, fz, fnz, fn)
        banded, lists, counts, dropped = _bin_gather_rows(
            rows, fvi, fnz, n_bands, cap, ncols)
        pk, nlive = jax.vmap(
            lambda c: _build_stream(c, cap // 8, n_cells))(counts)
        return banded, pk, nlive, dropped

    def stage_rows(a):
        fvc, fvi, fn = stage_camera(a)
        fz, fnz = fvc[:, :, :, 2], fn[:, :, 2]
        return jax.vmap(
            lambda v, z, n, f_: _face_rows(v, z, n, dr.face_uvs, f_))(
            fvi, fz, fnz, fn)

    def stage_bin(a):
        fvc, fvi, fn = stage_camera(a)
        fz, fnz = fvc[:, :, :, 2], fn[:, :, 2]
        rows = jax.vmap(
            lambda v, z, n, f_: _face_rows(v, z, n, dr.face_uvs, f_))(
            fvi, fz, fnz, fn)
        banded, lists, counts, dropped = _bin_gather_rows(
            rows, fvi, fnz, n_bands, cap, ncols)
        return banded, counts, dropped

    def stage_raster(a):
        fvc, fvi, fn = stage_camera(a)
        return rasterize_fused_v5(fvi, fvc[:, :, :, 2], fn[:, :, 2],
                                  dr.face_uvs, fn, height=S, width=S)

    def stage_texture(a):
        idx, soft, uv, normal, hard, dropped = stage_raster(a)
        texcoord = uv.reshape(B, S, S, 2)
        out, tdrop = tc.texture_render(texcoord, a["textures"],
                                       hard.reshape(B, S, S))
        return out, soft, tdrop

    def stage_texbuild(a):
        """raster + the texture chunk-stream BUILD only (no tex kernel):
        splits the texture stage into its XLA glue vs Pallas kernel."""
        idx, soft, uv, normal, hard, dropped = stage_raster(a)
        texcoord = uv.reshape(B, S, S, 2)
        Ht, Wt = a["textures"].shape[1], a["textures"].shape[2]
        ch, cw = tc.cell_shape(S, S)
        y, x = tc._uv_to_texels(texcoord, Ht, Wt)
        m = hard.reshape(B, S, S) > 0.5
        yc = tc._to_cells(jnp.where(m, y, tc._FAR_Y), ch, cw)
        xc = tc._to_cells(x, ch, cw)
        mc = tc._to_cells(m.astype(jnp.float32), ch, cw) > 0.5
        ncel = (S // ch) * (S // cw)
        tcap = tc.default_chunk_capacity(ncel, tc.n_x_windows(Wt))
        return tc._build_chunks(yc, xc, mc, Ht, Wt, tcap) + (soft,)

    def stage_full(a):
        return dr.render(**a)[0]

    t1 = bench(jax.jit(stage_camera), att) * 1e3
    t1b = bench(jax.jit(stage_rows), att) * 1e3
    t1c = bench(jax.jit(stage_bin), att) * 1e3
    t2 = bench(jax.jit(stage_prep), att) * 1e3
    t3 = bench(jax.jit(stage_raster), att) * 1e3
    t3b = bench(jax.jit(stage_texbuild), att) * 1e3
    t4 = bench(jax.jit(stage_texture), att) * 1e3
    t5 = bench(jax.jit(stage_full), att) * 1e3
    print(f"camera+project     : {t1:7.2f} ms")
    print(f"+face rows         : {t1b:7.2f} ms  (Δ {t1b-t1:6.2f})")
    print(f"+bin/banded gather : {t1c:7.2f} ms  (Δ {t1c-t1b:6.2f})")
    print(f"+stream build      : {t2:7.2f} ms  (Δ {t2-t1c:6.2f})")
    print(f"+v5 kernel         : {t3:7.2f} ms  (Δ {t3-t2:6.2f})")
    print(f"+tex chunk build   : {t3b:7.2f} ms  (Δ {t3b-t3:6.2f})")
    print(f"+texture cells     : {t4:7.2f} ms  (Δ {t4-t3b:6.2f})")
    print(f"full render        : {t5:7.2f} ms  (Δ {t5-t4:6.2f})  "
          f"→ {B/t5*1e3:7.1f} fps")


if __name__ == "__main__":
    main()
