"""Floor-free per-stage DEVICE times for DiffRender.render on TPU.

Methodology: the cumulative-prefix stage bench (bench_render_stages.py)
measures max(per-call tunnel floor ~3.5 ms, device time) per stage — the
remote-execution dispatch cost hides any stage cheaper than the floor, so
the pre-kernel glue (camera/rows/bin/stream) is unresolvable there.  Here
every stage runs K times inside ONE jit via `lax.scan` (azimuths perturbed
per step to defeat CSE, outputs reduced to one scalar so only the carry
crosses steps), amortizing the call floor to floor/K: measured/K is the
true device time.  A `floor` probe (scan of a 1-flop body) pins the
residual.

Deltas between consecutive cumulative stages are floor-free device costs.
"""
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
from jax import lax


K = int(os.environ.get("BENCH_SCAN_K", "8"))


def scan_bench(stage_fn, att, iters=5):
    """Device sec per single stage execution, call floor amortized 1/K."""
    das = jnp.linspace(0.0, 1.0, K)

    def body(carry, da):
        out = stage_fn(dict(att, azimuths=att["azimuths"] + da))
        s = jnp.asarray(0.0, jnp.float32)
        for leaf in jax.tree_util.tree_leaves(out):
            if jnp.issubdtype(leaf.dtype, jnp.inexact):
                s = s + jnp.sum(leaf).astype(jnp.float32)
            else:
                s = s + jnp.sum(leaf.astype(jnp.int32)).astype(jnp.float32)
        return carry + s, ()

    f = jax.jit(lambda a, d: lax.scan(body, jnp.float32(0.0), d,
                                      unroll=1)[0])
    out = f(att, das)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(att, das)
    out.block_until_ready()
    return (time.perf_counter() - t0) / (iters * K)


def main():
    from magicmirror.geometry import camera as cam
    from magicmirror.ops.pallas import texture_cells as tc
    from magicmirror.ops.pallas.rasterize_v4 import (
        _auto_cells, _bin_gather_rows, _build_stream, _face_rows,
        default_capacity, rasterize_fused_v5)
    from magicmirror.ops.pallas.rasterize_v6 import (
        _block_stream, _overlap_cells, _pad_rows, default_block_capacity,
        rasterize_fused_v6)
    from magicmirror.render.renderer import DiffRender

    use_v6 = os.environ.get("BENCH_V6") == "1"

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

    def stage_floor(a):
        return a["azimuths"] * 2.0

    def stage_camera(a):
        B_ = a["azimuths"].shape[0]
        object_pos = jnp.concatenate(
            [a["biases"], jnp.zeros((B_, 1))], axis=1)
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B_, 3))
        pos = cam.camera_position_from_spherical_angles(
            a["distances"], a["elevations"], a["azimuths"])
        tf = cam.generate_transformation_matrix(pos, object_pos, up)
        return cam.prepare_vertices(a["vertices"], dr.faces, dr.cam_proj, tf)

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

    def stage_prep(a):
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

    def stage_v6prep(a):
        """camera + rows + overlap bitmap + block stream — v6's pre-kernel
        glue (no banded gather, no per-cell compaction)."""
        fvc, fvi, fn = stage_camera(a)
        fz, fnz = fvc[:, :, :, 2], fn[:, :, 2]
        rows = jax.vmap(
            lambda v, z, n, f_: _face_rows(v, z, n, dr.face_uvs, f_))(
            fvi, fz, fnz, fn)
        rows_flat = _pad_rows(rows, 8)
        F = dr.num_faces
        nblk = -(-F // 8)
        tkc = default_block_capacity(F, n_cells, 8)
        overlap = jax.vmap(
            lambda v, n: _overlap_cells(v, n, n_bands, ncols))(fvi, fnz)
        pk, nlive, dropped = jax.vmap(
            lambda o: _block_stream(o, nblk, 8, tkc))(overlap)
        return rows_flat, pk, nlive, dropped

    def stage_raster(a):
        fvc, fvi, fn = stage_camera(a)
        rfn = rasterize_fused_v6 if use_v6 else rasterize_fused_v5
        return rfn(fvi, fvc[:, :, :, 2], fn[:, :, 2],
                   dr.face_uvs, fn, height=S, width=S)

    def stage_texbuild(a):
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
        return tc._build_chunks(yc, xc, mc, Ht, Wt, tcap) + (idx, soft)

    def stage_texture(a):
        idx, soft, uv, normal, hard, dropped = stage_raster(a)
        texcoord = uv.reshape(B, S, S, 2)
        out, tdrop = tc.texture_render(texcoord, a["textures"],
                                       hard.reshape(B, S, S))
        return out, soft, tdrop

    def stage_full(a):
        return dr.render(**a)[0]

    if use_v6:
        os.environ["MAGICMIRROR_RASTER_V6"] = "1"  # stage_full routing
        stages = [
            ("floor", stage_floor),
            ("camera+project", stage_camera),
            ("+face rows", stage_rows),
            ("+v6 block stream", stage_v6prep),
            ("+v6 kernel", stage_raster),
            ("+tex chunk build", stage_texbuild),
            ("+texture cells", stage_texture),
            ("full render", stage_full),
        ]
    else:
        stages = [
            ("floor", stage_floor),
            ("camera+project", stage_camera),
            ("+face rows", stage_rows),
            ("+bin/banded gather", stage_bin),
            ("+stream build", stage_prep),
            ("+v5 kernel", stage_raster),
            ("+tex chunk build", stage_texbuild),
            ("+texture cells", stage_texture),
            ("full render", stage_full),
        ]
    prev = 0.0
    for name, fn in stages:
        t = scan_bench(fn, att) * 1e3
        d = t - prev
        print(f"{name:20s}: {t:7.2f} ms  (Δ {d:6.2f})", flush=True)
        if name != "floor":
            prev = t
    print(f"scan K={K}; device fps at full = "
          f"{B / prev * 1e3:7.1f}")


if __name__ == "__main__":
    main()
