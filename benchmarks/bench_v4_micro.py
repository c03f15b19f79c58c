"""Cumulative-prefix micro-profile of the v4 rasterizer: camera -> coeff
rows -> bin lists -> banded gather -> kernel.  Finds which prep stage eats
the raster budget."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
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
    from magicmirror.ops.pallas import rasterize_v4 as v4
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
        "vertices": jnp.broadcast_to(dr.vertices_init[None], (B, V, 3)),
    }
    band_rows = v4._auto_band_rows(S, S)
    n_bands = S // band_rows
    F = dr.num_faces
    capacity = v4.default_capacity(F, n_bands)
    npix = band_rows * S
    print(f"B={B} S={S} bands={n_bands} capacity={capacity}")

    def stage_camera(a):
        B_ = a["azimuths"].shape[0]
        object_pos = jnp.concatenate([a["biases"], jnp.zeros((B_, 1))], 1)
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B_, 3))
        pos = cam.camera_position_from_spherical_angles(
            a["distances"], a["elevations"], a["azimuths"])
        tf = cam.generate_transformation_matrix(pos, object_pos, up)
        fvc, fvi, fn = cam.prepare_vertices(a["vertices"], dr.faces,
                                            dr.cam_proj, tf)
        return fvi, fvc[:, :, :, 2], fn[:, :, 2], fn

    def stage_rows(a):
        fvi, fz, fnz, fn = stage_camera(a)
        rows = jax.vmap(lambda v_, z, n_, f_: v4._face_rows(
            v_, z, n_, dr.face_uvs, f_))(fvi, fz, fnz, fn)
        return rows

    def stage_lists(a):
        fvi, fz, fnz, fn = stage_camera(a)
        rows = jax.vmap(lambda v_, z, n_, f_: v4._face_rows(
            v_, z, n_, dr.face_uvs, f_))(fvi, fz, fnz, fn)
        lists, dropped = jax.vmap(
            lambda v_, n_: v4._bin_lists(v_, n_, n_bands, capacity))(fvi, fnz)
        return rows, lists, dropped

    def stage_banded(a):
        rows, lists, dropped = stage_lists(a)
        banded = jax.vmap(lambda r, l: r[l])(rows, lists)
        return banded, dropped

    def stage_kernel(a):
        fvi, fz, fnz, fn = stage_camera(a)
        return v4.rasterize_fused_v4(fvi, fz, fnz, dr.face_uvs, fn,
                                     height=S, width=S)

    print(f"camera         : {bench(jax.jit(stage_camera), att)*1e3:7.2f} ms")
    print(f"+rows          : {bench(jax.jit(stage_rows), att)*1e3:7.2f} ms")
    print(f"+lists         : {bench(jax.jit(stage_lists), att)*1e3:7.2f} ms")
    print(f"+banded gather : {bench(jax.jit(stage_banded), att)*1e3:7.2f} ms")
    print(f"+fwd kernel    : {bench(jax.jit(stage_kernel), att)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
