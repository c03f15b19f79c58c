"""Cumulative-prefix profile of the v4 fused render pipeline on TPU."""
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
    from magicmirror.ops.pallas.rasterize_v4 import rasterize_fused_v4
    from magicmirror.ops.sampling import texture_mapping
    from magicmirror.ops.shading import spherical_harmonic_lighting
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
        "textures": jnp.asarray(rs.rand(B, 2 * S, S, 3), jnp.float32),
        "lights": jnp.asarray(rs.rand(B, 9), jnp.float32),
        "bg": None,
    }

    def stage_camera(a):
        B_ = a["azimuths"].shape[0]
        object_pos = jnp.concatenate([a["biases"], jnp.zeros((B_, 1))], 1)
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B_, 3))
        pos = cam.camera_position_from_spherical_angles(
            a["distances"], a["elevations"], a["azimuths"])
        tf = cam.generate_transformation_matrix(pos, object_pos, up)
        return cam.prepare_vertices(a["vertices"], dr.faces, dr.cam_proj, tf)

    def stage_raster(a):
        fvc, fvi, fn = stage_camera(a)
        return rasterize_fused_v4(fvi, fvc[:, :, :, 2], fn[:, :, 2],
                                  dr.face_uvs, fn, height=S, width=S)

    def stage_texture(a):
        out = stage_raster(a)
        texcoord = out[2].reshape(B, S, S, 2)
        return texture_mapping(texcoord, a["textures"]), out

    def stage_sh(a):
        tc, out = stage_texture(a)
        imn = out[3].reshape(B, S, S, 3)
        return tc, spherical_harmonic_lighting(imn, a["lights"]), out

    def stage_full(a):
        return dr.render(**a)[0]

    print(f"camera+project : {bench(jax.jit(stage_camera), att)*1e3:7.2f} ms")
    print(f"+raster(fused) : {bench(jax.jit(stage_raster), att)*1e3:7.2f} ms")
    print(f"+texture       : {bench(jax.jit(stage_texture), att)*1e3:7.2f} ms")
    print(f"+sh            : {bench(jax.jit(stage_sh), att)*1e3:7.2f} ms")
    print(f"full render    : {bench(jax.jit(stage_full), att)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
