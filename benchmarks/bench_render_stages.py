"""Cumulative-prefix profile of DiffRender.render on TPU: where do the
milliseconds actually go in context?"""
import os
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

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
    from magicmirror.ops.pallas.rasterize_tpu import rasterize_phase1_pallas
    from magicmirror.ops.rasterize import _interpolate_selected, pixel_grid
    from magicmirror.ops.sampling import texture_mapping
    from magicmirror.ops.shading import spherical_harmonic_lighting
    from magicmirror.render.renderer import DiffRender

    B, S = 32, 256
    template = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "template", "sphere.obj")
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

    px, py = pixel_grid(S, S)

    def stage_camera(a):
        B_ = a["azimuths"].shape[0]
        object_pos = jnp.concatenate(
            [a["biases"], jnp.zeros((B_, 1))], axis=1)
        up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B_, 3))
        pos = cam.camera_position_from_spherical_angles(
            a["distances"], a["elevations"], a["azimuths"])
        tf = cam.generate_transformation_matrix(pos, object_pos, up)
        return cam.prepare_vertices(a["vertices"], dr.faces, dr.cam_proj, tf)

    def stage_phase1(a):
        fvc, fvi, fn = stage_camera(a)
        band_rows = max(1, 1024 // S)
        return jax.vmap(lambda v, z, n: rasterize_phase1_pallas(
            px, py, v, z, n, 7000.0, width=S, band_rows=band_rows))(
            fvi, fvc[:, :, :, 2], fn[:, :, 2])

    def stage_full(a):
        return dr.render(**a)[0]

    def stage_phase2(a):
        fvc, fvi, fn = stage_camera(a)
        band_rows = max(1, 1024 // S)
        bi, sl = jax.vmap(lambda v, z, n: rasterize_phase1_pallas(
            px, py, v, z, n, 7000.0, width=S, band_rows=band_rows))(
            fvi, fvc[:, :, :, 2], fn[:, :, 2])
        Bn = fvi.shape[0]
        F = fvi.shape[1]
        fnu = fn[:, :, None, :].repeat(3, axis=2)
        feats = jnp.concatenate([
            jnp.ones((Bn, F, 3, 1)),
            jnp.broadcast_to(dr.face_uvs[None], (Bn, F, 3, 2)),
            fnu], axis=-1)
        out, hard = jax.vmap(lambda b, v, z, ff: _interpolate_selected(
            px, py, b, v, z, ff))(bi, fvi, fvc[:, :, :, 2], feats)
        return out, sl

    def stage_texture(a):
        out, sl = stage_phase2(a)
        texcoord = out[..., 1:3].reshape(B, S, S, 2)
        return texture_mapping(texcoord, a["textures"]), sl

    def stage_sh(a):
        out, sl = stage_phase2(a)
        texcoord = out[..., 1:3].reshape(B, S, S, 2)
        tc = texture_mapping(texcoord, a["textures"])
        imn = out[..., 3:6].reshape(B, S, S, 3)
        coef = spherical_harmonic_lighting(imn, a["lights"])
        return tc, coef, sl

    print(f"camera+project : {bench(jax.jit(stage_camera), att)*1e3:7.2f} ms")
    print(f"+phase1        : {bench(jax.jit(stage_phase1), att)*1e3:7.2f} ms")
    print(f"+phase2        : {bench(jax.jit(stage_phase2), att)*1e3:7.2f} ms")
    print(f"+texture       : {bench(jax.jit(stage_texture), att)*1e3:7.2f} ms")
    print(f"+sh            : {bench(jax.jit(stage_sh), att)*1e3:7.2f} ms")
    print(f"full render    : {bench(jax.jit(stage_full), att)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
