"""Feed texture_mapping the REAL phase2 output as a device input."""
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
    from magicmirror.render.renderer import DiffRender

    B, S = 32, 256
    template = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "template", "sphere.obj")
    dr = DiffRender(template, S, ratio=1.0)
    rs = np.random.RandomState(0)
    V = dr.num_vertices
    att = dict(
        azimuths=jnp.asarray(rs.uniform(-180, 180, B), jnp.float32),
        elevations=jnp.asarray(rs.uniform(0, 30, B), jnp.float32),
        distances=jnp.asarray(rs.uniform(2, 4, B), jnp.float32),
        biases=jnp.asarray(rs.uniform(-0.2, 0.2, (B, 2)), jnp.float32),
    )
    tex = jnp.asarray(rs.rand(B, 2 * S, S, 3), jnp.float32)
    px, py = pixel_grid(S, S)

    object_pos = jnp.concatenate([att["biases"], jnp.zeros((B, 1))], 1)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, 3))
    pos = cam.camera_position_from_spherical_angles(
        att["distances"], att["elevations"], att["azimuths"])
    tf = cam.generate_transformation_matrix(pos, object_pos, up)
    verts = jnp.broadcast_to(dr.vertices_init[None], (B, V, 3))
    fvc, fvi, fn = cam.prepare_vertices(verts, dr.faces, dr.cam_proj, tf)
    bi, sl = jax.vmap(lambda v, z, n: rasterize_phase1_pallas(
        px, py, v, z, n, 7000.0, width=S, band_rows=4))(
        fvi, fvc[:, :, :, 2], fn[:, :, 2])
    F = fvi.shape[1]
    feats = jnp.concatenate([
        jnp.ones((B, F, 3, 1)),
        jnp.broadcast_to(dr.face_uvs[None], (B, F, 3, 2)),
        fn[:, :, None, :].repeat(3, axis=2)], -1)
    out, _ = jax.vmap(lambda b, v, z, ff: _interpolate_selected(
        px, py, b, v, z, ff))(bi, fvi, fvc[:, :, :, 2], feats)
    out = jax.block_until_ready(out)

    texcoord = jnp.asarray(np.asarray(out[..., 1:3].reshape(B, S, S, 2)))
    f_tex = jax.jit(lambda u, t: texture_mapping(u, t))
    print(f"texture on REAL uv input: {bench(f_tex, texcoord, tex)*1e3:7.2f} ms")

    # and phase2+texture in one jit, returning only the texture
    def p2t(bi_, fvi_, fvc_, fn_, t):
        feats_ = jnp.concatenate([
            jnp.ones((B, F, 3, 1)),
            jnp.broadcast_to(dr.face_uvs[None], (B, F, 3, 2)),
            fn_[:, :, None, :].repeat(3, axis=2)], -1)
        o, _ = jax.vmap(lambda b2, v, z, ff: _interpolate_selected(
            px, py, b2, v, z, ff))(bi_, fvi_, fvc_[:, :, :, 2], feats_)
        tc = o[..., 1:3].reshape(B, S, S, 2)
        return texture_mapping(tc, t)

    f_p2t = jax.jit(p2t)
    print(f"phase2+texture one jit:   {bench(f_p2t, bi, fvi, fvc, fn, tex)*1e3:7.2f} ms")

    def p2only(bi_, fvi_, fvc_, fn_):
        feats_ = jnp.concatenate([
            jnp.ones((B, F, 3, 1)),
            jnp.broadcast_to(dr.face_uvs[None], (B, F, 3, 2)),
            fn_[:, :, None, :].repeat(3, axis=2)], -1)
        o, _ = jax.vmap(lambda b2, v, z, ff: _interpolate_selected(
            px, py, b2, v, z, ff))(bi_, fvi_, fvc_[:, :, :, 2], feats_)
        return o

    f_p2 = jax.jit(p2only)
    print(f"phase2 only:              {bench(f_p2, bi, fvi, fvc, fn)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
