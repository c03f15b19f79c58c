"""Micro-bench of render pipeline components on the current device."""
import os
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from magicmirror.ops.rasterize import (
        _interpolate_selected, _rasterize_phase1, pixel_grid)
    from magicmirror.ops.pallas.rasterize_tpu import rasterize_phase1_pallas
    from magicmirror.render.renderer import DiffRender

    from magicmirror.geometry import camera as cam

    B = int(os.environ.get("B", "32"))
    S = int(os.environ.get("S", "256"))
    template = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "template", "sphere.obj")
    dr = DiffRender(template, S, ratio=1.0)
    rs = np.random.RandomState(0)
    V, F = dr.num_vertices, dr.num_faces

    # REAL projected geometry (random cameras over the template) so the
    # spatial culling behaves as in production
    verts = jnp.broadcast_to(dr.vertices_init[None], (B, V, 3))
    pos = cam.camera_position_from_spherical_angles(
        jnp.asarray(rs.uniform(2, 4, B), jnp.float32),
        jnp.asarray(rs.uniform(0, 30, B), jnp.float32),
        jnp.asarray(rs.uniform(-180, 180, B), jnp.float32))
    tf = cam.generate_transformation_matrix(
        pos, jnp.zeros((B, 3)), jnp.broadcast_to(jnp.asarray([0., 1., 0.]), (B, 3)))
    fvc, fvi, fn = cam.prepare_vertices(verts, dr.faces, dr.cam_proj, tf)
    fz = fvc[:, :, :, 2]
    fnz = fn[:, :, 2]
    feats = jnp.asarray(rs.rand(B, F, 3, 6).astype(np.float32))
    px, py = pixel_grid(S, S)

    f_pallas = jax.jit(jax.vmap(lambda a, b, c: rasterize_phase1_pallas(
        px, py, a, b, c, 7000.0, width=S, band_rows=max(1, 1024 // S))))
    t = timeit(f_pallas, fvi, fz, fnz)
    print(f"phase1 banded: {t*1e3:.2f} ms → {B/t:.0f} fps")

    f_pallas0 = jax.jit(jax.vmap(lambda a, b, c: rasterize_phase1_pallas(
        px, py, a, b, c, 7000.0)))
    t = timeit(f_pallas0, fvi, fz, fnz)
    print(f"phase1 static: {t*1e3:.2f} ms → {B/t:.0f} fps")

    f_xla = jax.jit(jax.vmap(lambda a, b, c: _rasterize_phase1(
        px, py, a, b, c, 7000.0, 256)))
    t = timeit(f_xla, fvi, fz, fnz)
    print(f"phase1 xla:    {t*1e3:.2f} ms → {B/t:.0f} fps")

    bi, _ = f_pallas(fvi, fz, fnz)
    f_interp = jax.jit(jax.vmap(lambda i, a, b, ff: _interpolate_selected(
        px, py, i, a, b, ff)))
    t = timeit(f_interp, bi, fvi, fz, feats)
    print(f"phase2 interp: {t*1e3:.2f} ms → {B/t:.0f} fps")

    from magicmirror.ops.sampling import texture_mapping

    uv = jnp.asarray(rs.rand(B, S, S, 2).astype(np.float32))
    tex = jnp.asarray(rs.rand(B, 2 * S, S, 3).astype(np.float32))
    f_tex = jax.jit(lambda u, t_: texture_mapping(u, t_))
    t = timeit(f_tex, uv, tex)
    print(f"texture map:   {t*1e3:.2f} ms → {B/t:.0f} fps")

    from magicmirror.ops.shading import spherical_harmonic_lighting

    nrm = jnp.asarray(rs.rand(B, S, S, 3).astype(np.float32))
    lights = jnp.asarray(rs.rand(B, 9).astype(np.float32))
    f_sh = jax.jit(spherical_harmonic_lighting)
    t = timeit(f_sh, nrm, lights)
    print(f"sh lighting:   {t*1e3:.2f} ms → {B/t:.0f} fps")


if __name__ == "__main__":
    main()
