"""Sweep (band_rows, chunk) for the banded kernel on real geometry."""
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from magicmirror.geometry import camera as cam
from magicmirror.ops.pallas.rasterize_tpu import rasterize_phase1_pallas
from magicmirror.ops.rasterize import pixel_grid
from magicmirror.render.renderer import DiffRender
import os


def main():
    B, S = 32, 256
    template = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "template", "sphere.obj")
    dr = DiffRender(template, S, ratio=1.0)
    rs = np.random.RandomState(0)
    V = dr.num_vertices
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
    px, py = pixel_grid(S, S)

    for band_rows, chunk in [(8, 64), (4, 128), (16, 32)]:
        try:
            f = jax.jit(jax.vmap(lambda a, b, c: rasterize_phase1_pallas(
                px, py, a, b, c, 7000.0, chunk=chunk, width=S,
                band_rows=band_rows)))
            out = f(fvi, fz, fnz)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(fvi, fz, fnz)
            jax.block_until_ready(out)
            t = (time.perf_counter() - t0) / 10
            print(f"band_rows={band_rows:2d} chunk={chunk:3d}: "
                  f"{t*1e3:7.2f} ms → {B/t:6.0f} fps")
        except Exception as e:
            print(f"band_rows={band_rows:2d} chunk={chunk:3d}: FAIL "
                  f"{str(e).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
