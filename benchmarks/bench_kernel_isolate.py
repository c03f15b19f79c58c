"""Isolate banded-kernel cost: dynamic vs static trip counts, fewer bands."""
import os
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import magicmirror.ops.pallas.rasterize_tpu as rt
from magicmirror.geometry import camera as cam
from magicmirror.render.renderer import DiffRender


def bench(f, *args, iters=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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

    # how much work is there, actually?
    banded, counts = jax.vmap(
        lambda a, b, c: rt._bin_faces(a, b, c, 64, 128, 0.035))(fvi, fz, fnz)
    c = np.asarray(counts)
    print(f"counts: mean {c.mean():.0f} max {c.max()} "
          f"chunks/img {np.ceil(c / 128).sum(1).mean():.1f}")

    f3 = jax.jit(jax.vmap(lambda a, b, c: rt._phase1_image_impl(
        a, b, c, 7000.0, S, S, 4, 128, False)))
    print(f"v3 dyn : {bench(f3, fvi, fz, fnz)*1e3:7.2f} ms")

    # static bound variant: monkeypatch count to K
    orig = rt._image_kernel

    import functools

    def static_kernel(counts_ref, faces_ref, idx_ref, sumlog_ref, **kw):
        class FakeRef:
            def __getitem__(self, i):
                return faces_ref.shape[2]

        return orig(FakeRef(), faces_ref, idx_ref, sumlog_ref, **kw)

    rt._image_kernel = static_kernel
    f3s = jax.jit(jax.vmap(lambda a, b, c: rt._phase1_image_impl(
        a, b, c, 7000.0, S, S, 4, 128, False)))
    print(f"v3 stat: {bench(f3s, fvi, fz, fnz)*1e3:7.2f} ms  (full K work)")
    rt._image_kernel = orig


if __name__ == "__main__":
    main()
