"""Offline probe: worst per-cell face count (and texture chunk count) over
the adversarial camera sweep for each big template — sizes the static
capacity defaults (`default_capacity`, `default_chunk_capacity`) so the
full-scale TPU bench (bench_big_templates.py) records dropped=0.

Runs on CPU (forced) in a few seconds; pure binning math, no kernels.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from magicmirror.render.renderer import DiffRender
from magicmirror.geometry import camera as cam
from magicmirror.ops.pallas.rasterize_v4 import (
    _auto_cells, _overlap_cells, default_capacity)
from magicmirror.ops.pallas import texture_cells as tc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("cub_sphere_256", "sphere.obj", 256, 1.0, (2.0, 7.0), (0.0, 30.0)),
    ("cub_sphere2_256", "sphere2.obj", 256, 1.0, (2.0, 7.0), (0.0, 30.0)),
    ("cub_smpl_256", "smpl_uv.obj", 256, 1.0, (2.0, 7.0), (0.0, 30.0)),
    ("market_smpl_128x64", "smpl_uv.obj", 64, 2.0, (2.0, 6.0), (-15.0, 15.0)),
    ("thuman_smpl_256x128", "smpl_uv.obj", 128, 2.0, (2.0, 8.0),
     (-15.0, 30.0)),
]


def main():
    batch = 16
    for label, template, image_size, ratio, dist_range, elev_range in CONFIGS:
        dr = DiffRender(os.path.join(ROOT, "template", template), image_size,
                        ratio=ratio)
        H, W = dr.render_height, dr.render_width
        br, ncols = _auto_cells(H, W)
        n_bands = H // br
        n_cells = n_bands * ncols
        cap = default_capacity(dr.num_faces, n_cells)
        rs = np.random.RandomState(0)
        V = dr.num_vertices

        @jax.jit
        def probe(dists, elevs, azs, verts):
            B = dists.shape[0]
            object_pos = jnp.zeros((B, 3), jnp.float32)
            up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32),
                                  (B, 3))
            pos = cam.camera_position_from_spherical_angles(
                dists, elevs, azs, degrees=True)
            tr = cam.generate_transformation_matrix(pos, object_pos, up)
            _, fvi, fn = cam.prepare_vertices(verts, dr.faces, dr.cam_proj,
                                              tr)

            def one(args):
                fvi1, fnz1 = args
                ov = _overlap_cells(fvi1, fnz1, n_bands, ncols)
                return ov.sum(axis=1).max()

            return jax.lax.map(one, (fvi, fn[:, :, 2])).max()

        worst = 0
        lo, hi = dist_range
        for dist in np.linspace(lo, hi, 7):
            dists = jnp.full((batch,), dist, jnp.float32)
            elevs = jnp.asarray(
                np.linspace(elev_range[0], elev_range[1], batch), jnp.float32)
            azs = jnp.asarray(rs.uniform(-180, 180, batch), jnp.float32)
            verts = jnp.asarray(
                dr.vertices_init[None] + rs.uniform(-0.05, 0.05,
                                                    (batch, V, 3)),
                jnp.float32)
            worst = max(worst, int(probe(dists, elevs, azs, verts)))
        print(f"{label:22s} F={dr.num_faces:6d} cells={n_bands}x{ncols} "
              f"cap={cap:4d} worst_cell_count={worst:4d} "
              f"{'OVERFLOW' if worst > cap else 'ok'}")



def probe_total_pairs():
    """Worst TOTAL (cell, face) pairs per image over the sweep, as a
    fraction of F — sizes the flat-stream total capacity."""
    batch = 16
    for label, template, image_size, ratio, dist_range, elev_range in CONFIGS:
        dr = DiffRender(os.path.join(ROOT, "template", template), image_size,
                        ratio=ratio)
        H, W = dr.render_height, dr.render_width
        br, ncols = _auto_cells(H, W)
        n_bands = H // br
        rs = np.random.RandomState(0)
        V = dr.num_vertices

        @jax.jit
        def probe(dists, elevs, azs, verts):
            B = dists.shape[0]
            object_pos = jnp.zeros((B, 3), jnp.float32)
            up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32),
                                  (B, 3))
            pos = cam.camera_position_from_spherical_angles(
                dists, elevs, azs, degrees=True)
            tr = cam.generate_transformation_matrix(pos, object_pos, up)
            _, fvi, fn = cam.prepare_vertices(verts, dr.faces, dr.cam_proj,
                                              tr)

            def one(args):
                fvi1, fnz1 = args
                ov = _overlap_cells(fvi1, fnz1, n_bands, ncols)
                counts = ov.sum(axis=1)
                # live 8-slot chunks the stream would execute
                return counts.sum(), (-(-counts // 8) * 8).sum()

            t, s = jax.lax.map(one, (fvi, fn[:, :, 2]))
            return t.max(), s.max()

        worst_t = worst_s = 0
        lo, hi = dist_range
        for dist in np.linspace(lo, hi, 7):
            dists = jnp.full((batch,), dist, jnp.float32)
            elevs = jnp.asarray(
                np.linspace(elev_range[0], elev_range[1], batch), jnp.float32)
            azs = jnp.asarray(rs.uniform(-180, 180, batch), jnp.float32)
            verts = jnp.asarray(
                dr.vertices_init[None] + rs.uniform(-0.05, 0.05,
                                                    (batch, V, 3)),
                jnp.float32)
            t, s = probe(dists, elevs, azs, verts)
            worst_t = max(worst_t, int(t))
            worst_s = max(worst_s, int(s))
        print(f"{label:22s} F={dr.num_faces:6d} worst_total={worst_t:6d} "
              f"({worst_t/dr.num_faces:.2f}F) worst_slots={worst_s:6d} "
              f"({worst_s/dr.num_faces:.2f}F)")


def probe_v6_blocks():
    """Worst per-image v6 stream entries (touched (cell, block) pairs at
    chunk 8 forward / 128 backward) over the sweep — sizes
    rasterize_v6.default_block_capacity."""
    from magicmirror.ops.pallas.rasterize_v6 import default_block_capacity

    batch = 16
    for label, template, image_size, ratio, dist_range, elev_range in CONFIGS:
        dr = DiffRender(os.path.join(ROOT, "template", template), image_size,
                        ratio=ratio)
        H, W = dr.render_height, dr.render_width
        br, ncols = _auto_cells(H, W)
        n_bands = H // br
        n_cells = n_bands * ncols
        F = dr.num_faces
        rs = np.random.RandomState(0)
        V = dr.num_vertices

        @jax.jit
        def probe(dists, elevs, azs, verts):
            Bn = dists.shape[0]
            object_pos = jnp.zeros((Bn, 3), jnp.float32)
            up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32),
                                  (Bn, 3))
            pos = cam.camera_position_from_spherical_angles(
                dists, elevs, azs, degrees=True)
            tr = cam.generate_transformation_matrix(pos, object_pos, up)
            _, fvi, fn = cam.prepare_vertices(verts, dr.faces, dr.cam_proj,
                                              tr)

            def one(args):
                fvi1, fnz1 = args
                ov = _overlap_cells(fvi1, fnz1, n_bands, ncols)
                ent = []
                for chunk in (8, 128):
                    nblk = -(-F // chunk)
                    pad = nblk * chunk - F
                    ovp = jnp.concatenate(
                        [ov, jnp.zeros((n_cells, pad), bool)], axis=1)
                    ent.append(ovp.reshape(n_cells, nblk, chunk)
                               .any(axis=2).sum())
                return ent[0], ent[1]

            t8, t128 = jax.lax.map(one, (fvi, fn[:, :, 2]))
            return t8.max(), t128.max()

        worst8 = worst128 = 0
        lo, hi = dist_range
        for dist in np.linspace(lo, hi, 7):
            dists = jnp.full((batch,), dist, jnp.float32)
            elevs = jnp.asarray(
                np.linspace(elev_range[0], elev_range[1], batch), jnp.float32)
            azs = jnp.asarray(rs.uniform(-180, 180, batch), jnp.float32)
            verts = jnp.asarray(
                dr.vertices_init[None] + rs.uniform(-0.05, 0.05,
                                                    (batch, V, 3)),
                jnp.float32)
            t8, t128 = probe(dists, elevs, azs, verts)
            worst8 = max(worst8, int(t8))
            worst128 = max(worst128, int(t128))
        cap8 = default_block_capacity(F, n_cells, 8)
        cap128 = default_block_capacity(F, n_cells, 128)
        print(f"{label:22s} F={F:6d} v6_fwd8={worst8:6d}/{cap8:6d} "
              f"{'OVERFLOW' if worst8 > cap8 else 'ok':8s} "
              f"v6_bwd128={worst128:5d}/{cap128:5d} "
              f"{'OVERFLOW' if worst128 > cap128 else 'ok'}")


if __name__ == "__main__":
    main()
    probe_total_pairs()
    probe_v6_blocks()
