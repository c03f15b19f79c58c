#!/usr/bin/env python
"""Measure per-cell UV spans of covered pixels — sizing data for the
windowed texture matmul (candidate-set reduction of the tent-weight MXU
sampling, docs/DESIGN.md round-3 lever 1).

For each pixel cell (the v4 kernel's band x column blocks, and finer
sub-blocks), compute the span of texel rows (v axis, Ht = 2*image_size) and
texel cols (u axis) that the cell's covered pixels touch.  The windowed
matmul is exact iff span+1 (the +1 for the second bilinear tap) fits the
static window; this script reports the distribution across a camera sweep.

Usage: python benchmarks/measure_uv_spans.py [template] [image_size]
"""
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    template = sys.argv[1] if len(sys.argv) > 1 else "sphere.obj"
    image_size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from magicmirror.render.renderer import DiffRender
    from magicmirror.geometry import camera as cam
    from magicmirror.ops.pallas.rasterize_v4 import rasterize_fused_v4

    dr = DiffRender(os.path.join(root, "template", template), image_size,
                    ratio=1.0)
    H = W = image_size
    Ht, Wt = 2 * image_size, image_size
    V = dr.num_vertices

    def uv_of(att):
        object_pos = jnp.concatenate(
            [att["biases"], jnp.zeros((att["biases"].shape[0], 1))], axis=1)
        up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]),
                              (att["biases"].shape[0], 3))
        pos = cam.camera_position_from_spherical_angles(
            att["distances"], att["elevations"], att["azimuths"], degrees=True)
        tr = cam.generate_transformation_matrix(pos, object_pos, up)
        fvc, fvi, fn = cam.prepare_vertices(att["vertices"], dr.faces,
                                            dr.cam_proj, tr)
        idx, soft, uv, normal, hard, dropped = rasterize_fused_v4(
            fvi, fvc[:, :, :, 2], fn[:, :, 2], dr.face_uvs, fn,
            height=H, width=W)
        return uv.reshape(-1, H, W, 2), hard.reshape(-1, H, W), dropped

    uv_fn = jax.jit(uv_of)

    def spans(uv, mask, cell_h, cell_w):
        """per-cell (v_span, u_span) in texel units; -1 if cell empty."""
        B = uv.shape[0]
        # taps: y = ((gy+1)*Ht-1)/2 with gy = -(v*2-1); rows floor(y), +1
        u = np.clip(uv[..., 0], 0, 1)
        v = np.clip(uv[..., 1], 0, 1)
        y = ((-(v * 2 - 1) + 1) * Ht - 1) * 0.5
        x = (((u * 2 - 1) + 1) * Wt - 1) * 0.5
        nby, nbx = H // cell_h, W // cell_w
        yc = y.reshape(B, nby, cell_h, nbx, cell_w)
        xc = x.reshape(B, nby, cell_h, nbx, cell_w)
        mc = mask.reshape(B, nby, cell_h, nbx, cell_w) > 0.5
        big = 1e9
        ymin = np.where(mc, yc, big).min(axis=(2, 4))
        ymax = np.where(mc, yc, -big).max(axis=(2, 4))
        xmin = np.where(mc, xc, big).min(axis=(2, 4))
        xmax = np.where(mc, xc, -big).max(axis=(2, 4))
        nonempty = mc.any(axis=(2, 4))
        vs = np.where(nonempty, np.floor(ymax) + 1 - np.floor(ymin) + 1, -1)
        us = np.where(nonempty, np.floor(xmax) + 1 - np.floor(xmin) + 1, -1)
        return vs[nonempty], us[nonempty]

    rng = np.random.RandomState(0)
    B = 16
    for dist_lo, dist_hi, label in ((2.0, 4.0, "bench dist 2-4"),
                                    (2.0, 2.2, "close dist~2"),
                                    (2.0, 7.0, "train dist 2-7")):
        all_vs = {}
        for rep in range(4):
            att = {
                "azimuths": jnp.asarray(rng.uniform(-180, 180, B), jnp.float32),
                "elevations": jnp.asarray(rng.uniform(0, 30, B), jnp.float32),
                "distances": jnp.asarray(rng.uniform(dist_lo, dist_hi, B),
                                         jnp.float32),
                "biases": jnp.asarray(rng.uniform(-0.2, 0.2, (B, 2)),
                                      jnp.float32),
                "vertices": jnp.asarray(
                    dr.vertices_init[None]
                    + rng.uniform(-0.08, 0.08, (B, V, 3)), jnp.float32),
            }
            uv, hard, dropped = uv_fn(att)
            uv, hard = np.asarray(uv), np.asarray(hard)
            for ch, cw in ((8, 128), (4, 128), (8, 64), (2, 128), (8, 256)):
                if W % cw or H % ch:
                    continue
                vs, us = spans(uv, hard, ch, cw)
                d = all_vs.setdefault((ch, cw), ([], []))
                d[0].append(vs)
                d[1].append(us)
        print(f"== {label} (template {template}, {image_size}^2) ==")
        for (ch, cw), (vs_l, us_l) in sorted(all_vs.items()):
            vs = np.concatenate(vs_l)
            us = np.concatenate(us_l)
            print(f"  cell {ch}x{cw}: v-span p50={np.percentile(vs,50):.0f} "
                  f"p95={np.percentile(vs,95):.0f} p99={np.percentile(vs,99):.0f} "
                  f"max={vs.max():.0f} | u-span p50={np.percentile(us,50):.0f} "
                  f"p95={np.percentile(us,95):.0f} p99={np.percentile(us,99):.0f} "
                  f"max={us.max():.0f}  (n={len(vs)})")


if __name__ == "__main__":
    main()
