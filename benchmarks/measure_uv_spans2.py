#!/usr/bin/env python
"""Follow-up: per-cell v-spans SPLIT by texture half (top = map, bottom =
flipped map).  If each half's span is small, a two-block window (one block
per half) makes the windowed texture matmul exact with K=128."""
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
    # static face-UV v stats: how do faces split across the two halves?
    fuv = np.asarray(dr.face_uvs)  # (F, 3, 2)
    v = fuv[..., 1]
    lo, hi = v.min(1), v.max(1)
    both = (lo < 0.5) & (hi > 0.5)
    print(f"faces: {fuv.shape[0]}; v<0.5 only: {(hi <= 0.5).sum()}, "
          f"v>0.5 only: {(lo >= 0.5).sum()}, straddling: {both.sum()}")
    print(f"per-face v-span in texels (Ht={2*image_size}): "
          f"p50={np.percentile((hi-lo)*2*image_size, 50):.1f} "
          f"max={((hi-lo)*2*image_size).max():.1f}")
    u = fuv[..., 0]
    du = (u.max(1) - u.min(1)) * image_size
    print(f"per-face u-span in texels: p50={np.percentile(du, 50):.1f} "
          f"max={du.max():.1f}")

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
        return uv.reshape(-1, H, W, 2), hard.reshape(-1, H, W)

    uv_fn = jax.jit(uv_of)
    rng = np.random.RandomState(0)
    B = 16
    ch, cw = 8, 128
    half = Ht // 2
    spans_h0, spans_h1, cells_2blk = [], [], 0
    ncells_total = 0
    for rep in range(8):
        att = {
            "azimuths": jnp.asarray(rng.uniform(-180, 180, B), jnp.float32),
            "elevations": jnp.asarray(rng.uniform(0, 30, B), jnp.float32),
            "distances": jnp.asarray(rng.uniform(2, 7, B), jnp.float32),
            "biases": jnp.asarray(rng.uniform(-0.2, 0.2, (B, 2)), jnp.float32),
            "vertices": jnp.asarray(
                dr.vertices_init[None]
                + rng.uniform(-0.08, 0.08, (B, V, 3)), jnp.float32),
        }
        uv, hard = (np.asarray(t) for t in uv_fn(att))
        vv = np.clip(uv[..., 1], 0, 1)
        y = ((-(vv * 2 - 1) + 1) * Ht - 1) * 0.5
        nby, nbx = H // ch, W // cw
        yc = y.reshape(B, nby, ch, nbx, cw)
        mc = hard.reshape(B, nby, ch, nbx, cw) > 0.5
        big = 1e9
        for hsel, out in ((yc < half, spans_h0), (yc >= half, spans_h1)):
            m = mc & hsel
            ymin = np.where(m, yc, big).min(axis=(2, 4))
            ymax = np.where(m, yc, -big).max(axis=(2, 4))
            ne = m.any(axis=(2, 4))
            out.append((np.floor(ymax) + 2 - np.floor(ymin))[ne])
        ncells_total += (mc.any(axis=(2, 4))).sum()

    for name, lst in (("top half (v>0.5 maps here)", spans_h0),
                      ("bottom half", spans_h1)):
        s = np.concatenate(lst)
        print(f"{name}: cells={len(s)} span p50={np.percentile(s,50):.0f} "
              f"p95={np.percentile(s,95):.0f} p99={np.percentile(s,99):.0f} "
              f"max={s.max():.0f}")
    print(f"nonempty cells total: {ncells_total}")


if __name__ == "__main__":
    main()
