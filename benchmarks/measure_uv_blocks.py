#!/usr/bin/env python
"""Follow-up 2: per-cell count of DISTINCT 8-row texel blocks touched by
covered pixels' bilinear taps.  Sizes the block-gather windowed texture
matmul: K = 8 * nblocks_selected, exact iff distinct-blocks <= selection."""
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
        return uv.reshape(-1, H, W, 2), hard.reshape(-1, H, W)

    uv_fn = jax.jit(uv_of)
    rng = np.random.RandomState(0)
    B = 16
    nblk = Ht // 8
    results = {}
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
        r0 = np.floor(y).astype(np.int64)
        for ch, cw in ((8, 128), (4, 128), (8, 64), (16, 128), (8, 256),
                       (16, 256)):
            if H % ch or W % cw:
                continue
            nby, nbx = H // ch, W // cw
            rc = r0.reshape(B, nby, ch, nbx, cw)
            mc = hard.reshape(B, nby, ch, nbx, cw) > 0.5
            # touched blocks: blocks of floor(y) and floor(y)+1
            counts = []
            for b in range(B):
                for i in range(nby):
                    for j in range(nbx):
                        m = mc[b, i, :, j, :]
                        if not m.any():
                            continue
                        r = rc[b, i, :, j, :][m]
                        blks = np.unique(np.concatenate(
                            [np.clip(r, 0, Ht - 1) // 8,
                             np.clip(r + 1, 0, Ht - 1) // 8]))
                        counts.append(len(blks))
            results.setdefault((ch, cw), []).extend(counts)
    for (ch, cw), counts in sorted(results.items()):
        c = np.asarray(counts)
        print(f"cell {ch}x{cw}: distinct 8-row blocks p50={np.percentile(c,50):.0f} "
              f"p90={np.percentile(c,90):.0f} p95={np.percentile(c,95):.0f} "
              f"p99={np.percentile(c,99):.0f} max={c.max()} (n={len(c)}, "
              f"of {nblk} blocks)")


if __name__ == "__main__":
    main()
