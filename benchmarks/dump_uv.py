#!/usr/bin/env python
"""Render a camera sweep and dump per-pixel uv + coverage to NPZ for offline
analysis of texture candidate-set schemes (no TPU needed afterwards)."""
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
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/uv_dump.npz"

    from magicmirror.render.renderer import DiffRender
    from magicmirror.geometry import camera as cam
    from magicmirror.ops.pallas.rasterize_v4 import rasterize_fused_v4

    dr = DiffRender(os.path.join(root, "template", template), image_size,
                    ratio=1.0)
    H = W = image_size
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
    uvs, hards, dists = [], [], []
    for rep in range(8):
        lo, hi = [(2, 4), (2, 2.5), (2, 7), (3, 7)][rep % 4]
        d = rng.uniform(lo, hi, B).astype(np.float32)
        att = {
            "azimuths": jnp.asarray(rng.uniform(-180, 180, B), jnp.float32),
            "elevations": jnp.asarray(rng.uniform(0, 30, B), jnp.float32),
            "distances": jnp.asarray(d),
            "biases": jnp.asarray(rng.uniform(-0.2, 0.2, (B, 2)), jnp.float32),
            "vertices": jnp.asarray(
                dr.vertices_init[None]
                + rng.uniform(-0.08, 0.08, (B, V, 3)), jnp.float32),
        }
        uv, hard = (np.asarray(t) for t in uv_fn(att))
        uvs.append(np.float16(uv))
        hards.append(hard.astype(bool))
        dists.append(d)
    np.savez_compressed(out, uv=np.concatenate(uvs),
                        hard=np.concatenate(hards),
                        dist=np.concatenate(dists))
    print("wrote", out)


if __name__ == "__main__":
    main()
