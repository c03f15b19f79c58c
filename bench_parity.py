#!/usr/bin/env python
"""On-chip kernel parity artifact (VERDICT round-1 item 7; round-4 item 3):
run the COMPILED (non-interpret) Pallas rasterizers on the real TPU against
the XLA golden path and write a JSON verdict to PARITY.json.

Entries:
  v4_sphere — the banded v4 fused kernel on the 1280-face sphere (the
              default path's kernel basis), forward + backward.
  v6_smpl   — the flat interval-stream v6 kernel on the 13,776-face SMPL
              template (the dense-template routing the trainer takes at
              renderer.py DENSE_THRESHOLD), forward + backward.

    python bench_parity.py          # on TPU; errors out if no TPU present
"""
import json
import math
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp


def _setup(template, B, H, W, seed=0):
    from magicmirror.geometry import camera as cam
    from magicmirror.geometry import mesh as mesh_ops
    from magicmirror.geometry.obj_io import load_obj

    mesh = load_obj(template, with_materials=True)
    v = mesh_ops.normalize_template(mesh.vertices, 1.0)
    faces = mesh.faces.astype(np.int32)
    rng = np.random.RandomState(seed)
    verts = jnp.asarray(v[None] + rng.uniform(-0.05, 0.05, (B,) + v.shape),
                        jnp.float32)
    proj = cam.perspective_projection(math.atan(1.0 / 2.5) * 2, ratio=1.0)
    cpos = cam.camera_position_from_spherical_angles(
        jnp.asarray(rng.uniform(2, 4, B), jnp.float32),
        jnp.asarray(rng.uniform(0, 30, B), jnp.float32),
        jnp.asarray(rng.uniform(-180, 180, B), jnp.float32), degrees=True)
    tr = cam.generate_transformation_matrix(
        cpos, jnp.zeros((B, 3), jnp.float32),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), (B, 3)))
    fvc, fvi, fn = cam.prepare_vertices(verts, jnp.asarray(faces), proj, tr)
    face_uvs = jnp.asarray(mesh.uvs[mesh.face_uvs_idx])
    w_soft = jnp.asarray(rng.randn(B, H * W), jnp.float32)
    w_uv = jnp.asarray(rng.randn(B, H * W, 2), jnp.float32)
    return fvi, fvc[:, :, :, 2], fn, fn[:, :, 2], face_uvs, w_soft, w_uv


def _parity(raster_fn, template, B, H, W, on_tpu):
    """Compiled-kernel vs XLA-golden forward and gradient parity."""
    from magicmirror.ops.rasterize import dibr_rasterization

    fvi, fz, fn, fnz, face_uvs, w_soft, w_uv = _setup(template, B, H, W)
    F = fnz.shape[1]
    attrs = [jnp.ones((B, F, 3, 1), jnp.float32),
             jnp.broadcast_to(face_uvs[None], (B, F, 3, 2)),
             fn[:, :, None, :].repeat(3, axis=2)]
    golden = jax.jit(lambda fvi_: dibr_rasterization(
        H, W, fz, fvi_, attrs, fnz, soft_mode="line"))
    (feats, soft_g, idx_g) = golden(fvi)
    pallas = jax.jit(lambda fvi_: raster_fn(
        fvi_, fz, fnz, face_uvs, fn, height=H, width=W,
        interpret=not on_tpu))
    idx, soft, uv, normal, hard, dropped = pallas(fvi)

    idx_mismatch = float(np.mean(np.asarray(idx.reshape(B, H, W))
                                 != np.asarray(idx_g)))
    soft_err = float(jnp.max(jnp.abs(soft.reshape(B, H, W) - soft_g)))
    uv_err = float(jnp.max(jnp.abs(uv.reshape(B, H, W, 2) - feats[1])))

    def loss_g(fvi_):
        f, s, _ = golden(fvi_)
        return jnp.sum(s.reshape(B, -1) * w_soft) + jnp.sum(
            f[1].reshape(B, -1, 2) * w_uv)

    def loss_p(fvi_):
        _, s, uv_, _, _, _ = pallas(fvi_)
        return jnp.sum(s * w_soft) + jnp.sum(uv_ * w_uv)

    g_g = jax.jit(jax.grad(loss_g))(fvi)
    g_p = jax.jit(jax.grad(loss_p))(fvi)
    scale = float(jnp.max(jnp.abs(g_g)))
    grad_rel = float(jnp.max(jnp.abs(g_g - g_p))) / max(scale, 1e-30)

    return {
        "ok": bool(idx_mismatch < 1e-4 and soft_err < 5e-4
                   and uv_err < 1e-4 and grad_rel < 1e-4
                   and int(np.asarray(dropped).sum()) == 0),
        "template": os.path.basename(template),
        "shape": [B, H, W],
        "idx_mismatch_frac": idx_mismatch,
        "soft_max_abs_err": soft_err,
        "uv_max_abs_err": uv_err,
        "grad_max_rel_err": grad_rel,
        "dropped": int(np.asarray(dropped).sum()),
    }


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu and "--allow-cpu" not in sys.argv:
        print(json.dumps({"ok": False, "error": "no TPU present"}))
        sys.exit(1)

    from magicmirror.ops.pallas.rasterize_v4 import rasterize_fused_v4
    from magicmirror.ops.pallas.rasterize_v6 import rasterize_fused_v6

    v4 = _parity(rasterize_fused_v4, "template/sphere.obj", 4, 128, 128,
                 on_tpu)
    v6 = _parity(rasterize_fused_v6, "template/smpl_uv.obj", 2, 128, 128,
                 on_tpu)

    verdict = {
        "ok": bool(v4["ok"] and v6["ok"]),
        "backend": jax.default_backend(),
        "compiled_pallas": on_tpu,
        # v4 metrics stay top-level for cross-round continuity
        "idx_mismatch_frac": v4["idx_mismatch_frac"],
        "soft_max_abs_err": v4["soft_max_abs_err"],
        "uv_max_abs_err": v4["uv_max_abs_err"],
        "grad_max_rel_err": v4["grad_max_rel_err"],
        "dropped": v4["dropped"],
        "v4_sphere": v4,
        "v6_smpl": v6,
    }
    out_path = os.environ.get("PARITY_OUT", "PARITY.json")
    with open(out_path, "w") as fp:
        json.dump(verdict, fp, indent=1)
    print(json.dumps(verdict))
    sys.exit(0 if verdict["ok"] else 1)


if __name__ == "__main__":
    main()
