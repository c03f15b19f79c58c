#!/usr/bin/env python
"""Big-template proof (VERDICT r2 item 3): rasterize sphere (1,280 f),
sphere2 (5,120 f) and SMPL (13,776 f — reference networks.py:177-178,
template/smpl_uv.obj) through the full DiffRender pipeline at the
reference's training shapes, sweep the adversarial camera ranges, and
record fwd / fwd+bwd throughput plus the capacity-overflow diagnostics.

Shapes: CUB 256² (ratio 1, dist 2~7, elev 0~30, reference train.py:125-127),
Market 128×64 (imageSize 64 ratio 2, dist 2~6, elev -15~15,
train_market.py:128-130), THuman 256×128 (imageSize 128 ratio 2, dist 2~8).

Writes one JSON line per row and BIGTEMPLATES.json at the repo root.

    python benchmarks/bench_big_templates.py            # real TPU
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _o
_o.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                        "/tmp/jax_tpu_cache")  # reuse tunnel compiles
import jax
import jax.numpy as jnp

from magicmirror.render.renderer import DiffRender

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (label, template, image_size, ratio, dist_range, elev_range)
    ("cub_sphere_256", "sphere.obj", 256, 1.0, (2.0, 7.0), (0.0, 30.0)),
    ("cub_sphere2_256", "sphere2.obj", 256, 1.0, (2.0, 7.0), (0.0, 30.0)),
    ("cub_smpl_256", "smpl_uv.obj", 256, 1.0, (2.0, 7.0), (0.0, 30.0)),
    ("market_smpl_128x64", "smpl_uv.obj", 64, 2.0, (2.0, 6.0), (-15.0, 15.0)),
    ("thuman_smpl_256x128", "smpl_uv.obj", 128, 2.0, (2.0, 8.0), (-15.0, 30.0)),
]


def make_attributes(dr, batch, dists, elevs, rs):
    V = dr.num_vertices
    H, W = dr.render_height, dr.render_width
    return {
        "azimuths": jnp.asarray(rs.uniform(-180, 180, batch), jnp.float32),
        "elevations": jnp.asarray(elevs, jnp.float32),
        "distances": jnp.asarray(dists, jnp.float32),
        "biases": jnp.asarray(rs.uniform(-0.2, 0.2, (batch, 2)), jnp.float32),
        "vertices": jnp.asarray(
            dr.vertices_init[None] + rs.uniform(-0.05, 0.05, (batch, V, 3)),
            jnp.float32),
        "textures": jnp.asarray(rs.rand(batch, 2 * H, W, 3), jnp.float32),
        "lights": jnp.asarray(
            np.concatenate([np.full((batch, 1), 3.0),
                            rs.uniform(-0.1, 0.1, (batch, 8))], 1),
            jnp.float32),
        "bg": None,
        "delta_vertices": jnp.zeros((batch, V, 3), jnp.float32),
    }


def run_config(label, template, image_size, ratio, dist_range, elev_range,
               batch=32, iters=10):
    dr = DiffRender(os.path.join(ROOT, "template", template), image_size,
                    ratio=ratio)
    rs = np.random.RandomState(0)

    fwd = jax.jit(lambda a: dr.render(**a))

    def loss(a):
        rgba, att = dr.render(**a)
        aux = (att.get("dropped_faces", jnp.zeros((batch,), jnp.int32)),
               att.get("dropped_tex_chunks", jnp.zeros((batch,), jnp.int32)))
        return jnp.sum(rgba ** 2), aux

    grad = jax.jit(jax.grad(
        lambda a: loss(a)[0],
        argnums=0))

    # --- adversarial camera sweep: batches pinned at graded distances
    # including the closest allowed camera (worst face/cell density)
    sweep_dropped = {"faces": 0, "tex": 0}
    lo, hi = dist_range
    for dist in np.linspace(lo, hi, 7):
        dists = np.full(batch, dist)
        elevs = np.linspace(elev_range[0], elev_range[1], batch)
        att = make_attributes(dr, batch, dists, elevs, rs)
        rgba, out_att = fwd(att)
        jax.block_until_ready(rgba)
        if "dropped_faces" in out_att:
            sweep_dropped["faces"] = max(
                sweep_dropped["faces"],
                int(np.asarray(out_att["dropped_faces"]).max()))
        if "dropped_tex_chunks" in out_att:
            sweep_dropped["tex"] = max(
                sweep_dropped["tex"],
                int(np.asarray(out_att["dropped_tex_chunks"]).max()))

    # --- throughput at the training camera distribution
    att = make_attributes(
        dr, batch, rs.uniform(lo, hi, batch),
        rs.uniform(elev_range[0], elev_range[1], batch), rs)
    rgba, _ = fwd(att)
    jax.block_until_ready(rgba)
    t0 = time.perf_counter()
    for _ in range(iters):
        rgba, _ = fwd(att)
    jax.block_until_ready(rgba)
    fwd_ms = (time.perf_counter() - t0) / iters * 1000

    g = grad(att)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = grad(att)
    jax.block_until_ready(g)
    bwd_ms = (time.perf_counter() - t0) / iters * 1000

    row = {
        "config": label,
        "template": template,
        "faces": int(dr.num_faces),
        "shape": [dr.render_height, dr.render_width],
        "batch": batch,
        "fwd_ms": round(fwd_ms, 2),
        "fwd_fps": round(batch / fwd_ms * 1000, 1),
        "fwdbwd_ms": round(bwd_ms, 2),
        "fwdbwd_fps": round(batch / bwd_ms * 1000, 1),
        "sweep_dropped_faces": sweep_dropped["faces"],
        "sweep_dropped_tex_chunks": sweep_dropped["tex"],
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    only = os.environ.get("BIGBENCH_ONLY")
    rows = []
    for cfg in CONFIGS:
        if only and only not in cfg[0]:
            continue
        rows.append(run_config(*cfg))
    out = {"device": str(jax.devices()[0]), "rows": rows}
    with open(os.path.join(ROOT, "BIGTEMPLATES.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BIGTEMPLATES.json")


if __name__ == "__main__":
    main()
