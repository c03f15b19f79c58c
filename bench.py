#!/usr/bin/env python
"""Benchmark: soft-rasterized render throughput at 256² (BASELINE.md
north-star: ≥ 5,000 frames/sec/chip on TPU v5e).

Renders the full DiffRender pipeline (camera → DIB-R soft rasterize →
texture → SH light → compose) on the 642-v/1280-f sphere template and prints
ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from magicmirror.render.renderer import DiffRender

    template = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "template", "sphere.obj")
    image_size = 256
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    if backend == "auto":
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        try:
            from magicmirror.ops.pallas import rasterize_tpu  # noqa: F401
        except Exception:
            backend = "xla"

    # NO special settings: the benchmark runs the renderer exactly as the
    # trainer constructs it (default soft_mode='line', auto band capacity)
    # so the number measured here is the number training actually gets.
    kwargs = {}
    if os.environ.get("BENCH_SOFT_MODE"):
        kwargs["soft_mode"] = os.environ["BENCH_SOFT_MODE"]
    dr = DiffRender(template, image_size, ratio=1.0, backend=backend,
                    **kwargs)
    rng = np.random.RandomState(0)
    V = dr.num_vertices
    att = {
        "azimuths": jnp.asarray(rng.uniform(-180, 180, batch), jnp.float32),
        "elevations": jnp.asarray(rng.uniform(0, 30, batch), jnp.float32),
        "distances": jnp.asarray(rng.uniform(2, 4, batch), jnp.float32),
        "biases": jnp.asarray(rng.uniform(-0.2, 0.2, (batch, 2)), jnp.float32),
        "vertices": jnp.asarray(
            dr.vertices_init[None] + rng.uniform(-0.05, 0.05, (batch, V, 3)),
            jnp.float32),
        "textures": jnp.asarray(rng.rand(batch, 2 * image_size, image_size, 3),
                                jnp.float32),
        "lights": jnp.asarray(
            np.concatenate([np.full((batch, 1), 3.0),
                            rng.uniform(-0.1, 0.1, (batch, 8))], 1), jnp.float32),
        "bg": None,
        "delta_vertices": jnp.zeros((batch, V, 3), jnp.float32),
    }

    fwd = jax.jit(lambda a: dr.render(**a)[0])
    out = fwd(att)
    out.block_until_ready()  # compile

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(att)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = batch * iters / dt

    baseline = 5000.0
    print(json.dumps({
        "metric": "soft_rasterized_fps_256",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 4),
    }))


if __name__ == "__main__":
    main()
