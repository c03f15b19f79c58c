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

import os as _o
_o.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                        "/tmp/jax_tpu_cache")  # reuse tunnel compiles
import jax
import jax.numpy as jnp


def main():
    if os.environ.get("MAGICMIRROR_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

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

    # Serving dispatch: render ``spd`` independently-cameraed batches per
    # device call (lax.map over a stacked leading axis) — the serving-path
    # analogue of the trainer's steps_per_call scan dispatch.  MEASURED
    # round 4: spd=8 gives 2,533 vs 2,542 fps at spd=1 (identical within
    # noise) — the async dispatch loop already pipelines the host/tunnel
    # per-call cost behind device execution, so unlike the train step
    # (whose state-carry serializes calls), serving gains nothing from
    # batched dispatch.  Default stays 1; the knob remains for dispatch-
    # bound environments, and the JSON reports it when set.
    spd = int(os.environ.get("BENCH_BATCHES_PER_DISPATCH", "1"))
    if spd > 1:
        def stack(x):
            reps = [spd] + [1] * x.ndim
            return jnp.tile(x[None], reps)
        att_s = {k: (stack(v) if isinstance(v, jnp.ndarray) else v)
                 for k, v in att.items()}
        # vary the cameras per sub-batch so no two scan iterations are
        # CSE-able into one render
        att_s["azimuths"] = att_s["azimuths"] + jnp.linspace(
            0.0, 1.0, spd)[:, None]
        fwd = jax.jit(lambda a: jax.lax.map(
            lambda ai: dr.render(**ai)[0], a))
        att = att_s
    else:
        fwd = jax.jit(lambda a: dr.render(**a)[0])
    out = fwd(att)
    out.block_until_ready()  # compile

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(att)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = batch * iters * spd / dt

    baseline = 5000.0
    rec = {
        "metric": "soft_rasterized_fps_256",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 4),
    }
    if spd > 1:
        rec["batches_per_dispatch"] = spd
    try:
        att_m = ({k: v[0] for k, v in att.items() if v is not None}
                 if spd > 1 else att)
        att_m = dict(att_m, bg=None)
        coverage = float(jnp.mean((out[..., 3] > 0.5).astype(jnp.float32)))
        rec["mfu"] = mfu_report(dr, att_m, dt / (batch * iters * spd),
                                coverage)
    except Exception as e:  # diagnostics must never break the bench line
        rec["mfu"] = {"error": str(e)[:120]}
    print(json.dumps(rec))


# nominal v5e (TPU v5 lite) peaks; methodology in docs/DESIGN.md
_PEAK_MXU_BF16 = 197e12
_PEAK_VPU_F32 = 4e12
_KERNEL_OPS_PER_PAIR = 50   # VPU slots per (face, pixel) pair, _fwd_kernel
_TEX_USEFUL_PER_PX = 24     # 4 taps x 3 ch x (mul+add) of true bilinear


def mfu_report(dr, att, sec_per_frame, coverage):
    """Useful- vs issued-FLOP utilization of the two dominant stages
    (VERDICT r2 item 7), normalized by the WHOLE-pipeline frame time — a
    lower bound per stage, but it makes padding/structural-zero waste
    visible on every bench run."""
    import jax
    import jax.numpy as jnp
    from magicmirror.geometry import camera as cam
    from magicmirror.ops.pallas.rasterize_v4 import (
        _auto_cells, _bin_lists, default_capacity)
    from magicmirror.ops.pallas import texture_cells as tc

    H, W = dr.render_height, dr.render_width
    br, ncols = _auto_cells(H, W)
    n_cells = (H // br) * ncols
    npix = br * (W // ncols)
    cap = default_capacity(dr.num_faces, n_cells)

    @jax.jit
    def probe(a):
        B = a["azimuths"].shape[0]
        object_pos = jnp.concatenate(
            [a["biases"], jnp.zeros((B, 1), jnp.float32)], axis=1)
        up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), (B, 3))
        pos = cam.camera_position_from_spherical_angles(
            a["distances"], a["elevations"], a["azimuths"], degrees=True)
        tr = cam.generate_transformation_matrix(pos, object_pos, up)
        _, fvi, fn = cam.prepare_vertices(a["vertices"], dr.faces,
                                          dr.cam_proj, tr)

        def one(args):
            fvi1, fnz1 = args
            lists, _ = _bin_lists(fvi1, fnz1, H // br, cap, ncols)
            counts = (lists < dr.num_faces).sum(axis=1)
            # v5 stream: only LIVE 8-face chunks execute (ceil(count/8)·8
            # slots per cell); v4 executes the full static capacity
            return counts.sum(), (-(-counts // 8) * 8).sum()

        pairs, slots = jax.lax.map(one, (fvi, fn[:, :, 2]))
        return pairs.sum(), slots.sum()

    B = att["azimuths"].shape[0]
    from magicmirror.ops.pallas.rasterize_v4 import stream_enabled
    pairs_useful, stream_slots = (int(x) for x in probe(att))
    pairs_cap = B * n_cells * cap
    # `issued` describes the kernel that actually runs: the v5 stream
    # (default) executes live chunks only, so its issue bound is the live
    # slot count, not n_cells*capacity; the capacity-basis number is kept
    # as `kernel_pair_occupancy_cap_pct` for cross-round continuity
    pairs_issued = stream_slots if stream_enabled() else pairs_cap

    kern_useful = pairs_useful / B * npix * _KERNEL_OPS_PER_PAIR
    kern_issued = pairs_issued / B * npix * _KERNEL_OPS_PER_PAIR

    # texture stage: the ragged cell kernel's static issue bound (3 MXU
    # dots of (128, Wt)x(Wt, npix) per chunk, capacity chunks) vs the
    # 24-flop-per-covered-pixel true-bilinear lower bound
    Ht, Wt = att["textures"].shape[1], att["textures"].shape[2]
    covered_px = H * W * coverage
    tex = {"useful_flops_frame": float(_TEX_USEFUL_PER_PX * covered_px)}
    if tc.enabled() and tc.supported(H, W, Ht, Wt, 3):
        ch, cw = tc.cell_shape(H, W)
        tcap = tc.default_chunk_capacity((H // ch) * (W // cw))
        tex["issued_flops_frame"] = float(3 * 2 * 128 * Wt * (ch * cw) * tcap)
    else:
        # dense tent matmul: (P, Ht) @ (Ht, Wt*3)
        tex["issued_flops_frame"] = float(2 * H * W * Ht * Wt * 3)

    flops_per_sec = 1.0 / sec_per_frame
    return {
        "kernel_useful_mfu_pct": round(
            kern_useful * flops_per_sec / _PEAK_VPU_F32 * 100, 3),
        "kernel_issued_mfu_pct": round(
            kern_issued * flops_per_sec / _PEAK_VPU_F32 * 100, 3),
        "kernel_pair_occupancy_pct": round(
            pairs_useful / pairs_issued * 100, 2),
        "kernel_pair_occupancy_cap_pct": round(
            pairs_useful / pairs_cap * 100, 2),
        "tex_useful_mfu_pct": round(
            tex["useful_flops_frame"] * flops_per_sec / _PEAK_MXU_BF16 * 100,
            4),
        "tex_issued_mfu_pct": round(
            tex["issued_flops_frame"] * flops_per_sec / _PEAK_MXU_BF16 * 100,
            3),
        "note": "flops/frame over WHOLE-pipeline time; peaks v5e nominal",
    }


if __name__ == "__main__":
    main()
