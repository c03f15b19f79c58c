"""Training-step throughput on the current device (full D+G alternation).

Env: B (batch), S (imageSize), RATIO (height/width, reference --ratio; the
render/input is (RATIO*S, S)), ITERS.  Reference-scale shapes
(VERDICT r2 item 4): CUB b48 S=128 ratio 1 (reference README.md:192-202),
Market b48 S=64 ratio 2 (64 wide x 128 high), THuman b16 S=128 ratio 2.

    B=48 S=128 python benchmarks/bench_train_step.py
    B=48 S=64 RATIO=2 python benchmarks/bench_train_step.py
    JSON_OUT=TRAINBENCH.json python benchmarks/bench_train_step.py  # append
"""
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import time

import numpy as np

import os as _o
_o.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                        "/tmp/jax_tpu_cache")  # reuse tunnel compiles
import jax
import jax.numpy as jnp


def main():
    from magicmirror.configs.flags import build_parser
    from magicmirror.models.attribute_encoder import AttributeEncoder
    from magicmirror.models.discriminators import Discriminator
    from magicmirror.render.renderer import DiffRender
    from magicmirror.train.optim import make_optimizer_d, make_optimizer_e
    from magicmirror.train.state import create_train_state
    from magicmirror.train.train_step import make_train_step

    B = int(_os.environ.get("B", "16"))
    S = int(_os.environ.get("S", "128"))
    ratio = float(_os.environ.get("RATIO", "1"))
    H = round(ratio * S)
    opt = build_parser().parse_args([])
    opt.imageSize = S
    opt.batchSize = B
    opt.ratio = ratio
    opt.pretrains = opt.pretrainc = opt.pretraint = "none"

    template = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "..", "template", "sphere.obj")
    dr = DiffRender(template, S, ratio=ratio)
    netE = AttributeEncoder(num_vertices=dr.num_vertices,
                            pretrains="none", pretrainc="none",
                            pretraint="none", droprate=opt.droprate,
                            ratio=ratio)
    netD = Discriminator(nc=3, nf=16)
    opt_e, opt_d = make_optimizer_e(), make_optimizer_d()
    lpl = dr.vertices_laplacian_matrix
    state = create_train_state(jax.random.PRNGKey(0), netE, netD, opt_e,
                               opt_d, jnp.zeros((B, H, S, 4)),
                               dr.vertices_init, lpl)
    # donate=False is the trainer's default (train/trainer.py): donation
    # measured 15-27% SLOWER per step through the remote-execution path
    # (b48/128²: 775 vs 566 ms) and HBM is not the constraint at these
    # shapes.  DONATE=1 reproduces the donated configuration.
    spc = int(_os.environ.get("SPC", "1"))
    step = make_train_step(opt, dr, netE, netD, opt_e, opt_d, lpl,
                           donate=_os.environ.get("DONATE", "0") == "1",
                           steps_per_call=spc)
    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(0)
    if spc > 1:
        Xa = jnp.asarray(rs.rand(spc, B, H, S, 4).astype(np.float32))
        warms = jnp.ones((spc,), jnp.float32)

        def call(st, k):
            ks = jax.random.split(k, spc)
            return step(st, Xa, ks, 1e-4, 1e-4, warms, 0)
    else:
        Xa = jnp.asarray(rs.rand(B, H, S, 4).astype(np.float32))

        def call(st, k):
            return step(st, Xa, k, 1e-4, 1e-4, 1.0, 0)
    t0 = time.perf_counter()
    state, m, *_ = call(state, rng)
    jax.block_until_ready(m["lossR"])
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s")
    iters = int(_os.environ.get("ITERS", "10"))
    t0 = time.perf_counter()
    for i in range(iters):
        rng, sub = jax.random.split(rng)
        state, m, *_ = call(state, sub)
    jax.block_until_ready(m["lossR"])
    dt = (time.perf_counter() - t0) / (iters * spc)
    row = {"metric": "train_step_imgs_per_sec", "batch": B,
           "shape": [H, S], "step_ms": round(dt * 1e3, 1),
           "value": round(B / dt, 1)}
    if spc > 1:
        row["steps_per_call"] = spc
    print(f"train step (B={B}, {H}x{S}, spc={spc}): {dt*1e3:.1f} ms → "
          f"{B/dt:.1f} imgs/sec ({dt:.3f} s/step)")
    print(json.dumps(row))
    out = _os.environ.get("JSON_OUT")
    if out:
        rows = []
        if _os.path.exists(out):
            with open(out) as f:
                rows = json.load(f)
        rows.append(row)
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
