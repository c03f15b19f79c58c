"""Cumulative-prefix profile of the full D+G train step (VERDICT round-1
item 10): encoder+render forward, D update, G backward, optimizer — measured
in context on the real chip so round-3 optimization is evidence-driven."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from magicmirror.configs.flags import build_parser
    from magicmirror.models.attribute_encoder import AttributeEncoder
    from magicmirror.models.discriminators import Discriminator
    from magicmirror.render.renderer import DiffRender
    from magicmirror.train.optim import make_optimizer_d, make_optimizer_e
    from magicmirror.train.state import create_train_state
    from magicmirror.train import train_step as ts

    B = int(os.environ.get("B", "16"))
    S = int(os.environ.get("S", "128"))
    opt = build_parser().parse_args([])
    opt.imageSize, opt.batchSize = S, B
    opt.pretrains = opt.pretrainc = opt.pretraint = "none"

    template = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "template", "sphere.obj")
    dr = DiffRender(template, S, ratio=1.0)
    netE = AttributeEncoder(num_vertices=dr.num_vertices,
                            azi_scope=opt.azi_scope,
                            elev_range=opt.elev_range,
                            dist_range=opt.dist_range,
                            pretrains="none", pretrainc="none",
                            pretraint="none", droprate=opt.droprate)
    netD = Discriminator(nc=3, nf=16)
    opt_e, opt_d = make_optimizer_e(), make_optimizer_d()
    lpl = dr.vertices_laplacian_matrix
    state = create_train_state(jax.random.PRNGKey(0), netE, netD, opt_e,
                               opt_d, jnp.zeros((B, S, S, 4)),
                               dr.vertices_init, lpl)
    step = ts.make_train_step(opt, dr, netE, netD, opt_e, opt_d, lpl,
                              donate=False)
    rs = np.random.RandomState(0)
    Xa = jnp.asarray(rs.rand(B, S, S, 4).astype(np.float32))
    rng = jax.random.PRNGKey(0)

    # rebuild the pieces the step closes over, as standalone jits
    fns = ts.make_train_step_fns(opt, dr, netE, netD, lpl) if hasattr(
        ts, "make_train_step_fns") else None

    def enc_render_fwd(params_e, stats_e, Xa, template, rng):
        # encoder + ALL renders (the e_outputs forward), value only
        variables = {"params": params_e, "batch_stats": stats_e}
        att, _ = netE.apply(variables, Xa, template, lpl, 0, train=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": rng})
        rgba, att = dr.render(**att)
        return rgba

    print(f"B={B} S={S}")
    t_fwd = bench(jax.jit(enc_render_fwd), state.params_e, state.stats_e, Xa,
                  state.template, rng)
    print(f"encoder+1 render fwd : {t_fwd*1e3:8.2f} ms")

    def fwd_bwd(params_e, stats_e, Xa, template):
        def loss(p):
            v = {"params": p, "batch_stats": stats_e}
            att, _ = netE.apply(v, Xa, template, lpl, 0, train=True,
                                mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(0)})
            rgba, _ = dr.render(**att)
            return jnp.sum(rgba ** 2) * 1e-3

        return jax.grad(loss)(params_e)

    t_bwd = bench(jax.jit(fwd_bwd), state.params_e, state.stats_e, Xa,
                  state.template)
    print(f"+backward (1 render) : {t_bwd*1e3:8.2f} ms")

    t_full = bench(lambda: step(state, Xa, rng, 1e-4, 1e-4, 1.0, 0)[1][
        "lossR"])
    print(f"full D+G step        : {t_full*1e3:8.2f} ms "
          f"({B/t_full:.1f} imgs/sec)")


if __name__ == "__main__":
    main()
