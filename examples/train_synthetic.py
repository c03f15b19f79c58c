"""Self-contained correctness demo: train on a synthetic dataset RENDERED BY
OUR OWN RENDERER (ground truth exists by construction), and watch the
reconstruction improve.

Mirrors SURVEY.md §4's 'CPU-runnable end-to-end smoke: synthetic dataset of
rendered ellipsoids, a few train steps, loss decreases'.

    python examples/train_synthetic.py [--steps 60] [--size 64] [--batch 8]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("MAGICMIRROR_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def make_synthetic_batch(dr, rng, batch, image_size):
    """Render deformed ellipsoids with procedural textures as 'photos'."""
    rs = np.random.RandomState(rng)
    V = dr.num_vertices
    # smooth random radial deformation
    freq = rs.uniform(2, 5, (batch, 1, 3))
    phase = rs.uniform(0, np.pi, (batch, 1, 3))
    base = np.asarray(dr.vertices_init)[None]
    bump = 0.15 * np.sin(freq * base * np.pi + phase).mean(-1, keepdims=True)
    verts = base * (1.0 + bump)
    # striped texture
    H, W = 2 * image_size, image_size
    ys = np.linspace(0, 8 * np.pi, H)[None, :, None, None]
    stripes = np.broadcast_to(
        0.5 + 0.5 * np.sin(ys + rs.uniform(0, np.pi, (batch, 1, 1, 1))),
        (batch, H, W, 1))
    tex = np.concatenate([
        stripes,
        np.broadcast_to(rs.uniform(0.2, 0.9, (batch, 1, 1, 1)), (batch, H, W, 1)),
        1.0 - stripes], axis=-1).astype(np.float32)
    att = {
        "azimuths": jnp.asarray(rs.uniform(-60, 60, batch), jnp.float32),
        "elevations": jnp.asarray(rs.uniform(5, 25, batch), jnp.float32),
        "distances": jnp.asarray(rs.uniform(2.5, 3.5, batch), jnp.float32),
        "biases": jnp.asarray(rs.uniform(-0.1, 0.1, (batch, 2)), jnp.float32),
        "vertices": jnp.asarray(verts, jnp.float32),
        "textures": jnp.asarray(tex),
        "lights": jnp.asarray(
            np.tile([[3.0, 0, 0.3, 0, 0, 0, 0, 0, 0]], (batch, 1)),
            jnp.float32),
        "bg": None,
    }
    rgba, _ = dr.render(**att)
    return np.asarray(rgba)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from magicmirror.configs.flags import build_parser
    from magicmirror.models.attribute_encoder import AttributeEncoder
    from magicmirror.models.discriminators import Discriminator
    from magicmirror.render.renderer import DiffRender
    from magicmirror.train.optim import make_optimizer_d, make_optimizer_e
    from magicmirror.train.state import create_train_state
    from magicmirror.train.train_step import make_train_step

    opt = build_parser().parse_args([])
    opt.imageSize = args.size
    opt.batchSize = args.batch
    opt.pretrains = opt.pretrainc = opt.pretraint = "none"
    opt.warm_epoch = 1

    template = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "template", "sphere.obj")
    dr = DiffRender(template, opt.imageSize, ratio=1.0)
    netE = AttributeEncoder(
        num_vertices=dr.num_vertices, azi_scope=opt.azi_scope,
        elev_range=opt.elev_range, dist_range=opt.dist_range,
        pretraint="none", pretrainc="none", pretrains="none",
        droprate=opt.droprate, ratio=1.0)
    netD = Discriminator(nc=3, nf=16)
    opt_e, opt_d = make_optimizer_e(), make_optimizer_d()
    lpl = dr.vertices_laplacian_matrix
    sample = jnp.zeros((args.batch, args.size, args.size, 4), jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), netE, netD, opt_e,
                               opt_d, sample, dr.vertices_init, lpl)
    step = make_train_step(opt, dr, netE, netD, opt_e, opt_d, lpl,
                           donate=False)

    batches = [jnp.asarray(make_synthetic_batch(dr, s, args.batch, args.size))
               for s in range(4)]
    rng = jax.random.PRNGKey(0)
    history = []
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        warm = min(1.0, 0.01 + i / 20.0)
        state, metrics, Xer, _ = step(state, batches[i % len(batches)], sub,
                                      3e-4, 3e-4, warm, 0)
        ld = float(metrics["lossR_data"])
        history.append(ld)
        if i % 5 == 0:
            print(f"step {i:3d}  lossR_data {ld:.4f}  "
                  f"lossD {float(metrics['lossD']):+.5f}")
    first = float(np.mean(history[:5]))
    last = float(np.mean(history[-5:]))
    print(f"\nrecon loss: first-5 mean {first:.4f} → last-5 mean {last:.4f} "
          f"({100 * (first - last) / first:.1f}% better)")
    assert last < first, "reconstruction did not improve"
    print("OK: end-to-end training improves reconstruction on synthetic data")


if __name__ == "__main__":
    main()
