"""Probe: trace+lower the dryrun train step under flag variants and report
HLO module size — picks the cheapest-to-compile gate config WITHOUT paying a
full XLA:CPU compile per variant (compile scales with module size; lowering
is ~10x cheaper).  Round-5 gate work: the restructured single-compile dryrun
still exceeded 850 s solo cold on the 1-core driver host."""
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=1 "
    "--xla_llvm_disable_expensive_passes=true "
    + os.environ.get("EXTRA_XLA_FLAGS", ""))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magicmirror.configs.flags import build_parser  # noqa: E402
from magicmirror.dist.mesh import (  # noqa: E402
    batch_sharding, make_device_mesh, replicate_sharding)
from magicmirror.models.attribute_encoder import AttributeEncoder  # noqa: E402
from magicmirror.models.discriminators import Discriminator  # noqa: E402
from magicmirror.render.renderer import DiffRender  # noqa: E402
from magicmirror.train.optim import make_optimizer_d, make_optimizer_e  # noqa: E402
from magicmirror.train.state import create_train_state  # noqa: E402
from magicmirror.train.train_step import make_train_step  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(tag, image_size=32, nf=8, nfd=16, **overrides):
    t0 = time.time()
    opt = build_parser().parse_args([])
    opt.imageSize = image_size
    opt.batchSize = 8
    opt.nf = nf
    opt.pretrains = opt.pretrainc = opt.pretraint = "none"
    for k, v in overrides.items():
        setattr(opt, k, v)

    template = os.path.join(ROOT, "template", "sphere_dryrun.obj")
    dr = DiffRender(template, opt.imageSize, ratio=opt.ratio,
                    init_ellipsoid=opt.ellipsoid)
    netE = AttributeEncoder(
        num_vertices=dr.num_vertices, azi_scope=opt.azi_scope,
        elev_range=opt.elev_range, dist_range=opt.dist_range, nc=4, nk=opt.nk,
        nf=opt.nf, ratio=opt.ratio, pretraint=opt.pretraint,
        pretrainc=opt.pretrainc, pretrains=opt.pretrains,
        droprate=opt.droprate, norm=opt.norm)
    netD = Discriminator(nc=3, nf=nfd)
    opt_e, opt_d = make_optimizer_e(), make_optimizer_d()
    lpl = dr.vertices_laplacian_matrix
    sample = jnp.zeros((8, image_size, image_size, 4), jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), netE, netD, opt_e,
                               opt_d, sample, dr.vertices_init, lpl)
    step = make_train_step(opt, dr, netE, netD, opt_e, opt_d, lpl,
                           donate=False)
    t_build = time.time() - t0

    mesh = make_device_mesh(8)
    rep, bsh = replicate_sharding(mesh), batch_sharding(mesh)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
    rs = np.random.RandomState(0)
    Xa = jax.device_put(
        jnp.asarray(rs.rand(8, image_size, image_size, 4), jnp.float32), bsh)
    rng = jax.device_put(jax.random.PRNGKey(0), rep)

    t1 = time.time()
    lowered = step.lower(state, Xa, rng, 1e-4, 1e-4, 1.0, 0)
    txt = lowered.as_text()
    t_lower = time.time() - t1
    n_ops = txt.count("\n")
    print(f"{tag:28s} build {t_build:6.1f}s  lower {t_lower:6.1f}s  "
          f"hlo_lines {n_ops:>8d}", flush=True)
    return n_ops


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    V = {
        "base": dict(),
        "no_ic": dict(lambda_ic=0.0),
        "no_flip_edge_def": dict(lambda_flipz=0.0, lambda_edge=0.0,
                                 lambda_deform=0.0, chamfer=False),
        "min": dict(lambda_ic=0.0, lambda_flipz=0.0, lambda_edge=0.0,
                    lambda_deform=0.0, chamfer=False, swa=False),
        "min_d8": dict(lambda_ic=0.0, lambda_flipz=0.0, lambda_edge=0.0,
                       lambda_deform=0.0, chamfer=False, swa=False, nfd=8),
    }
    for tag, kw in (V.items() if which == "all" else [(which, V[which])]):
        nfd = kw.pop("nfd", 16)
        probe(tag, nfd=nfd, **kw)
