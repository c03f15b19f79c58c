"""Probe: ONE full XLA:CPU compile of the dryrun train step with per-pass
logging (TF_CPP_VMODULE) — answers WHERE the ~1900-s 1-core compile goes
(HLO passes vs LLVM/thunk codegen), which decides the round-5 gate fix:
disable a superlinear pass via XLA_FLAGS vs shrink the module op count.

Usage:  timeout 3000 python benchmarks/probe_compile_passes.py [tag] 2>pass.log
"""
import os
import sys
import time

os.environ.setdefault(
    "TF_CPP_VMODULE",
    "hlo_pass_pipeline=1,cpu_compiler=1,ir_compiler=1,thunk_emitter=1,"
    "compiler_functor=1,llvm_compiler=1")
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "0"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    "--xla_backend_optimization_level=1 "
    "--xla_llvm_disable_expensive_passes=true "
    + os.environ.get("EXTRA_XLA_FLAGS", ""))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.probe_dryrun_lower import probe  # noqa: E402  (sets platform cpu)
import benchmarks.probe_dryrun_lower as pdl  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "base"
    t0 = time.time()
    # reuse probe()'s builder but keep the lowered object to compile it
    import jax
    import jax.numpy as jnp
    import numpy as np
    from magicmirror.configs.flags import build_parser
    from magicmirror.dist.mesh import (
        batch_sharding, make_device_mesh, replicate_sharding)
    from magicmirror.models.attribute_encoder import AttributeEncoder
    from magicmirror.models.discriminators import Discriminator
    from magicmirror.render.renderer import DiffRender
    from magicmirror.train.optim import make_optimizer_d, make_optimizer_e
    from magicmirror.train.state import create_train_state
    from magicmirror.train.train_step import make_train_step

    opt = build_parser().parse_args([])
    opt.imageSize = 32
    opt.batchSize = 8
    opt.nf = 8
    opt.pretrains = opt.pretrainc = opt.pretraint = "none"

    template = os.path.join(pdl.ROOT, "template", "sphere_dryrun.obj")
    dr = DiffRender(template, opt.imageSize, ratio=opt.ratio,
                    init_ellipsoid=opt.ellipsoid)
    netE = AttributeEncoder(
        num_vertices=dr.num_vertices, azi_scope=opt.azi_scope,
        elev_range=opt.elev_range, dist_range=opt.dist_range, nc=4, nk=opt.nk,
        nf=opt.nf, ratio=opt.ratio, pretraint=opt.pretraint,
        pretrainc=opt.pretrainc, pretrains=opt.pretrains,
        droprate=opt.droprate, norm=opt.norm)
    netD = Discriminator(nc=3, nf=16)
    opt_e, opt_d = make_optimizer_e(), make_optimizer_d()
    lpl = dr.vertices_laplacian_matrix
    sample = jnp.zeros((8, 32, 32, 4), jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), netE, netD, opt_e,
                               opt_d, sample, dr.vertices_init, lpl)
    step = make_train_step(opt, dr, netE, netD, opt_e, opt_d, lpl,
                           donate=False)
    print(f"[{time.time()-t0:7.1f}s] built", flush=True)

    mesh = make_device_mesh(8)
    rep, bsh = replicate_sharding(mesh), batch_sharding(mesh)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
    rs = np.random.RandomState(0)
    Xa = jax.device_put(jnp.asarray(rs.rand(8, 32, 32, 4), jnp.float32), bsh)
    rng = jax.device_put(jax.random.PRNGKey(0), rep)

    lowered = step.lower(state, Xa, rng, 1e-4, 1e-4, 1.0, 0)
    print(f"[{time.time()-t0:7.1f}s] lowered "
          f"({lowered.as_text().count(chr(10))} lines)", flush=True)
    lowered.compile()
    print(f"[{time.time()-t0:7.1f}s] compiled  tag={tag}", flush=True)


if __name__ == "__main__":
    main()
