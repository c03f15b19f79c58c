"""THuman2 evaluation (reference test_THU.py): standard SSIM/mask-IoU/FID plus
rendered-vs-GT normal-map MSE (reference test_THU.py:343-345, 380-390)."""
from __future__ import annotations

import os

import numpy as np
import tqdm

import jax
import jax.numpy as jnp

from ..configs.flags import build_parser, load_options
from ..data.loader import DataLoader
from ..data.thuman2 import THuman2Dataset
from ..eval.metrics import normal_mse
from ..eval.reports import ResultLog
from ..render.renderer import DiffRender
from ..train.trainer import build_models, make_eval_step
from .test import load_eval_state


def main(argv=None):
    opt = build_parser().parse_args(argv)
    opt.outf = "./log/" + opt.name
    opt = load_options(opt)
    opt.outf = "./log/" + opt.name

    dataset = THuman2Dataset(opt.dataroot, opt.imageSize, train=False,
                             ratio=opt.ratio, bg=opt.bg)
    loader = DataLoader(dataset, opt.batchSize, shuffle=False,
                        num_workers=opt.workers)
    diffRender = DiffRender(opt.template_path, opt.imageSize, ratio=opt.ratio,
                            init_ellipsoid=opt.ellipsoid)
    netE, netD = build_models(opt, diffRender)
    state = load_eval_state(opt, diffRender, netE, netD)
    lpl = diffRender.vertices_laplacian_matrix

    @jax.jit
    def fwd(Xa):
        att = netE.apply({"params": state.params_e,
                          "batch_stats": state.stats_e},
                         Xa, state.template, lpl, train_shape=0, train=False)
        rgba, att = diffRender.render(**att)
        return rgba, att["imnormal"]

    mses = []
    for data in tqdm.tqdm(loader):
        if "normal" not in data:
            continue
        Xa = jnp.asarray(data["images"])
        rgba, imnormal = fwd(Xa)
        gt_normal = jnp.asarray(data["normal"]) * 2.0 - 1.0  # [0,1] png → [-1,1]
        mask = Xa[..., 3]
        mses.append(float(normal_mse(imnormal, gt_normal, mask)))
    mse = float(np.mean(mses)) if mses else float("nan")
    print("Normal-map MSE: %.4f" % mse)
    ResultLog(os.path.join(opt.outf, "result.txt")).write(
        "THuman normal MSE: %.4f" % mse)


if __name__ == "__main__":
    main()
