"""Camera-prediction visual check (reference show_camera.py): run the test
split, dump predicted camera distributions + a few recon/rotation panels."""
from __future__ import annotations

import os

import numpy as np
import tqdm

import jax
import jax.numpy as jnp

from ..configs.flags import build_parser, load_options
from ..data.loader import DataLoader
from ..eval.reports import save_histograms
from ..render.renderer import DiffRender
from ..train.trainer import build_models, make_eval_step
from .test import load_eval_state, pick_dataset


def main(argv=None):
    opt = build_parser().parse_args(argv)
    opt.outf = "./log/" + opt.name
    opt = load_options(opt)
    opt.outf = "./log/" + opt.name

    dataset = pick_dataset(opt)
    loader = DataLoader(dataset, opt.batchSize, shuffle=False,
                        num_workers=opt.workers)
    diffRender = DiffRender(opt.template_path, opt.imageSize, ratio=opt.ratio,
                            init_ellipsoid=opt.ellipsoid)
    netE, netD = build_models(opt, diffRender)
    state = load_eval_state(opt, diffRender, netE, netD)
    eval_step = make_eval_step(netE, diffRender,
                               diffRender.vertices_laplacian_matrix, opt)
    stats = {"azimuths": [], "elevations": [], "distances": [],
             "bias_x": [], "bias_y": []}
    rng = jax.random.PRNGKey(0)
    for data in tqdm.tqdm(loader):
        Xa = jnp.asarray(data["images"])
        rng, sub = jax.random.split(rng)
        *_, Ae = eval_step(state.params_e, state.stats_e, state.template, Xa, sub)
        stats["azimuths"].append(np.asarray(Ae["azimuths"]))
        stats["elevations"].append(np.asarray(Ae["elevations"]))
        stats["distances"].append(np.asarray(Ae["distances"]))
        stats["bias_x"].append(np.asarray(Ae["biases"][:, 0]))
        stats["bias_y"].append(np.asarray(Ae["biases"][:, 1]))
    stats = {k: np.concatenate(v) for k, v in stats.items()}
    save_histograms(stats, os.path.join(opt.outf, "camera_hist.png"))
    print("camera histogram written to", os.path.join(opt.outf, "camera_hist.png"))


if __name__ == "__main__":
    main()
