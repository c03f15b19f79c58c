"""CUB multi-view FID (reference test_CUB30.py): render the test set at 12
azimuth bins (-180..180 step 30) and report the FID averaged over bins
(reference test_CUB30.py:309-337)."""
from __future__ import annotations

import os

import numpy as np
import tqdm

import jax
import jax.numpy as jnp

from ..configs.flags import build_parser, load_options
from ..data.cub import CUBDataset
from ..data.loader import DataLoader
from ..eval.fid import calculate_fid_given_paths
from ..eval.images import save_images_parallel
from ..eval.reports import ResultLog
from ..render.renderer import DiffRender, deep_copy
from ..train.trainer import build_models
from .test import load_eval_state


def main(argv=None):
    opt = build_parser().parse_args(argv)
    opt.outf = "./log/" + opt.name
    opt = load_options(opt)
    opt.outf = "./log/" + opt.name

    dataset = CUBDataset(opt.dataroot, opt.imageSize, train=False, aug=False,
                         bg=opt.bg)
    loader = DataLoader(dataset, opt.batchSize, shuffle=False,
                        num_workers=opt.workers)
    diffRender = DiffRender(opt.template_path, opt.imageSize, ratio=opt.ratio,
                            init_ellipsoid=opt.ellipsoid)
    netE, netD = build_models(opt, diffRender)
    state = load_eval_state(opt, diffRender, netE, netD)
    lpl = diffRender.vertices_laplacian_matrix

    @jax.jit
    def encode(Xa):
        return netE.apply({"params": state.params_e,
                           "batch_stats": state.stats_e},
                          Xa, state.template, lpl, train_shape=0, train=False)

    render = jax.jit(lambda **att: diffRender.render(**att)[0])

    ori_dir = os.path.join(opt.outf, "fid30", "ori")
    os.makedirs(ori_dir, exist_ok=True)
    bins = list(range(-180, 180, 30))
    bin_dirs = {}
    for azi in bins:
        d = os.path.join(opt.outf, "fid30", "azi%+04d" % azi)
        os.makedirs(d, exist_ok=True)
        bin_dirs[azi] = d

    to_save = []
    for data in tqdm.tqdm(loader):
        Xa = jnp.asarray(data["images"])
        att = deep_copy(encode(Xa), detach=True)
        B = Xa.shape[0]
        for b in range(B):
            name = os.path.basename(data["path"][b])
            to_save.append((np.asarray(Xa[b, :, :, :3]),
                            os.path.join(ori_dir, name)))
        for azi in bins:
            att2 = dict(att)
            att2["azimuths"] = jnp.full((B,), -float(azi), jnp.float32)
            rgba = np.asarray(render(**att2))
            for b in range(B):
                name = os.path.basename(data["path"][b])
                to_save.append((rgba[b, :, :, :3],
                                os.path.join(bin_dirs[azi], name)))
    save_images_parallel(to_save, workers=4)

    fids = []
    for azi in bins:
        fid = calculate_fid_given_paths([ori_dir, bin_dirs[azi]], 64)
        print("azi %+04d fid: %0.2f" % (azi, fid))
        fids.append(fid)
    mean_fid = float(np.mean(fids))
    print("Mean FID over 12 azimuth bins: %0.2f" % mean_fid)
    ResultLog(os.path.join(opt.outf, "result.txt")).write(
        "CUB30 mean FID: %0.2f" % mean_fid)


if __name__ == "__main__":
    main()
