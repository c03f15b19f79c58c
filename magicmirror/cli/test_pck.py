"""Keypoint-transfer PCK evaluation CLI (the runnable version of the
reference's vendored PCK/ harness; see magicmirror/eval/pck.py).

Requires the raw CUB_200_2011 keypoint annotations (parts/part_locs.txt);
pairs consecutive test images and transfers keypoints source→target via the
camera+mean-shape strategy (reference PCK/test_kp.py:159-192).

    python -m magicmirror.cli.test_pck --name <model> \
        --cub_root ./data/CUB_200_2011
"""
from __future__ import annotations

import math
import os

import numpy as np
import tqdm

import jax
import jax.numpy as jnp

from ..configs.flags import build_parser, load_options
from ..data.cub import CUBDataset
from ..eval.pck import pck, transfer_via_camera
from ..eval.reports import ResultLog
from ..geometry.camera import perspective_projection
from ..render.renderer import DiffRender
from ..train.trainer import build_models
from .test import load_eval_state


def load_cub_keypoints(cub_root):
    """parts/part_locs.txt: <img_id> <part_id> <x> <y> <visible>."""
    kp = np.loadtxt(os.path.join(cub_root, "parts", "part_locs.txt"))
    kp = kp[:, 2:5].reshape(-1, 15, 3)
    paths = np.loadtxt(os.path.join(cub_root, "images.txt"), dtype=str)[:, 1]
    return {os.path.basename(p).replace(".jpg", ""): k
            for p, k in zip(paths, kp)}


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--cub_root", default="./data/CUB_200_2011")
    parser.add_argument("--max_pairs", type=int, default=500)
    opt = parser.parse_args(argv)
    opt.outf = "./log/" + opt.name
    opt = load_options(opt, skip=("name", "outf", "dataroot", "batchSize",
                                  "workers", "resume", "cub_root", "max_pairs"))
    opt.outf = "./log/" + opt.name

    kps = load_cub_keypoints(opt.cub_root)
    dataset = CUBDataset(opt.dataroot, opt.imageSize, train=False, aug=False)
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

    cam_proj = diffRender.cam_proj
    scores = {0.1: [], 0.15: []}
    n = min(len(dataset) // 2, opt.max_pairs) * 2
    for i in tqdm.tqdm(range(0, n, 2)):
        a, b = dataset[i], dataset[i + 1]
        stem_a = os.path.splitext(os.path.basename(a["path"]))[0]
        stem_b = os.path.splitext(os.path.basename(b["path"]))[0]
        if stem_a not in kps or stem_b not in kps:
            continue
        Xa = jnp.asarray(np.stack([a["images"], b["images"]]))
        att = encode(Xa)
        verts = np.asarray(att["vertices"]).mean(axis=0)  # shared mean shape
        cam_a = tuple(np.asarray(att[k])[0:1] for k in
                      ("azimuths", "elevations", "distances", "biases"))
        cam_b = tuple(np.asarray(att[k])[1:2] for k in
                      ("azimuths", "elevations", "distances", "biases"))
        # GT keypoints are in raw-image pixels; the dataset pads to square and
        # resizes — approximate by normalizing against the raw size is not
        # recoverable here, so evaluate in the model's input frame: scale raw
        # kp coords by the stored visible flag only.
        ka = kps[stem_a]
        kb = kps[stem_b]
        vis = (ka[:, 2] > 0) & (kb[:, 2] > 0)
        # normalize to [-1,1] against the raw annotation frame extent
        def norm(k):
            xy = k[:, :2].copy()
            span = xy[vis].max(0) - xy[vis].min(0) + 1e-6
            center = (xy[vis].max(0) + xy[vis].min(0)) / 2
            return (xy - center) / (span / 2 + 1e-6)

        pred = transfer_via_camera(norm(ka), verts, cam_a, cam_b, cam_proj)
        s = pck(pred, norm(kb), vis, (opt.imageSize, opt.imageSize))
        for alpha in scores:
            scores[alpha].append(s[alpha])

    result = ResultLog(os.path.join(opt.outf, "result.txt"))
    for alpha, vals in scores.items():
        v = float(np.mean(vals)) if vals else float("nan")
        print(f"PCK@{alpha}: {v:.4f} over {len(vals)} pairs")
        result.write(f"PCK@{alpha}: {v:.4f}")


if __name__ == "__main__":
    main()
