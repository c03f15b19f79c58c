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
from ..eval.pck import pck_aggregate, pck_errors, transfer_via_camera
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
    all_errs, all_vis = [], []
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
        ka = kps[stem_a]
        kb = kps[stem_b]
        vis = (ka[:, 2] > 0) & (kb[:, 2] > 0)
        if vis.sum() == 0:
            continue

        # annotation pixels -> [-1,1] over the visible-kp bbox, y FLIPPED
        # into the model NDC frame (+y up) so nearest-vertex matching and
        # the returned predictions live in one frame
        def norm(k):
            xy = k[:, :2].copy()
            span = xy[vis].max(0) - xy[vis].min(0) + 1e-6
            center = (xy[vis].max(0) + xy[vis].min(0)) / 2
            out = (xy - center) / (span / 2 + 1e-6)
            out[:, 1] = -out[:, 1]
            return out

        mask_tgt = np.asarray(b["images"])[..., 3]
        pred = transfer_via_camera(norm(ka), verts, cam_a, cam_b, cam_proj,
                                   mask_tgt=mask_tgt)
        all_errs.append(pck_errors(pred, norm(kb)))
        all_vis.append(vis.astype(np.float64))

    result = ResultLog(os.path.join(opt.outf, "result.txt"))
    # reference aggregation: per-keypoint accuracy over all pairs, then the
    # keypoint mean (reference PCK/test_kp.py:313-323)
    scores = pck_aggregate(np.stack(all_errs), np.stack(all_vis)) \
        if all_errs else {0.1: float("nan"), 0.15: float("nan")}
    for alpha, v in scores.items():
        print(f"PCK@{alpha}: {v:.4f} over {len(all_errs)} pairs")
        result.write(f"PCK@{alpha}: {v:.4f}")


if __name__ == "__main__":
    main()
