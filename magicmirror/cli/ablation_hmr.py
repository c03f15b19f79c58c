"""Ablation baseline: score the HMR segmentation masks themselves against the
ground-truth masks (reference ablation-study/test-hmr.py) — the no-learning
baseline the paper compares reconstruction SSIM / mask-IoU against.

    python -m magicmirror.cli.ablation_hmr --dataroot ../Market/hq/seg_hmr \
        --gt_sub gt_mask --imageSize 64
"""
from __future__ import annotations

import os

import numpy as np
import tqdm

import jax.numpy as jnp

from ..configs.flags import build_parser
from ..data.market import MarketDataset
from ..eval.metrics import mask_iou_metric, ssim


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--gt_sub", default="gt_mask",
                        help="sibling dir of ground-truth masks")
    opt = parser.parse_args(argv)

    dataset = MarketDataset(opt.dataroot, opt.imageSize, train=False, aug=False)
    ssims, ious = [], []
    for i in tqdm.tqdm(range(len(dataset))):
        sample = dataset[i]
        rgba = sample["images"]
        hmr_mask = rgba[..., 3]
        gt_path = sample["path"].replace("pytorch", opt.gt_sub)
        if not os.path.isfile(gt_path):
            continue
        from PIL import Image

        gt = np.asarray(Image.open(gt_path).convert("L").resize(
            (hmr_mask.shape[1], hmr_mask.shape[0])), np.float32) / 255.0
        gt = (gt > 0.5).astype(np.float32)
        ious.append(float(mask_iou_metric(jnp.asarray(hmr_mask)[None],
                                          jnp.asarray(gt)[None])))
        comp = rgba[..., :3] * gt[..., None] + (1 - gt[..., None])
        ssims.append(float(ssim(jnp.asarray(rgba[None, ..., :3]),
                                jnp.asarray(comp[None]))))
    print("HMR-mask baseline: SSIM %.3f  mask-IoU %.3f over %d samples"
          % (float(np.mean(ssims) if ssims else 0),
             float(np.mean(ious) if ious else 0), len(ious)))


if __name__ == "__main__":
    main()
