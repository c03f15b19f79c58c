"""CUB training entry point (reference train.py).

    python train.py --name cub_baseline --dataroot ./data/CUB_Data [flags]
"""
from __future__ import annotations

import multiprocessing
import random

import numpy as np

from ..configs.flags import build_parser, finalize_options, save_options
from ..data.cub import CUBDataset
from ..data.loader import DataLoader
from ..train.trainer import trainer


def build_dataloaders(opt, dataset_cls=CUBDataset, **ds_kwargs):
    """Three loaders: aug-train / clean-noaug-train / test
    (reference train.py:156-169)."""
    train_dataset = dataset_cls(opt.dataroot, opt.imageSize, train=True,
                                aug=True, threshold=opt.threshold, bg=opt.bg,
                                **ds_kwargs)
    train_noaug_dataset = dataset_cls(opt.dataroot, opt.imageSize, train=True,
                                      aug=False, threshold=opt.clean_threshold,
                                      bg=opt.bg, **ds_kwargs)
    test_dataset = dataset_cls(opt.dataroot, opt.imageSize, train=False,
                               aug=False, bg=opt.bg, **ds_kwargs)
    train_dl = DataLoader(train_dataset, opt.batchSize, shuffle=True,
                          drop_last=True, num_workers=opt.workers,
                          prefetch_factor=opt.prefetch_factor)
    train_noaug_dl = DataLoader(train_noaug_dataset, opt.batchSize,
                                shuffle=True, drop_last=True,
                                num_workers=opt.workers,
                                prefetch_factor=opt.prefetch_factor)
    test_dl = DataLoader(test_dataset, opt.batchSize, shuffle=False,
                         num_workers=opt.workers, prefetch_factor=2)
    return train_dl, test_dl, train_noaug_dl


def prepare(opt):
    opt = finalize_options(opt)
    print(opt)
    if opt.manualSeed is None:
        opt.manualSeed = random.randint(1, 10000)
    print("Random Seed:", opt.manualSeed)
    random.seed(opt.manualSeed)
    np.random.seed(opt.manualSeed)
    if multiprocessing.cpu_count() >= 32:
        opt.workers = 8
        opt.prefetch_factor = 4
    save_options(opt)
    return opt


def main(argv=None):
    opt = build_parser().parse_args(argv)
    opt = prepare(opt)
    dls = build_dataloaders(opt)
    trainer(opt, *dls)


if __name__ == "__main__":
    main()
