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
    # multi-host: per-process batch slice + disjoint strided data shard
    # (global batch semantics = reference single-host batchSize)
    shard = None
    local_bs = opt.batchSize
    rank = int(getattr(opt, "process_index", 0))
    count = int(getattr(opt, "process_count", 1))
    if count > 1:
        assert opt.batchSize % count == 0, (
            "--batchSize must divide by the process count")
        local_bs = opt.batchSize // count
        shard = (rank, count)
    train_dl = DataLoader(train_dataset, local_bs, shuffle=True,
                          drop_last=True, num_workers=opt.workers,
                          prefetch_factor=opt.prefetch_factor,
                          seed=opt.manualSeed, shard=shard)
    train_noaug_dl = DataLoader(train_noaug_dataset, local_bs,
                                shuffle=True, drop_last=True,
                                num_workers=opt.workers,
                                prefetch_factor=opt.prefetch_factor,
                                seed=opt.manualSeed, shard=shard)
    test_dl = DataLoader(test_dataset, local_bs, shuffle=False,
                         num_workers=opt.workers, prefetch_factor=2,
                         shard=shard)
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
    # multi-host bring-up BEFORE first backend use (dist/mesh.py): after
    # this, jax.devices() spans every host and --multigpus builds the
    # global data-parallel mesh
    from ..dist.mesh import initialize_distributed, multihost_requested

    if multihost_requested():
        opt.process_index, opt.process_count = initialize_distributed()
        print(f"multi-host: process {opt.process_index}/{opt.process_count}")
        opt.multigpus = True
    else:
        opt.process_index, opt.process_count = 0, 1
    save_options(opt)
    return opt


def main(argv=None):
    opt = build_parser().parse_args(argv)
    opt = prepare(opt)
    dls = build_dataloaders(opt)
    trainer(opt, *dls)


if __name__ == "__main__":
    main()
