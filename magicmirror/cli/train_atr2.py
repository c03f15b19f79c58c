"""ATR training at free aspect ratio (reference train_ATR2.py /
train_ATR2_fix.py): non-square renders, fg-ratio-filtered test split.

The `_fix` variant's stricter seeding (reference train_ATR2_fix.py's full
set_seed) is the default here — JAX PRNG keys are deterministic by
construction.
"""
from __future__ import annotations

from ..configs.flags import build_parser
from ..data.atr2 import ATR2Dataset
from ..data.loader import DataLoader
from ..train.trainer import trainer
from .train import prepare

ATR2_DEFAULTS = dict(
    name="ATR2_baseline",
    dataroot="../ATR/humanparsing/Seg",
    ratio=2.0,
    imageSize=64,
    ellipsoid=2.0,
    elev_range="-15~15",
    dist_range="2~8",
    threshold="0.09,0.49",
    clean_threshold="0.16,0.36",
)


def main(argv=None):
    opt = build_parser(ATR2_DEFAULTS).parse_args(argv)
    opt = prepare(opt)
    mk = lambda train, aug, thr: ATR2Dataset(
        opt.dataroot, opt.imageSize, ratio=opt.ratio, train=train, aug=aug,
        threshold=thr, bg=opt.bg)
    # note: the reference's noaug loader is aug=True here (train_ATR2.py:158)
    train_dl = DataLoader(mk(True, True, opt.threshold), opt.batchSize,
                          shuffle=True, drop_last=True, num_workers=opt.workers)
    noaug_dl = DataLoader(mk(True, True, opt.clean_threshold), opt.batchSize,
                          shuffle=True, drop_last=True, num_workers=opt.workers)
    test_dl = DataLoader(mk(False, False, opt.threshold), opt.batchSize,
                         shuffle=False, num_workers=opt.workers)
    trainer(opt, train_dl, test_dl, noaug_dl)


if __name__ == "__main__":
    main()
