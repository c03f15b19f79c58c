"""ATR human training, 1:1 aspect (reference train_ATR.py)."""
from __future__ import annotations

from ..configs.flags import build_parser
from ..data.atr import ATRDataset
from ..train.trainer import trainer
from .train import build_dataloaders, prepare

ATR_DEFAULTS = dict(
    name="ATR_baseline",
    dataroot="../ATR/humanparsing/Seg",
    ellipsoid=2.0,
    elev_range="-15~15",
    dist_range="2~6",
)


def main(argv=None):
    opt = build_parser(ATR_DEFAULTS).parse_args(argv)
    opt = prepare(opt)
    dls = build_dataloaders(opt, dataset_cls=ATRDataset)
    trainer(opt, *dls)


if __name__ == "__main__":
    main()
