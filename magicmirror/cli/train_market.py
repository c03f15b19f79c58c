"""Market-HQ training entry point (reference train_market.py): ratio-2
renders, HMR seg masks, optional chamfer body-mesh prior."""
from __future__ import annotations

from ..configs.flags import build_parser
from ..data.market import MarketDataset
from ..train.trainer import trainer
from .train import build_dataloaders, prepare

MARKET_DEFAULTS = dict(
    name="baseline-MKT",
    dataroot="../Market/hq/seg_hmr",
    ratio=2.0,
    ellipsoid=2.0,
    em=0.0,
    clean_threshold="0.3,0.64",
    threshold="0.09,0.64",
    bias_range=0.5,
    elev_range="-15~15",
    dist_range="2~6",
)


def main(argv=None):
    opt = build_parser(MARKET_DEFAULTS).parse_args(argv)
    opt = prepare(opt)
    dls = build_dataloaders(opt, dataset_cls=MarketDataset, hmr=opt.hmr)
    trainer(opt, *dls)


if __name__ == "__main__":
    main()
