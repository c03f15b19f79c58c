"""Dataset + loader tests on synthetic on-disk fixtures."""
import os

import numpy as np
import pytest
from PIL import Image

from magicmirror.data.cub import CUBDataset
from magicmirror.data.loader import DataLoader
from magicmirror.data.prepare import fg_ratio, fill_holes


@pytest.fixture
def cub_tree(tmp_path):
    """Fake CUB tree: train/classA/img.jpg + img_0.30.png masks."""
    rs = np.random.RandomState(0)
    for split in ("train", "test"):
        d = tmp_path / split / "classA"
        d.mkdir(parents=True)
        for i in range(4):
            img = (rs.rand(40, 50, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"bird{i}.jpg")
            mask = np.zeros((40, 50), np.uint8)
            mask[10:30, 15:35] = 255
            ratio = mask.mean() / 255.0
            Image.fromarray(mask).save(d / ("bird%d_%.2f.png" % (i, ratio)))
    return str(tmp_path)


def test_cub_dataset_loading(cub_tree):
    ds = CUBDataset(cub_tree, 32, train=True, aug=False, threshold="0.1,0.9")
    assert len(ds) == 8  # 2x images (reference bird.py:139)
    sample = ds[0]
    img = sample["images"]
    assert img.shape == (32, 32, 4)
    assert img.dtype == np.float32
    mask = img[..., 3]
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    # white composite outside the mask
    outside = img[..., :3][mask == 0]
    np.testing.assert_allclose(outside, 1.0, atol=1e-6)


def test_cub_threshold_filters(cub_tree):
    ds = CUBDataset(cub_tree, 32, train=True, aug=False, threshold="0.5,0.9")
    assert len(ds.im_list) == 0  # fg ratio 0.20 excluded


def test_cub_aug_shapes(cub_tree):
    ds = CUBDataset(cub_tree, 32, train=True, aug=True, threshold="0.1,0.9")
    for i in range(4):
        assert ds[i]["images"].shape == (32, 32, 4)


def test_dataloader_order_and_drop_last(cub_tree):
    ds = CUBDataset(cub_tree, 16, train=True, aug=False, threshold="0.1,0.9")
    dl = DataLoader(ds, batch_size=3, shuffle=False, drop_last=True,
                    num_workers=2)
    batches = list(dl)
    assert len(batches) == len(ds) // 3
    assert batches[0]["images"].shape == (3, 16, 16, 4)
    # deterministic order when shuffle=False
    batches2 = list(dl)
    np.testing.assert_allclose(batches[0]["images"], batches2[0]["images"])


def test_dataloader_shuffle_reproducible(cub_tree):
    ds = CUBDataset(cub_tree, 16, train=True, aug=False, threshold="0.1,0.9")
    dl1 = DataLoader(ds, batch_size=4, shuffle=True, seed=1, num_workers=2)
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, seed=1, num_workers=2)
    b1 = next(iter(dl1))
    b2 = next(iter(dl2))
    assert b1["path"] == b2["path"]


def test_fg_ratio_and_fill_holes():
    m = np.zeros((20, 20))
    m[5:15, 5:15] = 1
    assert fg_ratio(m) == pytest.approx(0.25)
    holey = m.copy()
    holey[9:11, 9:11] = 0
    filled = fill_holes(holey)
    assert filled[10, 10] == 1.0
    assert filled[0, 0] == 0.0


def test_opts_yaml_roundtrip(tmp_path):
    from magicmirror.configs.flags import build_parser, load_options, save_options

    opt = build_parser().parse_args(["--name", "t", "--lr", "0.005"])
    path = str(tmp_path / "opts.yaml")
    save_options(opt, path)
    opt2 = build_parser().parse_args(["--name", "t"])
    assert opt2.lr == 0.0001
    opt2 = load_options(opt2, path)
    assert opt2.lr == 0.005


def test_flag_surface_complete():
    """Every reference flag must exist with a matching default where the
    recipes rely on it (reference train.py:39-128)."""
    opt = build_defaults()
    for flag, default in [
        ("gan_type", "wgan"), ("template_path", "./template/sphere.obj"),
        ("batchSize", 32), ("imageSize", 128), ("niter", 600), ("lr", 0.0001),
        ("warm_epoch", 40), ("lambda_gan", 0.0001), ("lambda_reg", 0.1),
        ("lambda_ic", 1), ("azi_scope", 360), ("elev_range", "0~30"),
        ("dist_range", "2~7"), ("em", 1.0), ("em_step", 0.1),
        ("pretrains", "hr18sv2"), ("pretraint", "res34"),
    ]:
        assert getattr(opt, flag) == default, flag


def build_defaults():
    from magicmirror.configs.flags import build_parser

    return build_parser().parse_args([])
