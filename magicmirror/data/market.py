"""Market-1501 re-ID dataset with HMR seg masks (reference datasets/market.py).

Layout: ``<root>/{train_all,query}/<id>/*.png`` masks under ``seg_hmr`` with
the RGB under the sibling ``pytorch`` tree; optional HMR body-mesh OBJs under
``bodymesh`` for the chamfer prior (reference market.py:91-97).
Target shape is (W, 2W) — ratio 2, no pad-to-square.
"""
from __future__ import annotations

import glob
import os
import random

import numpy as np
from PIL import Image, ImageOps

from ..geometry.obj_io import load_obj
from .base import ImageDataset, filter_by_fg_ratio, load_rgb, to_rgba_array


def _seg_loader(path):
    with open(path, "rb") as f:
        seg = Image.open(f).convert("L")
        return seg.point(lambda p: 255 if p > 0 else 0)


class MarketDataset(ImageDataset):
    def __init__(self, root, image_size, train=True, aug=False,
                 threshold="0.09,0.64", bg=False, hmr=0.0, selected_index=(),
                 sub=""):
        self.root = root
        self.bg = bg
        self.hmr = hmr
        if sub:
            old_im_list = sorted(glob.glob(os.path.join(root, sub, "*/*.png")))
            self.class_dir = glob.glob(os.path.join(root, sub, "*"))
        elif train:
            old_im_list = glob.glob(os.path.join(root, "train_all", "*/*.png"))
            self.class_dir = glob.glob(os.path.join(root, "train_all", "*"))
        else:
            old_im_list = sorted(glob.glob(os.path.join(root, "query", "*/*.png")))
            self.class_dir = glob.glob(os.path.join(root, "query", "*"))
        self.im_list = filter_by_fg_ratio(old_im_list, threshold)
        if not train:
            self.im_list = old_im_list
        print(len(old_im_list), "After threshold:", len(self.im_list))
        self.imgs = [(p, self.class_dir.index(os.path.dirname(p)))
                     for p in self.im_list]
        self.train = train
        self.aug = aug
        self.image_size = image_size
        self.selected_index = list(selected_index)

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, index):
        if self.selected_index:
            index = self.selected_index[index]
        seg_path, label = self.imgs[index]
        W = self.image_size
        img_path = seg_path.replace("seg_hmr", "pytorch")
        img_path = img_path[:-9] + ".png"
        img = load_rgb(img_path)
        seg = _seg_loader(seg_path)
        if self.hmr > 0.0:
            obj_path = seg_path.replace("seg_hmr", "bodymesh")[:-9] + ".obj"
            obj = load_obj(obj_path).vertices  # (6890, 3)
        else:
            obj = np.float32(-1)

        if self.train and self.aug:
            img = img.resize((W, W * 2))
            seg = seg.resize((W, W * 2), Image.NEAREST)
            seg = seg.point(lambda p: 255 if p > 160 else 0)
            img = ImageOps.expand(img, 10)
            seg = ImageOps.expand(seg, 10)
            left = random.randint(0, 20)
            upper = random.randint(0, 20)
            img = img.crop((left, upper, left + W, upper + W * 2))
            seg = seg.crop((left, upper, left + W, upper + W * 2))
            if random.uniform(0, 1) < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
                seg = seg.transpose(Image.FLIP_LEFT_RIGHT)
                if self.hmr > 0.0:
                    obj = obj * np.float32([-1, 1, 1])

        img = img.resize((W, W * 2))
        seg = seg.resize((W, W * 2), Image.NEAREST)
        seg = seg.point(lambda p: 255 if p > 160 else 0)
        rgba = to_rgba_array(img, seg, self.bg)
        return {"images": rgba, "path": img_path, "label": label, "obj": obj}
