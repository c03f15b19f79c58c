"""ATR dataset, non-square ratio variant (reference datasets/atr2.py:29-140).

Same split lists as ATR, but targets (W, ratio*W) WITHOUT pad-to-square
(reference atr2.py:81, 116-118); the test split is also fg-ratio filtered
(reference atr2.py:46-55).
"""
from __future__ import annotations

import os
import random

from PIL import Image, ImageOps

from .atr import read_split
from .base import ImageDataset, filter_by_fg_ratio, load_rgb, load_seg, to_rgba_array


class ATR2Dataset(ImageDataset):
    def __init__(self, root, image_size, ratio=1.6666666, train=True, aug=False,
                 threshold="0.09,0.64", bg=False, selected_index=()):
        self.root = root
        self.bg = bg
        self.ratio = ratio
        rel = read_split(root, train)
        old_im_list = [p if os.path.isabs(p) else os.path.join(root, p)
                       for p in rel]
        # unlike CUB/ATR, the test split keeps the fg-ratio filter
        self.im_list = filter_by_fg_ratio(old_im_list, threshold)
        print(len(old_im_list), "After threshold:", len(self.im_list))
        self.imgs = [(p, -1) for p in self.im_list]  # no class label
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
        img_path = seg_path.replace("Seg", "JPEGImages")[:-9] + ".jpg"
        img = load_rgb(img_path)
        seg = load_seg(seg_path)
        W = self.image_size
        H = round(self.ratio * W)
        if self.train and self.aug:
            # hflip + pad-10 + 95-99% crop, NO pad-to-square (reference
            # atr2.py:88-118)
            from .base import cub_style_aug

            img, seg = cub_style_aug(img, seg)
        img = img.resize((W, H))
        seg = seg.resize((W, H), Image.NEAREST)
        seg = seg.point(lambda p: 255 if p > 160 else 0)
        rgba = to_rgba_array(img, seg, self.bg)
        return {"images": rgba, "path": img_path, "label": label}
