"""THuman2 rendered-scan dataset (reference datasets/thuman2.py:32-151).

Layout: ``<root>/<scan>/depth_F/*.png`` (alpha channel = mask), RGB under
``render/``, GT normals under ``normal_F/``; center crop columns 64..192
(reference thuman2.py:97-99).
"""
from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from .base import ImageDataset, load_rgb, to_rgba_array


class THuman2Dataset(ImageDataset):
    def __init__(self, root, image_size, train=True, aug=False, bg=False,
                 ratio=2.0, selected_index=()):
        self.root = root
        self.bg = bg
        self.image_size = image_size
        self.ratio = ratio
        self.im_list = sorted(glob.glob(os.path.join(root, "*", "depth_F", "*.png")))
        print("THuman2 images:", len(self.im_list))
        self.train = train
        self.aug = aug
        self.selected_index = list(selected_index)

    def __len__(self):
        return len(self.im_list)

    def __getitem__(self, index):
        if self.selected_index:
            index = self.selected_index[index]
        depth_path = self.im_list[index]
        img_path = depth_path.replace("depth_F", "render")
        normal_path = depth_path.replace("depth_F", "normal_F")

        depth = Image.open(depth_path)
        # the alpha channel of the depth render is the foreground mask
        mask = depth.split()[-1]
        img = load_rgb(img_path)

        # center crop columns 64..192 (square 512-render → person band)
        box = (64, 0, 192, img.size[1]) if img.size[0] >= 192 else None
        W = self.image_size
        H = round(self.ratio * W)
        if box is not None:
            img = img.crop(box)
            mask = mask.crop(box)
        img = img.resize((W, H))
        mask = mask.resize((W, H), Image.NEAREST)
        mask = mask.point(lambda p: 255 if p > 0 else 0)
        rgba = to_rgba_array(img, mask, self.bg)

        out = {"images": rgba, "path": img_path, "label": 0}
        if os.path.isfile(normal_path):
            normal = load_rgb(normal_path)
            if box is not None:
                normal = normal.crop(box)
            normal = normal.resize((W, H))
            out["normal"] = np.asarray(normal, np.float32) / 255.0
        return out
