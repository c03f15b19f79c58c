"""Single-image inference demo (reference {CUB,MKT,ATR,THU}_single_img.py):
load ONE image+mask, preprocess inline, encode → render recon + rotations +
normal map, save a concat panel + a 360° rotation GIF; optional mask
corruption robustness modes (reference CUB_single_img.py:292-302).

    python single_img.py --name <model> --img path.jpg --mask path.png \
        [--corrupt none|salt|blur]
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageFilter

import jax
import jax.numpy as jnp

from ..configs.flags import build_parser, load_options
from ..data.base import pad_to_square, to_rgba_array
from ..eval.images import save_array_image, to_uint8
from ..render.renderer import DiffRender, deep_copy
from ..train.trainer import build_models
from .test import load_eval_state


def preprocess(img_path, mask_path, image_size, ratio, corrupt="none",
               square=True):
    img = Image.open(img_path).convert("RGB")
    seg = Image.open(mask_path).convert("L").point(lambda p: 255 if p > 160 else 0)
    if corrupt == "salt":
        arr = np.asarray(seg, np.uint8).copy()
        noise = np.random.RandomState(0).rand(*arr.shape) < 0.05
        arr[noise] = 255 - arr[noise]
        seg = Image.fromarray(arr)
    elif corrupt == "blur":
        seg = seg.filter(ImageFilter.GaussianBlur(4))
    if square:
        img, seg = pad_to_square(img, seg)
    W = image_size
    H = round(ratio * image_size)
    img = img.resize((W, H))
    seg = seg.resize((W, H), Image.NEAREST).point(lambda p: 255 if p > 160 else 0)
    return to_rgba_array(img, seg, bg=False)


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--img", required=True)
    parser.add_argument("--mask", required=True)
    parser.add_argument("--corrupt", default="none",
                        choices=["none", "salt", "blur"])
    opt = parser.parse_args(argv)
    opt.outf = "./log/" + opt.name
    opt = load_options(opt, skip=("name", "outf", "dataroot", "batchSize",
                                  "workers", "resume", "img", "mask", "corrupt"))
    opt.outf = "./log/" + opt.name

    square = "MKT" not in opt.name and "ATR2" not in opt.name and "THU" not in opt.name
    rgba = preprocess(opt.img, opt.mask, opt.imageSize, opt.ratio,
                      corrupt=opt.corrupt, square=square)
    Xa = jnp.asarray(rgba[None])

    diffRender = DiffRender(opt.template_path, opt.imageSize, ratio=opt.ratio,
                            init_ellipsoid=opt.ellipsoid)
    netE, netD = build_models(opt, diffRender)
    state = load_eval_state(opt, diffRender, netE, netD)
    lpl = diffRender.vertices_laplacian_matrix

    att = netE.apply({"params": state.params_e, "batch_stats": state.stats_e},
                     Xa, state.template, lpl, train_shape=0, train=False)
    panels = [np.asarray(Xa[0, :, :, :3])]
    Xer, Ae = diffRender.render(**att)
    panels.append(np.asarray(Xer[0, :, :, :3]))
    for delta in (45, 90, 135):
        a2 = deep_copy(Ae, detach=True)
        a2["azimuths"] = Ae["azimuths"] + float(delta)
        r, _ = diffRender.render(**a2)
        panels.append(np.asarray(r[0, :, :, :3]))
    # per-pixel normal map (reference CUB_single_img.py:330-332)
    normal = np.asarray(Ae["imnormal"][0]) * 0.5 + 0.5
    panels.append(normal)

    stem = os.path.splitext(os.path.basename(opt.img))[0]
    save_array_image(np.concatenate(panels, axis=1),
                     os.path.join(opt.outf, f"{stem}_panel.png"))

    import imageio

    writer = imageio.get_writer(os.path.join(opt.outf, f"{stem}_rotation.gif"),
                                mode="I")
    a2 = deep_copy(Ae, detach=True)
    for azi in range(0, 360, 10):
        a2["azimuths"] = jnp.asarray([-float(azi)])
        r, aa = diffRender.render(**a2)
        strip = np.concatenate([np.asarray(r[0, :, :, :3]),
                                np.asarray(aa["imnormal"][0]) * 0.5 + 0.5], axis=1)
        writer.append_data(to_uint8(strip))
    writer.close()
    print("wrote", os.path.join(opt.outf, f"{stem}_panel.png"))


if __name__ == "__main__":
    main()
