"""Market++ augmented re-ID dataset synthesis (reference
tool/generate_market.py, generate_market++.py): batch-render the trained
model at azimuth offsets {-60,-30,30,60} with jittered distance/elevation and
composite each render onto the Gaussian-blurred original background, writing
an augmented dataset tree mirroring the re-ID layout
(``<out>/hq/pytorch/<id>/<name>_az<delta>.jpg``).

    python generate_market.py --name <model> --out ../Magic_Market [--texture_swap]
    [--poisson]  # Poisson-blend composites (reference tool/generate_market_test.py:44)
"""
from __future__ import annotations

import os
import random

import numpy as np
import tqdm
from PIL import Image, ImageFilter

import jax
import jax.numpy as jnp

from ..configs.flags import build_parser, load_options
from ..data.loader import DataLoader
from ..data.market import MarketDataset
from ..eval.images import save_array_image
from ..render.renderer import DiffRender, deep_copy
from ..train.trainer import build_models
from .test import load_eval_state

AZIMUTH_DELTAS = (-60, -30, 30, 60)


def composite_on_blur(render_rgba: np.ndarray, original: np.ndarray) -> np.ndarray:
    """Paste the render onto the Gaussian-blurred original image
    (reference tool/generate_market.py:294-311)."""
    bg = Image.fromarray((original * 255).astype(np.uint8))
    bg = bg.filter(ImageFilter.GaussianBlur(4))
    bg = np.asarray(bg, np.float32) / 255.0
    rgb = render_rgba[..., :3]
    mask = render_rgba[..., 3:4]
    return rgb * mask + bg * (1 - mask)


def new_class9(opt, loader, diffRender, encode, render):
    """Two-pass 'new class' synthesis (reference
    generate_market_new_class9.py:268-362): pass 1 averages each person-id's
    predicted texture over the train set; pass 2 re-renders every image at
    azimuth deltas {-45, 0, 45} x 3 repeats with the texture blended 50/50
    with a RANDOM person's mean texture, composited over a Gaussian-blurred
    random in-batch background, written into pair-id class folders
    (old_id+new_id sorted numerically; same-id pairs skipped)."""
    mean_tex: dict[str, list] = {}
    for data in tqdm.tqdm(loader, desc="pass1: mean textures"):
        Xa = jnp.asarray(data["images"])
        att = deep_copy(encode(Xa), detach=True)
        tex = np.asarray(att["textures"])
        for b in range(Xa.shape[0]):
            pid = os.path.basename(data["path"][b]).split("_")[0]
            mean_tex.setdefault(pid, []).append(tex[b])
    names = sorted(mean_tex)
    mean_arr = np.stack([np.mean(mean_tex[p], axis=0) for p in names])

    rng = np.random.RandomState(opt.manualSeed)
    for data in tqdm.tqdm(loader, desc="pass2: render"):
        Xa = jnp.asarray(data["images"])
        att = deep_copy(encode(Xa), detach=True)
        B = Xa.shape[0]
        bg_np = np.asarray(Xa[..., :3])
        for _ in range(3):
            rand_ids = rng.randint(0, len(names), B)
            for delta in (-45, 0, 45):
                jit = dict(att)
                jit["azimuths"] = att["azimuths"] - float(delta)
                jit["distances"] = att["distances"] - 0.5 * jnp.asarray(
                    rng.randn(B), jnp.float32)
                jit["elevations"] = att["elevations"] - 0.1 * jnp.asarray(
                    rng.randn(B), jnp.float32)
                jit["textures"] = 0.5 * att["textures"] + 0.5 * jnp.asarray(
                    mean_arr[rand_ids])
                rgba = np.asarray(render(**jit))
                for b in range(B):
                    old_id = os.path.basename(data["path"][b]).split("_")[0]
                    new_id = names[rand_ids[b]]
                    try:
                        same = int(old_id) == int(new_id)
                        lower = int(old_id) < int(new_id)
                    except ValueError:
                        same, lower = old_id == new_id, old_id < new_id
                    if same:
                        continue
                    dir_id = old_id + new_id if lower else new_id + old_id
                    mask = Image.fromarray(
                        (rgba[b, :, :, 3] * 255).astype(np.uint8))
                    mask = np.asarray(mask.filter(
                        ImageFilter.GaussianBlur(3)), np.float32) / 255.0
                    bg = Image.fromarray(
                        (bg_np[rng.randint(0, B)] * 255).astype(np.uint8))
                    bg = np.asarray(bg.filter(ImageFilter.GaussianBlur(3)),
                                    np.float32) / 255.0
                    img = (rgba[b, :, :, :3] * mask[..., None]
                           + bg * (1 - mask[..., None]))
                    base = os.path.splitext(
                        os.path.basename(data["path"][b]))[0]
                    out_dir = os.path.join(opt.out, "hq", "pytorch", dir_id)
                    os.makedirs(out_dir, exist_ok=True)
                    save_array_image(
                        img, os.path.join(out_dir,
                                          f"{base[:-4]}{delta:03d}.jpg"))
    print("new-class9 dataset written under", opt.out)


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--out", default="../Magic_Market")
    parser.add_argument("--texture_swap", action="store_true", default=False,
                        help="swap textures across a shuffled pairing "
                             "(generate_market++ mode)")
    parser.add_argument("--poisson", action="store_true", default=False)
    parser.add_argument("--new_class9", action="store_true", default=False,
                        help="pair-id mean-texture synthesis "
                             "(generate_market_new_class9 mode)")
    opt = parser.parse_args(argv)
    opt.outf = "./log/" + opt.name
    opt = load_options(opt, skip=("name", "outf", "dataroot", "batchSize",
                                  "workers", "resume", "out", "texture_swap",
                                  "poisson", "new_class9"))
    opt.outf = "./log/" + opt.name

    dataset = MarketDataset(opt.dataroot, opt.imageSize, train=True, aug=False,
                            threshold=opt.threshold, bg=opt.bg)
    loader = DataLoader(dataset, opt.batchSize, shuffle=False,
                        num_workers=opt.workers)
    diffRender = DiffRender(opt.template_path, opt.imageSize, ratio=opt.ratio,
                            init_ellipsoid=opt.ellipsoid)
    netE, netD = build_models(opt, diffRender)
    state = load_eval_state(opt, diffRender, netE, netD)
    lpl = diffRender.vertices_laplacian_matrix

    @jax.jit
    def encode(Xa):
        return netE.apply(
            {"params": state.params_e, "batch_stats": state.stats_e},
            Xa, state.template, lpl, train_shape=0, train=False)

    render = jax.jit(lambda **att: diffRender.render(**att)[0])

    if opt.new_class9:
        opt.out = getattr(opt, "out", None) or "../Magic_Market9"
        new_class9(opt, loader, diffRender, encode, render)
        return

    rng = random.Random(0)
    for data in tqdm.tqdm(loader):
        Xa = jnp.asarray(data["images"])
        att = encode(Xa)
        att = deep_copy(att, detach=True)
        B = Xa.shape[0]
        if opt.texture_swap:
            perm = np.random.RandomState(0).permutation(B)
            att["textures"] = att["textures"][perm]
        for delta in AZIMUTH_DELTAS:
            jitter = dict(att)
            jitter["azimuths"] = att["azimuths"] + float(delta)
            jitter["distances"] = att["distances"] * np.float32(
                rng.uniform(0.95, 1.05))
            jitter["elevations"] = att["elevations"] + np.float32(
                rng.uniform(-3, 3))
            rgba = np.asarray(render(**jitter))
            for b in range(B):
                path = data["path"][b]
                pid = os.path.basename(os.path.dirname(path))
                name = os.path.splitext(os.path.basename(path))[0]
                out_dir = os.path.join(opt.out, "hq", "pytorch", pid)
                os.makedirs(out_dir, exist_ok=True)
                if opt.poisson:
                    from ..eval.poisson import poisson_edit

                    src = (rgba[b, :, :, :3] * 255).astype(np.uint8)
                    tgt = (np.asarray(Xa[b, :, :, :3]) * 255).astype(np.uint8)
                    m = (rgba[b, :, :, 3] * 255).astype(np.uint8)
                    img = poisson_edit(src, tgt, m).astype(np.float32) / 255.0
                else:
                    img = composite_on_blur(rgba[b], np.asarray(Xa[b, :, :, :3]))
                save_array_image(
                    img, os.path.join(out_dir, f"{name}_az{delta}.jpg"))
    print("augmented dataset written under", opt.out)


if __name__ == "__main__":
    main()
