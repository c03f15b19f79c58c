"""Demo/figure generation (reference show_rainbow2.py): one hand-picked batch →
recon dumps + the 8x8 'rainbow' texture-swap GIF + camera sweep GIFs."""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..configs.flags import build_parser, load_options
from ..eval.gifs import azimuth_sweep, distance_sweep, elevation_sweep, sweep_gif
from ..eval.images import make_grid, save_array_image, save_image_grid, to_uint8
from ..geometry.obj_io import save_mesh
from ..render.renderer import DiffRender, deep_copy
from ..train.trainer import build_models, make_eval_step
from .test import load_eval_state, pick_dataset

# hand-picked hard test indices per dataset (reference show_rainbow2.py:174-233)
HARD_INDICES = {
    "MKT": [2328, 2614, 2661, 2700, 2835, 3012, 3152, 3213],
    "ATR": [91, 181, 271, 361, 451, 541, 631, 721],
    "CUB": [0, 1, 2, 3, 4, 5, 6, 7],
}


def main(argv=None):
    opt = build_parser().parse_args(argv)
    opt.outf = "./log/" + opt.name
    opt = load_options(opt)
    opt.outf = "./log/" + opt.name

    for key in ("MKT", "ATR"):
        if key in opt.name:
            indices = HARD_INDICES[key]
            break
    else:
        indices = HARD_INDICES["CUB"]

    dataset = pick_dataset(opt)
    indices = [i % len(dataset) for i in indices]
    batch = [dataset[i] for i in indices]
    Xa = jnp.asarray(np.stack([b["images"] for b in batch]))

    diffRender = DiffRender(opt.template_path, opt.imageSize, ratio=opt.ratio,
                            init_ellipsoid=opt.ellipsoid)
    netE, netD = build_models(opt, diffRender)
    state = load_eval_state(opt, diffRender, netE, netD)
    eval_step = make_eval_step(netE, diffRender,
                               diffRender.vertices_laplacian_matrix, opt)
    Xer, Xir, *_, Ae = eval_step(state.params_e, state.stats_e, state.template,
                                 Xa, jax.random.PRNGKey(0))
    out = opt.outf
    save_image_grid(np.asarray(Xa[..., :3]), f"{out}/rainbow_Xa.png")
    save_image_grid(np.asarray(Xer[..., :3]), f"{out}/rainbow_Xer.png")
    save_image_grid(np.asarray(Xir[..., :3]), f"{out}/rainbow_Xir.png")
    save_array_image(np.asarray(Ae["textures"][0]), f"{out}/rainbow_texture.png")
    save_mesh(f"{out}/rainbow_mesh.obj", np.asarray(Ae["vertices"][0]),
              np.asarray(diffRender.faces), diffRender.uvs)

    att = deep_copy(Ae, detach=True)
    B = np.asarray(att["azimuths"]).shape[0]

    def render_host(**a):
        rgba, aa = diffRender.render(**{
            k: (jnp.asarray(v) if v is not None else None) for k, v in a.items()})
        return np.asarray(rgba), aa

    # rainbow grid: every row one person's shape, texture i broadcast to all
    # (reference show_rainbow2.py:376-399)
    import imageio

    writer = imageio.get_writer(f"{out}/rainbow.gif", mode="I")
    for azi in range(0, 360, 10):
        rows = []
        for i in range(B):
            a2 = dict(att)
            a2["textures"] = jnp.broadcast_to(att["textures"][i][None],
                                              att["textures"].shape)
            a2["azimuths"] = np.full((B,), -float(azi), np.float32)
            rgba, _ = render_host(**a2)
            rows.append(np.concatenate(list(rgba[..., :3]), axis=1))
        writer.append_data(to_uint8(np.concatenate(rows, axis=0)))
    writer.close()

    azimuth_sweep(render_host, att, f"{out}/rainbow_rotation.gif",
                  azi_scope=opt.azi_scope)
    elevation_sweep(render_host, att, f"{out}/rainbow_elevation.gif",
                    elev_range=opt.elev_range)
    distance_sweep(render_host, att, f"{out}/rainbow_distance.gif",
                   dist_range=opt.dist_range)
    # xy-bias sweep (reference show_rainbow2.py:460-485)
    values = [v / 10.0 for v in range(-3, 4)]
    att_b = dict(att)
    frames = []
    for v in values:
        att_b["biases"] = np.full((B, 2), v, np.float32)
        rgba, _ = render_host(**att_b)
        frames.append(to_uint8(make_grid(np.asarray(rgba[..., :3]))))
    writer = imageio.get_writer(f"{out}/rainbow_bias.gif", mode="I")
    for f in frames:
        writer.append_data(f)
    writer.close()
    print("rainbow artifacts written to", out)


if __name__ == "__main__":
    main()
