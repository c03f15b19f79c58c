"""Template-evolution animation (reference template-change-animation.py):
render the per-epoch ``epoch_*_template.obj`` sequence with OUR rasterizer in
hard mode (removes the pytorch3d dependency, SURVEY.md §2 row
'Template-evolution animation') and write a GIF + composite strip PNG.

    python template_animation.py --name <model> [--step 10]
"""
from __future__ import annotations

import glob
import os
import re

import imageio
import numpy as np

import jax.numpy as jnp

from ..configs.flags import build_parser, load_options
from ..eval.images import to_uint8
from ..geometry.obj_io import load_obj
from ..render.renderer import DiffRender


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--step", type=int, default=1)
    opt = parser.parse_args(argv)
    opt.outf = "./log/" + opt.name
    try:
        opt = load_options(opt, skip=("name", "outf", "step"))
    except FileNotFoundError:
        pass
    opt.outf = "./log/" + opt.name

    objs = sorted(glob.glob(os.path.join(opt.outf, "epoch_*_template.obj")))
    if not objs:
        raise FileNotFoundError("no epoch_*_template.obj under " + opt.outf)

    # hard-mode renderer: huge sigmainv → binary silhouette
    diffRender = DiffRender(objs[0], opt.imageSize, ratio=opt.ratio,
                            init_ellipsoid=-1, sigmainv=1e6)
    V = diffRender.num_vertices
    gray = jnp.full((1, 2 * round(opt.ratio * opt.imageSize), opt.imageSize, 3),
                    0.7, jnp.float32)

    frames = []
    for obj_path in objs[::opt.step]:
        mesh = load_obj(obj_path)
        epoch = re.findall(r"epoch_(\d+)_template", obj_path)[0]
        att = {
            "azimuths": jnp.asarray([-30.0]),
            "elevations": jnp.asarray([15.0]),
            "distances": jnp.asarray([2.5]),
            "biases": jnp.zeros((1, 2)),
            "vertices": jnp.asarray(mesh.vertices)[None],
            "delta_vertices": jnp.zeros((1, V, 3)),
            "textures": gray,
            "lights": jnp.asarray([[3.0, 0.3, 0.6, 0.3, 0, 0, 0, 0, 0]]),
            "bg": None,
        }
        rgba, _ = diffRender.render(**att)
        frame = to_uint8(np.asarray(rgba[0, :, :, :3]))
        frames.append((int(epoch), frame))

    gif_path = os.path.join(opt.outf, "template_evolution.gif")
    writer = imageio.get_writer(gif_path, mode="I", duration=0.3)
    for _, f in frames:
        writer.append_data(f)
    writer.close()
    strip = np.concatenate([f for _, f in frames[:: max(1, len(frames) // 8)]],
                           axis=1)
    imageio.imwrite(os.path.join(opt.outf, "template_evolution.png"), strip)
    print("wrote", gif_path)


if __name__ == "__main__":
    main()
