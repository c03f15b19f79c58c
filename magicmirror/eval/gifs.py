"""Camera-sweep GIF generation (reference trainer.py:616-671, show_rainbow2
sweeps at show_rainbow2.py:376-485)."""
from __future__ import annotations

import shutil

import imageio
import numpy as np

from ..render.renderer import deep_copy
from .images import make_grid, to_uint8


def _frames(render_fn, att, key, values, batch_size):
    frames = []
    for v in values:
        att2 = dict(att)
        att2[key] = np.broadcast_to(np.float32(v), (batch_size,))
        rgba, _ = render_fn(**att2)
        rgb = np.asarray(rgba[..., :3])
        frames.append(to_uint8(make_grid(rgb)))
    return frames


def sweep_gif(render_fn, att, path: str, key: str, values, copy_to: str | None = None):
    """Render ``att`` while sweeping one camera attribute; write a GIF."""
    att = deep_copy(att, detach=True)
    batch_size = np.asarray(att["azimuths"]).shape[0]
    writer = imageio.get_writer(path, mode="I")
    for frame in _frames(render_fn, att, key, values, batch_size):
        writer.append_data(frame)
    writer.close()
    if copy_to:
        shutil.copyfile(path, copy_to)


def azimuth_sweep(render_fn, att, path, azi_scope=360, step=10, copy_to=None):
    values = [-a for a in range(-int(azi_scope / 2), int(azi_scope / 2), step)]
    sweep_gif(render_fn, att, path, "azimuths", values, copy_to)


def elevation_sweep(render_fn, att, path, elev_range="0~30", step=10, copy_to=None):
    lo, hi = [int(float(v)) for v in elev_range.split("~")]
    values = [-e for e in range(lo, hi, step)]
    sweep_gif(render_fn, att, path, "elevations", values, copy_to)


def distance_sweep(render_fn, att, path, dist_range="2~7", copy_to=None):
    lo, hi = [int(float(v)) for v in dist_range.split("~")]
    values = [-d for d in range(lo, hi + 1)]
    sweep_gif(render_fn, att, path, "distances", values, copy_to)
