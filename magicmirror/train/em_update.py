"""EM-style template evolution (reference trainer.py:979-1105).

Host/device choreography per SURVEY.md §7 hard-part 6: a jitted no-grad
encode sweep over the no-aug train set collects per-sample vertices on device;
subset selection (positive-z / symmetry / DBSCAN / top-K / mean) runs host-side
NumPy/sklearn; the template write-back is a pure state transition.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def make_encode_sweep(netE, diffRender, lpl):
    """Jitted batch encoder for the sweep (reference trainer.py:1000-1016)."""

    def encode(params_e, stats_e, template, Xa, white: bool):
        att = netE.apply({"params": params_e, "batch_stats": stats_e},
                         Xa, template, lpl, train_shape=0, train=False)
        vertices = att["vertices"]
        delta = att["delta_vertices"]
        if white:  # re-center (reference smr_utils.py:159-164)
            vertices = vertices - vertices.mean(axis=1, keepdims=True)
            delta = delta - delta.mean(axis=1, keepdims=True)
        return vertices, delta

    return jax.jit(encode, static_argnames=("white",))


def select_delta(all_vertices: np.ndarray, all_delta: np.ndarray, opt,
                 num_vertices: int):
    """Host-side subset selection (reference trainer.py:1018-1074).

    Returns (sum_delta (V,3), count)."""
    sample_number = all_vertices.shape[0]

    # drop collapsed samples: the reference thresholds the LAST vertex's mean
    # |delta| (trainer.py:1019 indexes [:, -1] on an (N, V, 3) tensor)
    mean_delta = np.abs(all_delta)[:, -1].mean(axis=1)
    keep = mean_delta <= 0.4
    all_vertices = all_vertices[keep]
    all_delta = all_delta[keep]
    n = all_vertices.shape[0]
    print("Extreme Bad Case: %d" % (sample_number - n))
    if n == 0:
        return np.zeros((num_vertices, 3), np.float32), 0

    em = opt.em
    if em == 2:  # only positive mean depth (hands in front)
        good = all_vertices[:, :, 2].mean(axis=1) >= 0.001
        return all_delta[good].sum(axis=0), int(good.sum())
    if em == 3:  # left/right + front/back symmetry counts
        left = (all_vertices[:, :, 0] > 0).sum(axis=1)
        front = (all_vertices[:, :, 2] > 0).sum(axis=1)
        g1 = np.abs(left - num_vertices // 2) < int(num_vertices * 0.1)
        g2 = np.abs(front - num_vertices // 2) < int(num_vertices * 0.1)
        good = g1 & g2
        return all_delta[good].sum(axis=0), int(good.sum())
    if em == 4:  # DBSCAN cluster on whitened L2-normalized shapes
        from sklearn.cluster import DBSCAN

        flat = all_vertices.reshape(n, -1).astype(np.float64)
        flat -= flat.mean(axis=1, keepdims=True)
        flat /= flat.std(axis=1, ddof=1, keepdims=True) + 1e-12
        flat /= np.linalg.norm(flat, axis=1, keepdims=True) + 1e-8
        sim = np.clip(flat @ flat.T, None, 1.0)
        dist = 2.0 - 2.0 * sim
        labels = DBSCAN(eps=opt.eps, min_samples=max(int(n * 0.1), 1),
                        metric="precomputed").fit(dist).labels_
        valid = labels[labels != -1]
        if len(valid) > 0:
            vals, counts = np.unique(valid, return_counts=True)
            best = vals[np.argmax(counts)]
            good = labels == best
            print("Cluster %d is selected!" % best)
            return all_delta[good].sum(axis=0), int(good.sum())
        print("No good clusters are found! Use all data to update.")
        return all_delta.sum(axis=0), n
    if em == 5:  # top-K smallest deformation
        d = (all_delta.reshape(n, -1) ** 2).sum(axis=1)
        order = np.argsort(d)
        good = order[: int(n * opt.topK)]
        return all_delta[good].sum(axis=0), len(good)
    # default: all-sample mean
    return all_delta.sum(axis=0), n


def apply_template_update(template: np.ndarray, sum_delta: np.ndarray,
                          count: int, laplacian: np.ndarray, warm_up: float,
                          em_step: float, opt) -> tuple[np.ndarray, float]:
    """Smooth, clip, step, re-center, cross-check (reference
    trainer.py:1077-1104).  Returns (new_template, new_em_step)."""
    if count <= 1:
        return template, em_step
    delta = sum_delta / count
    if opt.smooth > 0:
        delta = delta + (laplacian @ delta) * opt.smooth
        if opt.em >= 6:
            for _ in range(int(opt.em - 5)):
                delta = delta + (laplacian @ delta) * opt.smooth
    delta = np.clip(delta, -opt.clip, opt.clip)
    new_template = template + warm_up * em_step * delta
    if opt.white:
        new_template = new_template - new_template.mean(axis=0, keepdims=True)
    # z-sign cross check: roll back if any vertex crossed the z=0 plane
    cross = np.sum(np.maximum(
        -np.sign(new_template[:, 2]) * np.sign(template[:, 2]), 0.0))
    print("whether_cross:%f" % cross)
    if cross > 0 and opt.cross:
        new_template = template
    return new_template.astype(np.float32), em_step * 0.99
