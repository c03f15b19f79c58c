"""Optimizers and LR schedules (reference trainer.py:127-176).

Adam/AdamW with betas (beta1, 0.999), optional amsgrad and weight decay; the
shape backbone parameter group runs at 0.05x lr (reference trainer.py:143-153).
Schedules step per *epoch* (reference trainer.py:538-539): they are computed
host-side as a scalar and injected into the jitted step, so no retracing.
"""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import optax


def _base_opt(adamw: bool, beta1: float, wd: float, amsgrad: bool):
    if amsgrad:
        inner = optax.amsgrad(learning_rate=1.0, b1=beta1, b2=0.999)
        # amsgrad has no decoupled wd arg; chain it
        if adamw and wd > 0:
            return optax.chain(optax.add_decayed_weights(wd), inner)
        if wd > 0:
            # plain Adam wd = L2 on gradients
            return optax.chain(optax.add_decayed_weights(wd), inner)
        return inner
    if adamw:
        return optax.adamw(learning_rate=1.0, b1=beta1, b2=0.999, weight_decay=wd)
    return optax.chain(
        optax.add_decayed_weights(wd) if wd > 0 else optax.identity(),
        optax.adam(learning_rate=1.0, b1=beta1, b2=0.999),
    )


def _group_labels(params):
    """'backbone' for the shape_enc backbone subtree, 'main' elsewhere."""
    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        # shape_enc backbone subtree → 'backbone' group
        if len(path) >= 2 and path[0] == "shape_enc" and path[1] == "backbone":
            return "backbone"
        return "main"

    return walk(params)


def flatten_groupscale(inner, label_fn=None, group_scales=None):
    """Run ``inner`` ONCE on all leaves raveled into a single 1-D vector,
    then multiply by a per-element group-scale vector.

    Adam/amsgrad/weight-decay are elementwise, so this is math-identical to
    ``optax.multi_transform({g: chain(inner, scale(s_g))})`` — but it
    collapses the per-leaf update ocean (~12 StableHLO ops x 2 masked groups
    x ~300 leaves, plus a broadcast+constant pair per op) into a handful of
    fused 1-D loops.  That matters twice: XLA:CPU compile of the multichip
    dryrun scales superlinearly with op count (round-5 gate work, see
    docs/DESIGN.md), and per-op dispatch overhead on the remote-TPU path.

    The group-scale vector is built HOST-SIDE from the static leaf shapes at
    trace time — zero HLO ops, one embedded constant."""
    import jax
    import numpy as np
    from jax.flatten_util import ravel_pytree

    def _scale_vec(params):
        if label_fn is None:
            return None
        labels = label_fn(params)
        flat_labels = jax.tree_util.tree_leaves(labels)
        flat_params = jax.tree_util.tree_leaves(params)
        segs = [np.full(int(np.prod(np.shape(p))), group_scales[l],
                        np.float32)
                for l, p in zip(flat_labels, flat_params)]
        vec = np.concatenate(segs) if segs else np.zeros(0, np.float32)
        return None if (vec == 1.0).all() else jnp.asarray(vec)

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update_fn(updates, state, params=None):
        flat_u, unravel = ravel_pytree(updates)
        flat_p = ravel_pytree(params)[0] if params is not None else None
        new_u, new_state = inner.update(flat_u, state, flat_p)
        sv = _scale_vec(updates)
        if sv is not None:
            new_u = new_u * sv
        return unravel(new_u), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer_e(adamw: bool = False, beta1: float = 0.5, wd: float = 0.0,
                     amsgrad: bool = True, backbone_scale: float = 0.05,
                     flat: bool = True):
    """Encoder optimizer with the shape-backbone 0.05x lr group.

    The learning rate enters as a runtime scalar through
    ``optax.scale_by_learning_rate`` on an injected hyperparam: we instead
    multiply the per-group scale and apply ``-lr`` at update time via the
    state's ``lr`` argument (see ``apply_updates_scaled``).

    ``flat=True`` (default) runs one Adam on the raveled parameter vector
    with a per-element group-scale — bit-equivalent update math, ~20x fewer
    optimizer ops (see ``flatten_groupscale``).  ``flat=False`` keeps the
    optax ``multi_transform`` tree form (and its checkpoint layout)."""
    if flat:
        return flatten_groupscale(
            _base_opt(adamw, beta1, wd, amsgrad), _group_labels,
            {"main": 1.0, "backbone": backbone_scale})

    opt = optax.multi_transform(
        {
            "main": _base_opt(adamw, beta1, wd, amsgrad),
            "backbone": optax.chain(
                _base_opt(adamw, beta1, wd, amsgrad),
                optax.scale(backbone_scale),
            ),
        },
        _group_labels,
    )
    return opt


def make_optimizer_d(beta1: float = 0.5, wd: float = 0.0, amsgrad: bool = True,
                     flat: bool = True):
    """Discriminator optimizer: plain Adam (reference trainer.py:146)."""
    base = _base_opt(adamw=False, beta1=beta1, wd=wd, amsgrad=amsgrad)
    return flatten_groupscale(base) if flat else base


def apply_updates_scaled(params, updates, lr):
    """Apply optimizer updates scaled by the (runtime) learning rate.

    The base optimizers are built with learning_rate=1.0, so ``updates``
    already carry optax's additive convention (including the minus sign);
    scaling by the runtime lr lets one compiled train step serve every epoch
    of any schedule."""
    import jax

    return jax.tree_util.tree_map(lambda p, u: p + lr * u, params, updates)


def lr_schedule(scheduler: str, epoch: int, niter: int, lr: float, gamma: float) -> float:
    """Per-epoch LR (reference trainer.py:156-176), evaluated host-side."""
    if scheduler == "step":
        return lr * (gamma if epoch >= round(0.8 * niter) else 1.0)
    if scheduler in ("restart", "restart2", "restart1"):
        if scheduler == "restart":
            T0, tmult = niter // (1 + 2 + 4) + 1, 2
        elif scheduler == "restart2":
            T0, tmult = niter // (1 + 2) + 1, 2
        else:
            T0, tmult = int(niter / 2) + 1, 1
        eta_min = gamma * lr
        # find position within the current restart cycle
        t, T = epoch, T0
        while t >= T:
            t -= T
            T *= tmult
        return eta_min + (lr - eta_min) * (1 + math.cos(math.pi * t / T)) / 2
    if scheduler == "exp":
        return lr * (0.997 ** epoch)
    # cosine (default)
    eta_min = gamma * lr
    return eta_min + (lr - eta_min) * (1 + math.cos(math.pi * min(epoch, niter) / niter)) / 2
