"""Flat (raveled single-vector) optimizer vs the optax multi_transform tree
form: bit-identical updates (adam is elementwise; the backbone group's 0.05x
scale becomes a per-element constant vector).  The flat form is the default —
it collapses ~20x optimizer ops, which the round-5 multichip gate needs
(XLA:CPU compile scales superlinearly with op count) and the remote-TPU
dispatch path benefits from.  Reference optimizer: trainer.py:127-176."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicmirror.train.optim import (apply_updates_scaled, make_optimizer_d,
                                     make_optimizer_e)


def _tree(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "shape_enc": {
            "backbone": {"w": jnp.asarray(rs.randn(4, 3), jnp.float32),
                         "b": jnp.asarray(rs.randn(4), jnp.float32)},
            "head": {"b": jnp.asarray(rs.randn(5), jnp.float32)},
        },
        "tex": {"k": jnp.asarray(rs.randn(2, 2, 3), jnp.float32)},
    }


@pytest.mark.parametrize("kw", [
    dict(amsgrad=True),
    dict(amsgrad=False),
    dict(amsgrad=False, adamw=True, wd=0.01),
    dict(amsgrad=True, wd=0.02),
])
def test_flat_e_matches_tree(kw):
    params = _tree()
    grads = _tree(seed=1)
    o_t, o_f = make_optimizer_e(flat=False, **kw), make_optimizer_e(flat=True, **kw)
    st, sf = o_t.init(params), o_f.init(params)
    p_t = p_f = params
    for _ in range(4):
        ut, st = o_t.update(grads, st, p_t)
        uf, sf = o_f.update(grads, sf, p_f)
        p_t = apply_updates_scaled(p_t, ut, 1e-3)
        p_f = apply_updates_scaled(p_f, uf, 1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(p_t),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_backbone_group_scaled():
    """The backbone subtree must move 0.05x the head's step for an identical
    gradient (first step: adam normalizes, so steps are +-lr*scale)."""
    params = _tree()
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    o = make_optimizer_e(flat=True, amsgrad=False)
    u, _ = o.update(grads, o.init(params), params)
    bb = float(jnp.mean(jnp.abs(u["shape_enc"]["backbone"]["w"])))
    hd = float(jnp.mean(jnp.abs(u["shape_enc"]["head"]["b"])))
    assert abs(bb / hd - 0.05) < 1e-4


def test_flat_d_matches_tree():
    params = _tree()
    grads = _tree(seed=2)
    o_t, o_f = make_optimizer_d(flat=False), make_optimizer_d(flat=True)
    st, sf = o_t.init(params), o_f.init(params)
    ut, _ = o_t.update(grads, st, params)
    uf, _ = o_f.update(grads, sf, params)
    for a, b in zip(jax.tree_util.tree_leaves(ut),
                    jax.tree_util.tree_leaves(uf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_state_is_compact():
    """The flat optimizer state holds O(1) leaves (single raveled vectors),
    not a mirror of the parameter tree — the op-count property the gate
    relies on."""
    params = _tree()
    o = make_optimizer_e(flat=True)
    n_leaves = len(jax.tree_util.tree_leaves(o.init(params)))
    assert n_leaves <= 6, n_leaves
