"""Functional train state (replaces the reference's module-buffer mutation:
netE/netD/optimizers/SWA/template live in one pytree).

The evolved template (reference keeps it as ``netE.vertices_init``,
networks.py:536, rewritten by the EM update trainer.py:1090-1103) is a
first-class field here so the EM update is a pure state transition.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params_e: Any
    stats_e: Any
    params_d: Any
    opt_state_e: Any
    opt_state_d: Any
    template: jnp.ndarray  # (V, 3) live template (vertices_init)
    em_step: jnp.ndarray  # scalar, decayed 0.99/update (reference trainer.py:1104)
    swa_params: Any  # averaged encoder params (SWA), same tree as params_e
    swa_stats: Any
    swa_n: jnp.ndarray  # number of models averaged
    epoch: jnp.ndarray
    step: jnp.ndarray


def create_train_state(rng, netE, netD, opt_e, opt_d, sample_batch, template,
                       lpl, em_step: float = 0.1):
    """Initialize all parameters and optimizer states.

    The whole init runs under ONE ``jax.jit``: eager flax init dispatches
    thousands of individually-compiled ops (120+ s on the 1-core driver host
    emulating 8 devices, and one tunnel round-trip each on TPU); a single
    jitted init graph compiles once and lands in the persistent compile
    cache."""

    def _init(rng, sample_batch, template):
        k_e, k_d, k_drop = jax.random.split(rng, 3)
        variables_e = netE.init({"params": k_e, "dropout": k_drop},
                                sample_batch, template, lpl, train_shape=0,
                                train=False)
        params_e = variables_e["params"]
        stats_e = variables_e.get("batch_stats", {})
        if getattr(netE, "lambda_lc", 0.0) > 0:
            # the landmark head is only traced via the landmark_loss method,
            # so its params need a second init merged into the main tree
            B, H, W = sample_batch.shape[:3]
            feats = jnp.zeros((B, H // 4, W // 4, 256), jnp.float32)
            lm = jnp.zeros((B, netE.num_faces, 2), jnp.float32)
            vis = jnp.ones((B, netE.num_faces), jnp.float32)
            sidx = jnp.arange(64)
            v_lc = netE.init({"params": k_e}, feats, lm, vis, sidx,
                             method="landmark_loss")
            params_e = {**dict(params_e), **dict(v_lc["params"])}
            stats_e = {**dict(stats_e), **dict(v_lc.get("batch_stats", {}))}
        dis_nc = netD.nc
        d_in = sample_batch[..., :dis_nc]
        params_d = netD.init(k_d, d_in)["params"]
        # SWA slots start as COPIES — aliasing params_e would donate the
        # same buffer twice under the donated train step
        copy = lambda tree: jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), tree)
        return TrainState(
            params_e=params_e,
            stats_e=stats_e,
            params_d=params_d,
            opt_state_e=opt_e.init(params_e),
            opt_state_d=opt_d.init(params_d),
            template=jnp.asarray(template),
            em_step=jnp.asarray(em_step, jnp.float32),
            swa_params=copy(params_e),
            swa_stats=copy(stats_e),
            swa_n=jnp.asarray(0, jnp.int32),
            epoch=jnp.asarray(0, jnp.int32),
            step=jnp.asarray(0, jnp.int32),
        )

    return jax.jit(_init)(rng, jnp.asarray(sample_batch),
                          jnp.asarray(template))


def swa_update(state: TrainState) -> TrainState:
    """Equal-weight running average (torch AveragedModel semantics,
    reference trainer.py:178-180, 532-536)."""
    n = state.swa_n.astype(jnp.float32)
    new_swa = jax.tree_util.tree_map(
        lambda avg, p: avg + (p - avg) / (n + 1.0),
        state.swa_params, state.params_e)
    new_stats = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                       state.stats_e)
    return state.replace(swa_params=new_swa, swa_n=state.swa_n + 1,
                         swa_stats=new_stats)


def make_update_bn(netE, lpl):
    """Re-estimate BN running stats for a parameter set by streaming the train
    set (torch ``optim.swa_utils.update_bn`` semantics, reference
    trainer.py:673-676, 1105).  Returns host fn(params, stats, template,
    loader, rng) -> new_stats."""
    import numpy as np

    def one_batch(params, stats, template, Xa, rng):
        _, mut = netE.apply(
            {"params": params, "batch_stats": stats}, Xa, template, lpl,
            train_shape=0, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        return mut["batch_stats"]

    step = jax.jit(one_batch)

    def update_bn(params, stats, template, loader, rng, max_batches=None):
        for i, data in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            rng, sub = jax.random.split(rng)
            stats = step(params, stats, template,
                         jnp.asarray(np.asarray(data["images"])), sub)
        return stats

    return update_bn
