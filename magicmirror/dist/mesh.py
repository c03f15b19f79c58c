"""Device mesh + sharding rules (SURVEY.md §2.3 "TPU-native mapping").

The reference's only parallelism is single-process DataParallel
(reference trainer.py:94-95) plus host dataloader workers; the TPU-native
equivalent is SPMD data parallelism over a 1-D ``jax.sharding.Mesh``:

  * batch axis of images/attributes sharded over the ``data`` axis;
  * parameters, optimizer state, and the template replicated;
  * gradient all-reduce emerges from sharding propagation (XLA inserts
    ``all-reduce`` over ICI) — no NCCL analog to write.

The renderer is batch-parallel by construction (every op carries the leading
batch dim), so the same train step compiles unmodified under any mesh size;
an image-tile axis can later split the rasterizer grid without a rewrite
(SURVEY.md §2.3).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the local devices (multi-host ready:
    under ``jax.distributed`` this spans all processes' devices)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Device-put a host numpy batch with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") and x.ndim > 0
        else x, batch)


def shard_train_state(mesh: Mesh, state):
    """Replicate the full train state across the mesh (params are small:
    ~30M; DP is the right regime, SURVEY.md §2.3)."""
    rep = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def initialize_distributed():
    """Multi-host init (jax.distributed); no-op when single-process."""
    try:
        jax.distributed.initialize()
    except Exception:
        pass
