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


def multihost_requested() -> bool:
    """True when standard multi-host env vars are present (torchrun-style
    COORDINATOR_ADDRESS / jax.distributed auto-detect envs)."""
    import os

    return any(v in os.environ for v in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MAGICMIRROR_NUM_PROCESSES"))


def initialize_distributed() -> tuple[int, int]:
    """Multi-host init: call ``jax.distributed.initialize`` when the
    coordinator env is configured (errors PROPAGATE — a half-initialized
    cluster must not silently fall back to single-host), no-op otherwise.

    Returns (process_index, process_count).  Called from ``cli/train.py``
    ``prepare()`` before any backend use; afterwards ``jax.devices()`` spans
    every host's chips so ``make_device_mesh`` builds the global DP mesh.
    """
    import os

    if multihost_requested() and jax.process_count() == 1:
        kwargs = {}
        addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS"))
        if addr:
            kwargs["coordinator_address"] = addr
        n = os.environ.get("MAGICMIRROR_NUM_PROCESSES")
        if n:
            kwargs["num_processes"] = int(n)
            kwargs["process_id"] = int(os.environ.get(
                "MAGICMIRROR_PROCESS_ID", "0"))
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def shard_global_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Form a GLOBAL batch-sharded array from this process's local shard
    (multi-host: every process passes its own batchSize/process_count slice;
    single-host this equals ``shard_batch``)."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        if not (hasattr(x, "shape") and getattr(x, "ndim", 0) > 0):
            return x
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)
