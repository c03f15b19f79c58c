"""Checkpoint save/restore with the reference's artifact layout
(reference trainer.py:815-836: ``log/<name>/ckpts/{latest_ckpt,best_ckpt,
epoch_%05d}`` + ``best_mesh.obj``), via orbax.

The evolved template is saved both inside the checkpoint (exact restore) and
as ``best_mesh.obj`` (the reference's interchange format — every eval script
re-injects it, reference test.py:220-223).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..geometry.obj_io import save_mesh


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, name)

    def save(self, name: str, state, epoch: int, extra: dict | None = None):
        """Save under ckpts/<name> (e.g. 'latest_ckpt', 'best_ckpt')."""
        payload = {"state": jax.device_get(state), "epoch": epoch}
        if extra:
            payload.update(extra)
        path = self._path(name)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, name: str, target):
        path = self._path(name)
        if not os.path.exists(path):
            return None
        payload = self._ckptr.restore(
            path, target={"state": jax.device_get(target), "epoch": 0})
        return payload

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))

    def save_best_mesh(self, template, faces, uvs):
        save_mesh(self._path("best_mesh.obj"), np.asarray(template),
                  np.asarray(faces), np.asarray(uvs))
