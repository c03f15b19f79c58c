"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is tested the TPU-native way (SURVEY.md §4): spoof 8 host
devices via XLA flags, build a real ``jax.sharding.Mesh`` over them, and run
the pjit paths for real — no cluster required.  Must run before jax imports.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
