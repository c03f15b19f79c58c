"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is tested the TPU-native way (SURVEY.md §4): spoof 8 host
devices via XLA flags, build a real ``jax.sharding.Mesh`` over them, and run
the pjit paths for real — no cluster required.

The environment pins JAX_PLATFORMS=axon (the tunneled TPU) at interpreter
startup, so plain env vars can't redirect tests to CPU; ``jax.config.update``
before first backend use can.
"""
import os

prev = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
