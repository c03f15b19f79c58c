"""Multi-chip sharding tests on the spoofed 8-device CPU mesh
(SURVEY.md §4: 'multi-chip tests via CPU-device-count spoofing')."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_batch_sharding_roundtrip():
    from magicmirror.dist.mesh import batch_sharding, make_device_mesh, shard_batch

    mesh = make_device_mesh()
    batch = {"images": np.ones((16, 8, 8, 4), np.float32), "path": ["x"] * 16}
    sharded = shard_batch(mesh, batch)
    assert sharded["images"].sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=4)
    np.testing.assert_allclose(np.asarray(sharded["images"]), 1.0)


def test_dryrun_multichip_entry():
    """The driver's multi-chip dry run: full train step over an 8-device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
