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


def test_dryrun_multichip_entry_and_dp_invariance():
    """The driver's multi-chip dry run: full train step over an 8-device
    mesh, PLUS the DP-invariance proof — the identical global batch on a
    1-device mesh must give the same lossR/lossD and parameter-norm
    fingerprint within fp tolerance (asserted inside dryrun_multichip).

    Runs in a SUBPROCESS, exactly how the driver invokes it: in-process it
    is green in isolation but aborts inside XLA:CPU when executed after the
    ~90 compiled graphs the preceding suite accumulates (runtime state
    interaction, reproduced twice on a fresh compile cache)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # the gate path no longer touches any persistent cache (XLA:CPU AOT
    # entries self-reject on +prefer-no-* pseudo-features, VERDICT r4) —
    # drop conftest's cache var so the subprocess matches the driver exactly
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    # the DP-invariance second compile is test-only (the driver gate budget
    # affords exactly ONE compiled program; this test's 1800-s timeout
    # affords two)
    env["MAGICMIRROR_DRYRUN_FULL"] = "1"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}")


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import numpy as np

        return {"images": np.full((2, 2, 4), float(i), np.float32),
                "path": f"img_{i}.png"}


def test_sharded_loader_partitions_disjointly():
    """Multi-host data split (VERDICT round-1 item 8): per-process strided
    shards are disjoint, agree on the shuffled order, and — the ADVICE
    round-2 deadlock fix — every rank sees EXACTLY n // count samples so all
    ranks run the same number of (collective) steps.  The n % count
    remainder samples are dropped for that epoch (reshuffled epochs rotate
    which ones)."""
    from magicmirror.data.loader import DataLoader

    n, count = 37, 4
    seen = []
    for rank in range(count):
        dl = DataLoader(_ToyDataset(n), batch_size=3, shuffle=True,
                        num_workers=1, seed=7, shard=(rank, count))
        dl._epoch = 1
        ids = [i for chunk in dl._batches() for i in chunk]
        assert len(ids) == n // count  # identical per-rank sample count
        seen.append(ids)
    flat = sorted(i for ids in seen for i in ids)
    assert len(flat) == len(set(flat))  # disjoint
    assert (n // count) * count == len(flat)
    # identical global order: interleaving the shards reproduces one
    # unsharded shuffle (truncated to the common per-rank length)
    dl0 = DataLoader(_ToyDataset(n), batch_size=3, shuffle=True,
                     num_workers=1, seed=7)
    dl0._epoch = 1
    full = [i for chunk in dl0._batches() for i in chunk]
    for rank in range(count):
        assert seen[rank] == full[rank::count][:n // count]


def test_sharded_loader_equal_batch_counts():
    """ADVICE round-2 (medium): n=9, count=2, bs=5 with drop_last used to
    give rank0 one step and rank1 zero — a guaranteed multi-host deadlock
    (each step is a collective).  Every rank must expose the same len()."""
    from magicmirror.data.loader import DataLoader

    for n, count, bs, drop in ((9, 2, 5, True), (9, 2, 5, False),
                               (10, 3, 2, True), (7, 4, 1, False)):
        lens = set()
        for rank in range(count):
            dl = DataLoader(_ToyDataset(n), batch_size=bs, shuffle=True,
                            num_workers=1, drop_last=drop, seed=3,
                            shard=(rank, count))
            dl._epoch = 1
            assert len(list(dl._batches())) == len(dl)
            lens.add(len(dl))
        assert len(lens) == 1, (n, count, bs, drop, lens)


def test_global_batch_semantics_on_mesh():
    """shard_global_batch produces a batch-sharded GLOBAL array whose
    device order matches the host batch (single-process path of the
    multi-host assembler)."""
    import jax
    import numpy as np

    from magicmirror.dist.mesh import make_device_mesh, shard_global_batch

    mesh = make_device_mesh()
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    batch = {"images": x, "path": ["p"] * 8}
    out = shard_global_batch(mesh, batch)
    assert out["images"].shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(out["images"]), x)
    shard_sizes = {d.data.shape[0] for d in out["images"].addressable_shards}
    assert shard_sizes == {1}  # batch axis split over the 8 mesh devices
    assert out["path"] == ["p"] * 8


def test_sharded_loader_requires_seed():
    import pytest as _pytest

    from magicmirror.data.loader import DataLoader

    with _pytest.raises(ValueError):
        DataLoader(_ToyDataset(8), 2, shuffle=True, shard=(0, 2))
