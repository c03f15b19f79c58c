"""Compare TPU gather formulations for the texture fetch."""
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import jax
import jax.numpy as jnp


def bench(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B, P, HW, C = 8, 65536, 513 * 257, 12
    rs = np.random.RandomState(0)
    table = jnp.asarray(rs.rand(B, HW, C).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, HW, (B, P)).astype(np.int32))

    f1 = jax.jit(lambda t, i: jnp.take_along_axis(t, i[..., None], axis=1))
    print(f"take_along_axis(B,HW,C):    {bench(f1, table, idx)*1e3:7.2f} ms")

    def flat(t, i):
        t2 = t.reshape(B * HW, C)
        gi = (jnp.arange(B, dtype=jnp.int32)[:, None] * HW + i).reshape(-1)
        return jnp.take(t2, gi, axis=0).reshape(B, P, C)

    f2 = jax.jit(flat)
    print(f"flat take(B*HW,C):          {bench(f2, table, idx)*1e3:7.2f} ms")

    pass


if __name__ == "__main__":
    main()
