"""Compare TPU gather formulations for the texture fetch."""
import time

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
    B, P, HW, C = 32, 65536, 513 * 257, 12
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

    def vmap_take(t, i):
        return jax.vmap(lambda tt, ii: jnp.take(tt, ii, axis=0))(t, i)

    f3 = jax.jit(vmap_take)
    print(f"vmap take:                  {bench(f3, table, idx)*1e3:7.2f} ms")

    # padded channel to 16 (power of two / lane friendliness)
    table16 = jnp.concatenate([table, jnp.zeros((B, HW, 4))], -1)
    f4 = jax.jit(lambda t, i: jnp.take_along_axis(t, i[..., None], axis=1))
    print(f"take_along_axis C=16:       {bench(f4, table16, idx)*1e3:7.2f} ms")

    # one-hot matmul on 128-bucketed?? just measure dynamic_slice loop baseline skipped

    x1 = f1(table, idx)
    x2 = f2(table, idx)
    np.testing.assert_allclose(np.asarray(x1[..., 0]), np.asarray(x2[..., 0]))


if __name__ == "__main__":
    main()
