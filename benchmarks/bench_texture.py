"""Break down texture_mapping cost on TPU."""
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
    B, S = 32, 256
    Ht, Wt = 2 * S, S
    rs = np.random.RandomState(0)
    uv = jnp.asarray(rs.rand(B, S, S, 2).astype(np.float32))
    tex = jnp.asarray(rs.rand(B, Ht, Wt, 3).astype(np.float32))

    from magicmirror.ops.sampling import texture_mapping, _unnormalize

    f_all = jax.jit(lambda u, t: texture_mapping(u, t))
    print(f"texture_mapping total: {bench(f_all, uv, tex)*1e3:7.2f} ms")

    def quad_only(t):
        tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
        q = jnp.concatenate([tp[:, :-1, :-1], tp[:, :-1, 1:],
                             tp[:, 1:, :-1], tp[:, 1:, 1:]], axis=-1)
        return q.reshape(B, (Ht + 1) * (Wt + 1), 12)

    f_q = jax.jit(quad_only)
    print(f"quad build:            {bench(f_q, tex)*1e3:7.2f} ms")

    quad = f_q(tex)

    def rest(u, q):
        gx = u[..., 0] * 2 - 1
        gy = -(u[..., 1] * 2 - 1)
        x = _unnormalize(gx.reshape(B, -1), Wt, False)
        y = _unnormalize(gy.reshape(B, -1), Ht, False)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = (x - x0)[..., None]; wy = (y - y0)[..., None]
        x0c = jnp.clip(x0.astype(jnp.int32), -1, Wt - 1) + 1
        y0c = jnp.clip(y0.astype(jnp.int32), -1, Ht - 1) + 1
        g = jnp.take_along_axis(q, (y0c * (Wt + 1) + x0c)[..., None], axis=1)
        g = g.reshape(B, -1, 4, 3)
        out = (g[:, :, 0] * (1 - wx) * (1 - wy) + g[:, :, 1] * wx * (1 - wy)
               + g[:, :, 2] * (1 - wx) * wy + g[:, :, 3] * wx * wy)
        return out

    f_r = jax.jit(rest)
    print(f"index+gather+blend:    {bench(f_r, uv, quad)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
