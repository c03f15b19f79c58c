"""Texture gather variants measured IN CONTEXT (after a phase2-like producer
so XLA can't fold anything)."""
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import jax
import jax.numpy as jnp


def bench(f, *args, iters=10):
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
    # "uv from a producer": derived from an input so nothing constant-folds
    seed = jnp.asarray(rs.rand(B, S, S, 2).astype(np.float32))
    tex = jnp.asarray(rs.rand(B, Ht, Wt, 3).astype(np.float32))

    def producer(s):
        return jnp.sin(s * 17.0) * 0.5 + 0.5  # uv in [0,1]

    def variant(quad_dtype, pad_to, u, t):
        uv = producer(u)
        gx = uv[..., 0] * 2 - 1
        gy = -(uv[..., 1] * 2 - 1)
        x = ((gx.reshape(B, -1) + 1) * Wt - 1) * 0.5
        y = ((gy.reshape(B, -1) + 1) * Ht - 1) * 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = (x - x0)[..., None]; wy = (y - y0)[..., None]
        x0c = jnp.clip(x0.astype(jnp.int32), -1, Wt - 1) + 1
        y0c = jnp.clip(y0.astype(jnp.int32), -1, Ht - 1) + 1
        tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate([tp[:, :-1, :-1], tp[:, :-1, 1:],
                                tp[:, 1:, :-1], tp[:, 1:, 1:]], -1)
        if pad_to:
            quad = jnp.pad(quad, ((0, 0), (0, 0), (0, 0), (0, pad_to - 12)))
        quad = quad.astype(quad_dtype).reshape(B, (Ht + 1) * (Wt + 1), -1)
        g = jnp.take_along_axis(quad, (y0c * (Wt + 1) + x0c)[..., None],
                                axis=1).astype(jnp.float32)
        g3 = g[..., :12].reshape(B, -1, 4, 3)
        out = (g3[:, :, 0] * (1 - wx) * (1 - wy) + g3[:, :, 1] * wx * (1 - wy)
               + g3[:, :, 2] * (1 - wx) * wy + g3[:, :, 3] * wx * wy)
        return out

    for name, dt, padto in [("f32 quad (current)", jnp.float32, 0),
                            ("bf16 quad", jnp.bfloat16, 0),
                            ("f32 quad pad16", jnp.float32, 16),
                            ("bf16 quad pad16", jnp.bfloat16, 16)]:
        f = jax.jit(lambda u, t, dt=dt, p=padto: variant(dt, p, u, t))
        print(f"{name:22s}: {bench(f, seed, tex)*1e3:7.2f} ms")

    # 4 separate non-quad gathers (the original grid_sample way), in context
    def four_gathers(u, t):
        uv = producer(u)
        gx = uv[..., 0] * 2 - 1
        gy = -(uv[..., 1] * 2 - 1)
        x = ((gx.reshape(B, -1) + 1) * Wt - 1) * 0.5
        y = ((gy.reshape(B, -1) + 1) * Ht - 1) * 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = (x - x0)[..., None]; wy = (y - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, Wt - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, Ht - 1)
        x1i = jnp.clip(x0i + 1, 0, Wt - 1)
        y1i = jnp.clip(y0i + 1, 0, Ht - 1)
        flat = t.reshape(B, Ht * Wt, 3)
        g00 = jnp.take_along_axis(flat, (y0i * Wt + x0i)[..., None], axis=1)
        g01 = jnp.take_along_axis(flat, (y0i * Wt + x1i)[..., None], axis=1)
        g10 = jnp.take_along_axis(flat, (y1i * Wt + x0i)[..., None], axis=1)
        g11 = jnp.take_along_axis(flat, (y1i * Wt + x1i)[..., None], axis=1)
        return (g00 * (1 - wx) * (1 - wy) + g01 * wx * (1 - wy)
                + g10 * (1 - wx) * wy + g11 * wx * wy)

    print(f"{'4 gathers (no quad)':22s}: {bench(jax.jit(four_gathers), seed, tex)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
