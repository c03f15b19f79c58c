"""Texture-mapping micro-profile: weight materialization vs the row matmul.
Cumulative prefixes over the real (uv from render) inputs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

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
    from magicmirror.ops.sampling import (_unnormalize, texture_mapping,
                                          texture_mapping_mxu)

    B = int(os.environ.get("BENCH_BATCH", "32"))
    S = int(os.environ.get("BENCH_SIZE", "256"))
    rs = np.random.RandomState(0)
    uv = jnp.asarray(rs.rand(B, S, S, 2), jnp.float32)
    tex = jnp.asarray(rs.rand(B, 2 * S, S, 3), jnp.float32)
    Ht, Wt = 2 * S, S
    P = S * S

    def weights_only(uv_, tex_):
        u = jnp.clip(uv_, 0.0, 1.0)
        gx = u[..., 0].reshape(B, P) * 2.0 - 1.0
        gy = -(u[..., 1].reshape(B, P) * 2.0 - 1.0)
        x = _unnormalize(gx, Wt, False)
        y = _unnormalize(gy, Ht, False)

        def aw(coord, size):
            xx = jnp.clip(coord, -1.0, float(size)) + 1.0
            iota = jnp.arange(size + 2, dtype=jnp.float32)
            return jax.nn.relu(
                1.0 - jnp.abs(xx[..., None] - iota[None, None, :]))

        Wy = aw(y, Ht).astype(jnp.bfloat16)
        Wx = aw(x, Wt).astype(jnp.bfloat16)
        return Wy.sum(), Wx.sum()

    def s1_only(uv_, tex_):
        u = jnp.clip(uv_, 0.0, 1.0)
        gy = -(u[..., 1].reshape(B, P) * 2.0 - 1.0)
        y = _unnormalize(gy, Ht, False)

        def aw(coord, size):
            xx = jnp.clip(coord, -1.0, float(size)) + 1.0
            iota = jnp.arange(size + 2, dtype=jnp.float32)
            return jax.nn.relu(
                1.0 - jnp.abs(xx[..., None] - iota[None, None, :]))

        tex_p = jnp.pad(tex_, ((0, 0), (1, 1), (1, 1), (0, 0)))

        def chunk(args):
            yc, tc = args
            Wy = aw(yc[None], Ht)[0].astype(jnp.bfloat16)  # (P, Ht+2)
            t = tc.reshape(Ht + 2, (Wt + 2) * 3).astype(jnp.bfloat16)
            return jnp.einsum("py,yk->pk", Wy, t,
                              preferred_element_type=jnp.float32).sum()

        return jax.lax.map(chunk, (y, tex_p))

    def full_mxu(uv_, tex_):
        return texture_mapping_mxu(uv_, tex_)

    def full_dispatch(uv_, tex_):
        return texture_mapping(uv_, tex_)

    def gather_path(uv_, tex_):
        # the quad-packed single-gather fallback, forced
        u = jnp.clip(uv_, 0.0, 1.0)
        gx = u[..., 0] * 2.0 - 1.0
        gy = -(u[..., 1] * 2.0 - 1.0)
        x = _unnormalize(gx.reshape(B, -1), Wt, False)
        y = _unnormalize(gy.reshape(B, -1), Ht, False)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), -1, Wt - 1) + 1
        y0i = jnp.clip(y0.astype(jnp.int32), -1, Ht - 1) + 1
        tp = jnp.pad(tex_, ((0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate([tp[:, :-1, :-1], tp[:, :-1, 1:],
                                tp[:, 1:, :-1], tp[:, 1:, 1:]], axis=-1)
        quad = quad.reshape(B, (Ht + 1) * (Wt + 1), 12)
        g = jnp.take_along_axis(quad, (y0i * (Wt + 1) + x0i)[..., None],
                                axis=1).reshape(B, -1, 4, 3)
        return (g[:, :, 0] * (1 - wx) * (1 - wy)
                + g[:, :, 1] * wx * (1 - wy)
                + g[:, :, 2] * (1 - wx) * wy
                + g[:, :, 3] * wx * wy)

    print(f"weights only    : {bench(jax.jit(weights_only), uv, tex)*1e3:7.2f} ms")
    print(f"s1 einsum only  : {bench(jax.jit(s1_only), uv, tex)*1e3:7.2f} ms")
    print(f"mxu full        : {bench(jax.jit(full_mxu), uv, tex)*1e3:7.2f} ms")
    print(f"dispatch (prod) : {bench(jax.jit(full_dispatch), uv, tex)*1e3:7.2f} ms")
    print(f"quad gather     : {bench(jax.jit(gather_path), uv, tex)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
