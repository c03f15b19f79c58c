"""Does the pallas chunk-skip actually save time? Compare a mesh squeezed
into one corner (max cull) vs spread over the screen (no cull)."""
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import jax
import jax.numpy as jnp

from magicmirror.ops.pallas.rasterize_tpu import rasterize_phase1_pallas
from magicmirror.ops.rasterize import pixel_grid


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B, S, F = 32, 256, 1280
    rs = np.random.RandomState(0)
    px, py = pixel_grid(S, S)
    fz = jnp.asarray(rs.uniform(-4, -2, (B, F, 3)).astype(np.float32))
    fnz = jnp.ones((B, F), jnp.float32)
    f = jax.jit(jax.vmap(lambda a, b, c: rasterize_phase1_pallas(
        px, py, a, b, c, 7000.0)))

    tri = rs.uniform(0, 0.04, (B, F, 3, 2)).astype(np.float32)
    base_spread = rs.uniform(-0.95, 0.9, (B, F, 1, 2)).astype(np.float32)
    spread = jnp.asarray(base_spread + tri)
    corner = jnp.asarray(base_spread * 0.02 - 0.97 + tri)

    t1 = timeit(f, spread, fz, fnz)
    t2 = timeit(f, corner, fz, fnz)
    print(f"spread: {t1*1e3:.2f} ms   corner: {t2*1e3:.2f} ms   "
          f"cull speedup {t1/t2:.2f}x")


if __name__ == "__main__":
    main()
