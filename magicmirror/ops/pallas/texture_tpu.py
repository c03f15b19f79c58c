"""Fused Pallas TPU kernel for bilinear UV texture sampling.

The MXU one-hot formulation (ops/sampling.py::texture_mapping_mxu) is
flop-bound AND traffic-bound: the (P, Ht) tent-weight matrix and the (P, Wt,
C) row-selected intermediate both round-trip HBM (XLA cannot fuse producers
into a dot's operands).  This kernel keeps everything in VMEM:

  per pixel tile (TP, ):
    Wy[p, k] = relu(1 - |y_p - k|)          k in [0, Ht)   (on the fly)
    S[p, :]  = Wy @ T                       (TP, Ht) x (Ht, Wt*C)  MXU
    Wx3[p, j] = relu(1 - |x_p - j//C|)      j in [0, Wt*C)
    out[p, c] = (S * Wx3) @ Sel[:, c]       Sel[j, c] = [j % C == c]  MXU

Restricting the tent index range to the VALID texel rows/cols implements
'zeros' padding exactly (out-of-range taps are simply absent), so for
power-of-two texture sides every matmul dimension is already an MXU tile
multiple — no padded ring, no relayout.

Gradients: callers wrap this in a custom VJP whose backward runs the
(differentiable) XLA formulation — texture sampling backward only matters in
training, where image sizes are small; the serving path stays pure Pallas.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TP = 512  # pixels per tile (sublane axis of the tent-weight matmul)


def _kernel(x_ref, y_ref, tex_ref, sel_ref, out_ref, *, Ht, Wt, C):
    y = y_ref[0]                                     # (TP, 1)
    x = x_ref[0]
    # Mosaic's tpu.iota is integer-only — generate i32 and convert
    ky = jax.lax.broadcasted_iota(jnp.int32, (1, Ht), 1).astype(jnp.float32)
    Wy = jax.nn.relu(1.0 - jnp.abs(y - ky)).astype(jnp.bfloat16)
    s = jnp.dot(Wy, tex_ref[0, 0], preferred_element_type=jnp.float32)
    jx = jax.lax.broadcasted_iota(jnp.int32, (1, Wt * C), 1) // C
    Wx3 = jax.nn.relu(1.0 - jnp.abs(x - jx.astype(jnp.float32)))
    m = (s * Wx3).astype(jnp.bfloat16)
    out = jnp.dot(m, sel_ref[0], preferred_element_type=jnp.float32)
    out_ref[0] = out[:, :C]


def texture_bilinear_pallas(texture_coordinates, texture_maps,
                            interpret: bool | None = None):
    """Batched kaolin-semantics UV sampling (uv in [0,1]^2, v=0 at texture
    bottom, 'zeros' padding): (B, H, W, 2) x (B, Ht, Wt, C) -> (B, H, W, C).

    Forward-only (no VJP defined here) — see texture_mapping for the
    dispatching wrapper with gradient support.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Hg, Wg, _ = texture_coordinates.shape
    _, Ht, Wt, C = texture_maps.shape
    P = Hg * Wg
    assert P % _TP == 0, "pixel count must divide the tile size"
    NT = P // _TP

    uv = jnp.clip(texture_coordinates, 0.0, 1.0).reshape(B, P, 2)
    # torch/kaolin unnormalize: pixel = ((coord+1)*size - 1)/2 with
    # coord_x = 2u-1, coord_y = -(2v-1)
    x = uv[..., 0] * Wt - 0.5
    y = (1.0 - uv[..., 1]) * Ht - 0.5
    # C-strided selector: Sel[j, c] = 1 iff j % C == c (the channel sum)
    sel = (jnp.arange(Wt * C)[:, None] % C ==
           jnp.arange(C)[None, :]).astype(jnp.bfloat16)
    # pad the 3-wide selector/output lane dim to 128 off the hot path
    Cp = 128
    sel = jnp.pad(sel, ((0, 0), (0, Cp - C)))
    tex = texture_maps.reshape(B, 1, Ht, Wt * C).astype(jnp.bfloat16)

    kernel = functools.partial(_kernel, Ht=Ht, Wt=Wt, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, _TP, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TP, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Ht, Wt * C), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wt * C, Cp), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TP, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C), jnp.float32),
        interpret=interpret,
    )(x.reshape(B, P, 1), y.reshape(B, P, 1), tex, sel[None])
    return out.reshape(B, Hg, Wg, C)
