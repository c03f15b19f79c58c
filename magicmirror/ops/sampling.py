"""Differentiable grid sampling (bilinear / bicubic) for TPU.

The jnp replacement for every ``torch.nn.functional.grid_sample`` call site in
the reference (reference network/model_res.py:199, 321, 514, 599) and for
kaolin's ``texture_mapping`` (reference networks.py:305).

Implemented as batched gathers + weighted sums — XLA fuses the arithmetic and
lowers the gathers efficiently; no scatter, no dynamic shapes.  Layout is NHWC
(TPU-native); callers that think in NCHW should transpose at the boundary.
"""
from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

# experiment toggles, read ONCE at import: these select among mathematically
# equivalent bilinear formulations inside jitted code, so flipping them after
# the first compile would be silently ignored — latching at import makes the
# semantics explicit (see docs/DESIGN.md "Measured dead ends" for why both
# default off)
_TEX_PALLAS = _os.environ.get("MAGICMIRROR_TEX_PALLAS") == "1"
_TEX_INT8 = _os.environ.get("MAGICMIRROR_TEX_INT8") == "1"
_TEX_CHUNK = int(_os.environ.get("MAGICMIRROR_TEX_CHUNK", "1"))


def _unnormalize(coord, size: int, align_corners: bool):
    """Map [-1,1] grid coords to float pixel indices (torch convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(image, ix, iy, padding_mode: str):
    """Gather image[n, iy, ix, :] with integer index maps.

    image: (N, H, W, C); ix, iy: (N, P) int32. Returns (N, P, C) and the
    in-bounds validity mask (N, P, 1) (all-ones for 'border')."""
    N, H, W, C = image.shape
    valid = (
        (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
    )
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    flat = image.reshape(N, H * W, C)
    idx = iyc * W + ixc  # (N, P)
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    if padding_mode == "zeros":
        out = out * valid[..., None]
    return out


def grid_sample(
    image,
    grid,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
):
    """Sample ``image`` (N, H, W, C) at ``grid`` (N, Hg, Wg, 2) locations.

    ``grid[..., 0]`` is x (width axis), ``grid[..., 1]`` is y (height axis),
    both in [-1, 1] — identical semantics to torch's ``grid_sample`` modulo
    the NHWC layout.  Differentiable w.r.t. both image and grid.
    """
    N, H, W, C = image.shape
    Hg, Wg = grid.shape[1], grid.shape[2]
    g = grid.reshape(N, Hg * Wg, 2)
    x = _unnormalize(g[..., 0], W, align_corners)
    y = _unnormalize(g[..., 1], H, align_corners)

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        out = _gather_2d(image, ix, iy, padding_mode)
    elif mode == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        v00 = _gather_2d(image, x0i, y0i, padding_mode)
        v01 = _gather_2d(image, x0i + 1, y0i, padding_mode)
        v10 = _gather_2d(image, x0i, y0i + 1, padding_mode)
        v11 = _gather_2d(image, x0i + 1, y0i + 1, padding_mode)
        wx = wx[..., None]
        wy = wy[..., None]
        out = (
            v00 * (1 - wx) * (1 - wy)
            + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy
            + v11 * wx * wy
        )
    elif mode == "bicubic":
        out = _bicubic_sample(image, x, y, padding_mode)
    else:
        raise ValueError(f"unknown grid_sample mode: {mode}")

    return out.reshape(N, Hg, Wg, C)


def _cubic_weights(t):
    """Keys cubic-convolution weights, A = -0.75 (torch's choice), for the 4
    taps at offsets (-1, 0, 1, 2) relative to floor(x); t = frac(x)."""
    A = -0.75

    def w_near(d):  # |d| <= 1
        return ((A + 2) * d - (A + 3)) * d * d + 1

    def w_far(d):  # 1 < |d| < 2
        return ((A * d - 5 * A) * d + 8 * A) * d - 4 * A

    return (
        w_far(t + 1.0),
        w_near(t),
        w_near(1.0 - t),
        w_far(2.0 - t),
    )


def _bicubic_sample(image, x, y, padding_mode):
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wxs = _cubic_weights(tx)
    wys = _cubic_weights(ty)
    out = 0.0
    for j in range(4):
        row = 0.0
        for i in range(4):
            v = _gather_2d(image, x0i + (i - 1), y0i + (j - 1), padding_mode)
            row = row + v * wxs[i][..., None]
        out = out + row * wys[j][..., None]
    return out


def texture_mapping_mxu(texture_coordinates, texture_maps,
                        compute_dtype=jnp.bfloat16, batch_chunk: int | None = None):
    """Bilinear UV sampling as two MXU contractions (kaolin
    ``texture_mapping`` semantics, like :func:`texture_mapping`).

    XLA's TPU row-gather executes serially (~30 ns/row → ~2 ms/frame at 256²);
    bilinear interpolation is a 2-tap linear map per axis, i.e. a sparse
    matrix — materialized dense in bf16 it rides the MXU instead:

        S1[p, x, c] = Σ_y  Wy[p, y] · tex[y, x, c]     (the big matmul)
        out[p, c]   = Σ_x  Wx[p, x] · S1[p, x, c]

    ~5x faster than the gather at 256² and still fully differentiable (the
    backward is just the transposed matmuls).  Weights are exact in fp32
    before the bf16 cast; colors are 8-bit-bounded so bf16 is lossless in
    practice.  Batch is chunked to bound the (P, Ht) weight materialization.
    """
    if batch_chunk is None:
        batch_chunk = _TEX_CHUNK
    uv = jnp.clip(texture_coordinates, 0.0, 1.0)
    N, Hg, Wg, _ = uv.shape
    Nt, Ht, Wt, C = texture_maps.shape
    P = Hg * Wg

    grid_x = uv[..., 0].reshape(N, P) * 2.0 - 1.0
    grid_y = -(uv[..., 1].reshape(N, P) * 2.0 - 1.0)
    x = _unnormalize(grid_x, Wt, False)
    y = _unnormalize(grid_y, Ht, False)

    def one_axis_weights(coord, size):
        # bilinear taps = the tent kernel: weight of texel i is
        # max(0, 1 - |x - i|).  Restricting i to the VALID range [0, size)
        # makes out-of-range taps simply absent — exactly 'zeros' padding —
        # with no padded texture ring, and (for 2^k texture sides) keeps the
        # contraction/output dims exact MXU tile multiples (514/774 would be
        # padded to 640/896 internally: +45% wasted MXU flops).
        iota = jnp.arange(size, dtype=jnp.float32)
        return jax.nn.relu(1.0 - jnp.abs(coord[..., None] - iota[None, None, :]))

    def chunk_fn(args):
        xc, yc, texc = args
        Wy = one_axis_weights(yc, Ht).astype(compute_dtype)  # (n, P, Ht)
        Wx = one_axis_weights(xc, Wt).astype(compute_dtype)  # (n, P, Wt)
        t = texc.reshape(texc.shape[0], Ht, Wt * C).astype(compute_dtype)
        s1 = jnp.einsum("npy,nyk->npk", Wy, t,
                        preferred_element_type=jnp.float32)
        s1 = s1.reshape(s1.shape[0], P, Wt, C).astype(compute_dtype)
        out = jnp.einsum("npx,npxc->npc", Wx, s1,
                         preferred_element_type=jnp.float32)
        return out

    if N <= batch_chunk:
        out = chunk_fn((x, y, texture_maps))
    else:
        pad = (-N) % batch_chunk
        tex_p = texture_maps
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, P), x.dtype)])
            y = jnp.concatenate([y, jnp.zeros((pad, P), y.dtype)])
            tex_p = jnp.concatenate(
                [tex_p, jnp.zeros((pad,) + tex_p.shape[1:], tex_p.dtype)])
        nb = (N + pad) // batch_chunk
        xs = (x.reshape(nb, batch_chunk, P),
              y.reshape(nb, batch_chunk, P),
              tex_p.reshape((nb, batch_chunk) + tex_p.shape[1:]))
        out = jax.lax.map(chunk_fn, xs).reshape(nb * batch_chunk, P, -1)[:N]
    return out.reshape(N, Hg, Wg, C)


import functools as _functools


def texture_mapping_int8(texture_coordinates, texture_maps):
    """Bilinear UV sampling with the ROW-selection matmul in int8 (2x MXU
    rate vs bf16).  Tent weights and textures both quantize to 1/127 steps
    (8-bit-sourced texel values land within half a step), so color error
    stays within one 8-bit LSB — the same error class as the bf16 path.
    Forward only (wrapped in a custom VJP below; round() has no useful
    gradient)."""
    uv = jnp.clip(texture_coordinates, 0.0, 1.0)
    N, Hg, Wg, _ = uv.shape
    Nt, Ht, Wt, C = texture_maps.shape
    P = Hg * Wg
    x = _unnormalize(uv[..., 0].reshape(N, P) * 2.0 - 1.0, Wt, False)
    y = _unnormalize(-(uv[..., 1].reshape(N, P) * 2.0 - 1.0), Ht, False)

    def weights_q(coord, size):
        iota = jnp.arange(size, dtype=jnp.float32)
        w = jax.nn.relu(1.0 - jnp.abs(coord[..., None] - iota[None, None, :]))
        return jnp.round(w * 127.0).astype(jnp.int8)

    tq = jnp.round(jnp.clip(texture_maps, 0.0, 1.0) * 127.0).astype(jnp.int8)

    def chunk_fn(args):
        xc, yc, tc = args
        Wyq = weights_q(yc[None], Ht)[0]
        tqr = tc.reshape(Ht, Wt * C)
        s1 = jax.lax.dot(Wyq, tqr, preferred_element_type=jnp.int32)
        s1 = (s1.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
              ).reshape(P, Wt, C).astype(jnp.bfloat16)
        iota = jnp.arange(Wt, dtype=jnp.float32)
        Wx = jax.nn.relu(
            1.0 - jnp.abs(xc[:, None] - iota[None, :])).astype(jnp.bfloat16)
        return jnp.einsum("px,pxc->pc", Wx, s1,
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(chunk_fn, (x, y, tq))
    return out.reshape(N, Hg, Wg, C)


@_functools.partial(jax.custom_vjp, nondiff_argnums=())
def _texture_int8_vjp(texture_coordinates, texture_maps):
    return texture_mapping_int8(texture_coordinates, texture_maps)


def _texture_int8_fwd(texture_coordinates, texture_maps):
    return (_texture_int8_vjp(texture_coordinates, texture_maps),
            (texture_coordinates, texture_maps))


def _texture_int8_bwd(res, g):
    uv, tex = res
    _, vjp = jax.vjp(texture_mapping_mxu, uv, tex)
    return vjp(g)


_texture_int8_vjp.defvjp(_texture_int8_fwd, _texture_int8_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=())
def _texture_pallas_vjp(texture_coordinates, texture_maps):
    from .pallas.texture_tpu import texture_bilinear_pallas

    return texture_bilinear_pallas(texture_coordinates, texture_maps)


def _texture_pallas_fwd(texture_coordinates, texture_maps):
    return (_texture_pallas_vjp(texture_coordinates, texture_maps),
            (texture_coordinates, texture_maps))


def _texture_pallas_bwd(res, g):
    # backward through the (mathematically identical) XLA MXU formulation —
    # transposed tent matmuls; training images are small so this is cheap
    uv, tex = res
    _, vjp = jax.vjp(texture_mapping_mxu, uv, tex)
    return vjp(g)


_texture_pallas_vjp.defvjp(_texture_pallas_fwd, _texture_pallas_bwd)


def texture_mapping(texture_coordinates, texture_maps, mode: str = "bilinear"):
    """UV-sample texture maps, kaolin ``texture_mapping`` semantics (reference
    networks.py:305): uv in [0,1]^2, v=0 at the *bottom* of the texture image.

    texture_coordinates: (B, H, W, 2); texture_maps: (B, Ht, Wt, C) NHWC.
    Returns (B, H, W, C).

    On TPU at large pixel counts the bilinear path runs
    :func:`texture_mapping_mxu` (tent-weight matmuls with exact-tile
    operands).  The fused Pallas variant (ops/pallas/texture_tpu.py) is
    selectable via MAGICMIRROR_TEX_PALLAS=1 but measured SLOWER on v5e
    (706 vs 1405 fps end-to-end at 256^2 b32): per-tile (512,512)x(512,768)
    matmuls under a 4096-step grid pipeline worse than XLA's single big
    contraction, and the in-kernel weight generation doesn't overlap the
    MXU enough.  Elsewhere a quad-packed single gather (one gather of 4C
    values per pixel instead of four).
    """
    P = texture_coordinates.shape[1] * texture_coordinates.shape[2]
    if mode == "bilinear" and jax.default_backend() == "tpu" and P >= 16384:
        if P % 512 == 0 and _TEX_PALLAS:
            return _texture_pallas_vjp(texture_coordinates, texture_maps)
        if _TEX_INT8:
            return _texture_int8_vjp(texture_coordinates, texture_maps)
        return texture_mapping_mxu(texture_coordinates, texture_maps)
    uv = jnp.clip(texture_coordinates, 0.0, 1.0)
    grid_x = uv[..., 0] * 2.0 - 1.0
    grid_y = -(uv[..., 1] * 2.0 - 1.0)  # reversed v-coordinate
    if mode != "bilinear":
        grid = jnp.stack([grid_x, grid_y], axis=-1)
        return grid_sample(texture_maps, grid, mode=mode,
                           padding_mode="zeros", align_corners=False)

    N, Ht, Wt, C = texture_maps.shape
    Hg, Wg = uv.shape[1], uv.shape[2]
    x = _unnormalize(grid_x.reshape(N, -1), Wt, False)
    y = _unnormalize(grid_y.reshape(N, -1), Ht, False)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # zero-pad the texture one texel on every side: every 2x2 tap window of
    # any x0 in [-1, Wt-1] is then in-bounds (out-of-range taps read the zero
    # ring — exactly 'zeros' padding semantics)
    tp = jnp.pad(texture_maps, ((0, 0), (1, 1), (1, 1), (0, 0)))
    t00 = tp[:, :-1, :-1]
    t01 = tp[:, :-1, 1:]
    t10 = tp[:, 1:, :-1]
    t11 = tp[:, 1:, 1:]
    quad = jnp.concatenate([t00, t01, t10, t11], axis=-1)
    quad = quad.reshape(N, (Ht + 1) * (Wt + 1), 4 * C)

    x0c = jnp.clip(x0i, -1, Wt - 1) + 1
    y0c = jnp.clip(y0i, -1, Ht - 1) + 1
    g = jnp.take_along_axis(quad, (y0c * (Wt + 1) + x0c)[..., None], axis=1)
    g = g.reshape(N, -1, 4, C)
    out = (g[:, :, 0] * (1 - wx) * (1 - wy)
           + g[:, :, 1] * wx * (1 - wy)
           + g[:, :, 2] * (1 - wx) * wy
           + g[:, :, 3] * wx * wy)
    return out.reshape(N, Hg, Wg, C)
