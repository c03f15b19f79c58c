"""SwinV2-Base backbone in Flax (reference Swin_4C, network/model_res.py:755-772).

Mirrors timm ``swinv2_base_window12to16_192to256`` closely enough that its
ImageNet-22k-ft-1k state_dict converts 1:1: res-post-norm blocks, cosine
attention with a clamped learned logit scale, and the continuous relative
position bias (CPB) MLP over log-spaced coordinates.  4-channel input comes
from ``in_chans=4`` at the patch embed, exactly like the reference's timm
call (model_res.py:758).

TPU-first notes: window partition is pure reshape/transpose (no gather);
attention runs as batched einsum over (windows*B, heads, N, N) with static
window geometry per stage; non-divisible feature maps are zero-padded to the
window grid (timm does the same).  Like timm, when a stage's feature map is
smaller than the target window the window shrinks to the map and shifting is
disabled (``_calc_window_shift``).

Stochastic depth (the reference passes drop_path_rate=0.2) is implemented
with the 'droppath' rng collection and is active only when a rate is set AND
``train=True``; with no rng it degrades to identity (rate 0).
"""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Dense


def LayerNormCF32(name=None):
    """torch-default LayerNorm (eps 1e-5), fp32."""
    return nn.LayerNorm(epsilon=1e-5, name=name)


def _window_partition(x, wh, ww):
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, wh * ww, C)


def _window_reverse(wins, wh, ww, H, W):
    B = wins.shape[0] // ((H // wh) * (W // ww))
    x = wins.reshape(B, H // wh, W // ww, wh, ww, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, -1)


def _rel_coords_table(wh, ww, pwh, pwi):
    """SwinV2 log-spaced relative-coordinate table (2*wh-1, 2*ww-1, 2)."""
    h = np.arange(-(wh - 1), wh, dtype=np.float32)
    w = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(h, w, indexing="ij"), axis=-1)
    table[..., 0] /= max(pwh - 1, 1)
    table[..., 1] /= max(pwi - 1, 1)
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)
    return table


def _rel_position_index(wh, ww):
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += wh - 1
    rel[..., 1] += ww - 1
    rel[..., 0] *= 2 * ww - 1
    return rel.sum(-1)  # (N, N)


class WindowAttentionV2(nn.Module):
    dim: int
    num_heads: int
    window: tuple  # (wh, ww)
    pretrained_window: int

    @nn.compact
    def __call__(self, x, mask=None):
        Bw, N, C = x.shape
        H = self.num_heads
        wh, ww = self.window

        # qkv with bias on q and v only (timm q_bias/v_bias, k zero)
        qkv_w = self.param("qkv_kernel", nn.initializers.lecun_normal(),
                           (C, 3 * C))
        q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
        bias = jnp.concatenate([q_bias, jnp.zeros((C,), q_bias.dtype),
                                v_bias])
        qkv = x @ qkv_w + bias
        qkv = qkv.reshape(Bw, N, 3, H, C // H)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        # cosine attention with learned per-head clamped logit scale
        logit_scale = self.param(
            "logit_scale",
            lambda *_: jnp.full((H, 1, 1), math.log(10.0), jnp.float32))
        qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhnc,bhmc->bhnm", qn, kn)
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(1.0 / 0.01)))
        attn = attn * scale

        # continuous relative position bias: 2-layer MLP on the log-coords
        table = jnp.asarray(_rel_coords_table(
            wh, ww, self.pretrained_window, self.pretrained_window))
        hbias = Dense(512, use_bias=True, name="cpb_fc1")(table)
        hbias = nn.relu(hbias)
        hbias = Dense(H, use_bias=False, name="cpb_fc2")(hbias)
        hbias = hbias.reshape(-1, H)
        idx = jnp.asarray(_rel_position_index(wh, ww).reshape(-1))
        rpb = hbias[idx].reshape(N, N, H).transpose(2, 0, 1)
        attn = attn + 16.0 * jax.nn.sigmoid(rpb)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, H, N, N) + mask[:, None]
            attn = attn.reshape(Bw, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return Dense(C, name="proj")(out)


def _calc_window_shift(target_w, target_s, H, W):
    """timm SwinV2 _calc_window_shift: clamp the window to the feature map
    per axis; no shift along an axis whose map equals its window."""
    wh = H if H <= target_w else target_w
    ww = W if W <= target_w else target_w
    sh = 0 if H <= target_w else target_s
    sw = 0 if W <= target_w else target_s
    return (wh, ww), (sh, sw)


class SwinBlockV2(nn.Module):
    dim: int
    num_heads: int
    input_resolution: tuple
    target_window: int
    target_shift: int
    pretrained_window: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    def _drop_path(self, x, train):
        if self.drop_path <= 0.0 or not train:
            return x
        if not self.has_rng("droppath"):
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("droppath")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
        return x * mask / keep

    @nn.compact
    def __call__(self, x, train: bool = True):
        H, W = self.input_resolution
        B, L, C = x.shape
        (wh, ww), (sh, sw) = _calc_window_shift(
            self.target_window, self.target_shift, H, W)
        x_sp = x.reshape(B, H, W, C)

        pad_h = (-H) % wh
        pad_w = (-W) % ww
        if pad_h or pad_w:
            x_sp = jnp.pad(x_sp, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        if sh or sw:
            shifted = jnp.roll(x_sp, (-sh, -sw), axis=(1, 2))
            # attention mask for the wrapped windows
            img_mask = np.zeros((1, Hp, Wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
                for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
                    img_mask[:, hs, ws, :] = cnt
                    cnt += 1
            mw = _window_partition(jnp.asarray(img_mask), wh, ww)[..., 0]
            mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        else:
            shifted = x_sp
            mask = None

        wins = _window_partition(shifted, wh, ww)
        wins = WindowAttentionV2(self.dim, self.num_heads, (wh, ww),
                                 self.pretrained_window, name="attn")(
            wins, mask)
        shifted = _window_reverse(wins, wh, ww, Hp, Wp)
        if sh or sw:
            shifted = jnp.roll(shifted, (sh, sw), axis=(1, 2))
        if pad_h or pad_w:
            shifted = shifted[:, :H, :W]
        attn_out = shifted.reshape(B, L, C)
        # res-post-norm (SwinV2): x + norm(f(x))
        x = x + self._drop_path(
            LayerNormCF32(name="norm1")(attn_out), train)

        h = Dense(int(C * self.mlp_ratio), name="mlp_fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = Dense(C, name="mlp_fc2")(h)
        x = x + self._drop_path(LayerNormCF32(name="norm2")(h), train)
        return x


class PatchMergingV2(nn.Module):
    """SwinV2 downsample: 2x2 concat -> Linear(4C->2C, no bias) -> norm."""
    out_dim: int

    @nn.compact
    def __call__(self, x, H, W):
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        pad_h, pad_w = H % 2, W % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = Dense(self.out_dim, use_bias=False, name="reduction")(x)
        return LayerNormCF32(name="norm")(x)


class SwinV2Base4C(nn.Module):
    """timm ``swinv2_base_window12to16_192to256`` trunk with in_chans=4.

    __call__(x NHWC RGBA) -> (B, h/32, w/32, 1024) feature map (the
    reference permutes forward_features' (B, L, C) to NCHW at
    model_res.py:769-771; we stay NHWC).
    """
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 16
    pretrained_windows: Sequence[int] = (12, 12, 12, 6)
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, _ = x.shape
        assert H % 4 == 0 and W % 4 == 0, "input must be patch-divisible"
        h = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    name="patch_embed")(x)
        Hp, Wp = H // 4, W // 4
        h = h.reshape(B, Hp * Wp, self.embed_dim)
        h = LayerNormCF32(name="patch_norm")(h)

        total_blocks = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total_blocks)
        bi = 0
        dim = self.embed_dim
        res = (Hp, Wp)
        for si, depth in enumerate(self.depths):
            if si > 0:
                dim *= 2
                h = PatchMergingV2(dim, name=f"stage{si}_downsample")(
                    h, *res)
                res = ((res[0] + 1) // 2, (res[1] + 1) // 2)
            for di in range(depth):
                shift = 0 if di % 2 == 0 else self.window // 2
                h = SwinBlockV2(
                    dim, self.num_heads[si], res, self.window, shift,
                    self.pretrained_windows[si],
                    drop_path=float(dpr[bi]),
                    name=f"stage{si}_block{di}")(h, train=train)
                bi += 1
        h = LayerNormCF32(name="norm")(h)
        return h.reshape(B, res[0], res[1], dim)


SWIN_DIM = 1024
