"""Flax building blocks, behavior-parity with reference network/model_res.py
(MMPool 23-44, ResBlocks 807-819, ResBlock 821-845, ResBlock_half 847-873,
AddCoords 875-936, ASPP 939-957, Conv2dBlock 960-1018, IBN 1020-1039,
LayerNorm 1041-1066) re-expressed as idiomatic NHWC Flax modules.

Initialization mirrors reference network/utils.py:6-26: conv/linear weights
kaiming-normal fan-in, BN scale ~ N(1, 0.02), biases 0, classifier heads
~ N(0, 1e-5).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# -------------------------------------------------------------- initializers
kaiming_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
classifier_init = nn.initializers.normal(stddev=1e-5)

# ------------------------------------------------------ mixed-precision policy
# The reference's --fp16 AMP (reference trainer.py:98-99, 271-273) maps to a
# bf16 compute policy on TPU: conv/dense compute in bf16 (fp32 master params,
# flax casts per-op), normalization statistics stay fp32.  Set once before
# building/applying models; the Conv/Dense wrappers below read it.
_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype):
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


def Conv(*args, **kwargs):
    kwargs.setdefault("dtype", compute_dtype())
    return nn.Conv(*args, **kwargs)


def Dense(*args, **kwargs):
    kwargs.setdefault("dtype", compute_dtype())
    return nn.Dense(*args, **kwargs)


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class BatchNorm(nn.BatchNorm):
    """BatchNorm with torch defaults (eps 1e-5, momentum 0.1 → ema 0.9) and the
    reference's N(1, 0.02) scale init."""

    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Callable = bn_scale_init


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


_ACTS = {
    "relu": nn.relu,
    "lrelu": leaky_relu,
    "tanh": jnp.tanh,
    "selu": nn.selu,
    "none": None,
}


def _pad_2d(x, pad: int, mode: str):
    if pad == 0:
        return x
    cfg = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    if mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    return jnp.pad(x, cfg)


class AddCoords2d(nn.Module):
    """CoordConv channel append (reference model_res.py:902-936)."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ys = jnp.linspace(-1.0, 1.0, H, dtype=x.dtype)
        xs = jnp.linspace(-1.0, 1.0, W, dtype=x.dtype)
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        # reference appends (x over H-dim, y over W-dim) transposed maps; the
        # net effect is two orthogonal linear ramps — orientation-equivalent
        grids = jnp.stack([yy, xx], axis=-1)[None]
        grids = jnp.broadcast_to(grids, (B, H, W, 2))
        return jnp.concatenate([x, grids], axis=-1)


class InstanceNorm(nn.Module):
    """InstanceNorm2d; affine matches torch's default (off) unless set."""
    affine: bool = False
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            C = x.shape[-1]
            scale = self.param("scale", bn_scale_init, (C,))
            bias = self.param("bias", nn.initializers.zeros, (C,))
            y = y * scale + bias
        return y


class IBN(nn.Module):
    """Half instance-, half batch-norm (reference model_res.py:1020-1039)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        half = self.features // 2
        a = InstanceNorm(affine=True, name="IN")(x[..., :half])
        b = BatchNorm(use_running_average=not train, name="BN")(x[..., half:])
        return jnp.concatenate([a, b], axis=-1)


class LayerNormAll(nn.Module):
    """Per-sample whole-tensor LayerNorm (reference model_res.py:1041-1066:
    normalizes over ALL non-batch dims, affine per-channel)."""
    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        flat = x.reshape(B, -1)
        mean = flat.mean(axis=1).reshape(B, 1, 1, 1)
        std = flat.std(axis=1).reshape(B, 1, 1, 1)
        y = (x - mean) / (std + self.epsilon)
        gamma = self.param("gamma", nn.initializers.uniform(scale=1.0), (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        return y * gamma + beta


class Conv2dBlock(nn.Module):
    """conv → norm → activation (reference model_res.py:960-1018)."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    norm: str = "none"
    activation: str = "lrelu"
    padding_mode: str = "zeros"
    dilation: int = 1
    coordconv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.coordconv:
            x = AddCoords2d()(x)
        use_bias = self.norm != "bn"
        pad = self.padding * self.dilation if False else self.padding
        x = _pad_2d(x, pad, self.padding_mode)
        x = Conv(
            self.features, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), padding="VALID",
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=use_bias, kernel_init=kaiming_init,
        )(x)
        if self.norm == "bn":
            x = BatchNorm(use_running_average=not train)(x)
        elif self.norm == "in":
            x = InstanceNorm()(x)
        elif self.norm == "ibn":
            x = IBN(self.features)(x, train=train)
        elif self.norm == "ln":
            x = LayerNormAll(self.features)(x)
        elif self.norm in ("none", "sn"):
            pass
        else:
            raise ValueError(f"Unsupported normalization: {self.norm}")
        act = _ACTS[self.activation]
        if act is not None:
            x = act(x)
        return x


class ChannelAttention(nn.Module):
    """Squeeze-excite gate used by ResBlocks/ASPP/HRNet head
    (reference model_res.py:814-816, 946-947, 799-801)."""
    features: int

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = Conv(max(self.features // 16, 1), (1, 1), kernel_init=kaiming_init)(s)
        s = nn.relu(s)
        s = Conv(self.features, (1, 1), kernel_init=kaiming_init)(s)
        return nn.sigmoid(s)


class ResBlock(nn.Module):
    """0.2-residual block (reference model_res.py:821-845)."""
    features: int
    norm: str = "bn"
    activation: str = "lrelu"
    padding_mode: str = "zeros"

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm2 = "bn" if self.norm == "ibn" else self.norm
        h = Conv2dBlock(self.features // 2, 3, 1, 1, norm=self.norm,
                        activation=self.activation,
                        padding_mode=self.padding_mode)(x, train=train)
        h = Conv2dBlock(self.features, 3, 1, 1, norm=norm2, activation="none",
                        padding_mode=self.padding_mode)(h, train=train)
        return 0.2 * x + h


class ResBlockHalf(nn.Module):
    """Stride-2 block concatenated with an avg-pooled residual → 2x channels
    (reference model_res.py:847-873)."""
    features: int  # input channels; output has 2x
    norm: str = "bn"
    activation: str = "lrelu"
    padding_mode: str = "zeros"

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm2 = "bn" if self.norm == "ibn" else self.norm
        h = Conv2dBlock(self.features, 3, 2, 1, norm=self.norm,
                        activation=self.activation,
                        padding_mode=self.padding_mode)(x, train=train)
        h = Conv2dBlock(self.features, 3, 1, 1, norm=norm2, activation="none",
                        padding_mode=self.padding_mode)(h, train=train)
        residual = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                               count_include_pad=True)
        return jnp.concatenate([h, residual], axis=-1)


class ResBlocks(nn.Module):
    """num x ResBlock with a channel-attention residual gate
    (reference model_res.py:807-819)."""
    num: int
    features: int
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = x
        for _ in range(self.num):
            out = ResBlock(self.features, norm=self.norm)(out, train=train)
        gate = ChannelAttention(self.features)(out)
        return x + gate * out


class ASPP(nn.Module):
    """Atrous pyramid with reflect padding + CA gate
    (reference model_res.py:939-957)."""
    features: int

    @nn.compact
    def __call__(self, x):
        q = self.features // 4
        outs = []
        for i, d in enumerate((1, 2, 4, 8)):
            feats = q if i < 3 else self.features - 3 * q
            h = _pad_2d(x, d, "reflect")
            h = Conv(feats, (3, 3), padding="VALID", kernel_dilation=(d, d),
                        use_bias=True, kernel_init=kaiming_init)(h)
            outs.append(h)
        f = jnp.concatenate(outs, axis=-1)
        gate = ChannelAttention(self.features)(f)
        return x + f * gate


class MMPool(nn.Module):
    """Learnable sigmoid mix of adaptive max/avg pooling
    (reference model_res.py:23-44)."""
    shape: Sequence[int] = (1, 1)
    p_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        p = self.param("p", nn.initializers.constant(self.p_init), (1,))
        x_max = adaptive_pool(x, self.shape, "max")
        x_avg = adaptive_pool(x, self.shape, "avg")
        w = nn.sigmoid(p[0])
        return x_max * w + x_avg * (1.0 - w)


def adaptive_pool(x, out_shape, kind: str):
    """Adaptive max/avg pool NHWC → (B, oh, ow, C), torch semantics (bins
    [floor(i*H/oh), ceil((i+1)*H/oh))]."""
    B, H, W, C = x.shape
    oh, ow = out_shape
    rows = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -(-((i + 1) * H) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -(-((j + 1) * W) // ow)
            win = x[:, h0:h1, w0:w1, :]
            if kind == "max":
                cols.append(win.max(axis=(1, 2)))
            else:
                cols.append(win.mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class LinearBlock(nn.Module):
    """Linear + BN1d (+ReLU) (reference model_res.py:173-180)."""
    features: int
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Dense(self.features, kernel_init=kaiming_init)(x)
        x = BatchNorm(use_running_average=not train)(x)
        if self.relu:
            x = nn.relu(x)
        return x


def upsample2x(x):
    """Nearest-neighbor 2x upsample (torch nn.Upsample default)."""
    B, H, W, C = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class AddCoords1d(nn.Module):
    """CoordConv for 1-D sequences: appends one normalized position channel
    (reference model_res.py:875-901; used by the shape head's Conv1d stack
    when coordconv is on, model_res.py:297-299).  Layout here is (B, L, C)
    channels-last."""

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        pos = jnp.linspace(-1.0, 1.0, L, dtype=x.dtype)
        pos = jnp.broadcast_to(pos[None, :, None], (B, L, 1))
        return jnp.concatenate([x, pos], axis=-1)


class TextureFPN(nn.Module):
    """Plain-FPN texture-flow decoder (reference model_res.py:399-434) — the
    alternative to TextureBiFPN the reference keeps selectable at
    model_res.py:548.  Takes the backbone pyramid (x5, x4, x3, x2) and emits
    a hardtanh'd 2-channel flow at 2x the x2 resolution."""
    outdim: int
    droprate: float = 0.0
    coordconv: bool = False
    norm: str = "bn"

    @nn.compact
    def __call__(self, x5, x4, x3, x2, train: bool = True):
        d = self.outdim
        y = Conv2dBlock(d // 2, 3, 1, 1, norm=self.norm,
                        coordconv=self.coordconv, name="up1")(x5, train=train)
        y = upsample2x(y)
        y = jnp.concatenate([y, x4], axis=-1)
        y = Conv2dBlock(d // 4, 3, 1, 1, norm=self.norm,
                        coordconv=self.coordconv, name="up2_conv")(
            y, train=train)
        y = ResBlocks(1, d // 4, name="up2_res")(y, train=train)
        y = upsample2x(y)
        y = jnp.concatenate([y, x3], axis=-1)
        y = Conv2dBlock(d // 8, 3, 1, 1, norm=self.norm, name="up3_conv")(
            y, train=train)
        y = ResBlocks(1, d // 8, name="up3_res")(y, train=train)
        y = upsample2x(y)
        y = jnp.concatenate([y, x2], axis=-1)
        y = Conv2dBlock(d // 8, 3, 1, 1, norm=self.norm, name="up4_conv")(
            y, train=train)
        y = ResBlocks(1, d // 8, name="up4_res")(y, train=train)
        y = upsample2x(y)
        y = ASPP(d // 8, name="up5_aspp")(y)
        y = Conv2dBlock(d // 16, 3, 1, 1, norm=self.norm, name="up5_conv")(
            y, train=train)
        y = ResBlocks(1, d // 16, name="up5_res")(y, train=train)
        y = upsample2x(y)
        if self.droprate > 0:
            y = nn.Dropout(self.droprate / 2, deterministic=not train)(y)
        y = ASPP(d // 16, name="up6_aspp")(y)
        y = Conv2dBlock(2, 5, 1, 2, norm="none", activation="none",
                        padding_mode="reflect", name="up6_conv")(
            y, train=train)
        return jnp.clip(y, -1.0, 1.0)  # nn.Hardtanh
