"""DenseNet-4C and HRNet-w18-small-v2-4C backbones in Flax.

Completes the reference backbone zoo (reference network/model_res.py:736-753
Densenet_4C, 775-805 HRnet_4C).  Architectures mirror torchvision densenet121/
161 and timm ``hrnet_w18_small_v2`` closely enough that their ImageNet
state_dicts convert 1:1 (magicmirror/models/convert_torch.py); module names
here are chosen so the converter can address every tensor.

Reference surgeries reproduced:
  * 4-channel stem (conv0/conv1 takes RGBA; converter initializes the alpha
    column to the RGB mean, reference model_res.py:748-751, 791-794),
  * DenseNet ``stride=1``: transition3's avg-pool stride set to 1
    (model_res.py:745-746 — note torch keeps the 2x2 window, so the map
    shrinks by one pixel; we reproduce that quirk),
  * HRNet stem conv1 is a 3x3 (timm), replaced by the 4-channel version,
    plus the reference's ChannelAttention gate on the 2048-d head
    (model_res.py:798-805).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, ChannelAttention, Conv, kaiming_init


# ---------------------------------------------------------------- DenseNet
class DenseLayer(nn.Module):
    growth: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = BatchNorm(use_running_average=not train, name="norm1")(x)
        h = nn.relu(h)
        h = Conv(self.bn_size * self.growth, (1, 1), use_bias=False,
                 kernel_init=kaiming_init, name="conv1")(h)
        h = BatchNorm(use_running_average=not train, name="norm2")(h)
        h = nn.relu(h)
        h = Conv(self.growth, (3, 3), padding=1, use_bias=False,
                 kernel_init=kaiming_init, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseNet4C(nn.Module):
    """torchvision densenet121/161 ``features`` with a 4-channel conv0.

    Output = norm5 output (NO final relu — the reference returns
    ``model.features(x)`` verbatim, model_res.py:752-753)."""
    arch: str = "densenet121"
    stride: int = 1  # 1 => transition3 pool stride 1 (reference default)

    @nn.compact
    def __call__(self, x, train: bool = True):
        init_feats, growth, blocks = {
            "densenet121": (64, 32, (6, 12, 24, 16)),
            "densenet161": (96, 48, (6, 12, 36, 24)),
        }[self.arch]
        h = Conv(init_feats, (7, 7), strides=(2, 2), padding=3,
                 use_bias=False, kernel_init=kaiming_init, name="conv0")(x)
        h = BatchNorm(use_running_average=not train, name="norm0")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for bi, n_layers in enumerate(blocks):
            for li in range(n_layers):
                h = DenseLayer(growth, name=f"denseblock{bi + 1}_l{li + 1}")(
                    h, train=train)
            if bi < 3:
                h = BatchNorm(use_running_average=not train,
                              name=f"transition{bi + 1}_norm")(h)
                h = nn.relu(h)
                h = Conv(h.shape[-1] // 2, (1, 1), use_bias=False,
                         kernel_init=kaiming_init,
                         name=f"transition{bi + 1}_conv")(h)
                s = 1 if (bi == 2 and self.stride == 1) else 2
                h = nn.avg_pool(h, (2, 2), strides=(s, s))
        h = BatchNorm(use_running_average=not train, name="norm5")(h)
        return h


DENSENET_DIMS = {"densenet121": 1024, "densenet161": 2208}


# ------------------------------------------------------------------- HRNet
class HRBasic(nn.Module):
    """timm/torchvision BasicBlock with explicit names for conversion."""
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        h = Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=1, use_bias=False, kernel_init=kaiming_init,
                 name="conv1")(x)
        h = BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = Conv(self.features, (3, 3), padding=1, use_bias=False,
                 kernel_init=kaiming_init, name="conv2")(h)
        h = BatchNorm(use_running_average=not train, name="bn2")(h)
        if self.downsample:
            identity = Conv(self.features, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False, kernel_init=kaiming_init,
                            name="ds_conv")(x)
            identity = BatchNorm(use_running_average=not train,
                                 name="ds_bn")(identity)
        return nn.relu(h + identity)


class HRBottleneck(nn.Module):
    features: int  # planes; output = 4x
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        h = Conv(self.features, (1, 1), use_bias=False,
                 kernel_init=kaiming_init, name="conv1")(x)
        h = BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=1, use_bias=False, kernel_init=kaiming_init,
                 name="conv2")(h)
        h = BatchNorm(use_running_average=not train, name="bn2")(h)
        h = nn.relu(h)
        h = Conv(self.features * 4, (1, 1), use_bias=False,
                 kernel_init=kaiming_init, name="conv3")(h)
        h = BatchNorm(use_running_average=not train, name="bn3")(h)
        if self.downsample:
            identity = Conv(self.features * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False, kernel_init=kaiming_init,
                            name="ds_conv")(x)
            identity = BatchNorm(use_running_average=not train,
                                 name="ds_bn")(identity)
        return nn.relu(h + identity)


def _upsample_nearest(x, factor: int):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch blocks then full fuse."""
    channels: Sequence[int]
    num_blocks: int = 2

    @nn.compact
    def __call__(self, xs, train: bool = True):
        nb = len(self.channels)
        ys = []
        for i, c in enumerate(self.channels):
            h = xs[i]
            for b in range(self.num_blocks):
                h = HRBasic(c, name=f"branch{i}_block{b}")(h, train=train)
            ys.append(h)
        outs = []
        for i, ci in enumerate(self.channels):
            acc = ys[i]
            for j, cj in enumerate(self.channels):
                if j == i:
                    continue
                if j > i:  # lower res -> 1x1 conv + BN + nearest upsample
                    h = Conv(ci, (1, 1), use_bias=False,
                             kernel_init=kaiming_init,
                             name=f"fuse{i}_{j}_conv")(ys[j])
                    h = BatchNorm(use_running_average=not train,
                                  name=f"fuse{i}_{j}_bn")(h)
                    h = _upsample_nearest(h, 2 ** (j - i))
                else:  # higher res -> (i-j) stride-2 3x3 convs
                    h = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = ci if last else cj
                        h = Conv(cout, (3, 3), strides=(2, 2), padding=1,
                                 use_bias=False, kernel_init=kaiming_init,
                                 name=f"fuse{i}_{j}_conv{k}")(h)
                        h = BatchNorm(use_running_average=not train,
                                      name=f"fuse{i}_{j}_bn{k}")(h)
                        if not last:
                            h = nn.relu(h)
                acc = acc + h
            outs.append(nn.relu(acc))
        return outs


class HRNetW18SmallV2_4C(nn.Module):
    """timm ``hrnet_w18_small_v2`` with the reference's 4-channel 3x3 stem
    and ChannelAttention head gate (reference model_res.py:775-805).

    Config (timm): stage1 = 2x Bottleneck(64); branch widths (18, 36, 72,
    144); stage2/3/4 modules = 1/3/2 with 2 BasicBlocks per branch; incre
    head 128/256/512/1024 Bottlenecks, downsample chain, final 1x1 to 2048.
    """
    with_ca: bool = True  # the reference wraps the head in channel attention

    @nn.compact
    def __call__(self, x, train: bool = True):
        widths = (18, 36, 72, 144)
        h = Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                 kernel_init=kaiming_init, name="conv1")(x)
        h = BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                 kernel_init=kaiming_init, name="conv2")(h)
        h = BatchNorm(use_running_average=not train, name="bn2")(h)
        h = nn.relu(h)

        # stage 1: 2 Bottlenecks at 64 planes (256 out)
        h = HRBottleneck(64, downsample=True, name="layer1_0")(h, train=train)
        h = HRBottleneck(64, name="layer1_1")(h, train=train)

        # transition1: 256 -> (18 @ 1x, 36 @ 1/2)
        x0 = Conv(widths[0], (3, 3), padding=1, use_bias=False,
                  kernel_init=kaiming_init, name="transition1_0_conv")(h)
        x0 = BatchNorm(use_running_average=not train,
                       name="transition1_0_bn")(x0)
        x0 = nn.relu(x0)
        x1 = Conv(widths[1], (3, 3), strides=(2, 2), padding=1,
                  use_bias=False, kernel_init=kaiming_init,
                  name="transition1_1_conv")(h)
        x1 = BatchNorm(use_running_average=not train,
                       name="transition1_1_bn")(x1)
        x1 = nn.relu(x1)
        xs = [x0, x1]

        xs = HRModule(widths[:2], name="stage2_m0")(xs, train=train)

        x2 = Conv(widths[2], (3, 3), strides=(2, 2), padding=1,
                  use_bias=False, kernel_init=kaiming_init,
                  name="transition2_2_conv")(xs[-1])
        x2 = BatchNorm(use_running_average=not train,
                       name="transition2_2_bn")(x2)
        xs = xs + [nn.relu(x2)]
        for m in range(3):
            xs = HRModule(widths[:3], name=f"stage3_m{m}")(xs, train=train)

        x3 = Conv(widths[3], (3, 3), strides=(2, 2), padding=1,
                  use_bias=False, kernel_init=kaiming_init,
                  name="transition3_3_conv")(xs[-1])
        x3 = BatchNorm(use_running_average=not train,
                       name="transition3_3_bn")(x3)
        xs = xs + [nn.relu(x3)]
        for m in range(2):
            xs = HRModule(widths, name=f"stage4_m{m}")(xs, train=train)

        # classification head: incre Bottlenecks + downsample chain + final
        head_planes = (32, 64, 128, 256)
        y = HRBottleneck(head_planes[0], downsample=True,
                         name="incre0")(xs[0], train=train)
        for i in range(3):
            yi = HRBottleneck(head_planes[i + 1], downsample=True,
                              name=f"incre{i + 1}")(xs[i + 1], train=train)
            d = Conv(head_planes[i + 1] * 4, (3, 3), strides=(2, 2),
                     padding=1, use_bias=True, kernel_init=kaiming_init,
                     name=f"downsamp{i}_conv")(y)
            d = BatchNorm(use_running_average=not train,
                          name=f"downsamp{i}_bn")(d)
            y = yi + nn.relu(d)
        y = Conv(2048, (1, 1), use_bias=True, kernel_init=kaiming_init,
                 name="final_conv")(y)
        y = BatchNorm(use_running_average=not train, name="final_bn")(y)
        y = nn.relu(y)
        if self.with_ca:
            y = y * ChannelAttention(2048, name="ca")(y)
        return y
