"""4-channel backbone zoo in Flax (reference network/model_res.py:614-805).

All backbones take RGBA NHWC input normalized with ImageNet stats (mask
channel centered to [-0.5, 0.5], reference model_res.py:16-20).

Pretrained ImageNet weights (torchvision/timm in the reference) are not
available in this offline TPU environment; architectures are faithful and the
from-scratch 'none' backbone is the documented parity mode.  A converter for
externally supplied torch state_dicts lives in
magicmirror/models/convert_torch.py.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Conv,
    Dense,
    BatchNorm,
    ChannelAttention,
    Conv2dBlock,
    ResBlock,
    ResBlockHalf,
    ResBlocks,
    kaiming_init,
    upsample2x,
)

IMAGENET_MEAN_4C = jnp.array([0.485, 0.456, 0.406, 0.5])
IMAGENET_STD_4C = jnp.array([0.229, 0.224, 0.225, 1.0])


def normalize_batch_4c(x):
    """reference model_res.py:16-20 (NHWC)."""
    return (x - IMAGENET_MEAN_4C) / IMAGENET_STD_4C


class Base4C(nn.Module):
    """The 'none' 12-resblock custom backbone (reference model_res.py:614-636).
    Output: x4 + x5 at 1/16 resolution, 288 channels."""
    nc: int = 4
    nk: int = 5
    norm: str = "bn"
    coordconv: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2dBlock(36, self.nk, 2, self.nk // 2,
                        coordconv=self.coordconv)(x, train=train)
        x = ResBlockHalf(36, norm=self.norm)(x, train=train)
        x = ResBlocks(1, 72, norm=self.norm)(x, train=train)
        x = ResBlockHalf(72, norm=self.norm)(x, train=train)
        x = ResBlocks(3, 144, norm=self.norm)(x, train=train)
        x = ResBlockHalf(144, norm=self.norm)(x, train=train)
        x4 = ResBlocks(3, 288, norm=self.norm)(x, train=train)
        x5 = ResBlocks(3, 288, norm=self.norm)(x4, train=train)
        return x4 + x5


class UNet4C(nn.Module):
    """UNet-from-scratch backbone (reference model_res.py:638-685); output 32
    channels at 1/4 resolution."""
    nc: int = 4
    nk: int = 5
    norm: str = "bn"
    coordconv: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = self.norm
        x = Conv2dBlock(32, self.nk, 2, self.nk // 2,
                        coordconv=self.coordconv)(x, train=train)
        x = ResBlockHalf(32, norm=n)(x, train=train)
        x2 = ResBlock(64, norm=n)(x, train=train)
        x = ResBlockHalf(64, norm=n)(x2, train=train)
        for _ in range(3):
            x = ResBlock(128, norm=n)(x, train=train)
        x3 = x
        x = ResBlockHalf(128, norm=n)(x3, train=train)
        for _ in range(3):
            x = ResBlock(256, norm=n)(x, train=train)
        x4 = x
        x = ResBlockHalf(256, norm=n)(x4, train=train)
        for _ in range(2):
            x = ResBlock(512, norm=n)(x, train=train)
        x5 = x
        y = Conv2dBlock(256, 3, 1, 1, norm=n,
                        coordconv=self.coordconv)(x5, train=train)
        y = ResBlock(256)(y, train=train)
        y = upsample2x(y)
        y = Conv2dBlock(128, 3, 1, 1, norm=n, coordconv=self.coordconv)(
            jnp.concatenate([y, x4], axis=-1), train=train)
        y = ResBlock(128)(y, train=train)
        y = upsample2x(y)
        y = Conv2dBlock(64, 3, 1, 1, norm=n, coordconv=self.coordconv)(
            jnp.concatenate([y, x3], axis=-1), train=train)
        y = ResBlock(64)(y, train=train)
        y = upsample2x(y)
        y = Conv2dBlock(32, 3, 1, 1, norm="none", activation="none")(
            jnp.concatenate([y, x2], axis=-1), train=train)
        y = ResBlock(32)(y, train=train)
        return y


class BasicBlock(nn.Module):
    """torchvision-style ResNet basic block."""
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        h = Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=kaiming_init)(x)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_init)(h)
        h = BatchNorm(use_running_average=not train)(h)
        if self.downsample:
            identity = Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=kaiming_init)(x)
            identity = BatchNorm(use_running_average=not train)(identity)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        h = Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=kaiming_init)(x)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=kaiming_init)(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = Conv(self.features * 4, (1, 1), use_bias=False,
                    kernel_init=kaiming_init)(h)
        h = BatchNorm(use_running_average=not train)(h)
        if self.downsample:
            identity = Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=kaiming_init)(x)
            identity = BatchNorm(use_running_average=not train)(identity)
        return nn.relu(h + identity)


_RESNET_SPECS = {
    "res18": (BasicBlock, (2, 2, 2, 2), 512),
    "res34": (BasicBlock, (3, 4, 6, 3), 512),
    "res50": (Bottleneck, (3, 4, 6, 3), 2048),
}


class Resnet4C(nn.Module):
    """ResNet with a 4-channel stem and optional stride-1 layer4
    (reference model_res.py:688-734)."""
    arch: str = "res34"
    stride: int = 1  # layer4 stride (1 = high-res feature map, the default)
    return_pyramid: bool = False  # (x2..x5) multi-scale, for TextureEncoder

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_cls, layers, _ = _RESNET_SPECS[self.arch]
        h = Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=kaiming_init, name="conv1")(x)
        h = BatchNorm(use_running_average=not train, name="bn1")(h)
        x1 = nn.relu(h)
        h = nn.max_pool(x1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        widths = (64, 128, 256, 512)
        for li, (n_blocks, width) in enumerate(zip(layers, widths)):
            first_stride = 1 if li == 0 else 2
            if li == 3 and self.stride == 1:
                first_stride = 1
            for bi in range(n_blocks):
                stride = first_stride if bi == 0 else 1
                need_ds = bi == 0 and (
                    stride != 1 or li > 0 or block_cls is Bottleneck)
                h = block_cls(width, stride=stride, downsample=need_ds,
                              name=f"layer{li + 1}_{bi}")(h, train=train)
            feats.append(h)
        if self.return_pyramid:
            return (x1, *feats)
        return feats[-1]


class HRNetStem4C(nn.Module):
    """A compact HRNet-small-flavored multi-resolution backbone standing in
    for timm 'hrnet_w18_small_v2' (reference model_res.py:775-805): parallel
    high/low-res streams with fusion, a 2048-d head, and the reference's
    channel-attention gate.  Weight-level parity with timm is impossible
    offline; feature geometry (1/32 map, 2048 ch) matches."""
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = True):
        def conv_bn(h, f, s, name):
            h = Conv(f, (3, 3), strides=(s, s), padding=1, use_bias=False,
                        kernel_init=kaiming_init, name=name + "_conv")(h)
            h = BatchNorm(use_running_average=not train, name=name + "_bn")(h)
            return nn.relu(h)

        h = conv_bn(x, 64, 2, "stem1")
        h = conv_bn(h, 64, 2, "stem2")
        # two-branch stage
        hi = conv_bn(h, 18, 1, "hi0")
        lo = conv_bn(h, 36, 2, "lo0")
        for i in range(2):
            hi = BasicBlock(18, name=f"hi_blk{i}")(hi, train=train)
            lo = BasicBlock(36, name=f"lo_blk{i}")(lo, train=train)
            # fuse
            lo2hi = upsample2x(Conv(18, (1, 1), use_bias=False,
                                       kernel_init=kaiming_init,
                                       name=f"l2h{i}")(lo))
            hi2lo = Conv(36, (3, 3), strides=(2, 2), padding=1,
                            use_bias=False, kernel_init=kaiming_init,
                            name=f"h2l{i}")(hi)
            hi, lo = nn.relu(hi + lo2hi), nn.relu(lo + hi2lo)
        h = conv_bn(lo, 128, 2, "down1")
        h = BasicBlock(128, name="tail0")(h, train=train)
        h = conv_bn(h, 512, 2, "down2")
        h = BasicBlock(512, name="tail1")(h, train=train)
        h = Conv(2048, (1, 1), use_bias=False, kernel_init=kaiming_init,
                    name="head")(h)
        h = BatchNorm(use_running_average=not train, name="head_bn")(h)
        h = nn.relu(h)
        gate = ChannelAttention(2048, name="ca")(h)
        return h * gate


BACKBONE_DIMS = {
    "none": 288,
    "unet": 32,
    "res18": 512,
    "res34": 512,
    "res50": 2048,
    "hr18": 2048,
    "hr18sv2": 2048,
    "hr18sv1": 2048,
    "densenet121": 1024,
    "densenet161": 2208,
    "swin": 1024,
}


def make_backbone(pretrain: str, nc: int, nk: int, norm: str, coordconv: bool):
    """Backbone factory mirroring the reference's dispatch
    (reference model_res.py:118-140, 228-255: substring matching on the
    --pretrains value; 'dense' -> Densenet_4C, 'swin' -> Swin_4C,
    'hr18*' -> HRnet_4C)."""
    if pretrain == "none":
        return Base4C(nc=nc, nk=nk, norm=norm, coordconv=coordconv), 288
    if pretrain == "unet":
        return UNet4C(nc=nc, nk=nk, norm=norm, coordconv=coordconv), 32
    if pretrain in ("res18", "res34"):
        return Resnet4C(arch=pretrain), 512
    if "res50" in pretrain or "rex50" in pretrain:
        return Resnet4C(arch="res50"), 2048
    if "dense" in pretrain:
        from .backbones_zoo import DenseNet4C

        arch = "densenet161" if pretrain == "densenet161" else "densenet121"
        return DenseNet4C(arch=arch), BACKBONE_DIMS.get(arch, 1024)
    if "swin" in pretrain:
        from .swin import SwinV2Base4C

        return SwinV2Base4C(), 1024
    if "hr18" in pretrain:
        from .backbones_zoo import HRNetW18SmallV2_4C

        # timm-faithful hrnet_w18_small_v2 (converter-compatible); the
        # round-1 HRNetStem4C stand-in remains importable for old ckpts
        return HRNetW18SmallV2_4C(), 2048
    raise ValueError(f"unknown backbone: {pretrain}")
