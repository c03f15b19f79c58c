"""The five attribute encoders (reference network/model_res.py:84-612) in Flax.

All are NHWC; images arrive as (B, H, W, 4) RGBA in [0,1].  Dropout needs an
'dropout' rng when train=True.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sampling import grid_sample
from .backbones import make_backbone, normalize_batch_4c
from .blocks import (
    Conv,
    Dense,
    ASPP,
    BatchNorm,
    Conv2dBlock,
    LinearBlock,
    MMPool,
    ResBlock,
    ResBlocks,
    classifier_init,
    kaiming_init,
    leaky_relu,
    upsample2x,
)


def _sample_at_template(feat, template_xy, align_corners: bool):
    """Sample backbone features at the template's (x, y) locations
    (reference model_res.py:196-200, 317-321).

    feat: (B, Hf, Wf, C); template_xy: (V, 2) in [-1,1] → (B, V, 1, C)."""
    B = feat.shape[0]
    V = template_xy.shape[0]
    grid = jnp.broadcast_to(template_xy[None, :, None, :], (B, V, 1, 2))
    return grid_sample(feat, grid, mode="bilinear", padding_mode="zeros",
                       align_corners=align_corners)


class CameraEncoder(nn.Module):
    """Camera pose heads (reference model_res.py:103-219): distance+elevation
    via range-squashed sigmoid, azimuth via atan2 of a 2-vector, xy bias via
    tanh; conditioned on global MMPool features + template-local features."""
    nc: int = 4
    nk: int = 5
    azi_scope: float = 360.0
    elev_range: str = "0~30"
    dist_range: str = "2~7"
    droprate: float = 0.0
    coordconv: bool = False
    norm: str = "bn"
    ratio: float = 1.0
    pretrain: str = "none"
    nolpl: bool = False

    def setup(self):
        self.backbone, self.backbone_dim = make_backbone(
            self.pretrain, self.nc, self.nk, self.norm, self.coordconv)
        self.avgpool1 = MMPool((2, 2))
        self.avgpool2 = MMPool((2, 2))
        lo, hi = self.elev_range.split("~")
        self.elev_min, self.elev_max = float(lo), float(hi)
        lo, hi = self.dist_range.split("~")
        self.dist_min, self.dist_max = float(lo), float(hi)

        self.head_dist = self._head("dist")
        self.head_azim = self._head("azim")
        self.head_bias = self._head("bias")

    def _head(self, name):
        return [
            LinearBlock(128, relu=False, name=f"{name}_lb"),
            nn.Dropout(self.droprate, name=f"{name}_drop"),
            Dense(2, kernel_init=classifier_init, name=f"{name}_out"),
        ]

    @staticmethod
    def atan2_deg(y, x):
        """reference model_res.py:182-186: sign(y) * acos(x/r) in degrees."""
        r = jnp.sqrt(x ** 2 + y ** 2 + 1e-12) + 1e-6
        u = jnp.clip(x / r, -1.0 + 1e-6, 1.0 - 1e-6)  # |acos'| <= ~700
        return jnp.sign(y) * jnp.arccos(u) * 180.0 / math.pi

    def __call__(self, x, template, train: bool = True):
        x = normalize_batch_4c(x)
        x = self.backbone(x, train=train)
        if self.nolpl:
            x = self.avgpool1(x)
        else:
            local = _sample_at_template(x, template[:, :2], align_corners=False)
            x = jnp.concatenate(
                [self.avgpool1(x), self.avgpool2(local)], axis=-1)
        B = x.shape[0]
        x = x.reshape(B, -1)

        def run_head(head, h):
            h = head[0](h, train=train)
            h = head[1](h, deterministic=not train)
            return head[2](h)

        dist_out = run_head(self.head_dist, x)
        azim_out = run_head(self.head_azim, x)
        bias_out = run_head(self.head_bias, x)

        distances = self.dist_min + nn.sigmoid(dist_out[:, 0]) * (
            self.dist_max - self.dist_min)
        elevations = self.elev_min + nn.sigmoid(dist_out[:, 1]) * (
            self.elev_max - self.elev_min)
        azimuths = -self.atan2_deg(azim_out[:, 1], azim_out[:, 0]) / 360.0 * self.azi_scope
        biases = jnp.tanh(bias_out)
        return azimuths, elevations, distances, biases


class ShapeEncoder(nn.Module):
    """Per-vertex deformation head (reference model_res.py:222-338): fuse
    template-local, global, and Laplacian-neighborhood features per vertex, a
    1x1 Conv1d MLP, then a full (3V, 3V) linear; offsets bounded by 0.5*tanh
    and zero-meaned."""
    nc: int = 4
    nk: int = 5
    num_vertices: int = 642
    pretrain: str = "none"
    droprate: float = 0.0
    coordconv: bool = False
    norm: str = "bn"
    nolpl: bool = False

    def setup(self):
        self.backbone, self.backbone_dim = make_backbone(
            self.pretrain, self.nc, self.nk, self.norm, self.coordconv)
        self.mmpool = MMPool((1, 1))
        if self.nolpl:
            self.bn = BatchNorm()
            self.linear3 = Dense(self.num_vertices * 3,
                                    kernel_init=classifier_init)
        else:
            self.conv1 = Dense(256, kernel_init=kaiming_init)
            self.bn1 = BatchNorm()
            self.drop1 = nn.Dropout(self.droprate)
            self.conv2 = Dense(3, kernel_init=kaiming_init)
            self.bn2 = BatchNorm()
            self.linear3 = Dense(self.num_vertices * 3,
                                    kernel_init=classifier_init)

    def __call__(self, x, template, lpl, train: bool = True):
        B = x.shape[0]
        V = self.num_vertices
        x = normalize_batch_4c(x)
        x = self.backbone(x, train=train)
        if self.nolpl:
            h = self.mmpool(x).reshape(B, -1)
            h = self.bn(h, use_running_average=not train)
            delta = self.linear3(h)
        else:
            local = _sample_at_template(x, template[:, :2], align_corners=True)
            local = local[:, :, 0, :]  # (B, V, C)
            glob = self.mmpool(x).reshape(B, 1, -1)
            glob = jnp.broadcast_to(glob, (B, V, glob.shape[-1]))
            neighbor_diff = jnp.einsum("bvc,vw->bwc", local, lpl)
            pos = jnp.broadcast_to(template[None], (B, V, 3))
            h = jnp.concatenate([local, glob, neighbor_diff, pos], axis=-1)
            # 1x1 Conv1d over vertices == Dense on the channel axis; the BN1d
            # normalizes per channel over (batch, vertices)
            h = self.conv1(h)
            h = self.bn1(h.reshape(B * V, -1), use_running_average=not train
                         ).reshape(B, V, -1)
            h = leaky_relu(h)
            h = self.drop1(h, deterministic=not train)
            h = self.conv2(h)
            h = self.bn2(h.reshape(B * V, -1), use_running_average=not train
                         ).reshape(B, V, 3)
            delta = self.linear3(h.reshape(B, V * 3))
        delta = 0.5 * jnp.tanh(delta)
        delta = delta.reshape(B, V, 3)
        delta = delta - jnp.mean(delta, axis=1, keepdims=True)
        return delta


class LightEncoder(nn.Module):
    """9-coefficient SH light head (reference model_res.py:341-397); ambient
    coefficient biased to 3.0."""
    nc: int = 4
    nk: int = 5
    droprate: float = 0.0
    coordconv: bool = False
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = True):
        B = x.shape[0]
        x = normalize_batch_4c(x)
        widths = (32, 64, 96, 192, 96)
        for i, w in enumerate(widths):
            cc = self.coordconv and i < 2
            x = Conv2dBlock(w, self.nk, 2, self.nk // 2, norm=self.norm,
                            coordconv=cc)(x, train=train)
        x = MMPool((1, 1))(x).reshape(B, -1)
        x = LinearBlock(48, relu=False)(x, train=train)
        if self.droprate > 0:
            x = nn.Dropout(self.droprate)(x, deterministic=not train)
        x = Dense(9, kernel_init=classifier_init)(x)
        lightparam = jnp.tanh(x)
        scale = jnp.array([[0.5, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]])
        bias = jnp.array([[3.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
        return lightparam * scale + bias


class BackgroundEncoder(nn.Module):
    """Masked-background inpainting head (reference model_res.py:84-101)."""
    nc: int = 4
    droprate: float = 0.0
    coordconv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        img = x[..., :3]
        mask = x[..., 3:4]
        bg = img * (1.0 - mask)
        h = Conv2dBlock(32, 3, 2, 1, norm="none", activation="none")(bg, train=train)
        h = ResBlocks(3, 32, norm="none")(h, train=train)
        h = upsample2x(h)
        h = nn.Dropout(self.droprate / 2)(h, deterministic=not train)
        h = Conv2dBlock(3, 3, 1, 1, norm="none", activation="none")(h, train=train)
        return nn.sigmoid(h)


class BiFPN(nn.Module):
    """Bidirectional FPN over a 4-level pyramid (reference model_res.py:436-483)."""
    outdim: int
    norm: str = "bn"
    down: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        x5, x4, x3, x2 = inputs
        d = self.outdim
        t4 = upsample2x(Conv2dBlock(d // 2, 3, 1, 1, norm=self.norm)(x5, train=train)) + 0.2 * x4
        t3 = upsample2x(Conv2dBlock(d // 4, 3, 1, 1, norm=self.norm)(t4, train=train)) + 0.2 * x3
        t2 = upsample2x(Conv2dBlock(d // 8, 3, 1, 1, norm=self.norm)(t3, train=train)) + 0.2 * x2
        if self.down:
            b2 = x2 + 0.2 * Conv2dBlock(d // 8, 3, 1, 1, norm=self.norm)(t2, train=train)
            b3 = x3 + 0.2 * t3 + 0.2 * Conv2dBlock(d // 4, 3, 2, 1, norm=self.norm)(b2, train=train)
            b4 = x4 + 0.2 * t4 + 0.2 * Conv2dBlock(d // 2, 3, 2, 1, norm=self.norm)(b3, train=train)
            b5 = x5 + 0.2 * Conv2dBlock(d, 3, 2, 1, norm=self.norm)(b4, train=train)
            return [b5, b4, b3, b2]
        return t2


class TextureBiFPN(nn.Module):
    """3x BiFPN decoder → 2-channel texture flow in [-1,1]
    (reference model_res.py:485-507)."""
    outdim: int
    droprate: float = 0.0
    norm: str = "bn"
    final_tanh: bool = True

    @nn.compact
    def __call__(self, x5, x4, x3, x2, train: bool = True):
        d = self.outdim
        p = BiFPN(d, norm=self.norm, down=True)([x5, x4, x3, x2], train=train)
        p = BiFPN(d, norm=self.norm, down=True)(p, train=train)
        t2 = BiFPN(d, norm=self.norm, down=False)(p, train=train)
        h = Conv2dBlock(d // 16, 3, 1, 1, norm=self.norm)(t2, train=train)
        h = ASPP(d // 16)(h)
        h = upsample2x(h)
        h = Conv2dBlock(d // 32, 3, 1, 1, norm=self.norm)(h, train=train)
        h = ASPP(d // 32)(h)
        h = upsample2x(h)
        if self.droprate > 0:
            h = nn.Dropout(self.droprate / 2)(h, deterministic=not train)
        h = Conv2dBlock(2, 5, 1, 2, norm="none", activation="none",
                        padding_mode="reflect")(h, train=train)
        if self.final_tanh:
            h = jnp.clip(h, -1.0, 1.0)  # Hardtanh
        return h


class TextureEncoder(nn.Module):
    """Texture-flow encoder (reference model_res.py:509-612): 5-stage pyramid
    → TextureBiFPN → 2ch flow → bicubic-sample the input image → optional
    makeup refinement → vertical concat with the flipped map."""
    nc: int = 4
    nf: int = 32
    nk: int = 5
    num_vertices: int = 642
    pretrain: str = "res34"
    ratio: float = 1.0
    makeup: int = 0
    droprate: float = 0.0
    coordconv: bool = False
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = True):
        img = x[..., :3]
        x = normalize_batch_4c(x)
        if "res" in self.pretrain or "dense" in self.pretrain:
            from .backbones import Resnet4C

            x1, l1, l2, l3, l4 = Resnet4C(arch="res34", stride=2,
                                          return_pyramid=True)(x, train=train)
            x2, x3, x4, x5 = l1, l2, l3, l4
        else:
            h = Conv2dBlock(32, self.nk, 2, 2, norm="bn",
                            coordconv=self.coordconv)(x, train=train)
            from .blocks import ResBlockHalf

            h = ResBlockHalf(32, norm=self.norm)(h, train=train)
            x2 = ResBlocks(1, 64, norm=self.norm)(h, train=train)
            h = ResBlockHalf(64, norm=self.norm)(x2, train=train)
            x3 = ResBlocks(3, 128, norm=self.norm)(h, train=train)
            h = ResBlockHalf(128, norm=self.norm)(x3, train=train)
            x4 = ResBlocks(3, 256, norm=self.norm)(h, train=train)
            h = ResBlockHalf(256, norm=self.norm)(x4, train=train)
            x5 = ResBlocks(2, 512, norm=self.norm)(h, train=train)

        flow = TextureBiFPN(512, droprate=self.droprate, norm=self.norm,
                            final_tanh=(self.makeup != 5))(
            x5, x4, x3, x2, train=train)
        textures = grid_sample(img, flow, mode="bicubic", align_corners=True)

        if self.makeup in (1, 2, 3, 4):
            ref = jnp.concatenate([textures, textures[:, :, ::-1, :]], axis=-1)
            h = Conv2dBlock(32, 5, 1, 2, norm="in", activation="lrelu")(
                ref, train=train)
            if self.makeup == 1:
                h = ResBlock(32, norm="in")(h, train=train)
                h = ResBlock(32, norm="in")(h, train=train)
            elif self.makeup == 2:
                h = ResBlock(32, norm="in")(h, train=train)
                h = ResBlock(32, norm="in")(h, train=train)
                h = nn.Dropout(self.droprate)(h, deterministic=not train)
            else:
                h = nn.Dropout(self.droprate)(h, deterministic=not train)
            h = Conv2dBlock(3, 3, 1, 1, norm="none", activation="none")(
                h, train=train)
            textures = jnp.clip(textures + h, 0.0, 1.0)

        textures_flip = textures[:, ::-1, :, :]
        return jnp.concatenate([textures, textures_flip], axis=1)  # (B,2H,W,3)


class FeatureEncoder(nn.Module):
    """Per-pixel feature map for the landmark-consistency head (the reference
    sketches this as ``feat_enc`` → (B, 256, H/4, W/4), networks.py:631-633,
    but never instantiates it — ``--lambda_lc`` crashes upstream; here the
    path is functional).  4-ch RGBA in, (B, H/4, W/4, 256) NHWC out."""
    nc: int = 4
    nk: int = 5
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = normalize_batch_4c(x)
        x = Conv2dBlock(64, self.nk, 2, self.nk // 2, norm=self.norm)(
            x, train=train)
        x = Conv2dBlock(128, self.nk, 2, self.nk // 2, norm=self.norm)(
            x, train=train)
        x = Conv2dBlock(256, 3, 1, 1, norm=self.norm)(x, train=train)
        return x
