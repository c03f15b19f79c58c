"""Discriminators (reference networks.py:22-144) in NHWC Flax.

``Discriminator`` is the 15-conv norm-free WGAN patch critic
(reference networks.py:87-133); ``MSDiscriminator`` the 3-scale LSGAN critic
(reference networks.py:22-74).  Both use LeakyReLU(0.2) throughout and a
near-zero-init final 1x1 head (reference network/utils.py:20-26).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv, Dense, classifier_init, kaiming_init, leaky_relu


class Discriminator(nn.Module):
    """WGAN critic: mean-pooled scalar output, no normalization."""
    nc: int = 3
    nf: int = 16
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        nf = self.nf
        # (features, kernel, stride)
        spec = [
            (nf, 1, 1), (nf, 3, 1), (nf * 2, 3, 2),
            (nf * 2, 3, 1), (nf * 3, 3, 2),
            (nf * 3, 3, 1), (nf * 4, 3, 2),
            (nf * 4, 3, 1), (nf * 4, 3, 2),
            (nf * 4, 3, 1), (nf * 4, 3, 2),
            (nf * 4, 3, 1), (nf * 3, 3, 2),
            (nf * 2, 1, 1),
        ]
        for f, k, s in spec:
            x = Conv(f, (k, k), strides=(s, s), padding=k // 2,
                        use_bias=self.use_bias, kernel_init=kaiming_init)(x)
            x = leaky_relu(x)
        x = Conv(1, (1, 1), use_bias=self.use_bias,
                    kernel_init=classifier_init)(x)
        return x.mean(axis=(1, 2))  # (B, 1)


class _ScaleCritic(nn.Module):
    nc: int = 4
    nf: int = 32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        nf = self.nf
        spec = [
            (nf // 2, 1, 1), (nf // 2, 3, 1),
            (nf, 3, 2), (nf, 3, 1),
            (nf, 3, 2), (nf, 3, 1),
            (nf * 2, 3, 2), (nf * 2, 3, 1),
            (nf * 2, 3, 2), (nf * 2, 1, 1),
        ]
        for f, k, s in spec:
            x = Conv(f, (k, k), strides=(s, s), padding=k // 2,
                        use_bias=self.use_bias, kernel_init=kaiming_init)(x)
            x = leaky_relu(x)
        return Conv(1, (1, 1), use_bias=self.use_bias,
                       kernel_init=classifier_init)(x)


class MSDiscriminator(nn.Module):
    """3-scale LSGAN critic with avg-pool downsampling between scales."""
    nc: int = 4
    nf: int = 32
    use_bias: bool = True
    num_scales: int = 3

    @nn.compact
    def __call__(self, x):
        outputs = []
        for i in range(self.num_scales):
            outputs.append(_ScaleCritic(self.nc, self.nf, self.use_bias,
                                        name=f"scale{i}")(x))
            if i < self.num_scales - 1:
                x = nn.avg_pool(x, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)),
                                count_include_pad=False)
        return outputs


class LandmarkConsistency(nn.Module):
    """Per-face landmark-identity classifier (reference networks.py:496-530):
    sample image features at projected face centers, classify face identity,
    CE masked by visibility."""
    num_landmarks: int = 1280
    dim_feat: int = 256
    num_samples: int = 64

    @nn.compact
    def __call__(self, img_feat, landmark_2d, visible, sample_idx):
        """img_feat (B,H,W,C); landmark_2d (B,V,2) in [-1,1]; visible (B,V);
        sample_idx (num_samples,) precomputed landmark subset."""
        from ..ops.sampling import grid_sample

        B = landmark_2d.shape[0]
        grid = landmark_2d[:, None, :, :]  # (B, 1, V, 2)
        feat = grid_sample(img_feat, grid, mode="bilinear",
                           padding_mode="zeros")[:, 0]  # (B, V, C)
        feat = feat[:, sample_idx]  # (B, S, C)
        h = Dense(1024, kernel_init=kaiming_init)(feat)
        h = nn.BatchNorm(use_running_average=False)(h.reshape(-1, 1024)).reshape(
            B, -1, 1024)
        h = nn.relu(h)
        logits = Dense(self.num_landmarks, kernel_init=classifier_init)(h)
        labels = jnp.broadcast_to(sample_idx[None], (B, sample_idx.shape[0]))
        logp = nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        vis = visible[:, sample_idx].astype(jnp.float32)
        return jnp.sum(ce * vis) / (jnp.sum(vis) + 1e-8)
