"""Discriminators (reference networks.py:22-144) in NHWC Flax.

``Discriminator`` is the 15-conv norm-free WGAN patch critic
(reference networks.py:87-133); ``MSDiscriminator`` the 3-scale LSGAN critic
(reference networks.py:22-74).  Both use LeakyReLU(0.2) throughout and a
near-zero-init final 1x1 head (reference network/utils.py:20-26).
"""
from __future__ import annotations

import jax
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


# ------------------------------------------------------- SN variant (opt-in)
def _spectral_sigma(w2d, n_iter: int = 5, eps: float = 1e-12):
    """Largest singular value by power iteration (torch
    ``spectral_norm`` semantics: u/v are detached, gradients flow only
    through sigma = uᵀ W v).  Stateless-per-call with a fixed start vector
    and 5 iterations instead of torch's persistent-u 1-step — same
    Lipschitz-constraint role, no extra state collection to thread through
    the D optimizer (reference network/discriminator.py:13)."""
    rows = w2d.shape[0]
    u = jnp.full((rows,), 1.0 / jnp.sqrt(rows), w2d.dtype)
    for _ in range(n_iter):
        v = w2d.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = w2d @ v
        u = u / (jnp.linalg.norm(u) + eps)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    return u @ (w2d @ v)


class SNConv(nn.Module):
    """4x4 conv with spectral weight normalization (NHWC/HWIO)."""
    features: int
    kernel: int = 4
    stride: int = 2
    pad: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", kaiming_init,
                       (self.kernel, self.kernel, x.shape[-1], self.features))
        # torch reshapes (cout, cin*kh*kw); transpose to match its sigma
        w2d = k.transpose(3, 2, 0, 1).reshape(self.features, -1)
        kn = k / _spectral_sigma(w2d)
        return jax.lax.conv_general_dilated(
            x, kn, (self.stride, self.stride),
            [(self.pad, self.pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d(affine=False): per-sample, per-channel over H, W."""
    m = jnp.mean(x, axis=(1, 2), keepdims=True)
    v = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


class SNDiscriminator(nn.Module):
    """Spectral-norm DCGAN critic (reference network/discriminator.py:5-79):
    4x4/stride-2 SN convs with InstanceNorm + LeakyReLU(0.2), image sizes
    32/64/128 — the reference ships it unused by any recipe; exposed here
    behind ``--sn_dis`` for parity.  Output is the mean of the final patch
    map, matching how the trainer consumes critics."""
    nc: int = 3
    ndf: int = 64
    imsize: int = 128

    @nn.compact
    def __call__(self, x, flip_rng=None):
        assert self.imsize in (32, 64, 128), "imsize must be 32/64/128"
        x = x[..., :self.nc]
        if flip_rng is not None:  # reference hflip=True path
            import jax.random as jrandom
            keep = jrandom.bernoulli(flip_rng, 0.5, (x.shape[0], 1, 1, 1))
            x = jnp.where(keep, x, x[:, :, ::-1, :])
        ndf = self.ndf
        if self.imsize == 128:
            x = leaky_relu(SNConv(ndf // 2)(x))
            x = leaky_relu(_instance_norm(SNConv(ndf)(x)))
            x = leaky_relu(_instance_norm(SNConv(ndf * 2)(x)))
        elif self.imsize == 64:
            x = leaky_relu(SNConv(ndf)(x))
            x = leaky_relu(_instance_norm(SNConv(ndf * 2)(x)))
        else:
            x = leaky_relu(_instance_norm(SNConv(ndf * 2)(x)))
        x = leaky_relu(_instance_norm(SNConv(ndf * 4)(x)))
        x = leaky_relu(_instance_norm(SNConv(ndf * 8)(x)))
        x = SNConv(1, kernel=4, stride=1, pad=0)(x)
        return x.mean(axis=(1, 2))  # (B, 1)
