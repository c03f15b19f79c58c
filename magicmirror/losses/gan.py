"""GAN objectives: WGAN-GP and multi-scale LSGAN (reference trainer.py:396-411,
432-438; gradient penalties reference smr_utils.py:314-360).

Discriminators are passed as pure callables ``d_fn(x) -> logits`` (or a list of
per-scale logits for the multi-scale LSGAN discriminator); images are NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gradient_penalty(d_fn, real, fake, rng):
    """WGAN-GP penalty on random interpolates (reference smr_utils.py:340-360)."""
    alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), dtype=real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    def d_sum(x):
        out = d_fn(x)
        if isinstance(out, (list, tuple)):
            out = sum(jnp.sum(o) for o in out)
        else:
            out = jnp.sum(out)
        return out

    grads = jax.grad(d_sum)(interp)
    grads = grads.reshape(grads.shape[0], -1)
    gnorm = jnp.sqrt(jnp.sum(grads * grads, axis=1) + 1e-12)
    return jnp.mean((gnorm - 1.0) ** 2)


def gradient_penalty_list(d_fn, real, fake, rng):
    """Per-scale GP for the multi-scale discriminator
    (reference smr_utils.py:314-338): sum of GPs of each scale output."""
    alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), dtype=real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake
    outs = d_fn(interp)
    total = 0.0
    for i in range(len(outs)):
        def d_scale(x, i=i):
            return jnp.sum(d_fn(x)[i])

        grads = jax.grad(d_scale)(interp)
        grads = grads.reshape(grads.shape[0], -1)
        gnorm = jnp.sqrt(jnp.sum(grads * grads, axis=1) + 1e-12)
        total = total + jnp.mean((gnorm - 1.0) ** 2)
    return total


def d_loss_wgan(out_real, out_fake1, out_fake2, gp, lambda_gan, ganw, gan_reg):
    """Discriminator WGAN loss (reference trainer.py:396-403)."""
    lossD_real = lambda_gan * jnp.mean(out_real)
    lossD_fake = lambda_gan * (jnp.mean(out_fake1) + ganw * jnp.mean(out_fake2)) / (1.0 + ganw)
    lossD_gp = gan_reg * lambda_gan * gp
    return lossD_fake - lossD_real + lossD_gp, lossD_real, lossD_fake, lossD_gp


def d_loss_lsgan(outs_real, outs_fake1, outs_fake2, gp, lambda_gan, ganw, gan_reg):
    """Multi-scale LSGAN D loss (reference trainer.py:404-411)."""
    lossD_real = 0.0
    lossD_fake = 0.0
    for o_r, o_f1, o_f2 in zip(outs_real, outs_fake1, outs_fake2):
        lossD_real += lambda_gan * jnp.mean((o_r - 1.0) ** 2)
        lossD_fake += lambda_gan * (
            jnp.mean(o_f1 ** 2) + ganw * jnp.mean(o_f2 ** 2)
        ) / (1.0 + ganw)
    lossD_gp = gan_reg * lambda_gan * gp
    return lossD_fake + lossD_real + lossD_gp, lossD_real, lossD_fake, lossD_gp


def g_loss_wgan(out_fake1, out_fake2, lambda_gan, ganw):
    """Generator WGAN loss (reference trainer.py:432-434)."""
    return lambda_gan * (-jnp.mean(out_fake1) - ganw * jnp.mean(out_fake2)) / (1.0 + ganw)


def g_loss_lsgan(outs_fake1, outs_fake2, lambda_gan, ganw):
    """Generator multi-scale LSGAN loss (reference trainer.py:435-438)."""
    loss = 0.0
    for o1, o2 in zip(outs_fake1, outs_fake2):
        loss += lambda_gan * (
            jnp.mean((o1 - 1.0) ** 2) + ganw * jnp.mean((o2 - 1.0) ** 2)
        ) / (1.0 + ganw)
    return loss
