"""grid_sample parity vs torch.nn.functional.grid_sample (CPU oracle)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from magicmirror.ops.sampling import grid_sample, texture_mapping


def _compare(mode, padding_mode, align_corners, rng, H=7, W=5, Hg=6, Wg=4, atol=1e-4):
    img = rng.rand(2, H, W, 3).astype(np.float32)
    grid = (rng.rand(2, Hg, Wg, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB

    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), mode=mode,
                       padding_mode=padding_mode, align_corners=align_corners)
    theirs = TF.grid_sample(
        torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(grid),
        mode=mode, padding_mode=padding_mode, align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_bilinear_matches_torch(align_corners, padding_mode, rng):
    _compare("bilinear", padding_mode, align_corners, rng)


@pytest.mark.parametrize("align_corners", [True, False])
def test_bicubic_matches_torch(align_corners, rng):
    # in-bounds grid: torch's bicubic boundary handling differs OOB under
    # 'zeros' (it cubically extrapolates clipped taps); the reference only
    # samples bicubic with align_corners=True on in-range flows
    # (reference model_res.py:599)
    img = rng.rand(2, 9, 8, 3).astype(np.float32)
    grid = (rng.rand(2, 5, 6, 2).astype(np.float32) * 1.2 - 0.6)
    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), mode="bicubic",
                       align_corners=align_corners)
    theirs = TF.grid_sample(
        torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(grid),
        mode="bicubic", align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_nearest_matches_torch_inbounds(rng):
    img = rng.rand(1, 6, 6, 2).astype(np.float32)
    grid = (rng.rand(1, 4, 4, 2).astype(np.float32) * 1.6 - 0.8)
    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), mode="nearest")
    theirs = TF.grid_sample(
        torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(grid),
        mode="nearest", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    # rounding ties may differ at exact .5 boundaries; random floats avoid them
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def test_texture_mapping_v_flip(rng):
    """uv v=0 must sample the BOTTOM row (kaolin texture_mapping semantics)."""
    tex = np.zeros((1, 4, 4, 3), np.float32)
    tex[0, -1, :, 0] = 1.0  # bottom row red
    uv = np.full((1, 2, 2, 2), 0.5, np.float32)
    uv[..., 1] = 0.01  # v near 0 → bottom
    out = texture_mapping(jnp.asarray(uv), jnp.asarray(tex))
    assert np.asarray(out)[0, 0, 0, 0] > 0.5


def test_grid_sample_differentiable(rng):
    import jax

    img = jnp.asarray(rng.rand(1, 5, 5, 1).astype(np.float32))
    grid = jnp.asarray((rng.rand(1, 3, 3, 2).astype(np.float32) - 0.5))

    def f(g):
        return jnp.sum(grid_sample(img, g, mode="bilinear") ** 2)

    g = jax.grad(f)(grid)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
