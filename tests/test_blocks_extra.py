"""Coverage for less-traveled blocks: LandmarkConsistency, IBN, LayerNormAll,
ASPP, MMPool, VGG19, AddCoords."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicmirror.models.blocks import (
    ASPP,
    AddCoords2d,
    IBN,
    LayerNormAll,
    MMPool,
    adaptive_pool,
)
from magicmirror.models.discriminators import LandmarkConsistency
from magicmirror.models.vgg import VGG19Features


def _rng():
    return np.random.RandomState(0)


def test_landmark_consistency_loss():
    rs = _rng()
    B, H, W, C, V, S = 2, 16, 16, 8, 20, 6
    lc = LandmarkConsistency(num_landmarks=V, dim_feat=C, num_samples=S)
    feat = jnp.asarray(rs.rand(B, H, W, C).astype(np.float32))
    lm = jnp.asarray(rs.uniform(-1, 1, (B, V, 2)).astype(np.float32))
    vis = jnp.asarray(rs.rand(B, V) > 0.3)
    idx = jnp.asarray(rs.choice(V, S, replace=False))
    variables = lc.init(jax.random.PRNGKey(0), feat, lm, vis, idx)
    loss, _ = lc.apply(variables, feat, lm, vis, idx,
                       mutable=["batch_stats"])
    assert np.isfinite(float(loss))
    assert float(loss) > 0  # CE over V classes at random init ≈ log(V)


def test_ibn_layernorm_aspp():
    rs = _rng()
    x = jnp.asarray(rs.rand(2, 8, 8, 16).astype(np.float32))
    for mod in (IBN(16), LayerNormAll(16), ASPP(16)):
        variables = mod.init(jax.random.PRNGKey(0), x)
        out, _ = mod.apply(variables, x, mutable=["batch_stats"])
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


def test_mmpool_interpolates_max_and_avg():
    rs = _rng()
    x = jnp.asarray(rs.rand(2, 6, 6, 4).astype(np.float32))
    pool = MMPool((1, 1))
    variables = pool.init(jax.random.PRNGKey(0), x)
    out = pool.apply(variables, x)
    mx = adaptive_pool(x, (1, 1), "max")
    av = adaptive_pool(x, (1, 1), "avg")
    # p=0 → sigmoid(0)=0.5 mix
    np.testing.assert_allclose(np.asarray(out), np.asarray(0.5 * mx + 0.5 * av),
                               atol=1e-6)


def test_adaptive_pool_matches_torch():
    import torch
    import torch.nn.functional as TF

    rs = _rng()
    x = rs.rand(2, 7, 5, 3).astype(np.float32)
    ours = adaptive_pool(jnp.asarray(x), (2, 2), "max")
    theirs = TF.adaptive_max_pool2d(
        torch.tensor(x).permute(0, 3, 1, 2), (2, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)
    ours = adaptive_pool(jnp.asarray(x), (2, 2), "avg")
    theirs = TF.adaptive_avg_pool2d(
        torch.tensor(x).permute(0, 3, 1, 2), (2, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def test_vgg19_features_shape():
    rs = _rng()
    x = jnp.asarray(rs.rand(1, 32, 32, 4).astype(np.float32))
    m = VGG19Features()
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 8, 8, 256)


def test_addcoords_appends_ramps():
    x = jnp.zeros((1, 4, 6, 2))
    m = AddCoords2d()
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (1, 4, 6, 4)
    ramps = np.asarray(out[0, :, :, 2:])
    assert ramps.min() == -1.0 and ramps.max() == 1.0
