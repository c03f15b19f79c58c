"""Shape-for-shape encoder/discriminator tests (SURVEY.md §4: shape parity
against the formulas of reference network/model_res.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicmirror.models.attribute_encoder import AttributeEncoder
from magicmirror.models.discriminators import Discriminator, MSDiscriminator
from magicmirror.models.encoders import (
    CameraEncoder,
    LightEncoder,
    ShapeEncoder,
    TextureEncoder,
)

B, H, W, V = 2, 32, 32, 42


@pytest.fixture(scope="module")
def toy():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(B, H, W, 4).astype(np.float32))
    template = jnp.asarray(rs.uniform(-0.9, 0.9, (V, 3)).astype(np.float32))
    lpl = jnp.asarray(rs.uniform(-0.1, 0.1, (V, V)).astype(np.float32))
    return img, template, lpl


def _init_apply(mod, *args, method=None, **kwargs):
    key = jax.random.PRNGKey(0)
    variables = mod.init({"params": key, "dropout": key}, *args, **kwargs)
    out, _ = mod.apply(variables, *args, rngs={"dropout": key},
                       mutable=["batch_stats"], **kwargs)
    return out


def test_camera_encoder_ranges(toy):
    img, template, _ = toy
    enc = CameraEncoder(pretrain="none", elev_range="0~30", dist_range="2~6",
                        azi_scope=360)
    az, el, di, bi = _init_apply(enc, img, template, train=True)
    assert az.shape == (B,) and el.shape == (B,) and di.shape == (B,)
    assert bi.shape == (B, 2)
    assert float(el.min()) >= 0 and float(el.max()) <= 30
    assert float(di.min()) >= 2 and float(di.max()) <= 6
    assert float(az.min()) >= -180 and float(az.max()) <= 180
    assert float(jnp.abs(bi).max()) <= 1


def test_shape_encoder_output(toy):
    img, template, lpl = toy
    enc = ShapeEncoder(pretrain="none", num_vertices=V)
    delta = _init_apply(enc, img, template, lpl, train=True)
    assert delta.shape == (B, V, 3)
    # bounded by 0.5*tanh and zero-meaned (reference model_res.py:333-337)
    assert float(jnp.abs(delta).max()) <= 0.5
    np.testing.assert_allclose(np.asarray(delta.mean(axis=1)), 0, atol=1e-5)


def test_light_encoder_scale_bias(toy):
    img, _, _ = toy
    enc = LightEncoder()
    lights = _init_apply(enc, img, train=True)
    assert lights.shape == (B, 9)
    # ambient band biased to 3.0 +- 0.5 (reference model_res.py:392-395)
    assert float(lights[:, 0].min()) >= 2.5 and float(lights[:, 0].max()) <= 3.5
    assert float(jnp.abs(lights[:, 1:]).max()) <= 0.1 + 1e-5


def test_texture_encoder_output(toy):
    img, _, _ = toy
    enc = TextureEncoder(pretrain="none", num_vertices=V)
    tex = _init_apply(enc, img, train=True)
    # vertical concat of map + flip → (B, 2H, W, 3) (reference model_res.py:610-611)
    assert tex.shape == (B, 2 * H, W, 3)
    # top half flipped equals bottom half
    np.testing.assert_allclose(np.asarray(tex[:, :H][:, ::-1]),
                               np.asarray(tex[:, H:]), atol=1e-6)


def test_attribute_encoder_full(toy):
    img, template, lpl = toy
    enc = AttributeEncoder(num_vertices=V, pretrains="none", pretrainc="none",
                           pretraint="none", bg=True)
    key = jax.random.PRNGKey(0)
    variables = enc.init({"params": key, "dropout": key}, img, template, lpl,
                         train_shape=0, train=False)
    att = enc.apply(variables, img, template, lpl, train_shape=0, train=False)
    assert att["vertices"].shape == (B, V, 3)
    assert att["delta_vertices"].shape == (B, V, 3)
    assert att["textures"].shape == (B, 2 * H, W, 3)
    assert att["lights"].shape == (B, 9)
    assert att["bg"].shape == (B, H, W, 3)
    np.testing.assert_allclose(
        np.asarray(att["vertices"]),
        np.asarray(template[None] + att["delta_vertices"]), atol=1e-6)


def test_attribute_encoder_freeze_policy(toy):
    """train_shape freezing must kill gradients of frozen branches
    (reference networks.py:581-613)."""
    img, template, lpl = toy
    enc = AttributeEncoder(num_vertices=V, pretrains="none", pretrainc="none",
                           pretraint="none")
    key = jax.random.PRNGKey(0)
    variables = enc.init({"params": key, "dropout": key}, img, template, lpl,
                         train_shape=0, train=False)

    def loss(params, train_shape):
        att = enc.apply({**variables, "params": params}, img, template, lpl,
                        train_shape=train_shape, train=False)
        return (jnp.sum(att["delta_vertices"] ** 2)
                + jnp.sum(att["azimuths"] ** 2)
                + jnp.sum(att["textures"] ** 2))

    g1 = jax.grad(loss)(variables["params"], 1)  # shape frozen
    leaves = jax.tree_util.tree_leaves(g1["shape_enc"])
    assert all(float(jnp.abs(l).max()) == 0 for l in leaves)
    leaves_cam = jax.tree_util.tree_leaves(g1["camera_enc"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves_cam)

    g3 = jax.grad(loss)(variables["params"], 3)  # camera+texture frozen
    assert all(float(jnp.abs(l).max()) == 0
               for l in jax.tree_util.tree_leaves(g3["camera_enc"]))
    assert all(float(jnp.abs(l).max()) == 0
               for l in jax.tree_util.tree_leaves(g3["texture_enc"]))
    assert any(float(jnp.abs(l).max()) > 0
               for l in jax.tree_util.tree_leaves(g3["shape_enc"]))


def test_discriminator_shapes(toy):
    img, _, _ = toy
    d = Discriminator(nc=3, nf=16)
    key = jax.random.PRNGKey(0)
    variables = d.init(key, img[..., :3])
    out = d.apply(variables, img[..., :3])
    assert out.shape == (B, 1)

    msd = MSDiscriminator(nc=4, nf=16)
    variables = msd.init(key, img)
    outs = msd.apply(variables, img)
    assert len(outs) == 3
    assert outs[0].shape[0] == B


def test_bf16_policy(toy):
    """--fp16 → bf16 compute: encoders run under the bf16 policy and still
    emit finite fp32 attributes."""
    from magicmirror.models.blocks import set_compute_dtype

    img, template, lpl = toy
    set_compute_dtype(jnp.bfloat16)
    try:
        enc = AttributeEncoder(num_vertices=V, pretrains="none",
                               pretrainc="none", pretraint="none")
        key = jax.random.PRNGKey(0)
        variables = enc.init({"params": key, "dropout": key}, img, template,
                             lpl, train_shape=0, train=False)
        att = enc.apply(variables, img, template, lpl, train_shape=0,
                        train=False)
        assert att["textures"].dtype == jnp.float32
        assert att["delta_vertices"].dtype == jnp.float32
        for k in ("azimuths", "vertices", "lights"):
            assert np.isfinite(np.asarray(att[k])).all(), k
        # params stored fp32 (master weights)
        leaves = jax.tree_util.tree_leaves(variables["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)
    finally:
        set_compute_dtype(jnp.float32)


def test_sn_discriminator_shapes_and_lipschitz():
    """SNDiscriminator (reference network/discriminator.py): output shape at
    every supported imsize, and the spectral normalization really constrains
    each conv — sigma_max(W/sigma) == 1 to power-iteration accuracy."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from magicmirror.models.discriminators import (SNDiscriminator,
                                                   _spectral_sigma)

    rng = jax.random.PRNGKey(0)
    for imsize in (32, 64, 128):
        m = SNDiscriminator(nc=3, ndf=16, imsize=imsize)
        x = jax.random.uniform(rng, (2, imsize, imsize, 3))
        variables = m.init(rng, x)
        out = m.apply(variables, x)
        assert out.shape == (2, 1)
        assert np.isfinite(np.asarray(out)).all()

    # power iteration matches the exact largest singular value
    w = jax.random.normal(jax.random.PRNGKey(1), (48, 27))
    sig = float(_spectral_sigma(w, n_iter=50))
    exact = float(jnp.linalg.svd(w, compute_uv=False)[0])
    np.testing.assert_allclose(sig, exact, rtol=1e-4)

    # normalized weight has unit spectral norm
    wn = w / _spectral_sigma(w, n_iter=50)
    assert abs(float(jnp.linalg.svd(wn, compute_uv=False)[0]) - 1.0) < 1e-3
