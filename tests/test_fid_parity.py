"""FID trustworthiness (VERDICT round-1 item 5): the weight converter +
Flax InceptionV3-FID reimplementation are validated END-TO-END against a
torch reference with the checkpoint's exact tensor naming — randomly
initialized torch weights flow through ``convert_fid_weights.convert`` into
the Flax model, and activations + the final FID number must agree."""
import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from magicmirror.eval.convert_fid_weights import convert  # noqa: E402
from magicmirror.eval.inception import (InceptionV3FID, _unflatten_into,  # noqa: E402
                                        fid_weights_available,
                                        load_fid_params)
from magicmirror.eval import fid as fid_mod  # noqa: E402

from torch_fid_ref import TorchFIDInceptionV3  # noqa: E402


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchFIDInceptionV3().eval()
    # randomize BN running stats so a mean/var mix-up can't hide
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.8, 1.2)
    flat = convert(tm.state_dict())
    fm = InceptionV3FID()
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    variables = _unflatten_into(variables, flat)
    return tm, fm, variables


def test_activations_match_torch(models):
    tm, fm, variables = models
    rng = np.random.RandomState(0)
    x = rng.rand(3, 64, 48, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(fm.apply(variables, jnp.asarray(x)))
    assert out.shape == ref.shape == (3, 2048)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 1e-3 * max(scale, 1.0), (
        np.abs(out - ref).max(), scale)


def test_fid_number_matches_torch(models, tmp_path):
    """Full pipeline: two on-disk image sets -> FID with converted weights
    matches the torch-activation FID to ~1e-3 relative."""
    from PIL import Image

    tm, fm, variables = models
    rng = np.random.RandomState(1)
    dirs = []
    sets = []
    for d in ("a", "b"):
        p = tmp_path / d
        p.mkdir()
        imgs = (rng.rand(8, 32, 32, 3) * 255).astype(np.uint8)
        if d == "b":
            imgs = (imgs * 0.6 + 60).astype(np.uint8)
        for i, im in enumerate(imgs):
            Image.fromarray(im).save(p / f"{i}.png")
        dirs.append(str(p))
        sets.append(imgs.astype(np.float32) / 255.0)

    # our pipeline, with the converted weights written to an npz
    wpath = tmp_path / "w.npz"
    np.savez(wpath, **convert(tm.state_dict()))
    fid_ours = fid_mod.calculate_fid_given_paths(dirs, batch_size=4,
                                                 weights_path=str(wpath))

    # torch activations through the same Frechet formula
    acts = []
    for imgs in sets:
        with torch.no_grad():
            a = tm(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        acts.append(a)
    mu = [a.mean(0) for a in acts]
    sig = [np.cov(a, rowvar=False) for a in acts]
    fid_ref = fid_mod.calculate_frechet_distance(mu[0], sig[0], mu[1], sig[1])
    assert abs(fid_ours - fid_ref) < 1e-3 * max(abs(fid_ref), 1.0), (
        fid_ours, fid_ref)


def test_weights_available_flag(tmp_path, monkeypatch):
    monkeypatch.setenv("MAGICMIRROR_FID_WEIGHTS",
                       str(tmp_path / "missing.npz"))
    assert not fid_weights_available()
    np.savez(tmp_path / "there.npz", x=np.zeros(1))
    monkeypatch.setenv("MAGICMIRROR_FID_WEIGHTS", str(tmp_path / "there.npz"))
    assert fid_weights_available()
