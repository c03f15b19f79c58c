"""End-to-end trainer() integration on a synthetic on-disk dataset: two
epochs incl. artifacts, eval cadence, EM template update, checkpointing.
FID is stubbed (its machinery has its own test) to keep CPU runtime sane."""
import os

import numpy as np
import pytest
from PIL import Image

import jax

import magicmirror.train.trainer as trainer_mod
from magicmirror.configs.flags import build_parser
from magicmirror.data.cub import CUBDataset
from magicmirror.data.loader import DataLoader

TEMPLATE = os.path.join(os.path.dirname(__file__), "..", "template", "sphere.obj")


@pytest.fixture
def synth_tree(tmp_path):
    rs = np.random.RandomState(0)
    for split in ("train", "test"):
        d = tmp_path / split / "c0"
        d.mkdir(parents=True)
        n = 4 if split == "train" else 2
        for i in range(n):
            img = (rs.rand(40, 40, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"s{i}.jpg")
            mask = np.zeros((40, 40), np.uint8)
            mask[8:32, 8:32] = 255
            ratio = mask.mean() / 255.0
            Image.fromarray(mask).save(d / ("s%d_%.2f.png" % (i, ratio)))
    return str(tmp_path)


@pytest.mark.parametrize("spc", [1, 2])
def test_trainer_two_epochs(synth_tree, tmp_path, monkeypatch, spc):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(trainer_mod, "calculate_fid_given_paths",
                        lambda paths, bs: 123.0)

    opt = build_parser().parse_args([])
    # spc=2 groups the epoch's 2 iterations into ONE scanned dispatch
    # (train/trainer.py flush_group) — the scan path through the real loop
    opt.steps_per_call = spc
    opt.name = "smoke"
    opt.outf = str(tmp_path / "log" / "smoke")
    os.makedirs(opt.outf, exist_ok=True)
    opt.dataroot = synth_tree
    opt.imageSize = 32
    opt.batchSize = 2
    opt.niter = 1
    opt.warm_epoch = 1
    opt.pretrains = opt.pretrainc = opt.pretraint = "none"
    opt.template_path = TEMPLATE
    opt.threshold = "0.1,0.9"
    opt.clean_threshold = "0.1,0.9"
    opt.em = 1.0
    opt.em_gap = 1
    opt.swa = True
    opt.workers = 2

    mk = lambda aug, train: CUBDataset(synth_tree, 32, train=train, aug=aug,
                                       threshold="0.1,0.9")
    train_dl = DataLoader(mk(True, True), 2, shuffle=True, drop_last=True,
                          num_workers=2)
    noaug_dl = DataLoader(mk(False, True), 2, shuffle=False, drop_last=True,
                          num_workers=2)
    test_dl = DataLoader(mk(False, False), 2, shuffle=False, num_workers=2)

    state = trainer_mod.trainer(opt, train_dl, test_dl, noaug_dl)

    # artifacts with the reference layout
    out = opt.outf
    assert os.path.isfile(os.path.join(out, "current_Xer.png"))
    assert os.path.isfile(os.path.join(out, "current_rotation.gif"))
    assert os.path.isfile(os.path.join(out, "epoch_000_template.obj"))
    assert os.path.isfile(os.path.join(out, "result.txt"))
    assert os.path.isdir(os.path.join(out, "ckpts", "latest_ckpt"))
    assert os.path.isfile(os.path.join(out, "ckpts", "best_mesh.obj"))
    assert os.listdir(os.path.join(out, "fid", "rec"))
    txt = open(os.path.join(out, "result.txt")).read()
    assert "recon ssim" in txt and "MaskIoU" in txt
    # the EM update ran: template differs from init (or was legitimately
    # rolled back — check the em_step decay as the unconditional signal)
    assert float(state.em_step) < 0.1


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from magicmirror.models.attribute_encoder import AttributeEncoder
    from magicmirror.models.discriminators import Discriminator
    from magicmirror.render.renderer import DiffRender
    from magicmirror.train.checkpoints import CheckpointManager
    from magicmirror.train.optim import make_optimizer_d, make_optimizer_e
    from magicmirror.train.state import create_train_state

    dr = DiffRender(TEMPLATE, 32)
    netE = AttributeEncoder(num_vertices=dr.num_vertices, pretrains="none",
                            pretrainc="none", pretraint="none")
    netD = Discriminator(nc=3)
    sample = jnp.zeros((2, 32, 32, 4))
    state = create_train_state(jax.random.PRNGKey(0), netE, netD,
                               make_optimizer_e(), make_optimizer_d(), sample,
                               dr.vertices_init,
                               dr.vertices_laplacian_matrix)
    state = state.replace(template=state.template + 0.123)
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save("latest_ckpt", state, epoch=7)
    payload = mgr.restore("latest_ckpt", state)
    assert payload["epoch"] == 7
    np.testing.assert_allclose(np.asarray(payload["state"].template),
                               np.asarray(state.template), atol=1e-6)
    leaves_a = jax.tree_util.tree_leaves(payload["state"].params_e)
    leaves_b = jax.tree_util.tree_leaves(state.params_e)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
