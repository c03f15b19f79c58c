"""Eval CLI integration: train-state checkpoint → test.py main() round trip
(opts.yaml override, best_mesh.obj template injection, metric files)."""
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

TEMPLATE = os.path.join(os.path.dirname(__file__), "..", "template", "sphere.obj")


@pytest.fixture
def run_dir(tmp_path, monkeypatch):
    """A fake finished training run: dataset + opts.yaml + checkpoint."""
    monkeypatch.chdir(tmp_path)
    rs = np.random.RandomState(0)
    # dataset (CUB layout)
    for split in ("train", "test"):
        d = tmp_path / "data" / split / "c0"
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray((rs.rand(40, 40, 3) * 255).astype(np.uint8)).save(
                d / f"s{i}.jpg")
            m = np.zeros((40, 40), np.uint8)
            m[8:32, 8:32] = 255
            Image.fromarray(m).save(d / ("s%d_%.2f.png" % (i, m.mean() / 255)))

    from magicmirror.configs.flags import build_parser, save_options
    from magicmirror.models.attribute_encoder import AttributeEncoder
    from magicmirror.models.discriminators import Discriminator
    from magicmirror.render.renderer import DiffRender
    from magicmirror.train.checkpoints import CheckpointManager
    from magicmirror.train.optim import make_optimizer_d, make_optimizer_e
    from magicmirror.train.state import create_train_state

    opt = build_parser().parse_args([])
    opt.name = "clitest"
    opt.imageSize = 32
    opt.batchSize = 2
    opt.pretrains = opt.pretrainc = opt.pretraint = "none"
    opt.template_path = TEMPLATE
    opt.dataroot = str(tmp_path / "data")
    opt.outf = "./log/clitest"
    os.makedirs(opt.outf, exist_ok=True)
    save_options(opt)

    from magicmirror.train.trainer import build_models

    dr = DiffRender(TEMPLATE, 32)
    netE, netD = build_models(opt, dr)
    state = create_train_state(
        jax.random.PRNGKey(0), netE, netD, make_optimizer_e(),
        make_optimizer_d(), jnp.zeros((2, 32, 32, 4)), dr.vertices_init,
        dr.vertices_laplacian_matrix)
    mgr = CheckpointManager(os.path.join(opt.outf, "ckpts"))
    mgr.save("best_ckpt", state, epoch=3)
    mgr.save_best_mesh(state.template + 0.01, np.asarray(dr.faces), dr.uvs)
    return tmp_path


def test_eval_cli_end_to_end(run_dir, monkeypatch):
    import magicmirror.cli.test as test_cli

    monkeypatch.setattr(test_cli, "calculate_fid_given_paths",
                        lambda paths, bs: 42.0)
    test_cli.main(["--name", "clitest", "--dataroot", str(run_dir / "data")])

    out = run_dir / "log" / "clitest"
    assert (out / "fid" / "rec_tmp").exists()
    assert len(list((out / "fid" / "rec_tmp").iterdir())) == 2
    assert (out / "hist.png").exists()
    txt = (out / "result.txt").read_text()
    assert "Final recon ssim" in txt
    assert "Final Test rotation fid: 42.00" in txt


def test_show_camera_cli(run_dir, monkeypatch):
    import magicmirror.cli.show_camera as sc

    sc.main(["--name", "clitest", "--dataroot", str(run_dir / "data")])
    assert (run_dir / "log" / "clitest" / "camera_hist.png.npz").exists()
