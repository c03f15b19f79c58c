"""Demo/generation CLI integration tests (these CLIs otherwise only run with
real checkpoints): show_rainbow2, single_img, generate_market,
template_animation, tools — wiring smoke on tiny synthetic runs."""
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

TEMPLATE = os.path.join(os.path.dirname(__file__), "..", "template", "sphere.obj")


@pytest.fixture
def market_run(tmp_path, monkeypatch):
    """Fake Market run: seg_hmr/pytorch trees + opts.yaml + checkpoint."""
    monkeypatch.chdir(tmp_path)
    rs = np.random.RandomState(0)
    for sub in ("train_all", "query"):
        seg_d = tmp_path / "seg_hmr" / sub / "0001"
        img_d = tmp_path / "pytorch" / sub / "0001"
        seg_d.mkdir(parents=True)
        img_d.mkdir(parents=True)
        for i in range(2):
            img = (rs.rand(128, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(img_d / f"p{i}.png")
            m = np.zeros((128, 64), np.uint8)
            m[20:100, 15:50] = 255
            Image.fromarray(m).save(seg_d / ("p%d_%.2f.png" % (i, m.mean() / 255)))

    from magicmirror.configs.flags import build_parser, save_options
    from magicmirror.render.renderer import DiffRender
    from magicmirror.train.checkpoints import CheckpointManager
    from magicmirror.train.optim import make_optimizer_d, make_optimizer_e
    from magicmirror.train.state import create_train_state
    from magicmirror.train.trainer import build_models

    opt = build_parser().parse_args([])
    opt.name = "MKT_demo"
    opt.imageSize = 32
    opt.ratio = 2.0
    opt.batchSize = 2
    opt.pretrains = opt.pretrainc = opt.pretraint = "none"
    opt.template_path = TEMPLATE
    opt.dataroot = str(tmp_path / "seg_hmr")
    opt.outf = "./log/MKT_demo"
    os.makedirs(opt.outf, exist_ok=True)
    save_options(opt)

    dr = DiffRender(TEMPLATE, 32, ratio=2.0)
    netE, netD = build_models(opt, dr)
    state = create_train_state(
        jax.random.PRNGKey(0), netE, netD, make_optimizer_e(),
        make_optimizer_d(), jnp.zeros((2, 64, 32, 4)), dr.vertices_init,
        dr.vertices_laplacian_matrix)
    mgr = CheckpointManager(os.path.join(opt.outf, "ckpts"))
    mgr.save("best_ckpt", state, epoch=1)
    mgr.save_best_mesh(state.template, np.asarray(dr.faces), dr.uvs)
    # template evolution artifacts for template_animation
    from magicmirror.geometry.obj_io import save_mesh

    for e in (0, 10):
        save_mesh(os.path.join(opt.outf, "epoch_%03d_template.obj" % e),
                  np.asarray(state.template), np.asarray(dr.faces), dr.uvs)
    return tmp_path


def test_show_rainbow2_cli(market_run):
    import magicmirror.cli.show_rainbow2 as sr

    sr.main(["--name", "MKT_demo", "--dataroot",
             str(market_run / "seg_hmr")])
    out = market_run / "log" / "MKT_demo"
    assert (out / "rainbow_Xer.png").exists()
    assert (out / "rainbow.gif").exists()
    assert (out / "rainbow_rotation.gif").exists()
    assert (out / "rainbow_mesh.obj").exists()


def test_single_img_cli(market_run):
    import magicmirror.cli.single_img as si

    img = str(market_run / "pytorch" / "query" / "0001" / "p0.png")
    seg = sorted((market_run / "seg_hmr" / "query" / "0001").iterdir())[0]
    si.main(["--name", "MKT_demo", "--img", img, "--mask", str(seg)])
    out = market_run / "log" / "MKT_demo"
    assert (out / "p0_panel.png").exists()
    assert (out / "p0_rotation.gif").exists()


def test_generate_market_cli(market_run):
    import magicmirror.cli.generate_market as gm

    gm.main(["--name", "MKT_demo", "--dataroot", str(market_run / "seg_hmr"),
             "--out", str(market_run / "Magic_Market")])
    out_dir = market_run / "Magic_Market" / "hq" / "pytorch" / "0001"
    files = sorted(out_dir.iterdir())
    # 2 images x 4 azimuth deltas
    assert len(files) == 8
    assert any("az-60" in f.name for f in files)


def test_template_animation_cli(market_run):
    import magicmirror.cli.template_animation as ta

    ta.main(["--name", "MKT_demo"])
    out = market_run / "log" / "MKT_demo"
    assert (out / "template_evolution.gif").exists()
    assert (out / "template_evolution.png").exists()


def test_tools_cli(market_run, capsys):
    import magicmirror.cli.tools as tools

    n_pos, n_neg = tools.check_backfaces(TEMPLATE)
    assert n_pos + n_neg == 1280

    dst = str(market_run / "ell.obj")
    tools.convert_sphere2ellipsoid(TEMPLATE, dst)
    from magicmirror.geometry.obj_io import load_obj

    m = load_obj(dst)
    assert m.vertices.shape == (642, 3)
