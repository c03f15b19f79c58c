"""EM template-update selection modes (reference trainer.py:1018-1104) and
LR schedule tests."""
import numpy as np
import pytest

from magicmirror.train.em_update import apply_template_update, select_delta
from magicmirror.train.optim import lr_schedule


class Opt:
    em = 1.0
    eps = 0.3
    topK = 0.5
    smooth = 0.5
    clip = 0.05
    white = True
    cross = False


def _data(n=20, v=12):
    rs = np.random.RandomState(0)
    verts = rs.uniform(-1, 1, (n, v, 3)).astype(np.float32)
    delta = rs.uniform(-0.05, 0.05, (n, v, 3)).astype(np.float32)
    return verts, delta


def test_select_mean_mode():
    verts, delta = _data()
    opt = Opt()
    opt.em = 1.0
    s, count = select_delta(verts, delta, opt, 12)
    assert count == 20
    np.testing.assert_allclose(s, delta.sum(0), atol=1e-5)


def test_select_drops_collapsed():
    verts, delta = _data()
    delta[3, -1] = 0.9  # collapsed: last vertex mean |delta| > 0.4
    opt = Opt()
    s, count = select_delta(verts, delta, opt, 12)
    assert count == 19


def test_select_positive_z():
    verts, delta = _data()
    opt = Opt()
    opt.em = 2
    s, count = select_delta(verts, delta, opt, 12)
    expected = verts[:, :, 2].mean(1) >= 0.001
    assert count == int(expected.sum())


def test_select_symmetry():
    verts, delta = _data()
    opt = Opt()
    opt.em = 3
    s, count = select_delta(verts, delta, opt, 12)
    assert 0 <= count <= 20


def test_select_topk():
    verts, delta = _data()
    opt = Opt()
    opt.em = 5
    opt.topK = 0.25
    s, count = select_delta(verts, delta, opt, 12)
    assert count == 5  # 25% of 20


def test_select_dbscan():
    rs = np.random.RandomState(0)
    # two tight clusters; DBSCAN should pick the bigger one
    a = rs.normal(0, 0.01, (14, 12, 3)) + rs.normal(0, 1, (1, 12, 3))
    b = rs.normal(0, 0.01, (6, 12, 3)) - 5
    verts = np.concatenate([a, b]).astype(np.float32)
    delta = np.ones_like(verts) * 0.01
    opt = Opt()
    opt.em = 4
    opt.eps = 0.5
    s, count = select_delta(verts, delta, opt, 12)
    assert count in (14, 20)  # dominant cluster, or all on fallback


def test_apply_template_update_smooth_clip_recentre():
    rs = np.random.RandomState(0)
    template = rs.uniform(-1, 1, (12, 3)).astype(np.float32)
    sum_delta = rs.uniform(-2, 2, (12, 3)).astype(np.float32)
    lap = np.zeros((12, 12), np.float32)
    opt = Opt()
    opt.white = False
    new, em_step = apply_template_update(template, sum_delta, 10, lap,
                                         warm_up=1.0, em_step=0.1, opt=opt)
    assert em_step == pytest.approx(0.099)
    # step bounded by warm_up * em_step * clip
    assert np.abs(new - template).max() <= 0.05 * 0.1 + 1e-6
    # white mode re-centers
    opt.white = True
    new2, _ = apply_template_update(template, sum_delta, 10, lap, 1.0, 0.1, opt)
    np.testing.assert_allclose(new2.mean(0), 0, atol=1e-6)


def test_apply_template_update_cross_rollback():
    template = np.ones((4, 3), np.float32)
    template[:, 2] = [0.001, 0.001, -0.001, -0.001]
    # big delta that flips z signs
    sum_delta = np.zeros((4, 3), np.float32)
    sum_delta[:, 2] = [-10, -10, 10, 10]
    opt = Opt()
    opt.cross = True
    opt.white = False
    opt.smooth = 0
    opt.clip = 5.0
    new, _ = apply_template_update(template, sum_delta, 2, np.zeros((4, 4)),
                                   1.0, 1.0, opt)
    np.testing.assert_allclose(new, template)  # rolled back


@pytest.mark.parametrize("scheduler", ["cosine", "step", "restart",
                                       "restart1", "restart2", "exp"])
def test_lr_schedule_shapes(scheduler):
    lrs = [lr_schedule(scheduler, e, 100, 1e-4, 0.01) for e in range(101)]
    assert all(l > 0 for l in lrs)
    assert lrs[0] == pytest.approx(1e-4, rel=0.05)
    if scheduler == "cosine":
        assert lrs[100] == pytest.approx(0.01 * 1e-4, rel=1e-3)
        assert all(a >= b - 1e-12 for a, b in zip(lrs, lrs[1:]))
    if scheduler == "step":
        assert lrs[79] == 1e-4 and lrs[80] == pytest.approx(1e-6)
    if scheduler.startswith("restart"):
        # warm restarts: lr jumps back up at cycle boundaries
        assert max(lrs[1:]) > min(lrs[1:]) * 10
