"""Properties of the Poisson compositing solve (eval/poisson.py):
gradient preservation inside Ω, Dirichlet boundary, pass-through outside."""
import numpy as np

from magicmirror.eval.poisson import poisson_edit


def test_constant_blend_is_identity():
    tgt = np.full((32, 32, 3), 100.0)
    src = np.full((32, 32, 3), 200.0)
    mask = np.zeros((32, 32))
    mask[8:24, 8:24] = 255
    out = poisson_edit(src, tgt, mask)
    # zero source gradients + constant boundary -> exactly the target
    np.testing.assert_array_equal(out, 100)


def test_gradients_preserved_outside_untouched():
    H = W = 40
    _, xx = np.mgrid[0:H, 0:W].astype(float)
    src = np.stack([xx * 3 % 37] * 3, -1)
    tgt = np.full((H, W, 3), 128.0)
    mask = np.zeros((H, W))
    mask[10:30, 10:30] = 1
    out = poisson_edit(src, tgt, mask).astype(float)
    gx_out = np.diff(out[15:25, 13:27, 0], axis=1)
    gx_src = np.diff(src[15:25, 13:27, 0], axis=1)
    assert np.median(np.abs(gx_out - gx_src)) <= 1.0
    np.testing.assert_array_equal(out[:8], 128.0)


def test_offset_and_empty_mask():
    rs = np.random.RandomState(0)
    tgt = rs.rand(24, 24, 3) * 255
    src = rs.rand(24, 24, 3) * 255
    out = poisson_edit(src, tgt, np.zeros((24, 24)))
    np.testing.assert_array_equal(out, np.rint(np.clip(tgt, 0, 255)))
    mask = np.zeros((24, 24))
    mask[6:18, 6:18] = 1
    out = poisson_edit(src, tgt, mask, offset=(3, -2))
    assert out.shape == (24, 24, 3) and out.dtype == np.uint8
