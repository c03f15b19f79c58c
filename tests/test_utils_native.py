"""Native preprocessing lib parity + misc utils + PCK transfer tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_native_matches_python():
    from magicmirror.data import native
    from magicmirror.data.prepare import fg_ratio as py_fg, fill_holes as py_fill

    m = np.zeros((24, 30), np.uint8)
    m[4:20, 6:26] = 255
    assert native.fg_ratio(m) == pytest.approx(py_fg(m / 255.0))

    holey = (m / 255.0).astype(np.float64)
    holey[10:12, 14:16] = 0
    np.testing.assert_allclose(native.fill_holes(holey.copy()), py_fill(holey))

    rgba = np.random.RandomState(0).rand(8, 8, 4).astype(np.float32)
    expect = rgba.copy()
    mm = expect[..., 3:4]
    expect[..., :3] = expect[..., :3] * mm + (1 - mm)
    np.testing.assert_allclose(native.white_composite(rgba.copy()), expect,
                               atol=1e-6)

    bin_in = np.asarray([[100, 200], [160, 161]], np.uint8)
    np.testing.assert_array_equal(native.binarize(bin_in.copy(), 160),
                                  [[0, 255], [0, 255]])


def test_native_resize_shapes():
    from magicmirror.data import native

    img = (np.random.RandomState(0).rand(20, 30, 3) * 255).astype(np.uint8)
    out = native.resize_bilinear(img, 10, 15)
    assert out.shape == (10, 15, 3)
    m = (np.random.RandomState(0).rand(20, 30) > 0.5).astype(np.uint8) * 255
    out = native.resize_nearest(m, 40, 60)
    assert out.shape == (40, 60)
    assert set(np.unique(out)).issubset({0, 255})


def test_misc_utils():
    from magicmirror.utils.misc import (
        AverageMeter, channel_shuffle, fliplr, iou_thresholded, mask_white)

    meter = AverageMeter()
    meter.update(1.0)
    meter.update(3.0)
    assert meter.avg == 2.0

    img = jnp.asarray(np.random.RandomState(0).rand(2, 4, 6, 4).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fliplr(fliplr(img))), np.asarray(img))
    shuffled = channel_shuffle(jax.random.PRNGKey(0), img)
    np.testing.assert_allclose(np.asarray(shuffled[..., 3]),
                               np.asarray(img[..., 3]))

    m = jnp.ones((1, 4, 4))
    assert float(iou_thresholded(m, m)[0]) == 1.0

    comp = mask_white(img)
    assert comp.shape == (2, 4, 6, 3)


def test_pck_texture_flow_transfer():
    from magicmirror.eval.pck import pck, transfer_via_texture_flow

    # both flows are the identity map over a grid: transfer = identity
    ys, xs = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8),
                         indexing="ij")
    flow = np.stack([xs, ys], -1).astype(np.float32)
    kps = np.asarray([[0.0, 0.0], [-0.5, 0.5]], np.float32)
    out = transfer_via_texture_flow(kps, flow, flow)
    np.testing.assert_allclose(out, kps, atol=0.15)

    scores = pck(out, kps, np.ones(2, bool), (64, 64))
    assert scores[0.15] == 1.0


def test_pck_camera_transfer():
    from magicmirror.eval.pck import transfer_via_camera
    from magicmirror.geometry.camera import perspective_projection
    import math

    rs = np.random.RandomState(0)
    verts = rs.uniform(-0.5, 0.5, (50, 3)).astype(np.float32)
    cam_proj = perspective_projection(2 * math.atan(1 / 2.5), 1.0)
    cam = (np.float32([0.0]), np.float32([10.0]), np.float32([3.0]),
           np.zeros((1, 2), np.float32))
    # same camera both sides → identity transfer of projected positions
    from magicmirror.eval.pck import project_vertices

    vi, _ = project_vertices(verts, *cam, cam_proj=cam_proj)
    kps = vi[:5]
    out = transfer_via_camera(kps, verts, cam, cam, cam_proj)
    np.testing.assert_allclose(out, kps, atol=1e-4)
