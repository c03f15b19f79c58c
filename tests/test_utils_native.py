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

    # both flows are the identity map over a dense grid: transfer = identity
    # (dense enough that the nearest flow sample falls inside the reference's
    # ±3σ heatmap window — reference PCK/kp_utils.py:46)
    ys, xs = np.meshgrid(np.linspace(-0.95, 0.95, 48),
                         np.linspace(-0.95, 0.95, 48), indexing="ij")
    flow = np.stack([xs, ys], -1).astype(np.float32).reshape(-1, 1, 2)
    kps = np.asarray([[0.0, 0.0], [-0.5, 0.5]], np.float32)
    out = transfer_via_texture_flow(kps, flow, flow, image_size=256, sigma=3)
    np.testing.assert_allclose(out, kps, atol=0.05)

    scores = pck(out, kps, np.ones(2, bool))
    assert scores[0.15] == 1.0


def test_pck_heatmap_matches_reference_shape():
    from magicmirror.eval.pck import draw_labelmap

    hp = draw_labelmap(np.zeros((64, 64)), (20.0, 30.0), 3)
    assert hp[30, 20] == 1.0                      # center value exactly 1
    np.testing.assert_allclose(hp[30, 20 + 3], np.exp(-9 / 18.0),
                               rtol=1e-6)            # e^{-d²/2σ²}
    assert hp[30, 20 + 10] == 0.0                 # outside the ±3σ window
    # off-canvas keypoint leaves the map untouched
    np.testing.assert_array_equal(
        draw_labelmap(np.zeros((64, 64)), (-100.0, 0.0), 3), 0.0)


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

    # with a target mask the answer snaps to the nearest foreground pixel
    # (reference test_kp.py:176-191: fg_coords[proj2fg_idx[kp2proj_idx]])
    H = W = 64
    mask = np.zeros((H, W))
    mask[8:20, 40:56] = 1.0
    out_m = transfer_via_camera(kps, verts, cam, cam, cam_proj,
                                mask_tgt=mask)
    # every answer is a foreground pixel center
    xs = (2.0 * np.arange(W) + 1.0) / W - 1.0
    ys = -((2.0 * np.arange(H) + 1.0) / H - 1.0)
    fg = np.stack(np.meshgrid(xs, ys)[::1], -1)
    for p in out_m:
        j = np.argmin(np.abs(xs - p[0]))
        i = np.argmin(np.abs(ys - p[1]))
        assert mask[i, j] == 1.0


def test_pck_aggregate_reference_math():
    from magicmirror.eval.pck import pck_aggregate, pck_errors

    pred = np.array([[0.1, 0.0], [0.0, 0.0]])
    gt = np.zeros((2, 2))
    # err = L2 * (1+2·pf)/2; pf=0 → [0.05, 0]
    np.testing.assert_allclose(pck_errors(pred, gt), [0.05, 0.0])
    errs = np.array([[0.05, 0.2], [0.12, 0.01]])
    vis = np.array([[1.0, 1.0], [1.0, 0.0]])
    # kp0: {0.05, 0.12} → @0.1: 1/2; kp1: {0.2} → 0/1; mean = 0.25
    s = pck_aggregate(errs, vis, alphas=(0.1,))
    assert s[0.1] == 0.25
