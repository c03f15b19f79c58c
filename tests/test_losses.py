"""Loss unit tests vs hand-computed values (SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magicmirror.losses.attributes import angle2xy, recon_att
from magicmirror.losses.chamfer import chamfer_distance
from magicmirror.losses.mesh_reg import (
    deform_loss,
    depth_loss,
    edge_loss,
    flip_loss,
    laplacian_flat_loss,
)
from magicmirror.losses.recon import mask_iou_loss, recon_data


def test_chamfer_zero_for_identical():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 10, 3).astype(np.float32))
    loss, _ = chamfer_distance(x, x)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_chamfer_known_value():
    x = jnp.asarray([[[0.0, 0, 0]]])
    y = jnp.asarray([[[1.0, 0, 0]]])
    loss, _ = chamfer_distance(x, y)
    # d^2 both directions = 1 + 1
    assert float(loss) == pytest.approx(2.0, abs=1e-6)


def test_mask_iou_loss_values():
    a = jnp.ones((1, 4, 4))
    assert float(mask_iou_loss(a, a)) == pytest.approx(0.0, abs=1e-5)
    b = jnp.zeros((1, 4, 4)).at[:, :2].set(1.0)
    # inter 8, union 16 → loss 0.5
    assert float(mask_iou_loss(a, b)) == pytest.approx(0.5, abs=1e-5)


def test_recon_data_perfect_match():
    img = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 4).astype(np.float32))
    img = img.at[..., 3].set((img[..., 3] > 0.5).astype(jnp.float32))
    loss = recon_data(img, img, image_weight=0.1)
    assert float(loss) == pytest.approx(0.0, abs=1e-5)


def test_angle2xy_periodicity():
    np.testing.assert_allclose(np.asarray(angle2xy(jnp.asarray([0.0]))),
                               [[1.0, 0.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(angle2xy(jnp.asarray([360.0]))),
                               np.asarray(angle2xy(jnp.asarray([0.0]))), atol=1e-5)


def test_recon_att_zero_for_identical():
    rs = np.random.RandomState(0)
    att = {
        "azimuths": jnp.asarray(rs.uniform(-180, 180, 3).astype(np.float32)),
        "elevations": jnp.asarray(rs.uniform(0, 30, 3).astype(np.float32)),
        "distances": jnp.asarray(rs.uniform(2, 6, 3).astype(np.float32)),
        "biases": jnp.asarray(rs.rand(3, 2).astype(np.float32)),
        "vertices": jnp.asarray(rs.rand(3, 12, 3).astype(np.float32)),
        "textures": jnp.asarray(rs.rand(3, 8, 4, 3).astype(np.float32)),
        "lights": jnp.asarray(rs.rand(3, 9).astype(np.float32)),
    }
    losses = recon_att(att, att)
    for l in losses:
        assert float(l) == pytest.approx(0.0, abs=1e-6)


def test_laplacian_loss_zero_for_constant_shift():
    """A Laplacian of a uniform translation is zero (rows sum to 0)."""
    from magicmirror.geometry import mesh as mesh_ops

    faces = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]])
    L = jnp.asarray(mesh_ops.uniform_laplacian(4, faces))
    delta = jnp.ones((1, 4, 3)) * 0.3
    fn = jnp.ones((1, 4, 3)) / np.sqrt(3)
    _, e2f = mesh_ops.edge2faces(faces)
    loss = laplacian_flat_loss(delta, fn, L, jnp.asarray(e2f),
                               lambda_lpl=1.0, lambda_flat=0.0)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_flat_loss_zero_for_parallel_normals():
    from magicmirror.geometry import mesh as mesh_ops

    faces = np.array([[0, 1, 2], [0, 2, 3]])
    _, e2f = mesh_ops.edge2faces(faces)
    L = jnp.zeros((4, 4))
    fn = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 2, 3))
    delta = jnp.zeros((1, 4, 3))
    loss = laplacian_flat_loss(delta, fn, L, jnp.asarray(e2f),
                               lambda_lpl=0.0, lambda_flat=1.0)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_edge_loss_zero_for_equilateral():
    # all edges equal length → zero deviation
    v = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0]]],
                    jnp.float32)
    edges = jnp.asarray([[0, 1], [1, 2], [2, 0]])
    assert float(edge_loss(v, edges)) == pytest.approx(0.0, abs=1e-6)


def test_depth_and_deform():
    v = jnp.asarray([[[0.0, 0, 2.0], [0, 0, -2.0]]])
    assert float(depth_loss(v)) == pytest.approx(4.0, abs=1e-5)
    d = jnp.asarray([[[3.0, 0, 0], [0, 4.0, 0]]])
    assert float(deform_loss(d)) == pytest.approx(3.5, abs=1e-5)


def test_flip_loss_zero_for_symmetric():
    """A z-symmetric deformation on a z-symmetric template has zero flip loss."""
    sign_init = jnp.asarray([1.0, -1.0])
    flip_index = jnp.asarray([1, 0])
    # delta mirrored in z: v0=(1,2,3), v1=(1,2,-3)
    delta = jnp.asarray([[[1.0, 2.0, 3.0], [1.0, 2.0, -3.0]]])
    assert float(flip_loss(delta, flip_index, sign_init)) == pytest.approx(
        0.0, abs=1e-6)
    # asymmetric deformation → positive loss
    delta2 = jnp.asarray([[[1.0, 2.0, 3.0], [0.0, 0.0, -1.0]]])
    assert float(flip_loss(delta2, flip_index, sign_init)) > 0


def test_ssim_metric():
    from magicmirror.eval.metrics import mask_iou_metric, ssim

    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    noise = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32))
    assert float(ssim(img, noise)) < 0.3
    m = jnp.ones((1, 8, 8))
    assert float(mask_iou_metric(m, m)) == pytest.approx(1.0, abs=1e-5)


def test_gradient_penalty_unit_gradient():
    """GP is 0 for a critic with unit-norm input gradient (D(x)=x[0,0,0])."""
    from magicmirror.losses.gan import gradient_penalty

    def d_fn(x):
        return x[:, 0, 0, 0]

    rs = np.random.RandomState(0)
    real = jnp.asarray(rs.rand(4, 8, 8, 3).astype(np.float32))
    fake = jnp.asarray(rs.rand(4, 8, 8, 3).astype(np.float32))
    gp = gradient_penalty(d_fn, real, fake, jax.random.PRNGKey(0))
    assert float(gp) == pytest.approx(0.0, abs=1e-6)
