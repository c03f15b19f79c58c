"""AttributeEncoder: composes the five encoders (reference networks.py:532-648).

TPU-first differences from the reference:
  * the template (``vertices_init``) is functional state passed per call, not a
    buried module buffer — the EM update rewrites it in the train state;
  * the per-iteration encoder-freezing policy (``train_shape`` ∈ 0..5,
    reference networks.py:581-613) uses ``jax.lax.stop_gradient`` on frozen
    branches instead of deep-copied modules — identical gradients, zero copy;
  * the inverse-Laplacian gradient preconditioner (``--inv``, Nicolet 2021;
    reference networks.py:558-561, 572-590) is a ``jax.custom_vjp`` identity
    whose backward multiplies by M = elem_square(inv(I + inv*L)) — the
    reference's elementwise-squared M, reproduced faithfully.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .encoders import (
    BackgroundEncoder,
    CameraEncoder,
    FeatureEncoder,
    LightEncoder,
    ShapeEncoder,
    TextureEncoder,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _precondition(delta, M):
    return delta


def _precondition_fwd(delta, M):
    return delta, M


def _precondition_bwd(M, g):
    # reference networks.py:572-578: grad' = permute(permute(grad) @ M)
    return (jnp.einsum("bwc,wv->bvc", g, M), None)


_precondition.defvjp(_precondition_fwd, _precondition_bwd)


def make_inv_preconditioner(laplacian: np.ndarray, inv: float) -> np.ndarray:
    """M = elementwise_square(inv(I + inv*L)) (reference networks.py:560-561)."""
    L = np.asarray(laplacian, np.float64)
    M = np.linalg.inv(np.eye(L.shape[0]) + inv * L)
    return (M * M).astype(np.float32)


SHAPE_FROZEN = (1, 4, 5)
CAMERA_FROZEN = (2, 3, 4)
TEXTURE_FROZEN = (3, 5)


class AttributeEncoder(nn.Module):
    """netE (reference networks.py:532-648).  Call with NHWC RGBA images, the
    live template (V, 3), and the dense Laplacian (V, V)."""
    num_vertices: int = 642
    azi_scope: float = 360.0
    elev_range: str = "0~30"
    dist_range: str = "2~6"
    nc: int = 4
    nf: int = 32
    nk: int = 5
    ratio: float = 1.0
    makeup: int = 0
    bg: bool = False
    pretraint: str = "res34"
    pretrainc: str = "none"
    pretrains: str = "hr18sv2"
    droprate: str | float = "0.2,0.2,0.2"
    coordconv: bool = False
    norm: str = "bn"
    nolpl: bool = False
    inv: float = 0.0
    # landmark consistency (reference networks.py:496-530, trainer.py:104-108;
    # vestigial there — its inputs are never produced — but functional here)
    lambda_lc: float = 0.0
    num_faces: int = 1280

    def setup(self):
        if isinstance(self.droprate, str):
            parts = self.droprate.split(",")
            dc, ds, dt = float(parts[0]), float(parts[1]), float(parts[2])
        else:
            dc, ds, dt = 0.2, 0.2, 0.2
        self.camera_enc = CameraEncoder(
            nc=self.nc, nk=self.nk, azi_scope=self.azi_scope,
            elev_range=self.elev_range, dist_range=self.dist_range,
            droprate=dc, coordconv=self.coordconv, norm=self.norm,
            ratio=self.ratio, pretrain=self.pretrainc, nolpl=self.nolpl)
        self.shape_enc = ShapeEncoder(
            nc=self.nc, nk=self.nk, num_vertices=self.num_vertices,
            pretrain=self.pretrains, droprate=ds, coordconv=self.coordconv,
            norm=self.norm, nolpl=self.nolpl)
        self.texture_enc = TextureEncoder(
            nc=self.nc, nk=self.nk, nf=self.nf, num_vertices=self.num_vertices,
            pretrain=self.pretraint, ratio=self.ratio, makeup=self.makeup,
            droprate=dt, coordconv=self.coordconv, norm=self.norm)
        self.light_enc = LightEncoder(
            nc=self.nc, nk=self.nk, droprate=dc, coordconv=self.coordconv,
            norm=self.norm)
        if self.bg:
            self.bg_enc = BackgroundEncoder(nc=self.nc, droprate=dt,
                                            coordconv=self.coordconv)
        if self.lambda_lc > 0:
            self.feat_enc = FeatureEncoder(nc=self.nc, norm=self.norm)
            from .discriminators import LandmarkConsistency

            self.landmark_cls = LandmarkConsistency(
                num_landmarks=self.num_faces, dim_feat=256)

    def __call__(self, input_img, template, lpl, train_shape: int = 0,
                 train: bool = True, precond_M=None):
        """Returns the attribute dict (reference networks.py:635-646)."""
        delta_vertices = self.shape_enc(input_img, template, lpl, train=train)
        if train_shape in SHAPE_FROZEN:
            delta_vertices = jax.lax.stop_gradient(delta_vertices)
        elif self.inv > 0 and precond_M is not None:
            delta_vertices = _precondition(delta_vertices, precond_M)

        cameras = self.camera_enc(input_img, template, train=train)
        azimuths, elevations, distances, biases = cameras
        if train_shape in CAMERA_FROZEN:
            azimuths = jax.lax.stop_gradient(azimuths)
            elevations = jax.lax.stop_gradient(elevations)
            distances = jax.lax.stop_gradient(distances)
            biases = jax.lax.stop_gradient(biases)

        textures = self.texture_enc(input_img, train=train)
        lights = self.light_enc(input_img, train=train)
        if train_shape in TEXTURE_FROZEN:
            textures = jax.lax.stop_gradient(textures)
            lights = jax.lax.stop_gradient(lights)

        vertices = template[None] + delta_vertices

        background = self.bg_enc(input_img, train=train) if self.bg else None
        img_feats = (self.feat_enc(input_img, train=train)
                     if self.lambda_lc > 0 else None)

        # under the bf16 policy the heads emit bf16 — the renderer and losses
        # run fp32 (AMP convention: fp32 master path outside conv compute)
        f32 = lambda v: v.astype(jnp.float32) if v is not None else None
        azimuths, elevations, distances, biases = map(
            f32, (azimuths, elevations, distances, biases))
        delta_vertices = f32(delta_vertices)
        vertices = f32(vertices)
        textures = f32(textures)
        lights = f32(lights)
        background = f32(background)

        return {
            "azimuths": azimuths,
            "elevations": elevations,
            "distances": distances,
            "biases": biases,
            "vertices": vertices,
            "delta_vertices": delta_vertices,
            "textures": textures,
            "lights": lights,
            "img_feats": img_feats,
            "bg": background,
        }

    def landmark_loss(self, img_feats, landmark_2d, visible, sample_idx):
        """Face-identity CE at projected face centers (reference
        networks.py:510-530); ``landmark_2d`` in grid_sample convention
        (x right, y down, [-1,1])."""
        return self.landmark_cls(img_feats, landmark_2d, visible, sample_idx)

