"""DiffRender — the differentiable render pipeline.

The TPU-native equivalent of the reference's ``DiffRender`` class
(reference networks.py:164-493): template loading + topology precompute, the
camera→rasterize→texture→SH-light→compose forward pass, and the loss suite
(delegated to magicmirror.losses).

Everything in ``render`` is pure jnp and traceable — ``DiffRender`` holds only
static constants (topology, projection), so its methods can be closed over by
``jax.jit``/``pjit`` train steps.  The *template* (``vertices_init``) is live
training state (the EM update rewrites it), so it is NOT stored here — callers
keep it in their train state and pass predicted ``vertices`` in the attribute
dict, exactly like the reference does.

Layout conventions: images NHWC in [0,1]; textures (B, 2H, W, 3) NHWC; the
attribute dict uses the reference's keys (azimuths, elevations, distances,
biases, vertices, delta_vertices, textures, lights, bg).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera as cam
from ..geometry import mesh as mesh_ops
from ..geometry.obj_io import load_obj
from ..losses import attributes as att_losses
from ..losses import mesh_reg, recon
from ..ops.rasterize import dibr_rasterization
from ..ops.sampling import texture_mapping
from ..ops.shading import spherical_harmonic_lighting


class DiffRender:
    def __init__(self, mesh_name: str, image_size: int, ratio: float = 1.0,
                 init_ellipsoid: float = 1.0, image_weight: float = 0.1,
                 lambda_lpl: float = 0.1, lambda_flat: float = 0.001,
                 sigmainv: float = 7000.0, backend: str = "auto",
                 soft_mode: str = "line", band_capacity: int | None = None):
        if backend == "auto":
            import jax

            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        # 'exact' = kaolin segment-distance silhouette; 'line' trades corner
        # exactness for ~40% fewer rasterizer ops (see ops/rasterize.py);
        # 'line' is the default and the only mode of the v4 fused kernel
        # (the 'exact'/'line' difference is confined to corner Voronoi
        # regions and is invisible at sigmainv=7000)
        self.soft_mode = soft_mode
        # static per-cell face capacity of the banded Pallas kernels; None =
        # auto (4x the uniform share with a floor of 160, rounded up to the
        # 8-face chunk — rasterize_v4.default_capacity; env
        # MAGICMIRROR_BAND_CAPACITY overrides).  Overflow is REPORTED per image in
        # attributes['dropped_faces'] — assert/log it rather than trusting
        # silently capped bins
        self.band_capacity = band_capacity
        self.image_size = int(image_size)
        self.ratio = ratio
        self.render_height = round(ratio * image_size)
        self.render_width = int(image_size)
        self.image_weight = image_weight
        self.lambda_lpl = lambda_lpl
        self.lambda_flat = lambda_flat
        self.sigmainv = sigmainv
        self.backend = backend

        # fixed intrinsics (reference networks.py:172-174)
        camera_fovy = math.atan(1.0 / 2.5) * 2
        self.cam_proj = cam.perspective_projection(camera_fovy, ratio=1.0 / ratio)

        mesh = load_obj(mesh_name, with_materials=True)
        vertices_init = mesh_ops.normalize_template(mesh.vertices, init_ellipsoid)

        faces = mesh.faces.astype(np.int32)
        self.uvs = mesh.uvs
        face_uvs = mesh.uvs[mesh.face_uvs_idx]  # (F, 3, 2)

        self.num_faces = faces.shape[0]
        self.num_vertices = vertices_init.shape[0]

        self.flip_index = jnp.asarray(mesh_ops.flip_index(vertices_init))
        edges, e2f = mesh_ops.edge2faces(faces)
        self.edges = jnp.asarray(edges)
        self.edge2faces = jnp.asarray(e2f)
        self.vertices_laplacian_matrix = jnp.asarray(
            mesh_ops.uniform_laplacian(self.num_vertices, faces))

        self.vertices_init = jnp.asarray(vertices_init)  # (V, 3), initial template
        self.sign_init = jnp.sign(self.vertices_init[:, 2])
        self.faces = jnp.asarray(faces)
        self.face_uvs = jnp.asarray(face_uvs)

    # ------------------------------------------------------------------ render
    def render(self, no_mask: bool = False, **attributes):
        """Forward render (reference networks.py:258-324).

        Returns (rgba (B, H, W, 4), attributes) where attributes is extended
        with 'face_normals' and 'imnormal'.
        """
        azimuths = attributes["azimuths"]
        elevations = attributes["elevations"]
        distances = attributes["distances"]
        biases = attributes["biases"]
        bg = attributes.get("bg")
        vertices = attributes["vertices"]
        textures = attributes["textures"]
        lights = attributes["lights"]
        batch_size = azimuths.shape[0]

        object_pos = jnp.concatenate(
            [biases, jnp.zeros((batch_size, 1), biases.dtype)], axis=1)
        camera_up = jnp.broadcast_to(
            jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32), (batch_size, 3))
        camera_pos = cam.camera_position_from_spherical_angles(
            distances, elevations, azimuths, degrees=True)
        cam_transform = cam.generate_transformation_matrix(
            camera_pos, object_pos, camera_up)

        face_vertices_camera, face_vertices_image, face_normals = cam.prepare_vertices(
            vertices, self.faces, self.cam_proj, cam_transform)

        num_faces = self.num_faces
        H, W = self.render_height, self.render_width

        dropped = None
        use_v4 = False
        if self.backend == "pallas" and self.soft_mode == "line":
            from ..ops.pallas.rasterize_v4 import _auto_cells

            br, nc = _auto_cells(H, W)
            use_v4 = (H % br == 0 and W % nc == 0
                      and (br * (W // nc)) % 128 == 0)
        if use_v4:
            # v4 fused kernel: phase 1 + winner uv/normal selection in ONE
            # Pallas launch, batched natively (no per-image map, no phase-2
            # gather pass).  Gradients: attrs via the differentiable phase-2
            # recompute, soft via the Pallas backward kernel (custom VJP in
            # ops/pallas/rasterize_v4.py).
            from ..ops.pallas.rasterize_v4 import (rasterize_fused_v4,
                                                   rasterize_fused_v5,
                                                   stream_enabled)
            from ..ops.pallas.rasterize_v6 import (DENSE_THRESHOLD,
                                                   rasterize_fused_v6,
                                                   v6_enabled)

            if v6_enabled(num_faces >= DENSE_THRESHOLD):
                # dense templates (SMPL-13776, sphere2): the banded
                # per-cell capacity cannot absorb the far-camera density
                # (VMEM/drops) — the flat interval stream can (v6)
                raster = rasterize_fused_v6
            else:
                raster = (rasterize_fused_v5 if stream_enabled()
                          else rasterize_fused_v4)
            face_idx, soft_mask, uv, normal, hard, dropped = (
                raster(
                    face_vertices_image, face_vertices_camera[:, :, :, 2],
                    face_normals[:, :, 2], self.face_uvs, face_normals,
                    sigmainv=self.sigmainv, height=H, width=W,
                    capacity=self.band_capacity))
            texmask = hard.reshape(batch_size, H, W, 1)
            texcoord = uv.reshape(batch_size, H, W, 2)
            imnormal = normal.reshape(batch_size, H, W, 3)
            soft_mask = soft_mask.reshape(batch_size, H, W)
            face_idx = face_idx.reshape(batch_size, H, W)
        else:
            face_normals_unit = face_normals[:, :, None, :].repeat(3, axis=2)
            face_attributes = [
                jnp.ones((batch_size, num_faces, 3, 1), dtype=jnp.float32),
                jnp.broadcast_to(self.face_uvs[None],
                                 (batch_size, num_faces, 3, 2)),
                face_normals_unit,
            ]

            backend = ("pallas" if self.backend.startswith("pallas")
                       else self.backend)
            image_features, soft_mask, face_idx = dibr_rasterization(
                H, W, face_vertices_camera[:, :, :, 2], face_vertices_image,
                face_attributes, face_normals[:, :, 2],
                sigmainv=self.sigmainv, backend=backend,
                soft_mode=self.soft_mode)

            texmask, texcoord, imnormal = image_features

        # texcolor is only ever consumed MASKED by coverage (reference
        # networks.py:307-313) — the ragged cell-windowed kernel computes
        # texture_mapping(uv) * texmask directly (exact, with a dense
        # fallback on stream overflow; see ops/pallas/texture_cells.py)
        masked_tex = tex_dropped = None
        if use_v4:
            from ..ops.pallas.texture_cells import (enabled, supported,
                                                    texture_render)

            Ht_t, Wt_t, C_t = (textures.shape[1], textures.shape[2],
                               textures.shape[3])
            if enabled() and supported(H, W, Ht_t, Wt_t, C_t):
                masked_tex, tex_dropped = texture_render(
                    texcoord, textures, texmask[..., 0])
        if masked_tex is None:
            texcolor = texture_mapping(texcoord, textures, mode="bilinear")
            masked_tex = texcolor * texmask
        coef = spherical_harmonic_lighting(imnormal, lights)
        if no_mask:
            image = masked_tex + bg * (1.0 - texmask)
            image = image * coef[..., None]
        else:
            image = masked_tex * coef[..., None] + (1.0 - texmask)
        render_img = jnp.clip(image, 0.0, 1.0)

        rgbs = jnp.concatenate([render_img, soft_mask[..., None]], axis=-1)

        attributes = dict(attributes)
        attributes["face_normals"] = face_normals
        attributes["imnormal"] = imnormal  # visualize only, not trained
        if dropped is not None:
            # capacity-overflow diagnostic of the banded kernel: (B,) int32
            # count of (band, face) pairs past band_capacity; 0 = exact
            attributes["dropped_faces"] = dropped
        if tex_dropped is not None:
            # texture-cell stream overflow diagnostic: (B,) int32 chunks past
            # capacity; nonzero images rendered via the (exact) dense
            # fallback — monitor to retune MAGICMIRROR_TEX_CAP
            attributes["dropped_tex_chunks"] = tex_dropped
        # landmark-consistency inputs (the reference sketches these at
        # networks.py:322 but leaves them commented out — --lambda_lc crashes
        # there; we emit them so the feature works): per-face projected 2D
        # center and a front-facing visibility mask
        attributes["faces_image"] = jnp.mean(face_vertices_image, axis=2)
        attributes["visiable_faces"] = (
            face_normals[:, :, 2] > 0).astype(jnp.float32)
        return rgbs, attributes

    # ------------------------------------------------------------------ losses
    def recon_att(self, pred_att, target_att, L1=False, chamfer=False, azim=1.0):
        return att_losses.recon_att(pred_att, target_att, L1=L1, chamfer=chamfer,
                                    azim=azim)

    def recon_data(self, pred_data, gt_data, no_mask=False, contour=0.0):
        return recon.recon_data(pred_data, gt_data, image_weight=self.image_weight,
                                no_mask=no_mask, contour=contour)

    def recon_flip(self, att, L1=False):
        return mesh_reg.flip_loss(att["delta_vertices"], self.flip_index,
                                  self.sign_init, L1=L1)

    def calc_reg_loss(self, att):
        return mesh_reg.laplacian_flat_loss(
            att["delta_vertices"], att["face_normals"],
            self.vertices_laplacian_matrix, self.edge2faces,
            lambda_lpl=self.lambda_lpl, lambda_flat=self.lambda_flat)

    def calc_reg_edge(self, vertices):
        return mesh_reg.edge_loss(vertices, self.edges)

    def calc_reg_depth(self, vertices):
        return mesh_reg.depth_loss(vertices)

    def calc_reg_depthR(self, vertices, temp=2.0, eps=0.001):
        return mesh_reg.depth_loss_R(vertices, self.sign_init, ratio=self.ratio,
                                     temp=temp, eps=eps)

    def calc_reg_depthC(self, vertices, eps=0.001):
        return mesh_reg.depth_loss_C(vertices, self.sign_init, ratio=self.ratio,
                                     eps=eps)

    def calc_reg_deform(self, delta_vertices):
        return mesh_reg.deform_loss(delta_vertices)


def deep_copy(att: dict, index=None, detach: bool = False) -> dict:
    """Select/clone the renderable subset of an attribute dict
    (reference networks.py:146-161).  In JAX arrays are immutable, so "clone"
    is the identity and "detach" is ``stop_gradient``."""
    import jax

    copy_keys = ["azimuths", "bg", "biases", "elevations", "distances",
                 "vertices", "delta_vertices", "textures", "lights"]
    out = {}
    for key in copy_keys:
        if key not in att:
            continue
        value = att[key]
        if value is None:
            out[key] = None
            continue
        if index is not None:
            value = value[index]
        if detach:
            value = jax.lax.stop_gradient(value)
        out[key] = value
    return out
