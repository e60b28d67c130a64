"""Textured IUV / RGB / silhouette / depth renderer on TPU.

Replaces the reference's pytorch3d-based TexturedIUVRenderer
(renderers/pytorch3d_textured_renderer.py:73-289) with the JAX rasterizer in
ops/rasterizer.py. Same three use-cases:

  * train synthetic data: perspective camera, UV-atlas textured RGB + IUV;
  * eval: orthographic silhouettes (I channel > 0);
  * predict: orthographic per-vertex-colour visualisation renders.

Camera convention: the pytorch3d 180-degree-z-rotation dance in the reference
(:153-163) exists only to cancel pytorch3d's NDC axes; its NET projection is
the plain pinhole x_pix = f*(X+tx)/(Z+tz) + W/2, y_pix = f*(Y+ty)/(Z+tz) + H/2
(identical to utils/cam_utils perspective_project, which the reference uses
for joint targets) — so that is what we implement directly. Orthographic:
x_pix = scale*(W/2)*(X+tx) + W/2 (reference :176 focal = scale*wh/2).

DensePose UV preprocessing (:22-70) is vectorised (first-face-wins UV offsets,
last-face-wins vertex part labels — preserving the reference's exact
assignment semantics) and cached per process.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from scipy.io import loadmat

from hierarchicalprobabilistic3dhuman_tpu.configs import paths
from hierarchicalprobabilistic3dhuman_tpu.ops.rasterizer import rasterize


@lru_cache(maxsize=2)
def preprocess_densepose_UV(uv_path=None):
    """Load UV_Processed.mat and compute atlas-offset UVs + per-vertex IUV.

    :return dict of numpy arrays:
        faces (13774, 3) int32 into DP vertex indexing,
        verts_map (7829,) int32 DP vertex -> SMPL vertex,
        verts_uv_offset (7829, 2) atlas UVs (6x4 grid of 24 parts),
        verts_iuv (7829, 3) [part, U, 1-V] per vertex.
    """
    uv_path = uv_path or paths.DP_UV_PROCESSED_FILE
    DP_UV = loadmat(uv_path)
    face_parts = DP_UV["All_FaceIndices"].squeeze().astype(np.int32)      # (F,)
    faces = (DP_UV["All_Faces"] - 1).astype(np.int32)                     # (F, 3)
    verts_map = (DP_UV["All_vertices"][0] - 1).astype(np.int32)           # (Vd,)
    u_norm = DP_UV["All_U_norm"].astype(np.float32)[:, 0]                 # (Vd,)
    v_norm = DP_UV["All_V_norm"].astype(np.float32)[:, 0]

    # Atlas offsets: 4 columns (u) x 6 rows (v); part = 6*i + j + 1.
    cols_n, rows_n = 4, 6
    offset_u = np.zeros(25, np.float32)
    offset_v = np.zeros(25, np.float32)
    for i, u in enumerate(np.linspace(0, 1, cols_n, endpoint=False)):
        for j, v in enumerate(np.linspace(0, 1, rows_n, endpoint=False)):
            part = rows_n * i + j + 1
            offset_u[part] = u
            offset_v[part] = v

    flat = faces.reshape(-1)                      # (3F,) vertex ids in face order
    flat_parts = np.repeat(face_parts, 3)         # (3F,)
    # First face containing each vertex decides its UV-offset part
    _, first_idx = np.unique(flat, return_index=True)
    part_first = np.zeros(len(verts_map), np.int32)
    part_first[flat[first_idx]] = flat_parts[first_idx]
    # Last face containing each vertex decides its IUV part label
    rev = flat[::-1]
    _, last_rev_idx = np.unique(rev, return_index=True)
    last_idx = len(flat) - 1 - last_rev_idx
    part_last = np.zeros(len(verts_map), np.int32)
    part_last[flat[last_idx]] = flat_parts[last_idx]

    u_off = u_norm / cols_n + offset_u[part_first]
    v_off = (1.0 - v_norm) / rows_n + offset_v[part_first]  # each part locally flipped
    v_off = 1.0 - v_off                                      # pytorch3d-style V flip
    verts_uv_offset = np.stack([u_off, v_off], axis=-1)

    verts_iuv = np.stack([part_last.astype(np.float32), u_norm, 1.0 - v_norm], axis=-1)

    return {"faces": faces, "verts_map": verts_map,
            "verts_uv_offset": verts_uv_offset, "verts_iuv": verts_iuv}


def _vertex_normals(verts, faces):
    """Area-weighted per-vertex normals. verts (B, V, 3), faces (F, 3)."""
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)             # (B, F, 3), area-weighted
    V = verts.shape[1]
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[:, faces[:, k]].add(fn)
    norm = jnp.linalg.norm(vn, axis=-1, keepdims=True)
    return vn / jnp.maximum(norm, 1e-12)


def _sample_texture_bilinear(tex, u, v, mask):
    """tex (tH, tW, 3); u/v (H, W) in [0, 1], v measured UP (pytorch3d style)."""
    tH, tW = tex.shape[:2]
    x = jnp.clip(u, 0.0, 1.0) * (tW - 1)
    y = (1.0 - jnp.clip(v, 0.0, 1.0)) * (tH - 1)
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx = x - x0; wy = y - y0
    x0 = x0.astype(jnp.int32); y0 = y0.astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, tW - 1); y1 = jnp.clip(y0 + 1, 0, tH - 1)
    flat = tex.reshape(-1, 3)
    def g(yy, xx):
        return flat[(yy * tW + xx).reshape(-1)].reshape(u.shape + (3,))
    out = ((1 - wx)[..., None] * (1 - wy)[..., None] * g(y0, x0)
           + wx[..., None] * (1 - wy)[..., None] * g(y0, x1)
           + (1 - wx)[..., None] * wy[..., None] * g(y1, x0)
           + wx[..., None] * wy[..., None] * g(y1, x1))
    return out * mask[..., None]


class TexturedIUVRenderer:
    """Batch renderer for SMPL meshes with DensePose IUV/texture surfaces.

    Mirrors the reference's constructor surface (img_wh, projection_type,
    perspective_focal_length, orthographic_scale, cam_t, lights, render_rgb)
    — renderers/pytorch3d_textured_renderer.py:73-137 — minus the
    pytorch3d-specific rasterization knobs (bin_size etc.), which the TPU
    backend chooses itself.
    """

    def __init__(self,
                 img_wh=256,
                 projection_type="perspective",
                 perspective_focal_length=300.0,
                 orthographic_scale=0.9,
                 cam_t=None,
                 render_rgb=False,
                 light_t=(0.0, 0.0, -2.0),
                 light_ambient_color=(0.5, 0.5, 0.5),
                 light_diffuse_color=(0.3, 0.3, 0.3),
                 light_specular_color=(0.2, 0.2, 0.2),
                 background_color=(0.0, 0.0, 0.0),
                 uv_path=None,
                 backend="auto",
                 texture_mode="vertex"):
        """texture_mode:
        'vertex' — sample the UV atlas once per mesh VERTEX and interpolate
            colours barycentrically. At SMPL density (13.8k faces spanning
            1-3 px at 256^2) this is visually equivalent to per-pixel
            sampling and ~8x fewer gathers (the per-pixel atlas gather was
            measured as the single largest cost of the training step).
        'pixel' — classic per-pixel UV sampling (pytorch3d-equivalent).
        """
        assert projection_type in ("perspective", "orthographic")
        assert texture_mode in ("vertex", "pixel")
        self.texture_mode = texture_mode
        if backend == "auto":
            # Pallas kernel on TPU; lax.scan formulation elsewhere (the Pallas
            # interpreter on CPU is far slower than the XLA backend).
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.img_wh = img_wh
        self.projection_type = projection_type
        self.focal_length = float(perspective_focal_length)
        self.orthographic_scale = orthographic_scale
        self.render_rgb = render_rgb
        self.backend = backend
        self.background_color = jnp.asarray(background_color, jnp.float32)
        self.default_cam_t = jnp.asarray(
            cam_t if cam_t is not None else [0.0, 0.2, 2.5], jnp.float32)
        self.default_lights = {
            "location": jnp.asarray(light_t, jnp.float32),
            "ambient_color": jnp.asarray(light_ambient_color, jnp.float32),
            "diffuse_color": jnp.asarray(light_diffuse_color, jnp.float32),
            "specular_color": jnp.asarray(light_specular_color, jnp.float32),
        }

        dp = preprocess_densepose_UV(uv_path)
        self.faces = jnp.asarray(dp["faces"])
        self.verts_map = jnp.asarray(dp["verts_map"])
        self.verts_uv_offset = jnp.asarray(dp["verts_uv_offset"])
        self.verts_iuv = jnp.asarray(dp["verts_iuv"])

    # -- projection --------------------------------------------------------

    def _to_screen(self, verts, cam_t, orthographic_scale=None):
        """verts (B, V, 3) + cam_t (B, 3) -> screen [x_pix, y_pix, z]."""
        wh = self.img_wh
        p = verts + cam_t[:, None, :]
        if self.projection_type == "perspective":
            z = p[..., 2:3]
            xy = self.focal_length * p[..., :2] / z + wh / 2.0
            return jnp.concatenate([xy, z], axis=-1)
        scale = orthographic_scale if orthographic_scale is not None \
            else self.orthographic_scale
        scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (verts.shape[0], 2))
        xy = scale[:, None, :] * (wh / 2.0) * p[..., :2] + wh / 2.0
        # Shift z so depth stays positive for the z-buffer (ortho z can be <= 0).
        z = p[..., 2:3] - jnp.min(p[..., 2]) + 1.0
        return jnp.concatenate([xy, z], axis=-1)

    # -- shading -----------------------------------------------------------

    def _phong(self, texel, normal, world_pos, lights, mask, shininess=64.0):
        """pytorch3d HardPhongShader-style point-light shading.

        Light settings may be unbatched (3,) or per-example (B, 3); per-example
        values broadcast over the spatial dims.
        """
        def expand(v):
            v = jnp.asarray(v)
            if v.ndim == 2:  # (B, 3) -> (B, 1, 1, 3)
                return v[:, None, None, :]
            return v

        lights = {k: expand(v) for k, v in lights.items()}
        light_loc = jnp.broadcast_to(lights["location"], world_pos.shape)
        l_dir = light_loc - world_pos
        l_dir = l_dir / jnp.maximum(jnp.linalg.norm(l_dir, axis=-1, keepdims=True), 1e-9)
        n = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
        # Camera at origin looking +z; view direction from point to camera.
        v_dir = -world_pos
        v_dir = v_dir / jnp.maximum(jnp.linalg.norm(v_dir, axis=-1, keepdims=True), 1e-9)
        ndotl = jnp.maximum(jnp.sum(n * l_dir, axis=-1, keepdims=True), 0.0)
        r = 2.0 * ndotl * n - l_dir
        rdotv = jnp.maximum(jnp.sum(r * v_dir, axis=-1, keepdims=True), 0.0)
        ambient = lights["ambient_color"]
        diffuse = lights["diffuse_color"] * ndotl
        specular = lights["specular_color"] * (rdotv ** shininess)
        color = texel * (ambient + diffuse) + specular
        return color * mask[..., None]

    # -- forward -----------------------------------------------------------

    def __call__(self, vertices, textures=None, cam_t=None, orthographic_scale=None,
                 lights_rgb_settings=None, verts_features=None):
        """Render a batch of SMPL meshes.

        :param vertices: (B, 6890, 3) SMPL-indexed vertices (camera frame)
        :param textures: (B, tH, tW, 3) UV texture atlases (for RGB render)
        :param cam_t: (B, 3) camera translation (default: ctor value)
        :param orthographic_scale: (B, 2) per-example ortho scale override
        :param lights_rgb_settings: dict like default_lights, values (B, 3)
        :param verts_features: (B, 6890, 3) per-vertex RGB (overrides textures)
        :return: dict iuv_images (B, H, W, 3), depth_images (B, H, W),
                 rgb_images (B, H, W, 3) when render_rgb.
        """
        B = vertices.shape[0]
        if cam_t is None:
            cam_t = jnp.broadcast_to(self.default_cam_t, (B, 3))
        lights = lights_rgb_settings or {
            k: jnp.broadcast_to(v, (B, 3)) for k, v in self.default_lights.items()}

        verts_dp = vertices[:, self.verts_map, :]          # (B, 7829, 3)
        screen = self._to_screen(verts_dp, cam_t, orthographic_scale)
        cam_space = verts_dp + cam_t[:, None, :]

        # Attribute layout: [IUV(3)] + (if rgb) [normal(3) | campos(3) | colour],
        # where colour is per-vertex RGB (3) in vertex/features mode or the
        # atlas UV (2) in per-pixel texture mode.
        attrs = [jnp.broadcast_to(self.verts_iuv, (B,) + self.verts_iuv.shape)]
        want_rgb = self.render_rgb
        pixel_texture = (want_rgb and verts_features is None
                         and self.texture_mode == "pixel"
                         and textures is not None and textures.ndim == 4)
        if want_rgb:
            attrs.append(_vertex_normals(cam_space, self.faces))
            attrs.append(cam_space)
            if verts_features is not None:
                attrs.append(verts_features[:, self.verts_map, :])
            elif (textures is not None and textures.ndim == 3
                  and textures.shape[1] == self.verts_uv_offset.shape[0]):
                # Pre-sampled per-vertex texels (B, 7829, 3) — e.g. packed at
                # data-prep time by data/pack_training_stores.py. Skips the
                # per-step atlas gather entirely (and shrinks the host->device
                # texture payload ~125x vs the full 1200x800 atlas).
                attrs.append(textures)
            elif self.texture_mode == "vertex":
                # Sample the atlas once per vertex; colours interpolate
                # barycentrically during rasterization.
                N = self.verts_uv_offset.shape[0]
                u = jnp.broadcast_to(self.verts_uv_offset[:, 0], (B, N))
                v = jnp.broadcast_to(self.verts_uv_offset[:, 1], (B, N))
                texel_v = jax.vmap(_sample_texture_bilinear)(
                    textures, u, v, jnp.ones((B, N), bool))
                attrs.append(texel_v)
            else:
                attrs.append(jnp.broadcast_to(self.verts_uv_offset,
                                              (B,) + self.verts_uv_offset.shape))
        vert_attrs = jnp.concatenate(attrs, axis=-1)

        out = rasterize(screen, self.faces, vert_attrs, (self.img_wh, self.img_wh),
                        backend=self.backend)
        A = out["attrs"]
        mask = out["mask"]
        result = {
            "iuv_images": A[..., :3] * mask[..., None],
            "depth_images": jnp.where(mask, out["depth"], 0.0),
            "silhouettes": mask.astype(jnp.float32),
        }
        if want_rgb:
            normal = A[..., 3:6]
            campos = A[..., 6:9]
            if pixel_texture:
                uv = A[..., 9:11]
                texel = jax.vmap(_sample_texture_bilinear)(
                    textures, uv[..., 0], uv[..., 1], mask)
            else:
                texel = A[..., 9:12]
            rgb = self._phong(texel, normal, campos, lights, mask)
            bg = self.background_color
            rgb = jnp.where(mask[..., None], rgb, bg)
            result["rgb_images"] = jnp.clip(rgb, 0.0, 1.0)
        return result
