"""Rasterizer + TexturedIUVRenderer tests: occlusion, projection consistency,
IUV semantics, Phong shading behaviour."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hierarchicalprobabilistic3dhuman_tpu.ops.rasterizer import rasterize
from hierarchicalprobabilistic3dhuman_tpu.renderers.textured_iuv_renderer import (
    TexturedIUVRenderer, preprocess_densepose_UV)
from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
from hierarchicalprobabilistic3dhuman_tpu.utils.cam_utils import perspective_project

RNG = np.random.RandomState(9)


def make_uv_sphere(n_lat=12, n_lon=16, radius=1.0):
    """Simple UV sphere mesh with outward-wound faces."""
    verts, faces = [], []
    for i in range(n_lat + 1):
        theta = np.pi * i / n_lat
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append([radius * np.sin(theta) * np.cos(phi),
                          radius * np.cos(theta),
                          radius * np.sin(theta) * np.sin(phi)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return np.array(verts, np.float32), np.array(faces, np.int32)


def test_occlusion_and_interpolation():
    verts = jnp.asarray(np.array([[
        [8.0, 8.0, 2.0], [56.0, 8.0, 2.0], [8.0, 56.0, 2.0],
        [0.0, 0.0, 5.0], [63.0, 0.0, 5.0], [0.0, 63.0, 5.0],
    ]], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    attrs = jnp.asarray(np.array([[[1, 0]] * 3 + [[0, 1]] * 3], np.float32))
    out = rasterize(verts, faces, attrs, (64, 64))
    a = np.asarray(out["attrs"][0])
    d = np.asarray(out["depth"][0])
    assert a[20, 20, 0] == 1.0 and d[20, 20] == pytest.approx(2.0)
    assert a[5, 50, 1] == 1.0 and d[5, 50] == pytest.approx(5.0, abs=1e-4)
    assert not np.asarray(out["mask"][0])[63, 63]


def test_sphere_projection_position_matches_pinhole():
    """Sphere rendered at (X, Y, Z) appears centred at its pinhole projection."""
    v, f = make_uv_sphere(radius=0.2)
    centre = np.array([0.3, -0.2, 2.5], np.float32)
    verts = jnp.asarray((v + centre)[None])
    focal, wh = 300.0, 128
    # screen transform: x = f*X/Z + wh/2
    z = verts[..., 2:3]
    screen = jnp.concatenate([focal * verts[..., :2] / z + wh / 2, z], axis=-1)
    attrs = jnp.ones((1, v.shape[0], 1))
    out = rasterize(screen, jnp.asarray(f), attrs, (wh, wh))
    mask = np.asarray(out["mask"][0])
    pix = np.argwhere(mask)
    rendered_centre = (pix.min(0) + pix.max(0)) / 2.0  # (row, col)
    expected = perspective_project(jnp.asarray(centre[None, None]), None,
                                   jnp.zeros((1, 3)), focal_length=focal, img_wh=wh)
    exp_col, exp_row = np.asarray(expected[0, 0])
    np.testing.assert_allclose(rendered_centre, [exp_row, exp_col], atol=2.0)
    # Radius check: projected radius ~ f * r / Z
    approx_radius = (pix.max(0) - pix.min(0)).mean() / 2.0
    np.testing.assert_allclose(approx_radius, focal * 0.2 / 2.5, rtol=0.1)


def test_depth_is_nearest_surface():
    v, f = make_uv_sphere(radius=0.5)
    verts = jnp.asarray((v + np.array([0, 0, 3.0], np.float32))[None])
    z = verts[..., 2:3]
    screen = jnp.concatenate([300.0 * verts[..., :2] / z + 64, z], axis=-1)
    out = rasterize(screen, jnp.asarray(f), jnp.ones((1, v.shape[0], 1)), (128, 128))
    d = np.asarray(out["depth"][0])
    centre_depth = d[64, 64]
    np.testing.assert_allclose(centre_depth, 2.5, atol=0.05)  # front surface


def test_dp_preprocessing():
    dp = preprocess_densepose_UV()
    assert dp["faces"].shape == (13774, 3)
    assert dp["verts_map"].shape == (7829,)
    assert dp["verts_map"].max() < 6890
    assert dp["verts_iuv"].shape == (7829, 3)
    parts = dp["verts_iuv"][:, 0]
    assert parts.min() >= 1 and parts.max() <= 24
    uv = dp["verts_uv_offset"]
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    # atlas offsets: each vertex's offset cell matches a part in [1, 24]
    # (u in its column band, v in its row band)
    col = np.floor(uv[:, 0] * 4).clip(0, 3)
    row = np.floor((1.0 - uv[:, 1]) * 6).clip(0, 5)  # v was flipped
    assert col.shape == row.shape


@pytest.mark.slow
def test_renderer_iuv_and_silhouette():
    smpl = SMPL.synthetic()
    out_smpl = smpl(batch_size=1)
    renderer = TexturedIUVRenderer(img_wh=64, projection_type="orthographic",
                                   orthographic_scale=0.9)
    out = renderer(out_smpl["vertices"])
    iuv = np.asarray(out["iuv_images"])
    sil = np.asarray(out["silhouettes"])
    assert iuv.shape == (1, 64, 64, 3)
    assert sil.sum() > 100  # body covers a reasonable area
    # part index channel: 0 on background, ~[1, 24] on body. At part
    # boundaries the I channel blends between part values (barycentric
    # interpolation of TexturesVertex — the reference has the same artifact
    # and rounds downstream, train driver :195).
    body = sil > 0
    assert np.all(iuv[..., 0][~body] == 0)
    parts = np.round(iuv[..., 0][body])
    assert parts.min() >= 1.0 and parts.max() <= 24.0
    # silhouette == (I > 0), the eval driver's binarisation (evaluate :149-155)
    np.testing.assert_allclose((iuv[..., 0] > 0).astype(np.float32), sil)


@pytest.mark.slow
def test_renderer_orthographic_scale_behaviour():
    smpl = SMPL.synthetic()
    verts = smpl(batch_size=1)["vertices"]
    r_small = TexturedIUVRenderer(img_wh=128, projection_type="orthographic",
                                  orthographic_scale=0.4)
    r_big = TexturedIUVRenderer(img_wh=128, projection_type="orthographic",
                                orthographic_scale=0.8)
    a_small = np.asarray(r_small(verts)["silhouettes"]).sum()
    a_big = np.asarray(r_big(verts)["silhouettes"]).sum()
    np.testing.assert_allclose(a_big / a_small, 4.0, rtol=0.2)  # area ~ scale^2


@pytest.mark.slow
def test_renderer_rgb_vertex_features():
    smpl = SMPL.synthetic()
    verts = smpl(batch_size=1)["vertices"]
    renderer = TexturedIUVRenderer(img_wh=128, projection_type="orthographic",
                                   render_rgb=True,
                                   light_ambient_color=(1.0, 1.0, 1.0),
                                   light_diffuse_color=(0.0, 0.0, 0.0),
                                   light_specular_color=(0.0, 0.0, 0.0))
    feats = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (1, 6890, 3))
    out = renderer(verts, verts_features=feats)
    rgb = np.asarray(out["rgb_images"][0])
    mask = np.asarray(out["silhouettes"][0]) > 0
    # ambient-only lighting: body pixels exactly the vertex colour
    np.testing.assert_allclose(rgb[mask][:, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(rgb[mask][:, 1:], 0.0, atol=1e-4)
    np.testing.assert_allclose(rgb[~mask], 0.0, atol=1e-6)


@pytest.mark.slow
def test_renderer_rgb_texture_atlas():
    smpl = SMPL.synthetic()
    verts = smpl(batch_size=1)["vertices"]
    renderer = TexturedIUVRenderer(img_wh=128, projection_type="orthographic",
                                   render_rgb=True,
                                   light_ambient_color=(1.0, 1.0, 1.0),
                                   light_diffuse_color=(0.0, 0.0, 0.0),
                                   light_specular_color=(0.0, 0.0, 0.0))
    tex = jnp.asarray(np.full((1, 512, 512, 3), 0.5, np.float32))
    out = renderer(verts, textures=tex)
    rgb = np.asarray(out["rgb_images"][0])
    mask = np.asarray(out["silhouettes"][0]) > 0
    np.testing.assert_allclose(rgb[mask], 0.5, atol=1e-3)


@pytest.mark.slow
def test_renderer_diffuse_lighting_shades():
    smpl = SMPL.synthetic()
    verts = smpl(batch_size=1)["vertices"]
    renderer = TexturedIUVRenderer(img_wh=128, projection_type="orthographic",
                                   render_rgb=True,
                                   light_ambient_color=(0.0, 0.0, 0.0),
                                   light_diffuse_color=(1.0, 1.0, 1.0),
                                   light_specular_color=(0.0, 0.0, 0.0))
    feats = jnp.ones((1, 6890, 3))
    out = renderer(verts, verts_features=feats)
    rgb = np.asarray(out["rgb_images"][0])
    mask = np.asarray(out["silhouettes"][0]) > 0
    vals = rgb[mask].mean(axis=-1)
    assert vals.max() <= 1.0 + 1e-6
    assert vals.std() > 0.01  # diffuse term produces shading variation


def test_snap_chunk_picks_largest_divisor():
    """A non-power-of-two chunk must snap to a divisor of Fp, not degrade to
    1 via halving (advisor round-4): 192 against Fp=1280 -> 160, not 1."""
    from hierarchicalprobabilistic3dhuman_tpu.ops.rasterizer import _snap_chunk
    assert _snap_chunk(1280, 192) == 160
    assert _snap_chunk(1280, 256) == 256
    assert _snap_chunk(1280, 100000) == 1280
    assert _snap_chunk(128, 128) == 128
    assert _snap_chunk(128, 7) == 4
