"""Pallas rasterizer vs XLA backend consistency (interpret mode on CPU)."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
import pytest

from hierarchicalprobabilistic3dhuman_tpu.ops.rasterizer import rasterize
import hierarchicalprobabilistic3dhuman_tpu.ops.rasterizer_pallas as rp

RNG = np.random.RandomState(77)


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", partial(pl.pallas_call, interpret=True))


def _compare(verts, faces, attrs, hw):
    o_x = rasterize(verts, faces, attrs, hw, backend="xla")
    o_p = rp.rasterize_batched_pallas(verts, faces, attrs, hw)
    mx = np.asarray(o_x["mask"])
    mp = np.asarray(o_p["mask"])
    np.testing.assert_array_equal(mx, mp)
    same = mx & mp
    np.testing.assert_allclose(np.asarray(o_p["attrs"])[same],
                               np.asarray(o_x["attrs"])[same], atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_p["depth"])[same],
                               np.asarray(o_x["depth"])[same], atol=1e-4)


def test_triangles_match_xla(interpret_pallas):
    verts = jnp.asarray(np.array([[
        [4.0, 4.0, 2.0], [28.0, 4.0, 2.0], [4.0, 28.0, 2.0],
        [0.0, 0.0, 5.0], [60.0, 0.0, 5.0], [0.0, 60.0, 5.0],
    ]], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    attrs = jnp.asarray(np.array([[[1, 0]] * 3 + [[0, 1]] * 3], np.float32))
    _compare(verts, faces, attrs, (64, 64))


def test_random_mesh_matches_xla(interpret_pallas):
    """Random small mesh: binning + z-buffer semantics identical to XLA."""
    V, F, B = 60, 40, 2
    verts = jnp.asarray(np.stack([
        np.stack([RNG.rand(V) * 60, RNG.rand(V) * 60, RNG.rand(V) * 3 + 1],
                 axis=-1) for _ in range(B)]).astype(np.float32))
    faces = jnp.asarray(RNG.randint(0, V, (F, 3)).astype(np.int32))
    attrs = jnp.asarray(RNG.rand(B, V, 5).astype(np.float32))
    _compare(verts, faces, attrs, (64, 64))


def test_face_tables_pack(interpret_pallas):
    verts = jnp.asarray(RNG.rand(1, 30, 3).astype(np.float32) * 50)
    faces = jnp.asarray(RNG.randint(0, 30, (10, 3)).astype(np.int32))
    attrs = jnp.ones((1, 30, 4))
    geom_t, at, ranges = rp.pack_face_tables(verts, faces, attrs)
    assert geom_t.shape == (1, 16, rp.FACE_CHUNK)
    assert at.shape == (1, rp.FACE_CHUNK, 12)
    assert ranges.shape == (1, 1, 4)  # [rmin, rmax, cmin, cmax]
    r = np.asarray(ranges[0, 0])
    fv = np.asarray(verts)[0][np.asarray(faces)]
    assert r[0] <= fv[..., 1].min() and r[1] >= fv[..., 1].max() - 1
    assert r[2] <= fv[..., 0].min() and r[3] >= fv[..., 0].max() - 1


def test_choose_tile_dims_default_and_divisibility():
    """The measured-fastest 16x16 default applies whenever it divides the
    image (SMEM no longer constrains the choice: the work lists stream
    through fixed TILE_GROUP-row windows — benchmarks/tpu_checks.py
    render_512 caught the whole-array-resident version exhausting SMEM at
    512^2 because SMEM windows pad their last dim to 128 lanes); for
    non-divisible images (e.g. 384x288, HRNet's input size) the chosen pair
    must still divide the image exactly or the kernel grid assert trips."""
    assert rp._choose_tile_dims(256, 256) == (16, 16)
    assert rp._choose_tile_dims(512, 512) == (16, 16)
    assert rp._choose_tile_dims(1024, 1024) == (16, 16)
    for H, W in ((384, 288), (384, 384), (512, 384), (768, 512),
                 (100, 90), (60, 60)):
        th, tw = rp._choose_tile_dims(H, W)
        assert H % th == 0 and W % tw == 0, (H, W, th, tw)


def test_tile_axis_padding_to_tile_group(interpret_pallas):
    """Image sizes whose tile count is not a multiple of TILE_GROUP (e.g.
    96^2 at 16x16 -> 36 tiles) must render identically — the padded
    work-list rows are never visited by the grid."""
    H = W = 96
    th, tw = rp._choose_tile_dims(H, W)
    assert ((H // th) * (W // tw)) % rp.TILE_GROUP != 0  # the case under test
    V, F, B = 50, 30, 2
    rng = np.random.RandomState(5)
    verts = jnp.asarray(np.stack([
        np.stack([rng.rand(V) * (W - 2), rng.rand(V) * (H - 2),
                  rng.rand(V) * 3 + 1], axis=-1) for _ in range(B)]
    ).astype(np.float32))
    faces = jnp.asarray(rng.randint(0, V, (F, 3)).astype(np.int32))
    attrs = jnp.asarray(rng.rand(B, V, 4).astype(np.float32))
    _compare(verts, faces, attrs, (H, W))
