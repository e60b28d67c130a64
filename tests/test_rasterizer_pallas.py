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


def test_choose_tile_dims_respects_smem_budget():
    """The per-image SMEM work-list block (n_tiles x NC int32) must fit the
    ~1 MB TPU SMEM: at 512^2 the 16x16 default is 1024 tiles x 108 chunks
    x 4 B (x2 pipeline buffers) and failed to compile on real hardware
    (caught by the predict-CLI vis path, which renders at 512^2)."""
    NC = 108
    assert rp._choose_tile_dims(256, 256, NC) == (16, 16)  # fast default
    for H in (512, 1024, 2048):
        th, tw = rp._choose_tile_dims(H, H, NC)
        n_tiles = (H // th) * (H // tw)
        assert n_tiles * NC * 4 <= rp.SMEM_LIST_BUDGET_BYTES, (H, th, tw)
        assert H % th == 0 and H % tw == 0
    # Degenerate: budget impossible -> single tile, loop must terminate.
    th, tw = rp._choose_tile_dims(64, 64, 10**6)
    assert (th, tw) == (64, 64)


def test_choose_tile_dims_never_breaks_grid_divisibility():
    """Doubling must stop at the largest tile that still divides the image:
    at H=384 (the HRNet input height — a legal render size) a huge chunk
    count used to double 128 -> 256, which does not divide 384 and tripped
    the kernel's grid assert."""
    for H, W in ((384, 288), (384, 384), (512, 384), (768, 512)):
        for nc in (1, 108, 300, 3000, 10**5):
            th, tw = rp._choose_tile_dims(H, W, nc)
            assert H % th == 0 and W % tw == 0, (H, W, nc, th, tw)
    # Unchanged on the measured configs: 256^2 stays 16x16, 512^2 -> 32x32.
    assert rp._choose_tile_dims(256, 256, 108) == (16, 16)
    assert rp._choose_tile_dims(512, 512, 108) == (32, 32)
