"""Pallas TPU rasterizer: tile-based z-buffered barycentric interpolation.

Same semantics as ops/rasterizer.py's XLA backend (edge-function coverage,
winner-take-all by depth, per-vertex attribute interpolation), reorganised for
TPU hardware:

  * grid over 2-D pixel TILES (default 32x32 = 1024 pixels, processed as a
    flat (P, .) block — no cross-lane reshapes, Mosaic-friendly);
  * the packed face tables live in VMEM (13774 faces ~ 3.5 MB), streamed
    through each tile in fixed-size chunks with a fori_loop — the z/attr
    accumulators stay on-chip for the whole tile;
  * faces are the LANE dimension: the geometry table is stored transposed
    (16, F) so per-face coefficients load as (1, FC) rows and broadcast
    against (P, 1) pixel coordinates;
  * attribute interpolation is three (P, FC) @ (FC, A) MXU matmuls with a
    one-hot winner mask;
  * 2-D COARSE BINNING: each 128-face chunk carries its [row_min, row_max,
    col_min, col_max] screen bbox; a tile skips chunks that miss it in
    EITHER axis. Faces keep their NATURAL order — the DensePose/SMPL
    triangulation is part-contiguous, so chunks are already spatially
    compact. (Round-2 sorted faces by min-y for row binning; the per-step
    take_along_axis reorder of the (B, F, 3, A) attribute table cost ~73 ms
    of the 185 ms train step at bs=72 — 40% — versus ~50 ms for the whole
    rasterize kernel. No sort, no gathers, and row+col skipping beats
    row-only.)

Geometry table rows (16, F):
  [a0, b0, c0, a1, b1, c1, a2, b2, c2, denom, z0, z1, z2, 0, 0, 0]
where e_k(x, y) = a_k x + b_k y + c_k are edge functions and denom is 2x the
signed area. Attribute table is (F, 3A): [attr_v0 | attr_v1 | attr_v2].
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30
PIXEL_BLOCK = 1024
TILE_W = 32
# 128 = one VPU lane width; tighter chunks bin better (measured 1.5x over 256
# on v5e at 256^2; 64 fails Mosaic lane constraints).
FACE_CHUNK = 128


def pack_face_tables(verts_screen, faces, vert_attrs, sort_by_y=False):
    """Precompute per-face geometry + attribute tables (jnp, batched).

    Faces keep their natural (part-contiguous) order; each FACE_CHUNK gets a
    screen-space bbox for the kernel's 2-D chunk-vs-tile culling.
    sort_by_y=True additionally sorts faces by min screen y (row binning for
    meshes whose native face order is NOT spatially local) at the cost of
    take_along_axis reorders of every table — expensive, see module
    docstring; off by default.

    :param verts_screen: (B, V, 3) [x_pix, y_pix, z]
    :param faces: (F, 3) int32
    :param vert_attrs: (B, V, A)
    :return: geom_t (B, 16, Fp), attrs (B, Fp, 3A),
             chunk_ranges (B, NC, 4) int32 [row_min, row_max, col_min,
             col_max] per face chunk (inclusive ranges)
    """
    fv = verts_screen[:, faces]          # (B, F, 3, 3)
    fa = vert_attrs[:, faces]            # (B, F, 3, A)
    x = fv[..., 0]
    y = fv[..., 1]
    z = fv[..., 2]

    if sort_by_y:
        order = jnp.argsort(jnp.min(y, axis=-1), axis=-1)   # (B, F)
        x = jnp.take_along_axis(x, order[..., None], axis=1)
        y = jnp.take_along_axis(y, order[..., None], axis=1)
        z = jnp.take_along_axis(z, order[..., None], axis=1)
        fa = jnp.take_along_axis(fa, order[..., None, None], axis=1)

    def edge(i, j):
        a = y[..., i] - y[..., j]
        b = x[..., j] - x[..., i]
        c = x[..., i] * y[..., j] - y[..., i] * x[..., j]
        return a, b, c

    a0, b0, c0 = edge(1, 2)
    a1, b1, c1 = edge(2, 0)
    a2, b2, c2 = edge(0, 1)
    denom = ((x[..., 1] - x[..., 0]) * (y[..., 2] - y[..., 0])
             - (y[..., 1] - y[..., 0]) * (x[..., 2] - x[..., 0]))
    zeros = jnp.zeros_like(denom)
    geom_t = jnp.stack([a0, b0, c0, a1, b1, c1, a2, b2, c2, denom,
                        z[..., 0], z[..., 1], z[..., 2], zeros, zeros, zeros],
                       axis=-2)          # (B, 16, F)
    B, F = x.shape[:2]
    A = fa.shape[-1]
    attrs = fa.reshape(B, F, 3 * A)

    pad = (-F) % FACE_CHUNK
    if pad:
        geom_t = jnp.concatenate(
            [geom_t, jnp.zeros((B, 16, pad), geom_t.dtype)], axis=2)
        attrs = jnp.concatenate(
            [attrs, jnp.zeros((B, pad, 3 * A), attrs.dtype)], axis=1)

    # Per-chunk screen bboxes. Degenerate faces (zero area, incl. padding)
    # get an empty range so pure-padding chunks never execute.
    degenerate = jnp.abs(denom) <= 1e-9

    def axis_ranges(coord):
        lo = jnp.where(degenerate, 1e9, jnp.min(coord, axis=-1))   # (B, F)
        hi = jnp.where(degenerate, -1e9, jnp.max(coord, axis=-1))
        if pad:
            lo = jnp.concatenate([lo, jnp.full((B, pad), 1e9)], axis=1)
            hi = jnp.concatenate([hi, jnp.full((B, pad), -1e9)], axis=1)
        NC = lo.shape[1] // FACE_CHUNK
        lo = jnp.floor(jnp.min(lo.reshape(B, NC, FACE_CHUNK), axis=-1))
        hi = jnp.ceil(jnp.max(hi.reshape(B, NC, FACE_CHUNK), axis=-1))
        return jnp.clip(lo, -1e9, 1e9), jnp.clip(hi, -1e9, 1e9)

    rmin, rmax = axis_ranges(y)
    cmin, cmax = axis_ranges(x)
    chunk_ranges = jnp.stack([rmin, rmax, cmin, cmax],
                             axis=-1).astype(jnp.int32)   # (B, NC, 4)
    return geom_t, attrs, chunk_ranges


def _raster_kernel(ranges_ref, geom_ref, attr_ref, attr_out_ref, depth_out_ref,
                   zbuf_ref, accum_ref, *, num_attrs, n_chunks, znear,
                   tile_h, tile_w, tiles_x):
    blk = pl.program_id(0)
    P = tile_h * tile_w
    A = num_attrs

    ty = blk // tiles_x
    tx = blk % tiles_x
    row0 = ty * tile_h
    col0 = tx * tile_w

    flat = lax.broadcasted_iota(jnp.int32, (P, 1), 0)      # (P, 1) in-tile ids
    py = (row0 + flat // tile_w).astype(jnp.float32) + 0.5
    px = (col0 + flat % tile_w).astype(jnp.float32) + 0.5

    # Scratch persists across grid steps: reset per tile.
    zbuf_ref[...] = jnp.full((P, 1), _INF, jnp.float32)
    accum_ref[...] = jnp.zeros((P, A), jnp.float32)

    def compute(c):
        zbuf = zbuf_ref[...]                                # (P, 1)
        attrs = accum_ref[...]                              # (P, A)
        sl = pl.ds(c * FACE_CHUNK, FACE_CHUNK)
        g = geom_ref[:, sl]                                 # (16, FC)
        fa = attr_ref[sl, :]                                # (FC, 3A)

        e0 = px * g[0:1] + py * g[1:2] + g[2:3]             # (P, FC)
        e1 = px * g[3:4] + py * g[4:5] + g[5:6]
        e2 = px * g[6:7] + py * g[7:8] + g[8:9]
        denom = g[9:10]                                     # (1, FC)

        pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (denom > 1e-9)
        neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0) & (denom < -1e-9)
        covered = pos | neg

        inv = 1.0 / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0)
        w0 = e0 * inv
        w1 = e1 * inv
        w2 = e2 * inv
        # Renormalise: FMA rounding makes w sums drift on sliver faces.
        wsum = w0 + w1 + w2
        inv_wsum = 1.0 / jnp.where(jnp.abs(wsum) > 1e-6, wsum, 1.0)
        w0 = w0 * inv_wsum
        w1 = w1 * inv_wsum
        w2 = w2 * inv_wsum
        zpix = w0 * g[10:11] + w1 * g[11:12] + w2 * g[12:13]
        covered = covered & (zpix > znear)
        zmasked = jnp.where(covered, zpix, _INF)            # (P, FC)

        chunk_zmin = jnp.min(zmasked, axis=1, keepdims=True)  # (P, 1)
        better = chunk_zmin < zbuf
        win_idx = jnp.argmin(zmasked, axis=1)                 # (P,)
        face_ids = lax.broadcasted_iota(jnp.int32, (P, FACE_CHUNK), 1)
        onehot = (face_ids == win_idx[:, None]) & (chunk_zmin < _INF) & better

        m0 = jnp.where(onehot, w0, 0.0)
        m1 = jnp.where(onehot, w1, 0.0)
        m2 = jnp.where(onehot, w2, 0.0)
        new_attr = (jnp.dot(m0, fa[:, :A], preferred_element_type=jnp.float32)
                    + jnp.dot(m1, fa[:, A:2 * A], preferred_element_type=jnp.float32)
                    + jnp.dot(m2, fa[:, 2 * A:], preferred_element_type=jnp.float32))

        accum_ref[...] = jnp.where(better, new_attr, attrs)
        zbuf_ref[...] = jnp.minimum(zbuf, chunk_zmin)

    def body(c, _):
        # 2-D coarse binning: skip chunks whose screen bbox misses this
        # tile in either axis.
        overlap = ((ranges_ref[c, 0] < row0 + tile_h)
                   & (ranges_ref[c, 1] >= row0)
                   & (ranges_ref[c, 2] < col0 + tile_w)
                   & (ranges_ref[c, 3] >= col0))

        @pl.when(overlap)
        def _():
            compute(c)

        return 0

    lax.fori_loop(0, n_chunks, body, 0)

    attr_out_ref[...] = accum_ref[...]
    depth_out_ref[...] = zbuf_ref[...]


def _rasterize_image_pallas(geom_t, attrs, chunk_ranges, image_hw, num_attrs,
                            znear):
    """geom_t (16, Fp), attrs (Fp, 3A) -> attr image (H, W, A), depth (H, W)."""
    H, W = image_hw
    tile_w = min(W, TILE_W)
    tile_h = min(H, PIXEL_BLOCK // tile_w)
    P = tile_h * tile_w
    assert H % tile_h == 0 and W % tile_w == 0, (H, W, tile_h, tile_w)
    tiles_y = H // tile_h
    tiles_x = W // tile_w
    n_tiles = tiles_y * tiles_x
    n_chunks = geom_t.shape[1] // FACE_CHUNK
    A = num_attrs

    kernel = partial(_raster_kernel, num_attrs=A, n_chunks=n_chunks,
                     znear=znear, tile_h=tile_h, tile_w=tile_w,
                     tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(geom_t.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(attrs.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((P, A), lambda i, r: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda i, r: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, A), jnp.float32),
        ],
    )
    attr_img, depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * P, A), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * P, 1), jnp.float32),
        ),
    )(chunk_ranges, geom_t, attrs)

    def reassemble(img, ch):
        img = img.reshape(tiles_y, tiles_x, tile_h, tile_w, ch)
        return img.transpose(0, 2, 1, 3, 4).reshape(H, W, ch)

    return reassemble(attr_img, A), reassemble(depth, 1)[..., 0]


def rasterize_batched_pallas(verts_screen, faces, vert_attrs, image_hw,
                             znear=1e-3):
    """Drop-in replacement for the XLA backend (see ops.rasterizer.rasterize)."""
    A = vert_attrs.shape[-1]
    geom_t, attrs, chunk_ranges = pack_face_tables(verts_screen, faces, vert_attrs)
    fn = partial(_rasterize_image_pallas, image_hw=image_hw, num_attrs=A,
                 znear=znear)
    attr_img, depth = jax.vmap(fn)(geom_t, attrs, chunk_ranges)
    mask = depth < _INF
    return {"attrs": attr_img,
            "depth": jnp.where(mask, depth, jnp.inf),
            "mask": mask}
