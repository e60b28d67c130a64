"""Pallas TPU rasterizer: tile-based z-buffered barycentric interpolation.

Same semantics as ops/rasterizer.py's XLA backend (edge-function coverage,
winner-take-all by depth, per-vertex attribute interpolation), reorganised for
TPU hardware:

  * ONE kernel for the whole batch: grid (B, tiles) with tiles iterating
    fastest — per-image face tables stream into VMEM overlapped with the
    previous image's tail tiles; each tile is 16x16 = 256 pixels,
    processed as a flat (P, .) block — no cross-lane reshapes,
    Mosaic-friendly;
  * the packed face tables live in VMEM (13774 faces ~ 3.5 MB), streamed
    through each tile in fixed-size chunks with a fori_loop — the z/attr
    accumulators stay on-chip for the whole tile;
  * faces are the LANE dimension: the geometry table is stored transposed
    (16, F) so per-face coefficients load as (1, FC) rows and broadcast
    against (P, 1) pixel coordinates;
  * attribute interpolation is three (P, FC) @ (FC, A) MXU matmuls with a
    one-hot winner mask;
  * 2-D COARSE BINNING, COMPACTED: each 128-face chunk carries its
    [row_min, row_max, col_min, col_max] screen bbox; build_tile_chunk_lists
    turns the tile-vs-chunk overlap matrix into per-tile work LISTS with
    vectorised XLA compares + one small argsort, so the kernel's inner loop
    runs over exactly the accepted chunks (on real SMPL scenes only ~1-5%
    of the dense tile x chunk grid overlaps). Faces keep their NATURAL
    order — the DensePose/SMPL triangulation is part-contiguous, so chunks
    are already spatially compact. (Round-2 sorted faces by min-y for row
    binning; the per-step take_along_axis reorder of the (B, F, 3, A)
    attribute table cost ~73 ms of the 185 ms train step at bs=72 — 40% —
    versus ~50 ms for the whole rasterize kernel. No sort, no gathers, and
    row+col skipping beats row-only.)

Geometry table rows (16, F) — BARYCENTRIC-RATIO form (round 4):
  [wa0, wb0, wc0, wa1, wb1, wc1, za, zb, zc, 0, 0, 0, 0, 0, 0, 0]
where w_k(x, y) = wa_k x + wb_k y + wc_k is the k-th barycentric weight
DIRECTLY (the edge function pre-divided by 2x the signed area at pack time)
and z(x, y) = za x + zb y + zc is the face's depth plane. The kernel then
computes per (pixel, face):
    w0, w1 (2 FMAs each), w2 = 1 - w0 - w1, z (2 FMAs),
    covered = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (z > znear)
— versus round 3's edge-function form which paid, per pair, 3 edge FMAs, a
two-sided 8-compare sign test, a guarded reciprocal of denom, 3 weight
multiplies AND a 5-op weight renormalisation (the w2 = 1 - w0 - w1 identity
makes partition-of-unity exact by construction, so sliver-face renorm is
free). ~45 -> ~25 VPU ops per (pixel, face) pair; the division and the
degenerate-face test move to pack time where they run once per FACE instead
of once per (pixel, face). Degenerate faces (|2*area| <= 1e-9, incl.
padding) pack as w0 = -1 everywhere -> never covered.
Attribute table is (F, 3A): [attr_v0 | attr_v1 | attr_v2].
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30
PIXEL_BLOCK = 256
TILE_W = 16
# The per-image chunk work lists STREAM through SMEM in TILE_GROUP-row
# windows (block (TILE_GROUP, NC), index i // TILE_GROUP), not as one
# resident (n_tiles, NC) block. SMEM pads a window's last dim to 128 lanes
# and double-buffers it, so whole-array residency really costs
# n_tiles x 128 x 4 B x 2 buffers PER INPUT regardless of NC — 2 MB of the
# chip's 1 MB SMEM at 512^2/16x16 tiles (caught on hardware by
# benchmarks/tpu_checks.py render_512). Streamed windows cost
# TILE_GROUP x 128 x 4 x 2 = 8 KB each at any image size, and the 8-tile
# granularity satisfies Mosaic's sublane rule (block dims divisible by 8 or
# equal to the array's).
TILE_GROUP = 8


def _choose_tile_dims(H, W):
    """Pick (tile_h, tile_w): the measured-fastest 16x16 when it divides the
    image, else the minimum-area (tile_h | H, tile_w | W) divisor pair at or
    above the default, tie-broken toward square tiles (square bboxes overlap
    fewest chunks; smaller tiles cull better). SMEM no longer constrains the
    choice — the work lists stream through fixed TILE_GROUP-row windows, so
    scoped SMEM is independent of the tile count."""
    tile_w0 = min(W, TILE_W)
    tile_h0 = min(H, PIXEL_BLOCK // tile_w0)
    if H % tile_h0 == 0 and W % tile_w0 == 0:
        return tile_h0, tile_w0
    div_h = [d for d in range(tile_h0, H + 1) if H % d == 0]
    div_w = [d for d in range(tile_w0, W + 1) if W % d == 0]
    return min(((th, tw) for th in div_h for tw in div_w),
               key=lambda tw_: (tw_[0] * tw_[1], abs(tw_[0] - tw_[1])))
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
    # Pad the SMALL (F, 3) face index table to a FACE_CHUNK multiple before
    # gathering, so every big table below is born at its final padded size —
    # round-3 traces showed post-hoc concatenate/pad of the packed tables
    # cost ~2 ms/step in pad + relayout copies at bs=72. Padding faces are
    # [0, 0, 0]: zero area -> denom 0 -> flagged degenerate -> empty bbox.
    F_raw = faces.shape[0]
    pad = (-F_raw) % FACE_CHUNK
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)

    fv = verts_screen[:, faces]          # (B, Fp, 3, 3)
    fa = vert_attrs[:, faces]            # (B, Fp, 3, A)
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
    # denom = 2 * signed area, computed from vertex coords directly: summing
    # the edge functions instead would let FMA-contraction noise resurrect
    # exactly-degenerate faces (zero-area slivers at mesh poles).
    denom = ((x[..., 1] - x[..., 0]) * (y[..., 2] - y[..., 0])
             - (y[..., 1] - y[..., 0]) * (x[..., 2] - x[..., 0]))
    degenerate = jnp.abs(denom) <= 1e-9
    inv = 1.0 / jnp.where(degenerate, 1.0, denom)
    # Barycentric-ratio rows: w_k(x, y) = wa_k x + wb_k y + wc_k. Degenerate
    # faces pack as w0 == -1 everywhere so the kernel never covers them.
    wa0 = jnp.where(degenerate, 0.0, a0 * inv)
    wb0 = jnp.where(degenerate, 0.0, b0 * inv)
    wc0 = jnp.where(degenerate, -1.0, c0 * inv)
    wa1 = jnp.where(degenerate, 0.0, a1 * inv)
    wb1 = jnp.where(degenerate, 0.0, b1 * inv)
    wc1 = jnp.where(degenerate, 0.0, c1 * inv)
    # Depth plane z(x, y) = za x + zb y + zc from
    # z = z2 + w0 (z0 - z2) + w1 (z1 - z2).
    dz0 = z[..., 0] - z[..., 2]
    dz1 = z[..., 1] - z[..., 2]
    za = wa0 * dz0 + wa1 * dz1
    zb = wb0 * dz0 + wb1 * dz1
    zc = jnp.where(degenerate, 0.0, z[..., 2] + wc0 * dz0 + wc1 * dz1)
    zeros = jnp.zeros_like(denom)
    geom_t = jnp.stack([wa0, wb0, wc0, wa1, wb1, wc1, za, zb, zc,
                        zeros, zeros, zeros, zeros, zeros, zeros, zeros],
                       axis=-2)          # (B, 16, F)
    B, Fp = x.shape[:2]
    A = fa.shape[-1]
    attrs = fa.reshape(B, Fp, 3 * A)

    # Per-chunk screen bboxes. Degenerate faces (zero area, incl. padding)
    # get an empty range so pure-padding chunks never execute.
    def axis_ranges(coord):
        lo = jnp.where(degenerate, 1e9, jnp.min(coord, axis=-1))   # (B, Fp)
        hi = jnp.where(degenerate, -1e9, jnp.max(coord, axis=-1))
        NC = Fp // FACE_CHUNK
        lo = jnp.floor(jnp.min(lo.reshape(B, NC, FACE_CHUNK), axis=-1))
        hi = jnp.ceil(jnp.max(hi.reshape(B, NC, FACE_CHUNK), axis=-1))
        return jnp.clip(lo, -1e9, 1e9), jnp.clip(hi, -1e9, 1e9)

    rmin, rmax = axis_ranges(y)
    cmin, cmax = axis_ranges(x)
    chunk_ranges = jnp.stack([rmin, rmax, cmin, cmax],
                             axis=-1).astype(jnp.int32)   # (B, NC, 4)
    return geom_t, attrs, chunk_ranges


def build_tile_chunk_lists(chunk_ranges, image_hw, tile_h, tile_w):
    """Per-tile lists of face chunks that survive 2-D bbox culling.

    The kernel's work unit is a (pixel-tile, face-chunk) pair. On real SMPL
    training scenes only ~1-5% of the dense tile x chunk grid overlaps — a
    kernel that loops over ALL chunks per tile and branches spends nearly
    all its time in scalar loop/branch overhead (measured: 42 ms of the
    104 ms train step at bs=72, ~70 ns x 6912 iterations x 72 images).
    Instead, compact the overlap matrix OUTSIDE the kernel with vectorized
    XLA compares + one small argsort; the kernel then runs a dynamic-bound
    loop over exactly the accepted chunks.

    :param chunk_ranges: (B, NC, 4) int32 [row_min, row_max, col_min,
        col_max] inclusive per-chunk screen bboxes (from pack_face_tables)
    :param image_hw: (H, W)
    :return: counts (B, T, 1) int32 accepted chunks per tile (trailing 1
             kept for the Mosaic SMEM sublane rule — see below),
             lists (B, T, NC) int32 — accepted chunk ids first (ascending),
             tiles ordered row-major to match the kernel grid.
    """
    H, W = image_hw
    tiles_y = H // tile_h
    tiles_x = W // tile_w
    T = tiles_y * tiles_x
    tid = jnp.arange(T, dtype=jnp.int32)
    row0 = (tid // tiles_x) * tile_h                    # (T,)
    col0 = (tid % tiles_x) * tile_w
    r = chunk_ranges[:, None, :, :]                     # (B, 1, NC, 4)
    overlap = ((r[..., 0] < row0[None, :, None] + tile_h)
               & (r[..., 1] >= row0[None, :, None])
               & (r[..., 2] < col0[None, :, None] + tile_w)
               & (r[..., 3] >= col0[None, :, None]))    # (B, T, NC)
    # counts kept rank-3 (B, T, 1): Mosaic SMEM blocks need their last two
    # dims divisible by (8, 128) or equal to the array's — a squeezed-batch
    # rank-2 (None, T) block violates the sublane rule.
    counts = overlap.sum(axis=-1, keepdims=True).astype(jnp.int32)
    # Stable argsort of NOT-overlap: accepted chunk ids first, ascending.
    lists = jnp.argsort(~overlap, axis=-1, stable=True).astype(jnp.int32)
    return counts, lists


def _out_channels(num_attrs):
    """Packed output channel count: attrs + depth, padded to a sublane
    multiple (Mosaic block rule: second-minor block dim divisible by 8)."""
    return -(-(num_attrs + 1) // 8) * 8


def _raster_kernel(counts_ref, lists_ref, geom_ref, attr_ref, out_ref,
                   zbuf_ref, accum_ref, *, num_attrs,
                   znear, tile_h, tile_w, tiles_x):
    blk = pl.program_id(1)
    P = tile_h * tile_w
    A = num_attrs
    OUT_C = _out_channels(num_attrs)

    flat = lax.broadcasted_iota(jnp.int32, (1, P), 1)      # (1, P) in-tile ids

    def compute(c, px, py):
        # TRANSPOSED accumulators: everything here is faces-on-SUBLANES,
        # pixels-on-LANES — (FC, P) — so the per-TILE output block
        # (OUT_C, P) assembles by sublane concat with NO transpose. The two
        # small input transposes below run per surviving (tile, chunk) PAIR
        # (~130/img after culling) instead of a (P, OUT_C) -> (OUT_C, P)
        # output transpose per TILE (256/img at 256^2) — the output
        # transpose measured 122 ns/tile = 2.25 ms/step at bs=72 (floor
        # probe, round 4), ~37% of the kernel's empty-tile floor.
        # (A two-phase variant that deferred the 3 interpolation matmuls to
        # a winners-only second pass measured SLOWER — the per-pair cost is
        # dominated by the barycentric VPU work, not the MXU.)
        zbuf = zbuf_ref[...]                                # (1, P)
        attrs = accum_ref[...]                              # (A, P)
        sl = pl.ds(c * FACE_CHUNK, FACE_CHUNK)
        g = geom_ref[:, sl].T                               # (FC, 16)
        fa = attr_ref[sl, :].T                              # (3A, FC)

        # Barycentric weights + depth are PRE-DIVIDED affine forms (see
        # module docstring): 6 FMAs, 4 compares, no reciprocal, no
        # renormalisation (w2 = 1 - w0 - w1 makes the partition of unity
        # exact by construction). Degenerate faces packed as w0 == -1.
        w0 = px * g[:, 0:1] + py * g[:, 1:2] + g[:, 2:3]    # (FC, P)
        w1 = px * g[:, 3:4] + py * g[:, 4:5] + g[:, 5:6]
        w2 = 1.0 - w0 - w1
        zpix = px * g[:, 6:7] + py * g[:, 7:8] + g[:, 8:9]
        covered = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (zpix > znear)
        zmasked = jnp.where(covered, zpix, _INF)            # (FC, P)

        chunk_zmin = jnp.min(zmasked, axis=0, keepdims=True)   # (1, P)
        better = chunk_zmin < zbuf
        win_idx = jnp.argmin(zmasked, axis=0)                  # (P,)
        face_ids = lax.broadcasted_iota(jnp.int32, (FACE_CHUNK, P), 0)
        onehot = ((face_ids == win_idx[None, :]) & (chunk_zmin < _INF)
                  & better)

        m0 = jnp.where(onehot, w0, 0.0)
        m1 = jnp.where(onehot, w1, 0.0)
        m2 = jnp.where(onehot, w2, 0.0)
        new_attr = (jnp.dot(fa[:A], m0, preferred_element_type=jnp.float32)
                    + jnp.dot(fa[A:2 * A], m1, preferred_element_type=jnp.float32)
                    + jnp.dot(fa[2 * A:], m2, preferred_element_type=jnp.float32))

        accum_ref[...] = jnp.where(better, new_attr, attrs)
        zbuf_ref[...] = jnp.minimum(zbuf, chunk_zmin)

    # TILE_GROUP tiles per grid step (unrolled): the per-grid-step fixed
    # cost — output-block DMA issue, pipeline bookkeeping, kernel
    # prologue/epilogue — measured 747 ns/step and dominated the kernel
    # (benchmarks/raster_split.py: 13.8 ms per-tile floor vs 5.9 ms of
    # actual (tile, chunk) pair work at bs=72/256^2 — culling is so
    # effective, ~130 pairs/img of 27.6k dense, that EMPTY tiles' fixed
    # cost was 70% of the render). Fat steps amortise that floor 8x; the
    # step's work-list window is exactly the streamed TILE_GROUP-row SMEM
    # block, and the output block carries the step's 8 (OUT_C, P) tile
    # blocks stacked on the second-minor axis.
    for t in range(TILE_GROUP):
        tile = blk * TILE_GROUP + t
        ty = tile // tiles_x
        tx = tile % tiles_x
        row0 = ty * tile_h
        col0 = tx * tile_w
        py = (row0 + flat // tile_w).astype(jnp.float32) + 0.5
        px = (col0 + flat % tile_w).astype(jnp.float32) + 0.5

        # Scratch persists across tiles and grid steps: reset per tile.
        zbuf_ref[...] = jnp.full((1, P), _INF, jnp.float32)
        accum_ref[...] = jnp.zeros((A, P), jnp.float32)

        # Compacted 2-D binning: row t of the SMEM work-list window holds
        # exactly the chunks whose screen bbox overlaps this tile (built by
        # build_tile_chunk_lists) — no per-chunk branch, no wasted
        # iterations over the ~95-99% of chunks that miss the tile.
        lax.fori_loop(0, counts_ref[t, 0],
                      lambda j, _, px=px, py=py, t=t:
                          (compute(lists_ref[t, j], px, py), 0)[1], 0,
                      unroll=False)

        # ONE channels-second-minor output block (OUT_C, P) per tile: the
        # transposed accumulators concatenate along SUBLANES directly —
        # lane-exact HBM writes, no in-register transpose (see compute()).
        # Round 3 wrote two channel-minor blocks (P, A) + (P, 1); T(8,128)
        # tiling padded their minor dims 12->128 and 1->128 in HBM —
        # ~4.8 GB of mostly-padding DMA per bs=72 step INSIDE the kernel,
        # plus a 3.9 ms reassemble copy and a 4.2 ms mask compare
        # downstream, each re-reading 10.7x-128x padded buffers. (The
        # round-3 alternative of writing (B, H, W, A) raster layout
        # directly measured 75 ms/step SLOWER — consumers then read the
        # padded channel-minor buffer; this transposed-block layout is the
        # compact escape: 300 MB/step, one cheap reassemble transpose.)
        packed = jnp.concatenate(
            [accum_ref[...], zbuf_ref[...]]
            + ([jnp.zeros((OUT_C - A - 1, P), jnp.float32)]
               if OUT_C > A + 1 else []),
            axis=0)                                     # (OUT_C, P)
        out_ref[t * OUT_C:(t + 1) * OUT_C, :] = packed


def _rasterize_batched_impl(geom_t, attrs, chunk_ranges, image_hw, num_attrs,
                            znear):
    """geom_t (B, 16, Fp), attrs (B, Fp, 3A), chunk_ranges (B, NC, 4)
    -> attr images (B, H, W, A), depth (B, H, W).

    ONE pallas_call with grid (B, n_tiles): tiles iterate fastest, so the
    next image's face tables stream into VMEM while the current image's
    last tiles compute. (Round-3 note: the previous vmap-of-pallas_call
    formulation lowered to an XLA while loop of B per-image custom calls —
    at bs=72 the loop's per-image table slicing + relayout copies cost
    ~10 ms/step on top of the kernel time; the batched grid removes the
    loop, the dynamic-slice fusions and the copies entirely.)
    """
    B = geom_t.shape[0]
    H, W = image_hw
    tile_h, tile_w = _choose_tile_dims(H, W)
    P = tile_h * tile_w
    assert H % tile_h == 0 and W % tile_w == 0, (H, W, tile_h, tile_w)
    tiles_y = H // tile_h
    tiles_x = W // tile_w
    n_tiles = tiles_y * tiles_x
    Fp = geom_t.shape[2]
    NC = chunk_ranges.shape[1]
    A = num_attrs

    counts, lists = build_tile_chunk_lists(chunk_ranges, image_hw,
                                           tile_h, tile_w)
    # Pad the tile axis so the (TILE_GROUP, .) work-list windows — which are
    # also the per-grid-step tile groups — tile it exactly. Padded tiles
    # have count 0 (the loop never runs) and their output rows are sliced
    # away below.
    T8 = -(-n_tiles // TILE_GROUP) * TILE_GROUP
    if T8 != n_tiles:
        counts = jnp.pad(counts, ((0, 0), (0, T8 - n_tiles), (0, 0)))
        lists = jnp.pad(lists, ((0, 0), (0, T8 - n_tiles), (0, 0)))

    OUT_C = _out_channels(A)
    kernel = partial(_raster_kernel, num_attrs=A,
                     znear=znear, tile_h=tile_h, tile_w=tile_w,
                     tiles_x=tiles_x)
    out = pl.pallas_call(
        kernel,
        # Fat grid steps: TILE_GROUP tiles per step (see kernel comment —
        # per-step fixed cost was 70% of the kernel at the measured ~130
        # surviving pairs/img). Tile groups iterate fastest so the next
        # image's face tables still stream in behind the current image's
        # tail groups.
        grid=(B, T8 // TILE_GROUP),
        in_specs=[
            pl.BlockSpec((None, TILE_GROUP, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, TILE_GROUP, NC), lambda b, i: (b, i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 16, Fp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Fp, 3 * A), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, TILE_GROUP * OUT_C, P),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((A, P), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, T8 * OUT_C, P), jnp.float32),
        # Double-buffering the streamed face tables puts peak scoped VMEM
        # ~0.5 MB over the 16 MB compiler default; v5e has 128 MB physical.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(counts, lists, geom_t, attrs)

    # (B, T8*OUT_C, P) -> (B, H, W, OUT_C); the transpose now moves a compact
    # lane-exact buffer (~300 MB at bs=72/256^2/A=12 vs 4.8 GB padded before).
    out = out[:, :n_tiles * OUT_C]
    out = out.reshape(B, tiles_y, tiles_x, OUT_C, tile_h, tile_w)
    out = out.transpose(0, 1, 4, 2, 5, 3).reshape(B, H, W, OUT_C)
    return out[..., :A], out[..., A]


def rasterize_batched_pallas(verts_screen, faces, vert_attrs, image_hw,
                             znear=1e-3):
    """Drop-in replacement for the XLA backend (see ops.rasterizer.rasterize)."""
    A = vert_attrs.shape[-1]
    geom_t, attrs, chunk_ranges = pack_face_tables(verts_screen, faces, vert_attrs)
    attr_img, depth = _rasterize_batched_impl(
        geom_t, attrs, chunk_ranges, image_hw, num_attrs=A, znear=znear)
    mask = depth < _INF
    return {"attrs": attr_img,
            "depth": jnp.where(mask, depth, jnp.inf),
            "mask": mask}
