"""Rasterizer kernel microbenchmark + culling statistics on REALISTIC geometry.

Builds the same scene the train step renders (synthetic SMPL bodies, the
training camera, 256^2, A=12 attribute channels), then:

  1. reports the binning acceptance rate — how many (pixel-tile, face-chunk)
     pairs survive the kernel's 2-D bbox culling (the kernel's work unit);
  2. times the full textured render (pack + kernel + compositing) on the
     device, input-perturbed per iteration to defeat loop-invariant hoisting.

Usage: python benchmarks/raster_micro.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=72):
    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.renderers import TexturedIUVRenderer
    from hierarchicalprobabilistic3dhuman_tpu.ops import rasterizer_pallas as rp
    from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import (
        batch_rodrigues)

    cfg = get_pose_shape_cfg_defaults()
    D = cfg.DATA.PROXY_REP_SIZE
    smpl = SMPL.synthetic()
    renderer = TexturedIUVRenderer(
        img_wh=D, projection_type="perspective",
        perspective_focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH,
        render_rgb=True)

    rng = np.random.RandomState(0)
    # Same scene recipe as the train step (train driver :95-109): random
    # axis-angle pose, global row x-flipped 180 degrees, training camera.
    pose_aa = jnp.asarray((rng.randn(B, 72) * 0.3).astype(np.float32))
    rotmats = batch_rodrigues(pose_aa.reshape(B * 24, 3)).reshape(B, 24, 3, 3)
    Rx = jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], jnp.float32)
    glob = (rotmats[:, 0] @ Rx)[:, None]
    body_pose = rotmats[:, 1:]
    betas = jnp.asarray((rng.randn(B, 10) * 1.0).astype(np.float32))
    out = smpl(body_pose=body_pose, global_orient=glob, betas=betas,
               pose2rot=False)
    verts = out["vertices"]
    cam_t = jnp.asarray(
        np.stack([rng.randn(B) * 0.05,
                  rng.randn(B) * 0.05 - 0.2,
                  2.5 + rng.randn(B) * 0.15], axis=1).astype(np.float32))
    texels = jnp.asarray(rng.rand(B, 7829, 3).astype(np.float32))

    # ---- culling statistics (host, numpy) ---------------------------------
    verts_dp = verts[:, renderer.verts_map, :]
    screen = renderer._to_screen(verts_dp, cam_t, None)
    attrs_stub = jnp.zeros((B, verts_dp.shape[1], 12), jnp.float32)
    _, _, chunk_ranges = rp.pack_face_tables(screen, renderer.faces, attrs_stub)
    cr = np.asarray(chunk_ranges)                       # (B, NC, 4)
    NC = cr.shape[1]
    tile = rp.TILE_W
    tiles_per_side = D // tile
    n_tiles = tiles_per_side * tiles_per_side
    ty, tx = np.meshgrid(np.arange(tiles_per_side), np.arange(tiles_per_side),
                         indexing="ij")
    row0 = (ty * tile).reshape(-1)                      # (T,)
    col0 = (tx * tile).reshape(-1)
    ov = ((cr[:, None, :, 0] < row0[None, :, None] + tile)
          & (cr[:, None, :, 1] >= row0[None, :, None])
          & (cr[:, None, :, 2] < col0[None, :, None] + tile)
          & (cr[:, None, :, 3] >= col0[None, :, None]))  # (B, T, NC)
    pairs = ov.sum(axis=(1, 2))
    print(f"chunks={NC} tiles={n_tiles} total pairs={NC * n_tiles}")
    print(f"accepted pairs/img: mean {pairs.mean():.0f} "
          f"min {pairs.min()} max {pairs.max()} "
          f"({100 * pairs.mean() / (NC * n_tiles):.1f}% of dense)")
    tiles_hit = (ov.any(axis=2)).sum(axis=1)
    print(f"tiles with any chunk: mean {tiles_hit.mean():.1f}/{n_tiles}; "
          f"chunks/hit-tile: {pairs.mean() / max(tiles_hit.mean(), 1):.1f}")

    # ---- stage timings: pack / lists / kernel in isolation -----------------
    attrs12 = jnp.asarray(rng.rand(B, verts_dp.shape[1], 12).astype(np.float32))

    def timeit(f, *args, n=20):
        o = jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        for i in range(n):
            o = f(*(a + i * jnp.float32(1e-7) if a.dtype == jnp.float32 else a
                    for a in args))
        jax.block_until_ready(jax.tree.leaves(o)[0])
        return (time.perf_counter() - t0) / n

    pack = jax.jit(lambda s, a: rp.pack_face_tables(s, renderer.faces, a))
    geom_t, attrs_p, cranges = jax.block_until_ready(pack(screen, attrs12))
    t_pack = timeit(pack, screen, attrs12)

    lists_fn = jax.jit(lambda c: rp.build_tile_chunk_lists(
        c, (D, D), rp.PIXEL_BLOCK // rp.TILE_W, rp.TILE_W))
    t_lists = timeit(lists_fn, cranges)

    kern = jax.jit(lambda g, a, c: rp._rasterize_batched_impl(
        g, a, c, (D, D), num_attrs=12, znear=1e-3))
    t_kern = timeit(kern, geom_t, attrs_p, cranges)
    print(f"stages: pack {t_pack*1e3:.2f} ms | tile-lists {t_lists*1e3:.2f} ms"
          f" | lists+kernel+reassemble {t_kern*1e3:.2f} ms   (batch {B})")

    # ---- timed render ------------------------------------------------------
    @jax.jit
    def render(verts, cam_t, texels):
        return renderer(verts, textures=texels, cam_t=cam_t)

    r = jax.block_until_ready(render(verts, cam_t, texels))
    sil = float(r["silhouettes"].mean())
    n_it = 20
    t0 = time.perf_counter()
    for i in range(n_it):
        r = render(verts + i * 1e-6, cam_t, texels)
    jax.block_until_ready(r["rgb_images"])
    dt = (time.perf_counter() - t0) / n_it
    print(f"textured render (pallas, A=12): {dt * 1e3:.2f} ms/batch B={B} "
          f"-> {dt / B * 1e3:.3f} ms/img   (sil frac {sil:.3f})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 72)
