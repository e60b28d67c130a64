"""Rasterizer culling statistics + full-render timing on REALISTIC geometry.

Uses the same scene the train step renders (benchmarks/_scene.py): synthetic
SMPL bodies, the training camera, 256^2, A=12 attribute channels.

  1. reports the binning acceptance rate — how many (pixel-tile, face-chunk)
     pairs survive the kernel's 2-D bbox culling (the kernel's work unit),
     computed BY the kernel's own build_tile_chunk_lists so the numbers
     always describe the actual work lists;
  2. times the full textured render (pack + kernel + compositing) on the
     device, input-perturbed per iteration to defeat loop-invariant
     hoisting. NOTE: per-dispatch timings on the axon tunnel carry a
     ~1.4 ms dispatch floor per call — treat these as relative numbers;
     the train step (benchmarks/train_step.py) is the authoritative one.

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

    from benchmarks._scene import build_scene
    from hierarchicalprobabilistic3dhuman_tpu.ops import rasterizer_pallas as rp

    renderer, verts, cam_t, verts_dp, screen = build_scene(B)
    D = renderer.img_wh
    rng = np.random.RandomState(1)
    texels = jnp.asarray(rng.rand(B, verts_dp.shape[1], 3).astype(np.float32))

    # ---- culling statistics via the kernel's own work-list builder --------
    attrs_stub = jnp.zeros((B, verts_dp.shape[1], 12), jnp.float32)
    _, _, chunk_ranges = rp.pack_face_tables(screen, renderer.faces, attrs_stub)
    tile_h, tile_w = rp._choose_tile_dims(D, D)
    counts, _ = rp.build_tile_chunk_lists(chunk_ranges, (D, D), tile_h, tile_w)
    counts = np.asarray(counts)[..., 0]                  # (B, T)
    NC = chunk_ranges.shape[1]
    T = counts.shape[1]
    pairs = counts.sum(axis=1)
    print(f"chunks={NC} tiles={T} ({tile_h}x{tile_w}) dense pairs={NC * T}")
    print(f"accepted pairs/img: mean {pairs.mean():.0f} "
          f"min {pairs.min()} max {pairs.max()} "
          f"({100 * pairs.mean() / (NC * T):.1f}% of dense)")
    tiles_hit = (counts > 0).sum(axis=1)
    print(f"tiles with any chunk: mean {tiles_hit.mean():.1f}/{T}; "
          f"chunks/hit-tile: {pairs.mean() / max(tiles_hit.mean(), 1):.1f}")

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
