"""Split the Pallas rasterize kernel's time into per-tile FIXED cost vs
per-(tile,chunk)-pair work.

Times the raw pallas_call (no pack, no compositing) on the real train scene
twice with identical shapes:
  real    — the actual compacted work lists;
  empty   — counts zeroed (every tile runs 0 chunks, pays only init +
            output-block write + DMA);
  dense   — counts maxed (every tile runs ALL chunks: upper bound on pair
            throughput).
real - empty = the pair-proportional cost; empty = the per-tile floor the
grid pays regardless of culling. This decides whether the next lever is
fewer VPU ops per pair or fewer/fatter grid steps.

Usage: python benchmarks/raster_split.py [B] [TILE_GROUP]
(2nd arg overrides rasterizer_pallas.TILE_GROUP — tiles per grid step — to
measure how much further the per-step fixed cost amortises.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=72, tile_group=None):
    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()
    import jax.numpy as jnp

    from benchmarks._scene import build_scene
    from hierarchicalprobabilistic3dhuman_tpu.ops import rasterizer_pallas as rp
    if tile_group:
        rp.TILE_GROUP = tile_group
        print(f"TILE_GROUP override: {tile_group}")

    renderer, verts, cam_t, verts_dp, screen = build_scene(B)
    D = renderer.img_wh
    A = 12
    rng = np.random.RandomState(1)
    attrs_in = jnp.asarray(rng.rand(B, verts_dp.shape[1], A).astype(np.float32))

    geom_t, attrs, chunk_ranges = rp.pack_face_tables(
        screen, renderer.faces, attrs_in)
    tile_h, tile_w = rp._choose_tile_dims(D, D)
    counts, lists = rp.build_tile_chunk_lists(
        chunk_ranges, (D, D), tile_h, tile_w)
    geom_t, attrs = jax.device_put(geom_t), jax.device_put(attrs)
    NC = chunk_ranges.shape[1]
    pairs = float(np.asarray(counts).sum()) / B

    # Time through the impl (list build included — identical across the
    # three variants) by substituting the work lists at trace time.
    def run_with(counts_v, lists_v, tag):
        @jax.jit
        def f(g, a, c, l):
            import hierarchicalprobabilistic3dhuman_tpu.ops.\
                rasterizer_pallas as _rp
            orig = _rp.build_tile_chunk_lists
            try:
                _rp.build_tile_chunk_lists = lambda *a_, **k_: (c, l)
                ai, dep = _rp._rasterize_batched_impl(
                    g, a, chunk_ranges, (D, D), A, 1e-3)
            finally:
                _rp.build_tile_chunk_lists = orig
            return ai.sum() + dep.sum()

        v = f(geom_t, attrs, counts_v, lists_v)
        v.block_until_ready()
        n, t0 = 20, time.time()
        for _ in range(n):
            v = f(geom_t, attrs, counts_v, lists_v)
        _ = float(v)
        dt = (time.time() - t0) / n * 1000
        print(f"{tag:6s}: {dt:7.2f} ms/call", flush=True)
        return dt

    t_real = run_with(counts, lists, "real")
    t_empty = run_with(jnp.zeros_like(counts), lists, "empty")
    t_dense = run_with(jnp.full_like(counts, NC),
                       jnp.broadcast_to(
                           jnp.arange(NC, dtype=jnp.int32),
                           lists.shape).astype(jnp.int32), "dense")
    T = lists.shape[1]
    print(f"\npairs/img real={pairs:.0f} dense={NC * T}")
    print(f"per-tile floor: {t_empty:.2f} ms "
          f"({100 * t_empty / t_real:.0f}% of real)")
    print(f"pair cost: {(t_real - t_empty):.2f} ms real "
          f"-> {(t_real - t_empty) / (pairs * B) * 1e6:.0f} ns/pair; "
          f"dense extrapolation {(t_dense - t_empty):.1f} ms "
          f"/ {(t_dense - t_empty) / (NC * T * B) * 1e6:.0f} ns/pair")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 72,
         int(sys.argv[2]) if len(sys.argv) > 2 else None)
