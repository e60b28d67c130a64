"""Trace the isolated batched rasterizer call and print per-HLO self times.

Same realistic scene as raster_micro.py (benchmarks/_scene.py); profiles 3
back-to-back calls so per-dispatch tunnel pollution is visible separately
from true device time.

Usage: python benchmarks/raster_trace.py [B] [out_dir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=72, out_dir="/tmp/raster_trace"):
    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()
    import jax.numpy as jnp

    from benchmarks._scene import build_scene
    from hierarchicalprobabilistic3dhuman_tpu.ops import rasterizer_pallas as rp

    renderer, _, _, verts_dp, screen = build_scene(B)
    D = renderer.img_wh
    rng = np.random.RandomState(1)
    attrs12 = jnp.asarray(rng.rand(B, verts_dp.shape[1], 12).astype(np.float32))

    full = jax.jit(lambda s, a: rp.rasterize_batched_pallas(
        s, renderer.faces, a, (D, D)))
    o = jax.block_until_ready(full(screen, attrs12))
    print("mask frac", float(o["mask"].mean()))
    with jax.profiler.trace(out_dir):
        for i in range(3):
            o = full(screen + jnp.float32(i * 1e-6), attrs12)
        jax.block_until_ready(o["attrs"])

    from benchmarks.profile_train_step import analyse
    analyse(out_dir, top=20)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 72,
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/raster_trace")
