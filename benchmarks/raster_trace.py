"""Trace the isolated batched rasterizer call and print per-HLO self times.

Same realistic scene as raster_micro.py; separates eager-perturbation/
dispatch pollution from true device time by profiling 3 calls.

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
    pose_aa = jnp.asarray((rng.randn(B, 72) * 0.3).astype(np.float32))
    rotmats = batch_rodrigues(pose_aa.reshape(B * 24, 3)).reshape(B, 24, 3, 3)
    Rx = jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], jnp.float32)
    out = smpl(body_pose=rotmats[:, 1:], global_orient=(rotmats[:, 0] @ Rx)[:, None],
               betas=jnp.asarray((rng.randn(B, 10)).astype(np.float32)),
               pose2rot=False)
    cam_t = jnp.asarray(
        np.stack([rng.randn(B) * 0.05, rng.randn(B) * 0.05 - 0.2,
                  2.5 + rng.randn(B) * 0.15], axis=1).astype(np.float32))
    verts_dp = out["vertices"][:, renderer.verts_map, :]
    screen = renderer._to_screen(verts_dp, cam_t, None)
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
