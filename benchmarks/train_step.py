"""Reproducible device timing of the FULL stage-2 training step.

Reference config (batch 72, proxy 256^2, textured synthetic render, 8 MF
samples, Adam) with on-device train metric sums — the number the README's
"training: N images/s device throughput" line comes from. Same methodology
as bench.py: the iteration loop runs on-device inside one jit (a fori_loop
carrying the optimiser state), each iteration folds the step index into the
RNG key so synthetic-data generation genuinely recomputes, and the host
fetches ONE scalar — the axon tunnel's per-call latency and fetch bandwidth
never touch the measurement.

Usage: python benchmarks/train_step.py [batch_size] [iters] [stage] [bf16]
(4th arg "bf16" benchmarks the --bf16_encoder mixed-precision mode.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()
    import jax.numpy as jnp
    import optax

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import (
        CannyEdgeDetector)
    from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
        PoseMFShapeGaussianNet)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.renderers import TexturedIUVRenderer
    from hierarchicalprobabilistic3dhuman_tpu.train.train_pose_mf_shape_gaussian_net import (
        make_train_step, TrainState)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 72
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    stage = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    bf16_encoder = len(sys.argv) > 4 and sys.argv[4] == "bf16"

    cfg = get_pose_shape_cfg_defaults()
    cfg.TRAIN.BATCH_SIZE = B
    D = cfg.DATA.PROXY_REP_SIZE

    smpl = SMPL.synthetic(num_betas=cfg.MODEL.NUM_SMPL_BETAS)
    renderer = TexturedIUVRenderer(
        img_wh=D, projection_type="perspective",
        perspective_focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH,
        render_rgb=True)
    edge = CannyEdgeDetector(threshold=cfg.DATA.EDGE_THRESHOLD)
    model = PoseMFShapeGaussianNet(
        encoder_dtype=jnp.bfloat16 if bf16_encoder else None)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18, D, D)))
    optimizer = optax.adam(cfg.TRAIN.LR)

    metrics = ["PVE", "PVE-SC", "PVE-T-SC", "MPJPE", "MPJPE-SC", "MPJPE-PA",
               "joints2D-L2E"]
    stage_cfg = cfg.LOSS.STAGE2 if stage == 2 else cfg.LOSS.STAGE1
    raw_step = make_train_step(model, cfg, smpl, renderer, edge, stage_cfg,
                               optimizer, train=True, jit=False,
                               metrics_to_track=metrics + (
                                   ["joints2Dsamples-L2E"] if stage == 2 else []))

    rng = np.random.RandomState(0)
    pose = jnp.asarray((rng.randn(B, 72) * 0.3).astype(np.float32))
    # uint8 inputs: the real input pipeline ships uint8 and normalises on
    # device (4x less H2D); per-vertex texel textures (7829 DP verts).
    background = jnp.asarray((rng.rand(B, 3, D, D) * 255).astype(np.uint8))
    texture = jnp.asarray((rng.rand(B, 7829, 3) * 255).astype(np.uint8))

    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=optimizer.init(variables["params"]))

    @jax.jit
    def loop(state, key, pose, background, texture):
        def body(i, carry):
            st, acc = carry
            st, loss, sums, terms = raw_step(st, jax.random.fold_in(key, i),
                                             pose, background, texture)
            return (st, acc + loss)
        return jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    st, acc = loop(state, key, pose, background, texture)
    acc = float(np.asarray(acc))
    compile_and_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    st, acc = loop(st, jax.random.fold_in(key, 999), pose, background, texture)
    acc = float(np.asarray(acc))
    dt = (time.perf_counter() - t0) / iters

    mode = " bf16-encoder" if bf16_encoder else ""
    print(f"stage{stage} train step{mode}  B={B}  "
          f"{dt * 1e3:.1f} ms/step  {B / dt:.1f} img/s  "
          f"(loss sum {acc:.1f}; compile+warm {compile_and_first:.0f}s)")


if __name__ == "__main__":
    main()
