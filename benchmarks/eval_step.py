"""Device throughput of the jitted evaluation step (3DPW metric set).

Times the eval driver's per-batch program — proxy rep, gendered targets
(static-gender fast path), prediction, N=10 MF/shape samples, batched SMPL,
and ALL per-frame metrics (Procrustes/scale alignments, best-of-N sample
minima) computed on device — with the same on-device-loop methodology as
bench.py / benchmarks/train_step.py.

Usage: python benchmarks/eval_step.py [batch_size] [iters] [num_samples] [jacobi|lapack]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 3DPW metric set (run_evaluate.py): 7 mode metrics + 7 _samples_min.
MODE_METRICS = ["PVE", "PVE-SC", "PVE-PA", "PVE-T-SC", "MPJPE", "MPJPE-SC",
                "MPJPE-PA"]
METRICS = MODE_METRICS + [m + "_samples_min" for m in MODE_METRICS]


def main():
    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.evaluate.evaluate_pose_mf_shape_gaussian_net import (
        _make_eval_step)
    from hierarchicalprobabilistic3dhuman_tpu.metrics.metric_sums import (
        make_eval_frame_metrics_fn)
    from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import (
        CannyEdgeDetector)
    from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
        PoseMFShapeGaussianNet)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    svd_impl = sys.argv[4] if len(sys.argv) > 4 else "jacobi"
    if svd_impl == "lapack":
        from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import (
            lapack_mode_supported)
        if not lapack_mode_supported():
            # Measured on the axon PJRT tunnel: pure_callback is rejected
            # outright, so lapack-mode eval CANNOT run on this TPU backend;
            # converted-checkpoint parity eval belongs on the CPU backend.
            print("eval step  svd=lapack UNSUPPORTED on this backend "
                  "(no host callbacks); run with JAX_PLATFORMS=cpu")
            return

    cfg = get_pose_shape_cfg_defaults()
    D = cfg.DATA.PROXY_REP_SIZE

    # svd_impl="lapack" measures the converted-checkpoint parity mode:
    # its pure_callback SVD pays a host round-trip per step, which on a
    # tunnel-attached TPU is the dominant cost to quantify (VERDICT #9).
    model = PoseMFShapeGaussianNet(svd_impl=svd_impl)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18, D, D)))
    smpl = SMPL.synthetic()
    edge = CannyEdgeDetector(threshold=0.0)

    raw_step = _make_eval_step(
        pose_shape_apply=lambda proxy: model.apply(variables, proxy),
        smpl_neutral=smpl, smpl_male=smpl, smpl_female=smpl,
        edge_detect_model=edge, pose_shape_cfg=cfg, num_samples=N,
        compute_joints2d=False, compute_silhouettes=False,
        compute_samples=True, silhouette_renderer=None,
        static_gender=1,  # gender-sorted fast path: ONE target-SMPL forward
        frame_metrics_fn=make_eval_frame_metrics_fn(METRICS))

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(B, 3, D, D).astype(np.float32))
    heatmaps = jnp.asarray(rng.rand(B, 17, D, D).astype(np.float32))
    pose = jnp.asarray((rng.randn(B, 72) * 0.2).astype(np.float32))
    shape = jnp.asarray(rng.randn(B, 10).astype(np.float32))
    gender = jnp.ones((B,), jnp.int32)
    zeros_j2d = jnp.zeros((B, 17, 2))
    zeros_sil = jnp.zeros((B, D, D))

    @jax.jit
    def loop(key, image, heatmaps, pose, shape):
        def body(i, acc):
            # i-dependent perturbation of every input: without it XLA hoists
            # the loop-invariant forward/targets out of the loop and the
            # number measures only the sampling slice.
            eps = 1.0 + jnp.float32(i) * jnp.float32(1e-9)
            out = raw_step(jax.random.fold_in(key, i), image * eps,
                           heatmaps * eps, pose * eps, shape * eps, gender,
                           zeros_j2d, zeros_sil)
            return acc + out["frame_metrics"]["PVE-PA_samples_min"].sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    key = jax.random.PRNGKey(0)
    acc = float(np.asarray(loop(key, image, heatmaps, pose, shape)))  # warm
    t0 = time.perf_counter()
    acc = float(np.asarray(loop(jax.random.fold_in(key, 7), image, heatmaps,
                                pose, shape)))
    dt = (time.perf_counter() - t0) / iters

    print(f"eval step  B={B} N={N} svd={svd_impl}  {dt * 1e3:.1f} ms/step  "
          f"{B / dt:.1f} img/s  (metric acc {acc:.3f})")


if __name__ == "__main__":
    main()
