"""Benchmark: FULL end-to-end inference throughput with 100 SMPL samples/image.

Measures the complete predict pipeline on the available accelerator — the
same call stack as reference run_predict.py on cropped images (SURVEY §3.1):

  512x512 RGB -> crop 384x288 + ImageNet norm -> HRNet-W48 forward (the
  pipeline's biggest network, reference predict_hrnet.py:103) -> heatmap
  argmax 2D keypoints -> 256x256 crop -> Canny edges + Gaussian heatmaps ->
  18-ch proxy -> ResNet-18 + hierarchical MF head (23 on-device SVDs) ->
  100 matrix-Fisher pose + 100 Gaussian shape samples -> 100 SMPL meshes per
  image (batched LBS) -> per-vertex uncertainty.

The reference runs this as a python loop over joints and samples with CPU
SVD/sampling hops ("inference can be slow due to the rejection sampling
procedure", reference README.md:79); here it is ONE jitted program. Baseline
for vs_baseline: the driver-set north-star of 50 images/s (BASELINE.json;
the reference publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    # Optional ablation overrides: python bench.py [B] [NUM_SAMPLES]
    # (driver runs with no args -> reference configuration).
    argv_b = int(sys.argv[1]) if len(sys.argv) > 1 else None
    argv_n = int(sys.argv[2]) if len(sys.argv) > 2 else None
    run_start_time = time.time()

    import os
    import jax
    # Persistent compile cache: the fused pipeline's one-time compile is
    # ~10 min on the TPU service; repeat runs load the serialised executable
    # in seconds. Cache keys include backend/compiler versions, so a
    # mismatched environment just recompiles (no wrong-executable risk).
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax_bench")
    os.makedirs(cache_dir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        from hierarchicalprobabilistic3dhuman_tpu.runtime.cache_manifest import (
            warn_if_stale)
        warn_if_stale()  # loud line when sources changed after last refresh
    except Exception:
        pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults, get_pose2d_hrnet_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
        PoseMFShapeGaussianNet)
    from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import (
        CannyEdgeDetector)
    from hierarchicalprobabilistic3dhuman_tpu.models.hrnet import (
        PoseHighResolutionNet)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.ops.bingham_sampling import (
        pose_matrix_fisher_sampling, shape_gaussian_sampling)
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
        get_kp_locations_confs_from_heatmaps, IMAGENET_MEAN, IMAGENET_STD)
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_pose_mf_shape_gaussian_net import (
        build_proxy_representation)
    from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
        batch_crop_affine)
    from hierarchicalprobabilistic3dhuman_tpu.utils.precision import (
        cast_floating)
    from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import (
        rot6d_to_rotmat)

    # B=64 is the serving batch (peak device throughput; measured 737-760
    # img/s across round-3 runs vs ~604 at B=16 and 702 at B=128 — the knee
    # of the batch curve).
    # Per-image math is identical at any B; pass argv overrides for ablations.
    B = argv_b or 64              # images per step
    NUM_SAMPLES = argv_n or 100   # SMPL samples per image
    IMG = 512           # input image size (reference demo crops are 512x512)

    pose_shape_cfg = get_pose_shape_cfg_defaults()
    hrnet_cfg = get_pose2d_hrnet_cfg_defaults()
    D = pose_shape_cfg.DATA.PROXY_REP_SIZE                  # 256
    in_w, in_h = hrnet_cfg.MODEL.IMAGE_SIZE                 # (288, 384)

    # EAGER init is load-bearing: the persisted bench_loop executable is
    # layout-specialized to eager-init parameter buffers. jax.jit(init)
    # yields different device layouts, and feeding those to the cached
    # executable inserts a silent ~250 MB on-device relayout into every
    # timed dispatch (measured 556 -> 136 img/s). Changing this requires
    # recompiling .cache/jax_bench.
    hrnet = PoseHighResolutionNet(num_joints=hrnet_cfg.MODEL.NUM_JOINTS)
    hrnet_vars = hrnet.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 3, in_h, in_w)))
    model = PoseMFShapeGaussianNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18, D, D)))
    edge_model = CannyEdgeDetector(threshold=0.0)
    smpl = SMPL.synthetic()

    mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std = jnp.asarray(IMAGENET_STD)[:, None, None]
    # Whole-image person box, aspect-fixed to 384:288 (predict_hrnet.py:83-98,
    # the reference's --cropped_images path has no detector).
    hr_centres = jnp.full((B, 2), IMG / 2.0)
    hr_heights = jnp.full((B,), float(IMG))
    hr_widths = jnp.full((B,), IMG / (float(in_h) / float(in_w)))

    def pipeline(key, rgb512, hrnet_vars, variables):
        # ---- HRNet stage: crop, normalise, forward, argmax keypoints ----
        hr_crop = batch_crop_affine(
            (in_w, in_h), rgb=rgb512,
            bbox_centres=hr_centres, bbox_heights=hr_heights,
            bbox_widths=hr_widths,
            orig_scale_factor=pose_shape_cfg.DATA.BBOX_SCALE_FACTOR)["rgb"]
        # HRNet-W48 runs in bfloat16 (MXU-native; keypoints come from a
        # heatmap argmax, which is robust to bf16 rounding — quantified in
        # tests/test_hrnet.py::test_bf16_inference_matches_f32). The
        # probabilistic head + SMPL stay float32.
        heatmaps_hr = hrnet.apply(
            hrnet_vars, ((hr_crop - mean) / std).astype(jnp.bfloat16))
        heatmaps_hr = heatmaps_hr.astype(jnp.float32)
        joints2d, confs = get_kp_locations_confs_from_heatmaps(heatmaps_hr)
        joints2d = joints2d * (in_w / float(hrnet_cfg.MODEL.HEATMAP_SIZE[0]))

        # ---- proxy stage: 256^2 crop, Canny, heatmaps (predict driver :136-147)
        cropped = batch_crop_affine(
            (D, D), joints2D=joints2d, rgb=hr_crop,
            bbox_centres=jnp.full((B, 2), in_h * 0.5).at[:, 1].set(in_w * 0.5),
            bbox_heights=jnp.full((B,), float(in_h)),
            bbox_widths=jnp.full((B,), float(in_h)),
            orig_scale_factor=1.0)
        proxy = build_proxy_representation(cropped["rgb"], cropped["joints2D"],
                                           confs, edge_model, pose_shape_cfg)

        # ---- distribution + sampling + SMPL + uncertainty ----
        pred = model.apply(variables, proxy)
        glob_rotmats = rot6d_to_rotmat(pred["glob"])

        key_p, key_s = jax.random.split(key)
        pose_samples = pose_matrix_fisher_sampling(
            key_p, pred["pose_params_U"], pred["pose_params_S"],
            pred["pose_params_V"], NUM_SAMPLES)
        shape_samples = shape_gaussian_sampling(
            key_s, pred["shape_mean"], jnp.exp(pred["shape_log_std"]),
            NUM_SAMPLES)

        out = smpl(body_pose=pose_samples.reshape(B * NUM_SAMPLES, 23, 3, 3),
                   global_orient=jnp.repeat(glob_rotmats[:, None], NUM_SAMPLES,
                                            axis=1)
                   .reshape(B * NUM_SAMPLES, 1, 3, 3),
                   betas=shape_samples.reshape(B * NUM_SAMPLES, -1),
                   pose2rot=False)
        verts = out["vertices"].reshape(B, NUM_SAMPLES, -1, 3)
        uncertainty = jnp.linalg.norm(
            verts - verts.mean(axis=1, keepdims=True), axis=-1).mean(axis=1)
        return verts.mean(), uncertainty

    n_iters = 10

    # The whole timing loop runs on-device (lax.fori_loop inside one jit):
    # a single dispatch + single scalar fetch, so neither the axon tunnel's
    # per-call latency nor its unreliable block_until_ready pollute the
    # measurement — this is the steady-state throughput a pipelined server
    # achieves.
    # Model parameters are passed as ARGUMENTS (device buffers), not closure
    # constants: baking HRNet-W48's 63M weights into the HLO as literals blows
    # past serialized-module size limits (and is wrong for perf anyway).
    @jax.jit
    def bench_loop(key, rgb512, hrnet_vars, variables):
        def body(i, carry):
            # i-dependent input perturbation: the RNG key alone only varies
            # the sampling stage, and XLA hoists the loop-invariant
            # HRNet/crop/Canny/predictor chain OUT of the loop — the loop
            # would then measure a fraction of the pipeline. The epsilon is
            # numerically invisible but defeats loop-invariant code motion.
            rgb_i = rgb512 * (1.0 + jnp.float32(i) * jnp.float32(1e-9))
            out = pipeline(jax.random.fold_in(key, i), rgb_i, hrnet_vars,
                           variables)
            return carry + out[0]
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    rng = np.random.RandomState(0)
    rgb512 = jnp.asarray(rng.rand(B, 3, IMG, IMG).astype(np.float32))
    key = jax.random.PRNGKey(0)

    hrnet_vars = jax.device_put(cast_floating(hrnet_vars))
    variables = jax.device_put(variables)
    float(np.asarray(bench_loop(key, rgb512, hrnet_vars, variables)))  # warm up

    # Median of n_repeats timed runs, each itself a 10-iteration on-device
    # loop. One number per round proved noisy (round 4: 737 vs round 3: 760,
    # ambiguous between a regression and run-to-run spread — VERDICT weak #5);
    # the median + recorded min/max makes a real 5% regression distinguishable
    # from wobble. `value` stays the single driver-compatible number.
    n_repeats = 5
    rates = []
    for r in range(n_repeats):
        t0 = time.perf_counter()
        float(np.asarray(bench_loop(jax.random.fold_in(key, 123 + r), rgb512,
                                    hrnet_vars, variables)))
        dt = time.perf_counter() - t0
        rates.append(B * n_iters / dt)
    rates.sort()
    images_per_sec = float(np.median(rates))
    spread_pct = 100.0 * (rates[-1] - rates[0]) / images_per_sec
    if spread_pct > 5.0:
        print(f"[bench] WARNING: run-to-run spread {spread_pct:.1f}% > 5% "
              f"(min {rates[0]:.1f}, max {rates[-1]:.1f} img/s) — rerun "
              "before trusting round-over-round deltas", file=sys.stderr,
              flush=True)
    baseline = 50.0  # driver-set north-star (BASELINE.json), images/s @ 100 samples
    print(json.dumps({
        "metric": "e2e_predict_images_per_sec_hrnet_w48_plus_100smpl_samples",
        "value": round(images_per_sec, 2),
        "unit": "images/s",
        "vs_baseline": round(images_per_sec / baseline, 3),
        "median_of": n_repeats,
        "min": round(rates[0], 2),
        "max": round(rates[-1], 2),
        "spread_pct": round(spread_pct, 2),
    }))

    # A successful DEFAULT-config run is itself a refresh of .cache/jax_bench
    # (any recompiles this pipeline needed just happened into it), so stamp
    # its manifest entry here — the restamp is part of producing the
    # artifact, not a separate manual step (round-3 postmortem: manual
    # restamps shipped a stale manifest at HEAD). Ablation runs (argv
    # overrides) compile DIFFERENT programs and must not stamp.
    if argv_b is None and argv_n is None:
        from hierarchicalprobabilistic3dhuman_tpu.runtime.cache_manifest import (
            prune_superseded, stamp_cache)
        deleted = prune_superseded(cache_dir, run_start_time)
        if deleted:
            print(f"[cache-manifest] pruned {len(deleted)} superseded "
                  f"jax_bench blob(s)", file=sys.stderr, flush=True)
        stamp_cache("jax_bench")


if __name__ == "__main__":
    main()
