"""Component-level device timings for the predict pipeline (bench.py's stack).

Times each stage of the end-to-end predict path in isolation with the same
shapes bench.py uses, so optimisation effort goes where the milliseconds are:

    crop384     512^2 -> 384x288 affine crop
    hrnet_f32 / hrnet_bf16   HRNet-W48 forward
    argmax      heatmap -> 17 keypoints
    crop256+canny+heatmaps   proxy-representation build
    predictor   ResNet-18 + hierarchical MF head (23 SVDs)
    sampling    100 matrix-Fisher + Gaussian samples
    smpl100     batched LBS over B*100 bodies
    uncertainty per-vertex spread

Each stage runs in its own jitted fori_loop (single dispatch, scalar fetch),
identical methodology to bench.py. Prints one line per stage.

Usage: python benchmarks/predict_components.py [B] [iters]
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
    from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import proper_svd3x3
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
        get_kp_locations_confs_from_heatmaps, IMAGENET_MEAN, IMAGENET_STD)
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_pose_mf_shape_gaussian_net import (
        build_proxy_representation)
    from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
        batch_crop_affine)
    from hierarchicalprobabilistic3dhuman_tpu.utils.precision import (
        cast_floating)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    N = 100
    IMG = 512

    pose_shape_cfg = get_pose_shape_cfg_defaults()
    hrnet_cfg = get_pose2d_hrnet_cfg_defaults()
    D = pose_shape_cfg.DATA.PROXY_REP_SIZE
    in_w, in_h = hrnet_cfg.MODEL.IMAGE_SIZE
    hm_w, hm_h = hrnet_cfg.MODEL.HEATMAP_SIZE

    hrnet = PoseHighResolutionNet(num_joints=17)
    hrnet_vars = hrnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, in_h, in_w)))
    hrnet_vars_bf16 = cast_floating(hrnet_vars)
    model = PoseMFShapeGaussianNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18, D, D)))
    edge_model = CannyEdgeDetector(threshold=0.0)
    smpl = SMPL.synthetic()

    rng = np.random.RandomState(0)
    rgb512 = jnp.asarray(rng.rand(B, 3, IMG, IMG).astype(np.float32))
    crop384 = jnp.asarray(rng.rand(B, 3, in_h, in_w).astype(np.float32))
    hr_heatmaps = jnp.asarray(rng.rand(B, 17, hm_h, hm_w).astype(np.float32))
    proxy = jnp.asarray(rng.rand(B, 18, D, D).astype(np.float32))
    joints2d = jnp.asarray((rng.rand(B, 17, 2) * D).astype(np.float32))
    confs = jnp.asarray(rng.rand(B, 17).astype(np.float32))
    Fmat = jnp.asarray((rng.randn(B, 23, 3, 3) * 0.3
                        + 3 * np.eye(3)).astype(np.float32))
    svd = proper_svd3x3(Fmat)
    mean10 = jnp.asarray(rng.randn(B, 10).astype(np.float32))
    std10 = jnp.asarray(np.abs(rng.randn(B, 10) * 0.1 + 0.2).astype(np.float32))
    pose_rm = jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                          (B * N, 23, 3, 3)).copy())
    glob_rm = jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                          (B * N, 1, 3, 3)).copy())
    betas = jnp.asarray(rng.randn(B * N, 10).astype(np.float32))
    verts_s = jnp.asarray(rng.rand(B, N, 6890, 3).astype(np.float32))

    mean_c = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std_c = jnp.asarray(IMAGENET_STD)[:, None, None]
    hr_centres = jnp.full((B, 2), IMG / 2.0)
    hr_heights = jnp.full((B,), float(IMG))
    hr_widths = jnp.full((B,), IMG / (float(in_h) / float(in_w)))

    stages = {}

    stages["crop384"] = (lambda args: batch_crop_affine(
        (in_w, in_h), rgb=args[0], bbox_centres=hr_centres,
        bbox_heights=hr_heights, bbox_widths=hr_widths,
        orig_scale_factor=pose_shape_cfg.DATA.BBOX_SCALE_FACTOR)["rgb"].mean(),
        (rgb512,))
    stages["hrnet_f32"] = (lambda args: hrnet.apply(
        args[1], (args[0] - mean_c) / std_c).mean(), (crop384, hrnet_vars))
    stages["hrnet_bf16"] = (lambda args: hrnet.apply(
        args[1], ((args[0] - mean_c) / std_c).astype(jnp.bfloat16))
        .astype(jnp.float32).mean(), (crop384, hrnet_vars_bf16))
    stages["argmax_kps"] = (lambda args: sum(
        x.mean() for x in get_kp_locations_confs_from_heatmaps(args[0])),
        (hr_heatmaps,))
    def _proxy_stage(args):
        cropped = batch_crop_affine(
            (D, D), joints2D=args[1], rgb=args[0],
            bbox_centres=jnp.full((B, 2), in_h * 0.5).at[:, 1].set(in_w * 0.5),
            bbox_heights=jnp.full((B,), float(in_h)),
            bbox_widths=jnp.full((B,), float(in_h)),
            orig_scale_factor=1.0)
        return build_proxy_representation(cropped["rgb"], cropped["joints2D"],
                                          args[2], edge_model,
                                          pose_shape_cfg).mean()
    stages["proxy_build"] = (_proxy_stage, (crop384, joints2d, confs))
    stages["predictor"] = (lambda args: sum(
        jnp.sum(v).astype(jnp.float32) for v in
        (lambda o: (o["pose_params_F"], o["shape_mean"], o["cam"]))(
            model.apply(args[1], args[0]))), (proxy, variables))
    stages["mf_sampling"] = (lambda args: pose_matrix_fisher_sampling(
        jax.random.PRNGKey(3), args[0], args[1], args[2], N).mean()
        + shape_gaussian_sampling(jax.random.PRNGKey(4), args[3], args[4],
                                  N).mean(),
        (svd["U"], svd["S"], svd["V"], mean10, std10))
    stages["smpl100"] = (lambda args: smpl(
        body_pose=args[0], global_orient=args[1], betas=args[2],
        pose2rot=False)["vertices"].mean(), (pose_rm, glob_rm, betas))
    stages["uncertainty"] = (lambda args: jnp.linalg.norm(
        args[0] - args[0].mean(axis=1, keepdims=True), axis=-1)
        .mean(axis=1).mean(), (verts_s,))

    def _full_pipeline(args):
        rgb = args[0]
        hr_crop = batch_crop_affine(
            (in_w, in_h), rgb=rgb, bbox_centres=hr_centres,
            bbox_heights=hr_heights, bbox_widths=hr_widths,
            orig_scale_factor=pose_shape_cfg.DATA.BBOX_SCALE_FACTOR)["rgb"]
        hm = hrnet.apply(args[1], (hr_crop - mean_c) / std_c)
        j2d, cf = get_kp_locations_confs_from_heatmaps(hm)
        j2d = j2d * (in_w / float(hm_w))
        cropped = batch_crop_affine(
            (D, D), joints2D=j2d, rgb=hr_crop,
            bbox_centres=jnp.full((B, 2), in_h * 0.5).at[:, 1].set(in_w * 0.5),
            bbox_heights=jnp.full((B,), float(in_h)),
            bbox_widths=jnp.full((B,), float(in_h)),
            orig_scale_factor=1.0)
        pr = build_proxy_representation(cropped["rgb"], cropped["joints2D"],
                                        cf, edge_model, pose_shape_cfg)
        pred = model.apply(args[2], pr)
        ps = pose_matrix_fisher_sampling(
            jax.random.PRNGKey(3), pred["pose_params_U"],
            pred["pose_params_S"], pred["pose_params_V"], N)
        ss = shape_gaussian_sampling(jax.random.PRNGKey(4), pred["shape_mean"],
                                     jnp.exp(pred["shape_log_std"]), N)
        out = smpl(body_pose=ps.reshape(B * N, 23, 3, 3),
                   global_orient=glob_rm, betas=ss.reshape(B * N, -1),
                   pose2rot=False)
        v = out["vertices"].reshape(B, N, -1, 3)
        return jnp.linalg.norm(v - v.mean(axis=1, keepdims=True),
                               axis=-1).mean()
    stages["FULL_pipeline"] = (_full_pipeline, (rgb512, hrnet_vars, variables))

    # Dispatch-floor reference: a trivial body. Subtract its ms/step from the
    # other stages to get true device time (the axon tunnel's round-trip is
    # ~25-30 ms per loop call).
    stages["null_floor"] = (lambda args: args[0].mean(), (confs,))

    print(f"B={B} iters={iters} device={jax.devices()[0].platform}",
          flush=True)
    for name, (fn, args) in stages.items():
        if only is not None and not any(s in name for s in only):
            continue
        @jax.jit
        def loop(args):
            def body(i, carry):
                # i-dependent input perturbation: defeats XLA's loop-invariant
                # code motion, which would otherwise hoist the whole stage out
                # of the loop and measure only the dispatch floor.
                eps = jnp.float32(i) * jnp.float32(1e-12)
                a0 = args[0] * (1.0 + eps).astype(args[0].dtype)
                return carry + fn((a0,) + tuple(args[1:])).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        args = jax.device_put(args)
        float(np.asarray(loop(args)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(loop(args)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:14s} {dt * 1e3:8.3f} ms/step  "
              f"{dt / B * 1e6:8.1f} us/img", flush=True)


if __name__ == "__main__":
    main()
