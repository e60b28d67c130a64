"""Evaluation CLI — same public flags as the reference run_evaluate.py:97-115.

python run_evaluate.py --dataset ssp3d [--pose_shape_weights ...] [--batch_size 8]
(or, pip-installed: hp3d-evaluate --dataset ssp3d ...)
"""

import argparse
import os

import numpy as np


def run_evaluate(args):
    import jax
    from hierarchicalprobabilistic3dhuman_tpu.runtime import cli_cache
    cli_cache.enable()
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults, paths)
    from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
        PoseMFShapeGaussianNet)
    from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import CannyEdgeDetector
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.data.pw3d_eval_dataset import PW3DEvalDataset
    from hierarchicalprobabilistic3dhuman_tpu.data.ssp3d_eval_dataset import SSP3DEvalDataset
    from hierarchicalprobabilistic3dhuman_tpu.evaluate.evaluate_pose_mf_shape_gaussian_net import (
        evaluate_pose_mf_shape_gaussian_net)
    from hierarchicalprobabilistic3dhuman_tpu.cli.predict import (
        _load_predictor_variables)

    pose_shape_cfg = get_pose_shape_cfg_defaults()
    if args.pose_shape_cfg is not None:
        pose_shape_cfg.merge_from_file(args.pose_shape_cfg)

    # Dataset + metric selection (reference run_evaluate.py:56-70)
    if args.dataset == "3dpw":
        metrics = ['PVE', 'PVE-SC', 'PVE-PA', 'PVE-T-SC', 'MPJPE', 'MPJPE-SC',
                   'MPJPE-PA', 'joints2D-L2E']
        metrics.extend([metric + '_samples_min' for metric in metrics
                        if metric != 'joints2D-L2E'])
        dataset_path = args.dataset_path or paths.PW3D_PATH
        eval_dataset = PW3DEvalDataset(dataset_path, pose_shape_cfg,
                                       visible_joints_threshold=0.6)
    elif args.dataset == "ssp3d":
        metrics = ['PVE-PA', 'PVE-T-SC', 'silhouette-IOU', 'joints2D-L2E',
                   'joints2Dsamples-L2E', 'silhouettesamples-IOU']
        dataset_path = args.dataset_path or paths.SSP3D_PATH
        eval_dataset = SSP3DEvalDataset(dataset_path, pose_shape_cfg,
                                        visible_joints_threshold=0.6)
    else:
        raise ValueError(f"Unknown dataset {args.dataset}")
    print(f"\nEvaluating on {args.dataset} with {len(eval_dataset)} examples.")

    # Models
    edge_detect_model = CannyEdgeDetector(
        non_max_suppression=pose_shape_cfg.DATA.EDGE_NMS,
        gaussian_filter_std=pose_shape_cfg.DATA.EDGE_GAUSSIAN_STD,
        gaussian_filter_size=pose_shape_cfg.DATA.EDGE_GAUSSIAN_SIZE,
        threshold=pose_shape_cfg.DATA.EDGE_THRESHOLD)

    def load_smpl(gender):
        try:
            return SMPL(gender=gender, num_betas=pose_shape_cfg.MODEL.NUM_SMPL_BETAS)
        except FileNotFoundError:
            print(f"WARNING: SMPL {gender} model files missing; using synthetic.")
            return SMPL.synthetic(num_betas=pose_shape_cfg.MODEL.NUM_SMPL_BETAS)

    smpl_neutral = load_smpl("neutral")
    smpl_male = load_smpl("male")
    smpl_female = load_smpl("female")

    # Converted torch checkpoints were trained on LAPACK gesdd sign
    # conventions; 'auto' selects the DEVICE-NATIVE gesdd-sign SVD for them
    # so the hierarchical head sees reference-identical inputs at every
    # depth, on every backend including TPU (ops/lapack_svd3.py;
    # tests/test_svd_sign_parity.py and benchmarks/svd_parity_mm.py
    # quantify all modes). 'lapack_callback' is the numpy host-callback
    # oracle and needs a callback-capable backend.
    svd_impl = args.svd_impl
    if svd_impl == "auto":
        w = args.pose_shape_weights or ""
        svd_impl = "lapack" if w.endswith((".tar", ".pth", ".pt")) else "jacobi"
    if svd_impl == "lapack_callback":
        from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import (
            lapack_mode_supported)
        if not lapack_mode_supported():
            print("WARNING: this backend does not support host callbacks; "
                  "svd_impl=lapack_callback cannot run here. Using the "
                  "device-native gesdd emulation (svd_impl=lapack) instead — "
                  "same sign conventions, ~98% bit-agreement with the "
                  "callback (ops/lapack_svd3.py).")
            svd_impl = "lapack"
    pose_shape_model = PoseMFShapeGaussianNet(
        num_in_channels=pose_shape_cfg.MODEL.NUM_IN_CHANNELS,
        num_resnet_layers=pose_shape_cfg.MODEL.NUM_RESNET_LAYERS,
        embed_dim=pose_shape_cfg.MODEL.EMBED_DIM,
        delta_i=pose_shape_cfg.MODEL.DELTA_I,
        delta_i_weight=pose_shape_cfg.MODEL.DELTA_I_WEIGHT,
        num_smpl_betas=pose_shape_cfg.MODEL.NUM_SMPL_BETAS,
        svd_impl=svd_impl)
    proxy_example = jnp.zeros((1, pose_shape_cfg.MODEL.NUM_IN_CHANNELS,
                               pose_shape_cfg.DATA.PROXY_REP_SIZE,
                               pose_shape_cfg.DATA.PROXY_REP_SIZE))
    variables = jax.device_put(_load_predictor_variables(
        args.pose_shape_weights, pose_shape_model, proxy_example))
    # Params-explicit apply: weights as jit ARGUMENTS, not compiled-in
    # constants (see run_predict.py — constants cost a tunnel download at
    # trace time and a weight-sized serialized executable).
    pose_shape_apply = pose_shape_model.apply

    save_path = args.save_path or os.path.join("./evaluations", args.dataset)
    os.makedirs(save_path, exist_ok=True)

    # Device mesh: dataset-sharded eval over "data", distribution samples
    # over "sample" (the reference is a serial single-device bs=1 loop).
    from hierarchicalprobabilistic3dhuman_tpu.parallel import (
        make_mesh, distributed_init)
    distributed_init()
    n_avail = len(jax.devices())
    n_devices = args.num_devices if args.num_devices is not None else n_avail
    mesh = None
    if n_devices > 1 and args.batch_size % max(
            n_devices // args.sample_parallel, 1) == 0:
        mesh = make_mesh(n_devices=n_devices,
                         sample_parallel=args.sample_parallel)
        print(f"Evaluating on mesh {dict(mesh.shape)} "
              f"({n_devices}/{n_avail} devices)")

    return evaluate_pose_mf_shape_gaussian_net(
        pose_shape_apply=pose_shape_apply,
        pose_shape_cfg=pose_shape_cfg,
        smpl_neutral=smpl_neutral,
        smpl_male=smpl_male,
        smpl_female=smpl_female,
        edge_detect_model=edge_detect_model,
        metrics=metrics,
        eval_dataset=eval_dataset,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        num_samples_for_metrics=args.num_samples,
        save_path=save_path,
        save_per_frame_metrics=True,
        mesh=mesh,
        pose_shape_vars=variables)


def build_parser():
    parser = argparse.ArgumentParser(
        prog="hp3d-evaluate",
        description="3DPW / SSP-3D benchmark evaluation "
                    "(reference run_evaluate.py flags).")
    parser.add_argument("--dataset", "-D", type=str, required=True,
                        choices=["3dpw", "ssp3d"])
    parser.add_argument("--dataset_path", type=str, default=None,
                        help="Override configs.paths dataset location.")
    parser.add_argument("--pose_shape_weights", "-W3D", type=str, default=None)
    parser.add_argument("--pose_shape_cfg", type=str, default=None)
    parser.add_argument("--svd_impl", type=str, default="auto",
                        choices=["auto", "jacobi", "lapack",
                                 "lapack_callback"],
                        help="3x3 SVD kernel: on-device jacobi (fast), "
                             "device-native gesdd-sign emulation 'lapack' "
                             "(converted-checkpoint parity, any backend), "
                             "or the numpy host-callback oracle.")
    parser.add_argument("--save_path", type=str, default=None)
    parser.add_argument("--num_samples", "-N", type=int, default=10,
                        help="Number of samples for sample-based metrics.")
    parser.add_argument("--batch_size", "-B", type=int, default=1,
                        help="Eval batch size (the reference is locked to 1; "
                             "larger is supported and faster).")
    parser.add_argument("--num_workers", type=int, default=2)
    parser.add_argument("--num_devices", type=int, default=None,
                        help="Devices for dataset-sharded eval (default: all "
                             "local; 1 forces the unsharded path).")
    parser.add_argument("--sample_parallel", type=int, default=1,
                        help="Size of the mesh 'sample' axis (distribution "
                             "samples shard across it).")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Capture a jax.profiler trace of evaluation here.")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from hierarchicalprobabilistic3dhuman_tpu.runtime.profiling import trace
    with trace(args.profile_dir):
        return run_evaluate(args)


if __name__ == "__main__":
    main()
