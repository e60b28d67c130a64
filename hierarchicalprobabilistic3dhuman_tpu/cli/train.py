"""Training CLI — same public flags as the reference run_train.py:121-140.

python run_train.py -E experiments/exp_001 [-O TRAIN.BATCH_SIZE 8 ...] [-R 20]
(or, pip-installed: hp3d-train -E experiments/exp_001 ...)

Experiment directory layout matches the reference (run_train.py:28-50):
    <experiment_dir>/saved_models/epoch_{N:03d}.tar
    <experiment_dir>/log.pkl
    <experiment_dir>/pose_shape_cfg.yaml
"""

import argparse
import os


def resolve_encoder_precision(experiment_dir, bf16_flag, resuming):
    """Persist/restore the encoder compute precision for an experiment.

    Encoder precision is experiment state, not a per-invocation flag: a
    resumed run must keep the mode it trained with (--bf16_encoder
    checkpoints are by design identical to f32 ones, so nothing else would
    catch a silent mid-run precision switch). Stored as a sidecar file
    rather than a cfg key to keep the yacs tree bit-identical to the
    reference's.

    :returns: the effective bf16 flag (the saved mode wins on resume).
    """
    marker = os.path.join(experiment_dir, "encoder_precision.txt")
    if not resuming:
        with open(marker, "w") as f:
            f.write("bfloat16" if bf16_flag else "float32")
        return bf16_flag
    if os.path.exists(marker):
        with open(marker) as f:
            saved_mode = f.read().strip()
        resumed_bf16 = saved_mode == "bfloat16"
        if bf16_flag != resumed_bf16:
            print(f"WARNING: experiment was trained with encoder precision "
                  f"'{saved_mode}'; ignoring the command line and resuming "
                  f"in that mode.")
        return resumed_bf16
    return bf16_flag


def run_train(args):
    import jax
    from hierarchicalprobabilistic3dhuman_tpu.runtime import cli_cache
    cli_cache.enable()
    import jax.numpy as jnp
    import optax

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults, paths)
    from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
        PoseMFShapeGaussianNet)
    from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import CannyEdgeDetector
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.renderers import TexturedIUVRenderer
    from hierarchicalprobabilistic3dhuman_tpu.data.on_the_fly_smpl_train_dataset import (
        OnTheFlySMPLTrainDataset)
    from hierarchicalprobabilistic3dhuman_tpu.runtime.checkpointing import (
        checkpoint_path, load_training_checkpoint)
    from hierarchicalprobabilistic3dhuman_tpu.train.train_pose_mf_shape_gaussian_net import (
        train_pose_mf_shape_gaussian_net)

    # Experiment directory layout (reference run_train.py:28-33)
    experiment_dir = args.experiment_dir
    model_save_dir = os.path.join(experiment_dir, "saved_models")
    logs_save_path = os.path.join(experiment_dir, "log.pkl")
    cfg_save_path = os.path.join(experiment_dir, "pose_shape_cfg.yaml")
    os.makedirs(model_save_dir, exist_ok=True)

    pose_shape_cfg = get_pose_shape_cfg_defaults()
    checkpoint = None
    if args.resume_from_epoch is not None:
        # Resume: load saved config + checkpoint (reference :45-50)
        pose_shape_cfg.merge_from_file(cfg_save_path)
        args.bf16_encoder = resolve_encoder_precision(
            experiment_dir, args.bf16_encoder, resuming=True)
        ckpt_path = checkpoint_path(model_save_dir, args.resume_from_epoch)
        print(f"\nResuming from {ckpt_path}")
        checkpoint = load_training_checkpoint(ckpt_path)
    else:
        if args.pose_shape_cfg_opts is not None:
            pose_shape_cfg.merge_from_list(args.pose_shape_cfg_opts)
        with open(cfg_save_path, "w") as f:
            f.write(pose_shape_cfg.dump())
        resolve_encoder_precision(experiment_dir, args.bf16_encoder,
                                  resuming=False)
        print(f"\nSaved config to {cfg_save_path}")

    # Datasets (reference :54-69); synthetic fallback when files are absent.
    try:
        train_dataset = OnTheFlySMPLTrainDataset(
            poses_path=paths.TRAIN_POSES_PATH,
            textures_path=paths.TRAIN_TEXTURES_PATH,
            backgrounds_dir_path=paths.TRAIN_BACKGROUNDS_PATH,
            params_from="not_amass",
            img_wh=pose_shape_cfg.DATA.PROXY_REP_SIZE)
        val_dataset = OnTheFlySMPLTrainDataset(
            poses_path=paths.VAL_POSES_PATH,
            textures_path=paths.VAL_TEXTURES_PATH,
            backgrounds_dir_path=paths.VAL_BACKGROUNDS_PATH,
            params_from="all",
            img_wh=pose_shape_cfg.DATA.PROXY_REP_SIZE)
    except (FileNotFoundError, OSError) as e:
        print(f"WARNING: training data files unavailable ({e}); "
              f"using synthetic fallback data.")
        train_dataset = OnTheFlySMPLTrainDataset.synthetic(
            n=max(pose_shape_cfg.TRAIN.BATCH_SIZE * 4, 64),
            img_wh=pose_shape_cfg.DATA.PROXY_REP_SIZE)
        val_dataset = OnTheFlySMPLTrainDataset.synthetic(
            n=max(pose_shape_cfg.TRAIN.BATCH_SIZE * 2, 32),
            img_wh=pose_shape_cfg.DATA.PROXY_REP_SIZE, seed=1)
    print("Training poses:", len(train_dataset))
    print("Validation poses:", len(val_dataset))

    # Models (reference :72-92)
    edge_detect_model = CannyEdgeDetector(
        non_max_suppression=pose_shape_cfg.DATA.EDGE_NMS,
        gaussian_filter_std=pose_shape_cfg.DATA.EDGE_GAUSSIAN_STD,
        gaussian_filter_size=pose_shape_cfg.DATA.EDGE_GAUSSIAN_SIZE,
        threshold=pose_shape_cfg.DATA.EDGE_THRESHOLD)
    try:
        smpl_model = SMPL(gender="neutral",
                          num_betas=pose_shape_cfg.MODEL.NUM_SMPL_BETAS)
    except FileNotFoundError:
        print("WARNING: SMPL model files missing; using synthetic SMPL.")
        smpl_model = SMPL.synthetic(num_betas=pose_shape_cfg.MODEL.NUM_SMPL_BETAS)

    renderer = TexturedIUVRenderer(
        img_wh=pose_shape_cfg.DATA.PROXY_REP_SIZE,
        projection_type="perspective",
        perspective_focal_length=pose_shape_cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH,
        render_rgb=True)

    pose_shape_model = PoseMFShapeGaussianNet(
        num_in_channels=pose_shape_cfg.MODEL.NUM_IN_CHANNELS,
        num_resnet_layers=pose_shape_cfg.MODEL.NUM_RESNET_LAYERS,
        embed_dim=pose_shape_cfg.MODEL.EMBED_DIM,
        delta_i=pose_shape_cfg.MODEL.DELTA_I,
        delta_i_weight=pose_shape_cfg.MODEL.DELTA_I_WEIGHT,
        num_smpl_betas=pose_shape_cfg.MODEL.NUM_SMPL_BETAS,
        encoder_dtype=jnp.bfloat16 if args.bf16_encoder else None)
    proxy_example = jnp.zeros((1, pose_shape_cfg.MODEL.NUM_IN_CHANNELS,
                               pose_shape_cfg.DATA.PROXY_REP_SIZE,
                               pose_shape_cfg.DATA.PROXY_REP_SIZE))
    variables = pose_shape_model.init(jax.random.PRNGKey(args.rng_seed),
                                      proxy_example)
    variables = dict(variables)

    optimizer = optax.adam(pose_shape_cfg.TRAIN.LR)
    opt_state = None
    if checkpoint is not None:
        variables = checkpoint["model_state_dict"]
        opt_state = checkpoint.get("optimiser_state_dict")

    # Metric list (reference :115)
    metrics = ['PVE', 'PVE-SC', 'PVE-T-SC', 'MPJPE', 'MPJPE-SC', 'MPJPE-PA',
               'joints2D-L2E']

    # Device mesh: auto data-parallel across all local devices (the reference
    # is single-GPU only, run_train.py:132-135). --num_devices 1 forces the
    # plain single-device path; --sample_parallel splits the mesh into
    # ("data", "sample") so stage-2 distribution samples shard separately.
    from hierarchicalprobabilistic3dhuman_tpu.parallel import (
        make_mesh, distributed_init)
    distributed_init(coordinator_address=args.coordinator_address,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    n_avail = len(jax.devices())
    n_devices = args.num_devices if args.num_devices is not None else n_avail
    mesh = None
    if n_devices > 1:
        mesh = make_mesh(n_devices=n_devices,
                         sample_parallel=args.sample_parallel)
        print(f"Training on mesh {dict(mesh.shape)} "
              f"({n_devices}/{n_avail} devices)")

    # Optional native C++ input pipeline: batches assembled by mmap+memcpy on
    # C++ threads from packed stores (data/pack_training_stores.py), uint8
    # textures/backgrounds end-to-end (normalised on device).
    loaders = None
    if args.native_data_dir is not None:
        from hierarchicalprobabilistic3dhuman_tpu.data.native_loader import (
            NativeTrainLoader)

        def store_dir(split):
            sub = os.path.join(args.native_data_dir, split)
            return sub if os.path.isdir(sub) else args.native_data_dir

        loaders = {
            "train": NativeTrainLoader(store_dir("train"),
                                       pose_shape_cfg.TRAIN.BATCH_SIZE,
                                       seed=args.rng_seed),
            "val": NativeTrainLoader(store_dir("val"),
                                     pose_shape_cfg.TRAIN.BATCH_SIZE,
                                     seed=args.rng_seed + 1),
        }
        print(f"Native input pipeline: {args.native_data_dir} "
              f"({loaders['train'].steps_per_epoch} train steps/epoch)")

    train_pose_mf_shape_gaussian_net(
        pose_shape_model=pose_shape_model,
        pose_shape_cfg=pose_shape_cfg,
        smpl_model=smpl_model,
        edge_detect_model=edge_detect_model,
        renderer=renderer,
        train_dataset=train_dataset,
        val_dataset=val_dataset,
        optimizer=optimizer,
        metrics=metrics,
        model_save_dir=model_save_dir,
        logs_save_path=logs_save_path,
        initial_variables=variables,
        checkpoint=checkpoint,
        opt_state=opt_state,
        rng_seed=args.rng_seed,
        num_epochs=args.num_epochs,
        mesh=mesh,
        loaders=loaders)


def build_parser():
    parser = argparse.ArgumentParser(
        prog="hp3d-train",
        description="Synthetic-data distribution-predictor training "
                    "(reference run_train.py flags).")
    parser.add_argument("--experiment_dir", "-E", type=str, required=True)
    parser.add_argument("--pose_shape_cfg_opts", "-O", nargs="*", default=None,
                        help="Config option overrides: KEY VALUE pairs.")
    parser.add_argument("--resume_from_epoch", "-R", type=int, default=None)
    parser.add_argument("--rng_seed", type=int, default=0)
    parser.add_argument("--num_epochs", type=int, default=None,
                        help="Override TRAIN.NUM_EPOCHS (e.g. for smoke runs).")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="Devices to train on (default: all local; 1 "
                             "forces the unsharded path).")
    parser.add_argument("--sample_parallel", type=int, default=1,
                        help="Size of the mesh 'sample' axis (distribution "
                             "samples shard across it in stage 2).")
    parser.add_argument("--native_data_dir", type=str, default=None,
                        help="Directory of packed .bin stores (see "
                             "data/pack_training_stores.py); enables the "
                             "C++ batch-assembly input pipeline.")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="jax.distributed coordinator (multi-host only).")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--bf16_encoder", action="store_true",
                        help="Run the ResNet encoder convs in bfloat16 "
                             "(mixed precision: params/BatchNorm/head stay "
                             "f32, checkpoints unchanged). Default f32 "
                             "matches the reference's training numerics.")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Capture a jax.profiler trace of training here.")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from hierarchicalprobabilistic3dhuman_tpu.runtime.profiling import trace
    with trace(args.profile_dir):
        return run_train(args)


if __name__ == "__main__":
    main()
