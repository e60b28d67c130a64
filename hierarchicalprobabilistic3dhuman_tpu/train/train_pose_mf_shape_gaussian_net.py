"""Training driver: on-the-fly synthetic data + two-stage distribution loss.

Behavioural equivalent of reference train/train_poseMF_shapeGaussian_net.py:27-405,
rebuilt TPU-first:

  * the ENTIRE per-batch computation — synthetic scene synthesis (SMPL
    targets, camera/light augmentation, textured render, crop, occlusion
    checks, proxy-rep augmentation, Canny, heatmaps), forward pass, MF
    sampling, loss and Adam update — is ONE jitted function per (split,
    stage); the reference interleaves dozens of eager torch calls with CPU
    SVD/sampling round-trips;
  * host code only feeds (pose, background, texture) batches and accumulates
    metrics;
  * two-stage loss schedule (switch at LOSS.STAGE_CHANGE_EPOCH) is two
    compiled step variants, selected per epoch;
  * checkpointing keeps the reference's file naming and dict contents.
"""

import os

from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from hierarchicalprobabilistic3dhuman_tpu.losses import PoseMFShapeGaussianLoss
from hierarchicalprobabilistic3dhuman_tpu.metrics import TrainingLossesAndMetricsTracker
from hierarchicalprobabilistic3dhuman_tpu.ops.bingham_sampling import (
    pose_matrix_fisher_sampling, shape_gaussian_sampling)
from hierarchicalprobabilistic3dhuman_tpu.runtime.checkpointing import (
    checkpoint_path, save_training_checkpoint, load_training_info_from_checkpoint)
from hierarchicalprobabilistic3dhuman_tpu.utils.cam_utils import (
    perspective_project, orthographic_project)
from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
    batch_add_rgb_background, batch_crop_affine)
from hierarchicalprobabilistic3dhuman_tpu.utils.joints2d_utils import (
    check_joints2d_visibility, check_joints2d_occluded)
from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
    convert_2Djoints_to_gaussian_heatmaps_batched,
    convert_densepose_seg_to_14part_labels,
    ALL_JOINTS_TO_COCO_MAP, ALL_JOINTS_TO_H36M_MAP, H36M_TO_J14)
from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import (
    rot6d_to_rotmat, batch_rodrigues, so3_exp, aa_rotate_translate_points)
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.smpl_augmentation import (
    normal_sample_shape)
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.cam_augmentation import (
    augment_cam_t)
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.lighting_augmentation import (
    augment_light)
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.proxy_rep_augmentation import (
    augment_proxy_representation, random_extreme_crop)
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.rgb_augmentation import (
    augment_rgb)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def make_synth_data_fn(pose_shape_cfg, smpl_model, renderer, edge_detect_model):
    """Build the jitted synthetic-scene generator.

    (key, pose (B, 72), background (B, 3, D, D), texture (B, tH, tW, 3))
        -> proxy (B, 18, D, D), targets dict.
    Mirrors reference train driver :123-256.
    """
    cfg = pose_shape_cfg
    D = cfg.DATA.PROXY_REP_SIZE
    x_axis = jnp.asarray([1.0, 0.0, 0.0])
    zero_t = jnp.zeros(3)
    Rx = so3_exp(x_axis[None] * np.pi)[0]
    h36m_map = jnp.asarray(ALL_JOINTS_TO_H36M_MAP)
    j14_map = jnp.asarray(H36M_TO_J14)
    coco_map = jnp.asarray(ALL_JOINTS_TO_COCO_MAP)
    mean_shape = jnp.zeros(cfg.MODEL.NUM_SMPL_BETAS)
    shape_std = jnp.full((cfg.MODEL.NUM_SMPL_BETAS,),
                         cfg.TRAIN.SYNTH_DATA.AUGMENT.SMPL.SHAPE_STD)
    mean_cam_t = jnp.asarray(cfg.TRAIN.SYNTH_DATA.MEAN_CAM_T)

    def synth(key, pose, background, texture):
        B = pose.shape[0]
        keys = jax.random.split(key, 8)

        # uint8 inputs normalise on device — 4x less host->device traffic
        # for the big texture/background tensors.
        if background.dtype == jnp.uint8:
            background = background.astype(jnp.float32) / 255.0
        if texture.dtype == jnp.uint8:
            texture = texture.astype(jnp.float32) / 255.0

        # Pose -> rotmats, 180-degree x-flip on global (reference :131-139).
        rotmats = batch_rodrigues(pose.reshape(B, 24, 3))
        target_glob_rotmats = rotmats[:, 0] @ Rx  # post-multiply
        target_pose_rotmats = rotmats[:, 1:]

        # Shape + camera sampling.
        target_shape = normal_sample_shape(keys[0], B, mean_shape, shape_std)
        target_cam_t = augment_cam_t(keys[1],
                                     jnp.broadcast_to(mean_cam_t, (B, 3)),
                                     xy_std=cfg.TRAIN.SYNTH_DATA.AUGMENT.CAM.XY_STD,
                                     delta_z_range=cfg.TRAIN.SYNTH_DATA.AUGMENT.CAM.DELTA_Z_RANGE)

        # SMPL targets.
        smpl_out = smpl_model(body_pose=target_pose_rotmats,
                              global_orient=target_glob_rotmats[:, None],
                              betas=target_shape, pose2rot=False)
        target_vertices = smpl_out["vertices"]
        target_joints_all = smpl_out["joints"]
        target_joints_h36mlsp = target_joints_all[:, h36m_map][:, j14_map]
        target_reposed_vertices = smpl_model(betas=target_shape)["vertices"]

        # Project COCO joints with the un-flipped convention (reference :167-179).
        verts_render = aa_rotate_translate_points(target_vertices, x_axis, np.pi, zero_t)
        joints_coco = aa_rotate_translate_points(target_joints_all[:, coco_map],
                                                 x_axis, np.pi, zero_t)
        target_joints2d_coco = perspective_project(
            joints_coco, None, target_cam_t,
            focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH, img_wh=D)
        visib = check_joints2d_visibility(target_joints2d_coco, D)

        # Textured render (RGB + IUV).
        lights = augment_light(keys[2], B, cfg.TRAIN.SYNTH_DATA.AUGMENT.RGB)
        render = renderer(verts_render, textures=texture, cam_t=target_cam_t,
                          lights_rgb_settings=lights)
        iuv_in = jnp.transpose(render["iuv_images"], (0, 3, 1, 2))
        iuv_in = iuv_in.at[:, 1:].multiply(255.0)
        iuv_in = jnp.round(iuv_in)
        rgb_in = jnp.transpose(render["rgb_images"], (0, 3, 1, 2))

        # Extreme-crop seg, then bbox-jittered crop (reference :199-217).
        seg_extreme = random_extreme_crop(
            keys[3], iuv_in[:, 0],
            extreme_crop_probability=cfg.TRAIN.SYNTH_DATA.AUGMENT.PROXY_REP.EXTREME_CROP_PROB)
        crop = batch_crop_affine(
            (D, D), rgb=rgb_in, iuv=iuv_in, joints2D=target_joints2d_coco,
            bbox_determiner=seg_extreme,
            orig_scale_factor=cfg.DATA.BBOX_SCALE_FACTOR,
            delta_scale_range=cfg.TRAIN.SYNTH_DATA.AUGMENT.BBOX.DELTA_SCALE_RANGE,
            delta_centre_range=cfg.TRAIN.SYNTH_DATA.AUGMENT.BBOX.DELTA_CENTRE_RANGE,
            out_of_frame_pad_val=-1.0, rng_key=keys[4])
        iuv_in = crop["iuv"]
        target_joints2d_coco = crop["joints2D"]
        rgb_in = crop["rgb"]

        # Visibility after crop + occlusion check (reference :219-227).
        visib = check_joints2d_visibility(target_joints2d_coco, D, visib)
        seg14 = convert_densepose_seg_to_14part_labels(iuv_in[:, 0])
        visib = check_joints2d_occluded(seg14, visib, pixel_count_threshold=50)

        # Proxy-rep + RGB augmentations (reference :229-244).
        seg_aug, joints2d_input, visib = augment_proxy_representation(
            keys[5], iuv_in[:, 0], target_joints2d_coco, visib,
            cfg.TRAIN.SYNTH_DATA.AUGMENT.PROXY_REP)
        rgb_in = batch_add_rgb_background(background, rgb_in, seg_aug)
        rgb_in, joints2d_input, visib = augment_rgb(
            keys[6], rgb_in, joints2d_input, visib, cfg.TRAIN.SYNTH_DATA.AUGMENT.RGB)

        # Edges + heatmaps -> 18-channel proxy (reference :245-256).
        edge_out = edge_detect_model(rgb_in)
        edge_in = (edge_out["thresholded_thin_edges"] if cfg.DATA.EDGE_NMS
                   else edge_out["thresholded_grad_magnitude"])
        heatmaps = convert_2Djoints_to_gaussian_heatmaps_batched(
            joints2d_input, D, std=cfg.DATA.HEATMAP_GAUSSIAN_STD)
        heatmaps = heatmaps * visib[:, :, None, None]
        proxy = jnp.concatenate([edge_in, heatmaps], axis=1)

        targets = {
            "pose_params_rotmats": target_pose_rotmats,
            "glob_rotmats": target_glob_rotmats,
            "shape_params": target_shape,
            "verts": target_vertices,
            "joints3D": target_joints_h36mlsp,
            "joints2D": target_joints2d_coco,
            "joints2D_vis": visib,
            "reposed_verts": target_reposed_vertices,
        }
        return proxy, targets

    return synth


def make_train_step(pose_shape_model, pose_shape_cfg, smpl_model, renderer,
                    edge_detect_model, loss_stage_cfg, optimizer, train,
                    jit=True, mesh=None, metrics_to_track=None):
    """One jitted step: synthetic data -> forward -> loss (-> Adam update).

    With jit=False returns the raw python closure (for parallel/sharded_train
    to jit with explicit mesh shardings). With a mesh whose "sample" axis is
    non-trivial, the (B, N, ...) distribution-sample tensors and the flattened
    (B*N, ...) SMPL batch are constrained to shard over ("data", "sample") —
    the sample axis is this domain's sequence parallelism (SURVEY §2.3).

    With metrics_to_track, the per-batch metric sums (Procrustes/scale
    alignments included) are computed ON DEVICE inside the step and returned
    as a dict of scalars in place of the full metric_data/targets tensors —
    the host fetch drops from ~40 MB of meshes per batch (the reference pulls
    verts/targets to CPU numpy every batch, train driver :351-370) to a
    handful of floats. Return signature becomes
    (new_state, loss, metric_sums, terms)."""
    from hierarchicalprobabilistic3dhuman_tpu.parallel.mesh import (
        sample_sharding, flat_sample_sharding, constrain)
    from hierarchicalprobabilistic3dhuman_tpu.metrics.metric_sums import (
        make_metric_sums_fn)

    cfg = pose_shape_cfg
    D = cfg.DATA.PROXY_REP_SIZE
    synth = make_synth_data_fn(cfg, smpl_model, renderer, edge_detect_model)
    criterion = PoseMFShapeGaussianLoss(loss_stage_cfg, img_wh=D)
    use_samples = "samples" in loss_stage_cfg.J2D_LOSS_ON
    num_samples = cfg.LOSS.NUM_SAMPLES
    if mesh is not None and mesh.shape.get("sample", 1) > 1:
        samp_sh = sample_sharding(mesh)
        flat_sh = flat_sample_sharding(mesh)
    else:
        samp_sh = flat_sh = None
    x_axis = jnp.asarray([1.0, 0.0, 0.0])
    zero_t = jnp.zeros(3)
    h36m_map = jnp.asarray(ALL_JOINTS_TO_H36M_MAP)
    j14_map = jnp.asarray(H36M_TO_J14)
    coco_map = jnp.asarray(ALL_JOINTS_TO_COCO_MAP)

    def forward_loss(params, batch_stats, key, proxy, targets):
        B = proxy.shape[0]
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            pred, mutated = pose_shape_model.apply(variables, proxy, train=True,
                                                   mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            pred = pose_shape_model.apply(variables, proxy, train=False)
            new_stats = batch_stats

        pred_glob_rotmats = rot6d_to_rotmat(pred["glob"])
        mode = smpl_model(body_pose=pred["pose_rotmats_mode"],
                          global_orient=pred_glob_rotmats[:, None],
                          betas=pred["shape_mean"], pose2rot=False)
        verts_mode = mode["vertices"]
        joints_all = mode["joints"]
        joints_h36mlsp = joints_all[:, h36m_map][:, j14_map]
        joints_coco = aa_rotate_translate_points(joints_all[:, coco_map],
                                                 x_axis, np.pi, zero_t)
        j2d_mode = orthographic_project(joints_coco, pred["cam"])  # [-1,1] coords

        if use_samples:
            key_pose, key_shape = jax.random.split(key)
            pose_samples = pose_matrix_fisher_sampling(
                key_pose, pred["pose_params_U"], pred["pose_params_S"],
                pred["pose_params_V"], num_samples, b=1.5, oversampling_ratio=8)
            shape_samples = shape_gaussian_sampling(
                key_shape, pred["shape_mean"], jnp.exp(pred["shape_log_std"]),
                num_samples)
            pose_samples = constrain(pose_samples, samp_sh)
            shape_samples = constrain(shape_samples, samp_sh)
            flat = smpl_model(
                body_pose=constrain(
                    pose_samples.reshape(B * num_samples, 23, 3, 3), flat_sh),
                global_orient=jnp.repeat(pred_glob_rotmats[:, None], num_samples,
                                         axis=1).reshape(B * num_samples, 1, 3, 3),
                betas=shape_samples.reshape(B * num_samples, -1),
                pose2rot=False)["joints"][:, coco_map]
            flat = aa_rotate_translate_points(flat, x_axis, np.pi, zero_t)
            cam_rep = jnp.repeat(pred["cam"], num_samples, axis=0)
            j2d_samples = constrain(
                orthographic_project(flat, cam_rep)
                .reshape(B, num_samples, -1, 2), samp_sh)
            if loss_stage_cfg.J2D_LOSS_ON == "means+samples":
                j2d_for_loss = jnp.concatenate([j2d_mode[:, None], j2d_samples], axis=1)
            else:
                j2d_for_loss = j2d_samples
        else:
            j2d_samples = None
            j2d_for_loss = j2d_mode[:, None]

        pred_dict = {
            "pose_params_F": pred["pose_params_F"],
            "pose_params_U": pred["pose_params_U"],
            "pose_params_S": pred["pose_params_S"],
            "pose_params_V": pred["pose_params_V"],
            "shape_mean": pred["shape_mean"],
            "shape_log_std": pred["shape_log_std"],
            "verts": verts_mode,
            "joints3D": joints_h36mlsp,
            "joints2D": j2d_for_loss,
            "glob_rotmats": pred_glob_rotmats,
        }
        loss, terms = criterion(targets, pred_dict)

        metric_data = {
            "verts": verts_mode,
            "joints3D": joints_h36mlsp,
            "joints2D": j2d_mode,
            "glob_rotmats": pred_glob_rotmats,
            "shape_mean": pred["shape_mean"],
        }
        if use_samples:
            metric_data["joints2Dsamples"] = j2d_samples
        return loss, (new_stats, metric_data, terms)

    def step(state, key, pose, background, texture):
        key_synth, key_fwd = jax.random.split(key)
        proxy, targets = synth(key_synth, pose, background, texture)
        # Synthetic targets carry no parameter dependence; make that explicit.
        proxy = jax.lax.stop_gradient(proxy)
        targets = jax.tree_util.tree_map(jax.lax.stop_gradient, targets)

        if train:
            grad_fn = jax.value_and_grad(forward_loss, has_aux=True)
            (loss, (new_stats, metric_data, terms)), grads = grad_fn(
                state.params, state.batch_stats, key_fwd, proxy, targets)
            updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                      state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(new_params, new_stats, new_opt_state)
        else:
            loss, (new_stats, metric_data, terms) = forward_loss(
                state.params, state.batch_stats, key_fwd, proxy, targets)
            new_state = state

        # Reposed mean vertices for PVE-T metrics (no grad path needed).
        reposed_mean = smpl_model(
            betas=jax.lax.stop_gradient(metric_data["shape_mean"]))["vertices"]
        metric_data["reposed_verts"] = reposed_mean

        if metrics_to_track is not None:
            metric_sums = make_metric_sums_fn(metrics_to_track, D)(
                metric_data, targets, reposed_mean, targets["reposed_verts"])
            return new_state, loss, metric_sums, terms
        return new_state, loss, metric_data, targets, terms

    if not jit:
        return step
    # Donate the state only on the gradient step (val returns it unchanged).
    return jax.jit(step, donate_argnums=(0,) if train else ())


def train_pose_mf_shape_gaussian_net(pose_shape_model,
                                     pose_shape_cfg,
                                     smpl_model,
                                     edge_detect_model,
                                     renderer,
                                     train_dataset,
                                     val_dataset,
                                     optimizer,
                                     metrics,
                                     model_save_dir,
                                     logs_save_path,
                                     initial_variables,
                                     save_val_metrics=("PVE-SC", "MPJPE-PA"),
                                     checkpoint=None,
                                     opt_state=None,
                                     rng_seed=0,
                                     num_epochs=None,
                                     mesh=None,
                                     loaders=None):
    """Full training loop (reference :27-405). Returns best variables.

    :param mesh: optional jax.sharding.Mesh ("data", "sample"). When given,
        the step is pjit-sharded: params/opt state replicated, batch over
        "data", distribution samples over "sample" (reference equivalent:
        none — it is single-GPU via CUDA_VISIBLE_DEVICES, run_train.py:132-135).
    :param loaders: optional {"train": iterable, "val": iterable} of dict
        batches (pose/texture/background) overriding the default Python
        DataLoader — e.g. data.native_loader.NativeTrainLoader over packed
        stores for C++-thread batch assembly.
    """
    from hierarchicalprobabilistic3dhuman_tpu.data.loader import DataLoader
    from hierarchicalprobabilistic3dhuman_tpu.parallel import (
        make_sharded_train_step, shard_batch, replicated_sharding)

    cfg = pose_shape_cfg
    save_val_metrics = list(save_val_metrics)
    num_epochs = num_epochs or cfg.TRAIN.NUM_EPOCHS

    if loaders is None:
        loaders = {
            "train": DataLoader(train_dataset, batch_size=cfg.TRAIN.BATCH_SIZE,
                                shuffle=True, drop_last=True,
                                num_workers=cfg.TRAIN.NUM_WORKERS, seed=rng_seed),
            "val": DataLoader(val_dataset, batch_size=cfg.TRAIN.BATCH_SIZE,
                              shuffle=True, drop_last=True,
                              num_workers=cfg.TRAIN.NUM_WORKERS, seed=rng_seed + 1),
        }

    params = initial_variables["params"]
    batch_stats = initial_variables.get("batch_stats", {})
    if opt_state is None:
        opt_state = optimizer.init(params)
    state = TrainState(params, batch_stats, opt_state)

    if checkpoint is not None:
        current_epoch, best_epoch, best_model_wts, best_epoch_val_metrics = \
            load_training_info_from_checkpoint(checkpoint, save_val_metrics)
        load_logs = True
    else:
        current_epoch = 0
        best_epoch = 0
        best_epoch_val_metrics = {m: np.inf for m in save_val_metrics}
        best_model_wts = jax.tree_util.tree_map(np.asarray,
                                                {"params": params,
                                                 "batch_stats": batch_stats})
        load_logs = False

    tracker = TrainingLossesAndMetricsTracker(
        metrics_to_track=list(metrics), img_wh=cfg.DATA.PROXY_REP_SIZE,
        log_save_path=logs_save_path, load_logs=load_logs,
        current_epoch=current_epoch)

    # Two compiled step variants per split (stage 1 / stage 2). Metric sums
    # (incl. Procrustes) are computed on device inside the step; the host
    # fetches scalars only.
    steps = {}
    for stage, stage_cfg in ((1, cfg.LOSS.STAGE1), (2, cfg.LOSS.STAGE2)):
        stage_metrics = list(metrics)
        if stage == 2 and "joints2Dsamples-L2E" not in stage_metrics:
            stage_metrics.append("joints2Dsamples-L2E")
        for split in ("train", "val"):
            if mesh is None:
                steps[(stage, split)] = make_train_step(
                    pose_shape_model, cfg, smpl_model, renderer,
                    edge_detect_model, stage_cfg, optimizer,
                    train=(split == "train"), metrics_to_track=stage_metrics)
            else:
                raw = make_train_step(
                    pose_shape_model, cfg, smpl_model, renderer,
                    edge_detect_model, stage_cfg, optimizer,
                    train=(split == "train"), jit=False, mesh=mesh,
                    metrics_to_track=stage_metrics)
                steps[(stage, split)] = make_sharded_train_step(raw, mesh)

    if mesh is not None:
        n_data = mesh.shape["data"]
        assert cfg.TRAIN.BATCH_SIZE % n_data == 0, (
            f"TRAIN.BATCH_SIZE={cfg.TRAIN.BATCH_SIZE} must divide the mesh "
            f"data axis ({n_data})")
        rep = replicated_sharding(mesh)
        state = TrainState(*(jax.device_put(s, rep) for s in state))

    key = jax.random.PRNGKey(rng_seed)
    current_loss_stage = 1
    for epoch in range(current_epoch, num_epochs):
        print(f"\nEpoch {epoch}/{num_epochs - 1}")
        print("-" * 10)
        tracker.initialise_loss_metric_sums()

        if epoch >= cfg.LOSS.STAGE_CHANGE_EPOCH and current_loss_stage == 1:
            current_loss_stage = 2
            if "joints2Dsamples-L2E" not in tracker.metrics_to_track:
                tracker.metrics_to_track.append("joints2Dsamples-L2E")
            print("Stage 2 loss config active. Tracking:", tracker.metrics_to_track)

        for split in ("train", "val"):
            step = steps[(current_loss_stage, split)]
            # Deferred metric fetch: resolving loss/sums to floats blocks on
            # device completion, so fetching immediately would serialise host
            # dispatch with device compute (measured ~2x step wall on the
            # tunnel-attached TPU). Keep one step in flight and account for
            # step N-1 after dispatching step N.
            pending = None

            def resolve(p):
                p_split, p_loss, p_sums, p_bs = p
                tracker.update_per_batch_sums(
                    split=p_split, loss=float(p_loss), batch_size=p_bs,
                    metric_sums={k: float(v) for k, v in p_sums.items()})

            for batch in loaders[split]:
                key, sub = jax.random.split(key)
                if mesh is None:
                    batch_arrays = (jnp.asarray(batch["pose"]),
                                    jnp.asarray(batch["background"]),
                                    jnp.asarray(batch["texture"]))
                else:
                    batch_arrays = shard_batch(mesh, batch["pose"],
                                               batch["background"],
                                               batch["texture"])
                state, loss, metric_sums, terms = step(state, sub, *batch_arrays)
                if pending is not None:
                    resolve(pending)
                pending = (split, loss, metric_sums, batch["pose"].shape[0])
            if pending is not None:
                resolve(pending)

        tracker.update_per_epoch()

        if tracker.determine_save_model_weights_this_epoch(save_val_metrics,
                                                           best_epoch_val_metrics):
            for metric in save_val_metrics:
                best_epoch_val_metrics[metric] = \
                    tracker.epochs_history["val_" + metric][-1]
            best_model_wts = jax.tree_util.tree_map(
                np.asarray, {"params": state.params,
                             "batch_stats": state.batch_stats})
            best_epoch = epoch
            print("Best model weights updated:", best_epoch_val_metrics)

        if epoch % cfg.TRAIN.EPOCHS_PER_SAVE == 0:
            save_training_checkpoint(
                checkpoint_path(model_save_dir, epoch),
                epoch=epoch, best_epoch=best_epoch,
                best_epoch_val_metrics=best_epoch_val_metrics,
                model_variables={"params": state.params,
                                 "batch_stats": state.batch_stats},
                best_model_variables=best_model_wts,
                opt_state=state.opt_state)
            print(f"Model saved! Best val metrics: {best_epoch_val_metrics} "
                  f"in epoch {best_epoch}")

    print("Training completed. Best val metrics:", best_epoch_val_metrics)
    return best_model_wts, state
