"""On-device per-batch training metric sums.

The reference pulls full prediction/target meshes (72 x 6890 x 3 and friends)
to host numpy EVERY batch and runs Procrustes on CPU (reference train driver
:351-370 + metrics/train_loss_and_metrics_tracker.py:74-196). Here the same
sums are computed inside the jitted train step — Procrustes/scale alignment
run on the MXU via the batched Jacobi SVD — and the host fetches a dict of
SCALARS per batch instead of ~40 MB of tensors.

The sums feed TrainingLossesAndMetricsTracker.update_per_batch_sums, which
normalises them per epoch exactly like the reference tracker.
"""

import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.utils.eval_utils import (
    procrustes_analysis_batch, scale_and_translation_transform_batch)
from hierarchicalprobabilistic3dhuman_tpu.utils.joints2d_utils import (
    undo_keypoint_normalisation)


def make_metric_sums_fn(metrics_to_track, img_wh):
    """Build a jit-safe fn: (pred, target, pred_reposed, target_reposed) ->
    dict of scalar sums (one entry per tracked metric, plus the visible-
    sample count for joints2Dsamples-L2E).

    pred/target key conventions match the train step's metric_data/targets.
    """
    track = list(metrics_to_track)

    def f(pred, target, pred_reposed_vertices, target_reposed_vertices):
        sums = {}

        def l2sum(a, b):
            return jnp.sum(jnp.linalg.norm(a - b, axis=-1))

        if "PVE" in track:
            sums["PVE"] = l2sum(pred["verts"], target["verts"])
        if "PVE-SC" in track:
            p_sc = scale_and_translation_transform_batch(pred["verts"],
                                                         target["verts"])
            sums["PVE-SC"] = l2sum(p_sc, target["verts"])
        if "PVE-PA" in track:
            p_pa = procrustes_analysis_batch(pred["verts"], target["verts"])
            sums["PVE-PA"] = l2sum(p_pa, target["verts"])
        if "PVE-T" in track:
            sums["PVE-T"] = l2sum(pred_reposed_vertices,
                                  target_reposed_vertices)
        if "PVE-T-SC" in track:
            p_sc = scale_and_translation_transform_batch(
                pred_reposed_vertices, target_reposed_vertices)
            sums["PVE-T-SC"] = l2sum(p_sc, target_reposed_vertices)
        if "MPJPE" in track:
            sums["MPJPE"] = l2sum(pred["joints3D"], target["joints3D"])
        if "MPJPE-SC" in track:
            p_sc = scale_and_translation_transform_batch(pred["joints3D"],
                                                         target["joints3D"])
            sums["MPJPE-SC"] = l2sum(p_sc, target["joints3D"])
        if "MPJPE-PA" in track:
            p_pa = procrustes_analysis_batch(pred["joints3D"],
                                             target["joints3D"])
            sums["MPJPE-PA"] = l2sum(p_pa, target["joints3D"])
        if "joints2D-L2E" in track:
            p2d = undo_keypoint_normalisation(pred["joints2D"], img_wh)
            sums["joints2D-L2E"] = l2sum(p2d, target["joints2D"])
        if "joints2Dsamples-L2E" in track and "joints2Dsamples" in pred:
            p = undo_keypoint_normalisation(pred["joints2Dsamples"], img_wh)
            n_samples = p.shape[1]
            t = target["joints2D"][:, None]
            vis = target["joints2D_vis"][:, None, :]                 # (B,1,17)
            err = jnp.linalg.norm(p - t, axis=-1) * vis              # (B,N,17)
            sums["joints2Dsamples-L2E"] = jnp.sum(err)
            sums["num_visib_joints2Dsamples"] = (
                jnp.sum(vis) * n_samples).astype(jnp.float32)
        return sums

    return f
