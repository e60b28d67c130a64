"""On-device per-batch metric computation (training sums + eval per-frame).

The reference pulls full prediction/target meshes (72 x 6890 x 3 and friends)
to host numpy EVERY batch and runs Procrustes on CPU (reference train driver
:351-370 + metrics/train_loss_and_metrics_tracker.py:74-196; eval driver
:230-234 + metrics/eval_metrics_tracker.py:89-328). Here the same quantities
are computed inside the jitted step — Procrustes/scale alignment run on the
MXU via the batched Jacobi SVD — and the host fetches per-batch SCALARS
(training) or per-frame VALUES (eval, needed for the `<metric>_per_frame.npy`
artifacts) instead of tens of MB of tensors. On a tunnel-attached TPU the
fetch saving alone is the difference between bandwidth-bound and compute-bound
evaluation (verts_samples for one 3DPW batch at N=10 is ~8 MB/frame).

Training sums feed TrainingLossesAndMetricsTracker.update_per_batch_sums;
eval per-frame values feed EvalMetricsTracker.update_per_batch_device.
"""

import jax
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.utils.eval_utils import (
    procrustes_analysis_batch, scale_and_translation_transform_batch)
from hierarchicalprobabilistic3dhuman_tpu.utils.joints2d_utils import (
    undo_keypoint_normalisation)

# metric family -> (pred key, target key, alignment) — mirrors
# eval_metrics_tracker._POINT_METRICS.
_EVAL_POINT_METRICS = {
    "PVE": ("verts", "verts", None),
    "PVE-SC": ("verts", "verts", "sc"),
    "PVE-PA": ("verts", "verts", "pa"),
    "PVE-T": ("reposed_verts", "reposed_verts", None),
    "PVE-T-SC": ("reposed_verts", "reposed_verts", "sc"),
    "MPJPE": ("joints3D", "joints3D", None),
    "MPJPE-SC": ("joints3D", "joints3D", "sc"),
    "MPJPE-PA": ("joints3D", "joints3D", "pa"),
}
_EVAL_SAMPLES_KEY = {
    "PVE": "verts_samples", "PVE-SC": "verts_samples",
    "PVE-PA": "verts_samples", "PVE-T": "reposed_verts_samples",
    "PVE-T-SC": "reposed_verts_samples", "MPJPE": "joints3D_samples",
    "MPJPE-SC": "joints3D_samples", "MPJPE-PA": "joints3D_samples",
}


def _align(pred, target, mode):
    if mode == "sc":
        return scale_and_translation_transform_batch(pred, target)
    if mode == "pa":
        return procrustes_analysis_batch(pred, target)
    return pred


def make_eval_frame_metrics_fn(metrics_to_track):
    """Build a jit-safe fn (pred_dict, target_dict) -> per-frame metrics.

    Returns, per tracked metric, the (B,) per-frame mean point error (what the
    eval tracker both accumulates — x num points — and dumps per frame), plus
    per-frame confusion counts for the IOU metrics and scalar sums for
    joints2Dsamples-L2E — numerically the same quantities as
    EvalMetricsTracker.update_per_batch computes from fetched tensors.
    Dict key conventions match the eval driver's pred/target dicts.
    """
    track = list(metrics_to_track)

    def f(pred, target):
        # Alignment (Procrustes cross-covariance einsums + Jacobi SVD) must
        # not run under the TPU default bf16 matmul passes: the reported
        # PVE-PA / *-SC numbers are benchmark artifacts and the FLOPs here
        # are negligible next to SMPL/render work. CPU tests run f32 either
        # way, so only this guard keeps TPU numerically identical to the
        # host-numpy tracker path.
        with jax.default_matmul_precision("highest"):
            return _eval_frame_metrics(pred, target, track)

    return f


def _eval_frame_metrics(pred, target, track):
        out = {}

        for m in track:
            if m in _EVAL_POINT_METRICS:
                pk, tk, mode = _EVAL_POINT_METRICS[m]
                aligned = _align(pred[pk], target[tk], mode)
                err = jnp.linalg.norm(aligned - target[tk], axis=-1)  # (B, P)
                out[m] = jnp.mean(err, axis=-1)

            elif m.endswith("_samples_min"):
                base = m[:-len("_samples_min")]
                pk, tk, mode = _EVAL_POINT_METRICS[base]
                samples = pred[_EVAL_SAMPLES_KEY[base]]       # (B, N, P, 3)
                B, N = samples.shape[:2]
                flat = samples.reshape(B * N, *samples.shape[2:])
                tiled = jnp.repeat(target[tk][:, None], N, axis=1) \
                    .reshape(B * N, *target[tk].shape[1:])
                aligned = _align(flat, tiled, mode)
                err = jnp.linalg.norm(aligned - tiled, axis=-1) \
                    .reshape(B, N, -1)                         # (B, N, P)
                best = jnp.argmin(err.mean(axis=-1), axis=1)
                out[m] = err.mean(axis=-1)[jnp.arange(B), best]

            elif m == "joints2D-L2E":
                err = jnp.linalg.norm(pred["joints2D"] - target["joints2D"],
                                      axis=-1)                 # (B, 17)
                out[m] = jnp.mean(err, axis=-1)

            elif m == "joints2Dsamples-L2E":
                p = pred["joints2Dsamples"]                    # (B, N, 17, 2)
                err = jnp.linalg.norm(p - target["joints2D"][:, None], axis=-1)
                if "joints2D_vis" in target:
                    vis = target["joints2D_vis"][:, None, :]
                    err = err * vis
                    out["num_vis_joints2Dsamples"] = (
                        jnp.sum(vis) * p.shape[1]).astype(jnp.float32)
                else:
                    out["num_vis_joints2Dsamples"] = jnp.float32(err.size)
                out[m] = jnp.sum(err)

            elif m == "silhouette-IOU":
                ps = pred["silhouettes"] > 0.5
                ts = target["silhouettes"] > 0.5
                tp = jnp.sum(ps & ts, axis=(1, 2)).astype(jnp.float32)
                fp = jnp.sum(ps & ~ts, axis=(1, 2)).astype(jnp.float32)
                tn = jnp.sum(~ps & ~ts, axis=(1, 2)).astype(jnp.float32)
                fn = jnp.sum(~ps & ts, axis=(1, 2)).astype(jnp.float32)
                out["silhouette-IOU"] = tp / (tp + fp + fn)
                out["num_true_positives"] = tp
                out["num_false_positives"] = fp
                out["num_true_negatives"] = tn
                out["num_false_negatives"] = fn

            elif m == "silhouettesamples-IOU":
                ps = pred["silhouettessamples"] > 0.5          # (B, N, wh, wh)
                ts = target["silhouettes"][:, None] > 0.5
                out["num_samples_true_positives"] = \
                    jnp.sum(ps & ts).astype(jnp.float32)
                out["num_samples_false_positives"] = \
                    jnp.sum(ps & ~ts).astype(jnp.float32)
                out["num_samples_true_negatives"] = \
                    jnp.sum(~ps & ~ts).astype(jnp.float32)
                out["num_samples_false_negatives"] = \
                    jnp.sum(~ps & ts).astype(jnp.float32)
        return out


def make_metric_sums_fn(metrics_to_track, img_wh):
    """Build a jit-safe fn: (pred, target, pred_reposed, target_reposed) ->
    dict of scalar sums (one entry per tracked metric, plus the visible-
    sample count for joints2Dsamples-L2E).

    pred/target key conventions match the train step's metric_data/targets.
    """
    track = list(metrics_to_track)

    def f(pred, target, pred_reposed_vertices, target_reposed_vertices):
        # Same matmul-precision guard as make_eval_frame_metrics_fn: the
        # SC/PA alignment math must not run in bf16 passes on TPU.
        with jax.default_matmul_precision("highest"):
            return _metric_sums(pred, target, pred_reposed_vertices,
                                target_reposed_vertices, track, img_wh)

    return f


def _metric_sums(pred, target, pred_reposed_vertices,
                 target_reposed_vertices, track, img_wh):
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
