"""eval_utils: batched Jacobi Procrustes vs the reference's numpy/LAPACK
implementation, and on-device metric sums vs the host-numpy tracker path."""

import sys

import numpy as np
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.utils.eval_utils import (
    procrustes_analysis_batch, scale_and_translation_transform_batch)

RNG = np.random.RandomState(3)


def _reference_eval_utils():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib
    return importlib.import_module("utils.eval_utils")


def test_procrustes_matches_reference():
    """Batched Jacobi-SVD Procrustes == reference numpy LAPACK Procrustes
    (rotation is invariant to SVD column-sign choices)."""
    ref = _reference_eval_utils()
    S1 = RNG.randn(6, 14, 3).astype(np.float32)
    # targets: rotated+scaled+translated copies plus noise
    S2 = np.empty_like(S1)
    for i in range(6):
        A = RNG.randn(3, 3)
        U, _, Vt = np.linalg.svd(A)
        R = U @ Vt
        if np.linalg.det(R) < 0:
            R[:, 2] *= -1
        S2[i] = 1.7 * S1[i] @ R.T + RNG.randn(3) + 0.05 * RNG.randn(14, 3)

    ours = np.asarray(procrustes_analysis_batch(jnp.asarray(S1), jnp.asarray(S2)))
    theirs = ref.procrustes_analysis_batch(S1.astype(np.float64),
                                           S2.astype(np.float64))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_procrustes_recovers_similarity_transform():
    """Aligning a transformed copy back to the original is (near-)exact."""
    S2 = RNG.randn(4, 100, 3).astype(np.float32)
    R = np.linalg.qr(RNG.randn(3, 3))[0]
    if np.linalg.det(R) < 0:
        R[:, 2] *= -1
    S1 = 0.5 * S2 @ R.T + np.float32([1.0, -2.0, 0.3])
    aligned = np.asarray(procrustes_analysis_batch(jnp.asarray(S1),
                                                   jnp.asarray(S2)))
    np.testing.assert_allclose(aligned, S2, atol=1e-3)


def test_scale_translation_matches_reference():
    ref = _reference_eval_utils()
    P = RNG.randn(5, 30, 3).astype(np.float32)
    T = (1.3 * P + 0.2 * RNG.randn(5, 30, 3)).astype(np.float32)
    ours = np.asarray(scale_and_translation_transform_batch(
        jnp.asarray(P), jnp.asarray(T)))
    theirs = ref.scale_and_translation_transform_batch(
        P.astype(np.float64), T.astype(np.float64))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_on_device_metric_sums_match_host_tracker():
    """metric_sums (computed in-step on device) == the host-numpy tracker's
    per-batch accumulation for every tracked metric."""
    from hierarchicalprobabilistic3dhuman_tpu.metrics.metric_sums import (
        make_metric_sums_fn)
    from hierarchicalprobabilistic3dhuman_tpu.metrics import (
        TrainingLossesAndMetricsTracker)

    B, V, J, K, N = 3, 6890, 14, 17, 4
    img_wh = 64
    metrics = ["PVE", "PVE-SC", "PVE-PA", "PVE-T", "PVE-T-SC", "MPJPE",
               "MPJPE-SC", "MPJPE-PA", "joints2D-L2E", "joints2Dsamples-L2E"]
    pred = {
        "verts": RNG.randn(B, V, 3).astype(np.float32),
        "joints3D": RNG.randn(B, J, 3).astype(np.float32),
        "joints2D": RNG.uniform(-1, 1, (B, K, 2)).astype(np.float32),
        "joints2Dsamples": RNG.uniform(-1, 1, (B, N, K, 2)).astype(np.float32),
    }
    target = {
        "verts": (pred["verts"] + 0.1 * RNG.randn(B, V, 3)).astype(np.float32),
        "joints3D": (pred["joints3D"] + 0.1 * RNG.randn(B, J, 3)).astype(np.float32),
        "joints2D": RNG.uniform(0, img_wh, (B, K, 2)).astype(np.float32),
        "joints2D_vis": RNG.rand(B, K) > 0.3,
    }
    pred_reposed = RNG.randn(B, V, 3).astype(np.float32)
    target_reposed = (pred_reposed + 0.05 * RNG.randn(B, V, 3)).astype(np.float32)

    sums = make_metric_sums_fn(metrics, img_wh)(
        {k: jnp.asarray(v) for k, v in pred.items()},
        {k: jnp.asarray(v) for k, v in target.items()},
        jnp.asarray(pred_reposed), jnp.asarray(target_reposed))
    sums = {k: float(v) for k, v in sums.items()}

    tracker = TrainingLossesAndMetricsTracker(metrics, img_wh=img_wh,
                                              log_save_path=None)
    tracker.initialise_loss_metric_sums()
    tracker.update_per_batch("train", 0.0, pred, target, B,
                             pred_reposed_vertices=pred_reposed,
                             target_reposed_vertices=target_reposed)

    for m in metrics:
        host = tracker.loss_metric_sums["train_" + m]
        rel = abs(sums[m] - host) / max(abs(host), 1e-6)
        assert rel < 2e-3, (m, sums[m], host)
    assert sums["num_visib_joints2Dsamples"] == \
        tracker.loss_metric_sums["train_num_visib_joints2Dsamples"]

    # Epoch normalisation via the new scalar path == the old tensor path.
    tracker2 = TrainingLossesAndMetricsTracker(metrics, img_wh=img_wh,
                                               log_save_path=None)
    tracker2.initialise_loss_metric_sums()
    tracker2.update_per_batch_sums("train", 0.0, B, sums)
    for m in metrics:
        a = tracker.loss_metric_sums["train_" + m]
        b = tracker2.loss_metric_sums["train_" + m]
        assert abs(a - b) / max(abs(a), 1e-6) < 2e-3, (m, a, b)
