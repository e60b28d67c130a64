"""End-to-end eval driver tests: gender-sorted single-gender batching must
reproduce the mixed-batch (3x target-SMPL) path exactly, including per-frame
artifact order (reference evaluate_...py runs bs=1 serially and never faces
mixed batches)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hierarchicalprobabilistic3dhuman_tpu.configs import get_pose_shape_cfg_defaults
from hierarchicalprobabilistic3dhuman_tpu.evaluate.evaluate_pose_mf_shape_gaussian_net import (
    evaluate_pose_mf_shape_gaussian_net)
from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import (
    CannyEdgeDetector)
from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
    PoseMFShapeGaussianNet)
from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL

RNG = np.random.RandomState(3)
D = 32
METRICS = ["PVE", "PVE-SC", "MPJPE"]


class _TinyEvalDataset:
    """6 frames, deliberately gender-interleaved so every bs=2 batch is mixed
    unless the driver sorts."""

    def __init__(self):
        rng = np.random.RandomState(7)  # own stream: both runs see identical data
        self.n = 6
        self.gender = np.array(["m", "f", "n", "f", "m", "n"])
        self.images = rng.rand(self.n, 3, D, D).astype(np.float32)
        self.heatmaps = rng.rand(self.n, 17, D, D).astype(np.float32)
        self.poses = (rng.randn(self.n, 72) * 0.2).astype(np.float32)
        self.shapes = rng.randn(self.n, 10).astype(np.float32)
        self.keypoints = (rng.rand(self.n, 17, 2) * D).astype(np.float32)
        self.silhouettes = (rng.rand(self.n, D, D) > 0.6).astype(np.float32)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": self.images[i], "heatmaps": self.heatmaps[i],
                "pose": self.poses[i], "shape": self.shapes[i],
                "keypoints": self.keypoints[i],
                "silhouette": self.silhouettes[i],
                "fname": f"frame_{i:03d}.png", "gender": str(self.gender[i])}


@pytest.fixture(scope="module")
def eval_setup():
    cfg = get_pose_shape_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = D
    model = PoseMFShapeGaussianNet(embed_dim=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18, D, D)))
    apply_fn = lambda proxy: model.apply(variables, proxy)
    # Three DISTINCT gendered bodies so a wrong gender selection changes PVE.
    smpls = {g: SMPL.synthetic(seed=s) for g, s in
             (("n", 0), ("m", 1), ("f", 2))}
    edge = CannyEdgeDetector(threshold=0.0)
    return cfg, apply_fn, smpls, edge


def _run(eval_setup, tmpdir, sort_by_gender, metrics=METRICS, **kwargs):
    cfg, apply_fn, smpls, edge = eval_setup
    return evaluate_pose_mf_shape_gaussian_net(
        pose_shape_apply=apply_fn, pose_shape_cfg=cfg,
        smpl_neutral=smpls["n"], smpl_male=smpls["m"], smpl_female=smpls["f"],
        edge_detect_model=edge, metrics=metrics,
        eval_dataset=_TinyEvalDataset(), batch_size=2, num_workers=0,
        save_path=str(tmpdir), save_per_frame_metrics=True,
        sort_by_gender=sort_by_gender, **kwargs)


@pytest.mark.slow
def test_gender_sorted_eval_matches_mixed_path(eval_setup, tmp_path):
    d_mixed = tmp_path / "mixed"
    d_sorted = tmp_path / "sorted"
    d_mixed.mkdir(), d_sorted.mkdir()
    m_mixed = _run(eval_setup, d_mixed, sort_by_gender=False)
    m_sorted = _run(eval_setup, d_sorted, sort_by_gender=True)

    for k in METRICS:
        np.testing.assert_allclose(m_sorted[k], m_mixed[k], rtol=1e-5,
                                   err_msg=k)
    # Per-frame artifacts restored to dataset order.
    for name in ["fname_per_frame", "pose_per_frame", "shape_per_frame",
                 "cam_per_frame"] + [f"{m}_per_frame" for m in METRICS]:
        a = np.load(d_mixed / f"{name}.npy")
        b = np.load(d_sorted / f"{name}.npy")
        if a.dtype.kind in "UO":
            assert list(a) == list(b), name
        else:
            np.testing.assert_allclose(b, a, rtol=1e-5, err_msg=name)
    fnames = np.load(d_sorted / "fname_per_frame.npy")
    assert list(fnames) == [f"frame_{i:03d}.png" for i in range(6)]


METRICS_FULL = ["PVE", "PVE-PA", "MPJPE-SC", "joints2D-L2E", "silhouette-IOU",
                "PVE_samples_min", "joints2Dsamples-L2E",
                "silhouettesamples-IOU"]


@pytest.mark.slow
def test_on_device_metrics_match_host_tracker(eval_setup, tmp_path):
    """The on-device per-frame metric path (Procrustes/scale alignment,
    sample minima, IOU counts inside the jitted step; host fetches a few KB)
    reproduces the host-numpy tracker across every metric family."""
    d_dev = tmp_path / "dev"
    d_host = tmp_path / "host"
    d_dev.mkdir(), d_host.mkdir()
    m_dev = _run(eval_setup, d_dev, sort_by_gender=False,
                 metrics=METRICS_FULL, on_device_metrics=True,
                 num_samples_for_metrics=2)
    m_host = _run(eval_setup, d_host, sort_by_gender=False,
                  metrics=METRICS_FULL, on_device_metrics=False,
                  num_samples_for_metrics=2)

    for k in METRICS_FULL:
        np.testing.assert_allclose(m_dev[k], m_host[k], rtol=2e-4, err_msg=k)
    for m in METRICS_FULL:
        if "samples" in m:
            continue  # tracker only dumps non-sample per-frame arrays
        a = np.load(d_host / f"{m}_per_frame.npy")
        b = np.load(d_dev / f"{m}_per_frame.npy")
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6, err_msg=m)
