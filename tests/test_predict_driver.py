"""Predict driver end-to-end (fused jitted per-image programs) + jet colormap
parity. The driver is exercised with a stub HRNet and tiny resolutions so the
whole flow — crop, proxy, predictor, SMPL, uncertainty sampling, 6-view
render, figure/uncrop/samples outputs — runs in seconds on the CPU mesh."""

import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from hierarchicalprobabilistic3dhuman_tpu.configs import (
    get_pose_shape_cfg_defaults, get_pose2d_hrnet_cfg_defaults)
from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import (
    CannyEdgeDetector)
from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
    PoseMFShapeGaussianNet)
from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
from hierarchicalprobabilistic3dhuman_tpu.predict.predict_pose_mf_shape_gaussian_net import (
    predict_pose_mf_shape_gaussian_net, jet_colormap, _jet_colormap)

RNG = np.random.RandomState(11)


def test_jet_colormap_matches_matplotlib():
    values = np.linspace(-0.05, 0.3, 257).astype(np.float32)
    ours = np.asarray(jet_colormap(jnp.asarray(values)))
    ref = _jet_colormap(values)
    # matplotlib quantises the INPUT through a 256-entry LUT; the continuous
    # interpolation differs by at most (steepest segment slope ~4.5)/255.
    assert np.abs(ours - ref).max() < 5.0 / 255


@pytest.mark.slow
def test_predict_driver_end_to_end(tmp_path):
    D = 32
    WH = 64
    cfg = get_pose_shape_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = D
    hrnet_cfg = get_pose2d_hrnet_cfg_defaults()

    model = PoseMFShapeGaussianNet(embed_dim=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18, D, D)))
    apply_fn = jax.jit(lambda x: model.apply(variables, x))

    hm_w, hm_h = hrnet_cfg.MODEL.HEATMAP_SIZE

    def hrnet_stub(x):
        # Deterministic fake heatmaps: one bright pixel per joint.
        B = x.shape[0]
        hm = jnp.zeros((B, 17, hm_h, hm_w))
        for j in range(17):
            hm = hm.at[:, j, 10 + 2 * j, 5 + 3 * j].set(0.9)
        return hm

    smpl = SMPL.synthetic()
    edge = CannyEdgeDetector(threshold=0.0)

    image_dir = tmp_path / "imgs"
    save_dir = tmp_path / "out"
    image_dir.mkdir()
    for i in range(2):
        cv2.imwrite(str(image_dir / f"im{i}.png"),
                    (RNG.rand(128, 128, 3) * 255).astype(np.uint8))

    results = predict_pose_mf_shape_gaussian_net(
        pose_shape_model_apply=apply_fn, pose_shape_cfg=cfg, smpl_model=smpl,
        hrnet_apply=hrnet_stub, hrnet_cfg=hrnet_cfg, edge_detect_model=edge,
        image_dir=str(image_dir), save_dir=str(save_dir),
        visualise_wh=WH, visualise_uncropped=True, visualise_samples=True,
        num_uncertainty_samples=4)

    assert set(results) == {"im0.png", "im1.png"}
    for fname, res in results.items():
        assert res["pose_mode"].shape == (23, 3, 3)
        assert res["shape_mean"].shape == (10,)
        assert res["cam"].shape == (3,)
        assert res["per_vertex_uncertainty"].shape == (6890,)
        assert np.isfinite(res["per_vertex_uncertainty"]).all()

    # All three figure artifacts per image, with the reference's layouts.
    grid = cv2.imread(str(save_dir / "im0.png"))
    assert grid.shape == (2 * WH, 4 * WH, 3)
    uncrop = cv2.imread(str(save_dir / "im0_uncrop.png"))
    assert uncrop.shape == (128, 128, 3)
    samples = cv2.imread(str(save_dir / "im0_samples.png"))
    assert samples.shape == (3 * WH, 6 * WH, 3)
