"""Synthetic-data generation + predict pipeline component tests (tiny shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hierarchicalprobabilistic3dhuman_tpu.configs import get_pose_shape_cfg_defaults
from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import CannyEdgeDetector
from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
from hierarchicalprobabilistic3dhuman_tpu.renderers import TexturedIUVRenderer

RNG = np.random.RandomState(55)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_pose_shape_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = 32
    cfg.TRAIN.BATCH_SIZE = 2
    edge = CannyEdgeDetector(threshold=0.0)
    smpl = SMPL.synthetic()
    renderer = TexturedIUVRenderer(img_wh=32, projection_type="perspective",
                                   render_rgb=True)
    return cfg, edge, smpl, renderer


def test_synth_data_fn(tiny_setup):
    from hierarchicalprobabilistic3dhuman_tpu.train.train_pose_mf_shape_gaussian_net import (
        make_synth_data_fn)
    cfg, edge, smpl, renderer = tiny_setup
    B, D = 2, 32
    synth = jax.jit(make_synth_data_fn(cfg, smpl, renderer, edge))
    key = jax.random.PRNGKey(0)
    pose = jnp.asarray((RNG.randn(B, 72) * 0.3).astype(np.float32))
    bg = jnp.asarray(RNG.rand(B, 3, D, D).astype(np.float32))
    tex = jnp.asarray(RNG.rand(B, 60, 40, 3).astype(np.float32))
    proxy, targets = synth(key, pose, bg, tex)

    assert proxy.shape == (B, 18, D, D)
    assert bool(jnp.all(jnp.isfinite(proxy)))
    assert targets["pose_params_rotmats"].shape == (B, 23, 3, 3)
    assert targets["verts"].shape == (B, 6890, 3)
    assert targets["joints3D"].shape == (B, 14, 3)
    assert targets["joints2D_vis"].dtype == bool

    # Target vertices must equal a direct SMPL pass with the flipped glob.
    from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import (
        batch_rodrigues, so3_exp)
    rotmats = batch_rodrigues(pose.reshape(B, 24, 3))
    Rx = so3_exp(jnp.asarray([[np.pi, 0.0, 0.0]]))[0]
    glob = rotmats[:, 0] @ Rx
    direct = smpl(body_pose=rotmats[:, 1:], global_orient=glob[:, None],
                  betas=targets["shape_params"], pose2rot=False)
    np.testing.assert_allclose(np.asarray(targets["verts"]),
                               np.asarray(direct["vertices"]), atol=1e-4)


@pytest.mark.slow
def test_synth_data_fn_uint8_inputs(tiny_setup):
    """uint8 background/texture inputs give the same result as float inputs
    (separate test: the dtype change forces a second full synth-graph
    compile, ~40 s on this host)."""
    from hierarchicalprobabilistic3dhuman_tpu.train.train_pose_mf_shape_gaussian_net import (
        make_synth_data_fn)
    cfg, edge, smpl, renderer = tiny_setup
    B, D = 2, 32
    synth = jax.jit(make_synth_data_fn(cfg, smpl, renderer, edge))
    key = jax.random.PRNGKey(0)
    pose = jnp.asarray((RNG.randn(B, 72) * 0.3).astype(np.float32))
    bg_u8 = (RNG.rand(B, 3, D, D) * 255).astype(np.uint8)
    tex_u8 = (RNG.rand(B, 60, 40, 3) * 255).astype(np.uint8)
    proxy2, _ = synth(key, pose, jnp.asarray(bg_u8), jnp.asarray(tex_u8))
    assert proxy2.shape == (B, 18, D, D)
    assert bool(jnp.all(jnp.isfinite(proxy2)))


def test_build_proxy_representation(tiny_setup):
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_pose_mf_shape_gaussian_net import (
        build_proxy_representation, ALWAYS_VISIBLE_JOINTS)
    cfg, edge, _, _ = tiny_setup
    B, D = 2, 32
    rgb = jnp.asarray(RNG.rand(B, 3, D, D).astype(np.float32))
    j2d = jnp.asarray(RNG.rand(B, 17, 2).astype(np.float32) * D)
    confs = jnp.asarray(np.zeros((B, 17), np.float32))  # all below threshold
    proxy = build_proxy_representation(rgb, j2d, confs, edge, cfg,
                                       joints2Dvisib_threshold=0.75)
    assert proxy.shape == (B, 18, D, D)
    hm = np.asarray(proxy[:, 1:])
    # always-visible joints keep their heatmaps even at zero confidence
    for j in ALWAYS_VISIBLE_JOINTS:
        assert hm[:, j].max() > 0.5
    # the rest are zeroed
    removed = [j for j in range(17) if j not in set(ALWAYS_VISIBLE_JOINTS.tolist())]
    assert hm[:, removed].max() == 0.0


def test_select_centremost_person_box():
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
        select_centremost_person_box)
    H = W = 200
    detections = {
        "boxes": np.array([[10, 10, 50, 80],      # off-centre person
                           [80, 60, 120, 140],    # centre person
                           [0, 0, 199, 199]], np.float32),
        "labels": np.array([1, 1, 17]),           # third is not a person
        "scores": np.array([0.99, 0.95, 0.99], np.float32),
    }
    centre, h, w = select_centremost_person_box(detections, (H, W), threshold=0.9)
    np.testing.assert_allclose(centre, [100.0, 100.0])  # (vert, hor) of box 2
    assert h == 80.0 and w == 40.0

    # no detections above threshold -> whole image
    detections["scores"][:] = 0.1
    centre, h, w = select_centremost_person_box(detections, (H, W), threshold=0.9)
    np.testing.assert_allclose(centre, [100.0, 100.0])
    assert h == 200.0 and w == 200.0

    centre, h, w = select_centremost_person_box(None, (120, 80))
    assert h == 120.0 and w == 80.0


def test_make_hrnet_predictor_jitted_stage():
    """The factory's jitted device stage: whole-image fallback box, aspect
    fix, 384x288 crop, argmax keypoints rescaled x4 — and the predictor is
    reusable across images without retracing (one compiled stage)."""
    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose2d_hrnet_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
        make_hrnet_predictor)

    cfg = get_pose2d_hrnet_cfg_defaults()
    hm_w, hm_h = cfg.MODEL.HEATMAP_SIZE

    calls = []

    def hrnet_stub(x):
        calls.append(x.shape)
        hm = jnp.zeros((x.shape[0], 17, hm_h, hm_w))
        return hm.at[:, :, 12, 9].set(0.8)

    predictor = make_hrnet_predictor(hrnet_stub, cfg)
    rng = np.random.RandomState(5)
    for _ in range(2):
        image = jnp.asarray(rng.rand(3, 100, 80).astype(np.float32))
        out = predictor(image)
        assert out["cropped_image"].shape == (3, 384, 288)
        # heatmap (9, 12) -> input coords x4
        np.testing.assert_allclose(np.asarray(out["joints2D"]),
                                   np.tile([36.0, 48.0], (17, 1)))
        np.testing.assert_allclose(np.asarray(out["joints2Dconfs"]), 0.8,
                                   rtol=1e-6)
        # whole-image fallback box, aspect-fixed to 384:288
        assert isinstance(out["bbox_height"], float)
        np.testing.assert_allclose(out["bbox_centre"], [50.0, 40.0])
        np.testing.assert_allclose(out["bbox_height"] / out["bbox_width"],
                                   384.0 / 288.0, rtol=1e-6)
    # The stub runs at TRACE time only: one trace for both images proves the
    # compiled device stage is reused across the per-image loop.
    assert calls == [(1, 3, 384, 288)]


def test_kp_locations_from_heatmaps():
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
        get_kp_locations_confs_from_heatmaps)
    hm = np.zeros((1, 3, 24, 18), np.float32)
    hm[0, 0, 5, 7] = 0.9
    hm[0, 1, 20, 2] = 0.4
    # channel 2 all zeros -> conf 0 -> kp zeroed
    kps, confs = get_kp_locations_confs_from_heatmaps(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(kps[0, 0]), [7, 5])
    np.testing.assert_allclose(np.asarray(kps[0, 1]), [2, 20])
    np.testing.assert_allclose(np.asarray(kps[0, 2]), [0, 0])
    np.testing.assert_allclose(np.asarray(confs[0]), [0.9, 0.4, 0.0], atol=1e-6)
