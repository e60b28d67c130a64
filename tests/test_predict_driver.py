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


@pytest.mark.slow
def test_batched_folder_predict_matches_per_image(tmp_path):
    """predict_folder_batched (B images/dispatch, padded final chunk,
    resolution groups, no_vis serving path) must reproduce the per-image
    driver's deterministic outputs (pose mode, shape mean, cam) exactly."""
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_pose_mf_shape_gaussian_net import (
        predict_folder_batched)

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
        B = x.shape[0]
        hm = jnp.zeros((B, 17, hm_h, hm_w))
        for j in range(17):
            hm = hm.at[:, j, 10 + 2 * j, 5 + 3 * j].set(0.9)
        return hm

    smpl = SMPL.synthetic()
    edge = CannyEdgeDetector(threshold=0.0)

    image_dir = tmp_path / "imgs"
    image_dir.mkdir()
    rng = np.random.RandomState(3)
    # two resolution groups; the 128 group has 3 images -> bs=2 pads chunk 2
    for i in range(3):
        cv2.imwrite(str(image_dir / f"a{i}.png"),
                    (rng.rand(128, 128, 3) * 255).astype(np.uint8))
    cv2.imwrite(str(image_dir / "b0.png"),
                (rng.rand(96, 96, 3) * 255).astype(np.uint8))

    batched = predict_folder_batched(
        pose_shape_model_apply=apply_fn, pose_shape_cfg=cfg, smpl_model=smpl,
        hrnet_apply=hrnet_stub, hrnet_cfg=hrnet_cfg, edge_detect_model=edge,
        image_dir=str(image_dir), save_dir=str(tmp_path / "out_batched"),
        batch_size=2, visualise_wh=WH, save_vis=False,
        num_uncertainty_samples=4)
    assert set(batched) == {"a0.png", "a1.png", "a2.png", "b0.png"}
    npz = np.load(tmp_path / "out_batched" / "outputs.npz")
    assert npz["pose_mode"].shape == (4, 23, 3, 3)
    assert list(npz["fnames"]) == sorted(batched)

    per_image = predict_pose_mf_shape_gaussian_net(
        pose_shape_model_apply=apply_fn, pose_shape_cfg=cfg, smpl_model=smpl,
        hrnet_apply=hrnet_stub, hrnet_cfg=hrnet_cfg, edge_detect_model=edge,
        image_dir=str(image_dir), save_dir=str(tmp_path / "out_single"),
        visualise_wh=WH, visualise_uncropped=False, visualise_samples=False,
        num_uncertainty_samples=4)

    for fname in per_image:
        for k in ("pose_mode", "shape_mean", "cam"):
            np.testing.assert_allclose(batched[fname][k], per_image[fname][k],
                                       atol=1e-5, err_msg=f"{fname}/{k}")
        # uncertainty uses different PRNG folding across drivers; just check
        # it is present, finite and positive somewhere
        u = batched[fname]["per_vertex_uncertainty"]
        assert u.shape == (6890,) and np.isfinite(u).all() and u.max() > 0


@pytest.mark.slow
def test_batched_folder_predict_with_vis(tmp_path):
    """save_vis path: figures + bucket-padded uncrops land on disk."""
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_pose_mf_shape_gaussian_net import (
        predict_folder_batched)

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
        return jnp.zeros((x.shape[0], 17, hm_h, hm_w)).at[:, :, 8, 6].set(0.9)

    image_dir = tmp_path / "imgs"
    image_dir.mkdir()
    rng = np.random.RandomState(4)
    for i in range(2):
        cv2.imwrite(str(image_dir / f"im{i}.png"),
                    (rng.rand(100, 90, 3) * 255).astype(np.uint8))

    save_dir = tmp_path / "out"
    predict_folder_batched(
        pose_shape_model_apply=apply_fn, pose_shape_cfg=cfg,
        smpl_model=SMPL.synthetic(),
        hrnet_apply=hrnet_stub, hrnet_cfg=hrnet_cfg,
        edge_detect_model=CannyEdgeDetector(threshold=0.0),
        image_dir=str(image_dir), save_dir=str(save_dir),
        batch_size=2, visualise_wh=WH, save_vis=True,
        visualise_uncropped=True, num_uncertainty_samples=4)
    for i in range(2):
        fig = cv2.imread(str(save_dir / f"im{i}.png"))
        assert fig is not None and fig.shape == (2 * WH, 4 * WH, 3)
        unc = cv2.imread(str(save_dir / f"im{i}_uncrop.png"))
        assert unc is not None and unc.shape == (100, 90, 3)


@pytest.mark.slow
def test_params_explicit_core_matches_closure():
    """make_predict_core(pose_shape_vars=...) — weights passed as jit
    ARGUMENTS (the CLI path; closures over device weights cost a trace-time
    download + weight-sized executables on tunnel TPUs) — must match the
    legacy closure form.

    Not bit-for-bit: weights-as-constants vs weights-as-arguments change
    XLA's folding/fusion choices, so outputs agree only to fp noise
    (measured <=5e-7 abs on CPU); atol=1e-5 leaves margin while staying far
    below any geometrically meaningful delta."""
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_pose_mf_shape_gaussian_net import (
        make_predict_core)

    D = 32
    cfg = get_pose_shape_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = D
    hrnet_cfg = get_pose2d_hrnet_cfg_defaults()
    model = PoseMFShapeGaussianNet(embed_dim=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18, D, D)))
    smpl = SMPL.synthetic()
    edge = CannyEdgeDetector(threshold=0.0)

    kwargs = dict(pose_shape_cfg=cfg, smpl_model=smpl, edge_detect_model=edge,
                  body_vis_renderer=None, hrnet_cfg=hrnet_cfg,
                  render_vis=False, num_uncertainty_samples=2)
    core_args = make_predict_core(model.apply, pose_shape_vars=variables,
                                  **kwargs)
    core_closure = make_predict_core(
        jax.jit(lambda x: model.apply(variables, x)), **kwargs)

    key = jax.random.PRNGKey(7)
    rng = np.random.RandomState(11)
    hr_cropped = jnp.asarray(rng.rand(2, 3, 384, 288), jnp.float32)
    j2d = jnp.asarray(rng.rand(2, 17, 2) * 200, jnp.float32)
    confs = jnp.ones((2, 17))
    out_a = core_args(key, hr_cropped, j2d, confs)
    out_c = core_closure(key, hr_cropped, j2d, confs)
    for k in ("verts_mode", "pose_rotmats_mode", "per_vertex_3Dvar", "cam"):
        np.testing.assert_allclose(np.asarray(out_a[k]),
                                   np.asarray(out_c[k]), rtol=0, atol=1e-5,
                                   err_msg=k)


@pytest.mark.slow
def test_params_explicit_eval_step_matches_closure():
    """_make_eval_step(pose_shape_vars=...) must match the closure form
    (to fp noise — see test_params_explicit_core_matches_closure)."""
    from hierarchicalprobabilistic3dhuman_tpu.evaluate.evaluate_pose_mf_shape_gaussian_net import (
        _make_eval_step)

    D = 32
    cfg = get_pose_shape_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = D
    model = PoseMFShapeGaussianNet(embed_dim=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18, D, D)))
    smpl = SMPL.synthetic()
    edge = CannyEdgeDetector(threshold=0.0)

    kwargs = dict(edge_detect_model=edge, pose_shape_cfg=cfg, num_samples=2,
                  compute_joints2d=False, compute_silhouettes=False,
                  compute_samples=False, silhouette_renderer=None,
                  static_gender=0)
    step_args = _make_eval_step(model.apply, smpl, smpl, smpl,
                                pose_shape_vars=variables, **kwargs)
    step_closure = _make_eval_step(lambda x: model.apply(variables, x),
                                   smpl, smpl, smpl, **kwargs)

    rng = np.random.RandomState(5)
    B = 2
    batch = (jnp.asarray(rng.rand(B, 1, D, D), jnp.float32),
             jnp.asarray(rng.rand(B, 17, D, D), jnp.float32),
             jnp.asarray(rng.randn(B, 72) * 0.2, jnp.float32),
             jnp.asarray(rng.randn(B, 10) * 0.5, jnp.float32),
             jnp.zeros((B,), jnp.int32),
             jnp.zeros((B, 17, 2), jnp.float32),
             jnp.zeros((B, D, D), jnp.float32))
    key = jax.random.PRNGKey(3)
    out_a = step_args(key, *batch)
    out_c = step_closure(key, *batch)
    for k in out_a:
        np.testing.assert_allclose(np.asarray(out_a[k]),
                                   np.asarray(out_c[k]), rtol=0, atol=1e-5,
                                   err_msg=k)


@pytest.mark.slow
def test_batched_folder_predict_predecoded_inputs(tmp_path):
    """.npy single-image files and .npz packs (uint8 HWC RGB, the serving
    fast path that skips PNG decode) must produce outputs identical to the
    same images fed as PNGs."""
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_pose_mf_shape_gaussian_net import (
        predict_folder_batched)
    from hierarchicalprobabilistic3dhuman_tpu.data.pack_predict_inputs import (
        pack_folder)

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
        return jnp.zeros((x.shape[0], 17, hm_h, hm_w)).at[:, :, 8, 6].set(0.9)

    rng = np.random.RandomState(8)
    imgs = {f"im{i}.png": (rng.rand(96, 96, 3) * 255).astype(np.uint8)
            for i in range(3)}

    png_dir, npy_dir = tmp_path / "png", tmp_path / "npy"
    png_dir.mkdir(), npy_dir.mkdir()
    for fname, rgb in imgs.items():
        cv2.imwrite(str(png_dir / fname), rgb[:, :, ::-1])  # BGR on disk
        np.save(str(npy_dir / (fname[:-4] + ".npy")), rgb)
    npz_dir = tmp_path / "npz"
    pack_folder(str(png_dir), str(npz_dir), shard_size=2)
    assert len(list(npz_dir.glob("*.npz"))) == 2

    common = dict(
        pose_shape_model_apply=apply_fn, pose_shape_cfg=cfg,
        smpl_model=SMPL.synthetic(), hrnet_apply=hrnet_stub,
        hrnet_cfg=hrnet_cfg, edge_detect_model=CannyEdgeDetector(threshold=0.0),
        batch_size=2, visualise_wh=WH, save_vis=False,
        num_uncertainty_samples=4)
    outs = {}
    for name, d in (("png", png_dir), ("npy", npy_dir), ("npz", npz_dir)):
        outs[name] = predict_folder_batched(
            image_dir=str(d), save_dir=str(tmp_path / f"out_{name}"), **common)

    for name in ("npy", "npz"):
        assert set(outs[name]) == set(outs["png"]), name
        for fname in outs["png"]:
            for k in ("pose_mode", "shape_mean", "cam"):
                np.testing.assert_array_equal(
                    np.asarray(outs[name][fname][k]),
                    np.asarray(outs["png"][fname][k]),
                    err_msg=f"{name}/{fname}/{k}")


def test_npy_png_stem_collision_refused(tmp_path):
    """foo.npy + foo.png in one folder would emit two entries with the same
    output fname (the npy is renamed to .png downstream) — the driver must
    refuse loudly instead of silently overwriting (advisor round-4)."""
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_pose_mf_shape_gaussian_net import (
        predict_folder_batched)
    d = tmp_path / "mix"
    d.mkdir()
    rgb = np.zeros((32, 32, 3), np.uint8)
    cv2.imwrite(str(d / "foo.png"), rgb)
    np.save(str(d / "foo.npy"), rgb)
    with pytest.raises(ValueError, match="collide"):
        predict_folder_batched(
            pose_shape_model_apply=None, pose_shape_cfg=get_pose_shape_cfg_defaults(),
            smpl_model=None, hrnet_apply=None,
            hrnet_cfg=get_pose2d_hrnet_cfg_defaults(), edge_detect_model=None,
            image_dir=str(d), save_dir=str(tmp_path / "out"))


def test_pack_folder_names_bad_file(tmp_path):
    """A corrupt image must fail the pack with the file named, and non-uint8
    /non-3-channel contract violations must be caught at pack time."""
    from hierarchicalprobabilistic3dhuman_tpu.data.pack_predict_inputs import (
        pack_folder)
    d = tmp_path / "in"
    d.mkdir()
    (d / "bad.png").write_bytes(b"not a png at all")
    with pytest.raises(ValueError, match="bad.png"):
        pack_folder(str(d), str(tmp_path / "out"))
