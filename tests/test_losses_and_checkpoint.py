"""Combined loss, sampling utilities and checkpoint round-trip tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hierarchicalprobabilistic3dhuman_tpu.configs import get_pose_shape_cfg_defaults
from hierarchicalprobabilistic3dhuman_tpu.losses import PoseMFShapeGaussianLoss, gaussian_nll
from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import svd3x3, proper_svd3x3

RNG = np.random.RandomState(123)
CFG = get_pose_shape_cfg_defaults()


def test_gaussian_nll_matches_torch():
    import torch
    mean = RNG.randn(4, 10).astype(np.float32)
    log_std = (RNG.randn(4, 10) * 0.3).astype(np.float32)
    target = RNG.randn(4, 10).astype(np.float32)
    ours = np.asarray(gaussian_nll(jnp.asarray(mean), jnp.asarray(log_std),
                                   jnp.asarray(target)))
    theirs = -torch.distributions.Normal(
        loc=torch.from_numpy(mean),
        scale=torch.exp(torch.from_numpy(log_std))).log_prob(
        torch.from_numpy(target)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _make_loss_dicts(B=3, S=2):
    from scipy.spatial.transform import Rotation as SR
    F = jnp.asarray((np.eye(3) * 2 + 0.3 * RNG.randn(B, 23, 3, 3)).astype(np.float32))
    U, Ssv, V = svd3x3(F)
    pred = {
        "pose_params_F": F, "pose_params_U": U, "pose_params_S": Ssv,
        "pose_params_V": V,
        "shape_mean": jnp.asarray(RNG.randn(B, 10).astype(np.float32)),
        "shape_log_std": jnp.asarray((RNG.randn(B, 10) * 0.1).astype(np.float32)),
        "verts": jnp.asarray(RNG.randn(B, 100, 3).astype(np.float32)),
        "joints3D": jnp.asarray(RNG.randn(B, 14, 3).astype(np.float32)),
        "joints2D": jnp.asarray(RNG.rand(B, S, 17, 2).astype(np.float32) * 2 - 1),
        "glob_rotmats": jnp.asarray(SR.random(B, random_state=RNG).as_matrix()
                                    .astype(np.float32)),
    }
    target = {
        "pose_params_rotmats": jnp.asarray(
            SR.random(B * 23, random_state=RNG).as_matrix()
            .reshape(B, 23, 3, 3).astype(np.float32)),
        "shape_params": jnp.asarray(RNG.randn(B, 10).astype(np.float32)),
        "verts": jnp.asarray(RNG.randn(B, 100, 3).astype(np.float32)),
        "joints3D": jnp.asarray(RNG.randn(B, 14, 3).astype(np.float32)),
        "joints2D": jnp.asarray(RNG.rand(B, 17, 2).astype(np.float32) * 256),
        "joints2D_vis": jnp.asarray(RNG.rand(B, 17) > 0.3),
        "glob_rotmats": jnp.asarray(SR.random(B, random_state=RNG).as_matrix()
                                    .astype(np.float32)),
    }
    return pred, target


def test_combined_loss_stage_weights():
    pred, target = _make_loss_dicts()
    l1, t1 = PoseMFShapeGaussianLoss(CFG.LOSS.STAGE1, 256)(target, pred)
    l2, t2 = PoseMFShapeGaussianLoss(CFG.LOSS.STAGE2, 256)(target, pred)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    # stage1 zero-weights verts/joints3D, so they must not contribute
    recon1 = (t1["pose_nll"] * 80.0 + t1["shape_nll"] * 50.0
              + t1["joints2D"] * 5000.0 + t1["glob_rotmats"] * 5000.0)
    np.testing.assert_allclose(float(l1), float(recon1), rtol=1e-5)


def test_combined_loss_is_differentiable_and_jits():
    pred, target = _make_loss_dicts()
    loss_obj = PoseMFShapeGaussianLoss(CFG.LOSS.STAGE2, 256)

    @jax.jit
    def f(F):
        U, S, V = svd3x3(F)
        p = dict(pred, pose_params_F=F, pose_params_U=U, pose_params_S=S,
                 pose_params_V=V)
        return loss_obj(target, p)[0]

    g = jax.grad(f)(pred["pose_params_F"])
    assert np.all(np.isfinite(np.asarray(g)))


def test_visible_joint_masking():
    """Invisible joints must not affect the 2D loss."""
    pred, target = _make_loss_dicts()
    loss_obj = PoseMFShapeGaussianLoss(CFG.LOSS.STAGE1, 256)
    base = float(loss_obj(target, pred)[1]["joints2D"])
    vis = np.asarray(target["joints2D_vis"])
    pred2 = dict(pred)
    j2d = np.asarray(pred["joints2D"]).copy()
    j2d[:, :, ~vis[0] if vis.ndim == 1 else ~vis[0], :] += 100.0  # perturb an invisible joint
    # perturb only joints invisible in example 0
    j2d = np.asarray(pred["joints2D"]).copy()
    invis = ~vis
    for b in range(j2d.shape[0]):
        j2d[b, :, invis[b], :] += 123.0
    pred2["joints2D"] = jnp.asarray(j2d)
    after = float(loss_obj(target, pred2)[1]["joints2D"])
    np.testing.assert_allclose(after, base, rtol=1e-5)


def test_degenerate_camera_plane_joint_stays_finite():
    """A body point ON the camera plane (z == 0 after translation) must not
    poison training: perspective_project clamps the depth sign-preservingly
    (unguarded divide -> NaN targets -> NaN grads; seen at train iter 12 on
    TPU where bf16 LBS rounding pushed a synthetic joint across z = 0), the
    off-frame projection fails the visibility check, and the where-masked
    loss (and its gradient) ignores it."""
    from hierarchicalprobabilistic3dhuman_tpu.utils.cam_utils import (
        perspective_project)
    from hierarchicalprobabilistic3dhuman_tpu.utils.joints2d_utils import (
        check_joints2d_visibility)

    pts = jnp.asarray([[[0.3, 0.1, -2.5],     # on the camera plane after +t
                        [0.5, 0.2, -2.501],   # just behind it
                        [0.1, -0.2, 0.4]]])   # sanely in front
    t = jnp.asarray([[0.0, 0.0, 2.5]])
    j2d = perspective_project(pts, None, t, focal_length=300.0, img_wh=256)
    assert np.all(np.isfinite(np.asarray(j2d)))

    vis = check_joints2d_visibility(j2d, 256)
    assert not bool(vis[0, 0]) and not bool(vis[0, 1])  # degenerate -> masked
    assert bool(vis[0, 2])

    # The masked loss AND its gradient stay finite with the degenerate target.
    pred, target = _make_loss_dicts()
    tj = np.asarray(target["joints2D"]).copy()
    tj[:, 0] = 1e9                      # degenerate off-frame target joint
    tvis = np.asarray(target["joints2D_vis"]).copy()
    tvis[:, 0] = False
    target2 = dict(target)
    target2["joints2D"] = jnp.asarray(tj)
    target2["joints2D_vis"] = jnp.asarray(tvis)
    loss_obj = PoseMFShapeGaussianLoss(CFG.LOSS.STAGE1, 256)

    def total(p_j2d):
        p = dict(pred)
        p["joints2D"] = p_j2d
        return loss_obj(target2, p)[0]

    val, grad = jax.value_and_grad(total)(pred["joints2D"])
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_checkpoint_roundtrip(tmp_path):
    from hierarchicalprobabilistic3dhuman_tpu.runtime.checkpointing import (
        save_training_checkpoint, load_training_checkpoint,
        load_training_info_from_checkpoint, checkpoint_path,
        save_variables, load_variables)

    variables = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
                 "batch_stats": {"bn": {"mean": np.zeros(3, np.float32)}}}
    path = checkpoint_path(str(tmp_path), 15)
    assert path.endswith("epoch_015.tar")
    save_training_checkpoint(path, epoch=15, best_epoch=10,
                             best_epoch_val_metrics={"PVE-SC": 0.1},
                             model_variables=variables,
                             best_model_variables=variables,
                             opt_state={"count": np.int32(7)})
    ckpt = load_training_checkpoint(path)
    np.testing.assert_array_equal(ckpt["model_state_dict"]["params"]["w"],
                                  variables["params"]["w"])

    epoch, best_epoch, wts, best_metrics = load_training_info_from_checkpoint(
        ckpt, ["PVE-SC", "MPJPE-PA"])
    assert epoch == 16 and best_epoch == 10
    assert best_metrics["PVE-SC"] == 0.1
    assert best_metrics["MPJPE-PA"] == np.inf  # missing metric filled

    vp = str(tmp_path / "vars.msgpack")
    save_variables(vp, variables)
    back = load_variables(vp)
    np.testing.assert_array_equal(back["params"]["w"], variables["params"]["w"])


def test_vertex_uncertainty_batched():
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.utils.sampling_utils import (
        compute_vertex_uncertainties_by_sampling)
    smpl = SMPL.synthetic()
    B = 2
    F = jnp.asarray((5 * np.eye(3) + RNG.randn(B, 23, 3, 3)).astype(np.float32))
    U, S, V = svd3x3(F)
    glob = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    avg_d, verts, joints = compute_vertex_uncertainties_by_sampling(
        jax.random.PRNGKey(0), U, S, V, jnp.zeros((B, 10)),
        0.1 * jnp.ones((B, 10)), glob, 16, smpl)
    assert avg_d.shape == (B, 6890)
    assert verts.shape == (B, 16, 6890, 3)
    assert float(avg_d.min()) >= 0


def test_j2d_error_sorting_orders_by_error():
    from hierarchicalprobabilistic3dhuman_tpu.utils.sampling_utils import (
        joints2D_error_sorted_verts_sampling)
    from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
        convert_2Djoints_to_gaussian_heatmaps_batched)
    N = 4
    verts = jnp.asarray(np.arange(N)[:, None, None]
                        * np.ones((N, 6890, 3)), jnp.float32)
    joints = jnp.asarray(RNG.randn(N, 90, 3).astype(np.float32) * 0.01)
    j2d = jnp.asarray(np.full((1, 17, 2), 128.0, np.float32))
    heatmaps = convert_2Djoints_to_gaussian_heatmaps_batched(j2d, 256)
    cam = jnp.asarray([[0.9, 0.0, 0.0]])
    out = joints2D_error_sorted_verts_sampling(verts, joints, heatmaps, cam)
    assert out.shape == verts.shape


def test_encoder_precision_persists_across_resume(tmp_path):
    """--bf16_encoder is experiment state: a fresh run records the mode in
    the experiment dir and a resume restores it even when the flag is
    omitted (or contradicts) — checkpoints are mode-identical by design, so
    this sidecar is the only guard against a silent mid-run precision
    switch (cli/train.py:resolve_encoder_precision)."""
    from hierarchicalprobabilistic3dhuman_tpu.cli.train import (
        resolve_encoder_precision)

    exp = str(tmp_path)
    # Fresh bf16 run writes the marker and keeps the flag.
    assert resolve_encoder_precision(exp, True, resuming=False) is True
    with open(tmp_path / "encoder_precision.txt") as f:
        assert f.read().strip() == "bfloat16"
    # Resume without the flag: the saved mode wins.
    assert resolve_encoder_precision(exp, False, resuming=True) is True
    # Fresh f32 run overwrites; resume with a contradicting flag loses.
    assert resolve_encoder_precision(exp, False, resuming=False) is False
    assert resolve_encoder_precision(exp, True, resuming=True) is False
    # Legacy experiment without a marker: honour the command line.
    legacy = str(tmp_path / "legacy")
    import os
    os.makedirs(legacy)
    assert resolve_encoder_precision(legacy, True, resuming=True) is True
