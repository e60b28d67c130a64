"""Distribution predictor: shape/jit tests + weight-conversion parity with the
torch reference (encoder features, static heads, first-level pose output)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
    PoseMFShapeGaussianNet, immediate_parents_to_all_parents, torch_to_flax_predictor)
from hierarchicalprobabilistic3dhuman_tpu.models.resnet import resnet18, torch_to_flax_resnet
from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL_PARENTS

RNG = np.random.RandomState(21)


def test_parents_dict():
    d = immediate_parents_to_all_parents(list(SMPL_PARENTS))
    assert len(d) == 23
    assert d[0] == []          # left hip: child of root
    assert d[3] == [0]         # spine1 ... depends on tree; check consistency:
    for j, anc in d.items():
        # ancestors must be strictly smaller indices (topological order)
        assert all(a < j for a in anc)
        # parent chain is consistent with SMPL_PARENTS
        if anc:
            assert anc[0] == SMPL_PARENTS[j + 1] - 1


@pytest.mark.slow
def test_forward_shapes():
    # Eager apply: compiling the full ResNet+head program costs ~90 s on this
    # 1-core host — the jit path is pinned by test_forward_jit (slow tier) and
    # by every driver/parallel test that jits the model inside a step.
    model = PoseMFShapeGaussianNet()
    x = jnp.asarray(RNG.rand(2, 18, 32, 32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["pose_params_F"].shape == (2, 23, 3, 3)
    assert out["pose_params_S"].shape == (2, 23, 3)
    assert out["pose_rotmats_mode"].shape == (2, 23, 3, 3)
    assert out["shape_mean"].shape == (2, 10)
    assert out["glob"].shape == (2, 6)
    assert out["cam"].shape == (2, 3)
    # modes are valid rotations
    dets = np.linalg.det(np.asarray(out["pose_rotmats_mode"]).reshape(-1, 3, 3))
    np.testing.assert_allclose(dets, np.ones_like(dets), atol=1e-4)


@pytest.mark.slow
def test_forward_jit():
    model = PoseMFShapeGaussianNet()
    x = jnp.asarray(RNG.rand(2, 18, 64, 64).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    eager = model.apply(variables, x)
    jitted = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    np.testing.assert_allclose(np.asarray(jitted["pose_rotmats_mode"]),
                               np.asarray(eager["pose_rotmats_mode"]),
                               atol=1e-5)


def _reference_modules():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib
    resnet_ref = importlib.import_module("models.resnet")
    # models.poseMF_shapeGaussian_net imports utils.rigid_transform_utils which
    # needs cv2 (present) and warns about pytorch3d (absent but guarded).
    net_ref = importlib.import_module("models.poseMF_shapeGaussian_net")
    return resnet_ref, net_ref


def test_resnet18_conversion_parity():
    import torch
    resnet_ref, _ = _reference_modules()
    torch.manual_seed(0)
    ref = resnet_ref.resnet18(in_channels=18, pretrained=False).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = torch_to_flax_resnet(sd, layers=(2, 2, 2, 2))

    x = RNG.rand(2, 18, 64, 64).astype(np.float32)
    with torch.no_grad():
        feats_ref = ref(torch.from_numpy(x)).numpy()
    model = resnet18(in_channels=18)
    feats = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False))
    assert feats.shape == feats_ref.shape == (2, 512)
    np.testing.assert_allclose(feats, feats_ref, atol=2e-4)


def test_predictor_conversion_parity_static_heads():
    import torch
    from hierarchicalprobabilistic3dhuman_tpu.configs import get_pose_shape_cfg_defaults
    _, net_ref = _reference_modules()
    torch.manual_seed(1)
    cfg = get_pose_shape_cfg_defaults()
    ref = net_ref.PoseMFShapeGaussianNet(smpl_parents=list(SMPL_PARENTS), config=cfg).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = torch_to_flax_predictor(sd)

    x = RNG.rand(2, 18, 64, 64).astype(np.float32)
    with torch.no_grad():
        (F_r, U_r, S_r, V_r, mode_r, shape_dist_r, glob_r, cam_r) = ref(torch.from_numpy(x))

    model = PoseMFShapeGaussianNet()
    out = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]},
                      jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(out["glob"]), glob_r.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["cam"]), cam_r.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["shape_mean"]), shape_dist_r.loc.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["shape_log_std"]),
                               np.log(shape_dist_r.scale.numpy()), atol=2e-4)
    # Joint 0 (no ancestors): F and sign-invariant quantities match exactly.
    np.testing.assert_allclose(np.asarray(out["pose_params_F"][:, 0]),
                               F_r[:, 0].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pose_params_S"][:, 0]),
                               S_r[:, 0].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pose_rotmats_mode"][:, 0]),
                               mode_r[:, 0].numpy(), atol=1e-3)


@pytest.mark.slow
def test_gradients_flow_through_hierarchy():
    model = PoseMFShapeGaussianNet()
    x = jnp.asarray(RNG.rand(1, 18, 32, 32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(2), x)

    def loss(params):
        out = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, x)
        return jnp.sum(out["pose_rotmats_mode"]) + jnp.sum(out["shape_mean"])

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # The deepest joint's MLP gets gradient signal
    g22 = np.asarray(g["fc_pose_22_1"]["kernel"])
    assert np.abs(g22).max() > 0


@pytest.mark.slow
def test_bf16_encoder_mode_same_params_close_outputs():
    """Mixed-precision encoder (--bf16_encoder): the parameter/batch-stats
    trees are IDENTICAL to the f32 model (params stay f32 -> checkpoints and
    torch conversion are mode-independent) and outputs stay close — only the
    encoder conv compute dtype changes (models/resnet.py)."""
    x = jnp.asarray(RNG.rand(2, 18, 32, 32).astype(np.float32))
    f32 = PoseMFShapeGaussianNet()
    b16 = PoseMFShapeGaussianNet(encoder_dtype=jnp.bfloat16)
    v32 = f32.init(jax.random.PRNGKey(0), x)
    v16 = b16.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v32) == jax.tree.structure(v16)
    for a, b in zip(jax.tree.leaves(v32), jax.tree.leaves(v16)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o32 = f32.apply(v32, x)
    o16 = b16.apply(v32, x)   # same weights, bf16 conv compute
    assert o16["pose_params_F"].dtype == jnp.float32
    # bf16 convs round inputs/weights to 8-bit mantissa; the head (f32)
    # amplifies nothing pathological — features agree to ~1e-2.
    np.testing.assert_allclose(np.asarray(o16["shape_mean"]),
                               np.asarray(o32["shape_mean"]), atol=5e-2)
    np.testing.assert_allclose(np.asarray(o16["cam"]),
                               np.asarray(o32["cam"]), atol=5e-2)
