"""HRNet-W48: shape test + full conversion parity against the torch reference."""

import sys

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.models.hrnet import (
    PoseHighResolutionNet, torch_to_flax_hrnet)

RNG = np.random.RandomState(33)


@pytest.mark.slow
def test_forward_shape():
    model = PoseHighResolutionNet()
    x = jnp.asarray(RNG.rand(1, 3, 128, 96).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 17, 32, 24)


@pytest.mark.slow
def test_bf16_inference_matches_f32():
    """bfloat16 HRNet (cast params + input; flax infers compute dtype) keeps
    the keypoint argmax: heatmaps agree to bf16 resolution and the per-joint
    argmax locations match the f32 forward. Justifies the bench/predict
    --bf16 path."""
    from hierarchicalprobabilistic3dhuman_tpu.utils.precision import cast_floating

    model = PoseHighResolutionNet()
    x = jnp.asarray(RNG.rand(2, 3, 128, 96).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x[:1])

    out_f32 = np.asarray(model.apply(variables, x))
    out_bf16 = np.asarray(model.apply(cast_floating(variables),
                                      x.astype(jnp.bfloat16))
                          .astype(jnp.float32))

    assert out_bf16.shape == out_f32.shape
    scale = np.abs(out_f32).max()
    assert np.abs(out_bf16 - out_f32).max() < 0.05 * scale
    # Keypoints = per-joint argmax over the heatmap. Near-ties may flip the
    # argmax pixel, but the f32 VALUE at bf16's argmax must be within bf16
    # rounding of the true max (i.e. bf16 never picks a materially worse peak).
    flat_f32 = out_f32.reshape(2, 17, -1)
    bf16_arg = out_bf16.reshape(2, 17, -1).argmax(-1)
    at_bf16_peak = np.take_along_axis(flat_f32, bf16_arg[..., None], -1)[..., 0]
    true_max = flat_f32.max(-1)
    assert np.abs(true_max - at_bf16_peak).max() < 0.02 * scale


def test_conversion_tree_matches_model():
    """Converter output must match the flax model's variable tree exactly
    (shapes + paths) — the cheap structural half of conversion parity; the
    full numerical forward parity runs in the slow tier."""
    import torch
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.pose2D_hrnet import PoseHighResolutionNet as RefHRNet
    from hierarchicalprobabilistic3dhuman_tpu.configs import get_pose2d_hrnet_cfg_defaults

    torch.manual_seed(0)
    ref = RefHRNet(get_pose2d_hrnet_cfg_defaults())
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    converted = torch_to_flax_hrnet(sd)

    model = PoseHighResolutionNet()
    init_vars = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32))))
    conv_shapes = jax.tree_util.tree_map(lambda a: np.shape(a), converted)
    init_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), init_vars)
    assert conv_shapes == init_shapes


@pytest.mark.slow
def test_conversion_parity_with_reference():
    import torch
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.pose2D_hrnet import PoseHighResolutionNet as RefHRNet
    from hierarchicalprobabilistic3dhuman_tpu.configs import get_pose2d_hrnet_cfg_defaults

    torch.manual_seed(0)
    cfg = get_pose2d_hrnet_cfg_defaults()
    ref = RefHRNet(cfg).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = torch_to_flax_hrnet(sd)

    x = RNG.rand(1, 3, 128, 96).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    model = PoseHighResolutionNet()
    out = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, atol=5e-4)


def test_fold_conv3x3_width_is_exact():
    """The width-folded kernel reproduces the original 3x3 conv exactly
    (including boundary columns, where the out-of-range folded taps carry
    identically-zero weight blocks)."""
    from jax import lax
    from hierarchicalprobabilistic3dhuman_tpu.models.hrnet import (
        fold_conv3x3_width, fold_width, unfold_width)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 6, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = unfold_width(lax.conv_general_dilated(
        fold_width(x), fold_conv3x3_width(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_folded_basic_block_matches_unfolded():
    """FoldedBasicBlock == BasicBlock on the same variable tree (identical
    param structure; numerics equal up to float reassociation)."""
    from hierarchicalprobabilistic3dhuman_tpu.models.hrnet import (
        BasicBlock, FoldedBasicBlock, fold_width, unfold_width)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 12, 48).astype(np.float32))
    blk = BasicBlock(48)
    v = blk.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(lambda a: a + jnp.asarray(
        rng.rand(*a.shape).astype(np.float32)) * 0.3, v)
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(lambda a: jnp.abs(a) + 0.1,
                                     v["batch_stats"])}
    ref = np.asarray(blk.apply(v, x))
    fold = FoldedBasicBlock(48)
    out = np.asarray(unfold_width(fold.apply(v, fold_width(x))))
    np.testing.assert_allclose(out, ref, rtol=3e-6, atol=1e-5 * np.abs(ref).max())
    # identical variable trees: checkpoints/converters are agnostic
    v2 = fold.init(jax.random.PRNGKey(1), fold_width(x))
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))


@pytest.mark.slow
def test_folded_branch0_matches_unfolded():
    """Full model: fold_branch0_width=True == False on the same variables
    (small 64x64 input keeps the trace cheap; all stages + fuse paths run)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32))
    net_ref = PoseHighResolutionNet(num_joints=17, fold_branch0_width=False)
    v = net_ref.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(net_ref.apply(v, x))
    net_fold = PoseHighResolutionNet(num_joints=17, fold_branch0_width=True)
    out = np.asarray(net_fold.apply(v, x))
    # float reassociation accumulates over ~30 conv layers; random-init
    # outputs are near zero so absolute tolerance is the meaningful bound.
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-4)
    # same variable tree either way
    v2 = net_fold.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))


@pytest.mark.slow
def test_reduced_variant_trains_and_keeps_w48_default():
    """width/stage_modules parameterise reduced smoke-trainable variants
    (benchmarks/detector_validation.py); the DEFAULTS must stay exactly
    HRNet-W48 (the converter's parameter tree is pinned by
    test_conversion_tree_matches_model). Slow tier: ~40 s of init+grad
    compiles; the variant is also exercised end-to-end on TPU by the
    detector-validation harness."""
    import jax
    m = PoseHighResolutionNet(num_joints=17, width=16, stage_modules=(1, 2, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 32)), train=True)
    n = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    assert n < 5e6, n  # genuinely reduced (W48 is 63M)
    out, updates = m.apply(v, jnp.zeros((2, 3, 64, 32)), train=True,
                           mutable=["batch_stats"])
    assert out.shape == (2, 17, 16, 8)
    assert "batch_stats" in updates
    # gradient flows (smoke-trainability)
    g = jax.grad(lambda p: m.apply(
        {"params": p, "batch_stats": v["batch_stats"]},
        jnp.ones((1, 3, 64, 32)), train=True,
        mutable=["batch_stats"])[0].sum())(v["params"])
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert gnorm > 0
    # default field values reproduce W48
    d = PoseHighResolutionNet()
    assert d.width == 48 and tuple(d.stage_modules) == (1, 4, 3)
