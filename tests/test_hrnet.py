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
