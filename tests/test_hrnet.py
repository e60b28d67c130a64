"""HRNet-W48: shape test + full conversion parity against the torch reference."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.models.hrnet import (
    PoseHighResolutionNet, torch_to_flax_hrnet)

RNG = np.random.RandomState(33)


def test_forward_shape():
    model = PoseHighResolutionNet()
    x = jnp.asarray(RNG.rand(1, 3, 128, 96).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 17, 32, 24)


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
