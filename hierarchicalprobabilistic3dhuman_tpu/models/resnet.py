"""ResNet-18/50 image encoder, flax.linen, NHWC compute layout.

Architecturally identical to the reference's torchvision-derived encoder
(reference: models/resnet.py:229-259 — first conv parameterised for 18-channel
proxy-representation input, final FC removed, global-average-pooled features
out), so that torch checkpoints convert 1:1 (see torch_to_flax_resnet).
Compute runs NHWC (TPU-native layout); the public API accepts NCHW like the
reference and transposes once at the boundary.
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(y)
        if self.downsample:
            residual = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Encoder trunk; returns (B, C_feat) global-average-pooled features."""
    block: Any
    layers: Sequence[int]
    in_channels: int = 18

    @nn.compact
    def __call__(self, x, train: bool = False, input_layout: str = "NCHW"):
        if input_layout == "NCHW":
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = 64
        for stage, num_blocks in enumerate(self.layers):
            for i in range(num_blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                downsample = (i == 0) and (
                    strides != 1 or x.shape[-1] != features * (4 if self.block is Bottleneck else 1))
                x = self.block(features=features, strides=strides,
                               downsample=downsample,
                               name=f"layer{stage + 1}_{i}")(x, train=train)
            features *= 2

        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)


def resnet18(in_channels=18):
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), in_channels=in_channels)


def resnet50(in_channels=18):
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), in_channels=in_channels)


# ---------------------------------------------------------------------------
# torch -> flax weight conversion (checkpoints only exist as .pth/.tar)
# ---------------------------------------------------------------------------

def torch_to_flax_resnet(state_dict, layers=(2, 2, 2, 2)):
    """Convert a torchvision-style ResNet state_dict (without final fc) to
    flax params/batch_stats matching the modules above.

    :param state_dict: dict of numpy arrays (call .numpy() on torch tensors)
    :return: {'params': ..., 'batch_stats': ...}
    """
    import numpy as np

    def conv_w(key):
        # torch OIHW -> flax HWIO
        return np.transpose(np.asarray(state_dict[key]), (2, 3, 1, 0))

    def bn(prefix):
        return (
            {"scale": np.asarray(state_dict[prefix + ".weight"]),
             "bias": np.asarray(state_dict[prefix + ".bias"])},
            {"mean": np.asarray(state_dict[prefix + ".running_mean"]),
             "var": np.asarray(state_dict[prefix + ".running_var"])},
        )

    params = {"conv1": {"kernel": conv_w("conv1.weight")}}
    stats = {}
    params["bn1"], stats["bn1"] = bn("bn1")

    is_bottleneck = any(k.startswith("layer1.0.conv3") for k in state_dict)
    convs_per_block = 3 if is_bottleneck else 2
    for stage, num_blocks in enumerate(layers, start=1):
        for i in range(num_blocks):
            tp = f"layer{stage}.{i}"
            fp = f"layer{stage}_{i}"
            block_p, block_s = {}, {}
            for c in range(1, convs_per_block + 1):
                block_p[f"conv{c}"] = {"kernel": conv_w(f"{tp}.conv{c}.weight")}
                block_p[f"bn{c}"], block_s[f"bn{c}"] = bn(f"{tp}.bn{c}")
            if f"{tp}.downsample.0.weight" in state_dict:
                block_p["downsample_conv"] = {"kernel": conv_w(f"{tp}.downsample.0.weight")}
                block_p["downsample_bn"], block_s["downsample_bn"] = bn(f"{tp}.downsample.1")
            params[fp] = block_p
            stats[fp] = block_s

    return {"params": params, "batch_stats": stats}
