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
    dtype: Any = None   # conv COMPUTE dtype (params stay f32); None = f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1",
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2", dtype=jnp.float32)(y)
        if self.downsample:
            residual = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv",
                               dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn",
                                    dtype=jnp.float32)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = None   # conv COMPUTE dtype (params stay f32); None = f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1",
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2", dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                    name="conv3", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn3", dtype=jnp.float32)(y)
        if self.downsample:
            residual = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv",
                               dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn",
                                    dtype=jnp.float32)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Encoder trunk; returns (B, C_feat) global-average-pooled features.

    dtype is the CONV compute dtype only (mixed precision): params and
    BatchNorm statistics/arithmetic stay float32, so checkpoints and the
    torch converter are unaffected. None = full f32 (reference parity,
    the default); jnp.bfloat16 doubles MXU throughput on the encoder
    convs (opt in via run_train.py --bf16_encoder).
    """
    block: Any
    layers: Sequence[int]
    in_channels: int = 18
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, input_layout: str = "NCHW"):
        if input_layout == "NCHW":
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = 64
        for stage, num_blocks in enumerate(self.layers):
            for i in range(num_blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                downsample = (i == 0) and (
                    strides != 1 or x.shape[-1] != features * (4 if self.block is Bottleneck else 1))
                x = self.block(features=features, strides=strides,
                               downsample=downsample, dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(x, train=train)
            features *= 2

        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)


def resnet18(in_channels=18, dtype=None):
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2),
                  in_channels=in_channels, dtype=dtype)


def resnet50(in_channels=18, dtype=None):
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3),
                  in_channels=in_channels, dtype=dtype)


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
