"""RGB image augmentation (reference: utils/augmentation/rgb_augmentation.py).

Occlusion halves are shared with the proxy-rep implementations (masked, not
looped); per-channel pixel noise and an optional separable gaussian blur (the
reference defines blur but never calls it in augment_rgb — kept for parity).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.proxy_rep_augmentation import (
    random_occlude_bottom_half, random_occlude_top_half, random_occlude_vertical_half)


def random_pixel_noise_per_channel(key, rgb, per_channel_pixel_noise_factor=0.2):
    """Multiply each channel by a random factor in [1-f, 1+f], clamp to 1 (reference :71-77)."""
    l, h = 1 - per_channel_pixel_noise_factor, 1 + per_channel_pixel_noise_factor
    noise = jax.random.uniform(key, (rgb.shape[0], 3), minval=l, maxval=h,
                               dtype=rgb.dtype)
    return jnp.clip(rgb * noise[:, :, None, None], a_max=1.0)


def random_gaussian_blur(key, rgb, sigma_range=(0.2, 1.2), kernel_size=7):
    """Separable gaussian blur with a batch-shared random sigma (reference :80-89).

    Note: sigma is traced, so the kernel is built on-device.
    """
    l, h = sigma_range
    sigma = jax.random.uniform(key, (), minval=l, maxval=h)
    n = jnp.arange(kernel_size, dtype=rgb.dtype) - (kernel_size - 1) / 2.0
    k = jnp.exp(-0.5 * (n / sigma) ** 2)
    k = k / k.sum()
    B, C, H, W = rgb.shape
    flat = rgb.reshape(B * C, 1, H, W)
    pad = kernel_size // 2
    kh = k[None, None, None, :]
    kv = k[None, None, :, None]
    out = lax.conv_general_dilated(flat, kh, (1, 1), ((0, 0), (pad, pad)),
                                   dimension_numbers=("NCHW", "OIHW", "NCHW"))
    out = lax.conv_general_dilated(out, kv, (1, 1), ((pad, pad), (0, 0)),
                                   dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out.reshape(B, C, H, W)


def augment_rgb(key, rgb, joints2D, joints2D_visib, rgb_augment_config):
    """Full RGB augmentation pipeline (reference :92-115)."""
    cfg = rgb_augment_config
    keys = jax.random.split(key, 4)
    rgb, joints2D, joints2D_visib = random_occlude_bottom_half(
        keys[0], rgb, joints2D, joints2D_visib,
        occlude_probability=cfg.OCCLUDE_BOTTOM_PROB)
    rgb, joints2D, joints2D_visib = random_occlude_top_half(
        keys[1], rgb, joints2D, joints2D_visib,
        occlude_probability=cfg.OCCLUDE_TOP_PROB)
    rgb, joints2D, joints2D_visib = random_occlude_vertical_half(
        keys[2], rgb, joints2D, joints2D_visib,
        occlude_probability=cfg.OCCLUDE_VERTICAL_PROB)
    rgb = random_pixel_noise_per_channel(
        keys[3], rgb, per_channel_pixel_noise_factor=cfg.PIXEL_CHANNEL_NOISE)
    return rgb, joints2D, joints2D_visib
