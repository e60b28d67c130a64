"""Camera translation jitter (reference: utils/augmentation/cam_augmentation.py:4-14)."""

import jax
import jax.numpy as jnp


def augment_cam_t(key, mean_cam_t, xy_std=0.05, delta_z_range=(-0.5, 0.5)):
    """:param mean_cam_t: (B, 3); returns jittered (B, 3)."""
    B = mean_cam_t.shape[0]
    key_xy, key_z = jax.random.split(key)
    delta_xy = jax.random.normal(key_xy, (B, 2), dtype=mean_cam_t.dtype) * xy_std
    l, h = delta_z_range
    delta_z = jax.random.uniform(key_z, (B,), minval=l, maxval=h,
                                 dtype=mean_cam_t.dtype)
    return jnp.concatenate([mean_cam_t[:, :2] + delta_xy,
                            (mean_cam_t[:, 2] + delta_z)[:, None]], axis=1)
