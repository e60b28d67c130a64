"""Random point-light augmentation (reference: utils/augmentation/lighting_augmentation.py)."""

import jax
import jax.numpy as jnp


def augment_light_t(key, batch_size, loc_r_range=(0.05, 3.0)):
    """Random light positions: uniform direction on the sphere, uniform radius
    (reference :4-21)."""
    key_dir, key_r = jax.random.split(key)
    direction = jax.random.normal(key_dir, (batch_size, 3))
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    l, h = loc_r_range
    r = jax.random.uniform(key_r, (batch_size, 1), minval=l, maxval=h)
    return direction * r


def augment_light_colour(key, batch_size,
                         ambient_intensity_range=(0.2, 0.8),
                         diffuse_intensity_range=(0.2, 0.8),
                         specular_intensity_range=(0.2, 0.8)):
    """Random white-light intensities (reference :24-48)."""
    keys = jax.random.split(key, 3)
    out = []
    for k, (l, h) in zip(keys, [ambient_intensity_range, diffuse_intensity_range,
                                specular_intensity_range]):
        intensity = jax.random.uniform(k, (batch_size, 1), minval=l, maxval=h)
        out.append(jnp.broadcast_to(intensity, (batch_size, 3)))
    return tuple(out)


def augment_light(key, batch_size, rgb_augment_config):
    """Full light settings dict for the renderer (reference :51-67)."""
    key_t, key_c = jax.random.split(key)
    light_t = augment_light_t(key_t, batch_size,
                              loc_r_range=rgb_augment_config.LIGHT_LOC_RANGE)
    ambient, diffuse, specular = augment_light_colour(
        key_c, batch_size,
        ambient_intensity_range=rgb_augment_config.LIGHT_AMBIENT_RANGE,
        diffuse_intensity_range=rgb_augment_config.LIGHT_DIFFUSE_RANGE,
        specular_intensity_range=rgb_augment_config.LIGHT_SPECULAR_RANGE)
    return {"location": light_t, "ambient_color": ambient,
            "diffuse_color": diffuse, "specular_color": specular}
