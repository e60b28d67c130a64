"""SMPL shape parameter sampling (reference: utils/augmentation/smpl_augmentation.py)."""

import jax
import jax.numpy as jnp


def uniform_sample_shape(key, batch_size, mean_shape, delta_betas_range):
    """Uniform shape deviations from the mean (reference :6-13)."""
    l, h = delta_betas_range
    delta = jax.random.uniform(key, (batch_size, mean_shape.shape[0]),
                               minval=l, maxval=h, dtype=mean_shape.dtype)
    return mean_shape + delta


def normal_sample_shape(key, batch_size, mean_shape, std_vector):
    """Gaussian shape deviations from the mean (reference :16-21)."""
    eps = jax.random.normal(key, (batch_size, mean_shape.shape[0]),
                            dtype=mean_shape.dtype)
    return mean_shape + eps * std_vector


def uniform_random_unit_vector(key, num_vectors):
    """Uniform random points on the unit sphere (reference :24-30)."""
    e = jax.random.normal(key, (num_vectors, 3))
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True)
