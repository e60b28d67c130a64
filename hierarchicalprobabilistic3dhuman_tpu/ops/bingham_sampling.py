"""Vectorised, fixed-shape, differentiable Bingham / matrix-Fisher sampling.

The reference samples matrix-Fisher rotations via a *python double loop* over
(batch x 23 joints), each iteration running an unbounded rejection-sampling
retry-while on the CPU (reference: utils/sampling_utils.py:10-143; the README
calls this out as the main speed bottleneck). Here the whole thing is one
fused XLA program:

  * ACG proposals for ALL (batch, joint, sample, oversample) lanes are drawn
    in a single jax.random call — shape (B, J, N, K, 4);
  * acceptance is a mask, selection is a static-shape top-N (accepted lanes
    first, in draw order, exactly like the reference's accepted-slice);
  * the astronomically-rare shortfall (fewer than N accepts among N*K
    proposals) degrades gracefully to the highest-acceptance-ratio proposals
    instead of looping — bounded, deterministic, jit-safe;
  * the reparameterisation trick is preserved: gradients flow through the
    Gaussian draw into Omega(S_proper) and through U_proper/V_proper, as in
    the reference (:49-66).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import det3x3
from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import quat_to_rotmat


def bingham_sampling(key, A, num_samples, b=1.5, oversampling_ratio=8):
    """Sample unit quaternions from Bingham(diag(A)) on S^3 by ACG rejection.

    :param key: jax PRNG key
    :param A: (..., 4) non-negative diagonal Bingham parameter (A[..., 0] = 0
        for the matrix-Fisher construction)
    :param num_samples: N samples per batch element
    :param oversampling_ratio: K proposals drawn per requested sample
    :return: samples (..., N, 4), accept_ratio (...,) (fraction accepted * 4,
        matching the reference's diagnostic :67)
    """
    batch_shape = A.shape[:-1]
    N, K = num_samples, oversampling_ratio

    Omega = 1.0 + 2.0 * A / b                      # (..., 4)
    Gaussian_std = Omega ** (-0.5)
    M_star = np.exp(-(4.0 - b) / 2.0) * ((4.0 / b) ** 2)

    key_eps, key_w = jax.random.split(key)
    eps = jax.random.normal(key_eps, batch_shape + (N * K, 4), dtype=A.dtype)
    y = Gaussian_std[..., None, :] * eps           # reparameterised draw
    samples = y / jnp.linalg.norm(y, axis=-1, keepdims=True)  # (..., N*K, 4)

    samples_sg = jax.lax.stop_gradient(samples)
    p_bing_star = jnp.exp(-jnp.sum(samples_sg ** 2 * A[..., None, :], axis=-1))
    p_acg_star = jnp.sum(samples_sg ** 2 * Omega[..., None, :], axis=-1) ** (-2)
    ratio = p_bing_star / (M_star * p_acg_star)    # (..., N*K)

    w = jax.random.uniform(key_w, batch_shape + (N * K,), dtype=A.dtype)
    accept = w < ratio

    # Static-shape "first N accepted": sort by (accepted desc, draw order asc).
    # Shortfall fallback: non-accepted lanes rank by acceptance ratio.
    draw_order = jnp.arange(N * K, dtype=A.dtype)
    score = jnp.where(accept, -draw_order, -(N * K) - 1.0 + jnp.clip(ratio, 0.0, 1.0))
    idx = jnp.argsort(-score, axis=-1)[..., :N]    # (..., N)
    chosen = jnp.take_along_axis(samples, idx[..., None], axis=-2)  # (..., N, 4)

    accept_ratio = jnp.sum(accept, axis=-1).astype(A.dtype) / N * 4.0
    return chosen, accept_ratio


def proper_svd_from_raw(pose_U, pose_S, pose_V):
    """Raw SVD -> proper SVD convention (reference utils/sampling_utils.py:104-111)."""
    detU = jax.lax.stop_gradient(det3x3(pose_U))
    detV = jax.lax.stop_gradient(det3x3(pose_V))
    U_proper = pose_U.at[..., :, 2].multiply(detU[..., None])
    V_proper = pose_V.at[..., :, 2].multiply(detV[..., None])
    S_proper = pose_S.at[..., 2].multiply(detU * detV)
    return U_proper, S_proper, V_proper


def bingham_A_from_S_proper(S_proper):
    """Bingham diagonal from proper singular values (reference :118-121)."""
    zeros = jnp.zeros_like(S_proper[..., 0])
    return jnp.stack([
        zeros,
        2.0 * (S_proper[..., 1] + S_proper[..., 2]),
        2.0 * (S_proper[..., 0] + S_proper[..., 2]),
        2.0 * (S_proper[..., 0] + S_proper[..., 1]),
    ], axis=-1)


def pose_matrix_fisher_sampling(key, pose_U, pose_S, pose_V, num_samples,
                                b=1.5, oversampling_ratio=8):
    """Sample rotation matrices from per-joint matrix-Fisher distributions.

    reference: utils/sampling_utils.py:74-143, minus the python loops and the
    CPU device hop (`sample_on_cpu` is unnecessary on TPU: the sampler is one
    batched XLA program).

    :param pose_U/S/V: (B, J, 3, 3), (B, J, 3), (B, J, 3, 3) raw SVD of F
    :param num_samples: N
    :return: (B, N, J, 3, 3) rotation matrix samples
    """
    B, J = pose_U.shape[:2]
    # Full f32 matmul precision: TPU backends default f32 matmuls to bf16
    # passes, and bf16-rounded rotation products degrade the reparameterised
    # gradient path (these 3x3 products are negligible FLOPs anyway).
    with jax.default_matmul_precision("highest"):
        U_proper, S_proper, V_proper = proper_svd_from_raw(pose_U, pose_S, pose_V)
        A = bingham_A_from_S_proper(S_proper)  # (B, J, 4)

        quat_samples, _ = bingham_sampling(key, A, num_samples, b=b,
                                           oversampling_ratio=oversampling_ratio)
        # (B, J, N, 4) -> (B, N, J, 3, 3)
        R_tilde = quat_to_rotmat(quat_samples)              # (B, J, N, 3, 3)
        R_tilde = jnp.swapaxes(R_tilde, 1, 2)               # (B, N, J, 3, 3)
        R = (U_proper[:, None] @ R_tilde
             @ jnp.swapaxes(V_proper, -1, -2)[:, None])
    return R


def shape_gaussian_sampling(key, shape_mean, shape_std, num_samples):
    """Reparameterised diagonal-Gaussian shape samples.

    :param shape_mean, shape_std: (B, num_betas)
    :return: (B, N, num_betas)
    """
    eps = jax.random.normal(key, (shape_mean.shape[0], num_samples,
                                  shape_mean.shape[1]), dtype=shape_mean.dtype)
    return shape_mean[:, None] + shape_std[:, None] * eps
