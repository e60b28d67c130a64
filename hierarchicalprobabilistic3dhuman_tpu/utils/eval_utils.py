"""Evaluation alignment math: Procrustes and scale+translation transforms.

JAX equivalents of the reference's utils/eval_utils.py:11-141. Unlike the
reference, the Procrustes solve is natively batched (vmap over the batch axis
replaces the python loop in procrustes_analysis_batch:62-67) and runs
on-device so eval metrics can stay in a jitted pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np


def compute_similarity_transform(S1, S2):
    """Similarity transform (sR, t) aligning S1 to S2 (orthogonal Procrustes).

    Mirrors reference utils/eval_utils.py:11-59 including the det-sign fix.

    :param S1, S2: (N, 3) point sets (also accepts (3, N) like the reference).
    :return: S1_hat aligned to S2, same layout as input.
    """
    S1 = jnp.asarray(S1)
    S2 = jnp.asarray(S2)
    transposed = False
    if S1.shape[0] != 3 and S1.shape[0] != 2:
        S1, S2 = S1.T, S2.T
        transposed = True

    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1 = S1 - mu1
    X2 = S2 - mu2
    var1 = jnp.sum(X1 ** 2)

    K = X1 @ X2.T
    U, s, Vh = jnp.linalg.svd(K)
    V = Vh.T
    Z = jnp.eye(U.shape[0], dtype=S1.dtype)
    Z = Z.at[-1, -1].set(jnp.sign(jnp.linalg.det(U @ V.T)))
    R = V @ (Z @ U.T)

    scale = jnp.trace(R @ K) / var1
    t = mu2 - scale * (R @ mu1)
    S1_hat = scale * (R @ S1) + t
    return S1_hat.T if transposed else S1_hat


def procrustes_analysis_batch(S1, S2):
    """Batched Procrustes alignment (reference :62-67).

    TPU-native: the 3x3 cross-covariance SVD uses the batched Jacobi kernel
    (ops.svd3) instead of a LAPACK callback, so this runs inside jitted
    train/eval steps on device. The rotation R = V Z U^T is invariant to the
    SVD's per-column sign ambiguity, so results match the LAPACK path.

    :param S1, S2: (B, N, 3)
    :return: (B, N, 3) S1 aligned to S2
    """
    from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import svd3x3, det3x3

    S1 = jnp.asarray(S1)
    S2 = jnp.asarray(S2)
    if S1.shape[-1] != 3:
        return jax.vmap(compute_similarity_transform)(S1, S2)

    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1 = S1 - mu1
    X2 = S2 - mu2
    var1 = jnp.sum(X1 ** 2, axis=(1, 2))                      # (B,)
    K = jnp.einsum("bni,bnj->bij", X1, X2)                    # (B, 3, 3)
    U, s, V = svd3x3(K)
    sign = jnp.sign(det3x3(U @ jnp.swapaxes(V, -1, -2)))
    Vz = V.at[..., :, 2].multiply(sign[..., None])
    R = Vz @ jnp.swapaxes(U, -1, -2)                          # (B, 3, 3)
    scale = jnp.einsum("bij,bji->b", R, K) / var1             # (B,)
    t = mu2 - scale[:, None, None] * jnp.einsum(
        "bij,bnj->bni", R, mu1)
    return scale[:, None, None] * jnp.einsum("bij,bnj->bni", R, S1) + t


def scale_and_translation_transform_batch(P, T):
    """Align mean and RMS scale of P to T (reference :70-111, one impl for both).

    :param P: (B, N, 3) meshes to transform
    :param T: (B, N, 3) reference meshes
    :return: (B, N, 3)
    """
    xp = np if isinstance(P, np.ndarray) else jnp
    P_mean = xp.mean(P, axis=1, keepdims=True)
    P_trans = P - P_mean
    P_scale = xp.sqrt(xp.sum(P_trans ** 2, axis=(1, 2), keepdims=True) / P.shape[1])
    P_normalised = P_trans / P_scale

    T_mean = xp.mean(T, axis=1, keepdims=True)
    T_scale = xp.sqrt(xp.sum((T - T_mean) ** 2, axis=(1, 2), keepdims=True) / T.shape[1])
    return P_normalised * T_scale + T_mean


def shape_parameters_to_a_pose(body_shape, smpl):
    """Mesh of a person in A-pose given betas (reference :114-129).

    :param body_shape: (B, num_betas)
    :param smpl: a models.smpl.SMPL instance
    :return: (B, 6890, 3) vertices
    """
    B = body_shape.shape[0]
    a_pose = jnp.zeros((B, 69), dtype=body_shape.dtype)
    a_pose = a_pose.at[:, 47].set(-np.pi / 3.0)
    a_pose = a_pose.at[:, 50].set(np.pi / 3.0)
    out = smpl(betas=body_shape, body_pose=a_pose)
    return out["vertices"]


def make_xz_ground_plane(vertices):
    """Translate meshes so their lowest y-coordinate sits on the x-z plane (reference :132-141).

    :param vertices: (B, 6890, 3)
    """
    xp = np if isinstance(vertices, np.ndarray) else jnp
    lowest_y = vertices[:, :, 1].min(axis=-1, keepdims=True)
    if xp is np:
        vertices = vertices.copy()
        vertices[:, :, 1] = vertices[:, :, 1] - lowest_y
        return vertices
    return vertices.at[:, :, 1].add(-lowest_y)
