"""Rotation representations and SO(3) maps, pure JAX.

Covers the behaviours of the reference's utils/rigid_transform_utils.py
(rot6d_to_rotmat:80-94, rotmat_to_rot6d:97-110, quat_to_rotmat:113-133,
aa_rotate_rotmats_pytorch3d:11-31, aa_rotate_rotmats:34-58,
aa_rotate_translate_points_pytorch3d:61-77) without the pytorch3d/OpenCV
dependencies: the exponential map is a closed-form Rodrigues formula and the
log map has an explicit small-angle / near-pi guard (the reference notes
pytorch3d's log map is broken at R = I; ours is not).

All functions accept arbitrary leading batch dimensions and are jit/vmap safe.
"""

import jax
import jax.numpy as jnp

_EPS = 1e-8


def rot6d_to_rotmat(x):
    """6D rotation representation -> rotation matrix via Gram-Schmidt.

    Zhou et al. CVPR 2019. Matches reference utils/rigid_transform_utils.py:80-94:
    the 6 numbers are the first two *columns* of R stored row-interleaved,
    i.e. x.reshape(..., 3, 2).

    :param x: (..., 6)
    :return: (..., 3, 3)
    """
    x = x.reshape(x.shape[:-1] + (3, 2))
    a1 = x[..., 0]
    a2 = x[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2_raw = a2 - a2_proj
    b2 = b2_raw / jnp.maximum(jnp.linalg.norm(b2_raw, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(R, stack_columns=False):
    """Rotation matrix -> 6D representation (reference :97-110).

    stack_columns=False (default) returns [R11, R12, R21, R22, R31, R32]
    (exact inverse layout of rot6d_to_rotmat); True returns the two columns
    stacked [col0; col1].
    """
    if stack_columns:
        return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)
    return R[..., :, :2].reshape(R.shape[:-2] + (6,))


def quat_to_rotmat(quat):
    """Quaternion (w, x, y, z) -> rotation matrix (reference :113-133).

    :param quat: (..., 4), not necessarily normalised.
    :return: (..., 3, 3)
    """
    q = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    R = jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def _hat(v):
    """Skew-symmetric matrix of (..., 3) vectors."""
    zeros = jnp.zeros_like(v[..., 0])
    row0 = jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1)
    row1 = jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1)
    row2 = jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def so3_exp(log_rot):
    """Axis-angle vector -> rotation matrix (Rodrigues' formula).

    Closed-form, numerically safe at theta -> 0 via Taylor-guarded
    sin(t)/t and (1-cos t)/t^2 factors. Replaces the reference's
    pytorch3d so3_exponential_map / cv2.Rodrigues.

    :param log_rot: (..., 3)
    :return: (..., 3, 3)
    """
    theta2 = jnp.sum(log_rot * log_rot, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta < 1e-4
    # sin(t)/t and (1 - cos t)/t^2, Taylor-expanded in the small-angle limit.
    safe_theta2 = jnp.where(small, 1.0, theta2)
    sin_t_over_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.sqrt(safe_theta2))
    one_minus_cos_over_t2 = jnp.where(small, 0.5 - theta2 / 24.0,
                                      (1.0 - jnp.cos(theta)) / safe_theta2)
    K = _hat(log_rot)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), K.shape)
    return (eye
            + sin_t_over_t[..., None, None] * K
            + one_minus_cos_over_t2[..., None, None] * KK)


def so3_log(R):
    """Rotation matrix -> axis-angle vector (SO(3) log map).

    Safe at R = I (returns 0) and near theta = pi (falls back to the
    diagonal-based axis extraction). Replaces cv2.Rodrigues in the reference's
    aa_rotate_rotmats (utils/rigid_transform_utils.py:34-58).

    :param R: (..., 3, 3)
    :return: (..., 3)
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)

    # Generic branch: axis from the antisymmetric part.
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-3
    safe_sin = jnp.where(small | near_pi, 1.0, sin_theta)
    generic = w * (theta / (2.0 * safe_sin))[..., None]

    # Small-angle branch: log(R) ~ (R - R^T)/2 vectorised, i.e. w / 2.
    small_branch = w * (0.5 + theta2_sixth(theta))[..., None]

    # Near-pi branch: axis from diagonal of (R + I)/2 = axis axis^T (at pi).
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag + 1.0) / 2.0, 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # Fix signs using the off-diagonal terms: sign(a_i) from the column with largest |axis|.
    # Use column of (R + I) corresponding to the largest diagonal entry.
    k = jnp.argmax(diag, axis=-1)
    Rp = R + jnp.eye(3, dtype=R.dtype)
    col = jnp.take_along_axis(Rp, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    col_norm = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), _EPS)
    signed_axis = jnp.where(jnp.sum(col_norm * axis, axis=-1, keepdims=True) < 0,
                            -col_norm, col_norm)
    del axis  # magnitude comes from the normalised column; axis_sq only set signs
    pi_branch = signed_axis * theta[..., None]

    out = jnp.where(small[..., None], small_branch,
                    jnp.where(near_pi[..., None], pi_branch, generic))
    return out


def theta2_sixth(theta):
    """Second-order correction term theta^2/12 used in the small-angle log map."""
    return theta * theta / 12.0


def aa_rotate_rotmats(rotmats, axes, angles, rot_mult_order="post"):
    """Rotate rotation matrices about given axis-angle (reference :11-31, :34-58).

    :param rotmats: (B, 3, 3)
    :param axes: (3,) or (B, 3)
    :param angles: scalar or (B, 1), radians
    :return: (rotated_rotvecs (B, 3), rotated_rotmats (B, 3, 3))
    """
    assert rot_mult_order in ("pre", "post")
    r = jnp.asarray(axes, dtype=rotmats.dtype) * angles
    if r.ndim < 2:
        r = jnp.broadcast_to(r[None, :], (rotmats.shape[0], 3))
    R = so3_exp(r)
    if rot_mult_order == "post":
        rotated = rotmats @ R
    else:
        rotated = R @ rotmats
    return so3_log(rotated), rotated


def aa_rotate_translate_points(points, axes, angles, translations):
    """Rotate and translate point sets (reference :61-77).

    :param points: (B, N, 3)
    :param axes: (3,) or (B, 3)
    :param angles: scalar or (B, 1), radians
    :param translations: (3,) or (B, 3)
    :return: (B, N, 3)
    """
    r = jnp.asarray(axes, dtype=points.dtype) * angles
    if r.ndim < 2:
        r = jnp.broadcast_to(r[None, :], (points.shape[0], 3))
    R = so3_exp(r)
    rotated = jnp.einsum("bij,bkj->bki", R, points)
    return rotated + jnp.asarray(translations, dtype=points.dtype)


def batch_rodrigues(axisang):
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3); alias of so3_exp.

    Named for parity with smplx.lbs.batch_rodrigues which the reference uses
    (train/train_poseMF_shapeGaussian_net.py:131).
    """
    return so3_exp(axisang)
