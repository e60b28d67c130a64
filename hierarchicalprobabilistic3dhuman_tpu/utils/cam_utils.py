"""Camera models: weak-perspective (scaled orthographic) and perspective.

Pure-JAX equivalents of the reference's utils/cam_utils.py:9-85, batched and
vmap-safe (the reference's python loop in
batch_convert_weak_perspective_to_camera_translation:69-77 is vectorised away).
"""

import jax.numpy as jnp
import numpy as np


def orthographic_project(points3D, cam_params):
    """Scaled orthographic (weak-perspective) projection (reference :9-16).

    :param points3D: (B, N, 3)
    :param cam_params: (B, 3) [scale, tx, ty]
    :return: (B, N, 2) in normalised [-1, 1]-ish coords
    """
    scale = cam_params[..., None, 0:1]
    trans = cam_params[..., None, 1:3]
    return scale * (points3D[..., :2] + trans)


def get_intrinsics_matrix(img_width, img_height, focal_length):
    """3x3 calibration matrix with principal point at the image centre (reference :19-27)."""
    return np.array([[focal_length, 0.0, img_width / 2.0],
                     [0.0, focal_length, img_height / 2.0],
                     [0.0, 0.0, 1.0]], dtype=np.float32)


def perspective_project(points, rotation, translation, cam_K=None,
                        focal_length=None, img_wh=None):
    """Perspective projection (reference :30-61).

    :param points: (B, N, 3)
    :param rotation: (B, 3, 3) or None
    :param translation: (B, 3)
    :param cam_K: (B, 3, 3) or None (then focal_length + img_wh required)
    :return: (B, N, 2) pixel coordinates
    """
    if cam_K is None:
        cam_K = jnp.asarray(get_intrinsics_matrix(img_wh, img_wh, focal_length))
        cam_K = jnp.broadcast_to(cam_K[None], (points.shape[0], 3, 3))
    if rotation is not None:
        points = jnp.einsum("bij,bkj->bki", rotation, points)
    points = points + translation[:, None, :]
    # Sign-preserving depth clamp: a point ON the camera plane (z == 0) would
    # divide to NaN and poison everything downstream (synthetic bodies with
    # extreme shape samples can reach the camera; such joints project huge,
    # fail the visibility check and get masked — NaN would not). The clamp
    # never engages for sanely-visible points.
    z = points[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-2, jnp.where(z < 0, -1e-2, 1e-2), z)
    projected = points / z_safe
    projected = jnp.einsum("bij,bkj->bki", cam_K, projected)
    return projected[..., :2]


def convert_weak_perspective_to_camera_translation(cam_wp, focal_length, resolution):
    """Single weak-perspective [s, tx, ty] -> camera translation (reference :64-66)."""
    cam_wp = np.asarray(cam_wp)
    return np.array([cam_wp[1], cam_wp[2],
                     2 * focal_length / (resolution * cam_wp[0] + 1e-9)])


def batch_convert_weak_perspective_to_camera_translation(cam_wp, focal_length, resolution):
    """Batched weak-perspective -> camera translation, vectorised (reference :69-85).

    Works for both numpy and jnp inputs.
    :param cam_wp: (B, 3)
    :return: (B, 3)
    """
    xp = jnp if isinstance(cam_wp, jnp.ndarray) else np
    cam_tz = 2 * focal_length / (resolution * cam_wp[:, 0] + 1e-9)
    return xp.stack([cam_wp[:, 1], cam_wp[:, 2], cam_tz], axis=-1)
