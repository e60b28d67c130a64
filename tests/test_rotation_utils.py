"""Golden-value tests for rotation utilities against numpy/scipy oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import (
    rot6d_to_rotmat, rotmat_to_rot6d, quat_to_rotmat, so3_exp, so3_log,
    aa_rotate_rotmats, aa_rotate_translate_points, batch_rodrigues,
)

RNG = np.random.RandomState(0)


def random_rotmats(n):
    return ScipyRotation.random(n, random_state=RNG).as_matrix().astype(np.float32)


def test_so3_exp_matches_scipy():
    rotvecs = RNG.randn(64, 3).astype(np.float32)
    R_ours = np.asarray(so3_exp(jnp.asarray(rotvecs)))
    R_scipy = ScipyRotation.from_rotvec(rotvecs).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)


def test_so3_exp_small_angle():
    rotvecs = (RNG.randn(16, 3) * 1e-6).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray(rotvecs)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)


def test_so3_log_roundtrip():
    rotvecs = RNG.randn(64, 3).astype(np.float32)
    # Keep away from the pi boundary where the axis sign is ambiguous.
    norms = np.linalg.norm(rotvecs, axis=-1, keepdims=True)
    rotvecs = rotvecs / norms * np.clip(norms, 0.0, 3.0)
    R = so3_exp(jnp.asarray(rotvecs))
    back = np.asarray(so3_log(R))
    np.testing.assert_allclose(back, rotvecs, atol=1e-3)


def test_so3_log_identity():
    out = np.asarray(so3_log(jnp.eye(3)[None]))
    np.testing.assert_allclose(out, np.zeros((1, 3)), atol=1e-7)


def test_so3_log_near_pi():
    axis = np.array([0.3, -0.5, 0.8])
    axis = axis / np.linalg.norm(axis)
    rotvec = (axis * (np.pi - 1e-4)).astype(np.float32)[None]
    R = so3_exp(jnp.asarray(rotvec))
    back = np.asarray(so3_log(R))
    R_back = np.asarray(so3_exp(jnp.asarray(back)))
    np.testing.assert_allclose(R_back, np.asarray(R), atol=1e-3)


def test_rot6d_roundtrip():
    R = random_rotmats(32)
    r6d = rotmat_to_rot6d(jnp.asarray(R))
    R_back = np.asarray(rot6d_to_rotmat(r6d))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_rot6d_gram_schmidt_orthonormal():
    x = RNG.randn(32, 6).astype(np.float32)
    R = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    eye = np.broadcast_to(np.eye(3), (32, 3, 3))
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_quat_to_rotmat_matches_scipy():
    q = RNG.randn(32, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R_ours = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w); ours is (w, x, y, z)
    R_scipy = ScipyRotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)


def test_aa_rotate_rotmats_pre_post():
    R = jnp.asarray(random_rotmats(8))
    axis = np.array([1.0, 0.0, 0.0])
    _, post = aa_rotate_rotmats(R, axis, np.pi / 3, rot_mult_order="post")
    _, pre = aa_rotate_rotmats(R, axis, np.pi / 3, rot_mult_order="pre")
    Rx = ScipyRotation.from_rotvec(axis * np.pi / 3).as_matrix().astype(np.float32)
    np.testing.assert_allclose(np.asarray(post), np.asarray(R) @ Rx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pre), Rx @ np.asarray(R), atol=1e-5)


def test_aa_rotate_translate_points():
    pts = RNG.randn(4, 10, 3).astype(np.float32)
    axis = np.array([1.0, 0.0, 0.0], dtype=np.float32)
    t = np.array([0.5, -1.0, 2.0], dtype=np.float32)
    out = np.asarray(aa_rotate_translate_points(jnp.asarray(pts), axis, np.pi, t))
    R = ScipyRotation.from_rotvec(axis * np.pi).as_matrix()
    expected = pts @ R.T + t
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_batch_rodrigues_multi_batch_dims():
    rotvecs = RNG.randn(4, 23, 3).astype(np.float32)
    R = np.asarray(batch_rodrigues(jnp.asarray(rotvecs)))
    R_flat = ScipyRotation.from_rotvec(rotvecs.reshape(-1, 3)).as_matrix()
    np.testing.assert_allclose(R, R_flat.reshape(4, 23, 3, 3), atol=1e-5)
