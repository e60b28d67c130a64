"""3x3 Jacobi SVD vs numpy LAPACK oracle + proper-SVD convention tests."""

import numpy as np
import jax
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import svd3x3, proper_svd3x3, det3x3

RNG = np.random.RandomState(1)


def _check_svd(F, atol=1e-4):
    U, S, V = svd3x3(jnp.asarray(F))
    U, S, V = np.asarray(U), np.asarray(S), np.asarray(V)
    # Reconstruction
    recon = U @ (S[..., :, None] * np.swapaxes(V, -1, -2))
    np.testing.assert_allclose(recon, F, atol=atol)
    # Orthogonality
    eye = np.broadcast_to(np.eye(3), U.shape)
    np.testing.assert_allclose(U @ np.swapaxes(U, -1, -2), eye, atol=atol)
    np.testing.assert_allclose(V @ np.swapaxes(V, -1, -2), eye, atol=atol)
    # Singular values match LAPACK, descending, non-negative
    S_np = np.linalg.svd(F, compute_uv=False)
    np.testing.assert_allclose(S, S_np, atol=atol)
    assert np.all(S >= 0)
    assert np.all(np.diff(S, axis=-1) <= 1e-5)


def test_svd_random():
    _check_svd(RNG.randn(128, 3, 3).astype(np.float32))


def test_svd_multi_batch_dims():
    _check_svd(RNG.randn(4, 23, 3, 3).astype(np.float32))


def test_svd_near_identity():
    # The model's DELTA_I init regime: F ~ I + small noise.
    F = np.eye(3)[None] + RNG.randn(64, 3, 3).astype(np.float32) * 1e-3
    _check_svd(F.astype(np.float32))


def test_svd_exact_identity_and_zero():
    F = np.stack([np.eye(3, dtype=np.float32), np.zeros((3, 3), np.float32)])
    U, S, V = svd3x3(jnp.asarray(F))
    recon = np.asarray(U) @ (np.asarray(S)[..., :, None] * np.swapaxes(np.asarray(V), -1, -2))
    np.testing.assert_allclose(recon, F, atol=1e-5)
    eye = np.broadcast_to(np.eye(3), (2, 3, 3))
    np.testing.assert_allclose(np.asarray(U) @ np.swapaxes(np.asarray(U), -1, -2), eye, atol=1e-5)


def test_svd_rank_deficient():
    a = RNG.randn(32, 3, 1).astype(np.float32)
    b = RNG.randn(32, 1, 3).astype(np.float32)
    F = a @ b  # rank 1
    _check_svd(F, atol=2e-4)


def test_svd_negative_det():
    F = RNG.randn(64, 3, 3).astype(np.float32)
    F = np.where(np.linalg.det(F)[:, None, None] > 0, -F, F)  # all det < 0
    U, S, V = svd3x3(jnp.asarray(F))
    detUV = np.asarray(det3x3(U @ jnp.swapaxes(V, -1, -2)))
    np.testing.assert_allclose(np.abs(detUV), np.ones(64), atol=1e-4)
    assert np.all(detUV < 0)  # det(F) < 0 => det(UV^T) = -1


def test_proper_svd_convention():
    F = RNG.randn(64, 3, 3).astype(np.float32)
    out = proper_svd3x3(jnp.asarray(F))
    Up, Sp, Vp = np.asarray(out["U_proper"]), np.asarray(out["S_proper"]), np.asarray(out["V_proper"])
    # U_proper, V_proper are rotations
    np.testing.assert_allclose(np.linalg.det(Up), np.ones(64), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(Vp), np.ones(64), atol=1e-4)
    # Reconstruction with proper parts still gives F
    recon = Up @ (Sp[..., :, None] * np.swapaxes(Vp, -1, -2))
    np.testing.assert_allclose(recon, F, atol=2e-4)
    # Mode is a rotation
    mode = np.asarray(out["mode"])
    np.testing.assert_allclose(np.linalg.det(mode), np.ones(64), atol=1e-4)
    # S_proper: first two entries >= |third|
    assert np.all(Sp[:, 0] >= np.abs(Sp[:, 2]) - 1e-5)
    assert np.all(Sp[:, 1] >= np.abs(Sp[:, 2]) - 1e-5)


def test_svd_gradients_finite():
    def loss(F):
        U, S, V = svd3x3(F)
        return jnp.sum(S) + jnp.sum(U @ jnp.swapaxes(V, -1, -2))

    F = jnp.asarray(RNG.randn(8, 3, 3).astype(np.float32))
    g = jax.grad(loss)(F)
    assert np.all(np.isfinite(np.asarray(g)))

    # Gradient of sum(S) w.r.t. F should match the analytic dS = U^T dF V diag.
    U, S, V = svd3x3(F)
    analytic = np.asarray(U) @ np.broadcast_to(np.eye(3), (8, 3, 3)) @ np.swapaxes(np.asarray(V), -1, -2)
    g_s_only = np.asarray(jax.grad(lambda F: jnp.sum(svd3x3(F)[1]))(F))
    np.testing.assert_allclose(g_s_only, analytic, atol=1e-3)


def test_svd_gradients_at_identity_finite():
    F = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    g = jax.grad(lambda F: jnp.sum(svd3x3(F)[1]))(F)
    assert np.all(np.isfinite(np.asarray(g)))


def test_det3x3():
    M = RNG.randn(32, 3, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(det3x3(jnp.asarray(M))), np.linalg.det(M), rtol=1e-4, atol=1e-5)
