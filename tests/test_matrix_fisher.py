"""Matrix-Fisher normaliser/NLL tests vs scipy oracles and the PyTorch reference.

The reference implementation (losses/matrix_fisher_loss.py) is importable with
only torch installed, so we use it as a numerical parity oracle (test-time
only; no reference code is used in the framework itself).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import scipy.special
import pytest

from hierarchicalprobabilistic3dhuman_tpu.ops.matrix_fisher import (
    bessel0_exp_scaled, log_mf_norm_constant, matrix_fisher_nll,
)
from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import svd3x3

RNG = np.random.RandomState(7)

REFERENCE_PATH = "/root/reference"


def _reference_loss_module():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import importlib
    return importlib.import_module("losses.matrix_fisher_loss")


def random_proper_S(n, scale=5.0):
    """Random valid proper singular values: s0 >= s1 >= |s2|."""
    s = np.sort(RNG.rand(n, 3) * scale, axis=1)[:, ::-1]
    sign = np.where(RNG.rand(n) < 0.3, -1.0, 1.0)
    s[:, 2] *= sign
    return np.ascontiguousarray(s.astype(np.float32))


def test_bessel0_exp_scaled_vs_scipy():
    x = np.concatenate([np.linspace(0, 3.74, 100), np.linspace(3.76, 80, 100)]).astype(np.float32)
    ours = np.asarray(bessel0_exp_scaled(jnp.asarray(x)))
    oracle = scipy.special.i0e(x)
    np.testing.assert_allclose(ours, oracle, rtol=3e-4, atol=1e-6)


def test_log_norm_constant_vs_quadrature_oracle():
    """log c(S) against a high-resolution scipy quadrature of the exact integrand."""
    S = random_proper_S(16, scale=8.0)

    def cbar_oracle(s):
        def integrand(u):
            f1 = scipy.special.i0e((s[1] - s[2]) * 0.5 * (1 - u))
            f2 = scipy.special.i0e((s[1] + s[2]) * 0.5 * (1 + u))
            f3 = np.exp((s[2] + s[0]) * (u - 1))
            return f1 * f2 * f3
        val, _ = scipy.integrate.quad(integrand, -1, 1, limit=200)
        return 0.5 * val

    import scipy.integrate
    ours = np.asarray(log_mf_norm_constant(jnp.asarray(S)))
    oracle = np.array([np.log(cbar_oracle(s)) + s.sum() for s in S])
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_log_norm_constant_parity_with_reference():
    import torch
    ref = _reference_loss_module()
    S = random_proper_S(64)
    ours = np.asarray(log_mf_norm_constant(jnp.asarray(S)))
    theirs = ref.LogMFNormConstant.apply(torch.from_numpy(S)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_log_norm_constant_gradient_parity_with_reference():
    import torch
    ref = _reference_loss_module()
    S = random_proper_S(32)

    g_ours = np.asarray(jax.grad(lambda s: jnp.sum(log_mf_norm_constant(s)))(jnp.asarray(S)))

    S_t = torch.from_numpy(S).requires_grad_(True)
    ref.LogMFNormConstant.apply(S_t).sum().backward()
    g_ref = S_t.grad.numpy()
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-3, atol=1e-4)


def test_log_norm_constant_gradient_vs_finite_differences():
    S = jnp.asarray(random_proper_S(4, scale=3.0).astype(np.float64).astype(np.float32))
    f = lambda s: jnp.sum(log_mf_norm_constant(s))
    g = np.asarray(jax.grad(f)(S))
    eps = 1e-3
    for i in range(4):
        for k in range(3):
            Sp = S.at[i, k].add(eps)
            Sm = S.at[i, k].add(-eps)
            fd = (float(f(Sp)) - float(f(Sm))) / (2 * eps)
            assert abs(fd - g[i, k]) < 5e-2, (i, k, fd, g[i, k])


def test_nll_parity_with_reference():
    import torch
    ref = _reference_loss_module()
    F = RNG.randn(32, 3, 3).astype(np.float32) * 2.0
    from scipy.spatial.transform import Rotation as SR
    R_target = SR.random(32, random_state=RNG).as_matrix().astype(np.float32)

    U, S, V = svd3x3(jnp.asarray(F))
    ours = np.asarray(matrix_fisher_nll(jnp.asarray(F), U, S, V,
                                        jnp.asarray(R_target), overreg=1.005))

    Ft = torch.from_numpy(F)
    Ut, St, Vt = torch.svd(Ft)
    theirs = ref.matrix_fisher_nll(Ft, Ut, St, Vt, torch.from_numpy(R_target),
                                   overreg=1.005).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_nll_minimised_at_mode():
    """For fixed F, NLL of the mode rotation is lower than random rotations."""
    from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import proper_svd3x3
    from scipy.spatial.transform import Rotation as SR
    F = (np.eye(3) * 4.0 + RNG.randn(8, 3, 3)).astype(np.float32)
    out = proper_svd3x3(jnp.asarray(F))
    U, S, V = svd3x3(jnp.asarray(F))
    nll_mode = np.asarray(matrix_fisher_nll(jnp.asarray(F), U, S, V, out["mode"]))
    R_rand = jnp.asarray(SR.random(8, random_state=RNG).as_matrix().astype(np.float32))
    nll_rand = np.asarray(matrix_fisher_nll(jnp.asarray(F), U, S, V, R_rand))
    assert np.all(nll_mode <= nll_rand + 1e-5)


def test_nll_gradients_finite():
    F = jnp.asarray((np.eye(3) + 0.1 * RNG.randn(4, 23, 3, 3)).astype(np.float32))
    from scipy.spatial.transform import Rotation as SR
    R_t = jnp.asarray(SR.random(4 * 23, random_state=RNG).as_matrix()
                      .reshape(4, 23, 3, 3).astype(np.float32))

    def loss(F):
        U, S, V = svd3x3(F)
        return jnp.mean(matrix_fisher_nll(F, U, S, V, R_t))

    g = jax.grad(loss)(F)
    assert np.all(np.isfinite(np.asarray(g)))
