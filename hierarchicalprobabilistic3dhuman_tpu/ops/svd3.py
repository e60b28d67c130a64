"""Batched differentiable 3x3 SVD for TPU, via one-sided Jacobi rotations.

The reference computes per-joint SVDs on the *CPU* inside its hot loop because
cuSOLVER is slow for tiny matrices (reference: models/poseMF_shapeGaussian_net.py:137-141,
utils/sampling_utils.py:104-111, losses/matrix_fisher_loss.py:221-224). On TPU,
LAPACK callbacks are worse still — so this module implements the SVD as a
fixed-iteration, branch-free one-sided Jacobi sweep in pure jnp:

  * fully vectorised over arbitrary leading batch dims (vmap-free broadcasting);
  * statically unrolled (XLA fuses the whole thing into one kernel);
  * differentiable by autodiff through the iterations (gradients agree with the
    analytic SVD differential once converged);
  * "proper" SVD convention (sign of det folded into the 3rd column/value)
    matching the reference bit-for-bit in spirit.

One-sided Jacobi orthogonalises the *columns* of F by right rotations, which
avoids forming F^T F (no condition-number squaring).
"""

import numpy as np
import jax
import jax.numpy as jnp

_TINY = 1e-30


def _jacobi_rotation(a_pp, a_qq, a_pq):
    """cos/sin of the rotation angle orthogonalising columns p, q.

    theta = 0.5 * atan2(2 c, a - b). Inputs are sanitised so that the exact
    degenerate point (c == 0, a == b) has zero angle and *finite* gradients
    (the classic double-where trick).
    """
    num = 2.0 * a_pq
    den = a_pp - a_qq
    degenerate = (jnp.abs(num) < _TINY) & (jnp.abs(den) < _TINY)
    num_safe = jnp.where(degenerate, 0.0, num)
    den_safe = jnp.where(degenerate, 1.0, den)
    theta = 0.5 * jnp.arctan2(num_safe, den_safe)
    return jnp.cos(theta), jnp.sin(theta)


def _apply_right_rotation(A, p, q, c, s):
    """A <- A @ G(p, q, theta) for batched (..., 3, 3) A; c/s are (...,)."""
    col_p = A[..., :, p]
    col_q = A[..., :, q]
    new_p = c[..., None] * col_p + s[..., None] * col_q
    new_q = -s[..., None] * col_p + c[..., None] * col_q
    A = A.at[..., :, p].set(new_p)
    return A.at[..., :, q].set(new_q)


def svd3x3(F, n_sweeps=8):
    """SVD of batched 3x3 matrices: F = U @ diag(S) @ V^T.

    :param F: (..., 3, 3)
    :param n_sweeps: number of full Jacobi sweeps (statically unrolled).
    :return: U (..., 3, 3) orthogonal, S (..., 3) non-negative descending,
             V (..., 3, 3) orthogonal. Same sign conventions as LAPACK up to
             the usual per-column sign ambiguity.
    """
    A = F
    V = jnp.broadcast_to(jnp.eye(3, dtype=F.dtype), F.shape)

    def sweep(_, carry):
        A, V = carry
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            a_pp = jnp.sum(A[..., :, p] * A[..., :, p], axis=-1)
            a_qq = jnp.sum(A[..., :, q] * A[..., :, q], axis=-1)
            a_pq = jnp.sum(A[..., :, p] * A[..., :, q], axis=-1)
            c, s = _jacobi_rotation(a_pp, a_qq, a_pq)
            A = _apply_right_rotation(A, p, q, c, s)
            V = _apply_right_rotation(V, p, q, c, s)
        return A, V

    # fori_loop keeps the XLA graph small (one sweep body, not n_sweeps
    # unrolled copies x 23 joints x VJP); static trip count stays
    # reverse-mode differentiable.
    A, V = jax.lax.fori_loop(0, n_sweeps, sweep, (A, V))

    # Singular values = column norms of converged A = U diag(S).
    S = jnp.sqrt(jnp.maximum(jnp.sum(A * A, axis=-2), 0.0))  # (..., 3)

    # Sort descending; permute columns of A and V identically.
    order = jnp.argsort(-S, axis=-1)  # (..., 3)
    S = jnp.take_along_axis(S, order, axis=-1)
    A = jnp.take_along_axis(A, order[..., None, :], axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)

    # U columns: normalise A's columns; rebuild degenerate directions
    # orthogonally (rank-deficient F). eps-guards keep gradients finite.
    eps = 1e-12
    u0_raw = A[..., :, 0]
    u0_norm = jnp.linalg.norm(u0_raw, axis=-1, keepdims=True)
    e0 = jnp.zeros_like(u0_raw).at[..., 0].set(1.0)
    u0 = jnp.where(u0_norm > eps, u0_raw / jnp.maximum(u0_norm, eps), e0)

    u1_raw = A[..., :, 1]
    u1_ortho = u1_raw - jnp.sum(u0 * u1_raw, axis=-1, keepdims=True) * u0
    u1_norm = jnp.linalg.norm(u1_ortho, axis=-1, keepdims=True)
    # Fallback: any unit vector orthogonal to u0.
    fallback1_a = jnp.stack([-u0[..., 1], u0[..., 0], jnp.zeros_like(u0[..., 0])], axis=-1)
    fallback1_b = jnp.stack([jnp.zeros_like(u0[..., 0]), -u0[..., 2], u0[..., 1]], axis=-1)
    use_a = (jnp.linalg.norm(fallback1_a, axis=-1, keepdims=True) > 0.1)
    fallback1 = jnp.where(use_a, fallback1_a, fallback1_b)
    fallback1 = fallback1 / jnp.maximum(jnp.linalg.norm(fallback1, axis=-1, keepdims=True), eps)
    u1 = jnp.where(u1_norm > eps, u1_ortho / jnp.maximum(u1_norm, eps), fallback1)

    cross01 = jnp.cross(u0, u1)
    u2_raw = A[..., :, 2]
    # Keep the sign of the true 3rd column when it is meaningful; otherwise +cross.
    sign = jnp.where(jnp.sum(cross01 * u2_raw, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    u2 = cross01 * sign

    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, S, V


def det3x3(M):
    """Determinant of batched 3x3 matrices, closed form (no LAPACK)."""
    return (M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
            - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
            + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0]))


def _properize(U, S, V):
    """Fold det signs into the 3rd column/value (reference convention:
    models/poseMF_shapeGaussian_net.py:143-152, utils/sampling_utils.py:104-111)."""
    detU = det3x3(U)
    detV = det3x3(V)
    U_proper = U.at[..., :, 2].multiply(detU[..., None])
    V_proper = V.at[..., :, 2].multiply(detV[..., None])
    S_proper = S.at[..., 2].multiply(detU * detV)
    mode = U_proper @ jnp.swapaxes(V_proper, -1, -2)
    return {
        "U": U, "S": S, "V": V,
        "U_proper": U_proper, "S_proper": S_proper, "V_proper": V_proper,
        "mode": mode,
    }


def proper_svd3x3(F, n_sweeps=8):
    """SVD with the reference's "proper" rotation convention.

    U_proper / V_proper are guaranteed rotation matrices (det = +1) and the
    third singular value carries the sign det(U)det(V) (reference:
    models/poseMF_shapeGaussian_net.py:143-152, utils/sampling_utils.py:104-111).

    :return: dict with U, S, V (raw SVD), U_proper, S_proper, V_proper, and
             mode = U_proper @ V_proper^T (the distribution's mode rotation).
    """
    U, S, V = svd3x3(F, n_sweeps=n_sweeps)
    return _properize(U, S, V)


def _np_svd3(F):
    """Host LAPACK (gesdd) SVD — sign conventions match torch.svd ~98% of the
    time on generic matrices (both follow the netlib gesdd algorithm)."""
    U, S, Vh = np.linalg.svd(np.asarray(F))
    return (U.astype(F.dtype), S.astype(F.dtype),
            np.swapaxes(Vh, -1, -2).astype(F.dtype))


def svd3x3_lapack(F):
    """SVD via a host LAPACK callback — LAPACK column-sign conventions.

    Use case: inference with checkpoints converted from the torch reference.
    The reference trained its hierarchical pose head on LAPACK gesdd outputs
    (torch.svd on CPU, models/poseMF_shapeGaussian_net.py:137-141), whose
    U/V column signs are algorithm-defined; the on-device Jacobi kernel
    (svd3x3) makes different sign choices, so deeper kinematic levels see
    different MLP inputs. This callback reproduces the LAPACK signs so
    converted checkpoints match the reference end-to-end (quantified in
    tests/test_svd_sign_parity.py).

    NOT differentiable and pays a host round-trip per call — use only for
    converted-checkpoint inference/eval, never in the training hot path.
    """
    batch = F.shape[:-2]
    flat_shape = (int(np.prod(batch)) if batch else 1, 3, 3)
    flat = F.reshape(flat_shape)
    out_shapes = (jax.ShapeDtypeStruct(flat_shape, F.dtype),
                  jax.ShapeDtypeStruct(flat_shape[:2], F.dtype),
                  jax.ShapeDtypeStruct(flat_shape, F.dtype))
    U, S, V = jax.pure_callback(_np_svd3, out_shapes, flat,
                                vmap_method="sequential")
    return (U.reshape(F.shape), S.reshape(batch + (3,)), V.reshape(F.shape))


def proper_svd3x3_lapack(F):
    """proper_svd3x3 with LAPACK sign conventions via HOST CALLBACK.

    Kept as the bit-exact numpy oracle for tests; production code should
    use proper_svd3x3_gesdd (device-native, same signs, works on backends
    that reject host callbacks)."""
    U, S, V = svd3x3_lapack(F)
    return _properize(U, S, V)


def proper_svd3x3_gesdd(F):
    """proper_svd3x3 with LAPACK gesdd sign conventions, DEVICE-NATIVE.

    A faithful jnp re-implementation of sgesdd's 3x3 path (see
    ops/lapack_svd3.py): no host round-trip, jittable on every backend
    including TPU runtimes that reject callbacks (axon). Matches
    np.linalg.svd signs on ~98% of generic inputs; the remainder are pure
    column-sign flips at fp branch boundaries. Use for converted-checkpoint
    inference/eval parity (reference models/poseMF_shapeGaussian_net.py:137-152);
    not differentiable — training uses proper_svd3x3."""
    from hierarchicalprobabilistic3dhuman_tpu.ops.lapack_svd3 import (
        svd3x3_gesdd)
    U, S, V = svd3x3_gesdd(F)
    return _properize(U, S, V)


_LAPACK_SUPPORT = None


def lapack_mode_supported():
    """Probe whether the current backend supports host callbacks.

    Some TPU runtimes (measured: the axon PJRT tunnel) reject
    jax.pure_callback outright ("does not support host send/recv
    callbacks"), so svd_impl='lapack' cannot execute there at all. CLIs
    call this to fall back to the Jacobi kernel with a loud warning instead
    of crashing mid-evaluation; converted-checkpoint parity runs in lapack
    mode should use the CPU backend (JAX_PLATFORMS=cpu), where the callback
    is native. Result cached per process.
    """
    global _LAPACK_SUPPORT
    if _LAPACK_SUPPORT is None:
        try:
            probe = jax.jit(svd3x3_lapack)(jnp.eye(3)[None])
            jax.block_until_ready(probe)
            _LAPACK_SUPPORT = True
        except Exception:
            _LAPACK_SUPPORT = False
    return _LAPACK_SUPPORT
