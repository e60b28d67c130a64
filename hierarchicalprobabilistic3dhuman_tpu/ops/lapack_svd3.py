"""Device-native LAPACK-sign-exact 3x3 SVD: a faithful jnp re-implementation
of sgesdd's 3x3 path (LAPACK 3.12 as shipped in OpenBLAS 0.3.27).

Why this exists: the torch reference computes per-joint SVDs with torch.svd
on CPU (LAPACK gesdd — reference models/poseMF_shapeGaussian_net.py:137-141)
and feeds the resulting U_proper COLUMNS into the child joints' MLPs. gesdd's
U/V column signs are algorithm-path-defined, so converted reference
checkpoints only reproduce the reference when the rebuilt model makes the
SAME sign choices. The host-callback route (ops/svd3.py svd3x3_lapack)
cannot execute on TPU runtimes that reject host callbacks (measured: axon
PJRT), and benchmarks/svd_parity_mm.py measured the sign divergence of the
default Jacobi kernel at 1-13 mm on final eval metrics — material. This
module reproduces the gesdd signs ON DEVICE, in pure jnp:

    sgebd2 (Householder bidiagonalisation, dlarfg sign convention)
      -> sbdsqr (implicit-shift bidiagonal QR: dlartg 3.11+ convention,
                 dlas2 shifts, dlasv2 2x2 deflation, netlib deflation order,
                 relative-accuracy thresholds with slamch f32 constants)
      -> U = Q @ U_b, V^T = VT_b @ P^T, netlib's final sign/sort pass.

Measured agreement with np.linalg.svd (the exact sgesdd this emulates),
signs included: 97-99% of generic 3x3 matrices across input scales
(tests/test_lapack_svd3.py); every residual mismatch is a pure column-sign
flip from a floating-point branch decision at a tolerance boundary — the
same order of residual as the host callback itself shows vs torch.svd
(~98%, tests/test_svd_sign_parity.py).

Control flow: everything below n=3 specialises hard. A bidiagonal QR sweep
can only happen on the FULL 3x3 block (a 2-wide block deflates via dlasv2,
1-wide is converged), so the main loop's per-lane cases are exactly
{deflate-bottom, split-top + 2x2, 2x2, converged, full-3x3 sweep}, each a
masked vector update — one lax.while_loop, all lanes in lockstep, no host
round-trips, batched over arbitrary leading dims.

NOT differentiable (inference/eval only — training uses ops/svd3.svd3x3).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# slamch constants for f32 (the model runs f32; numpy f32 svd -> sgesdd).
_EPS = np.float32(2.0 ** -24)           # slamch('E')
_UNFL = np.float32(1.1754943508222875e-38)  # slamch('S')
_MAXITR = 6
_N = 3
# tolmul = max(10, min(100, eps**-0.125)) = 10 for f32; tol = tolmul*eps.
_TOL = np.float32(10.0) * _EPS
_MAXIT = _MAXITR * _N * _N


def _sign1(x):
    """Fortran SIGN(1, x): +-1 by the SIGN BIT (so sign(1, -0.0) = -1)."""
    return jnp.where(jnp.signbit(x), -1.0, 1.0).astype(x.dtype)


def _fsign(a, b):
    """Fortran SIGN(a, b) = |a| * sign-bit(b)."""
    return jnp.abs(a) * _sign1(b)


def _lartg(f, g):
    """LAPACK 3.11+ s/dlartg: c = |f|/d, r = sign(f)*d, s = g/r.

    Returns (c, s, r), elementwise over same-shape f, g."""
    d = jnp.sqrt(f * f + g * g)
    d_safe = jnp.where(d > 0, d, 1.0)
    c = jnp.abs(f) / d_safe
    r = _fsign(d, f)
    r_safe = jnp.where(r != 0, r, 1.0)
    s = g / r_safe
    # f == 0 branch: c = 0, s = sign(1, g), r = |g|
    f0 = f == 0
    c = jnp.where(f0, 0.0, c)
    s = jnp.where(f0, _sign1(g), s)
    r = jnp.where(f0, jnp.abs(g), r)
    # g == 0 branch (takes precedence): c = 1, s = 0, r = f
    g0 = g == 0
    c = jnp.where(g0, 1.0, c)
    s = jnp.where(g0, 0.0, s)
    r = jnp.where(g0, f, r)
    return c, s, r


def _las2(f, g, h):
    """slas2: singular values of [[f, g], [0, h]] -> (ssmin, ssmax)."""
    fa, ga, ha = jnp.abs(f), jnp.abs(g), jnp.abs(h)
    fhmn = jnp.minimum(fa, ha)
    fhmx = jnp.maximum(fa, ha)
    fhmx_safe = jnp.where(fhmx > 0, fhmx, 1.0)
    ga_safe = jnp.where(ga > 0, ga, 1.0)

    # Branch A: fhmn == 0
    mn = jnp.minimum(fhmx, ga)
    mx = jnp.maximum(fhmx, ga)
    mx_safe = jnp.where(mx > 0, mx, 1.0)
    ssmax_a = jnp.where(fhmx == 0, ga,
                        mx * jnp.sqrt(1.0 + (mn / mx_safe) ** 2))
    # Branch B: ga < fhmx
    as_ = 1.0 + fhmn / fhmx_safe
    at = (fhmx - fhmn) / fhmx_safe
    au_b = (ga / fhmx_safe) ** 2
    c_b = 2.0 / (jnp.sqrt(as_ * as_ + au_b) + jnp.sqrt(at * at + au_b))
    ssmin_b = fhmn * c_b
    ssmax_b = fhmx / jnp.where(c_b > 0, c_b, 1.0)
    # Branch C: ga >= fhmx
    au_c = fhmx / ga_safe
    # C1: au == 0
    ssmin_c1 = fhmn * fhmx / ga_safe
    ssmax_c1 = ga
    # C2
    c_c = 1.0 / (jnp.sqrt(1.0 + (as_ * au_c) ** 2)
                 + jnp.sqrt(1.0 + (at * au_c) ** 2))
    ssmin_c2 = fhmn * c_c * au_c
    ssmin_c2 = ssmin_c2 + ssmin_c2
    ssmax_c2 = ga / (c_c + c_c)
    ssmin_c = jnp.where(au_c == 0, ssmin_c1, ssmin_c2)
    ssmax_c = jnp.where(au_c == 0, ssmax_c1, ssmax_c2)

    ssmin = jnp.where(fhmn == 0, 0.0,
                      jnp.where(ga < fhmx, ssmin_b, ssmin_c))
    ssmax = jnp.where(fhmn == 0, ssmax_a,
                      jnp.where(ga < fhmx, ssmax_b, ssmax_c))
    return ssmin, ssmax


def _lasv2(f, g, h):
    """slasv2: SVD of [[f, g], [0, h]] with LAPACK sign conventions.

    Returns (ssmin, ssmax, snr, csr, snl, csl), elementwise."""
    ft, fa = f, jnp.abs(f)
    ht, ha = h, jnp.abs(h)
    swap = ha > fa
    ft, ht = jnp.where(swap, ht, ft), jnp.where(swap, ft, ht)
    fa, ha = jnp.where(swap, ha, fa), jnp.where(swap, fa, ha)
    gt, ga = g, jnp.abs(g)
    # pmax: 1 = F, 2 = G, 3 = H
    pmax = jnp.where(swap, 3, 1)
    pmax = jnp.where((ga != 0) & (ga > fa), 2, pmax)

    fa_safe = jnp.where(fa > 0, fa, 1.0)
    ga_safe = jnp.where(ga > 0, ga, 1.0)
    ft_safe = jnp.where(ft != 0, ft, 1.0)
    gt_safe = jnp.where(gt != 0, gt, 1.0)

    gasmal = ~((ga > fa) & ((fa / ga_safe) < _EPS))

    # --- gasmal = False path (ga overwhelmingly large) ---
    ssmax_big = ga
    ssmin_big = jnp.where(ha > 1.0, fa / (ga_safe / jnp.where(ha > 0, ha, 1.0)),
                          (fa / ga_safe) * ha)
    clt_big = jnp.ones_like(f)
    slt_big = ht / gt_safe
    srt_big = jnp.ones_like(f)
    crt_big = ft / gt_safe

    # --- gasmal = True path ---
    d_ = fa - ha
    l = jnp.where(d_ == fa, 1.0, d_ / fa_safe)
    m_ = gt / ft_safe
    t = 2.0 - l
    mm = m_ * m_
    tt = t * t
    s_ = jnp.sqrt(tt + mm)
    r_ = jnp.where(l == 0, jnp.abs(m_), jnp.sqrt(l * l + mm))
    a = 0.5 * (s_ + r_)
    a_safe = jnp.where(a > 0, a, 1.0)
    ssmin_sm = ha / a_safe
    ssmax_sm = fa * a
    # t update
    t_mm0 = jnp.where(l == 0,
                      _fsign(jnp.full_like(f, 2.0), ft) * _sign1(gt),
                      gt / jnp.where(_fsign(d_, ft) != 0, _fsign(d_, ft), 1.0)
                      + m_ / jnp.where(t != 0, t, 1.0))
    t_mm1 = (m_ / (s_ + t) + m_ / (r_ + l)) * (1.0 + a)
    t2 = jnp.where(mm == 0, t_mm0, t_mm1)
    l2 = jnp.sqrt(t2 * t2 + 4.0)
    crt_sm = 2.0 / l2
    srt_sm = t2 / l2
    clt_sm = (crt_sm + srt_sm * m_) / a_safe
    slt_sm = (ht / ft_safe) * srt_sm / a_safe

    crt = jnp.where(gasmal, crt_sm, crt_big)
    srt = jnp.where(gasmal, srt_sm, srt_big)
    clt = jnp.where(gasmal, clt_sm, clt_big)
    slt = jnp.where(gasmal, slt_sm, slt_big)
    ssmin = jnp.where(gasmal, ssmin_sm, ssmin_big)
    ssmax = jnp.where(gasmal, ssmax_sm, ssmax_big)

    # --- ga == 0 path: diagonal matrix ---
    ga0 = ga == 0
    ssmin = jnp.where(ga0, ha, ssmin)
    ssmax = jnp.where(ga0, fa, ssmax)
    clt = jnp.where(ga0, 1.0, clt)
    crt = jnp.where(ga0, 1.0, crt)
    slt = jnp.where(ga0, 0.0, slt)
    srt = jnp.where(ga0, 0.0, srt)

    csl = jnp.where(swap, srt, clt)
    snl = jnp.where(swap, crt, slt)
    csr = jnp.where(swap, slt, crt)
    snr = jnp.where(swap, clt, srt)

    tsign = jnp.where(pmax == 1, _sign1(csr) * _sign1(csl) * _sign1(f),
                      jnp.where(pmax == 2,
                                _sign1(snr) * _sign1(csl) * _sign1(g),
                                _sign1(snr) * _sign1(snl) * _sign1(h)))
    ssmax = _fsign(ssmax, tsign)
    ssmin = _fsign(ssmin, tsign * _sign1(f) * _sign1(h))
    return ssmin, ssmax, snr, csr, snl, csl


def _larfg(alpha, x):
    """sdlarfg over the trailing axis: returns (beta, v_tail, tau)."""
    xnorm = jnp.sqrt(jnp.sum(x * x, axis=-1))
    norm = jnp.sqrt(alpha * alpha + xnorm * xnorm)
    beta = -_fsign(norm, alpha)
    denom = alpha - beta
    denom_safe = jnp.where(denom != 0, denom, 1.0)
    v = x / denom_safe[..., None]
    beta_safe = jnp.where(beta != 0, beta, 1.0)
    tau = (beta - alpha) / beta_safe
    trivial = xnorm == 0
    beta = jnp.where(trivial, alpha, beta)
    tau = jnp.where(trivial, 0.0, tau)
    v = jnp.where(trivial[..., None], x, v)
    return beta, v, tau


def _gebd2(A):
    """Batched 3x3 upper bidiagonalisation (sgebd2 order of operations).

    :param A: (N, 3, 3)
    :return: d (N, 3), e (N, 2), Q (N, 3, 3), P (N, 3, 3) with Q^T A P = B.
    """
    N = A.shape[0]
    dt = A.dtype

    def apply_left(A, v, tau):
        # A := (I - tau v v^T) A
        w = tau[:, None] * jnp.einsum("ni,nij->nj", v, A)
        return A - v[..., None] * w[:, None, :]

    def apply_right(A, u, tau):
        # A := A (I - tau u u^T)
        w = tau[:, None] * jnp.einsum("nij,nj->ni", A, u)
        return A - w[..., None] * u[:, None, :]

    # i = 0: left reflector on A[:, 0:3, 0]
    beta0, vt0, tq0 = _larfg(A[:, 0, 0], A[:, 1:, 0])
    d0 = beta0
    v0 = jnp.concatenate([jnp.ones((N, 1), dt), vt0], axis=-1)
    A = apply_left(A, v0, tq0)
    # right reflector on A[:, 0, 1:3]
    beta, ut0, tp0 = _larfg(A[:, 0, 1], A[:, 0, 2:])
    e0 = beta
    u0 = jnp.concatenate([jnp.zeros((N, 1), dt), jnp.ones((N, 1), dt), ut0],
                         axis=-1)
    A = apply_right(A, u0, tp0)
    # i = 1: left reflector on A[:, 1:3, 1]
    beta1, vt1, tq1 = _larfg(A[:, 1, 1], A[:, 2:, 1])
    d1 = beta1
    v1 = jnp.concatenate([jnp.zeros((N, 1), dt), jnp.ones((N, 1), dt), vt1],
                         axis=-1)
    A = apply_left(A, v1, tq1)
    # right reflector on A[:, 1, 2:3] is 1-long -> tau = 0, e1 = A[1, 2]
    e1 = A[:, 1, 2]
    # i = 2: left reflector on A[:, 2:3, 2] is 1-long -> tau = 0
    d2 = A[:, 2, 2]

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dt), (N, 3, 3))
    Q = apply_right(apply_right(eye, v0, tq0), v1, tq1)  # Q = H1 H2
    P = apply_right(eye, u0, tp0)                        # P = G1
    d = jnp.stack([d0, d1, d2], axis=-1)
    e = jnp.stack([e0, e1], axis=-1)
    return d, e, Q, P


def _rot_rows(VT, j, c, s, mask):
    """Left rotation on rows (j, j+1) of VT where mask (dlasr row op)."""
    x = VT[:, j, :]
    y = VT[:, j + 1, :]
    nx = s[:, None] * y + c[:, None] * x
    ny = c[:, None] * y - s[:, None] * x
    VT = VT.at[:, j, :].set(jnp.where(mask[:, None], nx, x))
    return VT.at[:, j + 1, :].set(jnp.where(mask[:, None], ny, y))


def _rot_cols(U, j, c, s, mask):
    """Right rotation on cols (j, j+1) of U where mask (dlasr col op)."""
    x = U[:, :, j]
    y = U[:, :, j + 1]
    nx = s[:, None] * y + c[:, None] * x
    ny = c[:, None] * y - s[:, None] * x
    U = U.at[:, :, j].set(jnp.where(mask[:, None], nx, x))
    return U.at[:, :, j + 1].set(jnp.where(mask[:, None], ny, y))


def _drot_rows(VT, j, c, s, mask):
    """DROT on rows (j, j+1): x' = c x + s y, y' = c y - s x."""
    x = VT[:, j, :]
    y = VT[:, j + 1, :]
    nx = c[:, None] * x + s[:, None] * y
    ny = c[:, None] * y - s[:, None] * x
    VT = VT.at[:, j, :].set(jnp.where(mask[:, None], nx, x))
    return VT.at[:, j + 1, :].set(jnp.where(mask[:, None], ny, y))


def _drot_cols(U, j, c, s, mask):
    x = U[:, :, j]
    y = U[:, :, j + 1]
    nx = c[:, None] * x + s[:, None] * y
    ny = c[:, None] * y - s[:, None] * x
    U = U.at[:, :, j].set(jnp.where(mask[:, None], nx, x))
    return U.at[:, :, j + 1].set(jnp.where(mask[:, None], ny, y))


def _bdsqr3(d, e, VT, U, thresh):
    """Batched sbdsqr('U', n=3) on (N,) lanes, netlib deflation order.

    :param d: (N, 3) diagonal, e: (N, 2) superdiagonal
    :param VT, U: (N, 3, 3) accumulators (start at identity)
    :param thresh: (N,) absolute negligibility threshold (from caller)
    :return: (d, VT, U) with d >= 0 descending, vectors rotated/sorted.
    """
    N = d.shape[0]
    i32 = jnp.int32

    state = dict(
        d=d, e=e, VT=VT, U=U,
        m=jnp.full((N,), 3, i32),
        oldll=jnp.full((N,), -1, i32),
        oldm=jnp.full((N,), -1, i32),
        idir=jnp.zeros((N,), i32),
        it=jnp.zeros((N,), i32),
    )

    def cond(st):
        return jnp.any((st["m"] > 1) & (st["it"] <= _MAXIT))

    def body(st):
        d, e, VT, U = st["d"], st["e"], st["VT"], st["U"]
        m, oldll, oldm = st["m"], st["oldll"], st["oldm"]
        idir, it = st["idir"], st["it"]
        d0, d1, d2 = d[:, 0], d[:, 1], d[:, 2]
        e0, e1 = e[:, 0], e[:, 1]
        active = (m > 1) & (it <= _MAXIT)

        # ---------- case m == 2 ----------
        m2 = active & (m == 2)
        m2_deflate = m2 & (jnp.abs(e0) <= thresh)
        m2_2x2 = m2 & ~m2_deflate

        # ---------- case m == 3 ----------
        m3 = active & (m == 3)
        m3_deflate_bot = m3 & (jnp.abs(e1) <= thresh)      # e1 -> 0, m = 2
        m3_split_top = m3 & ~m3_deflate_bot & (jnp.abs(e0) <= thresh)
        m3_full = m3 & ~m3_deflate_bot & ~m3_split_top

        # --- 2x2 dlasv2 blocks: (k, k+1) = (0, 1) for m2_2x2, (1, 2) for
        # m3_split_top. Compute both lanes' rotations, apply masked.
        sigmn_a, sigmx_a, snr_a, csr_a, snl_a, csl_a = _lasv2(d0, e0, d1)
        sigmn_b, sigmx_b, snr_b, csr_b, snl_b, csl_b = _lasv2(d1, e1, d2)

        # --- full 3x3 block (ll = 1, m = 3, 1-indexed) ---
        # smax over the whole block (find-block scan covers everything).
        smax = jnp.maximum(
            jnp.maximum(jnp.abs(d0), jnp.abs(d1)),
            jnp.maximum(jnp.abs(d2),
                        jnp.maximum(jnp.abs(e0), jnp.abs(e1))))
        new_block = (1 > oldm) | (3 < oldll)
        idir_full = jnp.where(new_block,
                              jnp.where(jnp.abs(d0) >= jnp.abs(d2), 1, 2),
                              idir)
        # convergence tests (may zero an e and skip the sweep)
        i1 = idir_full == 1
        # idir=1: bottom test then forward recurrence
        conv1_bot = jnp.abs(e1) <= _TOL * jnp.abs(d2)
        mu0 = jnp.abs(d0)
        conv1_f0 = jnp.abs(e0) <= _TOL * mu0
        mu1 = jnp.abs(d1) * (mu0 / (mu0 + jnp.abs(e0)))
        conv1_f1 = jnp.abs(e1) <= _TOL * mu1
        sminl_1 = jnp.minimum(mu0, jnp.minimum(mu1,
                  jnp.abs(d2) * (mu1 / (mu1 + jnp.abs(e1)))))
        # idir=2: top test then backward recurrence
        conv2_top = jnp.abs(e0) <= _TOL * jnp.abs(d0)
        nu0 = jnp.abs(d2)
        conv2_b1 = jnp.abs(e1) <= _TOL * nu0
        nu1 = jnp.abs(d1) * (nu0 / (nu0 + jnp.abs(e1)))
        conv2_b0 = jnp.abs(e0) <= _TOL * nu1
        sminl_2 = jnp.minimum(nu0, jnp.minimum(nu1,
                  jnp.abs(d0) * (nu1 / (nu1 + jnp.abs(e0)))))

        zero_e1_conv = m3_full & (i1 & (conv1_bot | (~conv1_f0 & conv1_f1)))
        zero_e0_conv = m3_full & ((i1 & ~conv1_bot & conv1_f0)
                                  | (~i1 & (conv2_top
                                            | (~conv2_b1 & conv2_b0))))
        zero_e1_conv = zero_e1_conv | (m3_full & ~i1 & ~conv2_top & conv2_b1)
        sweep = m3_full & ~zero_e1_conv & ~zero_e0_conv
        sminl = jnp.where(i1, sminl_1, sminl_2)

        # --- shift (only meaningful under `sweep`) ---
        shift1, _ = _las2(d1, e1, d2)   # idir = 1
        shift2, _ = _las2(d0, e0, d1)   # idir = 2
        sll = jnp.where(i1, jnp.abs(d0), jnp.abs(d2))
        shift = jnp.where(i1, shift1, shift2)
        smax_safe = jnp.where(smax > 0, smax, 1.0)
        use_zero = (_N * _TOL * (sminl / smax_safe)
                    <= jnp.maximum(_EPS, np.float32(0.01) * _TOL))
        sll_safe = jnp.where(sll > 0, sll, 1.0)
        shift = jnp.where(use_zero, 0.0,
                          jnp.where((sll > 0)
                                    & ((shift / sll_safe) ** 2 < _EPS),
                                    0.0, shift))
        zshift = shift == 0

        # ---- the four sweep variants (each = 2 Givens pairs). Compute all
        # four on every lane (cheap scalars), select with where. Sanitise
        # divisions in the shifted f-seed.
        d0s = jnp.where(d0 != 0, d0, 1.0)
        d2s = jnp.where(d2 != 0, d2, 1.0)

        # (a) zero shift, idir = 1
        cs_a1, sn_a1, r_a = _lartg(d0, e0)           # cs=1 initially
        ocs_a1, osn_a1, nd0_a = _lartg(r_a, d1 * sn_a1)
        cs_a2, sn_a2, r_a2 = _lartg(d1 * cs_a1, e1)
        ne0_a = osn_a1 * r_a2
        ocs_a2, osn_a2, nd1_a = _lartg(ocs_a1 * r_a2, d2 * sn_a2)
        h_a = d2 * cs_a2
        nd2_a = h_a * ocs_a2
        ne1_a = h_a * osn_a2

        # (b) nonzero shift, idir = 1
        f_b = (jnp.abs(d0) - shift) * (_sign1(d0) + shift / d0s)
        g_b = e0
        cr_b1, sr_b1, _r = _lartg(f_b, g_b)
        f_b = cr_b1 * d0 + sr_b1 * e0
        te0_b = cr_b1 * e0 - sr_b1 * d0
        g_b = sr_b1 * d1
        td1_b = cr_b1 * d1
        cl_b1, sl_b1, nd0_b = _lartg(f_b, g_b)
        f_b = cl_b1 * te0_b + sl_b1 * td1_b
        td1_b = cl_b1 * td1_b - sl_b1 * te0_b
        g_b = sl_b1 * e1
        te1_b = cl_b1 * e1
        cr_b2, sr_b2, ne0_b = _lartg(f_b, g_b)
        f_b = cr_b2 * td1_b + sr_b2 * te1_b
        te1_b = cr_b2 * te1_b - sr_b2 * td1_b
        g_b = sr_b2 * d2
        td2_b = cr_b2 * d2
        cl_b2, sl_b2, nd1_b = _lartg(f_b, g_b)
        f_b = cl_b2 * te1_b + sl_b2 * td2_b
        nd2_b = cl_b2 * td2_b - sl_b2 * te1_b
        ne1_b = f_b

        # (c) zero shift, idir = 2 (i runs 3 then 2)
        cs_c1, sn_c1, r_c = _lartg(d2, e1)
        ocs_c1, osn_c1, nd2_c = _lartg(r_c, d1 * sn_c1)
        cs_c2, sn_c2, r_c2 = _lartg(d1 * cs_c1, e0)
        ne1_c = osn_c1 * r_c2
        ocs_c2, osn_c2, nd1_c = _lartg(ocs_c1 * r_c2, d0 * sn_c2)
        h_c = d0 * cs_c2
        nd0_c = h_c * ocs_c2
        ne0_c = h_c * osn_c2
        # WORK idx 2 <- i=3 pair, idx 1 <- i=2 pair, with negated sines.

        # (d) nonzero shift, idir = 2
        f_d = (jnp.abs(d2) - shift) * (_sign1(d2) + shift / d2s)
        g_d = e1
        cr_d2, sr_d2, _r = _lartg(f_d, g_d)          # i = 3 pair
        f_d = cr_d2 * d2 + sr_d2 * e1
        te1_d = cr_d2 * e1 - sr_d2 * d2
        g_d = sr_d2 * d1
        td1_d = cr_d2 * d1
        cl_d2, sl_d2, nd2_d = _lartg(f_d, g_d)
        f_d = cl_d2 * te1_d + sl_d2 * td1_d
        td1_d = cl_d2 * td1_d - sl_d2 * te1_d
        g_d = sl_d2 * e0
        te0_d = cl_d2 * e0
        cr_d1, sr_d1, ne1_d = _lartg(f_d, g_d)       # i = 2 pair
        f_d = cr_d1 * td1_d + sr_d1 * te0_d
        te0_d = cr_d1 * te0_d - sr_d1 * td1_d
        g_d = sr_d1 * d0
        td0_d = cr_d1 * d0
        cl_d1, sl_d1, nd1_d = _lartg(f_d, g_d)
        f_d = cl_d1 * te0_d + sl_d1 * td0_d
        nd0_d = cl_d1 * td0_d - sl_d1 * te0_d
        ne0_d = f_d

        # --- select sweep results ---
        sw_z = sweep & zshift
        sw_s = sweep & ~zshift
        a_m = sw_z & i1
        b_m = sw_s & i1
        c_m = sw_z & ~i1
        dm_ = sw_s & ~i1

        def sel4(va, vb, vc, vd, old):
            out = jnp.where(a_m, va, old)
            out = jnp.where(b_m, vb, out)
            out = jnp.where(c_m, vc, out)
            return jnp.where(dm_, vd, out)

        nd0 = sel4(nd0_a, nd0_b, nd0_c, nd0_d, d0)
        nd1 = sel4(nd1_a, nd1_b, nd1_c, nd1_d, d1)
        nd2 = sel4(nd2_a, nd2_b, nd2_c, nd2_d, d2)
        ne0 = sel4(ne0_a, ne0_b, ne0_c, ne0_d, e0)
        ne1 = sel4(ne1_a, ne1_b, ne1_c, ne1_d, e1)
        # end-of-sweep negligibility: idir=1 zeroes e1, idir=2 zeroes e0
        ne1 = jnp.where((a_m | b_m) & (jnp.abs(ne1) <= thresh), 0.0, ne1)
        ne0 = jnp.where((c_m | dm_) & (jnp.abs(ne0) <= thresh), 0.0, ne0)

        # --- vector rotations for the sweep ---
        # VT row pairs: idir=1 -> 'F' order (rows01 then rows12) with
        # (cs/sn | cosr/sinr); idir=2 -> 'B' order (rows12 then rows01) with
        # (oldcs/-oldsn | cosl/-sinl).
        vt_c01 = sel4(cs_a1, cr_b1, ocs_c2, cl_d1, jnp.ones_like(d0))
        vt_s01 = sel4(sn_a1, sr_b1, -osn_c2, -sl_d1, jnp.zeros_like(d0))
        vt_c12 = sel4(cs_a2, cr_b2, ocs_c1, cl_d2, jnp.ones_like(d0))
        vt_s12 = sel4(sn_a2, sr_b2, -osn_c1, -sl_d2, jnp.zeros_like(d0))
        u_c01 = sel4(ocs_a1, cl_b1, cs_c2, cr_d1, jnp.ones_like(d0))
        u_s01 = sel4(osn_a1, sl_b1, -sn_c2, -sr_d1, jnp.zeros_like(d0))
        u_c12 = sel4(ocs_a2, cl_b2, cs_c1, cr_d2, jnp.ones_like(d0))
        u_s12 = sel4(osn_a2, sl_b2, -sn_c1, -sr_d2, jnp.zeros_like(d0))

        fwd = sweep & i1
        bwd = sweep & ~i1
        # forward order: (0,1) then (1,2); backward order: (1,2) then (0,1)
        VT = _rot_rows(VT, 0, vt_c01, vt_s01, fwd)
        VT = _rot_rows(VT, 1, vt_c12, vt_s12, fwd)
        VT = _rot_rows(VT, 1, vt_c12, vt_s12, bwd)
        VT = _rot_rows(VT, 0, vt_c01, vt_s01, bwd)
        U = _rot_cols(U, 0, u_c01, u_s01, fwd)
        U = _rot_cols(U, 1, u_c12, u_s12, fwd)
        U = _rot_cols(U, 1, u_c12, u_s12, bwd)
        U = _rot_cols(U, 0, u_c01, u_s01, bwd)

        # --- 2x2 dlasv2 applications ---
        VT = _drot_rows(VT, 0, csr_a, snr_a, m2_2x2)
        U = _drot_cols(U, 0, csl_a, snl_a, m2_2x2)
        VT = _drot_rows(VT, 1, csr_b, snr_b, m3_split_top)
        U = _drot_cols(U, 1, csl_b, snl_b, m3_split_top)

        # --- d/e updates for deflation cases ---
        nd0 = jnp.where(m2_2x2, sigmx_a, nd0)
        nd1 = jnp.where(m2_2x2, sigmn_a, nd1)
        nd1 = jnp.where(m3_split_top, sigmx_b, nd1)
        nd2 = jnp.where(m3_split_top, sigmn_b, nd2)
        ne0 = jnp.where(m2_deflate | m2_2x2 | m3_split_top
                        | zero_e0_conv, 0.0, ne0)
        ne1 = jnp.where(m3_deflate_bot | m3_split_top | zero_e1_conv,
                        0.0, ne1)

        # --- m updates ---
        nm = m
        nm = jnp.where(m2_deflate, 1, nm)
        nm = jnp.where(m2_2x2, 0, nm)
        nm = jnp.where(m3_deflate_bot, 2, nm)
        nm = jnp.where(m3_split_top, 1, nm)

        noldll = jnp.where(sweep, 1, oldll)
        noldm = jnp.where(sweep, 3, oldm)
        nidir = jnp.where(m3_full, idir_full, idir)
        nit = jnp.where(sweep, it + 2, it)
        # Inert lanes must not spin forever: bump `it` on non-sweep
        # iterations too, so `cond` terminates even if a lane wedges (a
        # masked no-op lane would otherwise hold the loop open — cannot
        # happen by construction, but the bound makes it provable).
        nit = jnp.where(active & ~sweep, nit + 1, nit)

        return dict(d=jnp.stack([nd0, nd1, nd2], axis=-1),
                    e=jnp.stack([ne0, ne1], axis=-1),
                    VT=VT, U=U, m=nm, oldll=noldll, oldm=noldm,
                    idir=nidir, it=nit)

    st = lax.while_loop(cond, body, state)
    d, VT, U = st["d"], st["VT"], st["U"]

    # --- make singular values positive (flip VT rows only; netlib 160) ---
    neg = d < 0
    d = jnp.abs(d)
    VT = jnp.where(neg[:, :, None], -VT, VT)

    # --- netlib's sort: selection of the SMALLEST among d(1..n+1-i), one
    # transposition per pass, `<=` scan order ---
    def pass_swap(d, VT, U, upto, tgt):
        # isub = argmin with <= semantics over d[:, :upto]
        isub = jnp.zeros((d.shape[0],), jnp.int32)
        smin = d[:, 0]
        for j in range(1, upto):
            take = d[:, j] <= smin
            isub = jnp.where(take, j, isub)
            smin = jnp.where(take, d[:, j], smin)
        do = isub != tgt
        # swap d[isub] <-> d[tgt], VT rows, U cols where `do`
        onehot = jax.nn.one_hot(isub, 3, dtype=d.dtype)       # (N, 3)
        d_tgt = d[:, tgt]
        d_new = jnp.where(onehot > 0, d_tgt[:, None], d)
        d_new = d_new.at[:, tgt].set(smin)
        d = jnp.where(do[:, None], d_new, d)
        vt_isub = jnp.einsum("nk,nkj->nj", onehot, VT)
        vt_tgt = VT[:, tgt, :]
        VT_new = jnp.where((onehot > 0)[:, :, None], vt_tgt[:, None, :], VT)
        VT_new = VT_new.at[:, tgt, :].set(vt_isub)
        VT = jnp.where(do[:, None, None], VT_new, VT)
        u_isub = jnp.einsum("nk,njk->nj", onehot, U)
        u_tgt = U[:, :, tgt]
        U_new = jnp.where((onehot > 0)[:, None, :], u_tgt[:, :, None], U)
        U_new = U_new.at[:, :, tgt].set(u_isub)
        U = jnp.where(do[:, None, None], U_new, U)
        return d, VT, U

    d, VT, U = pass_swap(d, VT, U, upto=3, tgt=2)
    d, VT, U = pass_swap(d, VT, U, upto=2, tgt=1)
    return d, VT, U


def svd3x3_gesdd(F):
    """Batched 3x3 SVD with LAPACK sgesdd sign conventions, pure jnp.

    Drop-in device-native replacement for ops.svd3.svd3x3_lapack (the host
    callback): F = U @ diag(S) @ V^T with S >= 0 descending and U/V column
    signs matching np.linalg.svd / torch.svd on ~98% of generic inputs
    (the residual is fp-branch noise at tolerance boundaries; see module
    docstring). Works under jit on any backend, including TPU runtimes
    that reject host callbacks.

    :param F: (..., 3, 3) float32
    :return: U (..., 3, 3), S (..., 3), V (..., 3, 3)
    """
    batch = F.shape[:-2]
    A = F.reshape((-1, 3, 3)).astype(jnp.float32)
    N = A.shape[0]

    # TPU matmuls default to bf16 inputs; every 3x3 product here is
    # sign-critical, so force true-f32 for the whole trace.
    with jax.default_matmul_precision("highest"):
        return _svd3x3_gesdd_impl(A, N, batch)


def _svd3x3_gesdd_impl(A, N, batch):
    d, e, Q, P = _gebd2(A)

    # thresh = max(tol * sminoa, maxitr*n*n*unfl), sminoa from the forward
    # recurrence over the bidiagonal (netlib dbdsqr prologue).
    mu0 = jnp.abs(d[:, 0])
    mu1 = jnp.abs(d[:, 1]) * (mu0 / (mu0 + jnp.abs(e[:, 0])))
    mu2 = jnp.abs(d[:, 2]) * (mu1 / (mu1 + jnp.abs(e[:, 1])))
    sminoa = jnp.minimum(mu0, jnp.minimum(mu1, mu2)) / np.float32(np.sqrt(3.0))
    thresh = jnp.maximum(_TOL * sminoa,
                         np.float32(_MAXITR * _N * _N) * _UNFL)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), (N, 3, 3))
    s, VT_b, U_b = _bdsqr3(d, e, eye, eye, thresh)

    U = Q @ U_b
    VT = VT_b @ jnp.swapaxes(P, -1, -2)
    V = jnp.swapaxes(VT, -1, -2)
    return (U.reshape(batch + (3, 3)), s.reshape(batch + (3,)),
            V.reshape(batch + (3, 3)))
