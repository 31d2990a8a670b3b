"""Kalman filtering / RTS smoothing for the LEG <-> SSM bridge.

The LEG model on a uniform (or known-gap) grid is exactly a discrete-time
linear-Gaussian SSM (reference cyclic_gps/kalman.py:7-27):

    z_{k+1} = A z_k + w_k,   A = expm(-0.5 dt G),  Cov(w) = Q = I - A A^T
    x_k     = H z_k + e_k,   H = B,                Cov(e) = R = Lambda Lambda^T

(first-order variant: A = I - 0.5 dt G, Q = dt N N^T, kalman.py:14-16).

Two implementations:

* ``filter_sequential`` / ``smooth_sequential``: classic O(T) sequential
  scans (`jax.lax.scan`), the exact oracle matching the reference's
  filterpy usage (kalman.py:42-60).
* ``filter_parallel`` / ``smooth_parallel``: O(log T)-depth
  `jax.lax.associative_scan` formulations (temporal parallelization of
  Bayesian smoothers, Sarkka & Garcia-Fernandez, IEEE TAC 2021) -- the
  TPU-native "sequence-parallel" path.

All functions accept per-step transition matrices (A, Q stacked [T, r, r])
so irregular time grids work; ``leg_to_ssm`` builds them from LEG params.
Initial state: m0 = 0, P0 = I (filterpy defaults used by the reference,
kalman.py:10-12); the first step predicts before updating.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.ops import smallblock as sb
from cyclic_gps_tpu.ops.expm_em import lu_solve_pivoted

Array = jnp.ndarray


def _highest_precision(fn):
    """Full-precision matmuls: the matrices are tiny and the exact
    discretisation Q = I - A A^T suffers bf16 MXU cancellation on TPU
    otherwise."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


class SSM(NamedTuple):
    a: Array  # [T, r, r] per-step transition
    q: Array  # [T, r, r] per-step process noise
    h: Array  # [obs, r] observation matrix
    r: Array  # [obs, obs] observation noise


@partial(jax.jit, static_argnames=("use_approximation", "regular"))
@_highest_precision
def leg_to_ssm(
    params: leg.LEGParams,
    ts: Array,
    use_approximation: bool = False,
    regular: bool = False,
    gap_mask: Optional[Array] = None,
) -> SSM:
    """SSM matrices for the LEG model on grid ``ts``.

    The first "gap" (into step 0 from the infinite stationary past) uses
    dt = gap between the first two points, irrelevant for the exact branch
    where the predict from P0 = I lands back at the stationary I.
    Reference: kalman.py:7-27 with time_step = dt.

    ``regular=True`` asserts a constant gap ts[1] - ts[0]: ONE matrix
    exponential broadcast over the grid instead of T -- the dominant
    setup cost of the smoother route at large T.

    ``gap_mask`` (optional natural [T]; gap i couples points i and i+1,
    see leg._series_gap_mask): transitions into masked-gap successors are
    replaced by (A = 0, Q = I), which makes the one-step-ahead predictive
    of each series' first point the exact STATIONARY prior -- the filter
    restarts per series, so the total (and per-step) log-likelihood of a
    stacked multi-series grid is exactly the sum over independent series.
    Masked gaps' diffs are clamped to 1 first (restarting timestamps
    cannot overflow the exponential).
    """
    g = leg.g_matrix(params)
    rank = params.rank
    t = ts.shape[0]
    dtype = g.dtype
    tm = None
    if gap_mask is not None:
        # transition INTO point j rides gap j-1; entry 0 (the stationary
        # pseudo-gap) stays unmasked (predict from P0 = I is stationary)
        tm = jnp.concatenate(
            [jnp.ones((1,), dtype), gap_mask.astype(dtype)[: t - 1]]
        )

    def masked(a, q):
        if tm is None:
            return a, q
        eye = jnp.eye(rank, dtype=dtype)[None]
        t3 = tm[:, None, None]
        return a * t3, q * t3 + (1.0 - t3) * eye

    if regular:
        dt = (ts[1] - ts[0])[None]
        if use_approximation:
            a1 = (jnp.eye(rank, dtype=g.dtype)[None]
                  - 0.5 * dt[:, None, None] * g[None])
            n_mat = leg.n_matrix(params)
            q1 = dt[:, None, None] * (n_mat @ n_mat.T)[None]
        else:
            a1, q1 = leg.transition_and_noise(g, dt)
        a = jnp.broadcast_to(a1, (t, rank, rank))
        q = jnp.broadcast_to(q1, (t, rank, rank))
        a, q = masked(a, q)
        return SSM(a, q, params.b, leg.lambda_lambda_t(params))
    diffs = ts[1:] - ts[:-1]
    diffs = jnp.concatenate([diffs[:1], diffs])  # [T]
    if tm is not None:
        diffs = diffs * tm + (1.0 - tm)
    if use_approximation:
        a = (
            jnp.eye(rank, dtype=g.dtype)[None]
            - 0.5 * diffs[:, None, None] * g[None]
        )
        n_mat = leg.n_matrix(params)
        q = diffs[:, None, None] * (n_mat @ n_mat.T)[None]
    else:
        # stable Van Loan construction of (A, Q = I - A A^T)
        a, q = leg.transition_and_noise(g, diffs)
    a, q = masked(a, q)
    return SSM(a, q, params.b, leg.lambda_lambda_t(params))


def _mvn_logpdf(x: Array, cov: Array) -> Array:
    chol = jnp.linalg.cholesky(cov)
    sol = jax.scipy.linalg.solve_triangular(chol, x, lower=True)
    d = x.shape[-1]
    return -0.5 * (
        jnp.sum(sol**2)
        + d * jnp.log(2 * jnp.pi)
        + 2 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    )


@jax.jit
@_highest_precision
def filter_sequential(
    ssm: SSM, xs: Array
) -> Tuple[Array, Array, Array]:
    """Kalman filter: returns (filtered means [T, r], covs [T, r, r],
    total log-likelihood).  Joseph-form covariance update."""
    rank = ssm.h.shape[1]
    eye = jnp.eye(rank, dtype=ssm.a.dtype)
    m0 = jnp.zeros(rank, dtype=ssm.a.dtype)
    p0 = eye

    def step(carry, inp):
        m, p = carry
        a, q, y = inp
        # predict
        m = a @ m
        p = a @ p @ a.T + q
        # update
        innov = y - ssm.h @ m
        s = ssm.h @ p @ ssm.h.T + ssm.r
        k = jnp.linalg.solve(s.T, (p @ ssm.h.T).T).T
        ll = _mvn_logpdf(innov, s)
        m = m + k @ innov
        ikh = eye - k @ ssm.h
        p = ikh @ p @ ikh.T + k @ ssm.r @ k.T
        return (m, p), (m, p, ll)

    (_, _), (ms, ps, lls) = jax.lax.scan(step, (m0, p0), (ssm.a, ssm.q, xs))
    return ms, ps, jnp.sum(lls)


@jax.jit
@_highest_precision
def smooth_sequential(ssm: SSM, xs: Array) -> Tuple[Array, Array]:
    """RTS smoother: (smoothed means [T, r], covs [T, r, r]).

    Matches the reference's kf.batch_filter + kf.rts_smoother
    (kalman.py:42-52).  Smoothing step k uses the transition into k+1.
    """
    ms, ps, _ = filter_sequential(ssm, xs)

    def step(carry, inp):
        m_next_s, p_next_s = carry
        m, p, a, q = inp
        pp = a @ p @ a.T + q  # predicted cov into k+1
        gain = jnp.linalg.solve(pp.T, (p @ a.T).T).T
        m_s = m + gain @ (m_next_s - a @ m)
        p_s = p + gain @ (p_next_s - pp) @ gain.T
        return (m_s, p_s), (m_s, p_s)

    # transitions into step k+1 are (a, q)[k+1]
    inps = (ms[:-1], ps[:-1], ssm.a[1:], ssm.q[1:])
    (_, _), (ms_s, ps_s) = jax.lax.scan(
        step, (ms[-1], ps[-1]), inps, reverse=True
    )
    ms_s = jnp.concatenate([ms_s, ms[-1:]], axis=0)
    ps_s = jnp.concatenate([ps_s, ps[-1:]], axis=0)
    return ms_s, ps_s


def log_likelihood_sequential(ssm: SSM, xs: Array) -> Array:
    """Marginal log-likelihood via the sequential filter
    (reference kalman.py:54-60)."""
    return filter_sequential(ssm, xs)[2]


# ---------------------------------------------------------------------------
# Parallel (associative-scan) filtering and smoothing.
# ---------------------------------------------------------------------------


def _solve_spd(m_em, rhs_em):
    """Per-block SPD solve M X = RHS in element-major layout."""
    l, inv = sb.cholesky(m_em)
    return sb.solve_lower_t(l, inv, sb.solve_lower(l, inv, rhs_em))


def _solve_spd_vec(m_em, rhs_em):
    l, inv = sb.cholesky(m_em)
    return sb.solve_lower_t_vec(l, inv, sb.solve_lower_vec(l, inv, rhs_em))


def _filter_combine_em(ei, ej):
    """Associative composition of filtering elements, element-major
    ([.., T] leaves; Sarkka & Garcia-Fernandez 2021, eqs. 10-11)."""
    a_i, b_i, c_i, eta_i, j_i = ei  # b, eta carried as [r, 1, T]
    a_j, b_j, c_j, eta_j, j_j = ej
    d = a_i.shape[0]
    eye = jnp.eye(d, dtype=a_i.dtype)[:, :, None]
    lhs = eye + sb.matmul(c_i, j_j)
    # (I + C J) is nonsymmetric with eigenvalues >= 1 but no bound on the
    # leading pivot; partial pivoting keeps the f32 combine stable.
    ajli = sb.transpose(
        lu_solve_pivoted(sb.transpose(lhs), sb.transpose(a_j))
    )
    a_new = sb.matmul(ajli, a_i)
    b_new = sb.matmul(ajli, b_i + sb.matmul(c_i, eta_j)) + b_j
    c_new = sb.matmul(sb.matmul(ajli, c_i), a_j, tb=True) + c_j
    lhs2 = eye + sb.matmul(j_j, c_i)
    atli2 = sb.transpose(lu_solve_pivoted(sb.transpose(lhs2), a_i))
    eta_new = sb.matmul(atli2, eta_j - sb.matmul(j_j, b_i)) + eta_i
    j_new = sb.matmul(sb.matmul(atli2, j_j), a_i) + j_i
    # C and J are mathematically symmetric; re-symmetrise so f32 roundoff
    # cannot drift them indefinite over long compositions
    c_new = 0.5 * (c_new + sb.transpose(c_new))
    j_new = 0.5 * (j_new + sb.transpose(j_new))
    return a_new, b_new, c_new, eta_new, j_new


@jax.jit
@_highest_precision
def filter_parallel(ssm: SSM, xs: Array) -> Tuple[Array, Array, Array]:
    """O(log T)-depth Kalman filter via jax.lax.associative_scan.

    Internals run element-major ([r, r, T] leaves, scan axis = -1): TPU
    tile-pads [T, r, r] matmul operands ~32x, which exhausts HBM at large
    T.  Returns (filtered means [T, r], covs [T, r, r], log-likelihood);
    the likelihood is assembled post-scan from one-step-ahead predictives
    (innovation covariances bounded below by R -- the numerically robust
    likelihood form).
    """
    t = xs.shape[0]
    rank = ssm.h.shape[1]
    obs = ssm.h.shape[0]
    dtype = ssm.a.dtype

    a = sb.to_em(ssm.a)
    q = sb.to_em(ssm.q)
    y = sb.vec_to_em(xs)  # [o, T]
    h = jnp.broadcast_to(ssm.h[:, :, None], (obs, rank, t))
    r_em = jnp.broadcast_to(ssm.r[:, :, None], (obs, obs, t))
    eye_r = jnp.eye(rank, dtype=dtype)[:, :, None]
    first = (jnp.arange(t) == 0).astype(dtype)[None, None, :]

    # prior covariance entering each step: Q generically; A P0 A^T + Q at
    # the first step (m0 = 0, P0 = I; m0 = 0 collapses the initial mean
    # terms to the generic k @ y form)
    pp = q + first * sb.matmul(a, a, tb=True)
    s = sb.matmul(sb.matmul(h, pp), h, tb=True) + r_em  # [o, o, T]
    hp = sb.matmul(h, pp)  # [o, r, T]
    k = sb.transpose(_solve_spd(s, hp))  # pp H^T S^{-1}  [r, o, T]
    ikh = eye_r - sb.matmul(k, h)
    ha = sb.matmul(h, a)  # [o, r, T]
    s_inv_y = _solve_spd_vec(s, y)  # [o, T]

    not_first = 1.0 - first
    a_el = not_first * sb.matmul(ikh, a)
    b_el = sb.matvec(k, y)
    c_el = sb.matmul(ikh, pp)
    eta = not_first[0] * sb.matvec(ha, s_inv_y, ta=True)  # [r, T]
    j_el = not_first * sb.matmul(ha, _solve_spd(s, ha), ta=True)

    scanned = jax.lax.associative_scan(
        _filter_combine_em,
        (a_el, b_el[:, None, :], c_el, eta[:, None, :], j_el),
        axis=2,
    )
    ms, ps = scanned[1][:, 0, :], scanned[2]  # [r, T], [r, r, T]

    # log-likelihood from one-step-ahead predictives
    m_prev = sb.shift_down(ms)  # m0 = 0
    p_prev = sb.shift_down(ps) + first * eye_r  # p0 = I
    mp = sb.matvec(a, m_prev)
    ppd = sb.matmul(sb.matmul(a, p_prev), a, tb=True) + q
    s2 = sb.matmul(sb.matmul(h, ppd), h, tb=True) + r_em
    innov = y - sb.matvec(h, mp)
    l2, inv2 = sb.cholesky(s2)
    z = sb.solve_lower_vec(l2, inv2, innov)
    ll = -0.5 * (
        jnp.sum(z * z)
        + t * obs * jnp.log(2 * jnp.pi)
        + 2.0 * sb.chol_log_diag_sum(l2)
    )
    return sb.vec_from_em(ms), sb.from_em(ps), ll


def _smoother_combine_em(ea, eb):
    """Composition for the reverse suffix scan (element-major).

    With ``reverse=True`` the scan hands us (accumulated-suffix, current)
    and the result must be current-composed-with-suffix:
    m_s(i) = E_i m_s(i+1) + g_i applied outermost.
    """
    e_a, g_a, l_a = ea  # g carried as [r, 1, T]
    e_b, g_b, l_b = eb
    e = sb.matmul(e_b, e_a)
    g = sb.matmul(e_b, g_a) + g_b
    ell = sb.matmul(sb.matmul(e_b, l_a), e_b, tb=True) + l_b
    return e, g, ell


@jax.jit
@_highest_precision
def smooth_parallel(ssm: SSM, xs: Array) -> Tuple[Array, Array]:
    """O(log T)-depth RTS smoother via associative scan over filtered
    moments (element-major internals, like filter_parallel)."""
    ms_b, ps_b, _ = filter_parallel(ssm, xs)
    t = xs.shape[0]
    dtype = ssm.a.dtype
    ms = sb.vec_to_em(ms_b)
    ps = sb.to_em(ps_b)
    a = sb.to_em(ssm.a)
    q = sb.to_em(ssm.q)
    a_n = jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
    q_n = jnp.concatenate([q[..., 1:], q[..., -1:]], axis=-1)
    last = (jnp.arange(t) == t - 1).astype(dtype)[None, None, :]
    not_last = 1.0 - last

    pp = sb.matmul(sb.matmul(a_n, ps), a_n, tb=True) + q_n
    gain = sb.transpose(_solve_spd(pp, sb.matmul(a_n, ps)))  # p a_n^T pp^{-1}
    e = not_last * gain
    g = ms - not_last[0] * sb.matvec(gain, sb.matvec(a_n, ms))
    ell = ps - not_last * sb.matmul(sb.matmul(gain, pp), gain, tb=True)

    e, g, ell = jax.lax.associative_scan(
        _smoother_combine_em, (e, g[:, None, :], ell), axis=2, reverse=True
    )
    return sb.vec_from_em(g[:, 0, :]), sb.from_em(ell)


@jax.jit
@_highest_precision
def smooth_parallel_full(ssm: SSM, xs: Array) -> Tuple[Array, Array, Array]:
    """Parallel RTS smoother returning means, marginal covariances AND
    lag-1 cross-covariances Cov(z_{k+1}, z_k | x) = P^s_{k+1} G_k^T
    (G_k the smoother gain) -- everything the LEG in-sample posterior
    needs.  Numerically robust at f32 (innovation-form recursions), unlike
    the precision-form selected inversion for very smooth processes.
    """
    ms_b, ps_b, _ = filter_parallel(ssm, xs)
    t = xs.shape[0]
    dtype = ssm.a.dtype
    ms = sb.vec_to_em(ms_b)
    ps = sb.to_em(ps_b)
    a = sb.to_em(ssm.a)
    q = sb.to_em(ssm.q)
    a_n = jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
    q_n = jnp.concatenate([q[..., 1:], q[..., -1:]], axis=-1)
    last = (jnp.arange(t) == t - 1).astype(dtype)[None, None, :]
    not_last = 1.0 - last

    pp = sb.matmul(sb.matmul(a_n, ps), a_n, tb=True) + q_n
    gain = sb.transpose(_solve_spd(pp, sb.matmul(a_n, ps)))
    e = not_last * gain
    g = ms - not_last[0] * sb.matvec(gain, sb.matvec(a_n, ms))
    ell = ps - not_last * sb.matmul(sb.matmul(gain, pp), gain, tb=True)

    _, g_s, ell_s = jax.lax.associative_scan(
        _smoother_combine_em, (e, g[:, None, :], ell), axis=2, reverse=True
    )
    means = g_s[:, 0, :]
    covs = ell_s
    # cross_k = P^s_{k+1} gain_k^T for k = 0..t-2
    covs_next = covs[..., 1:]
    cross = sb.matmul(covs_next, gain[..., :-1], tb=True)
    return (sb.vec_from_em(means), sb.from_em(covs), sb.from_em(cross))


# ---------------------------------------------------------------------------
# Blocked (memory-bounded) parallel filtering and smoothing: the
# associative-scan internals hold ~10 [r, r, T] work arrays, which
# overflows HBM beyond T ~ 1e6-1e7.  Blocks run the parallel scan
# internally and compose sequentially via an O(1) carry, so peak memory
# is O(block) while the outputs stream.
# ---------------------------------------------------------------------------

SMOOTHER_BLOCK = 1 << 17  # default block length (and the flat-scan cap)


def _filter_block_em(a, q, h, r_em, y, m_in, p_in, valid):
    """Parallel filter over one block with general init (m_in, p_in) =
    filtered moments of the state BEFORE this block.  Element-major
    leaves ([r, r, Tb]); `valid` masks padded steps out of the
    log-likelihood.  Returns (ms, ps, ll, m_out, p_out)."""
    tb = y.shape[-1]
    rank = a.shape[0]
    dtype = a.dtype
    eye_r = jnp.eye(rank, dtype=dtype)[:, :, None]
    first = (jnp.arange(tb) == 0).astype(dtype)[None, None, :]
    not_first = 1.0 - first

    p_in3 = p_in[:, :, None]
    # prior covariance entering each step: Q generically; A p_in A^T + Q
    # at the first step (the m_in mean term rides in b_el below)
    pp = q + first * sb.matmul(sb.matmul(a, p_in3), a, tb=True)
    s = sb.matmul(sb.matmul(h, pp), h, tb=True) + r_em
    hp = sb.matmul(h, pp)
    k = sb.transpose(_solve_spd(s, hp))
    ikh = eye_r - sb.matmul(k, h)
    ha = sb.matmul(h, a)
    s_inv_y = _solve_spd_vec(s, y)

    a_el = not_first * sb.matmul(ikh, a)
    b_el = sb.matvec(k, y) + first[0] * sb.matvec(
        sb.matmul(ikh, a), jnp.broadcast_to(m_in[:, None], (rank, tb))
    )
    c_el = sb.matmul(ikh, pp)
    eta = not_first[0] * sb.matvec(ha, s_inv_y, ta=True)
    j_el = not_first * sb.matmul(ha, _solve_spd(s, ha), ta=True)

    scanned = jax.lax.associative_scan(
        _filter_combine_em,
        (a_el, b_el[:, None, :], c_el, eta[:, None, :], j_el),
        axis=2,
    )
    ms, ps = scanned[1][:, 0, :], scanned[2]

    # per-step log-likelihood terms from one-step-ahead predictives
    m_prev = sb.shift_down(ms) + first[0] * m_in[:, None]
    p_prev = sb.shift_down(ps) + first * p_in3
    mp = sb.matvec(a, m_prev)
    ppd = sb.matmul(sb.matmul(a, p_prev), a, tb=True) + q
    s2 = sb.matmul(sb.matmul(h, ppd), h, tb=True) + r_em
    innov = y - sb.matvec(h, mp)
    l2, inv2 = sb.cholesky(s2)
    z = sb.solve_lower_vec(l2, inv2, innov)
    obs = y.shape[0]
    ll_t = -0.5 * (
        jnp.sum(z * z, axis=0)
        + obs * jnp.log(2 * jnp.pi)
        + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l2, axis1=0, axis2=1)), axis=1)
    ) * valid  # per-step rows (padded steps exactly zero)
    ll = jnp.sum(ll_t)
    return ms, ps, ll, ll_t, ms[:, -1], ps[:, :, -1]


def _pad_ssm_blocks(ssm: SSM, xs: Array, block: int):
    """Pad (A, Q, y) to a block multiple with no-op steps (A = I, Q = 0,
    observation ignored via the valid mask): the filtered state passes
    through unchanged and the smoother treats them as identity links."""
    t = xs.shape[0]
    nb = -(-t // block)
    pad = nb * block - t
    rank = ssm.h.shape[1]
    dtype = ssm.a.dtype
    valid = jnp.concatenate(
        [jnp.ones((t,), dtype), jnp.zeros((pad,), dtype)]
    )
    if pad:
        eye = jnp.broadcast_to(jnp.eye(rank, dtype=dtype)[None],
                               (pad, rank, rank))
        a = jnp.concatenate([ssm.a, eye], axis=0)
        q = jnp.concatenate(
            [ssm.q, jnp.zeros((pad, rank, rank), dtype)], axis=0
        )
        xs = jnp.concatenate(
            [xs, jnp.zeros((pad, xs.shape[1]), xs.dtype)], axis=0
        )
    else:
        a, q = ssm.a, ssm.q
    return a, q, xs, valid, nb, pad


@partial(jax.jit, static_argnames=("block",))
@_highest_precision
def filter_parallel_blocked(
    ssm: SSM, xs: Array, block: int = 1 << 17
) -> Tuple[Array, Array, Array]:
    """`filter_parallel` with O(block) peak memory: a `lax.scan` over
    blocks, each block running the O(log Tb)-depth associative scan,
    composed through the exact (m, P) filtered carry.  Identical outputs
    (tests/test_models.py)."""
    t = xs.shape[0]
    rank = ssm.h.shape[1]
    obs = ssm.h.shape[0]
    dtype = ssm.a.dtype
    a, q, xs_p, valid, nb, pad = _pad_ssm_blocks(ssm, xs, block)

    a_b = sb.to_em(a).reshape(rank, rank, nb, block).transpose(2, 0, 1, 3)
    q_b = sb.to_em(q).reshape(rank, rank, nb, block).transpose(2, 0, 1, 3)
    y_b = sb.vec_to_em(xs_p).reshape(obs, nb, block).transpose(1, 0, 2)
    v_b = valid.reshape(nb, block)
    h = jnp.broadcast_to(ssm.h[:, :, None], (obs, rank, block))
    r_em = jnp.broadcast_to(ssm.r[:, :, None], (obs, obs, block))

    def body(carry, inp):
        m_in, p_in, ll = carry
        a_k, q_k, y_k, v_k = inp
        ms, ps, ll_k, _, m_out, p_out = _filter_block_em(
            a_k, q_k, h, r_em, y_k, m_in, p_in, v_k
        )
        return (m_out, p_out, ll + ll_k), (ms, ps)

    init = (jnp.zeros((rank,), dtype), jnp.eye(rank, dtype=dtype),
            jnp.zeros((), dtype))
    (_, _, ll), (ms_b, ps_b) = jax.lax.scan(
        body, init, (a_b, q_b, y_b, v_b)
    )
    ms = ms_b.transpose(1, 0, 2).reshape(rank, nb * block)[:, :t]
    ps = ps_b.transpose(1, 2, 0, 3).reshape(rank, rank, nb * block)[..., :t]
    return sb.vec_from_em(ms), sb.from_em(ps), ll


@partial(jax.jit, static_argnames=("block",))
@_highest_precision
def log_likelihood_blocked(
    ssm: SSM, xs: Array, block: int = 1 << 17
) -> Array:
    """Marginal log-likelihood with O(block) peak memory — the f32
    training loss for N beyond the flat associative scan's HBM plan
    (~10 [r, r, T] work arrays overflow 16 GB near T ~ 1e6-1e7).

    A `lax.scan` over blocks carries only the exact filtered (m, P) of
    the block boundary plus the running log-likelihood; each block runs
    the O(log Tb)-depth associative filter internally.  The body is
    `jax.checkpoint`-ed, so reverse-mode stores one (m, P, ll) carry per
    block and rematerialises the block interior in the backward pass —
    gradient memory is O(block), which is what makes f32 *training*
    (not just evaluation) work at T = 1e7.  Equal to
    ``filter_parallel(ssm, xs)[2]`` (tests/test_models.py).

    Reference analog: the filterpy log-likelihood accumulation the
    timing script gestures at (kalman_timing_script.py:25-27,55) —
    sequential, eager, and never trainable at this scale.
    """
    rank = ssm.h.shape[1]
    obs = ssm.h.shape[0]
    dtype = ssm.a.dtype
    a, q, xs_p, valid, nb, pad = _pad_ssm_blocks(ssm, xs, block)

    a_b = sb.to_em(a).reshape(rank, rank, nb, block).transpose(2, 0, 1, 3)
    q_b = sb.to_em(q).reshape(rank, rank, nb, block).transpose(2, 0, 1, 3)
    y_b = sb.vec_to_em(xs_p).reshape(obs, nb, block).transpose(1, 0, 2)
    v_b = valid.reshape(nb, block)
    h = jnp.broadcast_to(ssm.h[:, :, None], (obs, rank, block))
    r_em = jnp.broadcast_to(ssm.r[:, :, None], (obs, obs, block))

    @jax.checkpoint
    def body(carry, inp):
        m_in, p_in, ll = carry
        a_k, q_k, y_k, v_k = inp
        _, _, ll_k, _, m_out, p_out = _filter_block_em(
            a_k, q_k, h, r_em, y_k, m_in, p_in, v_k
        )
        return (m_out, p_out, ll + ll_k), None

    init = (jnp.zeros((rank,), dtype), jnp.eye(rank, dtype=dtype),
            jnp.zeros((), dtype))
    (_, _, ll), _ = jax.lax.scan(body, init, (a_b, q_b, y_b, v_b))
    return ll


@partial(jax.jit, static_argnames=("block",))
@_highest_precision
def log_likelihood_rows_blocked(
    ssm: SSM, xs: Array, block: int = 1 << 17
) -> Array:
    """PER-STEP log-likelihood contributions [T] (one-step-ahead
    predictive log-densities), O(block) peak memory like
    `log_likelihood_blocked` (sum(rows) == its scalar).  With a
    boundary-masked SSM (`leg_to_ssm(gap_mask=...)`, stacked
    multi-series), segment-summing the rows by series id gives each
    series' exact filter log-likelihood -- the f32-robust counterpart of
    leg.log_likelihood_per_series."""
    rank = ssm.h.shape[1]
    obs = ssm.h.shape[0]
    dtype = ssm.a.dtype
    t = xs.shape[0]
    block = min(block, 1 << max(t - 1, 1).bit_length())  # no giant pad
    a, q, xs_p, valid, nb, pad = _pad_ssm_blocks(ssm, xs, block)

    a_b = sb.to_em(a).reshape(rank, rank, nb, block).transpose(2, 0, 1, 3)
    q_b = sb.to_em(q).reshape(rank, rank, nb, block).transpose(2, 0, 1, 3)
    y_b = sb.vec_to_em(xs_p).reshape(obs, nb, block).transpose(1, 0, 2)
    v_b = valid.reshape(nb, block)
    h = jnp.broadcast_to(ssm.h[:, :, None], (obs, rank, block))
    r_em = jnp.broadcast_to(ssm.r[:, :, None], (obs, obs, block))

    @jax.checkpoint
    def body(carry, inp):
        m_in, p_in = carry
        a_k, q_k, y_k, v_k = inp
        _, _, _, ll_t, m_out, p_out = _filter_block_em(
            a_k, q_k, h, r_em, y_k, m_in, p_in, v_k
        )
        return (m_out, p_out), ll_t

    init = (jnp.zeros((rank,), dtype), jnp.eye(rank, dtype=dtype))
    _, rows_b = jax.lax.scan(body, init, (a_b, q_b, y_b, v_b))
    return rows_b.reshape(nb * block)[:t]


@partial(jax.jit, static_argnames=("block",))
@_highest_precision
def smooth_parallel_full_blocked(
    ssm: SSM, xs: Array, block: int = 1 << 17
) -> Tuple[Array, Array, Array]:
    """`smooth_parallel_full` with O(block) peak scan memory: blocked
    filtering forward, then a reverse `lax.scan` over blocks whose carry
    is the smoothed (m, P) of the next block's first state.  Exact
    (tests/test_models.py)."""
    t = xs.shape[0]
    rank = ssm.h.shape[1]
    dtype = ssm.a.dtype
    ms_nat, ps_nat, _ = filter_parallel_blocked(ssm, xs, block=block)

    a, q, _, valid, nb, pad = _pad_ssm_blocks(ssm, xs, block)
    ms = sb.vec_to_em(ms_nat)
    ps = sb.to_em(ps_nat)
    if pad:
        # padded filtered state: carry the last real state through
        ms = jnp.concatenate(
            [ms, jnp.broadcast_to(ms[:, -1:], (rank, pad))], axis=-1
        )
        ps = jnp.concatenate(
            [ps, jnp.broadcast_to(ps[:, :, -1:], (rank, rank, pad))],
            axis=-1,
        )
    tp = nb * block
    a_em = sb.to_em(a)
    q_em = sb.to_em(q)
    # next-step transition/noise per index (global shift; the padded
    # tail is identity/zero so the boundary entries stay harmless)
    a_n = jnp.concatenate([a_em[..., 1:], a_em[..., -1:]], axis=-1)
    q_n = jnp.concatenate([q_em[..., 1:], q_em[..., -1:]], axis=-1)
    last = (jnp.arange(tp) == tp - 1).astype(dtype)[None, None, :]
    not_last = 1.0 - last

    pp = sb.matmul(sb.matmul(a_n, ps), a_n, tb=True) + q_n
    # padded steps: pp = ps (A=I, Q=0) -> gain = I, e = I, g = 0,
    # ell = 0: exact identity pass-through of the smoothed carry
    gain = sb.transpose(_solve_spd(pp, sb.matmul(a_n, ps)))
    e = not_last * gain
    g = ms - not_last[0] * sb.matvec(gain, sb.matvec(a_n, ms))
    ell = ps - not_last * sb.matmul(sb.matmul(gain, pp), gain, tb=True)

    def blocks(x):  # [r, ., tp] -> [nb, r, ., block]
        sh = x.shape[:-1]
        return x.reshape(sh + (nb, block)).transpose(
            (len(sh),) + tuple(range(len(sh))) + (len(sh) + 1,)
        )

    e_b, g_b, ell_b, gain_b = map(blocks, (e, g, ell, gain))

    def body(carry, inp):
        m_c, p_c = carry  # smoothed first state of the NEXT block
        e_k, g_k, ell_k, gain_k = inp
        es, gs, ells = jax.lax.associative_scan(
            _smoother_combine_em,
            (e_k, g_k[:, None, :], ell_k),
            axis=2, reverse=True,
        )
        m_s = sb.matvec(
            es, jnp.broadcast_to(m_c[:, None], (m_c.shape[0], block))
        ) + gs[:, 0, :]
        p_s = sb.matmul(sb.matmul(es, p_c[:, :, None]), es, tb=True) + ells
        # cross_j = P^s_{j+1} gain_j^T; the block-last entry uses the
        # carried next-block first covariance
        p_next = jnp.concatenate([p_s[..., 1:], p_c[:, :, None]], axis=-1)
        cross = sb.matmul(p_next, gain_k, tb=True)
        return (m_s[:, 0], p_s[:, :, 0]), (m_s, p_s, cross)

    init = (jnp.zeros((rank,), dtype), jnp.zeros((rank, rank), dtype))
    _, (m_sb, p_sb, cr_b) = jax.lax.scan(
        body, init, (e_b, g_b, ell_b, gain_b), reverse=True
    )
    m_s = m_sb.transpose(1, 0, 2).reshape(rank, tp)[:, :t]
    p_s = p_sb.transpose(1, 2, 0, 3).reshape(rank, rank, tp)[..., :t]
    cross = cr_b.transpose(1, 2, 0, 3).reshape(rank, rank, tp)[..., :t - 1]
    return sb.vec_from_em(m_s), sb.from_em(p_s), sb.from_em(cross)


@jax.jit
def sample_states(ssm: SSM, key: jax.Array) -> Array:
    """Latent sample path matching the reference's
    ``generate_states_from_kalman`` (kalman.py:29-39): start at 0, apply
    predict + injected process noise each step."""
    t, rank = ssm.a.shape[0], ssm.h.shape[1]
    chol_q = jnp.linalg.cholesky(
        ssm.q + 1e-12 * jnp.eye(rank, dtype=ssm.q.dtype)
    )
    ws = jax.random.normal(key, (t, rank), dtype=ssm.a.dtype)

    def step(z, inp):
        a, qc, w = inp
        z = a @ z + qc @ w
        return z, z

    _, zs = jax.lax.scan(step, jnp.zeros(rank, ssm.a.dtype), (ssm.a, chol_q, ws))
    return zs


# ---------------------------------------------------------------------------
# Steady-state Kalman likelihood for REGULAR grids (round 3).
#
# On a uniform grid the Riccati recursion P_{k+1} = A(P - K S K^T)A^T + Q
# is data-independent and converges geometrically to the DARE fixed point;
# past the switch point t0 the filter has CONSTANT (F, G, S):
#
#     m^-_{k+1} = F m^-_k + G y_k,     e_k = y_k - H m^-_k,
#     ll_k = -1/2 (e_k^T S^{-1} e_k + log|2 pi S|),
#
# a constant-coefficient affine recurrence whose solution is a
# convolution: chunk the tail into blocks of B, precompute the powers
# F^j and the block-Toeplitz response H F^{j-1-i} G, and the whole tail
# collapses into a handful of DENSE MXU MATMULS plus one tiny [r, r]
# affine associative scan over chunk carries.  The general-gap filter's
# per-element pivoted LU combines (the exact associative filter) cost
# ~44 s per train step at T = 1e7 on-chip; this path is matmul-bound.
#
# Exact to working precision provided the Riccati iteration has
# converged by t0 (geometric rate ~ |stable eigs|^2; use
# `steady_state_gap` ONCE outside jit to validate t0 for a given model
# scale -- the train loop's auto-selection does).  Reference analog:
# the filterpy timing script's sequential filter (kalman_timing_script
# .py:25-27), which has no answer at this scale.
# ---------------------------------------------------------------------------


def _affine_prefix(fB: Array, u: Array, m0: Array,
                   b2: int = 128) -> Array:
    """Prefixes of m_{c+1} = fB m_c + u_c with m_0 = m0: returns the
    START values m_c [C, r].  Two-level: super-chunks of b2 handled by
    precomputed fB powers and one block-Toeplitz matmul; a short
    lax.scan carries across the ~C/b2 super-chunks."""
    c, rank = u.shape
    dtype = u.dtype
    c2 = -(-c // b2)
    u_pad = jnp.concatenate(
        [u, jnp.zeros((c2 * b2 - c, rank), dtype)], axis=0
    ).reshape(c2, b2, rank)

    def pw(m, _):
        return fB @ m, m

    _, pows = jax.lax.scan(pw, jnp.eye(rank, dtype=dtype), None,
                           length=b2 + 1)       # pows[j] = fB^j

    # super-chunk carry inputs: u2_k = sum_i fB^{b2-1-i} u_{k,i}
    u2 = jnp.einsum("irs,kis->kr", jnp.flip(pows[:b2], axis=0), u_pad)

    def step(m, u2k):
        return pows[b2] @ m + u2k, m

    _, m2 = jax.lax.scan(step, m0, u2)           # super-chunk starts

    # within super-chunk: m_{k,j} = fB^j m2_k + sum_{i<j} fB^{j-1-i} u_i
    ji = jnp.arange(b2)[:, None] - 1 - jnp.arange(b2)[None, :]
    t4 = pows[jnp.clip(ji, 0, b2 - 1)]           # [b2, b2, r, r]
    t4 = jnp.where((ji >= 0)[:, :, None, None], t4, 0.0)
    m2mat = jnp.transpose(t4, (0, 2, 1, 3)).reshape(b2 * rank,
                                                    b2 * rank)
    conv = (u_pad.reshape(c2, b2 * rank) @ m2mat.T).reshape(
        c2, b2, rank)
    m_start = jnp.einsum("jrs,ks->kjr", pows[:b2], m2) + conv
    return m_start.reshape(c2 * b2, rank)[:c]


def _riccati_step(a, q, h, r_obs, p):
    """One predicted-covariance Riccati step; returns
    (p_next, F, G, chol_S, logdet_S)."""
    rank = a.shape[0]
    s = h @ p @ h.T + r_obs
    sl = jnp.linalg.cholesky(s)
    kt = jax.scipy.linalg.cho_solve((sl, True), h @ p)  # [obs, r] = K^T
    k = kt.T
    f = a @ (jnp.eye(rank, dtype=a.dtype) - k @ h)
    g = a @ k
    p_next = a @ (p - k @ s @ k.T) @ a.T + q
    p_next = 0.5 * (p_next + p_next.T)
    ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(sl)))
    return p_next, f, g, sl, ld


def steady_state_gap(a: Array, q: Array, h: Array, r_obs: Array,
                     t0: int = 512) -> float:
    """Relative sup-norm Riccati residual at the switch point t0.

    Run ONCE (outside jit) to validate that `log_likelihood_steady`'s
    constant-gain tail is exact to working precision for this model:
    the residual bounds the gain error, which enters the likelihood
    linearly."""
    p = jnp.eye(a.shape[0], dtype=a.dtype)

    def body(p, _):
        p_next, *_ = _riccati_step(a, q, h, r_obs, p)
        return p_next, None

    p_prev, _ = jax.lax.scan(body, p, None, length=t0 - 1)
    p_last, *_ = _riccati_step(a, q, h, r_obs, p_prev)
    return float(jnp.max(jnp.abs(p_last - p_prev))
                 / jnp.maximum(jnp.max(jnp.abs(p_last)), 1e-30))


@partial(jax.jit, static_argnames=("t0", "block"))
@_highest_precision
def log_likelihood_steady(a: Array, q: Array, h: Array, r_obs: Array,
                          xs: Array, t0: int = 512,
                          block: int = 128) -> Array:
    """Marginal log-likelihood on a REGULAR grid via the steady-state
    filter: exact transient for the first ``t0`` steps (per-step Riccati
    gains), constant-gain convolution (MXU matmuls) for the tail.

    a/q [r, r] constant per-step transition / process noise, h [obs, r],
    r_obs [obs, obs]; xs [T, obs] with T > t0.  Equal to
    ``filter_parallel(ssm, xs)[2]`` once the Riccati recursion has
    converged by t0 (check `steady_state_gap`; tests/test_models.py).
    """
    t, obs = xs.shape
    rank = a.shape[0]
    dtype = a.dtype
    two_pi = 2.0 * jnp.pi

    # ---- transient: t0 Riccati steps + the mean recursion through them
    def ric(p, _):
        p_next, f, g, sl, ld = _riccati_step(a, q, h, r_obs, p)
        return p_next, (f, g, sl, ld)

    p_inf, (fs, gs, sls, lds) = jax.lax.scan(
        ric, jnp.eye(rank, dtype=dtype), None, length=t0
    )

    def mstep(m, inp):
        f, g, sl, ld, y = inp
        e = y - h @ m
        z = jax.scipy.linalg.solve_triangular(sl, e, lower=True)
        llk = -0.5 * (jnp.sum(z * z) + ld + obs * jnp.log(two_pi))
        return f @ m + g @ y, llk

    m_t0, ll_tr = jax.lax.scan(
        mstep, jnp.zeros((rank,), dtype), (fs, gs, sls, lds, xs[:t0])
    )
    ll = jnp.sum(ll_tr)

    # ---- steady-state tail as chunked convolution
    _, f_ss, g_ss, sl_ss, ld_ss = _riccati_step(a, q, h, r_obs, p_inf)
    tp = t - t0
    b = block
    c = -(-tp // b)
    y_tail = jnp.concatenate(
        [xs[t0:], jnp.zeros((c * b - tp, obs), dtype)], axis=0
    )
    valid = (jnp.arange(c * b) < tp).reshape(c, b)
    yc = y_tail.reshape(c, b, obs)
    yc_flat = yc.reshape(c, b * obs)

    # powers F^j (j = 0..B) and responses F^j G
    def pw(m, _):
        return f_ss @ m, m

    _, pows = jax.lax.scan(pw, jnp.eye(rank, dtype=dtype), None,
                           length=b + 1)        # pows[j] = F^j
    fB = pows[b]
    pow_g = pows[:b] @ g_ss                      # [B, r, obs] F^j G
    hw = (h[None] @ pows[:b]).reshape(b * obs, rank)  # rows H F^j

    # chunk carry u_c = sum_i F^{B-1-i} G y_i  ->  yc_flat @ U^T
    u_mat = jnp.flip(pow_g, axis=0)              # [B, r, obs], idx i
    u_mat = jnp.transpose(u_mat, (1, 0, 2)).reshape(rank, b * obs)
    u = yc_flat @ u_mat.T                        # [C, r]

    # block-Toeplitz response (through H): hM[j, i] = H F^{j-1-i} G, i<j
    hg = h[None] @ pow_g                         # [B, obs, obs] H F^j G
    ji = jnp.arange(b)[:, None] - 1 - jnp.arange(b)[None, :]  # j - 1 - i
    hM4 = hg[jnp.clip(ji, 0, b - 1)]             # [B, B, obs, obs]
    hM4 = jnp.where((ji >= 0)[:, :, None, None], hM4, 0.0)
    hM = jnp.transpose(hM4, (0, 2, 1, 3)).reshape(b * obs, b * obs)

    # chunk-start means: m_0 = m_t0; m_{c+1} = F^B m_c + u_c.
    # Hierarchical (NOT lax.associative_scan over the ~1e5 chunks: its
    # unrolled log-depth trace made the 1e7 gradient un-compilable on
    # the remote compiler): one more convolution level over super-chunks
    # of B2, leaving a tiny O(C/B2)-step scan with an [r, r] body.
    m_start = _affine_prefix(fB, u, m_t0)

    # innovations through H: e = y - (m_start @ hw^T + yc_flat @ hM^T)
    hm = m_start @ hw.T + yc_flat @ hM.T         # [C, B*obs]
    e = (yc_flat - hm).reshape(c * b, obs)
    z = jax.scipy.linalg.solve_triangular(sl_ss, e.T, lower=True)  # [obs, CB]
    quad = jnp.sum(z * z, axis=0) * valid.reshape(-1)
    ll_tail = -0.5 * (jnp.sum(quad)
                      + tp * (ld_ss + obs * jnp.log(two_pi)))
    return ll + ll_tail
