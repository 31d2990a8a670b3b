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

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.models import leg

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


@_highest_precision
def leg_to_ssm(
    params: leg.LEGParams,
    ts: Array,
    use_approximation: bool = False,
) -> SSM:
    """SSM matrices for the LEG model on grid ``ts``.

    The first "gap" (into step 0 from the infinite stationary past) uses
    dt = gap between the first two points, irrelevant for the exact branch
    where the predict from P0 = I lands back at the stationary I.
    Reference: kalman.py:7-27 with time_step = dt.
    """
    g = leg.g_matrix(params)
    rank = params.rank
    diffs = ts[1:] - ts[:-1]
    diffs = jnp.concatenate([diffs[:1], diffs])  # [T]
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


def _filter_element(ssm: SSM, a, q, y, first, m0, p0):
    """Per-step element (A, b, C, eta, J) of the parallel filter."""
    rank = a.shape[0]
    eye = jnp.eye(rank, dtype=a.dtype)

    def generic():
        s = ssm.h @ q @ ssm.h.T + ssm.r
        k = jnp.linalg.solve(s.T, (q @ ssm.h.T).T).T
        a_el = (eye - k @ ssm.h) @ a
        b_el = k @ y
        c_el = (eye - k @ ssm.h) @ q
        hts_inv = jnp.linalg.solve(s, ssm.h).T  # H^T S^{-1}
        eta = a.T @ hts_inv @ y
        j = a.T @ hts_inv @ ssm.h @ a
        return a_el, b_el, c_el, eta, j

    def initial():
        mp = a @ m0
        pp = a @ p0 @ a.T + q
        s = ssm.h @ pp @ ssm.h.T + ssm.r
        k = jnp.linalg.solve(s.T, (pp @ ssm.h.T).T).T
        a_el = jnp.zeros_like(a)
        b_el = mp + k @ (y - ssm.h @ mp)
        c_el = (eye - k @ ssm.h) @ pp
        eta = jnp.zeros(rank, dtype=a.dtype)
        j = jnp.zeros_like(a)
        return a_el, b_el, c_el, eta, j

    gen = generic()
    ini = initial()
    return tuple(jnp.where(first, i, g) for i, g in zip(ini, gen))


def _filter_combine(elem_i, elem_j):
    """Associative composition of filtering elements (i precedes j)."""
    a_i, b_i, c_i, eta_i, j_i = elem_i
    a_j, b_j, c_j, eta_j, j_j = elem_j
    rank = a_i.shape[-1]
    eye = jnp.eye(rank, dtype=a_i.dtype)
    # (I + C_i J_j)^{-1}
    lhs = eye + c_i @ j_j
    # A_j lhs^{-1} = (lhs^{-T} A_j^T)^T
    a_j_lhs_inv = jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(lhs, -1, -2), jnp.swapaxes(a_j, -1, -2)),
        -1,
        -2,
    )
    a_new = a_j_lhs_inv @ a_i
    b_new = (a_j_lhs_inv @ (b_i[..., None] + c_i @ eta_j[..., None]))[
        ..., 0
    ] + b_j
    c_new = a_j_lhs_inv @ c_i @ jnp.swapaxes(a_j, -1, -2) + c_j
    # (I + J_j C_i)^{-1}
    lhs2 = eye + j_j @ c_i
    a_i_t_lhs2_inv = jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(lhs2, -1, -2), a_i), -1, -2
    )
    eta_new = (
        a_i_t_lhs2_inv @ (eta_j - (j_j @ b_i[..., None])[..., 0])[..., None]
    )[..., 0] + eta_i
    j_new = a_i_t_lhs2_inv @ j_j @ a_i + j_i
    return a_new, b_new, c_new, eta_new, j_new


@jax.jit
@_highest_precision
def filter_parallel(ssm: SSM, xs: Array) -> Tuple[Array, Array, Array]:
    """O(log T)-depth Kalman filter via jax.lax.associative_scan.

    Returns (filtered means, filtered covs, total log-likelihood); the
    likelihood is assembled post-scan from one-step-ahead predictives.
    """
    t = xs.shape[0]
    rank = ssm.h.shape[1]
    m0 = jnp.zeros(rank, dtype=ssm.a.dtype)
    p0 = jnp.eye(rank, dtype=ssm.a.dtype)
    first = jnp.arange(t) == 0

    elems = jax.vmap(
        lambda a, q, y, f: _filter_element(ssm, a, q, y, f, m0, p0)
    )(ssm.a, ssm.q, xs, first)
    scanned = jax.lax.associative_scan(_filter_combine, elems)
    ms, ps = scanned[1], scanned[2]

    # log-likelihood from one-step-ahead predictive N(y_k; H m_k^-, S_k)
    m_prev = jnp.concatenate([m0[None], ms[:-1]], axis=0)
    p_prev = jnp.concatenate([p0[None], ps[:-1]], axis=0)
    mp = (ssm.a @ m_prev[..., None])[..., 0]
    pp = ssm.a @ p_prev @ jnp.swapaxes(ssm.a, -1, -2) + ssm.q
    s = ssm.h[None] @ pp @ ssm.h.T[None] + ssm.r[None]
    innov = xs - (ssm.h[None] @ mp[..., None])[..., 0]
    lls = jax.vmap(_mvn_logpdf)(innov, s)
    return ms, ps, jnp.sum(lls)


def _smoother_element(m, p, a_next, q_next, last):
    """Per-step element (E, g, L) of the parallel RTS smoother."""
    pp = a_next @ p @ a_next.T + q_next
    gain = jnp.linalg.solve(pp.T, (p @ a_next.T).T).T
    e = gain
    g = m - gain @ a_next @ m
    ell = p - gain @ pp @ gain.T
    e = jnp.where(last, jnp.zeros_like(e), e)
    g = jnp.where(last, m, g)
    ell = jnp.where(last, p, ell)
    return e, g, ell


def _smoother_combine(elem_a, elem_b):
    """Composition for the reverse suffix scan.

    With ``reverse=True`` the scan hands us (accumulated-suffix, current)
    and the result must be current-composed-with-suffix:
    m_s(i) = E_i m_s(i+1) + g_i applied outermost.
    """
    e_a, g_a, l_a = elem_a
    e_b, g_b, l_b = elem_b
    e = e_b @ e_a
    g = (e_b @ g_a[..., None])[..., 0] + g_b
    ell = e_b @ l_a @ jnp.swapaxes(e_b, -1, -2) + l_b
    return e, g, ell


@jax.jit
@_highest_precision
def smooth_parallel(ssm: SSM, xs: Array) -> Tuple[Array, Array]:
    """O(log T)-depth RTS smoother via associative scan over filtered
    moments (themselves computed with the parallel filter)."""
    ms, ps, _ = filter_parallel(ssm, xs)
    t = xs.shape[0]
    last = jnp.arange(t) == t - 1
    a_next = jnp.concatenate([ssm.a[1:], ssm.a[-1:]], axis=0)
    q_next = jnp.concatenate([ssm.q[1:], ssm.q[-1:]], axis=0)
    elems = jax.vmap(_smoother_element)(ms, ps, a_next, q_next, last)
    e, g, ell = jax.lax.associative_scan(_smoother_combine, elems, reverse=True)
    return g, ell


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
