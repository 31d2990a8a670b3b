"""Celerite-structured LEG family.

The reference sketches (commented-out TF code, models.py:552-592) a LEG
family whose latent generator is constrained to celerite structure: with
rank = 2 * nblocks,

  N: diagonal entries plus the subdiagonal entries (2k+1, 2k)
     (one coupling per 2-block),
  R: only the subdiagonal entries (2k+1, 2k),

so G = N N^T + R - R^T (+ eps I) is block-diagonal with 2x2 blocks --
each block a damped oscillator, the celerite kernel class (sums of
exponentially-damped sinusoids).  The parameter count drops from
O(rank^2) to O(nblocks).

This implementation makes the sketch real by EXPANDING the structured
parameters into a full `leg.LEGParams` pytree (zeros in the masked-out
positions) and reusing every LEG function -- likelihood, posteriors,
predictions, training -- unchanged; gradients flow through the expansion
so optimisation stays in the reduced parameter space.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.ops import partitioned as pt
from cyclic_gps_tpu.ops import smallblock as sb

Array = jnp.ndarray


class CeleriteParams(NamedTuple):
    """Structured parameters: rank = 2 * nblocks.

    n_diag:  [rank]     diagonal of N
    n_sub:   [nblocks]  N[2k+1, 2k]
    r_sub:   [nblocks]  R[2k+1, 2k] (antisymmetrised by g_matrix)
    lambda_params: [obs*(obs+1)/2] packed lower-tri (softplus on read)
    b:       [obs_dim, rank]
    """

    n_diag: Array
    n_sub: Array
    r_sub: Array
    lambda_params: Array
    b: Array

    @property
    def nblocks(self) -> int:
        return self.n_sub.shape[0]

    @property
    def rank(self) -> int:
        return self.b.shape[1]

    @property
    def obs_dim(self) -> int:
        return self.b.shape[0]


def parameter_count(nblocks: int, obs_dim: int) -> int:
    """3*nblocks (N) + nblocks (R) + obs tril + B (reference psize,
    models.py:570-575, with the structured N/R masks)."""
    rank = 2 * nblocks
    return (
        rank + nblocks + nblocks
        + obs_dim * (obs_dim + 1) // 2
        + obs_dim * rank
    )


def init_params(
    key: jax.Array,
    nblocks: int,
    obs_dim: int,
    prior_process_noise_level: float = 1.0,
    prior_length_scale: float = 0.2,
    dtype=jnp.float32,
) -> CeleriteParams:
    """Initial guess mirroring the reference sketch (models.py:577-583):
    N = noise_level * I (structured entries), R subdiagonal random *
    length_scale, Lambda = 0.1 I, B = 0.5 ones / row norm."""
    rank = 2 * nblocks
    n_diag = jnp.full((rank,), prior_process_noise_level, dtype=dtype)
    n_sub = jnp.zeros((nblocks,), dtype=dtype)
    r_sub = (
        jax.random.normal(key, (nblocks,), dtype=dtype) * prior_length_scale
    )
    lam = 0.1 * jnp.eye(obs_dim, dtype=dtype)
    lambda_params = lam[jnp.tril_indices(obs_dim)]
    b = jnp.ones((obs_dim, rank), dtype=dtype)
    b = 0.5 * b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True))
    return CeleriteParams(n_diag, n_sub, r_sub, lambda_params, b)


def _sub_positions(nblocks: int) -> Tuple[np.ndarray, np.ndarray]:
    """Row/col indices of the structured subdiagonal entries
    (2k+1, 2k)."""
    rows = 2 * np.arange(nblocks) + 1
    return rows, rows - 1


def expand(params: CeleriteParams) -> leg.LEGParams:
    """Structured -> full LEG parameters (packed tril layout); the
    masked-out positions are exact zeros, so gradients of any LEG
    function w.r.t. the structured parameters flow through this map."""
    rank = params.rank
    nb = params.nblocks
    dtype = params.n_diag.dtype

    n_full = jnp.zeros((rank, rank), dtype=dtype)
    n_full = n_full.at[jnp.arange(rank), jnp.arange(rank)].set(
        params.n_diag
    )
    rows, cols = _sub_positions(nb)
    n_full = n_full.at[rows, cols].set(params.n_sub)

    r_full = jnp.zeros((rank, rank), dtype=dtype)
    r_full = r_full.at[rows, cols].set(params.r_sub)

    return leg.LEGParams(
        n_params=n_full[jnp.tril_indices(rank)],
        r_params=r_full[jnp.tril_indices(rank, -1)],
        lambda_params=params.lambda_params,
        b=params.b,
    )


# ---------------------------------------------------------------------------
# Closed-form compute path (round 3).
#
# G is block-diagonal with 2x2 damped-oscillator blocks, so e = expm(-dG/2)
# and Q1 = I - e e^T factor per block and each 2x2 exponential has a CLOSED
# FORM: with A = -dG_k/2 = mu I + Delta, tr Delta = 0,
#
#   expm(A) = e^mu (cosh(w) I + sinh(w)/w Delta),   w = sqrt(q2),
#   q2 = Delta_00^2 + Delta_01 Delta_10        (sign selects cosh/cos)
#
# evaluated cancellation-free: E = expm(A) - I is assembled from
# expm1-style primitives so Q1 = -(E + E^T + E E^T) is exact to working
# precision at ANY gap (the role the Van Loan construction plays for
# dense G) -- no Pade evaluation, no [2r, 2r, N] intermediates, pure
# elementwise math that XLA fuses into a single kernel.  This is the
# compute advantage the celerite kernel class is defined by (reference
# sketch models.py:552-592 never ran); the expansion path above stays as
# the oracle (tests/test_celerite.py).
# ---------------------------------------------------------------------------

_SERIES_CUT = 0.29  # |w| below which the unified signed-q2 series is exact
                    # to f32 (w^6/5040 < 2^-23)


def g_blocks(params: CeleriteParams) -> Array:
    """The 2x2 diagonal blocks of G = N N^T + R - R^T + eps I as
    [nblocks, 2, 2] (the only nonzero structure under the celerite
    masks)."""
    n1 = params.n_diag[0::2]
    n2 = params.n_diag[1::2]
    ns = params.n_sub
    rs = params.r_sub
    eps = leg.G_DIAG_EPS
    g00 = n1 * n1 + eps
    g01 = n1 * ns - rs
    g10 = n1 * ns + rs
    g11 = ns * ns + n2 * n2 + eps
    return jnp.stack(
        [jnp.stack([g00, g01], -1), jnp.stack([g10, g11], -1)], -2
    )


def _block_e_terms(gb: Array, diffs: Array):
    """Per-block, per-gap closed-form (ecm1, esnc, alpha, beta, gamma):
    E = expm(-d G_k / 2) - I = ecm1 I + esnc Delta, Delta = [[alpha,
    beta], [gamma, -alpha]].  All [nb, M]; cancellation-free at any gap.

    Branches (selected on the sign/size of q2 = alpha^2 + beta gamma,
    inputs sanitised so every branch is finite AND has finite gradients):
      |q2| small : unified signed-q2 series for cosh-1 / sinhc
      q2 >= cut  : hyperbolic, paired as (expm1(mu+w) +/- expm1(mu-w))/2
                   (mu +/- w are the eigenvalues of A, both <= 0 for the
                   PSD-symmetric-part G, so nothing overflows)
      q2 <= -cut : trigonometric (damped oscillation)
    """
    d = diffs[None, :]  # [1, M]
    g00 = gb[:, 0, 0][:, None]
    g01 = gb[:, 0, 1][:, None]
    g10 = gb[:, 1, 0][:, None]
    g11 = gb[:, 1, 1][:, None]

    mu = -d * (g00 + g11) / 4.0
    alpha = -d * (g00 - g11) / 4.0
    beta = -d * g01 / 2.0
    gamma = -d * g10 / 2.0
    q2 = alpha * alpha + beta * gamma
    em1_mu = jnp.expm1(mu)
    hyper = q2 >= _SERIES_CUT**2
    trig = q2 <= -(_SERIES_CUT**2)
    # sqrt only where a branch consumes it: d(sqrt)/dq2 -> inf at q2 = 0
    # (reachable: decoupled equal-rate blocks), and a masked-out inf
    # still NaNs the backward pass
    w = jnp.sqrt(jnp.where(hyper | trig, jnp.abs(q2), _SERIES_CUT**2))

    # hyperbolic branch (sanitised w: 0 where unselected)
    w_h = jnp.where(hyper, w, 0.0)
    ep = jnp.expm1(mu + w_h)
    em = jnp.expm1(mu - w_h)
    ecm1_h = 0.5 * (ep + em)
    esnc_h = (ep - em) / (2.0 * jnp.maximum(w_h, _SERIES_CUT))

    # trigonometric branch
    w_t = jnp.where(trig, w, 0.0)
    cw = jnp.cos(w_t)
    ecm1_t = em1_mu * cw + (cw - 1.0)
    esnc_t = (1.0 + em1_mu) * jnp.sin(w_t) / jnp.maximum(w_t, _SERIES_CUT)

    # unified series in SIGNED q2 (covers both tiny-|q2| regimes):
    # cosh(w)-1 = sum q2^k/(2k)!, sinhc(w) = sum q2^k/(2k+1)!; truncation
    # < 1e-16 relative at the cut (f64-grade, Horner)
    q2_s = jnp.clip(q2, -(_SERIES_CUT**2), _SERIES_CUT**2)
    cm1_s = q2_s * (
        1.0 / 2.0 + q2_s * (
            1.0 / 24.0 + q2_s * (
                1.0 / 720.0 + q2_s * (
                    1.0 / 40320.0 + q2_s * (
                        1.0 / 3628800.0 + q2_s / 479001600.0)))))
    snc_s = 1.0 + q2_s * (
        1.0 / 6.0 + q2_s * (
            1.0 / 120.0 + q2_s * (
                1.0 / 5040.0 + q2_s * (
                    1.0 / 362880.0 + q2_s / 39916800.0))))
    ecm1_s = em1_mu * (1.0 + cm1_s) + cm1_s
    esnc_s = (1.0 + em1_mu) * snc_s

    ecm1 = jnp.where(hyper, ecm1_h, jnp.where(trig, ecm1_t, ecm1_s))
    esnc = jnp.where(hyper, esnc_h, jnp.where(trig, esnc_t, esnc_s))
    return ecm1, esnc, alpha, beta, gamma


def _block_eq_terms(gb: Array, diffs: Array):
    """Closed-form per-block (E = e - I, Q = I - e e^T) ENTRIES, each
    [nb, M]: ((E00, E01, E10, E11), (Q00, Q01, Q11)).  Q is computed as
    -(E + E^T + E E^T), exact at working precision for any gap (no
    cancellation against I).  The (e, Q) pair is everything the
    covariance-form chunked filter needs -- note NO inverse appears, so
    dt = 0 (masked/padded gaps) degenerates cleanly to (I, 0)."""
    ecm1, esnc, al, be, ga = _block_e_terms(gb, diffs)
    e00_m1 = ecm1 + esnc * al   # E_00
    e01 = esnc * be
    e10 = esnc * ga
    e11_m1 = ecm1 - esnc * al   # E_11

    q00 = -(2.0 * e00_m1 + e00_m1 * e00_m1 + e01 * e01)
    q11 = -(2.0 * e11_m1 + e11_m1 * e11_m1 + e10 * e10)
    q01 = -(e01 + e10 + e00_m1 * e10 + e01 * e11_m1)
    return (e00_m1, e01, e10, e11_m1), (q00, q01, q11)


def _block_gap_terms(gb: Array, diffs: Array):
    """Closed-form per-block `leg._q1_terms`: (off, d_left, d_right
    [nb, 2, 2, M], logq1 [M]) -- everything the precision assembly needs,
    built from 2x2 scalar algebra (adjugate inverses, exact 2x2 dets)."""
    (e00_m1, e01, e10, e11_m1), (q00, q01, q11) = _block_eq_terms(gb,
                                                                  diffs)
    e00 = 1.0 + e00_m1
    e11 = 1.0 + e11_m1

    det = q00 * q11 - q01 * q01
    inv_det = 1.0 / det
    # Q1^{-1} by adjugate
    i00 = q11 * inv_det
    i01 = -q01 * inv_det
    i11 = q00 * inv_det

    # off = -Q1^{-1} e
    o00 = -(i00 * e00 + i01 * e10)
    o01 = -(i00 * e01 + i01 * e11)
    o10 = -(i01 * e00 + i11 * e10)
    o11 = -(i01 * e01 + i11 * e11)

    # d_left = Q1^{-1} - I (push-through identity, leg._q1_terms)
    dl00 = i00 - 1.0
    dl01 = i01
    dl11 = i11 - 1.0

    # d_right = e^T Q1^{-1} e = -e^T off
    dr00 = -(e00 * o00 + e10 * o10)
    dr01 = -(e00 * o01 + e10 * o11)
    dr10 = -(e01 * o00 + e11 * o10)
    dr11 = -(e01 * o01 + e11 * o11)

    def m22(a, b, c, d):
        return jnp.stack(
            [jnp.stack([a, b], -2), jnp.stack([c, d], -2)], -3
        )  # [nb, 2, 2, M]

    off = m22(o00, o01, o10, o11)
    d_left = m22(dl00, dl01, dl01, dl11)
    d_right = m22(dr00, 0.5 * (dr01 + dr10), 0.5 * (dr01 + dr10), dr11)
    logq1 = jnp.sum(jnp.log(det), axis=0)  # [M]
    return off, d_left, d_right, logq1


def _assemble_blockdiag(blocks: Array) -> Array:
    """[nb, 2, 2, M] oscillator blocks -> dense block-diagonal
    [2 nb, 2 nb, M] element-major."""
    nb, _, _, m = blocks.shape
    rank = 2 * nb
    full = jnp.zeros((rank, rank, m), dtype=blocks.dtype)
    for k in range(nb):
        full = full.at[2 * k:2 * k + 2, 2 * k:2 * k + 2, :].set(blocks[k])
    return full


def gap_terms_from_blocks(gb: Array):
    """`leg._gap_terms_dense`-compatible closure on the oscillator
    blocks gb [nb, 2, 2]: diffs [M] -> (off1, d_left, d_right
    [r, r, M] element-major block-diagonal, log|Q1| per gap [M]) via
    the closed forms -- no matrix exponential.  Differentiable in gb
    (plain elementwise autodiff), which is how the fused kernel's
    backward replay reaches the structured parameters."""

    def fn(diffs):
        off_b, dl_b, dr_b, logq1 = _block_gap_terms(gb, diffs)
        return (_assemble_blockdiag(off_b), _assemble_blockdiag(dl_b),
                _assemble_blockdiag(dr_b), logq1)

    return fn


def gap_terms(params: CeleriteParams):
    """`leg._gap_terms_dense`-compatible closure: diffs [M] ->
    (off1, d_left, d_right [r, r, M] element-major block-diagonal,
    log|Q1| per gap [M]) via the closed forms -- no matrix exponential."""
    return gap_terms_from_blocks(g_blocks(params))


# ---------------------------------------------------------------------------
# Mega-fused likelihood core (round 4): the O(N * nblocks) SOLVE.  The
# closed-form emission above made the gap terms near-free, but the
# likelihood still paid the full-rank dense block-tridiagonal solve's
# HBM round trip -- writing then re-reading 2 r^2 N floats of (K, off)
# blocks (~4 GB at rank 16, N = 1e6: the measured 120 ms that tied the
# expansion path).  `ops/celerite_pallas` constructs each row's blocks
# in VMEM from the gap widths (2x2 scalar algebra per oscillator) and
# eliminates them in place: HBM traffic = read dt + read v + boundary
# rows.  The backward replays the XLA closed-form route, whose adjoints
# (solver: one solve + one selected inversion; emission: elementwise
# autodiff) already exist.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _cel_gap_mahal_fused(gb, boost, ts, v_cm, s):
    """(v^T K^{-1} v, log|K|, log|Sigma^{-1}|) straight from the gap
    widths (celerite structure, TPU f32).  ``v_cm`` [s, r, C] at the
    TRUE chunk count C = ceil(n / s); the celerite twin of
    `leg._gap_mahal_fused`."""
    from cyclic_gps_tpu.ops import smallblock as sb
    from cyclic_gps_tpu.ops.celerite_pallas import (
        celerite_gap_mahal_sweep_pallas)

    rank = 2 * gb.shape[0]
    dtype = boost.dtype
    n = ts.shape[0]
    c = -(-n // s)
    diffs, gap_valid, is_real = leg._chunk_gap_geometry(ts, s, n, c, dtype)

    # chunk-crossing d_left row (gap c*s - 1 feeds row 0 of chunk c):
    # closed form on the C boundary gaps, shifted right (zeros into
    # chunk 0) -- see leg._k_gap_parts_pallas
    _, dl_b, _, _ = _block_gap_terms(gb, diffs[s - 1])
    dl_w = _assemble_blockdiag(dl_b) * gap_valid[s - 1][None, None, :]
    wrap = jnp.concatenate(
        [jnp.zeros((rank, rank, 1), dtype=dtype), dl_w[:, :, :-1]], axis=-1
    )
    (acc00, accy0, w0l, wl, dl, invdl, mh, ld, lq_sum, k0,
     olast) = celerite_gap_mahal_sweep_pallas(
        gb, boost, diffs, gap_valid, is_real, wrap, v_cm)
    state = pt._SweepState(None, w0l, wl, dl, invdl, acc00, accy0, mh, ld)
    w1 = sb.solve_lower(dl, invdl, sb.transpose(olast))
    red_diag, red_off, red_rhs = pt._reduced_system(
        k0[None], v_cm[:1], state, w1
    )
    red_mh, red_ld = pt._mahal_and_logdet_impl(
        sb.from_em(red_diag), sb.from_em(red_off)[: c - 1],
        sb.vec_from_em(red_rhs), None, 0.0,
    )
    return mh + red_mh, 2.0 * ld + red_ld, -lq_sum


def _cel_gap_mahal_fused_fwd(gb, boost, ts, v_cm, s):
    return (_cel_gap_mahal_fused(gb, boost, ts, v_cm, s),
            (gb, boost, ts, v_cm))


def _cel_gap_mahal_fused_bwd(s, res, cots):
    """Replay the XLA closed-form route (gap emission -> chunk-major
    mahal): the solver part's custom VJP is analytic (one solve + one
    selected inversion) and the emission is plain elementwise autodiff
    through the 2x2 closed forms."""
    gb, boost, ts, v_cm = res
    rank = 2 * gb.shape[0]

    def ref(gb_, boost_, ts_, v_):
        k_cm, off_cm, lq_cm = leg._k_gap_parts_xla(
            gap_terms_from_blocks(gb_), boost_, ts_, s, False, rank,
            boost_.dtype,
        )
        mh, ld = pt.mahal_and_logdet_cm(k_cm, off_cm, v_, backend="auto")
        return mh, ld, -jnp.sum(lq_cm)

    _, vjp = jax.vjp(ref, gb, boost, ts, v_cm)
    return vjp(cots)


_cel_gap_mahal_fused.defvjp(_cel_gap_mahal_fused_fwd,
                            _cel_gap_mahal_fused_bwd)


# ---------------------------------------------------------------------------
# Chunked conditional-filter likelihood (round 4): the true O(N r^2 q)
# celerite solve.  The mega-fused sweep above still ELIMINATES dense
# r x r blocks (O(r^3)/step Cholesky + solves); the covariance-form
# filter needs only O(r^2 q)/step -- see ops/chunked_filter.py for the
# chunk-parallel decomposition (conditional filter per chunk + exact
# boundary-chain integral).  This XLA entry is the oracle/CPU path; the
# TPU hot path is the Pallas twin (ops/celerite_pallas).
# ---------------------------------------------------------------------------


def _filter_inputs(params: CeleriteParams, ts: Array, xs: Array, s: int):
    """Chunk-major (e, Q, y, valid) inputs for the conditional filter:
    e/q [s, C, r, r] batch-major block-diagonal (masked gaps exactly
    (I, 0)), y [s, C, q], valid [s, C]."""
    gb = g_blocks(params)
    rank = 2 * gb.shape[0]
    dtype = gb.dtype
    n = ts.shape[0]
    c = -(-n // s)
    diffs, gap_valid, is_real = leg._chunk_gap_geometry(ts, s, n, c, dtype)

    flat = diffs.reshape(-1)                      # [s*C], j-major
    (e00m, e01, e10, e11m), (q00, q01, q11) = _block_eq_terms(gb, flat)
    z = jnp.zeros_like(e00m)

    def m22(a, b, cc, d):
        return jnp.stack(
            [jnp.stack([a, b], -2), jnp.stack([cc, d], -2)], -3
        )  # [nb, 2, 2, M]

    def cm(x_em):  # [r, r, s*C] -> [s, C, r, r]
        return jnp.transpose(x_em.reshape(rank, rank, s, c), (2, 3, 0, 1))

    gv = gap_valid.reshape(-1)[None, None, None, :]
    e_full = cm(
        _assemble_blockdiag(m22(e00m, e01, e10, e11m) * gv)
    ) + jnp.eye(rank, dtype=dtype)
    q_full = cm(_assemble_blockdiag(m22(q00, q01, q01, q11) * gv))

    m = c * s
    qd = xs.shape[1]
    xs_pad = jnp.concatenate(
        [xs, jnp.zeros((m - n, qd), dtype=xs.dtype)], axis=0
    )
    y_cm = jnp.transpose(xs_pad.reshape(c, s, qd), (1, 0, 2))  # [s, C, q]
    return e_full, q_full, y_cm, is_real


@partial(jax.jit, static_argnames=("backend",))
@leg._highest_precision
def log_likelihood_filter(params: CeleriteParams, ts: Array, xs: Array,
                          backend: str = "auto") -> Array:
    """Marginal log-likelihood via the chunk-parallel conditional Kalman
    filter (ops/chunked_filter): O(N r^2 q) total work instead of the
    block-elimination's O(N r^3) -- the compute scaling the celerite
    kernel class is defined by.  Exact (same chunk decomposition as the
    partitioned engine, in covariance form); f32-safe (innovation form).

    ``backend="pallas"``/TPU f32 runs the fused Pallas sweep
    (closed-form (e, Q) constructed in VMEM, filter recursion in VMEM,
    only per-chunk boundary statistics reach HBM); elsewhere the XLA
    scan twin."""
    from cyclic_gps_tpu.ops import chunked_filter as cf

    num_obs = ts.shape[0]
    s = pt.default_chunk_len(num_obs)
    if num_obs < max(pt._TERMINAL, 2 * s):
        return leg.log_likelihood(expand(params), ts, xs)
    lam = leg.lambda_lambda_t(params)
    use_pallas = (
        params.n_diag.dtype == jnp.float32
        and pt.resolve_backend(backend) == "pallas"
    )
    nq = jnp.asarray(num_obs * xs.shape[1], dtype=lam.dtype)
    if use_pallas:
        out = _cel_filter_pallas(g_blocks(params), params.b, lam, ts, xs, s)
        return cf.boundary_loglik_em(out, nq)
    e_cm, q_cm, y_cm, valid = _filter_inputs(params, ts, xs, s)
    # custom-vjp entry: gradients run the ANALYTIC O(r^2 q) adjoint
    # (ops/chunked_filter.conditional_filter_adjoint_xla), not autodiff
    # through the scan
    out = cf.conditional_filter(e_cm, q_cm, params.b, lam, y_cm, valid)
    return cf.boundary_loglik(out, nq)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _cel_filter_pallas(gb, b, lam, ts, xs, s):
    from cyclic_gps_tpu.ops import chunked_filter as cf
    from cyclic_gps_tpu.ops.celerite_pallas import (
        celerite_filter_sweep_pallas)

    n = ts.shape[0]
    c = -(-n // s)
    dtype = gb.dtype
    diffs, gap_valid, is_real = leg._chunk_gap_geometry(ts, s, n, c, dtype)
    m = c * s
    qd = xs.shape[1]
    xs_pad = jnp.concatenate(
        [xs, jnp.zeros((m - n, qd), dtype=xs.dtype)], axis=0
    )
    # [s, q, C]: natural row i = c*s + j at [j, :, c]
    y_cm = jnp.transpose(xs_pad.reshape(c, s, qd), (1, 2, 0))
    # element-major stats, straight into boundary_loglik_em
    return celerite_filter_sweep_pallas(
        gb, b, lam, diffs, gap_valid, is_real, y_cm
    )


def _cel_filter_pallas_fwd(gb, b, lam, ts, xs, s):
    return _cel_filter_pallas(gb, b, lam, ts, xs, s), (gb, b, lam, ts, xs)


def _cel_filter_pallas_bwd(s, res, cots):
    """ANALYTIC adjoint, fully fused: one forward COLLECT sweep (stores
    the per-step pre-update filter state) + one DESCENDING adjoint
    kernel (ops/celerite_pallas.celerite_filter_adjoint_pallas), both
    O(r^2 q)/step -- the same scaling as the primal.  The kernel emits
    per-gap cotangents only for the 2x2 diagonal blocks of (e, Q); the
    closed-form emission and the gap geometry are then chained back to
    (gb, ts) by ordinary autodiff (elementwise).  The XLA oracle for
    the whole path is `cf.conditional_filter`'s custom VJP
    (tests/test_celerite.py)."""
    from cyclic_gps_tpu.ops import celerite_pallas as cp

    gb, b, lam, ts, xs = res
    nb = gb.shape[0]
    n = ts.shape[0]
    c = -(-n // s)
    dtype = gb.dtype
    diffs, gap_valid, is_real = leg._chunk_gap_geometry(ts, s, n, c,
                                                        dtype)
    m = c * s
    qd = xs.shape[1]
    xs_pad = jnp.concatenate(
        [xs, jnp.zeros((m - n, qd), dtype=xs.dtype)], axis=0
    )
    y_cm = jnp.transpose(xs_pad.reshape(c, s, qd), (1, 2, 0))
    _, hists = cp.celerite_filter_collect_sweep_pallas(
        gb, b, lam, diffs, gap_valid, is_real, y_cm)
    ebar, qbar, ybar, bbar, lambar = cp.celerite_filter_adjoint_pallas(
        gb, b, lam, diffs, gap_valid, is_real, y_cm, hists, tuple(cots))

    # chain the per-block cotangents through the closed forms (the
    # kernel's e = I + gv E, q = gv Q1: the constant I drops out) and
    # the gap geometry back to (gb, ts)
    def emission(gb_, ts_):
        d_, gv_, _ = leg._chunk_gap_geometry(ts_, s, n, c, dtype)
        flat = d_.reshape(-1)                # j-major [s*C]
        (e00m, e01, e10, e11m), (q00, q01, q11) = _block_eq_terms(gb_,
                                                                  flat)
        gvf = gv_.reshape(-1)[None, :]
        return (gvf * e00m, gvf * e01, gvf * e10, gvf * e11m,
                gvf * q00, gvf * q01, gvf * q11)

    def blk(x, i):  # [s, nb, 4, C] entry i -> [nb, s*C] (j-major)
        return jnp.transpose(x[:, :, i, :], (1, 0, 2)).reshape(nb, -1)

    cot_streams = (
        blk(ebar, 0), blk(ebar, 1), blk(ebar, 2), blk(ebar, 3),
        blk(qbar, 0), blk(qbar, 1) + blk(qbar, 2), blk(qbar, 3),
    )
    _, vjp = jax.vjp(emission, gb, ts)
    gbbar, tsbar = vjp(cot_streams)

    xs_padbar = jnp.transpose(ybar, (2, 0, 1)).reshape(m, qd)
    return gbbar, bbar, lambar, tsbar, xs_padbar[:n]


_cel_filter_pallas.defvjp(_cel_filter_pallas_fwd, _cel_filter_pallas_bwd)


@partial(jax.jit, static_argnames=("regular", "backend"))
def log_likelihood(
    params: CeleriteParams, ts: Array, xs: Array, regular: bool = False,
    backend: str = "auto",
) -> Array:
    """Marginal log-likelihood under the celerite structure.

    Large N on TPU f32 runs the MEGA-FUSED celerite sweep: closed-form
    2x2 gap terms constructed in VMEM and eliminated in place
    (`ops/celerite_pallas`) -- the O(N * nblocks) total-inference path
    the celerite kernel class is defined by (HBM traffic ~r N floats
    instead of the dense solve's ~6 r^2 N).  Large N elsewhere runs the
    closed-form gap emission (`gap_terms`) into the partitioned
    engine's chunk-major system.  Small N falls back to the expansion
    path (`expand` + leg.log_likelihood), which doubles as the parity
    oracle (tests/test_celerite.py)."""
    num_obs = ts.shape[0]
    s = pt.default_chunk_len(num_obs)
    if num_obs < max(pt._TERMINAL, 2 * s):
        return leg.log_likelihood(expand(params), ts, xs, regular=regular)

    llt = leg.lambda_lambda_t(params)
    x_llt_inv = jnp.linalg.solve(llt, xs.T).T
    llt_mahal = jnp.sum(x_llt_inv * xs)
    llt_logdet = num_obs * jnp.linalg.slogdet(2.0 * jnp.pi * llt)[1]
    use_fused = (
        params.n_diag.dtype == jnp.float32
        and pt.resolve_backend(backend) == "pallas"
    )
    if use_fused:
        c = -(-num_obs // s)
        boost = params.b.T @ jnp.linalg.solve(llt, params.b)
        v_cm = leg._v_chunk_major(params, xs, llt, s, c, llt.dtype)
        k_mahal, k_logdet, sig_inv_logdet = _cel_gap_mahal_fused(
            g_blocks(params), boost, ts, v_cm, s
        )
    else:
        k_cm, o_cm, v_cm, sig_inv_logdet = leg._k_system_chunked(
            params, ts, xs, s, regular, gap_fn=gap_terms(params)
        )
        k_mahal, k_logdet = pt.mahal_and_logdet_cm(k_cm, o_cm, v_cm,
                                                   backend=backend)
    mahal = llt_mahal - k_mahal
    logdet = llt_logdet + k_logdet - sig_inv_logdet
    return -0.5 * (mahal + logdet)


def make_predictions(params: CeleriteParams, ts, xs, target_ts, **kw):
    return leg.make_predictions(expand(params), ts, xs, target_ts, **kw)


def nll_loss(params: CeleriteParams, ts: Array, xs: Array,
             method: str = "auto") -> Array:
    """-log_likelihood / nobs on the structured parameters (drop-in for
    train.loop-style optimisation).

    ``method="auto"`` (default) trains through the conditional-filter
    route: O(N r^2 q) forward AND backward (the analytic adjoint
    kernels, round 5) -- on device at N = 1e6, nblocks = 8 the Adam
    step is ~4.4x the precision-sweep route's, whose backward pays the
    rank-2*nb dense solve + selected inversion (and the expanded-LEG
    gradient does not even compile at nblocks = 8).
    ``method="precision"`` keeps the fused precision-sweep route (the
    cross-engine oracle)."""
    if method == "auto" or method == "filter":
        return -log_likelihood_filter(params, ts, xs) / xs.size
    return -log_likelihood(params, ts, xs) / xs.size
