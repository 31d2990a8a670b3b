"""LEG (Latent Exponentially Generated) Gaussian-process family.

Model (reference cyclic_gps/models.py:22-25):

    z ~ PEG(N, R)           a stationary latent Markov process with unit
                            stationary covariance and generator
                            G = N N^T + R - R^T (+ 1e-5 I),
    x(t) ~ Normal(B z(t), Lambda Lambda^T).

Because the PEG prior is Markov, its precision over any time grid is
block-tridiagonal; every expensive quantity reduces to cyclic reduction
(ops/cyclic_reduction.py).

This is a functional re-design of the reference's LightningModule
(cyclic_gps/models.py): parameters are a pytree (`LEGParams`), every method
is a pure jittable function, and prediction is a single vmap over target
times instead of a Python loop (reference models.py:454-514).  Matrix
exponentials are element-major batched Pade (ops/expm_em.py) rather than
the reference's eigendecomposition route (model_utils.py:12-29), since
nonsymmetric `eig` has no TPU/accelerator implementation and vmapped
[N, r, r] exponentials tile-pad ~32x on TPU.  The gap -> (transition,
conditional covariance) map uses a hybrid Van Loan / direct construction
(`transition_and_noise_em`), and the large-N likelihood/posterior paths
emit the posterior-precision system directly in the partitioned engine's
chunk-major layout (`_k_system_chunked`).

Parameter packing matches the reference exactly (models.py:27-73):
N lower-tri incl diag, R strictly-lower, Lambda lower-tri incl diag with a
softplus applied on read (models.py:148), B dense.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cyclic_gps_tpu.models.gaussians import (
    build_2x2_block,
    build_3x3_block,
    gaussian_stitch,
)
from cyclic_gps_tpu.ops import cyclic_reduction as cr
from cyclic_gps_tpu.ops import partitioned as pt
from cyclic_gps_tpu.ops import smallblock as sb

Array = jnp.ndarray

G_DIAG_EPS = 1e-5  # reference models.py:158
LLT_DIAG_EPS = 1e-9  # reference models.py:165


def _highest_precision(fn):
    """Force full-precision matmuls inside model math.

    On TPU the default matmul precision truncates f32 inputs to bfloat16 on
    the MXU; the PEG precision construction computes I - e e^T with e close
    to I for small time gaps, where bf16 cancellation makes the blocks
    non-SPD and the downstream Cholesky NaNs (observed in training).  All
    matrices here are tiny (d <= ~10), so full precision is free.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


class LEGParams(NamedTuple):
    """Trainable parameters, packed as in the reference (models.py:38-68)."""

    n_params: Array  # [rank*(rank+1)/2]  lower-tri incl diag of N
    r_params: Array  # [rank*(rank-1)/2]  strictly-lower of R
    lambda_params: Array  # [obs*(obs+1)/2] lower-tri incl diag (softplus on read)
    b: Array  # [obs_dim, rank]

    @property
    def rank(self) -> int:
        return self.b.shape[1]

    @property
    def obs_dim(self) -> int:
        return self.b.shape[0]


def tril_indices(n: int, offset: int = 0):
    return jnp.tril_indices(n, offset)


def parameter_count(rank: int, obs_dim: int) -> int:
    """Total trainable scalars (reference models.py:123-133)."""
    return (
        rank * (rank + 1) // 2
        + rank * (rank - 1) // 2
        + obs_dim * (obs_dim + 1) // 2
        + obs_dim * rank
    )


def init_params(
    key: jax.Array,
    rank: int,
    obs_dim: int,
    prior_process_noise_level: float = 1.0,
    prior_length_scale: float = 0.2,
    dtype=jnp.float32,
) -> LEGParams:
    """Initial guess matching the reference (models.py:93-121):

    N = noise_level * I (via chol(N N^T)); R = (Z - Z^T) * length_scale with
    Z standard normal; Lambda = 0.1 * I (packed raw; softplus applied on
    read); B = 0.5 * ones / row-norm.
    """
    n_mat = jnp.eye(rank, dtype=dtype) * prior_process_noise_level
    n_mat = jnp.linalg.cholesky(n_mat @ n_mat.T)
    n_params = n_mat[tril_indices(rank, 0)]

    z = jax.random.normal(key, (rank, rank), dtype=dtype)
    r_mat = (z - z.T) * prior_length_scale
    r_params = r_mat[tril_indices(rank, -1)]

    lam = 0.1 * jnp.eye(obs_dim, dtype=dtype)
    lam = jnp.linalg.cholesky(lam @ lam.T)
    lambda_params = lam[tril_indices(obs_dim, 0)]

    b = jnp.ones((obs_dim, rank), dtype=dtype)
    b = 0.5 * b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True))
    return LEGParams(n_params, r_params, lambda_params, b)


def n_matrix(params: LEGParams) -> Array:
    rank = params.rank
    n = jnp.zeros((rank, rank), dtype=params.n_params.dtype)
    return n.at[tril_indices(rank, 0)].set(params.n_params)


def r_matrix(params: LEGParams) -> Array:
    rank = params.rank
    r = jnp.zeros((rank, rank), dtype=params.r_params.dtype)
    return r.at[tril_indices(rank, -1)].set(params.r_params)


def lambda_matrix(params: LEGParams) -> Array:
    """Softplus-positivised lower-triangular Lambda (models.py:145-150)."""
    obs = params.obs_dim
    lam = jnp.zeros((obs, obs), dtype=params.lambda_params.dtype)
    return lam.at[tril_indices(obs, 0)].set(
        jax.nn.softplus(params.lambda_params)
    )


def g_matrix(params: LEGParams) -> Array:
    """PEG generator G = N N^T + R - R^T + 1e-5 I (models.py:152-159)."""
    n = n_matrix(params)
    r = r_matrix(params)
    g = n @ n.T + r - r.T
    return g + jnp.eye(params.rank, dtype=g.dtype) * G_DIAG_EPS


def lambda_lambda_t(params: LEGParams) -> Array:
    """Observation noise covariance + eps I (models.py:161-170).

    eps is the reference's 1e-9 at float64; at float32 a 1e-6 floor keeps
    S^{-1} (and the parallel filter's information elements) within f32
    range when training drives the learned noise toward zero."""
    lam = lambda_matrix(params)
    llt = lam @ lam.T
    eps = LLT_DIAG_EPS if llt.dtype == jnp.float64 else 1e-6
    return llt + eps * jnp.eye(params.obs_dim, dtype=llt.dtype)


@_highest_precision
def expm_batch(mats: Array) -> Array:
    """Batched matrix exponential of [..., d, d]."""
    flat = mats.reshape((-1,) + mats.shape[-2:])
    out = jax.vmap(jax.scipy.linalg.expm)(flat)
    return out.reshape(mats.shape)


@_highest_precision
def transition_and_noise(g: Array, diffs: Array) -> Tuple[Array, Array]:
    """Per-gap transition e = expm(-.5 d G) and conditional covariance
    Q = I - e e^T, computed WITHOUT cancellation via Van Loan's augmented
    matrix exponential.

    Forming I - e e^T directly loses ~log10(1/(d*|G|)) digits for small
    gaps; at float32 the resulting PEG precision can be perturbed past
    indefiniteness (observed: training NaNs once the learned process gets
    smooth).  Van Loan (1978): with A = -G/2 and S = (G + G^T)/2 (the
    stationary Lyapunov residual, so Q(d) = int_0^d e^{As} S e^{A^T s} ds),

        expm([[A, S], [0, -A^T]] * d) = [[e, P], [0, e^{-T}]],
        Q = P e^T,

    which is accurate to the working precision of its entries.
    Returns (e [T, r, r], q [T, r, r]).
    """
    e_em, q_em = transition_and_noise_em(g, diffs)
    return sb.from_em(e_em), sb.from_em(q_em)


def transition_and_noise_em(g: Array, diffs: Array) -> Tuple[Array, Array]:
    """Element-major `transition_and_noise`: returns (e, q) as [r, r, T].

    Dispatch: on TPU at float32 with a single generator, the whole
    hybrid construction runs as ONE fused Pallas kernel
    (ops/expm_pallas.py) -- the XLA Pade pipeline's [2r, 2r, T]
    intermediates cannot fuse and round-trip ~10 GB of HBM at T = 1e6
    (the dominant cost of the irregular-grid likelihood).  Gradients
    replay the XLA path's adjoint (custom VJP).
    """
    if (getattr(g, "ndim", 2) == 2 and g.dtype == jnp.float32
            and pt.resolve_backend("auto") == "pallas"):
        return _tn_pallas_diff(g, diffs)
    return _transition_and_noise_em_xla(g, diffs)


@jax.custom_vjp
def _tn_pallas_diff(g: Array, diffs: Array) -> Tuple[Array, Array]:
    from cyclic_gps_tpu.ops.expm_pallas import transition_and_noise_pallas

    return transition_and_noise_pallas(g, diffs)


def _tn_pallas_fwd(g, diffs):
    return _tn_pallas_diff(g, diffs), (g, diffs)


def _tn_pallas_bwd(res, cots):
    # the Pallas forward has no AD rule; replay the STRUCTURED Pade-7
    # twin of the kernel math (ops/expm_pallas.tn_replay_structured):
    # plain matmul-chain autodiff on r x r blocks, vs round 2's generic
    # Pade-13 replay whose Frechet VJP held [4r, 4r, M] temporaries
    # (the dominant cost of the irregular-grid gradient)
    from cyclic_gps_tpu.ops.expm_pallas import tn_replay_structured

    g, diffs = res
    _, vjp = jax.vjp(_highest_precision(tn_replay_structured), g, diffs)
    return vjp(cots)


_tn_pallas_diff.defvjp(_tn_pallas_fwd, _tn_pallas_bwd)


@_highest_precision
def _transition_and_noise_em_xla(g: Array, diffs: Array) -> Tuple[Array, Array]:
    """XLA implementation of `transition_and_noise_em`.

    The whole computation (augmented expm + block extraction + P e^T)
    runs in element-major layout with the gap axis on the lanes --
    [T, d, d]-shaped temporaries would be tile-padded ~32x on TPU and a
    vmapped expm at T = 1e6 exhausts HBM (observed).

    ``g`` may carry a leading stack axis [K, r, r] with ``diffs`` of
    length K*T (gap i uses generator i // T): used to fuse the G and G^T
    Van Loan calls into one batched expm.

    Hybrid per gap: Van Loan's augmented exponential contains the GROWING
    block e^{+d A^T}, which for large gaps (e^{|d G|/2} >> 1/eps)
    contaminates the P block through the Pade squaring recursion.  But the
    direct formula I - e e^T only cancels for SMALL gaps.  So: Van Loan
    (with the gap clamped into its stable range, so the unselected branch
    stays finite for gradients) where |d G|/2 < 1, direct elsewhere --
    each branch used exactly where it is accurate to working precision.
    """
    from cyclic_gps_tpu.ops.expm_em import expm_em

    gs = g if g.ndim == 3 else g[None]
    k = gs.shape[0]
    r = gs.shape[-1]
    t = diffs.shape[0] // k

    def augmented(gg):
        a = -0.5 * gg
        s = 0.5 * (gg + gg.T)
        top = jnp.concatenate([a, s], axis=-1)
        bot = jnp.concatenate([jnp.zeros_like(a), -a.T], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)  # [2r, 2r]

    ms = jnp.stack([augmented(gs[i]) for i in range(k)], axis=0)
    # per-generator half-norms to locate the cancellation regime
    half_norms = jnp.max(
        jnp.sum(jnp.abs(-0.5 * gs), axis=-1), axis=-1
    )  # [K]
    d_kt = diffs.reshape(k, t)
    t_norm = d_kt * half_norms[:, None]  # [K, T]
    small = (t_norm < 1.0)
    d_clamped = jnp.where(small, d_kt, 1.0 / half_norms[:, None])

    # Van Loan branch (clamped gaps), 2r x 2r
    m_em = (
        jnp.transpose(ms, (1, 2, 0))[:, :, :, None]
        * d_clamped[None, None]
    ).reshape(2 * r, 2 * r, k * t)
    big = expm_em(m_em)
    p = big[:r, r:]
    e_vl = big[:r, :r]
    q_vl = sb.matmul(p, e_vl, tb=True)

    # direct branch (true gaps), r x r -- e is decaying, always stable
    a_em = (
        jnp.transpose(jnp.stack([-0.5 * gs[i] for i in range(k)]),
                      (1, 2, 0))[:, :, :, None]
        * d_kt[None, None]
    ).reshape(r, r, k * t)
    e = expm_em(a_em)
    eye = jnp.eye(r, dtype=g.dtype)[:, :, None]
    q_direct = eye - sb.matmul(e, e, tb=True)

    mask = small.reshape(-1)[None, None, :].astype(g.dtype)
    q = mask * q_vl + (1.0 - mask) * q_direct
    q = 0.5 * (q + sb.transpose(q))
    return e, q


@_highest_precision
def peg_precision(g: Array, ts: Array) -> Tuple[Array, Array]:
    """Block-tridiagonal precision of the PEG latent on grid ``ts``.

    Reference models.py:180-239.  With e_i = expm(-0.5 (t_{i+1}-t_i) G),
    Q1_i = I - e_i e_i^T and Q2_i = I - e_i^T e_i (both formed stably via
    `transition_and_noise`):
      off_i  = -Q1_i^{-1} e_i
      diag_i = I + [e_{i-1} Q2_{i-1}^{-1} e_{i-1}^T  if i > 0]
                 + [e_i^T Q1_i^{-1} e_i  if i < N-1]
    (the chain-rule precision of the Markov factorisation: the left
    interval contributes Q1_{i-1}^{-1} = I + e Q2^{-1} e^T by Woodbury,
    the right interval contributes e^T Q1^{-1} e)
    The boundary terms implement the infinite lead-in/lead-out
    (models.py:226-237).  Returns ([N, r, r] diag, [N-1, r, r] lower-off).
    """
    return peg_precision_and_logdet(g, ts)[:2]


@_highest_precision
def peg_precision_and_logdet(g: Array, ts: Array):
    """(diag, off, log|Sigma^{-1}|) of the PEG prior on ``ts``.

    The log-determinant has a closed form by Markovianity: the joint
    density factorises into stationary unit-covariance conditionals, so
    log|Sigma| = sum_i log|Q1_i| and log|Sigma^{-1}| = -log|Sigma|.  This
    replaces the reference's extra cyclic-reduction pass over the bare
    prior precision (models.py:349-353) -- the globally worst-conditioned
    factorization in the model -- with an exact, cheap, unconditionally
    stable formula.
    """
    diag_em, off_em, sig_inv_logdet = _peg_precision_em(g, ts)
    return sb.from_em(diag_em), sb.from_em(off_em), sig_inv_logdet


def _q1_terms(e, q1):
    """From (e, Q1 = I - e e^T): the three precision ingredients

      off    = -Q1^{-1} e
      d_left = e Q2^{-1} e^T = Q1^{-1} e e^T = Q1^{-1} - I   (push-through)
      d_right = e^T Q1^{-1} e

    The push-through identity e (I - e^T e)^{-1} = (I - e e^T)^{-1} e
    eliminates Q2 entirely -- and with it the SECOND Van Loan matrix
    exponential (for G^T) that round 1 computed, halving the dominant
    emission cost of the likelihood.  Returns (off, d_left, d_right, l1).
    """
    rank = e.shape[0]
    l1, inv1 = sb.cholesky(q1)
    q1_inv_e = sb.solve_lower_t(l1, inv1, sb.solve_lower(l1, inv1, e))
    li = sb.tri_lower_inverse(l1, inv1)
    eye = jnp.eye(rank, dtype=e.dtype)[:, :, None]
    d_left = sb.matmul(li, li, ta=True) - eye  # Q1^{-1} - I
    d_right = sb.matmul(sb.transpose(e), q1_inv_e)
    return -q1_inv_e, d_left, d_right, l1


@_highest_precision
def _peg_precision_em(g: Array, ts: Array):
    """Element-major precision assembly: (diag [r, r, N],
    off [r, r, N-1], log|Sigma^{-1}|).  All solves are Cholesky-based
    small-block sweeps with the gap axis on the lanes."""
    rank = g.shape[0]
    diffs = ts[1:] - ts[:-1]
    e, q1 = transition_and_noise_em(g, diffs)
    off, d_left, d_right, l1 = _q1_terms(e, q1)

    # diag_i = I + d_left[i-1] + d_right[i]  (gap g connects points g, g+1)
    zero = jnp.zeros((rank, rank, 1), dtype=g.dtype)
    eye = jnp.eye(rank, dtype=g.dtype)[:, :, None]
    diag = (
        eye
        + jnp.concatenate([zero, d_left], axis=-1)
        + jnp.concatenate([d_right, zero], axis=-1)
    )
    logdet_prior = 2.0 * sb.chol_log_diag_sum(l1)
    return diag, off, -logdet_prior


@_highest_precision
def _peg_precision_em_regular(g: Array, dt: Array, num_obs: int):
    """Element-major precision for a REGULAR grid with gap ``dt``: one
    matrix exponential instead of N-1 (the dominant cost of the general
    path at large N), then broadcast blocks."""
    rank = g.shape[0]
    t = num_obs - 1
    e1, q1 = transition_and_noise_em(g, jnp.full((1,), dt, dtype=g.dtype))
    off1, d_left, d_right, l1 = _q1_terms(e1, q1)

    zero = jnp.zeros((rank, rank, 1), dtype=g.dtype)
    eye = jnp.eye(rank, dtype=g.dtype)[:, :, None]
    mid = jnp.broadcast_to(
        eye + d_left + d_right, (rank, rank, max(num_obs - 2, 0))
    )
    diag = jnp.concatenate([eye + d_right, mid, eye + d_left], axis=-1)
    off = jnp.broadcast_to(off1, (rank, rank, t))
    logdet_prior = 2.0 * t * sb.chol_log_diag_sum(l1)
    return diag, off, -logdet_prior


def _gap_terms_dense(g: Array):
    """Gap-emission closure for a DENSE generator: diffs [M] ->
    (off1, d_left, d_right [r, r, M] element-major, log|Q1| per gap [M]).
    The pluggable interface `_k_system_chunked` consumes — structured
    families (models/celerite.py) supply closed-form equivalents that
    bypass the Pade pipeline entirely."""

    def fn(diffs):
        e, q1 = transition_and_noise_em(g, diffs)
        off1, d_left, d_right, l1 = _q1_terms(e, q1)
        logq1 = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(l1, axis1=0, axis2=1)), axis=1
        )
        return off1, d_left, d_right, logq1

    return fn


# Gap-slab size for the streamed emission adjoint.  The whole-M adjoint
# of the Pade pipeline holds [4r, 4r, M] augmented-Frechet temporaries
# (~1.5 GB EACH at rank 5, M = 1e6): the irregular-grid gradient OOMs a
# 16 GB chip beyond M ~ 2e5.  Streaming in 64 K-gap slabs bounds those
# at ~100 MB.
_ADJ_SLAB = 65536


def _gap_terms_dense_streamed(g: Array, slab: int = _ADJ_SLAB):
    """`_gap_terms_dense(g)` evaluated slab-wise under rematerialisation.

    Identical values; but both the forward and the REVERSE sweep hold
    only one slab's Pade/Frechet temporaries at a time (`lax.map` over
    `jax.checkpoint`-ed slabs: the reverse pass recomputes each slab's
    forward instead of storing it).  This is what makes the
    irregular-grid likelihood differentiable at N >= 1e6 f32 — the
    gradient replay routes through here (`_k_gap_parts_pallas_bwd`)."""

    def fn(diffs):
        m = diffs.shape[0]
        if m <= slab:
            return _gap_terms_dense(g)(diffs)
        r = g.shape[0]
        nsl = -(-m // slab)
        d = jnp.concatenate(
            [diffs, jnp.ones((nsl * slab - m,), diffs.dtype)]
        )

        body = jax.checkpoint(lambda dt_sl: _gap_terms_dense(g)(dt_sl))
        off1, d_left, d_right, logq1 = jax.lax.map(
            body, d.reshape(nsl, slab)
        )

        def em(x):  # [nsl, r, r, slab] -> [r, r, m]
            return jnp.moveaxis(x, 0, 2).reshape(r, r, nsl * slab)[:, :, :m]

        return em(off1), em(d_left), em(d_right), logq1.reshape(-1)[:m]

    return fn


def _chunk_gap_geometry(ts: Array, s: int, n: int, c: int, dtype,
                        gap_mask=None):
    """Chunk-major gap geometry: (diffs [s, C], gap_valid [s, C],
    is_real [s, C]).  Natural index i = c*s + j lives at [j, c]; padded
    gaps are 1 (harmless), the last real gap is masked by gap_valid.

    ``gap_mask`` (optional, natural [n], 1 = gap i between points i and
    i+1 is real): extra invalid gaps -- the stacked multi-series entry
    masks series-boundary gaps here, which zeroes their off-diagonal
    coupling AND their d_left/d_right precision contributions, making K
    exactly block-diagonal over the series (each block identical to that
    series' own K system)."""
    m = c * s
    ts_pad = jnp.concatenate(
        [ts, jnp.zeros((m - n,), dtype=ts.dtype)]
    ).reshape(c, s).T  # [s, C]
    idx = (jnp.arange(s)[:, None] + s * jnp.arange(c)[None, :])  # [s, C]
    gap_valid = (idx < n - 1).astype(dtype)
    is_real = (idx < n).astype(dtype)
    if gap_mask is not None:
        gm = jnp.concatenate(
            [gap_mask.astype(dtype), jnp.zeros((m - n,), dtype=dtype)]
        ).reshape(c, s).T
        gap_valid = gap_valid * gm
    # next timestamp in natural order: [j+1, c], wrapping to [0, c+1]
    next_row = jnp.concatenate(
        [ts_pad[:1, 1:], jnp.zeros((1, 1), dtype=ts.dtype)], axis=1
    )
    ts_next = jnp.concatenate([ts_pad[1:], next_row], axis=0)
    diffs = (ts_next - ts_pad) * gap_valid + (1.0 - gap_valid)
    return diffs, gap_valid, is_real


def _k_gap_parts_xla(g_or_gapfn, boost, ts, s, regular, rank, dtype,
                     gap_mask=None):
    """(k_cm [s, r, r, C], off_cm, lq_cm [s, C]): the gap-dependent part
    of the chunk-major K system, XLA assembly.  ``g_or_gapfn`` is either
    a dense generator (dense gap emission) or a gap_fn closure.
    ``gap_mask``: see `_chunk_gap_geometry` (stacked multi-series).
    lq_cm is the valid-masked PER-GAP log|Q1|: the scalar prior
    log-determinant is -sum(lq_cm) (Markov factorisation), and the
    per-series likelihood segment-sums it."""
    gap_fn = (g_or_gapfn if callable(g_or_gapfn)
              else _gap_terms_dense(g_or_gapfn))
    n = ts.shape[0]
    c = -(-n // s)
    diffs, gap_valid, is_real = _chunk_gap_geometry(ts, s, n, c, dtype,
                                                    gap_mask)

    # off/d_left/d_right from Q1 alone (push-through identity; no second
    # Van Loan exponential for G^T) -- see _q1_terms / _gap_terms_dense
    if regular:
        dt = ts[1] - ts[0]
        off1, d_left, d_right, logq1 = gap_fn(
            jnp.full((1,), dt, dtype=dtype)
        )
    else:
        off1, d_left, d_right, logq1 = gap_fn(diffs.reshape(-1))

    def cm(x):  # [r, r, s*C] -> [s, r, r, C] (broadcasting the regular case)
        if x.shape[-1] == 1:
            return jnp.broadcast_to(x[None], (s, rank, rank, c))
        return jnp.transpose(x.reshape(rank, rank, s, c), (2, 0, 1, 3))

    gv = gap_valid[:, None, None, :]
    off_cm = cm(off1) * gv
    d_right_cm = cm(d_right) * gv
    d_left_cm = cm(d_left) * gv
    # shift d_left down one natural step: [j-1, c]; j=0 <- [s-1, c-1]
    wrap = jnp.concatenate(
        [jnp.zeros((1, rank, rank, 1), dtype=dtype),
         d_left_cm[-1:, :, :, :-1]], axis=-1
    )
    d_left_shifted = jnp.concatenate([wrap, d_left_cm[:-1]], axis=0)

    eye = jnp.eye(rank, dtype=dtype)[None, :, :, None]
    k_cm = (
        eye
        + d_left_shifted
        + d_right_cm
        + boost[None, :, :, None] * is_real[:, None, None, :]
    )

    # per-gap log|Q1| (valid-masked): log|Sigma^{-1}| = -sum(lq_cm)
    # (sum(gap_valid) = n - 1 unmasked; with a stacked-series mask each
    # series counts its own n_b - 1 gaps)
    if regular:
        lq_cm = gap_valid * logq1[0]
    else:
        lq_cm = logq1.reshape(s, c) * gap_valid
    return k_cm, off_cm, lq_cm


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _k_gap_parts_pallas(g: Array, boost: Array, ts: Array, gap_mask: Array,
                        s: int):
    """Fused-kernel version of `_k_gap_parts_xla` (irregular, dense G,
    TPU f32): ONE Pallas pass emits (k_cm, off_cm, per-gap log|Q1|)
    chunk-major with the chunk axis padded to the kernel tile
    (identity/zero chunks -- exact for the partitioned solver).
    Gradients replay the XLA assembly.  ``gap_mask`` [n] feeds the
    kernel's existing gap_valid input -- the stacked multi-series path
    needs no kernel change."""
    from cyclic_gps_tpu.ops.expm_pallas import (k_system_pallas,
                                                transition_and_noise_pallas)

    rank = g.shape[0]
    dtype = g.dtype
    n = ts.shape[0]
    c = -(-n // s)
    diffs, gap_valid, is_real = _chunk_gap_geometry(ts, s, n, c, dtype,
                                                    gap_mask)

    # chunk-crossing d_left row (gap c*s - 1 feeds point c*s = row 0 of
    # chunk c): C gaps through the tn kernel + the XLA q1 sweep, then a
    # one-lane shift right (zeros into chunk 0)
    e_w, q_w = transition_and_noise_pallas(g, diffs[s - 1])
    _, dl_w, _, _ = _q1_terms(e_w, q_w)
    dl_w = dl_w * gap_valid[s - 1][None, None, :]
    wrap = jnp.concatenate(
        [jnp.zeros((rank, rank, 1), dtype=dtype), dl_w[:, :, :-1]], axis=-1
    )
    k_cm, off_cm, lq_cm = k_system_pallas(
        g, boost, diffs, gap_valid, is_real, wrap
    )
    return k_cm, off_cm, lq_cm


def _k_gap_parts_pallas_fwd(g, boost, ts, gap_mask, s):
    return (_k_gap_parts_pallas(g, boost, ts, gap_mask, s),
            (g, boost, ts, gap_mask))


def _k_gap_parts_pallas_bwd(s, res, cots):
    """ANALYTIC in-VMEM adjoint (round 4): one Pallas pass
    (ops/expm_pallas.k_system_adjoint_pallas) maps the K-row cotangents
    to (generator, timestamp) gradients -- replacing the round-3
    slab-streamed XLA Pade replay (394 ms/step at rank 5, N = 1e6,
    dominated by the direct branch's [2r, 2r] expm Frechet and slab
    re-materialisation).  The kernel recomputes the structured Pade-7
    forward per lane tile and reverses it in VMEM; ceil/clip scale
    counts have zero derivative a.e., so the two routes compute the
    same mathematical gradient.

    The gap_mask cotangent is routed through the gap-geometry VJP only:
    the 0/1 mask is a set-membership indicator whose cotangent is
    discarded by every caller (it is derived from integer series ids or
    a constant), so the masked-product paths' contributions are not
    materialised."""
    from cyclic_gps_tpu.ops.expm_pallas import k_system_adjoint_pallas

    g, boost, ts, gap_mask = res
    gk, goff, glq = cots
    rank = g.shape[0]
    dtype = g.dtype
    n = ts.shape[0]
    c = -(-n // s)
    # kernel-tile padding chunks carry input-independent constants --
    # their cotangents drop exactly
    gk, goff, glq = gk[..., :c], goff[..., :c], glq[..., :c]

    diffs, gap_valid, is_real = _chunk_gap_geometry(ts, s, n, c, dtype,
                                                    gap_mask)

    # K-row cotangents -> per-GAP cotangents: d_right of gap [j, c]
    # feeds K row [j, c]; d_left feeds row [j+1, c], crossing the chunk
    # boundary at j = s-1 (into row [0, c+1])
    c_dr = gk
    wrap_next = jnp.concatenate(
        [gk[0, :, :, 1:], jnp.zeros((rank, rank, 1), dtype)], axis=-1
    )
    c_dl = jnp.concatenate([gk[1:], wrap_next[None]], axis=0)

    c_g_raw, c_sym, c_dt = k_system_adjoint_pallas(
        g, diffs, gap_valid, goff, c_dl, c_dr, glq
    )
    c_g = c_g_raw + 0.5 * (c_sym + c_sym.T)
    c_boost = jnp.einsum("sijc,sc->ij", gk, is_real)
    _, geom_vjp = jax.vjp(
        lambda t, m: _chunk_gap_geometry(t, s, n, c, dtype, m)[0],
        ts, gap_mask,
    )
    c_ts, c_mask = geom_vjp(c_dt)
    return c_g, c_boost, c_ts, c_mask


_k_gap_parts_pallas.defvjp(_k_gap_parts_pallas_fwd, _k_gap_parts_pallas_bwd)


# ---------------------------------------------------------------------------
# MEGA-FUSED likelihood core: gaps -> (K-mahal, K-logdet, prior logdet)
# in ONE kernel pass (ops/expm_pallas.gap_mahal_sweep_pallas).  Even
# with the fused K-system emission, the irregular likelihood paid
# write-(K, off) + read-(K, off) = 4 r^2 N floats of HBM round trip
# between the emission kernel and the elimination sweep; this core
# constructs each row's blocks in VMEM and eliminates them in place --
# HBM traffic is read-dt + read-v only.  Forward-only fusion: the
# backward replays the two-kernel route, whose analytic adjoints
# (mahal: one solve + one selected inversion; emission: XLA replay)
# already exist.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gap_mahal_fused(g, boost, ts, gap_mask, v_cm, s):
    """(v^T K^{-1} v, log|K|, log|Sigma^{-1}|) straight from the gap
    widths (irregular grid, dense G, TPU f32).  ``v_cm`` [s, r, C] at
    the TRUE chunk count C = ceil(n / s)."""
    from cyclic_gps_tpu.ops.expm_pallas import (gap_mahal_sweep_pallas,
                                                transition_and_noise_pallas)

    rank = g.shape[0]
    dtype = g.dtype
    n = ts.shape[0]
    c = -(-n // s)
    diffs, gap_valid, is_real = _chunk_gap_geometry(ts, s, n, c, dtype,
                                                    gap_mask)
    # chunk-crossing d_left row (see _k_gap_parts_pallas)
    e_w, q_w = transition_and_noise_pallas(g, diffs[s - 1])
    _, dl_w, _, _ = _q1_terms(e_w, q_w)
    dl_w = dl_w * gap_valid[s - 1][None, None, :]
    wrap = jnp.concatenate(
        [jnp.zeros((rank, rank, 1), dtype=dtype), dl_w[:, :, :-1]], axis=-1
    )
    (acc00, accy0, w0l, wl, dl, invdl, mh, ld, lq_sum, k0,
     olast) = gap_mahal_sweep_pallas(g, boost, diffs, gap_valid, is_real,
                                     wrap, v_cm)
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


def _gap_mahal_fused_fwd(g, boost, ts, gap_mask, v_cm, s):
    return (_gap_mahal_fused(g, boost, ts, gap_mask, v_cm, s),
            (g, boost, ts, gap_mask, v_cm))


def _gap_mahal_fused_bwd(s, res, cots):
    """Replay the two-kernel route (fused K emission -> chunk-major
    mahal), whose custom VJPs are analytic: the solver part is one solve
    + one selected inversion, the emission part the XLA adjoint."""
    g, boost, ts, gap_mask, v_cm = res
    c = v_cm.shape[-1]

    def ref(g_, boost_, ts_, mask_, v_):
        k_cm, off_cm, lq_cm = _k_gap_parts_pallas(g_, boost_, ts_, mask_,
                                                  s)
        cw = k_cm.shape[-1]  # kernel-tile padded width
        if cw != c:
            v_ = jnp.concatenate(
                [v_, jnp.zeros(v_.shape[:2] + (cw - c,), v_.dtype)],
                axis=-1,
            )
        mh, ld = pt.mahal_and_logdet_cm(k_cm, off_cm, v_, backend="auto")
        return mh, ld, -jnp.sum(lq_cm)

    _, vjp = jax.vjp(ref, g, boost, ts, gap_mask, v_cm)
    return vjp(cots)


_gap_mahal_fused.defvjp(_gap_mahal_fused_fwd, _gap_mahal_fused_bwd)


def _v_chunk_major(params, xs, llt, s: int, c: int, dtype):
    """v = (LLT^{-1} x) B in chunk-major [s, r, C] (zero padding rows)."""
    n = xs.shape[0]
    x_llt_inv = jnp.linalg.solve(llt, xs.T).T
    v = x_llt_inv @ params.b
    v_pad = jnp.concatenate(
        [v, jnp.zeros((c * s - n, params.rank), dtype=dtype)], axis=0
    )
    return jnp.transpose(v_pad.reshape(c, s, params.rank), (1, 2, 0))


def _use_gap_fused(params, regular: bool, backend: str, n: int,
                   s: int) -> bool:
    """Gate for the mega-fused likelihood kernel: irregular grid, dense
    generator, f32, a Pallas-capable backend, and a large-N system."""
    return (
        not regular
        and params.n_params.dtype == jnp.float32
        and n >= max(pt._TERMINAL, 2 * s)
        and pt.resolve_backend(backend) == "pallas"
    )


@_highest_precision
def _k_system_chunked(params, ts: Array, xs: Array, s: int,
                      regular: bool, gap_fn=None, gap_mask=None,
                      return_sig_rows: bool = False):
    """Posterior-precision system K = Sigma^{-1} + I (x) B^T LLT^{-1} B
    emitted DIRECTLY in the partitioned engine's chunk-major layout
    ([s, r, r, C] / [s, r, C]), plus log|Sigma^{-1}|.

    The precision blocks are elementwise functions of the gaps, so any
    layout is free to construct: natural index i = c*s + j lives at
    [j, ..., c], padding blocks are exactly identity / zero, and the
    neighbour term d_left[i-1] is a shift down the step axis with a
    chunk-crossing row from the previous chunk.  This skips the
    [N, d, d] -> chunk-major relayout passes of the array API entirely.
    On TPU at float32 with a dense generator and an irregular grid, the
    whole gap emission runs as ONE fused Pallas kernel
    (ops/expm_pallas.k_system_pallas) -- HBM traffic drops to
    read-dt + write-(K, off).

    ``params`` needs only .rank/.b/.lambda_params (+ generator params
    when ``gap_fn`` is None); ``gap_fn`` overrides the gap emission
    (see `_gap_terms_dense`); ``gap_mask`` [n] marks extra invalid gaps
    (stacked multi-series -- see `_chunk_gap_geometry`);
    ``return_sig_rows=True`` appends the valid-masked per-gap log|Q1|
    [s, C] (chunk-axis width may exceed C by kernel-tile padding, zeros
    there) for per-series decompositions.
    """
    rank = params.rank
    llt = lambda_lambda_t(params)
    n = ts.shape[0]
    c = -(-n // s)
    m = c * s
    dtype = llt.dtype
    boost = params.b.T @ jnp.linalg.solve(llt, params.b)

    use_pallas = (
        gap_fn is None and not regular and dtype == jnp.float32
        and pt.resolve_backend("auto") == "pallas"
    )
    if use_pallas:
        mask = (jnp.ones((n,), dtype=dtype) if gap_mask is None
                else gap_mask.astype(dtype))
        k_cm, off_cm, lq_cm = _k_gap_parts_pallas(
            g_matrix(params), boost, ts, mask, s
        )
    else:
        # slab-streamed dense emission: keeps the Pade pipeline's (and
        # its adjoint's) [4r, 4r, *] temporaries at one-slab size
        if gap_fn is None:
            gap_fn = (g_matrix(params) if regular
                      else _gap_terms_dense_streamed(g_matrix(params)))
        k_cm, off_cm, lq_cm = _k_gap_parts_xla(
            gap_fn, boost, ts, s, regular, rank, dtype,
            gap_mask=None if gap_mask is None else gap_mask.astype(dtype),
        )
    sig_logdet = -jnp.sum(lq_cm)

    # v in chunk-major order, padded to the emitted chunk width
    cw = k_cm.shape[-1]
    x_llt_inv = jnp.linalg.solve(llt, xs.T).T
    v = x_llt_inv @ params.b  # [N, rank]
    v_pad = jnp.concatenate(
        [v, jnp.zeros((cw * s - n, rank), dtype=dtype)], axis=0
    )
    v_cm = jnp.transpose(v_pad.reshape(cw, s, rank), (1, 2, 0))
    if return_sig_rows:
        return k_cm, off_cm, v_cm, sig_logdet, lq_cm
    return k_cm, off_cm, v_cm, sig_logdet


@partial(jax.jit, static_argnames=("regular", "backend"))
@_highest_precision
def log_likelihood(
    params: LEGParams, ts: Array, xs: Array, regular: bool = False,
    backend: str = "auto",
) -> Array:
    """Marginal log-likelihood log p(x | ts, params) in O(N) via CR.

    Identity (reference models.py:300-372):
      log p(x) = -1/2 [ x^T Ltilde^{-1} x - v^T K^{-1} v
                        + N log|2 pi LLT| + log|K| - log|Sigma^{-1}| ]
      with Sigma^{-1} the PEG precision, K = Sigma^{-1} + I_N (x) B^T LLT^{-1} B,
      v = (LLT^{-1} x) B.

    ``regular=True`` asserts the grid has a constant gap (ts[1] - ts[0]),
    replacing N-1 matrix exponentials with one -- a large-N fast path.
    ``backend``: solver backend for the large-N path ("auto" = Pallas
    kernels on TPU, XLA scan on CPU; differentiable either way via the
    analytic VJP).  Pass "xla" explicitly under GSPMD auto-sharding.
    """
    llt = lambda_lambda_t(params)
    g = g_matrix(params)
    num_obs = ts.shape[0]

    x_llt_inv = jnp.linalg.solve(llt, xs.T).T  # [N, obs]
    llt_mahal = jnp.sum(x_llt_inv * xs)
    llt_logdet = num_obs * jnp.linalg.slogdet(
        2.0 * jnp.pi * llt
    )[1]

    s = pt.default_chunk_len(num_obs)
    if _use_gap_fused(params, regular, backend, num_obs, s):
        # mega-fused path: each row's precision blocks are constructed
        # in VMEM from the gap widths and eliminated in place -- no
        # materialized K at all (read dt + read v of HBM traffic)
        c = -(-num_obs // s)
        boost = params.b.T @ jnp.linalg.solve(llt, params.b)
        v_cm = _v_chunk_major(params, xs, llt, s, c, llt.dtype)
        mask = jnp.ones((num_obs,), dtype=llt.dtype)
        k_mahal, k_logdet, sig_inv_logdet = _gap_mahal_fused(
            g, boost, ts, mask, v_cm, s
        )
    elif num_obs >= max(pt._TERMINAL, 2 * s):
        # large-N path: emit K directly in the partitioned engine's
        # chunk-major layout (no relayout passes)
        k_cm, o_cm, v_cm, sig_inv_logdet = _k_system_chunked(
            params, ts, xs, s, regular
        )
        k_mahal, k_logdet = pt.mahal_and_logdet_cm(k_cm, o_cm, v_cm,
                                                   backend=backend)
    else:
        v = x_llt_inv @ params.b  # [N, rank]
        if regular:
            d_em, o_em, sig_inv_logdet = _peg_precision_em_regular(
                g, ts[1] - ts[0], num_obs
            )
            sig_inv_diag, sig_inv_off = sb.from_em(d_em), sb.from_em(o_em)
        else:
            (sig_inv_diag, sig_inv_off,
             sig_inv_logdet) = peg_precision_and_logdet(g, ts)
        bt_llt_inv_b = params.b.T @ jnp.linalg.solve(llt, params.b)
        k_diag = sig_inv_diag + bt_llt_inv_b[None]
        k_mahal, k_logdet = pt.mahal_and_logdet(k_diag, sig_inv_off, v)

    mahal = llt_mahal - k_mahal
    logdet = llt_logdet + k_logdet - sig_inv_logdet
    return -0.5 * (mahal + logdet)


@partial(jax.jit, static_argnames=("regular", "backend"))
@_highest_precision
def log_likelihood_residual(
    params: LEGParams, ts: Array, xs: Array, regular: bool = False,
    backend: str = "auto",
) -> Array:
    """f32-SAFE precision-form marginal log-likelihood (round 4).

    Mathematically identical to `log_likelihood`; numerically organised
    so single precision survives the smooth-fit regime that breaks the
    naive precision form (the `train.loop.nll_loss` caveat: K's blocks
    scale like 1/(dt lambda_min) and the two big mahal/logdet terms
    cancel catastrophically):

      * mahal: x^T LLT^{-1} x - v^T K^{-1} v is computed VARIATIONALLY
        as r^T LLT^{-1} r + z^T Sigma^{-1} z with z = K^{-1} v the
        posterior mean and r = x - B z the fit residual -- both terms
        nonnegative (no cancellation) and, because the true z is the
        MINIMISER of that quadratic, first-order insensitive to the f32
        precision-solve's cond(K)-scale error in z.  z^T Sigma^{-1} z
        uses the Markov factorisation
        |z_0|^2 + sum_i |L_i^{-1} (z_{i+1} - e_i z_i)|^2 (all positive).
      * logdet: log|K| - log|Sigma^{-1}| is accumulated PER-ROW-PAIRED,
        sum_j (ld_row_j + log|Q1_j|): each pair is O(1) where the two
        raw totals are ~N log(1/dt) and their difference drowns in f32
        rounding.  The per-row pivot log-dets fall out of the same
        sweep as the solve (pt.solve_and_ld_rows_cm).

    Runs at partitioned-engine speed -- the f32 large-N irregular-grid
    training path (the exact blocked Kalman filter costs 44.6 s/step at
    N = 1e7 on this chip; reference analog kalman_timing_script.py:25-27
    has no answer at that scale)."""
    num_obs = ts.shape[0]
    s = pt.default_chunk_len(num_obs)
    if num_obs < max(pt._TERMINAL, 2 * s):
        return log_likelihood(params, ts, xs, regular=regular,
                              backend=backend)
    llt = lambda_lambda_t(params)
    g = g_matrix(params)
    llt_logdet = num_obs * jnp.linalg.slogdet(2.0 * jnp.pi * llt)[1]

    k_cm, o_cm, v_cm, _, lq_cm = _k_system_chunked(
        params, ts, xs, s, regular, return_sig_rows=True
    )
    x_pad, ld_rows = pt.solve_and_ld_rows_cm(k_cm, o_cm, v_cm,
                                             backend=backend)
    z = x_pad[:num_obs]  # posterior mean [N, r]
    logdet = llt_logdet + jnp.sum(ld_rows + lq_cm)

    r = xs - z @ params.b.T
    r_mahal = jnp.sum(r * jnp.linalg.solve(llt, r.T).T)

    diffs = ts[1:] - ts[:-1]
    z_em = sb.vec_to_em(z)  # [r, N]
    z_sig_z = (jnp.sum(z_em[:, 0] ** 2)
               + _residual_quad_streamed(g, diffs, z_em))

    return -0.5 * (r_mahal + z_sig_z + logdet)


def _residual_quad_streamed(g: Array, diffs: Array, z_em: Array,
                            slab: int = _ADJ_SLAB) -> Array:
    """sum_i |L_i^{-1} (z_{i+1} - e_i z_i)|^2 (the Markov-factorised
    posterior-mean quadratic of `log_likelihood_residual`), evaluated in
    gap slabs under rematerialisation.

    The whole-M form differentiates `transition_and_noise_em` over all
    gaps at once; its structured-Pade replay adjoint holds ~10 [r, r, M]
    / [2r, 2r, M] temporaries, which OOMs HBM at M = 1e7 (observed:
    35 GB requested on the 16 GB chip).  `lax.map` over
    `jax.checkpoint`-ed slabs bounds both sweeps at one slab's
    temporaries, same as `_gap_terms_dense_streamed`.  Padded gaps
    carry z = 0 on both ends, so their residual is exactly zero."""

    def quad(dt_sl, z0_sl, z1_sl):
        e, q1 = transition_and_noise_em(g, dt_sl)
        dz = z1_sl - sb.matvec(e, z0_sl)
        lq1, invd1 = sb.cholesky(q1)
        w = sb.solve_lower_vec(lq1, invd1, dz)
        return jnp.sum(w * w)

    m = diffs.shape[0]
    if m <= slab:
        return quad(diffs, z_em[:, :-1], z_em[:, 1:])
    r = z_em.shape[0]
    nsl = -(-m // slab)
    pad = nsl * slab - m
    d = jnp.concatenate([diffs, jnp.ones((pad,), diffs.dtype)])
    zpad = jnp.zeros((r, pad), dtype=z_em.dtype)

    def slabs(zx):  # [r, m] -> [nsl, r, slab]
        return jnp.moveaxis(
            jnp.concatenate([zx, zpad], axis=1).reshape(r, nsl, slab),
            1, 0)

    body = jax.checkpoint(lambda args: quad(*args))
    sums = jax.lax.map(
        body, (d.reshape(nsl, slab), slabs(z_em[:, :-1]),
               slabs(z_em[:, 1:]))
    )
    return jnp.sum(sums)


# ---------------------------------------------------------------------------
# Stacked multi-series entries.  B independent series sharing one set of
# parameters are concatenated into ONE block-tridiagonal system whose
# series-boundary gaps are masked (gap_valid = 0): the off-diagonal
# coupling AND the d_left/d_right precision contributions of those gaps
# vanish, so K is exactly block-diagonal over the series and one
# partitioned/Pallas solve processes the whole batch in a single
# streaming pass.  The reference trains on one series at a time (its
# dataset always returns element 0, data_utils.py:73-75, and the
# multi-sample trainer.py is dead code); `parallel/data_parallel.py`
# shards series over devices -- this path batches them WITHIN a chip, so
# 10^4 short series cost one N = sum(n_b) kernel sweep instead of 10^4
# tiny dispatches (or one padded vmap over the tile-padding batch-major
# layout the docs warn about).
# ---------------------------------------------------------------------------


def stack_series(series) -> Tuple[Array, Array, Array]:
    """Host-side convenience: a list of ``(ts_b, xs_b)`` pairs (ragged
    lengths fine, NO padding) -> the stacked ``(ts, xs, series_ids)``
    arrays the `*_stacked` / `log_likelihood_per_series` entries take.
    Contrast: the reference can only iterate series one at a time
    (data_utils.py:73-75)."""
    ts = jnp.concatenate([t for t, _ in series])
    xs = jnp.concatenate([x for _, x in series])
    ids = jnp.concatenate([
        jnp.full((t.shape[0],), i, dtype=jnp.int32)
        for i, (t, _) in enumerate(series)
    ])
    return ts, xs, ids


def _series_gap_mask(series_ids: Array) -> Array:
    """Natural [n] gap mask from sorted series ids: gap i (between
    points i and i+1) is within-series iff ids match; the trailing
    slot (no gap) is 0."""
    same = series_ids[1:] == series_ids[:-1]
    return jnp.concatenate(
        [same, jnp.zeros((1,), dtype=bool)]
    )


def _cm_to_natural(k_cm, o_cm, v_cm, rank):
    """Unpack a chunk-major K system to natural [m, r, r] / [m, r]
    order (m = s*C; the identity/zero padding rows are exact for every
    solver entry)."""
    m = k_cm.shape[0] * k_cm.shape[-1]
    diag = jnp.moveaxis(k_cm, -1, 0).reshape(m, rank, rank)
    off = jnp.moveaxis(o_cm, -1, 0).reshape(m, rank, rank)[: m - 1]
    v = jnp.moveaxis(v_cm, -1, 0).reshape(m, rank)
    return diag, off, v


def _mahal_logdet_cm_any_n(k_cm, o_cm, v_cm, n, rank, backend):
    """Fused (mahal, logdet) on a chunk-major K system at ANY total n:
    the partitioned entry above the terminal size, otherwise the
    chunk-major padding (identity/zero -- exact) unpacked to natural
    order for the CR oracle engine."""
    s = k_cm.shape[0]
    if n >= max(pt._TERMINAL, 2 * s):
        return pt.mahal_and_logdet_cm(k_cm, o_cm, v_cm, backend=backend)
    diag, off, v = _cm_to_natural(k_cm, o_cm, v_cm, rank)
    return cr.mahal_and_logdet(diag, off, v)


@partial(jax.jit, static_argnames=("regular", "backend"))
@_highest_precision
def log_likelihood_stacked(
    params: LEGParams, ts: Array, xs: Array, series_ids: Array,
    regular: bool = False, backend: str = "auto",
) -> Array:
    """Sum of marginal log-likelihoods over B independent series stacked
    in one [N_total] array (one solver pass; see module comment above).

    ``series_ids`` [N_total]: sorted series label per point (any
    integers; only adjacent-equality is used).  ``ts`` must be
    increasing WITHIN each series; values may restart arbitrarily at
    series boundaries (boundary gaps are masked out exactly).
    ``regular=True`` asserts every series shares the constant gap
    ts[1] - ts[0] (offsets may differ -- only gaps matter), reducing the
    whole batch emission to ONE matrix exponential.

    Exactly equal to sum_b log_likelihood(params, ts_b, xs_b)
    (tests/test_batched.py).
    """
    llt = lambda_lambda_t(params)
    num_obs = ts.shape[0]

    x_llt_inv = jnp.linalg.solve(llt, xs.T).T
    llt_mahal = jnp.sum(x_llt_inv * xs)
    llt_logdet = num_obs * jnp.linalg.slogdet(2.0 * jnp.pi * llt)[1]

    s = pt.default_chunk_len(num_obs)
    if _use_gap_fused(params, regular, backend, num_obs, s):
        # mega-fused path: the series-boundary mask rides the kernel's
        # gap_valid input (K never materializes)
        c = -(-num_obs // s)
        boost = params.b.T @ jnp.linalg.solve(llt, params.b)
        v_cm = _v_chunk_major(params, xs, llt, s, c, llt.dtype)
        mask = _series_gap_mask(series_ids).astype(llt.dtype)
        k_mahal, k_logdet, sig_inv_logdet = _gap_mahal_fused(
            g_matrix(params), boost, ts, mask, v_cm, s
        )
    else:
        k_cm, o_cm, v_cm, sig_inv_logdet = _k_system_chunked(
            params, ts, xs, s, regular,
            gap_mask=_series_gap_mask(series_ids)
        )
        k_mahal, k_logdet = _mahal_logdet_cm_any_n(
            k_cm, o_cm, v_cm, num_obs, params.rank, backend
        )
    mahal = llt_mahal - k_mahal
    logdet = llt_logdet + k_logdet - sig_inv_logdet
    return -0.5 * (mahal + logdet)


def log_likelihood_batch(
    params: LEGParams, ts_batch: Array, xs_batch: Array,
    regular: bool = False, backend: str = "auto",
) -> Array:
    """`log_likelihood_stacked` over an equal-length batch
    (ts [B, n], xs [B, n, obs]): flatten + consecutive ids."""
    b, nb = ts_batch.shape
    ids = jnp.broadcast_to(
        jnp.arange(b)[:, None], (b, nb)
    ).reshape(-1)
    return log_likelihood_stacked(
        params, ts_batch.reshape(-1), xs_batch.reshape(b * nb, -1), ids,
        regular=regular, backend=backend,
    )


@partial(jax.jit, static_argnames=("regular",))
@_highest_precision
def posterior_mean_stacked(
    params: LEGParams, ts: Array, xs: Array, series_ids: Array,
    regular: bool = False,
) -> Array:
    """Per-series posterior means of the latent z, one stacked solve
    ([N_total, rank]; rows line up with the inputs).  K is block-diagonal
    over the series, so the joint solve IS the per-series solve.
    Precision-engine route (for very smooth learned processes at float32
    prefer per-series `posterior_mean(method="smoother")` -- the
    conditioning bound in `_resolve_posterior_method` applies per
    series, though short series keep dt moderate and rarely hit it)."""
    n = ts.shape[0]
    s = pt.default_chunk_len(n)
    k_cm, o_cm, v_cm, _ = _k_system_chunked(
        params, ts, xs, s, regular, gap_mask=_series_gap_mask(series_ids)
    )
    if n < max(pt._TERMINAL, 2 * s):
        diag, off, v = _cm_to_natural(k_cm, o_cm, v_cm, params.rank)
        return pt.solve(diag, off, v)[:n]
    x_pad, _ = pt.solve_cm(k_cm, o_cm, v_cm, backend="auto")
    return x_pad[:n]


@partial(jax.jit, static_argnames=("regular",))
@_highest_precision
def insample_posterior_stacked(
    params: LEGParams, ts: Array, xs: Array, series_ids: Array,
    regular: bool = False,
) -> Tuple[Array, Array, Array]:
    """Stacked-series `insample_posterior` (precision/selected-inversion
    route): (mean [N, r], cov_diag [N, r, r], cov_off [N-1, r, r]).
    cov_off rows at series boundaries are exactly zero (independent
    series -- the block-diagonal K's inverse has zero cross blocks)."""
    n = ts.shape[0]
    s = pt.default_chunk_len(n)
    k_cm, o_cm, v_cm, _ = _k_system_chunked(
        params, ts, xs, s, regular, gap_mask=_series_gap_mask(series_ids)
    )
    if n < max(pt._TERMINAL, 2 * s):
        diag, off, v = _cm_to_natural(k_cm, o_cm, v_cm, params.rank)
        mean = pt.solve(diag, off, v)
        cov_diag, cov_off = pt.inverse_blocks(diag, off)
        return mean[:n], cov_diag[:n], cov_off[: n - 1]
    mean_pad, _ = pt.solve_cm(k_cm, o_cm, v_cm, backend="auto")
    cov_diag_pad, cov_off_pad = pt.inverse_blocks_cm(k_cm, o_cm,
                                                     backend="auto")
    return mean_pad[:n], cov_diag_pad[:n], cov_off_pad[: n - 1]


def _cm_rows_to_natural(rows_cm: Array, n: int) -> Array:
    """[s, C] chunk-major per-row scalars -> natural [n] (row c*s + j
    lives at [j, c]; padding rows dropped)."""
    s, cw = rows_cm.shape
    return jnp.transpose(rows_cm, (1, 0)).reshape(cw * s)[:n]


@partial(jax.jit, static_argnames=("num_series", "regular", "backend"))
@_highest_precision
def log_likelihood_per_series(
    params: LEGParams, ts: Array, xs: Array, series_ids: Array,
    num_series: int, regular: bool = False, backend: str = "auto",
) -> Array:
    """PER-SERIES marginal log-likelihood vector [num_series] from ONE
    stacked solver pass (`log_likelihood_stacked` computes only the sum).

    ``series_ids`` must be sorted integers in [0, num_series); the
    output's entry b is exactly log_likelihood(params, ts_b, xs_b)
    (tests/test_batched.py).  Every term of the likelihood identity
    decomposes over the block-diagonal stacked system:

      mahal_b  = sum_{i in b} x_i.(LLT^{-1} x_i)  -  v_i.(K^{-1} v)_i
      logdet_b = n_b log|2 pi LLT| + log|K_b| - log|Sigma_b^{-1}|

    with log|K_b| a segment-sum of per-row pivot log-dets
    (pt.logdet_rows: exact for block-diagonal K) and log|Sigma_b^{-1}|
    a segment-sum of the per-gap log|Q1| the emission already computes.
    Differentiable end-to-end: the solve and the per-row log-det carry
    analytic adjoints (one solve + one selected inversion), so gradient
    memory stays O(1) in N like the scalar entry.  Use for per-series
    diagnostics, importance weighting, or minibatch losses over series.
    """
    rank = params.rank
    llt = lambda_lambda_t(params)
    n = ts.shape[0]

    counts = jax.ops.segment_sum(
        jnp.ones_like(ts), series_ids, num_segments=num_series
    )
    x_llt_inv = jnp.linalg.solve(llt, xs.T).T
    llt_mahal_b = jax.ops.segment_sum(
        jnp.sum(x_llt_inv * xs, axis=1), series_ids,
        num_segments=num_series,
    )
    llt_logdet_b = counts * jnp.linalg.slogdet(2.0 * jnp.pi * llt)[1]

    s = pt.default_chunk_len(n)
    k_cm, o_cm, v_cm, _, lq_cm = _k_system_chunked(
        params, ts, xs, s, regular,
        gap_mask=_series_gap_mask(series_ids), return_sig_rows=True,
    )
    # gap i sits between points i and i+1 of the same series (masked
    # gaps are exactly zero, so their id attribution is immaterial)
    sig_logdet_b = -jax.ops.segment_sum(
        _cm_rows_to_natural(lq_cm, n), series_ids,
        num_segments=num_series,
    )

    if n < max(pt._TERMINAL, 2 * s):
        diag, off, v = _cm_to_natural(k_cm, o_cm, v_cm, rank)
        x = pt.solve(diag, off, v)[:n]
        ld_rows = pt.logdet_rows(diag, off)[:n]
        v_nat = v[:n]
    else:
        # fused: ONE sweep yields x AND the per-row pivot log-dets
        # (where separate solve_cm + logdet_rows_cm cost two), and the
        # shared analytic adjoint runs one selected inversion total
        x_pad, rows_cm = pt.solve_and_ld_rows_cm(k_cm, o_cm, v_cm,
                                                 backend=backend)
        x = x_pad[:n]
        ld_rows = _cm_rows_to_natural(rows_cm, n)
        v_nat = jnp.moveaxis(v_cm, -1, 0).reshape(-1, rank)[:n]
    k_mahal_b = jax.ops.segment_sum(
        jnp.sum(v_nat * x, axis=1), series_ids, num_segments=num_series
    )
    k_logdet_b = jax.ops.segment_sum(
        ld_rows, series_ids, num_segments=num_series
    )

    mahal_b = llt_mahal_b - k_mahal_b
    logdet_b = llt_logdet_b + k_logdet_b - sig_logdet_b
    return -0.5 * (mahal_b + logdet_b)


@_highest_precision
def posterior_precision(params: LEGParams, ts: Array) -> Tuple[Array, Array]:
    """K = Sigma^{-1} + I_N (x) B^T LLT^{-1} B (reference models.py:254-268)."""
    llt = lambda_lambda_t(params)
    g = g_matrix(params)
    sig_inv_diag, sig_inv_off = peg_precision(g, ts)
    bt_llt_inv_b = params.b.T @ jnp.linalg.solve(llt, params.b)
    return sig_inv_diag + bt_llt_inv_b[None], sig_inv_off


@_highest_precision
def compute_v(params: LEGParams, xs: Array) -> Array:
    """v = (LLT^{-1} x) B (reference models.py:270-280)."""
    llt = lambda_lambda_t(params)
    return jnp.linalg.solve(llt, xs.T).T @ params.b


POSTERIOR_METHODS = ("auto", "precision", "smoother")


def _resolve_posterior_method(method: str, dtype) -> str:
    """Resolve the posterior computation route.

    "precision": factorise the block-tridiagonal posterior precision
    K = Sigma^{-1} + I (x) B^T LLT^{-1} B (partitioned engine).  Its
    condition number scales like 1/(dt * lambda_min(sym G)) -- beyond
    1/eps_f32 for very smooth learned processes -- so it is the float64
    route.  "smoother": the parallel Kalman/RTS smoother, whose
    innovation covariances are bounded below by the observation noise;
    numerically safe in float32 (same outputs exactly, ~2x slower).
    "auto" picks by dtype.
    """
    if method not in POSTERIOR_METHODS:
        raise ValueError(
            f"method must be one of {POSTERIOR_METHODS}, got {method!r}"
        )
    if method == "auto":
        return "precision" if dtype == jnp.float64 else "smoother"
    return method


@partial(jax.jit, static_argnames=("regular", "method"))
@_highest_precision
def posterior_mean(
    params: LEGParams,
    ts: Array,
    xs: Array,
    regular: bool = False,
    method: str = "auto",
) -> Array:
    """Posterior mean of the latent z at the observation times, via the
    chunk-major emission path (scales to N = 1e7+).

    ``method``: see `_resolve_posterior_method` -- "auto" routes float32
    through the parallel RTS smoother (the precision-form solve succeeds
    but is silently inaccurate at f32 for smooth learned processes).
    """
    if _resolve_posterior_method(method, ts.dtype) == "smoother":
        from cyclic_gps_tpu.baselines import kalman

        ssm = kalman.leg_to_ssm(params, ts, regular=regular)
        if ts.shape[0] > kalman.SMOOTHER_BLOCK:
            # the flat associative scan holds ~10 [r, r, N] work arrays
            # and overflows HBM beyond ~1e6; blocked version is exact
            return kalman.smooth_parallel_full_blocked(ssm, xs)[0]
        return kalman.smooth_parallel(ssm, xs)[0]
    n = ts.shape[0]
    s = pt.default_chunk_len(n)
    if n < max(pt._TERMINAL, 2 * s):
        k_diag, k_off = posterior_precision(params, ts)
        return pt.solve(k_diag, k_off, compute_v(params, xs))
    k_cm, o_cm, v_cm, _ = _k_system_chunked(params, ts, xs, s, regular)
    x_pad, _ = pt.solve_cm(k_cm, o_cm, v_cm, backend="auto")
    return x_pad[:n]


@partial(jax.jit, static_argnames=("regular", "method"))
@_highest_precision
def insample_posterior(
    params: LEGParams,
    ts: Array,
    xs: Array,
    regular: bool = False,
    method: str = "auto",
) -> Tuple[Array, Array, Array]:
    """Posterior mean, marginal covariances and lag-1 cross-covariances of
    the latent z at the observation times (reference models.py:282-298).

    Returns (mean [N, r], cov_diag [N, r, r], cov_off [N-1, r, r]) where
    cov_off[i] = Cov(z_{i+1}, z_i | x).

    ``method`` ("auto" | "precision" | "smoother"): "precision" is the
    selected-inversion route on the posterior precision (float64; fastest),
    "smoother" the parallel Kalman/RTS route (float32-safe); "auto" picks
    by dtype.  See `_resolve_posterior_method` for the condition bound.
    """
    n = ts.shape[0]
    if _resolve_posterior_method(method, ts.dtype) == "smoother":
        from cyclic_gps_tpu.baselines import kalman

        ssm = kalman.leg_to_ssm(params, ts, regular=regular)
        if ts.shape[0] > kalman.SMOOTHER_BLOCK:
            return kalman.smooth_parallel_full_blocked(ssm, xs)
        return kalman.smooth_parallel_full(ssm, xs)
    s = pt.default_chunk_len(n)
    if n < max(pt._TERMINAL, 2 * s):
        k_diag, k_off = posterior_precision(params, ts)
        mean = pt.solve(k_diag, k_off, compute_v(params, xs))
        cov_diag, cov_off = pt.inverse_blocks(k_diag, k_off)
        return mean, cov_diag, cov_off
    k_cm, o_cm, v_cm, _ = _k_system_chunked(params, ts, xs, s, regular)
    mean_pad, _ = pt.solve_cm(k_cm, o_cm, v_cm, backend="auto")
    cov_diag_pad, cov_off_pad = pt.inverse_blocks_cm(k_cm, o_cm,
                                                     backend="auto")
    return mean_pad[:n], cov_diag_pad[:n], cov_off_pad[: n - 1]


def _forecast(rank, eg, ip_mean, ip_cov):
    """Extrapolate one step through the prior (reference models.py:394-407).

    eg = expm(-0.5 |dt| G) oriented so that Cov(z_target, z_anchor) = eg.
    """
    eye = jnp.eye(rank, dtype=eg.dtype)
    joint_mean = jnp.zeros(2 * rank, dtype=eg.dtype)
    joint_cov = build_2x2_block(eye, eg.T, eg, eye)
    return gaussian_stitch(joint_mean, joint_cov, ip_mean, ip_cov)


def _interpolate(rank, eg1, eg2, prev_mean, prev_cov, prev_cross, next_mean,
                 next_cov):
    """Condition a between-points latent on both neighbours
    (reference models.py:409-451).

    eg1 = expm(-0.5 (t* - t_prev) G), eg2 = expm(-0.5 (t_next - t*) G);
    prev_cross = Cov(z_next, z_prev | x) (lower off-diag posterior block).
    """
    eye = jnp.eye(rank, dtype=eg1.dtype)
    eg3 = eg1 @ eg2
    joint_mean = jnp.zeros(3 * rank, dtype=eg1.dtype)
    joint_cov = build_3x3_block(
        eye, eg3.T, eg1.T,
        eg3, eye, eg2,
        eg1, eg2.T, eye,
    )
    joint_ip_mean = jnp.concatenate([prev_mean, next_mean], axis=0)
    joint_ip_cov = build_2x2_block(
        prev_cov, prev_cross.T,
        prev_cross, next_cov,
    )
    return gaussian_stitch(joint_mean, joint_cov, joint_ip_mean, joint_ip_cov)


def _intercast_geometry(ts: Array, target_ts: Array, thresh: float):
    """(idx masks, neighbour indices, clamped gaps) shared by both
    intercast implementations.  ``target_ts`` must be SORTED (the
    `intercast` contract).

    Dense grids (P >= 2N) use the DUAL search: `searchsorted(ts,
    targets)` runs ~log2(N) rounds of [P]-sized gathers -- the slowest
    op on TPU, 128 ms of the round-4 446 ms at P = 1e6 -- while the
    dual form searches the N observations into the P sorted targets
    (log2(P) rounds of [N] gathers, 10x fewer bytes) and recovers
    idx_t = #{i: ts_i < target_t} as a scatter + cumsum.  The anchor
    times ts[prev_i] / ts[next_i] come gather-free from a scatter-max +
    cummax (resp. scatter-min + reversed cummin): the running max of
    observations below each target IS the previous anchor."""
    n = ts.shape[0]
    p = target_ts.shape[0]
    dtype = ts.dtype
    if p >= 2 * n:
        # q_i = #{t: target_t <= ts_i}; then ts_i < target_t <=> q_i <= t
        q = jnp.searchsorted(target_ts, ts, side="right")
        z = jnp.zeros((p,), jnp.int32).at[q].add(1, mode="drop")
        idx = jnp.cumsum(z)                       # == searchsorted(ts, targets)
        zmax = jnp.full((p,), -jnp.inf, dtype).at[q].max(ts, mode="drop")
        ts_prev = jnp.maximum(jax.lax.cummax(zmax), ts[0])
        qn = jnp.where(q >= 1, q - 1, p)          # p is OOB -> dropped
        zmin = jnp.full((p,), jnp.inf, dtype).at[qn].min(ts, mode="drop")
        ts_next = jnp.minimum(jax.lax.cummin(zmin, reverse=True), ts[-1])
    else:
        idx = jnp.searchsorted(ts, target_ts)
        ts_prev = ts[jnp.clip(idx - 1, 0, n - 1)]
        ts_next = ts[jnp.clip(idx, 0, n - 1)]
    is_back = idx == 0
    is_fwd = idx == n
    hit_first = jnp.abs(target_ts - ts[0]) <= thresh
    hit_last = jnp.abs(target_ts - ts[-1]) <= thresh
    prev_i = jnp.clip(idx - 1, 0, n - 1)
    next_i = jnp.clip(idx, 0, n - 1)
    off_i = jnp.clip(idx - 1, 0, max(n - 2, 0))
    # Time gaps, clamped nonnegative so unused branches stay finite.
    d_back = jnp.maximum(ts[0] - target_ts, 0.0)
    d_fwd = jnp.maximum(target_ts - ts[-1], 0.0)
    d1 = jnp.maximum(target_ts - ts_prev, 0.0)
    d2 = jnp.maximum(ts_next - target_ts, 0.0)
    return (is_back, is_fwd, hit_first, hit_last, prev_i, next_i, off_i,
            d_back, d_fwd, d1, d2)


@jax.jit
@_highest_precision
def intercast(
    params: LEGParams,
    ip_mean: Array,
    ip_cov_diag: Array,
    ip_cov_off: Array,
    ts: Array,
    target_ts: Array,
    thresh: float = 1e-10,
) -> Tuple[Array, Array]:
    """Latent predictive moments at arbitrary sorted target times.

    Vectorised re-design of the reference's Python loop
    (models.py:454-514): one `searchsorted`, batched matrix exponentials,
    and a masked select over the three regimes (backward forecast, forward
    forecast, interpolation), with exact passthrough when a target
    coincides with the first/last observation time.

    FULLY ELEMENT-MAJOR (round 3): every temporary is [*, *, P] -- the
    vmapped stitch built [P, 3r, 3r] batch-major temporaries, which TPU
    tile-pads ~9-40x and which stopped dense prediction grids (P ~ 1e6)
    from fitting in HBM.  The interpolation stitch solves its 2r x 2r
    conditioning system with the element-major Cholesky (Sigma_xx is PD:
    ||expm(-dG/2)|| < 1), and the forecast stitches reduce to closed
    forms because their conditioning covariance is the identity:
    T = eG, cov = I - eG eG^T + eG S eG^T.  `_intercast_batched` keeps
    the per-target reference implementation as the parity oracle.
    """
    rank = params.rank
    g = g_matrix(params)
    dtype = g.dtype
    p = target_ts.shape[0]

    (is_back, is_fwd, hit_first, hit_last, prev_i, next_i, off_i,
     d_back, d_fwd, d1, d2) = _intercast_geometry(ts, target_ts, thresh)

    # All four exponential batches in ONE element-major expm call: a
    # vmapped jax.scipy expm over [P, r, r] tile-pads ~32x on TPU and
    # OOMs at dense prediction grids (P ~ 1e5+); the element-major form
    # is bounded-memory at any P.  On TPU f32 the batch runs as the
    # fused Pallas (e, Q) kernel (Q discarded) -- the XLA Pade
    # pipeline's [r, r, 4P] intermediates round-trip ~130 ms of HBM at
    # P = 1e6 (round-5 stage split, BENCHMARKS.md); elsewhere the plain
    # element-major Pade keeps the e-only cost.
    gaps = jnp.concatenate([d_back, d_fwd, d1, d2])  # [4P]
    if (g.dtype == jnp.float32
            and pt.resolve_backend("auto") == "pallas"):
        egs = transition_and_noise_em(g, gaps)[0]
    else:
        from cyclic_gps_tpu.ops.expm_em import expm_em

        egs = expm_em(-0.5 * gaps[None, None, :] * g[:, :, None])
    eg_back = egs[:, :, :p]          # element-major [r, r, P]
    eg_fwd = egs[:, :, p:2 * p]
    eg1 = egs[:, :, 2 * p:3 * p]
    eg2 = egs[:, :, 3 * p:]

    # Posterior moments for the interpolation anchors: ONE row gather of
    # a packed [N, 2r + 3r^2] matrix by prev_i, then an unpack transpose
    # to element-major.  Five separate LANE-axis gathers (m/cd by
    # prev/next, co by off) measured 250 ms at P = 1e6 -- minor-axis
    # gathers are the slowest op on TPU; a major-axis row gather + one
    # [P, K] -> [K, P] relayout is ~5x cheaper.  Rows pack
    # (m_i, m_{i+1}, cd_i, cd_{i+1}, co_i) with clamped shifts: for
    # every interpolation lane (1 <= idx <= n-1) next_i == prev_i + 1
    # and off_i == prev_i exactly; forecast/hit lanes read finite
    # garbage that `select` discards.
    m_em = sb.vec_to_em(ip_mean)        # [r, N] (first/last anchors)
    cd_em = sb.to_em(ip_cov_diag)       # [r, r, N]
    n_obs = ip_mean.shape[0]
    r2 = rank * rank
    z_pack = jnp.concatenate([
        ip_mean,
        jnp.concatenate([ip_mean[1:], ip_mean[-1:]], axis=0),
        ip_cov_diag.reshape(n_obs, r2),
        jnp.concatenate([ip_cov_diag[1:], ip_cov_diag[-1:]],
                        axis=0).reshape(n_obs, r2),
        jnp.concatenate(
            [ip_cov_off,
             jnp.zeros((1, rank, rank), ip_cov_off.dtype)], axis=0
        ).reshape(n_obs, r2),
    ], axis=1)                          # [N, 2r + 3r^2]
    z_g = jnp.transpose(
        jnp.take(z_pack, prev_i, axis=0, mode="clip"))  # [K, P]
    m_prev = z_g[:rank]
    m_next = z_g[rank:2 * rank]
    p_prev = z_g[2 * rank:2 * rank + r2].reshape(rank, rank, p)
    p_next = z_g[2 * rank + r2:2 * rank + 2 * r2].reshape(rank, rank, p)
    c_off = z_g[2 * rank + 2 * r2:].reshape(rank, rank, p)

    eye = jnp.eye(rank, dtype=dtype)[:, :, None]

    def forecast_em(eg, m_a, p_a):
        # anchor conditioning covariance is I: T = eg (closed form)
        mean = sb.matvec(eg, jnp.broadcast_to(m_a, (rank, p)))
        eg_pa = sb.matmul(eg, jnp.broadcast_to(p_a, (rank, rank, p)))
        cov = eye - sb.matmul(eg, eg, tb=True) + sb.matmul(eg_pa, eg,
                                                           tb=True)
        return mean, cov

    # Backward forecast: Cov(z_target, z_first) = expm(-.5 d G)^T.
    mean_b, cov_b = forecast_em(sb.transpose(eg_back), m_em[:, :1],
                                cd_em[:, :, :1])
    # Forward forecast: Cov(z_target, z_last) = expm(-.5 d G).
    mean_f, cov_f = forecast_em(eg_fwd, m_em[:, -1:], cd_em[:, :, -1:])

    # Interpolation: condition z_target on (z_prev, z_next).
    eg3 = sb.matmul(eg1, eg2)
    eye_b = jnp.broadcast_to(eye, (rank, rank, p))
    sxx = jnp.concatenate([
        jnp.concatenate([eye_b, sb.transpose(eg3)], axis=1),
        jnp.concatenate([eg3, eye_b], axis=1),
    ], axis=0)                                       # [2r, 2r, P]
    sxy = jnp.concatenate([sb.transpose(eg1), eg2], axis=0)  # [2r, r, P]
    L, invd = sb.cholesky(sxx)
    t_t = sb.solve_lower_t(L, invd, sb.solve_lower(L, invd, sxy))
    m_x = jnp.concatenate([m_prev, m_next], axis=0)  # [2r, P]
    mean_i = sb.matvec(t_t, m_x, ta=True)
    s_x = jnp.concatenate([
        jnp.concatenate([p_prev, sb.transpose(c_off)], axis=1),
        jnp.concatenate([c_off, p_next], axis=1),
    ], axis=0)                                       # [2r, 2r, P]
    cov_i = (
        eye - sb.matmul(t_t, sxy, ta=True)
        + sb.matmul(sb.matmul(t_t, s_x, ta=True), t_t)
    )

    def select(mask, a_m, a_c, b_m, b_c):
        # jnp.where, NOT arithmetic masking: boundary-hit lanes make the
        # interpolation system exactly singular (both anchors coincide),
        # and 0 * nan would poison the masked-out branch
        return (jnp.where(mask[None, :], a_m, b_m),
                jnp.where(mask[None, None, :], a_c, b_c))

    mean, cov = select(is_back, mean_b, cov_b, mean_i, cov_i)
    mean, cov = select(is_fwd, mean_f, cov_f, mean, cov)
    # Exact hits on the first/last observation pass through unchanged
    # (reference models.py:478-479,487-488,495-496).
    mean, cov = select(hit_first,
                       jnp.broadcast_to(m_em[:, :1], (rank, p)),
                       jnp.broadcast_to(cd_em[:, :, :1], (rank, rank, p)),
                       mean, cov)
    mean, cov = select(hit_last,
                       jnp.broadcast_to(m_em[:, -1:], (rank, p)),
                       jnp.broadcast_to(cd_em[:, :, -1:], (rank, rank, p)),
                       mean, cov)
    return sb.vec_from_em(mean), sb.from_em(cov)


@jax.jit
@_highest_precision
def _intercast_batched(
    params: LEGParams,
    ip_mean: Array,
    ip_cov_diag: Array,
    ip_cov_off: Array,
    ts: Array,
    target_ts: Array,
    thresh: float = 1e-10,
) -> Tuple[Array, Array]:
    """Per-target (vmapped) intercast -- the readable reference
    implementation `intercast` is tested against (tests/test_models.py).
    Builds [P, 3r, 3r] batch-major stitches; do not use at dense P."""
    rank = params.rank
    g = g_matrix(params)

    (is_back, is_fwd, hit_first, hit_last, prev_i, next_i, off_i,
     d_back, d_fwd, d1, d2) = _intercast_geometry(ts, target_ts, thresh)

    from cyclic_gps_tpu.ops.expm_em import expm_em

    p = target_ts.shape[0]
    gaps = jnp.concatenate([d_back, d_fwd, d1, d2])  # [4P]
    egs = expm_em(-0.5 * gaps[None, None, :] * g[:, :, None])
    eg_back = sb.from_em(egs[:, :, :p])
    eg_fwd = sb.from_em(egs[:, :, p:2 * p])
    eg1 = sb.from_em(egs[:, :, 2 * p:3 * p])
    eg2 = sb.from_em(egs[:, :, 3 * p:])

    def one_target(is_back, is_fwd, hit_first, hit_last, eg_back, eg_fwd,
                   eg1, eg2, prev_i, next_i, off_i):
        # Backward forecast: Cov(z_target, z_first) = expm(-.5 d G)^T.
        m_b, v_b = _forecast(rank, eg_back.T, ip_mean[0], ip_cov_diag[0])
        # Forward forecast: Cov(z_target, z_last) = expm(-.5 d G).
        m_f, v_f = _forecast(rank, eg_fwd, ip_mean[-1], ip_cov_diag[-1])
        m_i, v_i = _interpolate(
            rank, eg1, eg2,
            ip_mean[prev_i], ip_cov_diag[prev_i], ip_cov_off[off_i],
            ip_mean[next_i], ip_cov_diag[next_i],
        )
        mean = jnp.where(is_back, m_b, jnp.where(is_fwd, m_f, m_i))
        cov = jnp.where(is_back, v_b, jnp.where(is_fwd, v_f, v_i))
        mean = jnp.where(hit_first, ip_mean[0], mean)
        cov = jnp.where(hit_first, ip_cov_diag[0], cov)
        mean = jnp.where(hit_last, ip_mean[-1], mean)
        cov = jnp.where(hit_last, ip_cov_diag[-1], cov)
        return mean, cov

    return jax.vmap(one_target)(
        is_back, is_fwd, hit_first, hit_last, eg_back, eg_fwd, eg1, eg2,
        prev_i, next_i, off_i,
    )


@partial(jax.jit, static_argnames=("method",))
def predictive_posterior(
    params: LEGParams, ts: Array, xs: Array, target_ts: Array,
    method: str = "auto",
) -> Tuple[Array, Array]:
    """Latent predictive moments at target times (models.py:516-528)."""
    mean, cov_diag, cov_off = insample_posterior(params, ts, xs,
                                                 method=method)
    return intercast(params, mean, cov_diag, cov_off, ts, target_ts)


@partial(jax.jit, static_argnames=("include_obs_noise", "method"))
def make_predictions(
    params: LEGParams,
    ts: Array,
    xs: Array,
    target_ts: Array,
    include_obs_noise: bool = False,
    method: str = "auto",
) -> Tuple[Array, Array]:
    """Data-space predictive moments at target times (models.py:530-546).

    With ``include_obs_noise=False`` this matches the reference exactly
    (which omits Lambda Lambda^T from the predictive covariance,
    models.py:544); set True for a proper posterior-predictive covariance.
    """
    lat_mean, lat_cov = predictive_posterior(params, ts, xs, target_ts,
                                             method=method)
    mean = lat_mean @ params.b.T
    cov = params.b[None] @ lat_cov @ params.b.T[None]
    if include_obs_noise:
        cov = cov + lambda_lambda_t(params)[None]
    return mean, cov


@partial(jax.jit, static_argnames=("include_obs_noise", "regular"))
@_highest_precision
def make_predictions_batch(
    params: LEGParams,
    ts_batch: Array,
    xs_batch: Array,
    target_batch: Array,
    include_obs_noise: bool = False,
    regular: bool = False,
) -> Tuple[Array, Array]:
    """`make_predictions` over an equal-length batch of B independent
    series (ts [B, n], xs [B, n, obs], targets [B, P], each row sorted).

    The expensive stage — posterior mean + selected inversion — runs as
    ONE stacked block-diagonal system over all B series
    (`insample_posterior_stacked`: series-boundary gaps masked, cross-
    series posterior blocks exactly zero), then the element-major
    `intercast` stitch is vmapped per series.  Returns
    (mean [B, P, obs], cov [B, P, obs, obs]).

    Precision-engine route; at float32 with very smooth learned
    processes prefer per-series `make_predictions(method="smoother")`
    (see `_resolve_posterior_method` — short series keep dt moderate and
    rarely hit the bound).  Reference contrast: one series at a time,
    per-target Python loop (models.py:454-546).
    """
    b, nb = ts_batch.shape
    rank = params.rank
    ids = jnp.broadcast_to(jnp.arange(b)[:, None], (b, nb)).reshape(-1)
    mean, cov_diag, cov_off = insample_posterior_stacked(
        params, ts_batch.reshape(-1), xs_batch.reshape(b * nb, -1), ids,
        regular=regular,
    )
    mean_b = mean.reshape(b, nb, rank)
    cd_b = cov_diag.reshape(b, nb, rank, rank)
    # off rows at series boundaries are exactly zero; pad one trailing
    # zero row so the [N-1] stack splits into per-series [nb - 1] stacks
    off_b = jnp.concatenate(
        [cov_off, jnp.zeros((1, rank, rank), cov_off.dtype)], axis=0
    ).reshape(b, nb, rank, rank)[:, : nb - 1]
    lat_mean, lat_cov = jax.vmap(
        lambda m, cd, co, t, tt: intercast(params, m, cd, co, t, tt)
    )(mean_b, cd_b, off_b, ts_batch, target_batch)
    pred_mean = lat_mean @ params.b.T
    pred_cov = params.b[None, None] @ lat_cov @ params.b.T[None, None]
    if include_obs_noise:
        pred_cov = pred_cov + lambda_lambda_t(params)[None, None]
    return pred_mean, pred_cov


@partial(jax.jit, static_argnames=("num",))
@_highest_precision
def sample_from_prior(
    params: LEGParams, key: jax.Array, ts: Array, num: int = 1
) -> Tuple[Array, Array]:
    """Joint samples (z, x) from the LEG prior on grid ``ts``.

    The reference's version is dead code with no return (models.py:243-252);
    this implements it via the exact discrete-time SSM bridge: for gap d,
    z_{i+1} = expm(-0.5 d G) z_i + w_i with Cov(w_i) = I - A A^T
    (cf. reference kalman.py:17-19), then x_i = B z_i + Lambda e_i.
    Returns (zs [num, N, rank], xs [num, N, obs_dim]).
    """
    rank = params.rank
    g = g_matrix(params)
    diffs = ts[1:] - ts[:-1]
    a, q = transition_and_noise(g, diffs)
    q_chol = jnp.linalg.cholesky(
        q + 1e-12 * jnp.eye(rank, dtype=g.dtype)
    )

    key_z0, key_w, key_e = jax.random.split(key, 3)
    z0 = jax.random.normal(key_z0, (num, rank), dtype=g.dtype)
    ws = jax.random.normal(key_w, (diffs.shape[0], num, rank), dtype=g.dtype)

    def step(z, inp):
        a_i, qc_i, w_i = inp
        z_next = z @ a_i.T + w_i @ qc_i.T
        return z_next, z_next

    _, z_rest = jax.lax.scan(step, z0, (a, q_chol, ws))
    zs = jnp.concatenate([z0[None], z_rest], axis=0)  # [N, num, rank]
    zs = jnp.swapaxes(zs, 0, 1)  # [num, N, rank]

    lam = lambda_matrix(params)
    es = jax.random.normal(
        key_e, (num, ts.shape[0], params.obs_dim), dtype=g.dtype
    )
    xs = zs @ params.b.T + es @ lam.T
    return zs, xs
