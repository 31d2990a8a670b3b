"""Element-major batched matrix exponential (Pade-13, dynamic squaring).

`jax.scipy.linalg.expm` vmapped over a [N, d, d] batch is hostile to TPU
memory layout: every temporary pads the trailing (d, d) dims to (8, 128)
tiles -- a 32x expansion for d = 4 -- and the Pade algorithm keeps ~10
temps live, so N = 1e6 gap exponentials OOM a 16 GB chip while holding
only 600 MB of real data.  Here the batch lives on the minor (lane) axis
([d, d, N] element-major) and all matrix algebra is the unrolled
small-block kind (ops/smallblock.py), so temporaries are dense.

Algorithm: scaling-and-squaring with the degree-13 Pade approximant
(Higham 2005).  The squaring loop runs `lax.while_loop` up to the
batch-max needed count (paying only for what the data requires), which
is not reverse-differentiable -- so the primitive carries a custom VJP
built on the Frechet-derivative identity

    expm([[A, E], [0, A]]) = [[e^A, L(A, E)], [0, e^A]],
    adjoint:  A_bar = L(A^T, Y_bar),

i.e. the backward pass is one more (2d x 2d) element-major expm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import smallblock as sb

Array = jnp.ndarray

_PADE13 = (
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0, 670442572800.0,
    33522128640.0, 1323241920.0, 40840800.0, 960960.0, 16380.0, 182.0, 1.0,
)
_THETA13 = 5.371920351148152
_MAX_SQUARINGS = 40  # safety cap for the dynamic loop


def lu_solve(a: Array, b: Array) -> Array:
    """Per-block solve A X = B by unpivoted Gaussian elimination.

    a: [d, d, B], b: [d, e, B].  Intended for well-conditioned systems
    (the Pade denominator after scaling is I - small); no pivoting.
    """
    d = a.shape[0]
    m = a
    rhs = b
    rows = jnp.arange(d)
    for j in range(d):
        piv_inv = 1.0 / m[j, j]
        mask = (rows > j).astype(a.dtype)[:, None]
        f = m[:, j] * piv_inv[None, :] * mask  # elimination factors [d, B]
        m = m - f[:, None, :] * m[j][None, :, :]
        rhs = rhs - f[:, None, :] * rhs[j][None, :, :]
    # back substitution (m is now upper triangular)
    x = [None] * d
    for i in reversed(range(d)):
        acc = rhs[i]
        for k in range(i + 1, d):
            acc = acc - m[i, k][None, :] * x[k]
        x[i] = acc / m[i, i][None, :]
    return jnp.stack(x, axis=0)


def lu_solve_pivoted(a: Array, b: Array) -> Array:
    """Per-block solve A X = B by Gaussian elimination WITH partial
    pivoting, element-major (a: [d, d, B], b: [d, e, B]).

    For general nonsymmetric systems with no pivot-size guarantee -- e.g.
    the parallel-filter combine's (I + C J) systems (baselines/kalman.py),
    whose eigenvalues are >= 1 but whose leading entry can be near zero.
    Pivot selection is a batched argmax + masked row swap; ~2x the work of
    the unpivoted form, still O(d^3) unrolled wide vector ops.
    """
    d = a.shape[0]
    m = a
    rhs = b
    rows = jnp.arange(d)
    for j in range(d):
        # partial pivot: index (>= j) of the largest |column-j| entry
        cand = jnp.abs(m[:, j])  # [d, B]
        cand = jnp.where((rows >= j)[:, None], cand, -1.0)
        p = jnp.argmax(cand, axis=0)  # [B]
        # swap rows j and p in m and rhs (vectorised over the batch)
        sel_p = (rows[:, None] == p[None, :]).astype(a.dtype)  # [d, B]
        sel_j = (rows == j).astype(a.dtype)[:, None]  # [d, 1] (broadcast)
        row_p_m = jnp.einsum("ib,ikb->kb", sel_p, m)  # [d, B]
        row_j_m = m[j]
        m = (
            m
            + sel_j[:, None, :] * (row_p_m - row_j_m)[None]
            - sel_p[:, None, :] * (row_p_m - row_j_m)[None]
        )
        row_p_r = jnp.einsum("ib,ikb->kb", sel_p, rhs)
        row_j_r = rhs[j]
        rhs = (
            rhs
            + sel_j[:, None, :] * (row_p_r - row_j_r)[None]
            - sel_p[:, None, :] * (row_p_r - row_j_r)[None]
        )
        piv_inv = 1.0 / m[j, j]
        mask = (rows > j).astype(a.dtype)[:, None]
        f = m[:, j] * piv_inv[None, :] * mask
        m = m - f[:, None, :] * m[j][None, :, :]
        rhs = rhs - f[:, None, :] * rhs[j][None, :, :]
    x = [None] * d
    for i in reversed(range(d)):
        acc = rhs[i]
        for k in range(i + 1, d):
            acc = acc - m[i, k][None, :] * x[k]
        x[i] = acc / m[i, i][None, :]
    return jnp.stack(x, axis=0)


def _expm_em_impl(a: Array) -> Array:
    d = a.shape[0]
    dtype = a.dtype
    eye = jnp.eye(d, dtype=dtype)[:, :, None]

    # per-matrix inf-norm (max absolute row sum)
    row_sums = jnp.sum(jnp.abs(a), axis=1)  # [d, B]
    norm = jnp.max(row_sums, axis=0)  # [B]
    s = jnp.ceil(jnp.log2(jnp.maximum(norm / _THETA13, 1.0)))
    s = jnp.clip(s, 0, _MAX_SQUARINGS)
    a = a * (2.0 ** (-s))[None, None, :]

    b = _PADE13
    a2 = sb.matmul(a, a)
    a4 = sb.matmul(a2, a2)
    a6 = sb.matmul(a2, a4)
    w1 = b[13] * a6 + b[11] * a4 + b[9] * a2
    w2 = b[7] * a6 + b[5] * a4 + b[3] * a2 + b[1] * eye
    u = sb.matmul(a, sb.matmul(a6, w1) + w2)
    z1 = b[12] * a6 + b[10] * a4 + b[8] * a2
    v = sb.matmul(a6, z1) + b[6] * a6 + b[4] * a4 + b[2] * a2 + b[0] * eye

    r = lu_solve(v - u, v + u)

    # dynamic masked squaring: only as many rounds as the batch needs
    s_max = jnp.max(s).astype(jnp.int32)

    def cond(carry):
        k, _ = carry
        return k < s_max

    def body(carry):
        k, r = carry
        do = (k < s).astype(dtype)[None, None, :]
        r = do * sb.matmul(r, r) + (1.0 - do) * r
        return k + 1, r

    _, r = jax.lax.while_loop(cond, body, (jnp.int32(0), r))
    return r


@jax.custom_vjp
def expm_em(a: Array) -> Array:
    """Batched expm of an element-major batch [d, d, B] -> [d, d, B]."""
    return _expm_em_impl(a)


def _expm_em_fwd(a):
    return _expm_em_impl(a), a


def _expm_em_bwd(a, ybar):
    d = a.shape[0]
    a_t = sb.transpose(a)
    zeros = jnp.zeros_like(a)
    top = jnp.concatenate([a_t, ybar], axis=1)
    bot = jnp.concatenate([zeros, a_t], axis=1)
    big = jnp.concatenate([top, bot], axis=0)  # [2d, 2d, B]
    abar = _expm_em_impl(big)[:d, d:]
    return (abar,)


expm_em.defvjp(_expm_em_fwd, _expm_em_bwd)
