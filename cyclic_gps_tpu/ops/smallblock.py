"""Element-major batched small-block linear algebra.

The LEG/cyclic-reduction workload is dominated by linear algebra on *tiny*
(d x d, d <= ~10) matrix blocks, batched over very large leading dimensions
(up to N = 1e7 blocks).  The TPU-native layout for this regime is
**element-major**: a batch of B blocks is stored as an array of shape
``[d, d, B]`` so that every scalar block element ``A[i, k]`` is a contiguous
B-wide vector.  Every block operation (Cholesky, triangular solve, matmul)
then unrolls -- at trace time, d is static -- into O(d^3) fused vector ops on
[B]-shaped arrays, which XLA maps directly onto the 8x128 VPU with full lane
utilisation.  This is the opposite of the reference implementation
(cunningham-lab/cyclic-gps, cyclic_gps/cyclic_reduction.py:227-254), which
keeps blocks batch-major and relies on torch's batched ``cholesky`` /
``triangular_solve`` loops.

Conventions
-----------
* "em" (element-major) block batches: ``[d, d, B]``; ``A[i, k]`` is a [B]
  vector holding element (i, k) of every block.
* em vector batches: ``[d, B]``.
* All functions are pure jax and differentiable; d-loops are unrolled at
  trace time.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def to_em(blocks: Array) -> Array:
    """[B, d, d] batch-major -> [d, d, B] element-major."""
    return jnp.transpose(blocks, (1, 2, 0))


def from_em(blocks_em: Array) -> Array:
    """[d, d, B] element-major -> [B, d, d] batch-major."""
    return jnp.transpose(blocks_em, (2, 0, 1))


def vec_to_em(x: Array) -> Array:
    """[B, d] -> [d, B]."""
    return jnp.transpose(x, (1, 0))


def vec_from_em(x_em: Array) -> Array:
    """[d, B] -> [B, d]."""
    return jnp.transpose(x_em, (1, 0))


def transpose(a: Array) -> Array:
    """Per-block transpose of an em batch: swap the two element axes."""
    return jnp.swapaxes(a, 0, 1)


def identity_like(a: Array) -> Array:
    """em batch of identity blocks with the shape/dtype of ``a``."""
    d = a.shape[0]
    eye = jnp.eye(d, dtype=a.dtype)[:, :, None]
    return jnp.broadcast_to(eye, a.shape)


def matmul(a: Array, b: Array, ta: bool = False, tb: bool = False) -> Array:
    """Per-block matmul of em batches, unrolled over block elements.

    Computes ``op(a) @ op(b)`` per block where ``op`` optionally transposes.
    a: [d, p, B] (or [p, d, B] if ta), b: [p, e, B] (or [e, p, B] if tb).
    """
    if ta:
        a = transpose(a)
    if tb:
        b = transpose(b)
    d, p, _ = a.shape
    e = b.shape[1]
    rows = []
    for i in range(d):
        row = []
        for j in range(e):
            acc = a[i, 0] * b[0, j]
            for k in range(1, p):
                acc = acc + a[i, k] * b[k, j]
            row.append(acc)
        rows.append(jnp.stack(row, axis=0))
    return jnp.stack(rows, axis=0)


def matvec(a: Array, x: Array, ta: bool = False) -> Array:
    """Per-block matrix-vector product: a [d, p, B], x [p, B] -> [d, B]."""
    if ta:
        a = transpose(a)
    d, p, _ = a.shape
    out = []
    for i in range(d):
        acc = a[i, 0] * x[0]
        for k in range(1, p):
            acc = acc + a[i, k] * x[k]
        out.append(acc)
    return jnp.stack(out, axis=0)


def cholesky(a: Array, jitter: float = 0.0) -> Tuple[Array, Array]:
    """Per-block lower Cholesky of an em batch of SPD blocks.

    Returns ``(L, inv_diag)`` where ``inv_diag[i] = 1 / L[i, i]`` ([d, B]),
    kept so downstream triangular solves multiply instead of divide.
    Unrolled: ~d^3/6 multiply-adds, d sqrt, d reciprocals -- all [B]-wide.
    """
    d = a.shape[0]
    L = [[None] * d for _ in range(d)]
    inv = [None] * d
    for j in range(d):
        s = a[j, j] + jitter if jitter else a[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(s)
        L[j][j] = Ljj
        inv[j] = 1.0 / Ljj
        for i in range(j + 1, d):
            t = a[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv[j]
    zero = jnp.zeros_like(a[0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(d)], axis=0)
        for i in range(d)
    ]
    return jnp.stack(rows, axis=0), jnp.stack(inv, axis=0)


def chol_log_diag_sum(L: Array) -> Array:
    """sum_i log L[i, i] per block, summed over the whole batch -> scalar."""
    d = L.shape[0]
    acc = jnp.sum(jnp.log(L[0, 0]))
    for i in range(1, d):
        acc = acc + jnp.sum(jnp.log(L[i, i]))
    return acc


def solve_lower(L: Array, inv_diag: Array, y: Array) -> Array:
    """Per-block lower-triangular solve ``L X = Y`` with matrix RHS.

    L: [d, d, B], inv_diag: [d, B], y: [d, e, B] -> x: [d, e, B].
    Forward substitution unrolled over d.
    """
    d = L.shape[0]
    e = y.shape[1]
    X = []
    for i in range(d):
        row = []
        for j in range(e):
            t = y[i, j]
            for k in range(i):
                t = t - L[i, k] * X[k][j]
            row.append(t * inv_diag[i])
        X.append(row)
    return jnp.stack([jnp.stack(r, axis=0) for r in X], axis=0)


def solve_lower_vec(L: Array, inv_diag: Array, y: Array) -> Array:
    """Per-block lower-triangular solve ``L x = y`` with vector RHS [d, B]."""
    d = L.shape[0]
    x = []
    for i in range(d):
        t = y[i]
        for k in range(i):
            t = t - L[i, k] * x[k]
        x.append(t * inv_diag[i])
    return jnp.stack(x, axis=0)


def solve_lower_t_vec(L: Array, inv_diag: Array, y: Array) -> Array:
    """Per-block solve ``L^T x = y`` (back substitution), vector RHS [d, B]."""
    d = L.shape[0]
    x = [None] * d
    for i in reversed(range(d)):
        t = y[i]
        for k in range(i + 1, d):
            t = t - L[k, i] * x[k]
        x[i] = t * inv_diag[i]
    return jnp.stack(x, axis=0)


def tri_lower_inverse(L: Array, inv_diag: Array) -> Array:
    """Per-block inverse of a lower-triangular em batch.

    M = L^{-1}: M[i, i] = 1/L[i, i]; for i > j,
    M[i, j] = -(1/L[i, i]) * sum_{j <= k < i} L[i, k] M[k, j].
    The reference inverts with a dense ``linalg.inv``
    (cyclic_reduction.py:475,484); this exploits triangularity.
    """
    d = L.shape[0]
    M = [[None] * d for _ in range(d)]
    zero = jnp.zeros_like(L[0, 0])
    for j in range(d):
        M[j][j] = inv_diag[j]
        for i in range(j + 1, d):
            t = L[i, j] * M[j][j]
            for k in range(j + 1, i):
                t = t + L[i, k] * M[k][j]
            M[i][j] = -t * inv_diag[i]
    rows = [
        jnp.stack([M[i][j] if j <= i else zero for j in range(d)], axis=0)
        for i in range(d)
    ]
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# Shifts along the batch (block-sequence) axis.  These encode the
# nearest-neighbour coupling of the block-tridiagonal structure; under
# sequence sharding they become ppermute halo exchanges (parallel/).
# ---------------------------------------------------------------------------


def shift_up(a: Array) -> Array:
    """a[..., k] <- a[..., k+1]; last entry zero-filled."""
    pad = jnp.zeros(a.shape[:-1] + (1,), dtype=a.dtype)
    return jnp.concatenate([a[..., 1:], pad], axis=-1)


def shift_down(a: Array) -> Array:
    """a[..., k] <- a[..., k-1]; first entry zero-filled."""
    pad = jnp.zeros(a.shape[:-1] + (1,), dtype=a.dtype)
    return jnp.concatenate([pad, a[..., :-1]], axis=-1)


def shift_up_chol(L: Array, inv_diag: Array) -> Tuple[Array, Array]:
    """Shift a Cholesky-factor batch up one block, padding with identity.

    The pad value multiplies only zero blocks (the trailing off-diagonal
    invariant), but must be a valid triangular factor so reciprocals stay
    finite.
    """
    d = L.shape[0]
    eye = jnp.eye(d, dtype=L.dtype)[:, :, None]
    L_pad = jnp.concatenate([L[..., 1:], eye], axis=-1)
    one = jnp.ones(inv_diag.shape[:-1] + (1,), dtype=inv_diag.dtype)
    inv_pad = jnp.concatenate([inv_diag[..., 1:], one], axis=-1)
    return L_pad, inv_pad


def interleave(a: Array, b: Array) -> Array:
    """Merge even (a) and odd (b) subsequences along the last axis.

    a, b: [..., m] -> [..., 2m] with out[..., 0::2] = a, out[..., 1::2] = b.
    Static-shape inverse of the even/odd split (reference ``interleave``,
    cyclic_reduction.py:181-200, without the ragged tail cases -- padding
    makes both halves equal length at every level).
    """
    stacked = jnp.stack([a, b], axis=-1)
    return stacked.reshape(a.shape[:-1] + (a.shape[-1] * 2,))
