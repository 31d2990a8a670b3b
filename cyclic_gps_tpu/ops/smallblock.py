"""Element-major batched small-block linear algebra.

The LEG/cyclic-reduction workload is dominated by linear algebra on *tiny*
(d x d, d <= ~10) matrix blocks, batched over very large leading dimensions
(up to N = 1e7 blocks).  The TPU-native layout for this regime is
**element-major**: a batch of B blocks is stored as an array of shape
``[d, d, B]`` so the huge batch axis is the minor (lane) dimension and every
block operation vectorises across the whole batch.  This is the opposite of
the reference implementation (cunningham-lab/cyclic-gps,
cyclic_gps/cyclic_reduction.py:227-254), which keeps blocks batch-major and
relies on torch's batched ``cholesky`` / ``triangular_solve``.

All factorizations/solves are expressed as **d-step column sweeps** over
whole [d, B] / [d, d, B] arrays (outer-product Cholesky downdates,
substitution sweeps, matmul as a sum of k outer products).  With d static
this unrolls to O(d) wide vector ops per primitive -- small HLO programs
(fast XLA compiles even for log2(N) unrolled reduction levels) that fuse
into bandwidth-bound kernels.

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
    """Per-block matmul of em batches as a sum of k outer products.

    Computes ``op(a) @ op(b)`` per block where ``op`` optionally transposes.
    a: [d, p, B] (or transposed), b: [p, e, B] (or transposed) -> [d, e, B].
    """
    if ta:
        a = transpose(a)
    if tb:
        b = transpose(b)
    p = a.shape[1]
    acc = a[:, 0, None, :] * b[None, 0, :, :]
    for k in range(1, p):
        acc = acc + a[:, k, None, :] * b[None, k, :, :]
    return acc


def matvec(a: Array, x: Array, ta: bool = False) -> Array:
    """Per-block matrix-vector product: a [d, p, B], x [p, B] -> [d, B]."""
    if ta:
        a = transpose(a)
    p = a.shape[1]
    acc = a[:, 0, :] * x[None, 0, :]
    for k in range(1, p):
        acc = acc + a[:, k, :] * x[None, k, :]
    return acc


def _col_mask(d: int, j: int, dtype) -> Array:
    """[d, 1] mask selecting rows >= j."""
    return (jnp.arange(d) >= j).astype(dtype)[:, None]


PIVOT_FLOOR_F32 = 1e-6  # relative pivot floor for single precision


def cholesky(a: Array, jitter: float = 0.0) -> Tuple[Array, Array]:
    """Per-block lower Cholesky of an em batch of SPD blocks.

    Outer-product form: d steps, each extracting one scaled column and
    applying a rank-1 downdate to the trailing submatrix.  Returns
    ``(L, inv_diag)`` with ``inv_diag[j] = 1 / L[j, j]`` ([d, B]) so
    downstream triangular solves multiply instead of divide.

    At single precision, pivots are floored at ``PIVOT_FLOOR_F32`` times
    the original diagonal entry: for matrices whose global condition
    number exceeds 1/eps_f32 (e.g. the LEG posterior precision for very
    smooth learned processes), roundoff drives true-positive pivots
    negative and the factorization would NaN.  This is the jit-friendly
    analogue of the reference's jitter-retrying ``psd_safe_cholesky``
    (cyclic_reduction.py:7,13); at float64 the floor is off and the
    factorization is exact.
    """
    d = a.shape[0]
    x = a + jitter * jnp.eye(d, dtype=a.dtype)[:, :, None] if jitter else a
    floor_rel = PIVOT_FLOOR_F32 if a.dtype == jnp.float32 else 0.0
    cols = []
    invs = []
    for j in range(d):
        piv = x[j, j]
        if floor_rel:
            piv = jnp.maximum(piv, floor_rel * a[j, j])
        piv_inv = 1.0 / jnp.sqrt(piv)
        col = x[:, j] * (piv_inv[None, :] * _col_mask(d, j, a.dtype))
        if floor_rel:
            col = col.at[j].set(jnp.sqrt(piv))
        cols.append(col)
        invs.append(piv_inv)
        if j + 1 < d:
            x = x - col[:, None, :] * col[None, :, :]
    L = jnp.stack(cols, axis=1)  # columns j -> axis 1
    return L, jnp.stack(invs, axis=0)


def chol_log_diag_sum(L: Array) -> Array:
    """sum log L[j, j] over blocks and batch -> scalar."""
    diag = jnp.diagonal(L, axis1=0, axis2=1)  # [B, d]
    return jnp.sum(jnp.log(diag))


def chol_log_diag_rows(L: Array) -> Array:
    """sum log L[j, j] over the block dims only -> [B] (per-block pivot
    log-determinant halves; see partitioned.logdet_rows)."""
    diag = jnp.diagonal(L, axis1=0, axis2=1)  # [B, d]
    return jnp.sum(jnp.log(diag), axis=1)


def solve_lower(L: Array, inv_diag: Array, y: Array) -> Array:
    """Per-block lower-triangular solve ``L X = Y`` with matrix RHS.

    L: [d, d, B], inv_diag: [d, B], y: [d, e, B] -> x: [d, e, B].
    Forward substitution as d rank-1 updates on the residual.
    """
    d = L.shape[0]
    res = y
    rows = []
    for i in range(d):
        xi = res[i] * inv_diag[i][None, :]  # [e, B]
        rows.append(xi)
        if i + 1 < d:
            res = res - L[:, i, None, :] * xi[None, :, :]
    return jnp.stack(rows, axis=0)


def solve_lower_vec(L: Array, inv_diag: Array, y: Array) -> Array:
    """Per-block lower-triangular solve ``L x = y`` with vector RHS [d, B]."""
    d = L.shape[0]
    res = y
    comps = []
    for i in range(d):
        xi = res[i] * inv_diag[i]  # [B]
        comps.append(xi)
        if i + 1 < d:
            res = res - L[:, i, :] * xi[None, :]
    return jnp.stack(comps, axis=0)


def solve_lower_t(L: Array, inv_diag: Array, y: Array) -> Array:
    """Per-block solve ``L^T X = Y`` (back substitution), matrix RHS
    [d, e, B]."""
    d = L.shape[0]
    res = y
    rows = [None] * d
    for i in reversed(range(d)):
        xi = res[i] * inv_diag[i][None, :]
        rows[i] = xi
        if i > 0:
            res = res - L[i, :, None, :] * xi[None, :, :]
    return jnp.stack(rows, axis=0)


def solve_lower_t_vec(L: Array, inv_diag: Array, y: Array) -> Array:
    """Per-block solve ``L^T x = y`` (back substitution), vector RHS [d, B]."""
    d = L.shape[0]
    res = y
    comps = [None] * d
    for i in reversed(range(d)):
        xi = res[i] * inv_diag[i]
        comps[i] = xi
        if i > 0:
            res = res - L[i, :, :] * xi[None, :]  # (L^T)[:, i] = L[i, :]
    return jnp.stack(comps, axis=0)


def tri_lower_inverse(L: Array, inv_diag: Array) -> Array:
    """Per-block inverse of a lower-triangular em batch via a triangular
    solve against the identity.  The reference inverts with a dense
    ``linalg.inv`` (cyclic_reduction.py:475,484); this exploits
    triangularity."""
    eye = identity_like(L)
    return solve_lower(L, inv_diag, eye)


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
