"""Branch-free cyclic reduction for symmetric block-tridiagonal matrices.

Re-design of the reference's recursive even/odd elimination
(cunningham-lab/cyclic-gps, cyclic_gps/cyclic_reduction.py) for XLA/TPU:

* **Power-of-two padding.**  The input matrix (N diagonal blocks) is extended
  to M = 2^ceil(log2 N) blocks with identity diagonal blocks and zero
  off-diagonal blocks.  The padded matrix is block-diag(J, I): its log-det,
  solves, Mahalanobis forms and inverse blocks restrict exactly to the
  original ones.  Every reduction level then has an *even* block count and
  halves exactly, so the reference's rectangular/odd special cases
  (cyclic_reduction.py:19-37,50-60,74-87,102-134,156-178) disappear.

* **Trailing-zero invariant.**  Off-diagonal batches are stored with length
  equal to the diagonal batch, with the (physically absent) last block held
  at zero.  One can check that a single reduction level maps this invariant
  to itself, so *every* level is the same branch-free computation: an
  even/odd deinterleave, a batched tiny-block Cholesky, two batched
  triangular solves, and a Schur update expressed with one-block shifts.
  The shifts are the only nearest-neighbour data motion, which is what makes
  the sequence-sharded multi-chip version a pure ppermute halo exchange
  (parallel/seq_sharded.py).

* **Static shapes.**  Levels are unrolled at trace time (log2 M of them);
  every per-level array has a static shape, so the whole decomposition jits
  into one XLA program with no dynamic control flow.

All block math runs in element-major layout (ops/smallblock.py).

Semantics match the reference exactly (verified in
tests/test_cyclic_reduction.py against dense oracles):

* ``decompose`` is the block Cholesky L of T J T^T where T is the recursive
  even/odd permutation (reference test, tests/test_cyclic_reduction.py:170-191).
* ``logdet`` returns log|J| (the reference calls this ``det``,
  cyclic_reduction.py:447-458).
* ``mahal`` returns y^T J^{-1} y; ``solve`` returns J^{-1} y.
* ``mahal_and_logdet`` is the fused single-pass used in the likelihood hot
  path (cyclic_reduction.py:380-438).
* ``inverse_blocks`` returns the diagonal and lower off-diagonal blocks of
  J^{-1} in O(N d^3) (cyclic_reduction.py:470-503).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import smallblock as sb

Array = jnp.ndarray


class CRLevel(NamedTuple):
    """One cyclic-reduction level (element-major arrays, m blocks each).

    D:        Cholesky factors of the even diagonal blocks      [d, d, m]
    D_invd:   reciprocals of diag(D)                            [d, m]
    F:        U diagonal blocks  (Oe_k D_k^{-T})                [d, d, m]
    G:        U off-diag blocks  (Oo_k^T D_{k+1}^{-T}); G[m-1]=0 [d, d, m]
    """

    D: Array
    D_invd: Array
    F: Array
    G: Array


@jax.tree_util.register_pytree_node_class
class CRDecomposition:
    """Full cyclic-reduction decomposition (a pytree; ``n`` is static).

    levels:  finest-to-coarsest CRLevels (level k has M/2^{k+1} blocks).
    D_last:  Cholesky of the final 1-block system                [d, d, 1]
    D_last_invd:                                                  [d, 1]
    n:       original (unpadded) number of diagonal blocks (static aux).
    """

    def __init__(self, levels: Tuple[CRLevel, ...], D_last: Array,
                 D_last_invd: Array, n: int):
        self.levels = levels
        self.D_last = D_last
        self.D_last_invd = D_last_invd
        self.n = n

    def tree_flatten(self):
        return (self.levels, self.D_last, self.D_last_invd), self.n

    @classmethod
    def tree_unflatten(cls, n, children):
        return cls(children[0], children[1], children[2], n)


def padded_size(n: int) -> int:
    """Next power of two >= n."""
    return 1 << max(0, (n - 1).bit_length())


def level_sizes(n: int) -> List[int]:
    """Number of *real* (unpadded) blocks eliminated at each padded level.

    Padded level k eliminates the indices congruent to 2^k - 1 mod 2^{k+1};
    tail padding never changes which of the first n indices those are, so the
    real entries of each level are exactly the reference's per-level blocks
    (its ``(ms + 1) // 2``), followed by zeros.  The final entry is for the
    last 1-block system (index M-1), which is real iff n is a power of two.
    Only the final entry can be zero.
    """
    m = padded_size(n)
    sizes = []
    for k in range(m.bit_length() - 1):
        step = 1 << (k + 1)
        first = (1 << k) - 1
        sizes.append(max(0, -(-(n - first) // step)))
    sizes.append(1 if n == m else 0)
    return sizes


def pad_blocks(diag: Array, off: Array) -> Tuple[Array, Array]:
    """Pad to power-of-two size; returns element-major (R, O), both [d,d,M].

    diag: [N, d, d]; off: [N-1, d, d] with off[i] = J[i+1, i].
    Padding blocks are identity (diag) / zero (off); O[M-1] is the invariant
    zero slot.
    """
    n, d, _ = diag.shape
    m = padded_size(n)
    R = sb.to_em(diag)
    O = sb.to_em(off) if n > 1 else jnp.zeros((d, d, 0), dtype=diag.dtype)
    if m > n:
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=diag.dtype)[:, :, None], (d, d, m - n)
        )
        R = jnp.concatenate([R, eye], axis=-1)
    O = jnp.concatenate(
        [O, jnp.zeros((d, d, m - n + 1), dtype=diag.dtype)], axis=-1
    )
    return R, O


def _reduction_level(R: Array, O: Array, jitter: float = 0.0, shifts=sb):
    """One branch-free CR level.

    R, O: [d, d, m] element-major, m even, with O[..., m-1] == 0.
    Returns (CRLevel with m/2 blocks, (R', O') of the half-size system with
    the same trailing-zero invariant).

    ``shifts`` supplies the one-block nearest-neighbour shifts
    (shift_up / shift_up_chol): the local versions from smallblock by
    default, or halo-exchange (ppermute) versions under sequence sharding
    (parallel/seq_sharded.py).
    """
    Re, Ro = R[..., 0::2], R[..., 1::2]
    Oe, Oo = O[..., 0::2], O[..., 1::2]

    D, D_invd = sb.cholesky(Re, jitter=jitter)
    # F_k = Oe_k D_k^{-T}  <=>  D_k F_k^T = Oe_k^T
    F = sb.transpose(sb.solve_lower(D, D_invd, sb.transpose(Oe)))
    # G_k = Oo_k^T D_{k+1}^{-T}  <=>  D_{k+1} G_k^T = Oo_k
    D1, D1_invd = shifts.shift_up_chol(D, D_invd)
    G = sb.transpose(sb.solve_lower(D1, D1_invd, Oo))

    # Schur complement of the even blocks: R' = Ro - F F^T - G G^T,
    # O'_k = -F_{k+1} G_k^T.  G[m/2-1] = 0 keeps the invariant O'[m/2-1] = 0.
    Rn = Ro - sb.matmul(F, F, tb=True) - sb.matmul(G, G, tb=True)
    On = -sb.matmul(shifts.shift_up(F), G, tb=True)
    return CRLevel(D, D_invd, F, G), (Rn, On)


def _fused_levels(R, O, yt, jitter: float = 0.0, shifts=sb, stop: int = 1):
    """Run reduction levels while more than ``stop`` blocks remain,
    accumulating the Mahalanobis and half-log-det contributions.

    Returns (R, O, yt, mahal_partial, half_logdet_partial).  Under
    sequence sharding the partials are per-shard sums (combined by psum).
    """
    mh = jnp.zeros((), dtype=R.dtype)
    ld = jnp.zeros((), dtype=R.dtype)
    while R.shape[-1] > stop:
        lvl, (R, O) = _reduction_level(R, O, jitter=jitter, shifts=shifts)
        ld = ld + sb.chol_log_diag_sum(lvl.D)
        z = sb.solve_lower_vec(lvl.D, lvl.D_invd, yt[:, 0::2])
        mh = mh + jnp.sum(z * z)
        yt = yt[:, 1::2] - (
            sb.matvec(lvl.F, z) + sb.matvec(lvl.G, shifts.shift_up(z))
        )
    return R, O, yt, mh, ld


@partial(jax.jit, static_argnames=("jitter",))
def decompose(diag: Array, off: Array, jitter: float = 0.0) -> CRDecomposition:
    """Cyclic-reduction (= permuted block Cholesky) of a SPD block-tridiag J.

    diag: [N, d, d] diagonal blocks; off: [N-1, d, d] lower off-diagonals
    (off[i] = J[i+1, i]).  Reference: cyclic_reduction.py:287-309.
    """
    n = diag.shape[0]
    R, O = pad_blocks(diag, off)
    levels = []
    while R.shape[-1] > 1:
        level, (R, O) = _reduction_level(R, O, jitter=jitter)
        levels.append(level)
    D_last, D_last_invd = sb.cholesky(R, jitter=jitter)
    return CRDecomposition(tuple(levels), D_last, D_last_invd, n)


@jax.jit
def halfsolve(decomp: CRDecomposition, y: Array) -> List[Array]:
    """Solve L z = T y level by level (reference cyclic_reduction.py:312-338).

    y: [N, d].  Returns the cyclic-reduction representation of z: a list of
    per-level arrays of shape [m_k, d] (unpadded sizes), matching the
    reference's output layout.
    """
    n, d = y.shape
    m = padded_size(n)
    yt = jnp.concatenate(
        [sb.vec_to_em(y), jnp.zeros((d, m - n), dtype=y.dtype)], axis=-1
    )
    sizes = level_sizes(n)
    zs: List[Array] = []
    for k, lvl in enumerate(decomp.levels):
        z = sb.solve_lower_vec(lvl.D, lvl.D_invd, yt[:, 0::2])
        zs.append(sb.vec_from_em(z)[: sizes[k]])
        # residual: Q y - U z  with U z = F z + G (shift-up z)
        yt = yt[:, 1::2] - (
            sb.matvec(lvl.F, z) + sb.matvec(lvl.G, sb.shift_up(z))
        )
    if sizes[-1] > 0:
        z = sb.solve_lower_vec(decomp.D_last, decomp.D_last_invd, yt)
        zs.append(sb.vec_from_em(z)[: sizes[-1]])
    return zs


@jax.jit
def backhalfsolve(decomp: CRDecomposition, zs: Sequence[Array]) -> Array:
    """Solve L^T x = z bottom-up, returning x in natural order [N, d].

    zs is a cyclic-reduction representation (per-level [m_k, d] arrays).
    Reference: cyclic_reduction.py:341-377.
    """
    n = decomp.n
    d = decomp.D_last.shape[0]
    dtype = decomp.D_last.dtype
    sizes = level_sizes(n)
    pad_sizes = [padded_size(n) >> (k + 1) for k in range(len(decomp.levels))]
    pad_sizes.append(1)

    def pad_level(z, target):
        z_em = sb.vec_to_em(z.astype(dtype))
        extra = target - z_em.shape[-1]
        if extra:
            z_em = jnp.concatenate(
                [z_em, jnp.zeros((d, extra), dtype=dtype)], axis=-1
            )
        return z_em

    if sizes[-1] > 0:
        z_last = pad_level(zs[-1], pad_sizes[-1])
    else:
        z_last = jnp.zeros((d, 1), dtype=dtype)
    x = sb.solve_lower_t_vec(decomp.D_last, decomp.D_last_invd, z_last)
    for k in range(len(decomp.levels) - 1, -1, -1):
        lvl = decomp.levels[k]
        # U^T x: (U^T x)_j = F_j^T x_j + G_{j-1}^T x_{j-1}
        utx = sb.matvec(lvl.F, x, ta=True) + sb.shift_down(
            sb.matvec(lvl.G, x, ta=True)
        )
        yt = pad_level(zs[k], pad_sizes[k]) - utx
        x_even = sb.solve_lower_t_vec(lvl.D, lvl.D_invd, yt)
        x = sb.interleave(x_even, x)
    return sb.vec_from_em(x)[:n]


@jax.jit
def solve(decomp: CRDecomposition, y: Array) -> Array:
    """J^{-1} y for y [N, d] (reference cyclic_reduction.py:441-444)."""
    return backhalfsolve(decomp, halfsolve(decomp, y))


@jax.jit
def logdet(decomp: CRDecomposition) -> Array:
    """log |J| = 2 sum log diag(D) over all levels.

    (The reference misnames this ``det``, cyclic_reduction.py:447-458.)
    Padding blocks contribute log 1 = 0.
    """
    acc = sb.chol_log_diag_sum(decomp.D_last)
    for lvl in decomp.levels:
        acc = acc + sb.chol_log_diag_sum(lvl.D)
    return 2.0 * acc


@jax.jit
def mahal(decomp: CRDecomposition, y: Array) -> Array:
    """y^T J^{-1} y = ||L^{-1} T y||^2 (reference cyclic_reduction.py:461-467)."""
    zs = halfsolve(decomp, y)
    return sum(jnp.sum(z * z) for z in zs)


@partial(jax.jit, static_argnames=("jitter",))
def mahal_and_logdet(
    diag: Array, off: Array, y: Array, jitter: float = 0.0
) -> Tuple[Array, Array]:
    """Fused single pass computing (y^T J^{-1} y, log|J|) without storing
    the decomposition.  The training hot path (reference
    cyclic_reduction.py:380-438, called from models.py:367).
    """
    n, d = y.shape
    R, O = pad_blocks(diag, off)
    m = R.shape[-1]
    yt = jnp.concatenate(
        [sb.vec_to_em(y), jnp.zeros((d, m - n), dtype=y.dtype)], axis=-1
    )
    R, O, yt, mh, ld = _fused_levels(R, O, yt, jitter=jitter)
    D, D_invd = sb.cholesky(R, jitter=jitter)
    ld = ld + sb.chol_log_diag_sum(D)
    z = sb.solve_lower_vec(D, D_invd, yt)
    mh = mh + jnp.sum(z * z)
    return mh, 2.0 * ld


@partial(jax.jit, static_argnames=("jitter",))
def logdet_direct(diag: Array, off: Array, jitter: float = 0.0) -> Array:
    """Fused log|J| without storing the decomposition or touching a RHS."""
    R, O = pad_blocks(diag, off)
    ld = jnp.zeros((), dtype=diag.dtype)
    while R.shape[-1] > 1:
        lvl, (R, O) = _reduction_level(R, O, jitter=jitter)
        ld = ld + sb.chol_log_diag_sum(lvl.D)
    D, _ = sb.cholesky(R, jitter=jitter)
    return 2.0 * (ld + sb.chol_log_diag_sum(D))


@jax.jit
def inverse_blocks(decomp: CRDecomposition) -> Tuple[Array, Array]:
    """Diagonal and lower off-diagonal blocks of J^{-1}.

    Bottom-up selected inversion (reference cyclic_reduction.py:470-503):
    at each level, with permuted factor [[D, 0], [W, L~]] and coarse inverse
    blocks Sig = (L~ L~^T)^{-1}, the fine-level inverse blocks are assembled
    from D^{-1}, W D^{-1} and Sig.  Only tridiagonal blocks are ever formed.
    Returns ([N, d, d], [N-1, d, d]).
    """
    Di = sb.tri_lower_inverse(decomp.D_last, decomp.D_last_invd)
    Sd = sb.matmul(Di, Di, ta=True)  # [d, d, 1]
    So = jnp.zeros_like(Sd)  # trailing-zero invariant
    for lvl in reversed(decomp.levels):
        D, D_invd, F, G = lvl
        Di = sb.tri_lower_inverse(D, D_invd)
        DtiDi = sb.matmul(Di, Di, ta=True)
        FDi = sb.matmul(F, Di)
        GDi = sb.matmul(G, sb.shift_up(Di))  # pad irrelevant: G last = 0
        # V = -Sig (W D^{-1}): main and upper-diagonal blocks.
        Vd = -(sb.matmul(Sd, FDi) + sb.shift_down(sb.matmul(So, GDi)))
        Vo = -(
            sb.matmul(Sd, GDi)
            + sb.matmul(sb.transpose(So), sb.shift_up(FDi))
        )
        # Even diagonal blocks: D^{-T}D^{-1} + (WD^{-1})^T Sig (WD^{-1}).
        newd = DtiDi - (
            sb.matmul(FDi, Vd, ta=True)
            + sb.shift_down(sb.matmul(GDi, Vo, ta=True))
        )
        Sd = sb.interleave(newd, Sd)
        So = sb.interleave(Vd, sb.transpose(Vo))
    n = decomp.n
    return sb.from_em(Sd)[:n], sb.from_em(So)[: n - 1]
