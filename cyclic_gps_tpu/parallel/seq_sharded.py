"""Sequence-sharded cyclic reduction and LEG likelihood (shard_map).

Scaling the sequence axis beyond one chip: blocks are sharded contiguously
along time over a 'seq' mesh axis.  Because the branch-free CR formulation
(ops/cyclic_reduction.py) expresses ALL nearest-neighbour data motion as
one-block shifts, the distributed version only replaces those shifts with
`lax.ppermute` halo exchanges over ICI -- one d x d block (or d-vector)
per shard edge per level.  Reduction levels run sharded until each shard
holds a single block; the tiny P-block remainder is all-gathered and
finished replicated.

This is the TPU-native answer to the reference's "can we parallelize?"
TODO (cyclic_reduction.py:322): per-level block parallelism within a chip
comes from batching (vectorized element-major ops), across chips from
sequence sharding with halo exchange.

Constraints: the global block count N must be a power of two and divisible
by the shard count (pad on the host with `cr.pad_blocks`-style identity /
zero blocks first if needed -- exact for logdet / mahal / solve).
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.ops import cyclic_reduction as cr
from cyclic_gps_tpu.ops import partitioned as pt
from cyclic_gps_tpu.ops import smallblock as sb

Array = jnp.ndarray


def make_seq_mesh(num_devices: Optional[int] = None, axis: str = "seq") -> Mesh:
    devices = np.asarray(jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(devices, (axis,))


def _halo_shifts(axis: str):
    """Halo-exchange versions of the one-block shifts: local shift plus a
    single-block ppermute at the shard boundary."""
    psize = jax.lax.axis_size(axis)
    fwd = [(i, i - 1) for i in range(1, psize)]  # send to left neighbour
    bwd = [(i, i + 1) for i in range(psize - 1)]  # send to right neighbour

    def shift_up(x):
        recv = jax.lax.ppermute(x[..., :1], axis, perm=fwd)
        return jnp.concatenate([x[..., 1:], recv], axis=-1)

    def shift_down(x):
        recv = jax.lax.ppermute(x[..., -1:], axis, perm=bwd)
        return jnp.concatenate([recv, x[..., :-1]], axis=-1)

    def shift_up_chol(L, inv_diag):
        d = L.shape[0]
        recv_l = jax.lax.ppermute(L[..., :1], axis, perm=fwd)
        recv_i = jax.lax.ppermute(inv_diag[..., :1], axis, perm=fwd)
        # the global-last shard receives zeros; pad with identity so the
        # triangular solve against it stays finite (multiplies only the
        # invariant zero block)
        is_last = jax.lax.axis_index(axis) == psize - 1
        eye = jnp.eye(d, dtype=L.dtype)[:, :, None]
        recv_l = jnp.where(is_last, eye, recv_l)
        recv_i = jnp.where(is_last, jnp.ones_like(recv_i), recv_i)
        return (
            jnp.concatenate([L[..., 1:], recv_l], axis=-1),
            jnp.concatenate([inv_diag[..., 1:], recv_i], axis=-1),
        )

    return SimpleNamespace(
        shift_up=shift_up, shift_down=shift_down, shift_up_chol=shift_up_chol
    )


def _partitioned_fused_local(R, O, yt, axis: str, jitter: float):
    """Shard-local fused (mahal, logdet) via the PARTITIONED engine.

    R, O: [d, d, m] local element-major blocks (m = N/P, a power of two;
    O[..., i] couples local blocks i and i+1, the trailing entry crossing
    the shard edge -- zero only at the global end), yt: [d, m].

    Chunk boundaries align with shard boundaries by construction
    (ops/partitioned.py docstring): each level runs one shard-local
    `lax.scan` over chunk interiors, and the reduced boundary system's
    nearest-neighbour terms become ONE-BLOCK `ppermute` halo exchanges
    over ICI (the previous chunk's W1 contributions).  Levels recurse
    shard-local until the global remainder is small, then all_gather
    (a few KB) and finish replicated.  This replaces the round-1 CR-based
    `_fused_local` on the hot path: same collectives pattern, ~15x less
    work per level (one streaming pass instead of log2(m) halving levels).
    """
    d = R.shape[0]
    psize = jax.lax.axis_size(axis)
    shifts = _halo_shifts(axis)
    mh = jnp.zeros((), R.dtype)
    ld = jnp.zeros((), R.dtype)
    while psize * R.shape[-1] > max(256, 4 * psize):
        m = R.shape[-1]
        s = min(128, m // 2)
        while s > 1 and m % s:  # largest divisor <= 128 (trivial for 2^k)
            s -= 1
        if s < 2:
            break  # no usable chunking; gather whatever remains
        c_loc = m // s
        # local chunk-major relayout: em index i = c*s + j -> [j, ..., c]
        R_cm = jnp.transpose(R.reshape(d, d, c_loc, s), (3, 0, 1, 2))
        O_cm = jnp.transpose(O.reshape(d, d, c_loc, s), (3, 0, 1, 2))
        y_cm = jnp.transpose(yt.reshape(d, c_loc, s), (2, 0, 1))
        state, w1, _ = pt._forward_sweep(R_cm, O_cm, y_cm, jitter, None)
        # reduced boundary system; the (W1^T W1 / W1^T w) terms of the
        # previous chunk cross shard edges via the halo shift_down
        s11 = sb.matmul(w1, w1, ta=True)
        R = R_cm[0] - state.acc00 - shifts.shift_down(s11)
        O = -sb.matmul(w1, state.w0, ta=True)
        yt = y_cm[0] - state.accy0 - shifts.shift_down(
            sb.matvec(w1, state.w, ta=True)
        )
        mh = mh + state.mh
        ld = ld + 2.0 * state.ld
    # gather the small remainder and finish replicated
    nrem = psize * R.shape[-1]
    Rg = jax.lax.all_gather(R, axis, axis=2, tiled=True)
    Og = jax.lax.all_gather(O, axis, axis=2, tiled=True)
    yg = jax.lax.all_gather(yt, axis, axis=1, tiled=True)
    mh_t, ld_t = pt._mahal_and_logdet_impl(
        sb.from_em(Rg), sb.from_em(Og)[: nrem - 1], sb.vec_from_em(yg),
        None, jitter,
    )
    return jax.lax.psum(mh, axis) + mh_t, jax.lax.psum(ld, axis) + ld_t


def _fused_local(R, O, yt, axis: str, jitter: float):
    """Shard-local part of the fused mahal+logdet pass (CR engine).

    R, O: [d, d, m/P]; yt: [d, m/P].  Returns replicated (mahal, logdet).
    Kept as the secondary/cross-check engine; the hot path is
    `_partitioned_fused_local`.
    """
    shifts = _halo_shifts(axis)
    R, O, yt, mh, ld = cr._fused_levels(R, O, yt, jitter=jitter,
                                        shifts=shifts, stop=1)
    # gather the P-block remainder and finish replicated
    Rg = jax.lax.all_gather(R, axis, axis=2, tiled=True)
    Og = jax.lax.all_gather(O, axis, axis=2, tiled=True)
    yg = jax.lax.all_gather(yt, axis, axis=1, tiled=True)
    Rg, Og, yg, mh_t, ld_t = cr._fused_levels(Rg, Og, yg, jitter=jitter,
                                              stop=1)
    D, D_invd = sb.cholesky(Rg, jitter=jitter)
    ld_t = ld_t + sb.chol_log_diag_sum(D)
    z = sb.solve_lower_vec(D, D_invd, yg)
    mh_t = mh_t + jnp.sum(z * z)
    mh = jax.lax.psum(mh, axis) + mh_t
    ld = jax.lax.psum(ld, axis) + ld_t
    return mh, 2.0 * ld


def mahal_and_logdet(
    diag: Array,
    off: Array,
    y: Array,
    mesh: Mesh,
    axis: str = "seq",
    jitter: float = 0.0,
    engine: str = "partitioned",
) -> Tuple[Array, Array]:
    """Sequence-sharded fused (y^T J^{-1} y, log|J|).

    diag [N, d, d], off [N-1, d, d], y [N, d] with N a power of two
    divisible by the mesh size.  Exact match to the single-device
    engines (tests/test_parallel.py).

    ``engine``: "partitioned" (default; one streaming pass per level,
    the hot path) or "cr" (halo-exchange cyclic reduction; log2(m)
    halving levels, kept as the cross-check engine).
    """
    n, d, _ = diag.shape
    psize = mesh.shape[axis]
    if n & (n - 1):
        raise ValueError("sequence-sharded CR requires power-of-two N")
    if n % psize:
        raise ValueError("N must divide the mesh axis size")

    # element-major with the trailing zero off-diagonal slot
    R = sb.to_em(diag)
    O = jnp.concatenate(
        [sb.to_em(off), jnp.zeros((d, d, 1), dtype=diag.dtype)], axis=-1
    )
    yt = sb.vec_to_em(y)

    local = {"partitioned": _partitioned_fused_local,
             "cr": _fused_local}[engine]
    fn = jax.jit(
        jax.shard_map(
            partial(local, axis=axis, jitter=jitter),
            mesh=mesh,
            in_specs=(P(None, None, axis), P(None, None, axis), P(None, axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return fn(R, O, yt)


# ---------------------------------------------------------------------------
# Sequence-sharded LEG log-likelihood (single series sharded along time).
# ---------------------------------------------------------------------------


def _peg_precision_local(g: Array, ts_loc: Array, axis: str):
    """Shard-local PEG precision blocks, ELEMENT-MAJOR throughout, plus
    the local partial of the closed-form prior log-determinant.

    Globally (reference models.py:180-239): with e_i = expm(-.5 d_i G),
    Q1 = I - e e^T, Q2 = I - e^T e:
      off[i]  = -Q1_i^{-1} e_i                       (i < N-1; off[N-1] = 0)
      diag[i] = I + [e Q2^{-1} e^T]_{i-1} + [e^T Q1^{-1} e]_i
    d_i needs ts[i+1] (one halo element from the right neighbour); the
    left-interval term needs a one-block shift_down (halo from the left
    neighbour).  All solves are Cholesky small-block sweeps on [r, r, m]
    element-major arrays (mirroring leg._peg_precision_em); the round-1
    version built [m, r, r] batch-major temporaries, the tile-padded
    layout this codebase exists to avoid.

    Also returns the local partial of log|Sigma^{-1}| = -sum_i log|Q1_i|
    over real gaps (Markov factorisation, leg.peg_precision_and_logdet):
    psum it -- no factorization of the bare prior precision needed.
    """
    shifts = _halo_shifts(axis)
    rank = g.shape[0]
    psize = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    mloc = ts_loc.shape[0]

    # next timestamp for each local index (halo for the last one)
    ts_next = shifts.shift_up(ts_loc[None, :])[0]
    diffs = ts_next - ts_loc  # garbage at the global last index
    is_global_last = (idx == psize - 1) & (
        jnp.arange(mloc) == mloc - 1
    )
    gap_valid = (~is_global_last).astype(g.dtype)  # [m]
    diffs = jnp.where(is_global_last, 1.0, diffs)

    e, q1 = leg.transition_and_noise_em(g, diffs)
    # off/d_left/d_right from Q1 alone (push-through identity; no second
    # Van Loan exponential for G^T) -- see leg._q1_terms
    off1, d_left1, d_right1, l1 = leg._q1_terms(e, q1)

    gv = gap_valid[None, None, :]
    off_em = off1 * gv
    d_left = d_left1 * gv
    d_right = d_right1 * gv
    eye = jnp.eye(rank, dtype=g.dtype)[:, :, None]
    diag_em = eye + shifts.shift_down(d_left) + d_right

    ldiag = jnp.log(jnp.diagonal(l1, axis1=0, axis2=1))  # [m, r]
    sig_logdet_local = -2.0 * jnp.sum(ldiag * gap_valid[:, None])
    return diag_em, off_em, sig_logdet_local


def _log_likelihood_local(params, ts_loc, xs_loc, axis: str):
    llt = leg.lambda_lambda_t(params)
    g = leg.g_matrix(params)
    num_obs = jax.lax.psum(ts_loc.shape[0], axis)

    x_llt_inv = jnp.linalg.solve(llt, xs_loc.T).T
    llt_mahal = jax.lax.psum(jnp.sum(x_llt_inv * xs_loc), axis)
    llt_logdet = num_obs * jnp.linalg.slogdet(2.0 * jnp.pi * llt)[1]
    v = x_llt_inv @ params.b

    sig_diag_em, sig_off_em, sig_ld_loc = _peg_precision_local(
        g, ts_loc, axis
    )
    # closed-form log|Sigma^{-1}| (no second elimination pass)
    sig_logdet = jax.lax.psum(sig_ld_loc, axis)

    bt_llt_inv_b = params.b.T @ jnp.linalg.solve(llt, params.b)
    k_diag_em = sig_diag_em + bt_llt_inv_b[:, :, None]
    k_mahal, k_logdet = _partitioned_fused_local(
        k_diag_em, sig_off_em, sb.vec_to_em(v), axis, 0.0
    )

    mahal = llt_mahal - k_mahal
    logdet = llt_logdet + k_logdet - sig_logdet
    return -0.5 * (mahal + logdet)


def log_likelihood(
    params: leg.LEGParams,
    ts: Array,
    xs: Array,
    mesh: Mesh,
    axis: str = "seq",
) -> Array:
    """Sequence-sharded LEG marginal log-likelihood (exact).

    N must be a power of two divisible by the mesh axis size.
    """
    n = ts.shape[0]
    psize = mesh.shape[axis]
    if n & (n - 1) or n % psize:
        raise ValueError(
            "sequence-sharded likelihood requires power-of-two N divisible "
            "by the mesh size"
        )
    fn = jax.jit(
        jax.shard_map(
            partial(_log_likelihood_local, axis=axis),
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis, None)),
            out_specs=P(),
            check_vma=False,
        )
    )
    return fn(params, ts, xs)
