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


def _fused_local(R, O, yt, axis: str, jitter: float):
    """Shard-local part of the fused mahal+logdet pass.

    R, O: [d, d, m/P]; yt: [d, m/P].  Returns replicated (mahal, logdet).
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
) -> Tuple[Array, Array]:
    """Sequence-sharded fused (y^T J^{-1} y, log|J|).

    diag [N, d, d], off [N-1, d, d], y [N, d] with N a power of two
    divisible by the mesh size.  Exact match to the single-device
    `cr.mahal_and_logdet` (tests/test_parallel.py).
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

    fn = jax.jit(
        jax.shard_map(
            partial(_fused_local, axis=axis, jitter=jitter),
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
    """Shard-local PEG precision blocks in element-major layout with the
    trailing-zero invariant.

    Globally (reference models.py:180-239): with e_i = expm(-.5 d_i G),
    Q1 = I - e e^T, Q2 = I - e^T e:
      off[i]  = -Q1_i^{-1} e_i                       (i < N-1; off[N-1] = 0)
      diag[i] = I + [e Q2^{-1} e^T]_{i-1} + [e^T Q1^{-1} e]_i
    d_i needs ts[i+1] (one halo element from the right neighbour); the
    left-interval term needs a one-block shift_down (halo from the left
    neighbour).
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
    diffs = jnp.where(is_global_last, 1.0, diffs)

    e, q1 = leg.transition_and_noise(g, diffs)
    _, q2 = leg.transition_and_noise(g.T, diffs)
    e_t = jnp.swapaxes(e, -1, -2)
    eye = jnp.eye(rank, dtype=g.dtype)
    q1_inv_e = jnp.linalg.solve(q1, e)
    q2_inv_et = jnp.linalg.solve(q2, e_t)

    mask = (~is_global_last)[:, None, None]
    off_em = sb.to_em(jnp.where(mask, -q1_inv_e, 0.0))
    d_left = sb.to_em(jnp.where(mask, e @ q2_inv_et, 0.0))
    d_right = sb.to_em(jnp.where(mask, e_t @ q1_inv_e, 0.0))
    diag_em = eye[:, :, None] + shifts.shift_down(d_left) + d_right
    return diag_em, off_em


def _log_likelihood_local(params, ts_loc, xs_loc, axis: str):
    llt = leg.lambda_lambda_t(params)
    g = leg.g_matrix(params)
    num_obs = jax.lax.psum(ts_loc.shape[0], axis)

    x_llt_inv = jnp.linalg.solve(llt, xs_loc.T).T
    llt_mahal = jax.lax.psum(jnp.sum(x_llt_inv * xs_loc), axis)
    llt_logdet = num_obs * jnp.linalg.slogdet(2.0 * jnp.pi * llt)[1]
    v = x_llt_inv @ params.b

    sig_diag_em, sig_off_em = _peg_precision_local(g, ts_loc, axis)

    # log|Sigma^{-1}|: fused levels without a RHS
    zeros_rhs = jnp.zeros((params.rank, ts_loc.shape[0]), dtype=g.dtype)
    _, sig_logdet = _fused_local(sig_diag_em, sig_off_em, zeros_rhs, axis,
                                 0.0)

    bt_llt_inv_b = params.b.T @ jnp.linalg.solve(llt, params.b)
    k_diag_em = sig_diag_em + bt_llt_inv_b[:, :, None]
    k_mahal, k_logdet = _fused_local(k_diag_em, sig_off_em,
                                     sb.vec_to_em(v), axis, 0.0)

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
