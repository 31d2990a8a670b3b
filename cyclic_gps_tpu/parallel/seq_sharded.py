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

from functools import lru_cache, partial
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


@lru_cache(maxsize=None)
def _cached_shard_fn(builder, mesh: Mesh, axis: str, *extra):
    """One jitted shard_map wrapper per (entry, mesh, axis, params).

    Every public entry used to build a FRESH ``jax.jit(shard_map(...))``
    per call, so each call re-traced and re-lowered the whole sharded
    program (seconds at N = 1e5+) -- a training loop would pay it every
    step.  ``builder`` is a module-level function (hashable identity)
    returning the jitted wrapper; Mesh is hashable, so the cache keys on
    the actual device assignment."""
    return builder(mesh, axis, *extra)


# Per-level chunk length for the shard-local partitioned sweeps.
# Tests monkeypatch this down (e.g. to 8) so interpret-mode Pallas runs
# keep the kernel grid small; keep in sync with ops/partitioned's
# default_chunk_len scale for production.
_LEVEL_CHUNK = 128


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


def _partitioned_fused_local(R, O, yt, axis: str, jitter: float,
                             parts: bool = False, backend: str = "xla"):
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

    ``backend="pallas"`` runs the LARGE first level's forward sweep as
    the fused Pallas kernel (ops/pallas_sweep.forward_sweep_pallas) on
    each shard -- the same kernel/XLA split as the single-chip entry
    (`pt._mahal_cm_primal`): kernel on the streaming level, scans on the
    small tails.  shard_map's manual partitioning is what makes this
    safe (each device owns its block outright); GSPMD auto-sharding over
    the kernel remains excluded (`pt.resolve_backend`).  CI covers it
    via interpret mode (tests/test_parallel.py); default stays "xla".
    """
    d = R.shape[0]
    psize = jax.lax.axis_size(axis)
    shifts = _halo_shifts(axis)
    mh = jnp.zeros((), R.dtype)
    ld = jnp.zeros((), R.dtype)
    while psize * R.shape[-1] > max(256, 4 * psize):
        m = R.shape[-1]
        # _LEVEL_CHUNK is a module constant so interpret-mode CI can
        # shrink the kernel grid (128 steps/level is hours in the Python
        # interpreter); production value matches ops/partitioned.
        s = min(_LEVEL_CHUNK, m // 2)
        while s > 1 and m % s:  # largest divisor <= s (trivial for 2^k)
            s -= 1
        if s < 2:
            break  # no usable chunking; gather whatever remains
        c_loc = m // s
        # local chunk-major relayout: em index i = c*s + j -> [j, ..., c]
        R_cm = jnp.transpose(R.reshape(d, d, c_loc, s), (3, 0, 1, 2))
        O_cm = jnp.transpose(O.reshape(d, d, c_loc, s), (3, 0, 1, 2))
        y_cm = jnp.transpose(yt.reshape(d, c_loc, s), (2, 0, 1))
        if backend == "pallas" and s >= 3 and c_loc >= 64:
            from cyclic_gps_tpu.ops.pallas_sweep import forward_sweep_pallas

            (acc00, accy0, w0l, wl, dl, invdl, mh_k,
             ld_k, _) = forward_sweep_pallas(R_cm, O_cm, y_cm,
                                             jitter=jitter)
            state = pt._SweepState(None, w0l, wl, dl, invdl, acc00,
                                   accy0, mh_k, ld_k)
            w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
        else:
            state, w1, _ = pt._forward_sweep(R_cm, O_cm, y_cm, jitter,
                                             None)
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
    if parts:
        # per-shard partial contributions (psum(parts) == total): the
        # replicated terminal term is charged to shard 0 only.  This is
        # the custom-VJP boundary -- see _mahal_parts_diff.
        is0 = (jax.lax.axis_index(axis) == 0).astype(R.dtype)
        return mh + is0 * mh_t, ld + is0 * ld_t
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
    backend: str = "xla",
) -> Tuple[Array, Array]:
    """Sequence-sharded fused (y^T J^{-1} y, log|J|).

    diag [N, d, d], off [N-1, d, d], y [N, d] with N a power of two
    divisible by the mesh size.  Exact match to the single-device
    engines (tests/test_parallel.py).

    ``engine``: "partitioned" (default; one streaming pass per level,
    the hot path) or "cr" (halo-exchange cyclic reduction; log2(m)
    halving levels, kept as the cross-check engine).

    ``backend``: "xla" (default) or "pallas" -- run each shard's large
    first elimination level as the fused Pallas kernel (multi-chip pods;
    see `_partitioned_fused_local`).  This rig cannot execute multi-chip
    TPU programs, so the pallas route is validated by interpret-mode CI
    parity plus the single-chip kernels' on-device record.
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

    fn = _cached_shard_fn(_build_mahal_fn, mesh, axis, jitter, engine,
                          backend)
    return fn(R, O, yt)


def _build_mahal_fn(mesh, axis, jitter, engine, backend):
    if engine == "partitioned":
        local = partial(_partitioned_fused_local, axis=axis,
                        jitter=jitter, backend=backend)
    else:
        local = partial(_fused_local, axis=axis, jitter=jitter)
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, None, axis), P(None, None, axis), P(None, axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


# ---------------------------------------------------------------------------
# Sequence-sharded SOLVE and SELECTED INVERSION (round 3).
#
# Same level structure as `_partitioned_fused_local`, but each elimination
# level additionally stores its back-substitution factors; after the
# replicated terminal solve, the levels are walked back UP, the chunk
# boundary values crossing shard edges as ONE-BLOCK ppermutes (the
# `shift_up` halo -- the mirror image of the forward sweep's W1 terms).
# This is what makes multi-chip posteriors possible: solve -> posterior
# mean, Takahashi -> marginal covariances, and together they form the
# analytic VJP of the sharded likelihood (one solve + one selected
# inversion, O(1) stored state -- the same backward the single-chip
# engine uses, ops/partitioned.py:_mahal_cm_bwd).
# ---------------------------------------------------------------------------


def _plan_chunk(m: int) -> int:
    """Largest usable chunk length <= _LEVEL_CHUNK dividing m (0 if
    none).  Module constant so interpret-mode CI can shrink the Pallas
    kernel grids (see _partitioned_fused_local)."""
    s = min(_LEVEL_CHUNK, m // 2)
    while s > 1 and m % s:
        s -= 1
    return s if s >= 2 else 0


def _eliminate_levels(R, O, yt, axis: str, jitter: float, collect: str,
                      backend: str = "xla"):
    """Run elimination levels shard-local, collecting per-level
    back-substitution state.  Returns (levels, R, O, yt, ld_local):
    levels is a list of dicts with the chunk-major inputs' metadata, the
    sweep state, W1, and the collected stacks for the upward walk.

    ``backend="pallas"`` runs large levels' forward sweeps as the fused
    collect kernel (hat factors + the per-row lq lane streamed to HBM;
    multi-chip pods -- the same kernel/XLA split as
    `_partitioned_fused_local`).  Those levels' hat stacks stay padded
    to the kernel tile; the upward walks dispatch their
    back-substitution to the Pallas kernel too (lv["pallas"])."""
    d = R.shape[0]
    psize = jax.lax.axis_size(axis)
    shifts = _halo_shifts(axis)
    ld = jnp.zeros((), R.dtype)
    levels = []
    while psize * R.shape[-1] > max(256, 4 * psize):
        m = R.shape[-1]
        s = _plan_chunk(m)
        if not s:
            break
        c_loc = m // s
        R_cm = jnp.transpose(R.reshape(d, d, c_loc, s), (3, 0, 1, 2))
        O_cm = jnp.transpose(O.reshape(d, d, c_loc, s), (3, 0, 1, 2))
        y_cm = jnp.transpose(yt.reshape(d, c_loc, s), (2, 0, 1))
        use_pallas = (backend == "pallas" and s >= 3 and c_loc >= 64
                      and collect in ("solve", "solve_ldrows", "inverse",
                                      "solve_inverse"))
        if use_pallas and collect == "solve_inverse":
            from cyclic_gps_tpu.ops.pallas_sweep import (
                forward_sweep_solveinv_pallas,
            )

            (acc00, accy0, w0l, wl, dl, invdl, mh_k, ld_k, hc_s, hw0_s,
             hw_s, pinv_s, _) = forward_sweep_solveinv_pallas(
                R_cm, O_cm, y_cm, jitter=jitter)
            state = pt._SweepState(None, w0l, wl, dl, invdl, acc00,
                                   accy0, mh_k, ld_k)
            w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
            stacked = (hc_s, hw0_s, hw_s, pinv_s)  # kernel-tile padded
        elif use_pallas and collect == "inverse":
            from cyclic_gps_tpu.ops.pallas_sweep import (
                forward_sweep_inverse_pallas,
            )

            (acc00, w0l, dl, invdl, ds, invds, cs_,
             w0s) = forward_sweep_inverse_pallas(R_cm, O_cm,
                                                 jitter=jitter)
            # no RHS on this path: w = 0, accy0 = 0 (and ld unused)
            zv = jnp.zeros((d, c_loc), R_cm.dtype)
            zs = jnp.zeros((), R_cm.dtype)
            state = pt._SweepState(None, w0l, zv, dl, invdl, acc00,
                                   zv, zs, zs)
            w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
            stacked = (ds, invds, cs_, w0s)  # kernel-tile padded
        elif use_pallas:
            from cyclic_gps_tpu.ops.pallas_sweep import (
                forward_sweep_collect_pallas,
            )

            (acc00, accy0, w0l, wl, dl, invdl, mh_k, ld_k, hat_cs,
             hat_w0s, hat_ws, ld_int) = forward_sweep_collect_pallas(
                R_cm, O_cm, y_cm, jitter=jitter)
            state = pt._SweepState(None, w0l, wl, dl, invdl, acc00,
                                   accy0, mh_k, ld_k)
            w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
            stacked = (hat_cs, hat_w0s, hat_ws)
            if collect == "solve_ldrows":
                stacked = stacked + (ld_int,)
        else:
            state, w1, stacked = pt._forward_sweep(R_cm, O_cm, y_cm,
                                                   jitter, collect=collect)
        levels.append(dict(s=s, c_loc=c_loc, state=state, w1=w1,
                           stacked=stacked, pallas=use_pallas))
        s11 = sb.matmul(w1, w1, ta=True)
        R = R_cm[0] - state.acc00 - shifts.shift_down(s11)
        O = -sb.matmul(w1, state.w0, ta=True)
        yt = y_cm[0] - state.accy0 - shifts.shift_down(
            sb.matvec(w1, state.w, ta=True)
        )
        ld = ld + 2.0 * state.ld
    return levels, R, O, yt, ld


def _level_back_substitute(lv, xb, xb_next):
    """One level's chunk-interior back-substitution on its collected hat
    factors; returns interior rows [s-1, d, c_loc] (steps j = 1..s-1).
    Pallas levels (padded stacks) run the descending-grid kernel."""
    s, c_loc = lv["s"], lv["c_loc"]
    state, w1 = lv["state"], lv["w1"]
    hat_cs, hat_w0s, hat_ws = lv["stacked"][:3]
    hat_w1 = sb.solve_lower_t(state.dj, state.invd, w1)
    if lv.get("pallas"):
        from cyclic_gps_tpu.ops.pallas_sweep import (
            backward_substitute_pallas,
        )

        cpad = hat_cs.shape[-1]

        def padc(a):
            if cpad == a.shape[-1]:
                return a
            return jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (cpad - a.shape[-1],),
                              dtype=a.dtype)], axis=-1,
            )

        return backward_substitute_pallas(
            hat_cs, hat_w0s, hat_ws, padc(hat_w1), padc(xb),
            padc(xb_next),
        )[:, :, :c_loc]
    hat_w0_l = sb.solve_lower_t(state.dj, state.invd, state.w0)
    hat_w_l = sb.solve_lower_t_vec(state.dj, state.invd, state.w)
    x_last = (hat_w_l - sb.matvec(hat_w0_l, xb)
              - sb.matvec(hat_w1, xb_next))
    if s > 2:
        def back(x_next, inp):
            hc, hw0, hw = inp
            x_j = hw - sb.matvec(hw0, xb) - sb.matvec(hc, x_next)
            return x_j, x_j

        inps = jax.tree.map(lambda a: a[:-1], (hat_cs, hat_w0s, hat_ws))
        _, xs_rev = jax.lax.scan(back, x_last, inps, reverse=True)
        return jnp.concatenate([xs_rev, x_last[None]], axis=0)
    return x_last[None]


def _local_slice_nat(x_nat, m_loc, axis: str):
    """Slice this shard's rows out of a replicated natural-order array."""
    idx = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(x_nat, idx * m_loc, m_loc, axis=0)


def _solve_local(R, O, yt, axis: str, jitter: float,
                 backend: str = "xla"):
    """Shard-local (J^{-1} y, log|J|): elimination levels down, replicated
    terminal solve, back-substitution levels up (boundary values cross
    shard edges via shift_up halos).  Returns (x [d, m] element-major
    local, replicated logdet).  ``backend="pallas"``: large levels run
    both passes as the Pallas kernels (multi-chip pods)."""
    shifts = _halo_shifts(axis)
    levels, R, O, yt, ld = _eliminate_levels(R, O, yt, axis, jitter,
                                             collect="solve",
                                             backend=backend)
    m_rem = R.shape[-1]
    Rg = jax.lax.all_gather(R, axis, axis=2, tiled=True)
    Og = jax.lax.all_gather(O, axis, axis=2, tiled=True)
    yg = jax.lax.all_gather(yt, axis, axis=1, tiled=True)
    nrem = Rg.shape[-1]
    x_top, red_ld = pt._solve_impl(
        sb.from_em(Rg), sb.from_em(Og)[: nrem - 1], sb.vec_from_em(yg),
        None, jitter,
    )  # replicated [nrem, d]
    ld = jax.lax.psum(ld, axis) + red_ld
    x = sb.vec_to_em(_local_slice_nat(x_top, m_rem, axis))  # [d, m_rem]

    for lv in reversed(levels):
        xb = x  # [d, c_loc] boundary solutions of this level's chunks
        xb_next = shifts.shift_up(xb)  # next chunk boundary (halo right)
        interior = _level_back_substitute(lv, xb, xb_next)
        x_cm = jnp.concatenate([xb[None], interior], axis=0)  # [s, d, c]
        # natural local order: index i = c*s + j -> [d, c_loc*s]
        x = jnp.transpose(x_cm, (1, 2, 0)).reshape(x_cm.shape[1], -1)
    return x, ld


def _solve_ldr_local(R, O, yt, axis: str, jitter: float,
                     backend: str = "xla"):
    """Shard-local FUSED (J^{-1} y, per-row pivot log-dets): ONE
    elimination walk down (collect="solve_ldrows" stores the hat factors
    AND each step's per-row log-dets) + one walk up -- where separate
    `_solve_local` + per-row-logdet walks pay two of each.  Returns
    (x [d, m] element-major local, rows [m] natural local order); the
    multi-chip twin of `pt._solve_ldr_from_cm`.  ``backend="pallas"``:
    large levels run the collect sweep (hat factors + lq lane) and the
    back-substitution as the Pallas kernels."""
    shifts = _halo_shifts(axis)
    levels, R, O, yt, _ = _eliminate_levels(R, O, yt, axis, jitter,
                                            collect="solve_ldrows",
                                            backend=backend)
    m_rem = R.shape[-1]
    Rg = jax.lax.all_gather(R, axis, axis=2, tiled=True)
    Og = jax.lax.all_gather(O, axis, axis=2, tiled=True)
    yg = jax.lax.all_gather(yt, axis, axis=1, tiled=True)
    nrem = Rg.shape[-1]
    x_top, rows_top = pt._solve_ldr_impl(
        sb.from_em(Rg), sb.from_em(Og)[: nrem - 1], sb.vec_from_em(yg),
        None, jitter,
    )  # replicated [nrem, d], [nrem]
    x = sb.vec_to_em(_local_slice_nat(x_top, m_rem, axis))  # [d, m_rem]
    rows = _local_slice_nat(rows_top, m_rem, axis)  # [m_rem]

    for lv in reversed(levels):
        ld_int = lv["stacked"][3]  # [s-1, c_loc] per-step pivot rows
        xb = x  # [d, c_loc] boundary solutions of this level's chunks
        xb_next = shifts.shift_up(xb)  # next chunk boundary (halo right)
        interior = _level_back_substitute(lv, xb, xb_next)
        x_cm = jnp.concatenate([xb[None], interior], axis=0)  # [s, d, c]
        x = jnp.transpose(x_cm, (1, 2, 0)).reshape(x_cm.shape[1], -1)
        # interleave this level's per-step rows around the boundary rows
        # (reduced row c IS natural row c*s -- the level invariant)
        rows_cm = jnp.concatenate([rows[None], ld_int], axis=0)  # [s, c]
        rows = jnp.transpose(rows_cm, (1, 0)).reshape(-1)
    return x, rows


def _inverse_local(R, O, axis: str, jitter: float,
                   backend: str = "xla"):
    """Shard-local selected inversion: (diag [d, d, m], off [d, d, m]
    element-major local; off[..., i] = Sigma_{i+1, i} with the trailing
    entry crossing the shard edge, zero at the global end).
    ``backend="pallas"``: large levels run the raw-factor collect sweep
    and the Takahashi recursion as the Pallas kernels."""
    d = R.shape[0]
    shifts = _halo_shifts(axis)
    yt = jnp.zeros((d, R.shape[-1]), dtype=R.dtype)
    levels, R, O, yt, _ = _eliminate_levels(R, O, yt, axis, jitter,
                                            collect="inverse",
                                            backend=backend)
    m_rem = R.shape[-1]
    Rg = jax.lax.all_gather(R, axis, axis=2, tiled=True)
    Og = jax.lax.all_gather(O, axis, axis=2, tiled=True)
    nrem = Rg.shape[-1]
    bb_diag, bb_off = pt._inverse_impl(
        sb.from_em(Rg), sb.from_em(Og)[: nrem - 1], None, jitter
    )  # replicated [nrem, d, d], [nrem-1, d, d]
    bb_off = jnp.concatenate(
        [bb_off, jnp.zeros((1, d, d), dtype=bb_off.dtype)], axis=0
    )
    diag_loc = sb.to_em(_local_slice_nat(bb_diag, m_rem, axis))
    off_loc = sb.to_em(_local_slice_nat(bb_off, m_rem, axis))

    for lv in reversed(levels):
        s, c_loc = lv["s"], lv["c_loc"]
        state, w1 = lv["state"], lv["w1"]
        ds, invds, cs_, w0s = lv["stacked"]
        p00 = diag_loc              # Sigma_{b_c, b_c}        [d, d, c]
        p10 = off_loc               # Sigma_{b_{c+1}, b_c}
        p11 = shifts.shift_up(p00)  # next boundary diag (halo right)
        p01 = sb.transpose(p10)

        def sigma_bb_ut(u0, u1):
            a0 = sb.matmul(p00, u0, tb=True) + sb.matmul(p01, u1, tb=True)
            a1 = sb.matmul(p10, u0, tb=True) + sb.matmul(p11, u1, tb=True)
            return a0, a1

        d_last, invd_last, w0_last = state.dj, state.invd, state.w0
        di_last = sb.tri_lower_inverse(d_last, invd_last)
        phi = sb.matmul(di_last, di_last, ta=True)
        u0 = sb.solve_lower_t(d_last, invd_last, w0_last)
        u1 = sb.solve_lower_t(d_last, invd_last, w1)
        a0, a1 = sigma_bb_ut(u0, u1)
        diag_last = phi + sb.matmul(u0, a0) + sb.matmul(u1, a1)
        off_edge_right = -(
            sb.matmul(p10, u0, tb=True) + sb.matmul(p11, u1, tb=True)
        )

        if lv.get("pallas"):
            # stacks are kernel-tile padded; pad the chunk-level inputs
            # to match, run the Takahashi kernel, slice back (the
            # single-chip pt._inverse_from_cm_pallas assembly)
            from cyclic_gps_tpu.ops.pallas_sweep import (
                takahashi_backward_pallas,
            )

            cpad = ds.shape[-1]

            def pad_eye(a):
                if cpad == c_loc:
                    return a
                eye = jnp.broadcast_to(
                    jnp.eye(d, dtype=a.dtype)[:, :, None],
                    (d, d, cpad - c_loc),
                )
                return jnp.concatenate([a, eye], axis=-1)

            def pad_zero(a):
                if cpad == c_loc:
                    return a
                return jnp.concatenate(
                    [a, jnp.zeros((d, d, cpad - c_loc), dtype=a.dtype)],
                    axis=-1,
                )

            diag_mid_p, off_mid_p, u0f, u1f = takahashi_backward_pallas(
                ds, invds, cs_, w0s,
                pad_eye(p00), pad_zero(p01), pad_zero(p10), pad_eye(p11),
                pad_eye(phi), pad_zero(u0), pad_zero(u1),
                pad_zero(a0), pad_zero(a1),
            )
            diag_int = jnp.concatenate(
                [diag_mid_p[:, :, :, :c_loc], diag_last[None]], axis=0
            )
            off_int = off_mid_p[:, :, :, :c_loc]
            u0, u1 = u0f[:, :, :c_loc], u1f[:, :, :c_loc]
        else:
            def back(carry, inp):
                phi_n, u0_n, u1_n, a0_n, a1_n = carry
                d_j, invd_j, c_j, w0_j = inp
                di = sb.tri_lower_inverse(d_j, invd_j)
                cd = sb.matmul(c_j, di)
                phi_off = -sb.matmul(phi_n, cd)
                phi_j = sb.matmul(di, di, ta=True) + sb.matmul(
                    sb.matmul(cd, phi_n, ta=True), cd
                )
                u0_j = sb.solve_lower_t(
                    d_j, invd_j, w0_j - sb.matmul(c_j, u0_n, ta=True)
                )
                u1_j = -sb.solve_lower_t(
                    d_j, invd_j, sb.matmul(c_j, u1_n, ta=True)
                )
                a0_j, a1_j = sigma_bb_ut(u0_j, u1_j)
                diag_j = (phi_j + sb.matmul(u0_j, a0_j)
                          + sb.matmul(u1_j, a1_j))
                off_j = (phi_off + sb.matmul(u0_n, a0_j)
                         + sb.matmul(u1_n, a1_j))
                return (phi_j, u0_j, u1_j, a0_j, a1_j), (diag_j, off_j)

            if s > 2:
                inps = jax.tree.map(lambda a: a[:-1],
                                    (ds, invds, cs_, w0s))
                (phi, u0, u1, a0, a1), (diag_mid, off_mid) = jax.lax.scan(
                    back, (phi, u0, u1, a0, a1), inps, reverse=True
                )
                diag_int = jnp.concatenate(
                    [diag_mid, diag_last[None]], axis=0
                )
                off_int = off_mid
            else:
                diag_int = diag_last[None]
                off_int = jnp.zeros((0, d, d, c_loc), dtype=R.dtype)

        off_edge_left = -(sb.matmul(u0, p00) + sb.matmul(u1, p10))
        diag_cm = jnp.concatenate([p00[None], diag_int], axis=0)
        off_cm = jnp.concatenate(
            [off_edge_left[None], off_int, off_edge_right[None]], axis=0
        )
        diag_loc = jnp.transpose(diag_cm, (1, 2, 3, 0)).reshape(d, d, -1)
        off_loc = jnp.transpose(off_cm, (1, 2, 3, 0)).reshape(d, d, -1)
    return diag_loc, off_loc


def _solve_inverse_local(R, O, yt, axis: str, jitter: float,
                         backend: str = "xla"):
    """Shard-local FUSED (J^{-1} y, selected inverse): ONE elimination
    ladder down (collect="solve_inverse") + walks up sharing each
    level's hat stacks -- the sharded analytic VJPs' backward
    (`_mahal_parts_bwd` / `_rows_parts_bwd`), where round 4 ran two
    separate ladders (`_solve_local` + `_inverse_local`, each its own
    full elimination).  Returns (x [d, m] element-major local,
    sig_diag [d, d, m], sig_off [d, d, m] local; off[..., i] =
    Sigma_{i+1, i} with the trailing entry crossing the shard edge,
    zero at the global end).  ``backend="pallas"``: large levels run
    the solve+inverse collect sweep and the fused descending
    back-substitution + hat-Takahashi kernel."""
    d = R.shape[0]
    shifts = _halo_shifts(axis)
    levels, R, O, yt, _ = _eliminate_levels(R, O, yt, axis, jitter,
                                            collect="solve_inverse",
                                            backend=backend)
    m_rem = R.shape[-1]
    Rg = jax.lax.all_gather(R, axis, axis=2, tiled=True)
    Og = jax.lax.all_gather(O, axis, axis=2, tiled=True)
    yg = jax.lax.all_gather(yt, axis, axis=1, tiled=True)
    xg, sdg, sog = pt._solve_inverse_em(Rg, Og, yg, jitter)  # replicated
    idx = jax.lax.axis_index(axis)

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, idx * m_rem, m_rem,
                                            axis=-1)

    x = sl(xg)  # [d, m_rem]
    diag_loc = sl(sdg)
    off_loc = sl(sog)

    for lv in reversed(levels):
        c_loc = lv["c_loc"]
        state, w1 = lv["state"], lv["w1"]
        hc_s, hw0_s, hw_s, pinv_s = lv["stacked"][:4]
        xb = x  # [d, c_loc] boundary solutions of this level's chunks
        xb_next = shifts.shift_up(xb)
        p00 = diag_loc  # Sigma_{b_c, b_c}
        p10 = off_loc  # Sigma_{b_{c+1}, b_c}
        p11 = shifts.shift_up(p00)  # next boundary diag (halo right)
        p01 = sb.transpose(p10)
        hat_w1 = sb.solve_lower_t(state.dj, state.invd, w1)
        if lv.get("pallas"):
            from cyclic_gps_tpu.ops.pallas_sweep import (
                backward_solve_takahashi_pallas,
            )

            cpad = hc_s.shape[-1]

            def padz(a):
                if cpad == c_loc:
                    return a
                return jnp.concatenate(
                    [a, jnp.zeros(a.shape[:-1] + (cpad - c_loc,),
                                  dtype=a.dtype)], axis=-1,
                )

            def pade(a):
                if cpad == c_loc:
                    return a
                eye = jnp.broadcast_to(
                    jnp.eye(d, dtype=a.dtype)[:, :, None],
                    (d, d, cpad - c_loc),
                )
                return jnp.concatenate([a, eye], axis=-1)

            (x_rows, diag_rows, off_rows,
             u0f, u1f) = backward_solve_takahashi_pallas(
                hc_s, hw0_s, hw_s, pinv_s,
                padz(hat_w1), padz(xb), padz(xb_next),
                pade(p00), padz(p01), padz(p10), pade(p11),
            )
            interior = x_rows[:, :, :c_loc]
            diag_int = diag_rows[:, :, :, :c_loc]
            off_rows = off_rows[:, :, :, :c_loc]
            u0f, u1f = u0f[:, :, :c_loc], u1f[:, :, :c_loc]
        else:
            interior = _level_back_substitute(lv, xb, xb_next)
            diag_int, off_rows, u0f, u1f = pt._takahashi_hat_walk(
                hc_s, hw0_s, pinv_s, hat_w1, p00, p01, p10, p11
            )
        x_cm = jnp.concatenate([xb[None], interior], axis=0)
        x = jnp.transpose(x_cm, (1, 2, 0)).reshape(d, -1)
        off_edge_left = -(sb.matmul(u0f, p00) + sb.matmul(u1f, p10))
        diag_cm = jnp.concatenate([p00[None], diag_int], axis=0)
        off_cm = jnp.concatenate([off_edge_left[None], off_rows], axis=0)
        diag_loc = jnp.transpose(diag_cm, (1, 2, 3, 0)).reshape(d, d, -1)
        off_loc = jnp.transpose(off_cm, (1, 2, 3, 0)).reshape(d, d, -1)
    return x, diag_loc, off_loc


def solve(
    diag: Array, off: Array, y: Array, mesh: Mesh, axis: str = "seq",
    jitter: float = 0.0, backend: str = "xla",
) -> Tuple[Array, Array]:
    """Sequence-sharded (J^{-1} y, log|J|): the multi-chip counterpart of
    `pt.solve_and_logdet` (exact match, tests/test_parallel.py).  diag
    [N, d, d], off [N-1, d, d], y [N, d]; N divisible by the mesh size.
    ``backend="pallas"``: each shard's large levels run both passes as
    the Pallas kernels (multi-chip pods)."""
    n, d, _ = diag.shape
    _check_shard(n, mesh, axis)
    R = sb.to_em(diag)
    O = jnp.concatenate(
        [sb.to_em(off), jnp.zeros((d, d, 1), dtype=diag.dtype)], axis=-1
    )
    yt = sb.vec_to_em(y)

    fn = _cached_shard_fn(_build_solve_fn, mesh, axis, jitter, backend)
    return fn(R, O, yt)


def _build_solve_fn(mesh, axis, jitter, backend="xla"):
    def local(R, O, yt):
        x, ld = _solve_local(R, O, yt, axis, jitter, backend)
        return sb.vec_from_em(x), ld

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, None, axis), P(None, None, axis), P(None, axis)),
            out_specs=(P(axis), P()),
            check_vma=False,
        )
    )


def inverse_blocks(
    diag: Array, off: Array, mesh: Mesh, axis: str = "seq",
    jitter: float = 0.0, backend: str = "xla",
) -> Tuple[Array, Array]:
    """Sequence-sharded selected inversion: (Sigma_ii [N, d, d],
    Sigma_{i+1,i} [N-1, d, d]) of the block-tridiagonal J^{-1} -- the
    multi-chip `pt.inverse_blocks`.  ``backend="pallas"``: large levels
    run the raw-factor sweep + Takahashi recursion as the Pallas
    kernels."""
    n, d, _ = diag.shape
    _check_shard(n, mesh, axis)
    R = sb.to_em(diag)
    O = jnp.concatenate(
        [sb.to_em(off), jnp.zeros((d, d, 1), dtype=diag.dtype)], axis=-1
    )

    fn = _cached_shard_fn(_build_inverse_fn, mesh, axis, jitter, backend)
    dg, of = fn(R, O)
    return dg, of[: n - 1]


def _build_inverse_fn(mesh, axis, jitter, backend="xla"):
    def local(R, O):
        dg, of = _inverse_local(R, O, axis, jitter, backend)
        return sb.from_em(dg), sb.from_em(of)

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, None, axis), P(None, None, axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )


def _check_shard(n: int, mesh: Mesh, axis: str) -> None:
    psize = mesh.shape[axis]
    if n & (n - 1):
        raise ValueError("sequence sharding requires power-of-two N")
    if n % psize:
        raise ValueError("N must divide the mesh axis size")


# ---------------------------------------------------------------------------
# Analytic VJP for the sharded fused (mahal, logdet): backward = one
# sharded solve + one sharded selected inversion (O(1) stored state) --
# the multi-chip twin of ops/partitioned._mahal_cm_bwd.  Without this,
# autodiff differentiates through every level's lax.scan and stores each
# step's factorization.
#
# The custom_vjp boundary sits at the PER-SHARD PARTIAL contributions
# (parts=True), not the psummed totals: shard_map's transpose under
# check_vma=False delivers a replicated output's cotangent to an opaque
# custom_vjp divided by the axis size (measured; plain autodiff through
# the same psum is correct).  Keeping the psum OUTSIDE the custom rule
# makes the incoming cotangents the true (replicated) d loss / d total,
# for which the analytic local-gradient formula is exact.  Consequence:
# `_mahal_parts_diff`'s outputs are only valid consumed through a psum.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mahal_parts_diff(R, O, yt, axis, jitter, backend="xla"):
    return _partitioned_fused_local(R, O, yt, axis, jitter, parts=True,
                                    backend=backend)


def _mahal_parts_fwd(R, O, yt, axis, jitter, backend="xla"):
    return _mahal_parts_diff(R, O, yt, axis, jitter, backend), (R, O, yt)


def _mahal_parts_bwd(axis, jitter, backend, res, cots):
    R, O, yt = res
    gm, gl = cots  # replicated: true cotangents of the psummed totals
    shifts = _halo_shifts(axis)
    # ONE fused elimination ladder serves both backward halves (solve +
    # selected inversion) -- round 4 ran two separate ladders here.
    x, sig_diag, sig_off = _solve_inverse_local(R, O, yt, axis, jitter,
                                                backend)
    x_next = shifts.shift_up(x[:, None, :])[:, 0, :]     # x_{i+1} (halo)
    xo = x[:, None, :] * x[None, :, :]
    xo_off = x_next[:, None, :] * x[None, :, :]
    g_R = gl * sig_diag - gm * xo
    g_O = 2.0 * (gl * sig_off - gm * xo_off)
    g_y = 2.0 * gm * x
    return g_R, g_O, g_y


_mahal_parts_diff.defvjp(_mahal_parts_fwd, _mahal_parts_bwd)


def _mahal_local_diff(R, O, yt, axis, jitter, backend="xla"):
    """Shard-local fused (mahal, logdet), replicated outputs, with the
    ANALYTIC backward (one sharded solve + one sharded selected
    inversion)."""
    mh, ld = _mahal_parts_diff(R, O, yt, axis, jitter, backend)
    return jax.lax.psum(mh, axis), jax.lax.psum(ld, axis)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _rows_parts_diff(R, O, yt, axis, jitter, backend="xla"):
    """Shard-local PER-ROW (mahal, logdet) decompositions
    (mh_rows [m] = y_i . x_i with x = J^{-1} y; ld_rows [m] = pivot
    log-dets): the per-row twin of `_mahal_parts_diff`.

    Gradient validity: the analytic backward applies `_mahal_parts_bwd`'s
    formula with per-row weights, which is the true adjoint ONLY when
    (a) J is block-diagonal over contiguous row segments and (b) the
    incoming per-row cotangents are constant within each segment --
    i.e. the rows are consumed through segment sums + psum (the stacked
    per-series likelihood).  Off-block cotangents at segment boundaries
    are weight-ambiguous but annihilated upstream by the gap mask."""
    x, ld_rows = _solve_ldr_local(R, O, yt, axis, jitter,
                                  backend)  # fused: ONE walk down + up
    return jnp.sum(yt * x, axis=0), ld_rows


def _rows_parts_fwd(R, O, yt, axis, jitter, backend="xla"):
    return _rows_parts_diff(R, O, yt, axis, jitter, backend), (R, O, yt)


def _rows_parts_bwd(axis, jitter, backend, res, cots):
    R, O, yt = res
    wm, wl = cots  # per-row weights (segment-constant by contract)
    shifts = _halo_shifts(axis)
    # validity-domain guard (pt._rows_cotangent_guard's sharded twin):
    # a per-row cotangent that differs across a NONZERO coupling is
    # outside the segment-constant contract -- NaN-poison the local
    # gradient (params grads are psummed upstream, so the NaN is loud)
    # instead of returning silently wrong values.  The halo shift_up
    # fills the global last slot with 0, where `coupled` is also 0.
    coupled = jnp.sum(jnp.abs(O), axis=(0, 1)) > 0
    bad = (jnp.any(coupled & (wm != shifts.shift_up(wm[None, :])[0]))
           | jnp.any(coupled & (wl != shifts.shift_up(wl[None, :])[0])))
    poison = jnp.where(bad, jnp.nan, 0.0).astype(wl.dtype)
    wm = wm + poison
    wl = wl + poison
    x, sig_diag, sig_off = _solve_inverse_local(R, O, yt, axis, jitter,
                                                backend)
    x_next = shifts.shift_up(x[:, None, :])[:, 0, :]     # x_{i+1} (halo)
    xo = x[:, None, :] * x[None, :, :]
    xo_off = x_next[:, None, :] * x[None, :, :]
    g_R = wl[None, None, :] * sig_diag - wm[None, None, :] * xo
    g_O = 2.0 * (wl[None, None, :] * sig_off
                 - wm[None, None, :] * xo_off)
    g_y = 2.0 * wm[None, :] * x
    return g_R, g_O, g_y


_rows_parts_diff.defvjp(_rows_parts_fwd, _rows_parts_bwd)


# ---------------------------------------------------------------------------
# Sequence-sharded LEG log-likelihood (single series sharded along time).
# ---------------------------------------------------------------------------


def _peg_precision_local(g: Array, ts_loc: Array, axis: str,
                         gap_mask_loc: Optional[Array] = None):
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
    The per-gap log|Q1| rows ([m], valid-masked) ride along for the
    per-series decomposition (`log_likelihood_per_series`).

    ``gap_mask_loc`` (optional [m], the local slice of a natural gap
    mask): extra invalid gaps -- the sharded stacked multi-series entry
    masks series-boundary gaps here, making K exactly block-diagonal
    over the series (see leg._chunk_gap_geometry).  Masked gaps' diffs
    are clamped to 1 so hostile boundary gaps (timestamps restarting)
    cannot overflow the exponential.
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
    if gap_mask_loc is not None:
        gap_valid = gap_valid * gap_mask_loc.astype(g.dtype)
    diffs = diffs * gap_valid + (1.0 - gap_valid)

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
    lq_rows = 2.0 * jnp.sum(ldiag, axis=1) * gap_valid  # per-gap log|Q1|
    return diag_em, off_em, -jnp.sum(lq_rows), lq_rows


def _posterior_system_local(params, ts_loc, xs_loc, axis: str,
                            gap_mask_loc: Optional[Array] = None):
    """Shard-local posterior-precision system: (k_diag_em, k_off_em,
    v_em) plus the scalars (llt_mahal, llt_logdet, sig_logdet) the
    likelihood assembly needs.  ``gap_mask_loc``: see
    `_peg_precision_local` (stacked multi-series)."""
    llt = leg.lambda_lambda_t(params)
    g = leg.g_matrix(params)
    num_obs = jax.lax.psum(ts_loc.shape[0], axis)

    x_llt_inv = jnp.linalg.solve(llt, xs_loc.T).T
    llt_mahal = jax.lax.psum(jnp.sum(x_llt_inv * xs_loc), axis)
    llt_logdet = num_obs * jnp.linalg.slogdet(2.0 * jnp.pi * llt)[1]
    v = x_llt_inv @ params.b

    sig_diag_em, sig_off_em, sig_ld_loc, _ = _peg_precision_local(
        g, ts_loc, axis, gap_mask_loc
    )
    # closed-form log|Sigma^{-1}| (no second elimination pass)
    sig_logdet = jax.lax.psum(sig_ld_loc, axis)

    bt_llt_inv_b = params.b.T @ jnp.linalg.solve(llt, params.b)
    k_diag_em = sig_diag_em + bt_llt_inv_b[:, :, None]
    return (k_diag_em, sig_off_em, sb.vec_to_em(v),
            llt_mahal, llt_logdet, sig_logdet)


def _log_likelihood_local(params, ts_loc, xs_loc, axis: str,
                          backend: str = "xla", gap_mask_loc=None):
    (k_diag_em, k_off_em, v_em,
     llt_mahal, llt_logdet, sig_logdet) = _posterior_system_local(
        params, ts_loc, xs_loc, axis, gap_mask_loc
    )
    # analytic custom VJP: the backward is one sharded solve + one
    # sharded selected inversion (O(1) residuals) instead of autodiff
    # through every level's scan
    k_mahal, k_logdet = _mahal_local_diff(
        k_diag_em, k_off_em, v_em, axis, 0.0, backend
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
    backend: str = "xla",
) -> Array:
    """Sequence-sharded LEG marginal log-likelihood (exact).

    N must be a power of two divisible by the mesh axis size.
    Differentiable with the ANALYTIC backward (one sharded solve + one
    sharded selected inversion, O(1) stored state) -- gradients match the
    single-device likelihood (tests/test_parallel.py).

    ``backend="pallas"`` runs each shard's large first elimination level
    as the fused Pallas kernel (multi-chip TPU pods; the backward's
    sharded solve/inversion stay on the XLA scans).
    """
    n = ts.shape[0]
    _check_shard(n, mesh, axis)
    fn = _cached_shard_fn(_build_loglik_fn, mesh, axis, backend)
    return fn(params, ts, xs)


def _build_loglik_fn(mesh, axis, backend="xla"):
    return jax.jit(
        jax.shard_map(
            partial(_log_likelihood_local, axis=axis, backend=backend),
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis, None)),
            out_specs=P(),
            check_vma=False,
        )
    )


def log_likelihood_stacked(
    params: leg.LEGParams,
    ts: Array,
    xs: Array,
    series_ids: Array,
    mesh: Mesh,
    axis: str = "seq",
    backend: str = "xla",
) -> Array:
    """Sequence-sharded STACKED multi-series likelihood: B independent
    series concatenated into one [N_total] array (sorted ``series_ids``
    per point), sharded along time over the mesh axis and solved as ONE
    block-diagonal system (series-boundary gaps masked exactly — the
    multi-chip `leg.log_likelihood_stacked`).  Series may straddle shard
    edges arbitrarily; N_total must satisfy the usual power-of-two /
    divisibility constraint.  Differentiable with the same analytic
    backward as `log_likelihood`."""
    _check_shard(ts.shape[0], mesh, axis)
    mask = leg._series_gap_mask(series_ids).astype(ts.dtype)
    fn = _cached_shard_fn(_build_loglik_stacked_fn, mesh, axis, backend)
    return fn(params, ts, xs, mask)


def _build_loglik_stacked_fn(mesh, axis, backend="xla"):
    def local(params, ts_loc, xs_loc, mask_loc):
        return _log_likelihood_local(params, ts_loc, xs_loc, axis,
                                     backend, mask_loc)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis, None), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    )


def log_likelihood_per_series(
    params: leg.LEGParams,
    ts: Array,
    xs: Array,
    series_ids: Array,
    num_series: int,
    mesh: Mesh,
    axis: str = "seq",
    backend: str = "xla",
) -> Array:
    """Sequence-sharded PER-SERIES likelihood vector [num_series]: the
    multi-chip `leg.log_likelihood_per_series`.  Every term decomposes
    into shard-local per-row partials (per-point LLT terms, per-gap
    log|Q1| rows, per-row pivot log-dets via `_solve_ldr_local`, v_i . x_i
    through the sharded solve), segment-summed locally and psummed.
    Differentiable with the analytic per-row adjoint
    (`_rows_parts_diff`: one sharded solve + one sharded selected
    inversion)."""
    _check_shard(ts.shape[0], mesh, axis)
    mask = leg._series_gap_mask(series_ids).astype(ts.dtype)
    fn = _cached_shard_fn(_build_perseries_fn, mesh, axis, num_series,
                          backend)
    return fn(params, ts, xs, series_ids.astype(jnp.int32), mask)


def _per_series_local(params, ts_loc, xs_loc, ids_loc, mask_loc,
                      axis: str, num_series: int, backend: str = "xla"):
    """Shard-local per-series likelihood partials [num_series]
    (psum outside -- the custom-VJP boundary contract of
    `_rows_parts_diff` / `_mahal_parts_diff`)."""
    llt = leg.lambda_lambda_t(params)
    g = leg.g_matrix(params)

    def seg(rows):
        return jax.ops.segment_sum(rows, ids_loc,
                                   num_segments=num_series)

    x_llt_inv = jnp.linalg.solve(llt, xs_loc.T).T
    llt_mahal_b = seg(jnp.sum(x_llt_inv * xs_loc, axis=1))
    llt_logdet_b = seg(jnp.ones_like(ts_loc)) * jnp.linalg.slogdet(
        2.0 * jnp.pi * llt
    )[1]
    v = x_llt_inv @ params.b

    sig_diag_em, sig_off_em, _, lq_rows = _peg_precision_local(
        g, ts_loc, axis, mask_loc
    )
    sig_logdet_b = -seg(lq_rows)

    bt_llt_inv_b = params.b.T @ jnp.linalg.solve(llt, params.b)
    k_diag_em = sig_diag_em + bt_llt_inv_b[:, :, None]
    mh_rows, ld_rows = _rows_parts_diff(
        k_diag_em, sig_off_em, sb.vec_to_em(v), axis, 0.0, backend
    )
    mahal_b = llt_mahal_b - seg(mh_rows)
    logdet_b = llt_logdet_b + seg(ld_rows) - sig_logdet_b
    return -0.5 * (mahal_b + logdet_b)


def _build_perseries_fn(mesh, axis, num_series, backend="xla"):
    def local(params, ts_loc, xs_loc, ids_loc, mask_loc):
        parts = _per_series_local(params, ts_loc, xs_loc, ids_loc,
                                  mask_loc, axis, num_series, backend)
        return jax.lax.psum(parts, axis)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis, None), P(axis), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    )


def posterior_mean(
    params: leg.LEGParams,
    ts: Array,
    xs: Array,
    mesh: Mesh,
    axis: str = "seq",
    series_ids: Optional[Array] = None,
) -> Array:
    """Sequence-sharded posterior mean of the latent z [N, rank]: the
    multi-chip `leg.posterior_mean` (precision route) -- posteriors no
    longer bounded by one chip's HBM.  ``series_ids`` (optional, sorted
    [N]): treat the rows as B stacked independent series
    (the multi-chip `leg.posterior_mean_stacked`)."""
    _check_shard(ts.shape[0], mesh, axis)
    if series_ids is None:
        fn = _cached_shard_fn(_build_posterior_mean_fn, mesh, axis)
        return fn(params, ts, xs)
    mask = leg._series_gap_mask(series_ids).astype(ts.dtype)
    fn = _cached_shard_fn(_build_posterior_mean_fn, mesh, axis, True)
    return fn(params, ts, xs, mask)


def _build_posterior_mean_fn(mesh, axis, masked=False):
    def local(params, ts_loc, xs_loc, *mask_loc):
        k_diag_em, k_off_em, v_em, _, _, _ = _posterior_system_local(
            params, ts_loc, xs_loc, axis,
            mask_loc[0] if masked else None,
        )
        x, _ = _solve_local(k_diag_em, k_off_em, v_em, axis, 0.0)
        return sb.vec_from_em(x)

    in_specs = (P(), P(axis), P(axis, None)) + (
        (P(axis),) if masked else ()
    )
    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=in_specs,
            out_specs=P(axis, None),
            check_vma=False,
        )
    )


def insample_posterior(
    params: leg.LEGParams,
    ts: Array,
    xs: Array,
    mesh: Mesh,
    axis: str = "seq",
    series_ids: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Sequence-sharded in-sample posterior: (mean [N, r], marginal
    covariances [N, r, r], lag-1 cross-covariances [N-1, r, r]) -- the
    multi-chip `leg.insample_posterior` (precision route: sharded solve +
    sharded Takahashi selected inversion).  ``series_ids`` (optional,
    sorted [N]): stacked independent series (the multi-chip
    `leg.insample_posterior_stacked`; cross-series off rows are exactly
    zero)."""
    n = ts.shape[0]
    _check_shard(n, mesh, axis)
    if series_ids is None:
        fn = _cached_shard_fn(_build_insample_fn, mesh, axis)
        mean, cov_diag, cov_off = fn(params, ts, xs)
    else:
        mask = leg._series_gap_mask(series_ids).astype(ts.dtype)
        fn = _cached_shard_fn(_build_insample_fn, mesh, axis, True)
        mean, cov_diag, cov_off = fn(params, ts, xs, mask)
    return mean, cov_diag, cov_off[: n - 1]


def _build_insample_fn(mesh, axis, masked=False):
    def local(params, ts_loc, xs_loc, *mask_loc):
        k_diag_em, k_off_em, v_em, _, _, _ = _posterior_system_local(
            params, ts_loc, xs_loc, axis,
            mask_loc[0] if masked else None,
        )
        x, cov_d, cov_o = _solve_inverse_local(k_diag_em, k_off_em,
                                               v_em, axis, 0.0)
        return sb.vec_from_em(x), sb.from_em(cov_d), sb.from_em(cov_o)

    in_specs = (P(), P(axis), P(axis, None)) + (
        (P(axis),) if masked else ()
    )
    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(axis, None), P(axis, None, None),
                       P(axis, None, None)),
            check_vma=False,
        )
    )
