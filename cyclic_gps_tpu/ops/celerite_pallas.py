"""Mega-fused celerite likelihood sweep: the O(N * nblocks) solve.

The celerite-structured LEG family (models/celerite.py; reference
sketch cyclic_gps/models.py:552-592) has a block-diagonal generator of
2x2 damped oscillators, so every PEG gap term (transition e, noise Q1,
the push-through precision ingredients) is CLOSED FORM per oscillator --
no Pade evaluation at all.  Round 3 landed that closed-form emission,
but the likelihood still paid the full-rank dense block-tridiagonal
solve: at rank 16 the (K, off) blocks are 2 r^2 N floats, and writing
them from the emission then reading them back in the elimination sweep
round-trips ~4 GB of HBM at N = 1e6 -- the measured 120 ms that tied
the expansion path (round-3 verdict weak #1).

This kernel is the celerite twin of `expm_pallas.gap_mahal_sweep_pallas`:
each (chunk-tile, step) cell CONSTRUCTS row j's precision blocks from
the gap widths in VMEM -- 2x2 scalar algebra stacked [nb, 1, nt] across
oscillators (sin / cos / exp lower fine in Mosaic; expm1 does NOT,
probed on device -- see _expm1k), assembled block-diagonally by
concatenation -- and immediately ELIMINATES them with the shared
elimination cell, so

  HBM traffic = read dt [N] + read v [r N] + chunk-boundary rows,

~70 MB at rank 16, N = 1e6 instead of ~4 GB.  The reduced boundary
system and the analytic/replay backward live in models/celerite.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cyclic_gps_tpu.ops.expm_pallas import (_fused_elim_cell,
                                            _fused_elim_flush)
from cyclic_gps_tpu.ops.pallas_sweep import (_chol, _mm, _solve_lower,
                                             _solve_lower_t, _swap)

Array = jnp.ndarray

# keep in sync with models/celerite._SERIES_CUT (same branch structure)
_CUT = 0.29
_CUT2 = _CUT * _CUT


def _expm1k(x):
    """expm1 in Mosaic's supported subset (the `expm1` primitive has no
    TPU lowering; probed on device).  |x| < 1/2: degree-9 Taylor in
    Horner form (remainder ~5e-10 relative, below f32 eps; no
    cancellation because the series starts at x).  |x| >= 1/2:
    exp(x) - 1 (relative error ~2 eps there)."""
    small = jnp.abs(x) < 0.5
    xs = jnp.where(small, x, 0.0)
    poly = xs * (
        1.0 + xs * (
            1.0 / 2.0 + xs * (
                1.0 / 6.0 + xs * (
                    1.0 / 24.0 + xs * (
                        1.0 / 120.0 + xs * (
                            1.0 / 720.0 + xs * (
                                1.0 / 5040.0 + xs * (
                                    1.0 / 40320.0 + xs / 362880.0))))))))
    return jnp.where(small, poly, jnp.exp(x) - 1.0)


def _osc_core(gbv, dt3):
    """Closed-form gap terms for ALL oscillators on one lane tile,
    stacked along the SUBLANE axis: gbv [nb, 4, 1] (VMEM, entries
    g00/g01/g10/g11 per row) + dt3 [1, 1, nt] -> the 2x2 entries of
    E = e - I and Q1, all [nb, 1, nt].  Mirrors
    `models.celerite._block_e_terms` / `_block_gap_terms` exactly (same
    branch cuts), restricted to Mosaic-supported elementwise ops.

    The stacking is the kernel's main VPU economy: the scalar pipeline
    is ~50 elementwise ops, and a [1, 1, nt] op costs a full 8-sublane
    tile pass -- per-oscillator loops (the first cut) burned nb x 50
    tile ops where this burns ~50 [nb, 1, nt] ones."""
    g00 = gbv[:, 0:1, :]  # [nb, 1, 1]
    g01 = gbv[:, 1:2, :]
    g10 = gbv[:, 2:3, :]
    g11 = gbv[:, 3:4, :]
    mu = dt3 * (-(g00 + g11) / 4.0)  # [nb, 1, nt]
    al = dt3 * (-(g00 - g11) / 4.0)
    be = dt3 * (-g01 / 2.0)
    ga = dt3 * (-g10 / 2.0)
    q2 = al * al + be * ga
    em1_mu = _expm1k(mu)
    hyper = q2 >= _CUT2
    trig = q2 <= -_CUT2
    w = jnp.sqrt(jnp.where(hyper | trig, jnp.abs(q2), _CUT2))

    w_h = jnp.where(hyper, w, 0.0)
    ep = _expm1k(mu + w_h)
    em = _expm1k(mu - w_h)
    ecm1_h = 0.5 * (ep + em)
    esnc_h = (ep - em) / (2.0 * jnp.maximum(w_h, _CUT))

    w_t = jnp.where(trig, w, 0.0)
    cw = jnp.cos(w_t)
    ecm1_t = em1_mu * cw + (cw - 1.0)
    esnc_t = (1.0 + em1_mu) * jnp.sin(w_t) / jnp.maximum(w_t, _CUT)

    q2_s = jnp.clip(q2, -_CUT2, _CUT2)
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

    e00_m1 = ecm1 + esnc * al
    e01 = esnc * be
    e10 = esnc * ga
    e11_m1 = ecm1 - esnc * al

    # Q1 = -(E + E^T + E E^T): exact at working precision for any gap
    q00 = -(2.0 * e00_m1 + e00_m1 * e00_m1 + e01 * e01)
    q11 = -(2.0 * e11_m1 + e11_m1 * e11_m1 + e10 * e10)
    q01 = -(e01 + e10 + e00_m1 * e10 + e01 * e11_m1)
    return (e00_m1, e01, e10, e11_m1), (q00, q01, q11)


def _osc_gap_terms(gbv, dt3):
    """(e 2x2 entries, Q1^{-1} upper entries, det Q1), all [nb, 1, nt]:
    the precision-sweep emission (`_cel_row_terms`)."""
    (e00_m1, e01, e10, e11_m1), (q00, q01, q11) = _osc_core(gbv, dt3)
    e00 = 1.0 + e00_m1
    e11 = 1.0 + e11_m1
    det = q00 * q11 - q01 * q01
    inv_det = 1.0 / det
    i00 = q11 * inv_det
    i01 = -q01 * inv_det
    i11 = q00 * inv_det
    return (e00, e01, e10, e11), (i00, i01, i11), det


def _osc_eq_terms(gbv, dt3, gv3):
    """Validity-masked covariance-form gap terms: e = I + gv * E and
    Q = gv * Q1, 2x2 entries [nb, 1, nt].  A masked gap (gv = 0) is the
    exact no-op step (e = I, Q = 0) the conditional filter requires --
    only Q, never Q^{-1}, appears (ops/chunked_filter docstring)."""
    (e00_m1, e01, e10, e11_m1), (q00, q01, q11) = _osc_core(gbv, dt3)
    return ((1.0 + gv3 * e00_m1, gv3 * e01, gv3 * e10,
             1.0 + gv3 * e11_m1),
            (gv3 * q00, gv3 * q01, gv3 * q11))


def _assemble_blockdiag(entries, z3):
    """entries: per-oscillator 2x2 nested ((v00, v01), (v10, v11)) of
    [1, 1, nt] lanes -> dense block-diagonal [r, r, nt] by
    concatenation.  ``z3`` is an anchored [1, 1, nt] zero (constants
    must stay tied to kernel data -- pallas_sweep module docstring)."""
    nb = len(entries)
    r = 2 * nb
    nt = z3.shape[2]
    rows = []
    for k, e in enumerate(entries):
        row0 = jnp.concatenate([e[0][0], e[0][1]], axis=1)  # [1, 2, nt]
        row1 = jnp.concatenate([e[1][0], e[1][1]], axis=1)
        blk = jnp.concatenate([row0, row1], axis=0)  # [2, 2, nt]
        parts = []
        if k:
            parts.append(jnp.broadcast_to(z3, (2, 2 * k, nt)))
        parts.append(blk)
        if r - 2 * k - 2:
            parts.append(jnp.broadcast_to(z3, (2, r - 2 * k - 2, nt)))
        rows.append(jnp.concatenate(parts, axis=1)
                    if len(parts) > 1 else blk)
    return jnp.concatenate(rows, axis=0)


def _cel_row_terms(gb_ref, dt, gv):
    """Gap terms for one step: dt [nt] -> (d_left, d_right, off
    [r, r, nt], lq scalar) with the validity mask applied -- the
    closed-form twin of `expm_pallas._gap_row_terms`.

      off     = -Q1^{-1} e
      d_left  = Q1^{-1} - I     (push-through identity, leg._q1_terms)
      d_right = e^T Q1^{-1} e = -e^T off

    All per-oscillator math runs STACKED [nb, 1, nt] (_osc_gap_terms);
    only the final block-diagonal assembly touches per-oscillator
    slices."""
    dt3 = dt[None, None, :]
    gv3 = gv[None, None, :]
    z3 = dt3 * 0.0
    (e00, e01, e10, e11), (i00, i01, i11), det = _osc_gap_terms(
        gb_ref[:], dt3
    )
    o00 = -(i00 * e00 + i01 * e10) * gv3
    o01 = -(i00 * e01 + i01 * e11) * gv3
    o10 = -(i01 * e00 + i11 * e10) * gv3
    o11 = -(i01 * e01 + i11 * e11) * gv3
    # d_right = -e^T off, symmetrised like the XLA twin
    dr00 = -(e00 * o00 + e10 * o10)
    dr01 = -(e00 * o01 + e10 * o11)
    dr10 = -(e01 * o00 + e11 * o10)
    dr11 = -(e01 * o01 + e11 * o11)
    drs = 0.5 * (dr01 + dr10) * gv3
    i00g = (i00 - 1.0) * gv3
    i01g = i01 * gv3
    i11g = (i11 - 1.0) * gv3
    dr00 = dr00 * gv3
    dr11 = dr11 * gv3

    def row(k, x):  # [nb, 1, nt] -> oscillator k's lane [1, 1, nt]
        return x[k:k + 1]

    nb = e00.shape[0]
    off_e = [((row(k, o00), row(k, o01)), (row(k, o10), row(k, o11)))
             for k in range(nb)]
    dl_e = [((row(k, i00g), row(k, i01g)), (row(k, i01g), row(k, i11g)))
            for k in range(nb)]
    dr_e = [((row(k, dr00), row(k, drs)), (row(k, drs), row(k, dr11)))
            for k in range(nb)]
    lq = jnp.sum(jnp.sum(jnp.log(det), axis=0)[0] * gv)
    return (_assemble_blockdiag(dl_e, z3), _assemble_blockdiag(dr_e, z3),
            _assemble_blockdiag(off_e, z3), lq)


def _cel_sweep_kernel(gb_ref, boost_ref, dt_ref, gv_ref, real_ref,
                      dt0_ref, gv0_ref, real0_ref, wrap_ref, y_ref,
                      acc00_ref, accy0_ref, w0l_ref, wl_ref, dl_ref,
                      invdl_ref, stats_ref, k0_ref, olast_ref,
                      cprev_s, w0_s, w_s, acc00_s, accy0_s, stats_s,
                      dleft_s, o0_s):
    """One (chunk-tile, step) cell: the celerite twin of
    `expm_pallas._gap_sweep_kernel` (closed-form construction, shared
    elimination cell)."""
    j = pl.program_id(1)
    r = boost_ref.shape[0]
    dtype = boost_ref.dtype
    eye = boost_ref[:] * 0.0 + jnp.eye(r, dtype=dtype)[:, :, None]
    boost3 = boost_ref[:]

    d_left_n, d_right, off_n, lq_n = _cel_row_terms(
        gb_ref, dt_ref[0, 0], gv_ref[0, 0]
    )

    @pl.when(j == 0)
    def _():
        d_left0, d_right0, off0, lq0 = _cel_row_terms(
            gb_ref, dt0_ref[0, 0], gv0_ref[0, 0]
        )
        real0_3 = real0_ref[0, 0][None, None, :]
        k0_ref[:] = eye + wrap_ref[:] + d_right0 + boost3 * real0_3
        dleft_s[:] = d_left0
        o0_s[:] = off0
        stats_s[0, 2] = lq0

    real3 = real_ref[0, 0][None, None, :]
    r_j = eye + dleft_s[:] + d_right + boost3 * real3
    o_j = off_n
    y_j = y_ref[0]  # [r, 1, nt]

    _fused_elim_cell(j, r_j, o_j, y_j, lq_n, dl_ref, invdl_ref,
                     cprev_s, w0_s, w_s, acc00_s, accy0_s, stats_s, o0_s)

    dleft_s[:] = d_left_n

    _fused_elim_flush(j, o_j, acc00_ref, accy0_ref, w0l_ref, wl_ref,
                      stats_ref, olast_ref,
                      w0_s, w_s, acc00_s, accy0_s, stats_s)


def _cel_tile(r: int) -> int:
    """Lane tile: the kernel holds ~12 [r, r, ct] VMEM buffers
    (elimination state + construction temporaries), ~3 MB at r = 16,
    ct = 256 -- comfortably under the 16 MB scoped limit."""
    return 256 if r >= 12 else 512


@jax.jit
def celerite_gap_mahal_sweep_pallas(gb: Array, boost: Array, dt_cm: Array,
                                    gv_cm: Array, real_cm: Array,
                                    wrap_em: Array, y_cm: Array):
    """Fused celerite gaps -> forward-eliminated likelihood sweep.

    gb [nb, 2, 2]: the oscillator blocks of G (models/celerite.g_blocks);
    boost [r, r] = B^T (LL^T)^{-1} B with r = 2 nb; dt_cm/gv_cm/real_cm
    [s, C]; wrap_em [r, r, C]; y_cm [s, r, C].  Returns the same tuple
    as `expm_pallas.gap_mahal_sweep_pallas` (sweep state sliced to the
    true chunk count, boundary rows, stats)."""
    nb = gb.shape[0]
    r = 2 * nb
    s, c = dt_cm.shape
    nt = _cel_tile(r)
    cpad = -(-c // nt) * nt
    if cpad != c:
        p = cpad - c
        dt_cm = jnp.concatenate(
            [dt_cm, jnp.ones((s, p), dtype=dt_cm.dtype)], axis=-1)
        gv_cm = jnp.concatenate(
            [gv_cm, jnp.zeros((s, p), dtype=gv_cm.dtype)], axis=-1)
        real_cm = jnp.concatenate(
            [real_cm, jnp.zeros((s, p), dtype=real_cm.dtype)], axis=-1)
        wrap_em = jnp.concatenate(
            [wrap_em, jnp.zeros((r, r, p), dtype=wrap_em.dtype)], axis=-1)
        y_cm = jnp.concatenate(
            [y_cm, jnp.zeros((s, r, p), dtype=y_cm.dtype)], axis=-1)

    nct = cpad // nt
    # gb rides in VMEM [nb, 4, 1] so the per-oscillator pipeline can
    # broadcast it against [1, 1, nt] lanes (see _osc_gap_terms)
    smem_gb = pl.BlockSpec((nb, 4, 1), lambda t, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    const = pl.BlockSpec((r, r, 1), lambda t, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((1, 1, nt), lambda t, j: (j + 1, 0, t),
                        memory_space=pltpu.VMEM)
    lane0 = pl.BlockSpec((1, 1, nt), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    tilemat = pl.BlockSpec((r, r, nt), lambda t, j: (0, 0, t),
                           memory_space=pltpu.VMEM)
    tilevec = pl.BlockSpec((r, 1, nt), lambda t, j: (0, 0, t),
                           memory_space=pltpu.VMEM)
    stepv = pl.BlockSpec((1, r, 1, nt), lambda t, j: (j + 1, 0, 0, t),
                         memory_space=pltpu.VMEM)
    mat = jax.ShapeDtypeStruct((r, r, cpad), boost.dtype)
    vec = jax.ShapeDtypeStruct((r, 1, cpad), boost.dtype)
    outs = pl.pallas_call(
        _cel_sweep_kernel,
        grid=(nct, s - 1),
        in_specs=[smem_gb, const,
                  lane, lane, lane, lane0, lane0, lane0,
                  tilemat, stepv],
        out_specs=[tilemat, tilevec, tilemat, tilevec, tilemat, tilevec,
                   pl.BlockSpec((nct, 3), lambda t, j: (0, 0),
                                memory_space=pltpu.SMEM),
                   tilemat, tilemat],
        out_shape=[mat, vec, mat, vec, mat, vec,
                   jax.ShapeDtypeStruct((nct, 3), boost.dtype),
                   mat, mat],
        scratch_shapes=[
            pltpu.VMEM((r, r, nt), boost.dtype),
            pltpu.VMEM((r, r, nt), boost.dtype),
            pltpu.VMEM((r, 1, nt), boost.dtype),
            pltpu.VMEM((r, r, nt), boost.dtype),
            pltpu.VMEM((r, 1, nt), boost.dtype),
            pltpu.SMEM((1, 3), boost.dtype),
            pltpu.VMEM((r, r, nt), boost.dtype),
            pltpu.VMEM((r, r, nt), boost.dtype),
        ],
    )(gb.reshape(nb, 4, 1), boost[:, :, None],
      dt_cm[:, None, :], gv_cm[:, None, :], real_cm[:, None, :],
      dt_cm[:1, None, :], gv_cm[:1, None, :], real_cm[:1, None, :],
      wrap_em, y_cm[:, :, None, :])
    (acc00, accy0, w0l, wl, dl, invdl, stats, k0, olast) = outs
    return (acc00[:, :, :c], accy0[:, 0, :c], w0l[:, :, :c], wl[:, 0, :c],
            dl[:, :, :c], invdl[:, 0, :c],
            jnp.sum(stats[:, 0]), jnp.sum(stats[:, 1]),
            jnp.sum(stats[:, 2]), k0[:, :, :c], olast[:, :, :c])


# ---------------------------------------------------------------------------
# Chunk-parallel conditional Kalman filter: the O(N r^2 q) celerite solve
# ---------------------------------------------------------------------------


def _bd_left(ee, x):
    """Block-diagonal left product e @ x for x [r, w, nt]: per
    oscillator k, rows (2k, 2k+1) mix through its 2x2 -- O(r w) lane
    FMAs total instead of the dense product's O(r^2 w).  ``ee`` is the
    (e00, e01, e10, e11) tuple of [nb, 1, nt] stacks."""
    e00, e01, e10, e11 = ee
    nb = e00.shape[0]
    rows = []
    for k in range(nb):
        x0 = x[2 * k:2 * k + 1]
        x1 = x[2 * k + 1:2 * k + 2]
        rows.append(e00[k:k + 1] * x0 + e01[k:k + 1] * x1)
        rows.append(e10[k:k + 1] * x0 + e11[k:k + 1] * x1)
    return jnp.concatenate(rows, axis=0)


def _cel_filter_kernel(gb_ref, b_ref, lam_ref, dt_ref, gv_ref, real_ref,
                       y_ref, hq_ref, hl_ref, c0_ref, lds_ref, f_ref,
                       am_ref, pm_ref, a_s, f_s, p_s, hq_s, hl_s, sc_s,
                       hist_refs=None):
    """One (chunk-tile, step) cell of the conditional Kalman filter
    (ops/chunked_filter.conditional_filter_xla's recursion, verbatim):
    masked innovation update at row j, then a closed-form-(e, Q)
    predict through the following gap.  Carries live in VMEM scratch
    across the step grid; only the per-chunk boundary statistics are
    written out (at j = s-1).  Per-step work is O(r^2 q) lane FMAs --
    no r x r factorization (the q x q innovation Cholesky is the only
    factor) -- which is the celerite scaling the kernel exists for.

    ``hist_refs`` (collect variant): (a_h, f_h, p_h) per-step output
    refs recording the PRE-update state of step j -- the residual
    stream the analytic adjoint kernel consumes."""
    j = pl.program_id(1)
    s = pl.num_programs(1)
    r = f_s.shape[0]

    z3 = dt_ref[0:1, 0:1, :] * 0.0          # anchored [1, 1, nt] zero
    eye_r = z3 + jnp.eye(r, dtype=f_s.dtype)[:, :, None]

    @pl.when(j == 0)
    def _():
        a_s[:] = jnp.broadcast_to(z3, a_s.shape)
        f_s[:] = eye_r
        p_s[:] = jnp.broadcast_to(z3, p_s.shape)
        hq_s[:] = jnp.broadcast_to(z3, hq_s.shape)
        hl_s[:] = jnp.broadcast_to(z3, hl_s.shape)
        sc_s[:] = jnp.broadcast_to(z3, sc_s.shape)

    v3 = real_ref[0:1, 0:1, :]              # [1, 1, nt]
    # materialize the lane-constant observation model to full lane
    # width with SINGLE-axis broadcasts: _mm's [q, 1, 1] slices of a
    # [q, r, 1] operand would broadcast in both sublanes and lanes at
    # once, which real Mosaic rejects (interpret mode accepts it) --
    # same pattern as _cel_sweep_kernel's boost3 * real3
    one_lane = z3 + 1.0                     # anchored [1, 1, nt] ones
    bv = b_ref[:] * one_lane                # [q, r, nt]
    lamf = lam_ref[:] * one_lane            # [q, q, nt]
    a = a_s[:]
    F = f_s[:]
    P = p_s[:]

    if hist_refs is not None:               # collect: pre-update state
        a_h, f_h, p_h = hist_refs
        a_h[0] = a
        f_h[0] = F
        p_h[0] = P

    # ---- innovation update (masked by v3; S >= Lambda always SPD) ----
    BP = _mm(bv, P)                          # [q, r, nt]
    Gj = _mm(bv, F)                          # [q, r, nt]
    resid = y_ref[0] - _mm(bv, a)            # [q, 1, nt]
    S = _mm(BP, bv, tb=True) + lamf          # [q, q, nt]
    L, invd, ldh = _chol(S)
    sr = _solve_lower_t(L, invd, _solve_lower(L, invd, resid))
    X = _solve_lower_t(L, invd, _solve_lower(L, invd, Gj))
    X2 = _solve_lower_t(L, invd, _solve_lower(L, invd, BP))
    PBt = _swap(BP)                          # [r, q, nt] (P symmetric)
    hq_s[:] = hq_s[:] + v3 * _mm(Gj, X, ta=True)
    hl_s[:] = hl_s[:] + v3 * _mm(Gj, sr, ta=True)
    sc_s[0:1] = sc_s[0:1] + v3 * _mm(resid, sr, ta=True)   # c0
    sc_s[1:2] = sc_s[1:2] + v3 * 2.0 * ldh                 # sum log|S|
    a = a + v3 * _mm(PBt, sr)
    F = F - v3 * _mm(PBt, X)
    P = P - v3 * _mm(PBt, X2)

    # ---- predict through the following gap (masked: exact no-op) ----
    ee, qq = _osc_eq_terms(gb_ref[:], dt_ref[:], gv_ref[:])
    q00, q01, q11 = qq
    nb = q00.shape[0]
    q_e = [((q00[k:k + 1], q01[k:k + 1]), (q01[k:k + 1], q11[k:k + 1]))
           for k in range(nb)]
    a_s[:] = _bd_left(ee, a)
    f_s[:] = _bd_left(ee, F)
    p_s[:] = _bd_left(ee, _swap(_bd_left(ee, P))) + _assemble_blockdiag(
        q_e, z3)

    @pl.when(j == s - 1)
    def _():
        hq_ref[:] = hq_s[:]
        hl_ref[:] = hl_s[:]
        c0_ref[:] = sc_s[0:1]
        lds_ref[:] = sc_s[1:2]
        f_ref[:] = f_s[:]
        am_ref[:] = a_s[:]
        pm_ref[:] = p_s[:]


@jax.jit
def celerite_filter_sweep_pallas(gb: Array, b: Array, lam: Array,
                                 dt_cm: Array, gv_cm: Array,
                                 real_cm: Array, y_cm: Array):
    """Fused conditional-filter sweep: per-chunk boundary statistics of
    the O(N r^2 q) celerite solve, computed entirely in VMEM.

    gb [nb, 2, 2] oscillator blocks; b [q, r], lam [q, q] observation
    model; dt_cm/gv_cm/real_cm [s, C] (gap following row j of chunk c,
    its validity, row-observed mask); y_cm [s, q, C] observations.
    Returns the statistics ELEMENT-MAJOR -- (H [r, r, C], h [r, C],
    c0 [C], ld_s [C], F [r, r, C], a [r, C], P [r, r, C]), consumed by
    `chunked_filter.boundary_loglik_em` with no layout transposes (the
    batch-major conversion round-tripped ~40 MB of HBM and cost more
    than the sweep itself).  The XLA twin `conditional_filter_xla` is
    the recursion oracle (tests/test_celerite.py)."""
    nb = gb.shape[0]
    r = 2 * nb
    qd = b.shape[0]
    s, c = dt_cm.shape
    dtype = b.dtype
    nt = _cel_tile(r)
    cpad = -(-c // nt) * nt
    if cpad != c:
        p = cpad - c
        dt_cm = jnp.concatenate(
            [dt_cm, jnp.ones((s, p), dtype=dt_cm.dtype)], axis=-1)
        gv_cm = jnp.concatenate(
            [gv_cm, jnp.zeros((s, p), dtype=gv_cm.dtype)], axis=-1)
        real_cm = jnp.concatenate(
            [real_cm, jnp.zeros((s, p), dtype=real_cm.dtype)], axis=-1)
        y_cm = jnp.concatenate(
            [y_cm, jnp.zeros((s, qd, p), dtype=y_cm.dtype)], axis=-1)

    nct = cpad // nt
    vmem_gb = pl.BlockSpec((nb, 4, 1), lambda t, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    vmem_b = pl.BlockSpec((qd, r, 1), lambda t, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    vmem_lam = pl.BlockSpec((qd, qd, 1), lambda t, j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((1, 1, nt), lambda t, j: (j, 0, t),
                        memory_space=pltpu.VMEM)
    stepy = pl.BlockSpec((1, qd, 1, nt), lambda t, j: (j, 0, 0, t),
                         memory_space=pltpu.VMEM)
    tilemat = pl.BlockSpec((r, r, nt), lambda t, j: (0, 0, t),
                           memory_space=pltpu.VMEM)
    tilevec = pl.BlockSpec((r, 1, nt), lambda t, j: (0, 0, t),
                           memory_space=pltpu.VMEM)
    tilelane = pl.BlockSpec((1, 1, nt), lambda t, j: (0, 0, t),
                            memory_space=pltpu.VMEM)
    mat = jax.ShapeDtypeStruct((r, r, cpad), dtype)
    vec = jax.ShapeDtypeStruct((r, 1, cpad), dtype)
    sca = jax.ShapeDtypeStruct((1, 1, cpad), dtype)
    outs = pl.pallas_call(
        _cel_filter_kernel,
        grid=(nct, s),
        in_specs=[vmem_gb, vmem_b, vmem_lam, lane, lane, lane, stepy],
        out_specs=[tilemat, tilevec, tilelane, tilelane, tilemat,
                   tilevec, tilemat],
        out_shape=[mat, vec, sca, sca, mat, vec, mat],
        scratch_shapes=[
            pltpu.VMEM((r, 1, nt), dtype),
            pltpu.VMEM((r, r, nt), dtype),
            pltpu.VMEM((r, r, nt), dtype),
            pltpu.VMEM((r, r, nt), dtype),
            pltpu.VMEM((r, 1, nt), dtype),
            pltpu.VMEM((2, 1, nt), dtype),
        ],
    )(gb.reshape(nb, 4, 1), b[:, :, None], lam[:, :, None],
      dt_cm[:, None, :], gv_cm[:, None, :], real_cm[:, None, :],
      y_cm[:, :, None, :])
    hq, hl, c0, lds, f_map, a_map, p_map = outs
    return (hq[:, :, :c], hl[:, 0, :c], c0[0, 0, :c], lds[0, 0, :c],
            f_map[:, :, :c], a_map[:, 0, :c], p_map[:, :, :c])


# ---------------------------------------------------------------------------
# Analytic adjoint of the conditional filter (the celerite training
# backward): forward COLLECT sweep (stores the per-step pre-update
# state) + a DESCENDING adjoint kernel.  Pallas twins of
# ops/chunked_filter.conditional_filter_collect_xla / _adjoint_xla.
# ---------------------------------------------------------------------------


def _cel_filter_collect_kernel(gb_ref, b_ref, lam_ref, dt_ref, gv_ref,
                               real_ref, y_ref, hq_ref, hl_ref, c0_ref,
                               lds_ref, f_ref, am_ref, pm_ref,
                               a_h, f_h, p_h,
                               a_s, f_s, p_s, hq_s, hl_s, sc_s):
    _cel_filter_kernel(gb_ref, b_ref, lam_ref, dt_ref, gv_ref, real_ref,
                       y_ref, hq_ref, hl_ref, c0_ref, lds_ref, f_ref,
                       am_ref, pm_ref, a_s, f_s, p_s, hq_s, hl_s, sc_s,
                       hist_refs=(a_h, f_h, p_h))


def _cel_pad_filter(dt_cm, gv_cm, real_cm, y_cm, nt):
    s, c = dt_cm.shape
    qd = y_cm.shape[1]
    cpad = -(-c // nt) * nt
    if cpad != c:
        p = cpad - c
        dt_cm = jnp.concatenate(
            [dt_cm, jnp.ones((s, p), dtype=dt_cm.dtype)], axis=-1)
        gv_cm = jnp.concatenate(
            [gv_cm, jnp.zeros((s, p), dtype=gv_cm.dtype)], axis=-1)
        real_cm = jnp.concatenate(
            [real_cm, jnp.zeros((s, p), dtype=real_cm.dtype)], axis=-1)
        y_cm = jnp.concatenate(
            [y_cm, jnp.zeros((s, qd, p), dtype=y_cm.dtype)], axis=-1)
    return dt_cm, gv_cm, real_cm, y_cm, cpad


@jax.jit
def celerite_filter_collect_sweep_pallas(gb: Array, b: Array, lam: Array,
                                         dt_cm: Array, gv_cm: Array,
                                         real_cm: Array, y_cm: Array):
    """`celerite_filter_sweep_pallas` that ALSO writes the per-step
    pre-update state (a_j [s, r, 1, C], F_j / P_j [s, r, r, C]) -- the
    2 r^2 + r floats/step residual stream of the analytic adjoint
    (`celerite_filter_adjoint_pallas` reads it descending).  Run by the
    BACKWARD pass only; the plain sweep never materialises it."""
    nb = gb.shape[0]
    r = 2 * nb
    qd = b.shape[0]
    s, c = dt_cm.shape
    dtype = b.dtype
    nt = _cel_tile(r)
    dt_cm, gv_cm, real_cm, y_cm, cpad = _cel_pad_filter(
        dt_cm, gv_cm, real_cm, y_cm, nt)

    nct = cpad // nt
    vmem_gb = pl.BlockSpec((nb, 4, 1), lambda t, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    vmem_b = pl.BlockSpec((qd, r, 1), lambda t, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    vmem_lam = pl.BlockSpec((qd, qd, 1), lambda t, j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((1, 1, nt), lambda t, j: (j, 0, t),
                        memory_space=pltpu.VMEM)
    stepy = pl.BlockSpec((1, qd, 1, nt), lambda t, j: (j, 0, 0, t),
                         memory_space=pltpu.VMEM)
    tilemat = pl.BlockSpec((r, r, nt), lambda t, j: (0, 0, t),
                           memory_space=pltpu.VMEM)
    tilevec = pl.BlockSpec((r, 1, nt), lambda t, j: (0, 0, t),
                           memory_space=pltpu.VMEM)
    tilelane = pl.BlockSpec((1, 1, nt), lambda t, j: (0, 0, t),
                            memory_space=pltpu.VMEM)
    stepm = pl.BlockSpec((1, r, r, nt), lambda t, j: (j, 0, 0, t),
                         memory_space=pltpu.VMEM)
    stepv = pl.BlockSpec((1, r, 1, nt), lambda t, j: (j, 0, 0, t),
                         memory_space=pltpu.VMEM)
    mat = jax.ShapeDtypeStruct((r, r, cpad), dtype)
    vec = jax.ShapeDtypeStruct((r, 1, cpad), dtype)
    sca = jax.ShapeDtypeStruct((1, 1, cpad), dtype)
    hmat = jax.ShapeDtypeStruct((s, r, r, cpad), dtype)
    hvec = jax.ShapeDtypeStruct((s, r, 1, cpad), dtype)
    outs = pl.pallas_call(
        _cel_filter_collect_kernel,
        grid=(nct, s),
        in_specs=[vmem_gb, vmem_b, vmem_lam, lane, lane, lane, stepy],
        out_specs=[tilemat, tilevec, tilelane, tilelane, tilemat,
                   tilevec, tilemat, stepv, stepm, stepm],
        out_shape=[mat, vec, sca, sca, mat, vec, mat, hvec, hmat, hmat],
        scratch_shapes=[
            pltpu.VMEM((r, 1, nt), dtype),
            pltpu.VMEM((r, r, nt), dtype),
            pltpu.VMEM((r, r, nt), dtype),
            pltpu.VMEM((r, r, nt), dtype),
            pltpu.VMEM((r, 1, nt), dtype),
            pltpu.VMEM((2, 1, nt), dtype),
        ],
    )(gb.reshape(nb, 4, 1), b[:, :, None], lam[:, :, None],
      dt_cm[:, None, :], gv_cm[:, None, :], real_cm[:, None, :],
      y_cm[:, :, None, :])
    hq, hl, c0, lds, f_map, a_map, p_map, a_h, f_h, p_h = outs
    stats = (hq[:, :, :c], hl[:, 0, :c], c0[0, 0, :c], lds[0, 0, :c],
             f_map[:, :, :c], a_map[:, 0, :c], p_map[:, :, :c])
    return stats, (a_h, f_h, p_h)  # hists stay cpad-wide (kernel input)


def _entries4(blk):
    """[2, 2, nt] -> [1, 4, nt] (entry order 00, 01, 10, 11); only
    single-sublane slices (the same access pattern `_mm` uses)."""
    return jnp.concatenate(
        [blk[0:1, 0:1], blk[0:1, 1:2], blk[1:2, 0:1], blk[1:2, 1:2]],
        axis=1)


def _bd_blocks_of(x, nb):
    """[r, r, nt] -> its 2x2 diagonal-block entries stacked [nb, 4, nt]
    (entry order 00, 01, 10, 11).  Columns are selected by slicing the
    UNTILED dim 0 after a `_swap` -- multi-sublane offset slices are
    avoided (Mosaic alignment, see pallas_sweep._chol)."""
    rows = []
    for k in range(nb):
        sl = slice(2 * k, 2 * k + 2)
        blk = _swap(_swap(x[sl])[sl])        # x[2k:2k+2, 2k:2k+2]
        rows.append(_entries4(blk))
    return jnp.concatenate(rows, axis=0)


def _cel_filter_adjoint_kernel(gb_ref, b_ref, lam_ref, dt_ref, gv_ref,
                               real_ref, y_ref, a_h_ref, f_h_ref,
                               p_h_ref, hqb_ref, hlb_ref, c0b_ref,
                               ldb_ref, fsb_ref, asb_ref, psb_ref,
                               eb_ref, qb_ref, yb_ref, bb_ref, lb_ref,
                               ab_s, fb_s, pb_s, bacc_s, lacc_s):
    """Descending adjoint cell of the conditional filter: grid step j
    visits series step jj = s-1-j (all per-step operands use s-1-j index
    maps).  Recomputes the O(r^2 q) forward intermediates from the
    stored pre-update state, transposes each forward op exactly
    (ops/chunked_filter.conditional_filter_adjoint_xla is the oracle),
    carries (abar, Fbar, Pbar) in VMEM scratch, and emits per-gap
    cotangents only for the 2x2 DIAGONAL BLOCKS of (e, q) -- e and q
    are block-diagonal, so the dense r x r cotangent is never built
    (the O(r^3) product F̄' F1^T is taken per 2x2 block at O(r) each)."""
    j = pl.program_id(1)
    s = pl.num_programs(1)
    r = fb_s.shape[0]
    nb = r // 2

    z3 = dt_ref[0:1, 0:1, :] * 0.0
    one_lane = z3 + 1.0
    bv = b_ref[:] * one_lane                 # [q, r, nt]
    lamf = lam_ref[:] * one_lane             # [q, q, nt]
    eyeq = lamf * 0.0 + jnp.eye(
        lamf.shape[0], dtype=lamf.dtype)[:, :, None]

    @pl.when(j == 0)
    def _():
        ab_s[:] = asb_ref[:]
        fb_s[:] = fsb_ref[:]
        pb_s[:] = psb_ref[:]
        bacc_s[:] = jnp.broadcast_to(z3, bacc_s.shape)
        lacc_s[:] = jnp.broadcast_to(z3, lacc_s.shape)

    v3 = real_ref[0:1, 0:1, :]
    a0 = a_h_ref[0]                          # [r, 1, nt]
    F0 = f_h_ref[0]                          # [r, r, nt]
    P0 = p_h_ref[0]
    abar_n = ab_s[:]
    Fbar_n = fb_s[:]
    Pbar_n = pb_s[:]

    # ---- recompute the forward intermediates ----
    BP = _mm(bv, P0)                         # [q, r, nt]
    Gj = _mm(bv, F0)
    resid = y_ref[0] - _mm(bv, a0)           # [q, 1, nt]
    S = _mm(BP, bv, tb=True) + lamf
    L, invd, _ldh = _chol(S)

    def si_apply(x):
        return _solve_lower_t(L, invd, _solve_lower(L, invd, x))

    sr = si_apply(resid)                     # Si resid   [q, 1, nt]
    X = si_apply(Gj)                         # Si G       [q, r, nt]
    X2 = si_apply(BP)                        # Si B P     [q, r, nt]
    Si = si_apply(eyeq)                      # [q, q, nt]
    PBt = _swap(BP)                          # [r, q, nt]
    K = _swap(X2)                            # [r, q, nt]
    a1 = a0 + v3 * _mm(PBt, sr)
    F1 = F0 - v3 * _mm(PBt, X)
    P1 = P0 - v3 * _mm(PBt, X2)

    # ---- predict adjoint ----
    ee, _qq = _osc_eq_terms(gb_ref[:], dt_ref[:], gv_ref[:])
    eeT = (ee[0], ee[2], ee[1], ee[3])       # transposed 2x2 entries
    qb_ref[0] = _bd_blocks_of(Pbar_n, nb)
    Psym = Pbar_n + _swap(Pbar_n)
    W = _bd_left(ee, P1)                     # e P1  [r, r, nt]
    Wt = _swap(W)                            # columns of W as rows
    eb_rows = []
    for k in range(nb):
        sl = slice(2 * k, 2 * k + 2)
        blk = (
            _mm(abar_n[sl], a1[sl], tb=True)
            + _mm(Fbar_n[sl], F1[sl], tb=True)
            + _mm(Psym[sl], Wt[sl], tb=True)  # Psym[2k:, :] W[:, 2k:]
        )                                    # [2, 2, nt]
        eb_rows.append(_entries4(blk))
    eb_ref[0] = jnp.concatenate(eb_rows, axis=0)

    abar1 = _bd_left(eeT, abar_n)
    Fbar1 = _bd_left(eeT, Fbar_n)
    Pbar1 = _swap(_bd_left(eeT, _swap(_bd_left(eeT, Pbar_n))))

    # ---- update adjoint ----
    Hb = hqb_ref[:]
    hb = hlb_ref[:]
    c0b = c0b_ref[:]                         # [1, 1, nt]
    ldb = ldb_ref[:]
    Kbar = v3 * (
        _mm(abar1, resid, tb=True)
        - _mm(Fbar1, Gj, tb=True)
        - _mm(Pbar1, PBt)
    )                                        # [r, q, nt]
    rbar = v3 * (
        _mm(K, abar1, ta=True)
        + _mm(X, hb)
        + 2.0 * c0b * sr
    )                                        # [q, 1, nt]
    Gbar = v3 * (
        -_mm(K, Fbar1, ta=True)
        + _mm(X, Hb + _swap(Hb))
        + _mm(sr, hb, tb=True)
    )                                        # [q, r, nt]
    Sibar = _mm(PBt, Kbar, ta=True) + v3 * (
        _mm(_mm(Gj, Hb), Gj, tb=True)
        + _mm(_mm(Gj, hb), resid, tb=True)
        + c0b * _mm(resid, resid, tb=True)
    )                                        # [q, q, nt]
    PBtbar = -v3 * _mm(Pbar1, K, ta=True) + _swap(
        si_apply(_swap(Kbar)))               # K̄ Si (Si symmetric)
    Sbar = v3 * ldb * Si - _mm(_mm(Si, Sibar), Si)
    ab_s[:] = abar1 - _mm(bv, rbar, ta=True)
    fb_s[:] = Fbar1 + _mm(bv, Gbar, ta=True)
    pb_s[:] = (Pbar1 + _mm(PBtbar, bv)
               + _mm(bv, _mm(Sbar, bv), ta=True))
    yb_ref[0] = rbar
    bacc_s[:] = bacc_s[:] + (
        _mm(PBtbar, P0, ta=True)
        + _mm(Gbar, F0, tb=True)
        - _mm(rbar, a0, tb=True)
        + _mm(_mm(Sbar + _swap(Sbar), bv), P0)
    )
    lacc_s[:] = lacc_s[:] + Sbar

    @pl.when(j == s - 1)
    def _():
        bb_ref[:] = bacc_s[:]
        lb_ref[:] = lacc_s[:]


@jax.jit
def celerite_filter_adjoint_pallas(gb: Array, b: Array, lam: Array,
                                   dt_cm: Array, gv_cm: Array,
                                   real_cm: Array, y_cm: Array,
                                   hists, cots):
    """Analytic adjoint of the fused conditional-filter sweep.

    ``hists`` = (a_h, f_h, p_h) from
    `celerite_filter_collect_sweep_pallas` (cpad-wide); ``cots`` the
    element-major output cotangents (H [r, r, C], h [r, C], c0 [C],
    ld [C], F [r, r, C], a [r, C], P [r, r, C]).  Returns
    (ebar [s, nb, 4, C], qbar [s, nb, 4, C], ybar [s, q, C],
    bbar [q, r], lambar [q, q]) -- e/q cotangents per 2x2 block entry
    (order 00, 01, 10, 11), chained through the closed forms by the
    caller (models/celerite._cel_filter_pallas_bwd)."""
    nb = gb.shape[0]
    r = 2 * nb
    qd = b.shape[0]
    s, c = dt_cm.shape
    dtype = b.dtype
    nt = _cel_tile(r)
    dt_cm, gv_cm, real_cm, y_cm, cpad = _cel_pad_filter(
        dt_cm, gv_cm, real_cm, y_cm, nt)
    hqb, hlb, c0b, ldb, fsb, asb, psb = cots

    def padm(x):
        pad = [(0, 0)] * (x.ndim - 1) + [(0, cpad - x.shape[-1])]
        return jnp.pad(x, pad)

    hqb = padm(hqb)
    hlb = padm(hlb)[:, None, :]
    c0b = padm(c0b)[None, None, :]
    ldb = padm(ldb)[None, None, :]
    fsb = padm(fsb)
    asb = padm(asb)[:, None, :]
    psb = padm(psb)
    a_h, f_h, p_h = hists

    nct = cpad // nt
    down = lambda t, j: (s - 1 - j, 0, t)            # noqa: E731
    down4 = lambda t, j: (s - 1 - j, 0, 0, t)        # noqa: E731
    vmem_gb = pl.BlockSpec((nb, 4, 1), lambda t, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    vmem_b = pl.BlockSpec((qd, r, 1), lambda t, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    vmem_lam = pl.BlockSpec((qd, qd, 1), lambda t, j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    lane = pl.BlockSpec((1, 1, nt), down, memory_space=pltpu.VMEM)
    stepy = pl.BlockSpec((1, qd, 1, nt), down4, memory_space=pltpu.VMEM)
    stepm = pl.BlockSpec((1, r, r, nt), down4, memory_space=pltpu.VMEM)
    stepv = pl.BlockSpec((1, r, 1, nt), down4, memory_space=pltpu.VMEM)
    tilemat = pl.BlockSpec((r, r, nt), lambda t, j: (0, 0, t),
                           memory_space=pltpu.VMEM)
    tilevec = pl.BlockSpec((r, 1, nt), lambda t, j: (0, 0, t),
                           memory_space=pltpu.VMEM)
    tilelane = pl.BlockSpec((1, 1, nt), lambda t, j: (0, 0, t),
                            memory_space=pltpu.VMEM)
    stepblk = pl.BlockSpec((1, nb, 4, nt), down4,
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _cel_filter_adjoint_kernel,
        grid=(nct, s),
        in_specs=[vmem_gb, vmem_b, vmem_lam, lane, lane, lane, stepy,
                  stepv, stepm, stepm,
                  tilemat, tilevec, tilelane, tilelane, tilemat,
                  tilevec, tilemat],
        out_specs=[stepblk, stepblk,
                   pl.BlockSpec((1, qd, 1, nt), down4,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((qd, r, nt), lambda t, j: (0, 0, t),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((qd, qd, nt), lambda t, j: (0, 0, t),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((s, nb, 4, cpad), dtype),
                   jax.ShapeDtypeStruct((s, nb, 4, cpad), dtype),
                   jax.ShapeDtypeStruct((s, qd, 1, cpad), dtype),
                   jax.ShapeDtypeStruct((qd, r, cpad), dtype),
                   jax.ShapeDtypeStruct((qd, qd, cpad), dtype)],
        scratch_shapes=[
            pltpu.VMEM((r, 1, nt), dtype),
            pltpu.VMEM((r, r, nt), dtype),
            pltpu.VMEM((r, r, nt), dtype),
            pltpu.VMEM((qd, r, nt), dtype),
            pltpu.VMEM((qd, qd, nt), dtype),
        ],
    )(gb.reshape(nb, 4, 1), b[:, :, None], lam[:, :, None],
      dt_cm[:, None, :], gv_cm[:, None, :], real_cm[:, None, :],
      y_cm[:, :, None, :], a_h, f_h, p_h,
      hqb, hlb, c0b, ldb, fsb, asb, psb)
    ebar, qbar, ybar, bbar, lambar = outs
    return (ebar[:, :, :, :c], qbar[:, :, :, :c], ybar[:, :, 0, :c],
            jnp.sum(bbar, axis=-1), jnp.sum(lambar, axis=-1))
