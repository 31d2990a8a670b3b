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


def _osc_gap_terms(gbv, dt3):
    """Closed-form gap terms for ALL oscillators on one lane tile,
    stacked along the SUBLANE axis: gbv [nb, 4, 1] (VMEM, entries
    g00/g01/g10/g11 per row) + dt3 [1, 1, nt] -> the 2x2 entries of
    (E = e - I, e, Q1, Q1^{-1}) and det Q1, all [nb, 1, nt].  Mirrors
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
    e00 = 1.0 + e00_m1
    e11 = 1.0 + e11_m1

    # Q1 = -(E + E^T + E E^T): exact at working precision for any gap
    q00 = -(2.0 * e00_m1 + e00_m1 * e00_m1 + e01 * e01)
    q11 = -(2.0 * e11_m1 + e11_m1 * e11_m1 + e10 * e10)
    q01 = -(e01 + e10 + e00_m1 * e10 + e01 * e11_m1)

    det = q00 * q11 - q01 * q01
    inv_det = 1.0 / det
    i00 = q11 * inv_det
    i01 = -q01 * inv_det
    i11 = q00 * inv_det
    return (e00, e01, e10, e11), (i00, i01, i11), det


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
