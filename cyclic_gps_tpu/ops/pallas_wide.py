"""Pallas TPU fused forward sweep on the WIDE (8 < d <= 16) layout.

The wide-block twin of `pallas_sweep.forward_sweep_pallas`: the same
block-Thomas elimination recurrence, but every matrix batch lives in the
8-aligned (a11 [8, 8, C], strips [3e, 8, C]) representation of
ops/wideblock.py, so both the HBM->VMEM DMAs and the VPU ops are fully
packed -- for d = 9 the plain [d, d, C] layout moves and processes
16/9 = 1.78x the useful data (sublane tiling), which is exactly the
measured d = 8 -> 9 step in the family benchmark.

Three kernels: the fused (mahal, logdet) sweep, the same sweep with
per-step 'hat' back-substitution factors streamed to HBM (the solve
path's first pass), and the descending-order back-substitution.  The
reduced boundary system and its assembly are C-sized and stay on the
XLA side in the plain layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cyclic_gps_tpu.ops import wideblock as wb
from cyclic_gps_tpu.ops.pallas_sweep import _ct_for, _pad_chunks

Array = jnp.ndarray


def _wide_sweep_kernel(jit_ref, r11_ref, rst_ref, o11_ref, ost_ref,
                       o011_ref, o0st_ref, y_ref,
                       acc11_ref, accst_ref, accy0_ref,
                       w011_ref, w0st_ref, wl_ref,
                       d11_ref, dst_ref, invd_ref, stats_ref,
                       cp11_s, cpst_s, w011_s, w0st_s, w_s, acc11_s,
                       accst_s, accy0_s, stats_s):
    j = pl.program_id(1)
    e = rst_ref.shape[1] // 3
    dtype = r11_ref.dtype

    # jitter on the diagonal (anchored identities; constants alone crash
    # Mosaic's vector layout pass -- see pallas_sweep)
    eye8 = r11_ref[0] * 0.0 + jnp.eye(8, dtype=dtype)[:, :, None]
    rows_e = jax.lax.broadcasted_iota(jnp.int32, (e, 1, 1), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    eye_e = rst_ref[0, :e] * 0.0 + (rows_e == cols8).astype(dtype)
    jit = jit_ref[0, 0]
    r11 = r11_ref[0] + jit * eye8
    rst = rst_ref[0] + jit * jnp.concatenate(
        [eye_e * 0.0, eye_e * 0.0, eye_e], axis=0
    )
    o11 = o11_ref[0]
    ost = ost_ref[0]
    y_j = y_ref[0]  # [d, 1, ct]
    y1, y2 = y_j[:8], y_j[8:]

    def cprev_from(D, o11_, ost_):
        # C_j = (L^{-1} O^T)^T
        ot11, otst = wb.wtranspose(o11_, ost_)
        x11, xst = wb.wsolve_lower(*D[:4], ot11, otst)
        return wb.wtranspose(x11, xst)

    @pl.when(j == 0)
    def _():
        L11, Lst, i1, i2, ld = wb.wchol(r11, rst)
        D = (L11, Lst, i1, i2)
        w011, w0st = wb.wsolve_lower(*D, o011_ref[0], o0st_ref[0])
        w1v, w2v = wb.wsolve_lower_vec(*D, y1, y2)
        c11, cst = cprev_from(D, o11, ost)
        cp11_s[:] = c11
        cpst_s[:] = cst
        w011_s[:] = w011
        w0st_s[:] = w0st
        w_s[:] = jnp.concatenate([w1v, w2v], axis=0)
        a11, ast = wb.wmm_tn(w011, w0st, w011, w0st)
        acc11_s[:] = a11
        accst_s[:] = ast
        g1, g2 = wb.wmv_t(w011, w0st, w1v, w2v)
        accy0_s[:] = jnp.concatenate([g1, g2], axis=0)
        stats_s[0, 0] = jnp.sum(w1v * w1v) + jnp.sum(w2v * w2v)
        stats_s[0, 1] = ld
        d11_ref[:] = L11
        dst_ref[:] = Lst
        invd_ref[:] = jnp.concatenate([i1, i2], axis=0)

    @pl.when(j > 0)
    def _():
        cp11, cpst = cp11_s[:], cpst_s[:]
        s11, sst = wb.wmm_nt(cp11, cpst, cp11, cpst)
        p11, pst = r11 - s11, rst - sst
        L11, Lst, i1, i2, ld = wb.wchol(p11, pst)
        D = (L11, Lst, i1, i2)
        m11, mst = wb.wmm(cp11, cpst, w011_s[:], w0st_s[:])
        w011, w0st = wb.wsolve_lower(*D, m11, mst)
        w011, w0st = -w011, -w0st
        wprev = w_s[:]
        cv1, cv2 = wb.wmv(cp11, cpst, wprev[:8], wprev[8:])
        w1v, w2v = wb.wsolve_lower_vec(*D, y1 - cv1, y2 - cv2)
        c11, cst = cprev_from(D, o11, ost)
        cp11_s[:] = c11
        cpst_s[:] = cst
        w011_s[:] = w011
        w0st_s[:] = w0st
        w_s[:] = jnp.concatenate([w1v, w2v], axis=0)
        a11, ast = wb.wmm_tn(w011, w0st, w011, w0st)
        acc11_s[:] = acc11_s[:] + a11
        accst_s[:] = accst_s[:] + ast
        g1, g2 = wb.wmv_t(w011, w0st, w1v, w2v)
        accy0_s[:] = accy0_s[:] + jnp.concatenate([g1, g2], axis=0)
        stats_s[0, 0] = stats_s[0, 0] + jnp.sum(w1v * w1v) + jnp.sum(
            w2v * w2v)
        stats_s[0, 1] = stats_s[0, 1] + ld
        d11_ref[:] = L11
        dst_ref[:] = Lst
        invd_ref[:] = jnp.concatenate([i1, i2], axis=0)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        acc11_ref[:] = acc11_s[:]
        accst_ref[:] = accst_s[:]
        accy0_ref[:] = accy0_s[:]
        w011_ref[:] = w011_s[:]
        w0st_ref[:] = w0st_s[:]
        wl_ref[:] = w_s[:]
        ct = pl.program_id(0)
        stats_ref[ct, 0] = stats_s[0, 0]
        stats_ref[ct, 1] = stats_s[0, 1]


def _pad_chunks_wide(R11, Rst, O11, Ost, y_cm, ct):
    """Pad the chunk axis to a multiple of the kernel tile ``ct`` with
    identity-diagonal / zero chunks (exact; wide twin of
    `pallas_sweep._pad_chunks`).  Returns the padded arrays + true C."""
    s = R11.shape[0]
    e = Rst.shape[1] // 3
    d = 8 + e
    c = R11.shape[-1]
    cpad = -(-c // ct) * ct
    if cpad == c:
        return R11, Rst, O11, Ost, y_cm, c
    p = cpad - c
    eye8 = jnp.broadcast_to(
        jnp.eye(8, dtype=R11.dtype)[None, :, :, None], (s, 8, 8, p)
    )
    eye_e = jnp.concatenate([
        jnp.zeros((s, 2 * e, 8, p), dtype=R11.dtype),
        jnp.broadcast_to(
            jnp.eye(e, 8, dtype=R11.dtype)[None, :, :, None],
            (s, e, 8, p)),
    ], axis=1)
    R11 = jnp.concatenate([R11, eye8], axis=-1)
    Rst = jnp.concatenate([Rst, eye_e], axis=-1)
    O11 = jnp.concatenate(
        [O11, jnp.zeros((s, 8, 8, p), dtype=R11.dtype)], axis=-1)
    Ost = jnp.concatenate(
        [Ost, jnp.zeros((s, 3 * e, 8, p), dtype=R11.dtype)], axis=-1)
    y_cm = jnp.concatenate(
        [y_cm, jnp.zeros((s, d, p), dtype=R11.dtype)], axis=-1)
    return R11, Rst, O11, Ost, y_cm, c


@partial(jax.jit, static_argnames=("jitter",))
def forward_sweep_wide_pallas(R11: Array, Rst: Array, O11: Array,
                              Ost: Array, y_cm: Array,
                              jitter: float = 0.0):
    """Fused forward sweep on wide-layout chunk-major inputs.

    R11/O11: [s, 8, 8, C]; Rst/Ost: [s, 3e, 8, C]; y_cm: [s, d, C] with
    d = 8 + e.  Same contract as `pallas_sweep.forward_sweep_pallas`
    with the matrix outputs in wide form:
    (acc11, accst, accy0 [d, C], w011, w0st, w_last [d, C],
     d11, dst, invd [d, C], mh, ld), all sliced to the true C.
    """
    s = R11.shape[0]
    e = Rst.shape[1] // 3
    d = 8 + e
    ct = _ct_for(d)
    R11, Rst, O11, Ost, y_cm, c = _pad_chunks_wide(
        R11, Rst, O11, Ost, y_cm, ct)
    cpad = R11.shape[-1]
    nct = cpad // ct
    jit_arr = jnp.full((1, 1), jitter, dtype=R11.dtype)
    y3 = y_cm[:, :, None, :]

    def b11(idx):
        return pl.BlockSpec((1, 8, 8, ct), idx, memory_space=pltpu.VMEM)

    def bst(idx):
        return pl.BlockSpec((1, 3 * e, 8, ct), idx,
                            memory_space=pltpu.VMEM)

    step = lambda t, j: (j + 1, 0, 0, t)  # noqa: E731
    first = lambda t, j: (0, 0, 0, t)  # noqa: E731
    out11 = pl.BlockSpec((8, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    outst = pl.BlockSpec((3 * e, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    outv = pl.BlockSpec((d, 1, ct), lambda t, j: (0, 0, t),
                        memory_space=pltpu.VMEM)
    m11 = jax.ShapeDtypeStruct((8, 8, cpad), R11.dtype)
    mst = jax.ShapeDtypeStruct((3 * e, 8, cpad), R11.dtype)
    vec = jax.ShapeDtypeStruct((d, 1, cpad), R11.dtype)

    outs = pl.pallas_call(
        _wide_sweep_kernel,
        grid=(nct, s - 1),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
            b11(step), bst(step), b11(step), bst(step),
            b11(first), bst(first),
            pl.BlockSpec((1, d, 1, ct), lambda t, j: (j + 1, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out11, outst, outv, out11, outst, outv,
                   out11, outst, outv,
                   pl.BlockSpec((nct, 2), lambda t, j: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[m11, mst, vec, m11, mst, vec, m11, mst, vec,
                   jax.ShapeDtypeStruct((nct, 2), R11.dtype)],
        scratch_shapes=[
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((d, 1, ct), R11.dtype),
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((d, 1, ct), R11.dtype),
            pltpu.SMEM((1, 2), R11.dtype),
        ],
    )(jit_arr, R11, Rst, O11, Ost, O11, Ost, y3)
    (acc11, accst, accy0, w011, w0st, wl, d11, dst, invd, stats) = outs

    def cut(x):
        return x[..., :c]

    mh = jnp.sum(stats[:, 0])
    ld = jnp.sum(stats[:, 1])
    if cpad != c and jitter:
        from cyclic_gps_tpu.ops.pallas_sweep import _pad_jitter_ld

        ld = ld - _pad_jitter_ld(s, d, cpad - c, jitter, R11.dtype)
    return (cut(acc11), cut(accst), cut(accy0)[:, 0, :],
            cut(w011), cut(w0st), cut(wl)[:, 0, :],
            cut(d11), cut(dst), cut(invd)[:, 0, :], mh, ld)


# ---------------------------------------------------------------------------
# Forward sweep WITH per-step hat-factor collection + back-substitution:
# the wide solve path (twin of pallas_sweep's collect/backsub pair).
# ---------------------------------------------------------------------------


def _wide_collect_kernel(jit_ref, r11_ref, rst_ref, o11_ref, ost_ref,
                         o011_ref, o0st_ref, y_ref,
                         acc11_ref, accst_ref, accy0_ref,
                         w011_ref, w0st_ref, wl_ref,
                         d11_ref, dst_ref, invd_ref, stats_ref,
                         hc11_ref, hcst_ref, hw011_ref, hw0st_ref, hw_ref,
                         cp11_s, cpst_s, w011_s, w0st_s, w_s, acc11_s,
                         accst_s, accy0_s, stats_s):
    """`_wide_sweep_kernel` plus per-step 'hat' factors streamed to HBM:
    hat_C = D^{-T} C^T, hat_W0 = D^{-T} W0, hat_w = D^{-T} w (see
    partitioned._collect_solve)."""
    j = pl.program_id(1)
    e = rst_ref.shape[1] // 3
    dtype = r11_ref.dtype

    eye8 = r11_ref[0] * 0.0 + jnp.eye(8, dtype=dtype)[:, :, None]
    rows_e = jax.lax.broadcasted_iota(jnp.int32, (e, 1, 1), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    eye_e = rst_ref[0, :e] * 0.0 + (rows_e == cols8).astype(dtype)
    jit = jit_ref[0, 0]
    r11 = r11_ref[0] + jit * eye8
    rst = rst_ref[0] + jit * jnp.concatenate(
        [eye_e * 0.0, eye_e * 0.0, eye_e], axis=0
    )
    o11 = o11_ref[0]
    ost = ost_ref[0]
    y_j = y_ref[0]  # [d, 1, ct]
    y1, y2 = y_j[:8], y_j[8:]

    def couplings(D, o11_, ost_):
        """C_j = (L^{-1} O^T)^T and hat_C_j = D^{-T} (L^{-1} O^T)."""
        ot11, otst = wb.wtranspose(o11_, ost_)
        x11, xst = wb.wsolve_lower(*D, ot11, otst)
        h11, hst = wb.wsolve_lower_t(*D, x11, xst)
        c11, cst = wb.wtranspose(x11, xst)
        return c11, cst, h11, hst

    def emit(D, w011, w0st, w1v, w2v, c11, cst, h11, hst):
        cp11_s[:] = c11
        cpst_s[:] = cst
        w011_s[:] = w011
        w0st_s[:] = w0st
        w_s[:] = jnp.concatenate([w1v, w2v], axis=0)
        d11_ref[:] = D[0]
        dst_ref[:] = D[1]
        invd_ref[:] = jnp.concatenate([D[2], D[3]], axis=0)
        hc11_ref[0] = h11
        hcst_ref[0] = hst
        g11, gst = wb.wsolve_lower_t(*D, w011, w0st)
        hw011_ref[0] = g11
        hw0st_ref[0] = gst
        hv1, hv2 = wb.wsolve_lower_t_vec(*D, w1v, w2v)
        hw_ref[0] = jnp.concatenate([hv1, hv2], axis=0)

    @pl.when(j == 0)
    def _():
        L11, Lst, i1, i2, ld = wb.wchol(r11, rst)
        D = (L11, Lst, i1, i2)
        w011, w0st = wb.wsolve_lower(*D, o011_ref[0], o0st_ref[0])
        w1v, w2v = wb.wsolve_lower_vec(*D, y1, y2)
        c11, cst, h11, hst = couplings(D, o11, ost)
        a11, ast = wb.wmm_tn(w011, w0st, w011, w0st)
        acc11_s[:] = a11
        accst_s[:] = ast
        g1, g2 = wb.wmv_t(w011, w0st, w1v, w2v)
        accy0_s[:] = jnp.concatenate([g1, g2], axis=0)
        stats_s[0, 0] = jnp.sum(w1v * w1v) + jnp.sum(w2v * w2v)
        stats_s[0, 1] = ld
        emit(D, w011, w0st, w1v, w2v, c11, cst, h11, hst)

    @pl.when(j > 0)
    def _():
        cp11, cpst = cp11_s[:], cpst_s[:]
        s11, sst = wb.wmm_nt(cp11, cpst, cp11, cpst)
        p11, pst = r11 - s11, rst - sst
        L11, Lst, i1, i2, ld = wb.wchol(p11, pst)
        D = (L11, Lst, i1, i2)
        m11, mst = wb.wmm(cp11, cpst, w011_s[:], w0st_s[:])
        w011, w0st = wb.wsolve_lower(*D, m11, mst)
        w011, w0st = -w011, -w0st
        wprev = w_s[:]
        cv1, cv2 = wb.wmv(cp11, cpst, wprev[:8], wprev[8:])
        w1v, w2v = wb.wsolve_lower_vec(*D, y1 - cv1, y2 - cv2)
        c11, cst, h11, hst = couplings(D, o11, ost)
        a11, ast = wb.wmm_tn(w011, w0st, w011, w0st)
        acc11_s[:] = acc11_s[:] + a11
        accst_s[:] = accst_s[:] + ast
        g1, g2 = wb.wmv_t(w011, w0st, w1v, w2v)
        accy0_s[:] = accy0_s[:] + jnp.concatenate([g1, g2], axis=0)
        stats_s[0, 0] = stats_s[0, 0] + jnp.sum(w1v * w1v) + jnp.sum(
            w2v * w2v)
        stats_s[0, 1] = stats_s[0, 1] + ld
        emit(D, w011, w0st, w1v, w2v, c11, cst, h11, hst)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        acc11_ref[:] = acc11_s[:]
        accst_ref[:] = accst_s[:]
        accy0_ref[:] = accy0_s[:]
        w011_ref[:] = w011_s[:]
        w0st_ref[:] = w0st_s[:]
        wl_ref[:] = w_s[:]
        ct = pl.program_id(0)
        stats_ref[ct, 0] = stats_s[0, 0]
        stats_ref[ct, 1] = stats_s[0, 1]


@partial(jax.jit, static_argnames=("jitter",))
def forward_sweep_collect_wide_pallas(R11: Array, Rst: Array, O11: Array,
                                      Ost: Array, y_cm: Array,
                                      jitter: float = 0.0):
    """Wide forward sweep + hat-factor collection as one Pallas kernel.

    Returns the `forward_sweep_wide_pallas` tuple followed by the hat
    stacks (hc11 [s-1, 8, 8, cpad], hcst [s-1, 3e, 8, cpad], hw011,
    hw0st, hw [s-1, d, 1, cpad]) left in padded form (right-padded to
    the kernel tile multiple; padded chunks yield zero hats -> zero x
    rows), consumed as-is by `backward_substitute_wide_pallas`.
    """
    s = R11.shape[0]
    e = Rst.shape[1] // 3
    d = 8 + e
    ct = _ct_for(d)
    R11, Rst, O11, Ost, y_cm, c = _pad_chunks_wide(
        R11, Rst, O11, Ost, y_cm, ct)
    cpad = R11.shape[-1]
    nct = cpad // ct
    jit_arr = jnp.full((1, 1), jitter, dtype=R11.dtype)
    y3 = y_cm[:, :, None, :]

    def b11(idx):
        return pl.BlockSpec((1, 8, 8, ct), idx, memory_space=pltpu.VMEM)

    def bst(idx):
        return pl.BlockSpec((1, 3 * e, 8, ct), idx,
                            memory_space=pltpu.VMEM)

    step = lambda t, j: (j + 1, 0, 0, t)  # noqa: E731
    first = lambda t, j: (0, 0, 0, t)  # noqa: E731
    hat = lambda t, j: (j, 0, 0, t)  # noqa: E731
    out11 = pl.BlockSpec((8, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    outst = pl.BlockSpec((3 * e, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    outv = pl.BlockSpec((d, 1, ct), lambda t, j: (0, 0, t),
                        memory_space=pltpu.VMEM)
    m11 = jax.ShapeDtypeStruct((8, 8, cpad), R11.dtype)
    mst = jax.ShapeDtypeStruct((3 * e, 8, cpad), R11.dtype)
    vec = jax.ShapeDtypeStruct((d, 1, cpad), R11.dtype)
    s11 = jax.ShapeDtypeStruct((s - 1, 8, 8, cpad), R11.dtype)
    sst = jax.ShapeDtypeStruct((s - 1, 3 * e, 8, cpad), R11.dtype)
    svec = jax.ShapeDtypeStruct((s - 1, d, 1, cpad), R11.dtype)

    outs = pl.pallas_call(
        _wide_collect_kernel,
        grid=(nct, s - 1),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
            b11(step), bst(step), b11(step), bst(step),
            b11(first), bst(first),
            pl.BlockSpec((1, d, 1, ct), lambda t, j: (j + 1, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out11, outst, outv, out11, outst, outv,
                   out11, outst, outv,
                   pl.BlockSpec((nct, 2), lambda t, j: (0, 0),
                                memory_space=pltpu.SMEM),
                   b11(hat), bst(hat), b11(hat), bst(hat),
                   pl.BlockSpec((1, d, 1, ct), hat,
                                memory_space=pltpu.VMEM)],
        out_shape=[m11, mst, vec, m11, mst, vec, m11, mst, vec,
                   jax.ShapeDtypeStruct((nct, 2), R11.dtype),
                   s11, sst, s11, sst, svec],
        scratch_shapes=[
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((d, 1, ct), R11.dtype),
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((d, 1, ct), R11.dtype),
            pltpu.SMEM((1, 2), R11.dtype),
        ],
    )(jit_arr, R11, Rst, O11, Ost, O11, Ost, y3)
    (acc11, accst, accy0, w011, w0st, wl, d11, dst, invd, stats,
     hc11, hcst, hw011, hw0st, hw) = outs

    def cut(x):
        return x[..., :c]

    mh = jnp.sum(stats[:, 0])
    ld = jnp.sum(stats[:, 1])
    if cpad != c and jitter:
        from cyclic_gps_tpu.ops.pallas_sweep import _pad_jitter_ld

        ld = ld - _pad_jitter_ld(s, d, cpad - c, jitter, R11.dtype)
    return (cut(acc11), cut(accst), cut(accy0)[:, 0, :],
            cut(w011), cut(w0st), cut(wl)[:, 0, :],
            cut(d11), cut(dst), cut(invd)[:, 0, :], mh, ld,
            hc11, hcst, hw011, hw0st, hw)


def _wide_backsub_kernel(hc11_ref, hcst_ref, hw011_ref, hw0st_ref, hw_ref,
                         hw111_ref, hw1st_ref, xb_ref, xbn_ref,
                         x_ref, xnext_s):
    """One wide back-substitution step on a chunk tile (grid walks steps
    DESCENDING via the index maps; see pallas_sweep._backsub_kernel):

        x_{s-1} = hat_w - hat_W0 x_b - hat_W1 x_{b,next}
        x_j     = hat_w - hat_W0 x_b - hat_C x_{j+1}     (pure FMA)
    """
    j = pl.program_id(1)
    xb1, xb2 = xb_ref[:8], xb_ref[8:]
    h1, h2 = wb.wmv(hw011_ref[0], hw0st_ref[0], xb1, xb2)
    hw = hw_ref[0]
    c1 = hw[:8] - h1
    c2 = hw[8:] - h2

    @pl.when(j == 0)
    def _():
        g1, g2 = wb.wmv(hw111_ref[:], hw1st_ref[:], xbn_ref[:8],
                        xbn_ref[8:])
        x = jnp.concatenate([c1 - g1, c2 - g2], axis=0)
        x_ref[0] = x
        xnext_s[:] = x

    @pl.when(j > 0)
    def _():
        xn = xnext_s[:]
        g1, g2 = wb.wmv(hc11_ref[0], hcst_ref[0], xn[:8], xn[8:])
        x = jnp.concatenate([c1 - g1, c2 - g2], axis=0)
        x_ref[0] = x
        xnext_s[:] = x


@jax.jit
def backward_substitute_wide_pallas(hc11, hcst, hw011, hw0st, hw,
                                    hw111, hw1st, xb, xb_next):
    """Wide chunk-interior back-substitution: returns x rows
    [s-1, d, C] for interior steps j = 1..s-1.

    Hat stacks as produced by `forward_sweep_collect_wide_pallas`
    (kernel-tile padded); hw111/hw1st: hat_W1 in wide form [8, 8, C] /
    [3e, 8, C]; xb / xb_next: [d, C].  The C-sized inputs are padded to
    the stacks' width here.
    """
    sm1 = hc11.shape[0]
    e = hcst.shape[1] // 3
    d = 8 + e
    cpad = hc11.shape[-1]
    c = xb.shape[-1]
    ct = min(_ct_for(d), cpad)
    if cpad != c:
        p = cpad - c

        def padm(a):
            return jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (p,), dtype=a.dtype)], axis=-1
            )

        hw111, hw1st = padm(hw111), padm(hw1st)
        xb, xb_next = padm(xb), padm(xb_next)
    nct = cpad // ct
    s2 = sm1 - 1  # grid step j reads stacked row (s2 - j): descending
    desc11 = pl.BlockSpec((1, 8, 8, ct), lambda t, j: (s2 - j, 0, 0, t),
                          memory_space=pltpu.VMEM)
    descst = pl.BlockSpec((1, 3 * e, 8, ct),
                          lambda t, j: (s2 - j, 0, 0, t),
                          memory_space=pltpu.VMEM)
    descv = pl.BlockSpec((1, d, 1, ct), lambda t, j: (s2 - j, 0, 0, t),
                         memory_space=pltpu.VMEM)
    fix11 = pl.BlockSpec((8, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    fixst = pl.BlockSpec((3 * e, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    fixv = pl.BlockSpec((d, 1, ct), lambda t, j: (0, 0, t),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _wide_backsub_kernel,
        grid=(nct, sm1),
        in_specs=[desc11, descst, desc11, descst, descv,
                  fix11, fixst, fixv, fixv],
        out_specs=pl.BlockSpec((1, d, 1, ct),
                               lambda t, j: (s2 - j, 0, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sm1, d, 1, cpad), hc11.dtype),
        scratch_shapes=[pltpu.VMEM((d, 1, ct), hc11.dtype)],
    )(hc11, hcst, hw011, hw0st, hw,
      hw111, hw1st, xb[:, None, :], xb_next[:, None, :])
    return outs[:, :, 0, :c]


# ---------------------------------------------------------------------------
# Selected inversion, wide: forward raw-factor sweep + Takahashi backward
# (twin of pallas_sweep's forward_sweep_inverse / takahashi pair).
# ---------------------------------------------------------------------------


def _wide_inverse_collect_kernel(jit_ref, r11_ref, rst_ref, o11_ref,
                                 ost_ref, o011_ref, o0st_ref,
                                 acc11_ref, accst_ref, w011l_ref, w0stl_ref,
                                 d11l_ref, dstl_ref, invdl_ref,
                                 d11_ref, dst_ref, invd_ref,
                                 c11_ref, cst_ref, w011_ref, w0st_ref,
                                 cp11_s, cpst_s, w011_s, w0st_s,
                                 acc11_s, accst_s):
    """Wide forward elimination streaming the RAW per-step factors
    (D, invd, C, W0) needed by the Takahashi recursion (no RHS)."""
    j = pl.program_id(1)
    e = rst_ref.shape[1] // 3
    dtype = r11_ref.dtype

    eye8 = r11_ref[0] * 0.0 + jnp.eye(8, dtype=dtype)[:, :, None]
    rows_e = jax.lax.broadcasted_iota(jnp.int32, (e, 1, 1), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    eye_e = rst_ref[0, :e] * 0.0 + (rows_e == cols8).astype(dtype)
    jit = jit_ref[0, 0]
    r11 = r11_ref[0] + jit * eye8
    rst = rst_ref[0] + jit * jnp.concatenate(
        [eye_e * 0.0, eye_e * 0.0, eye_e], axis=0
    )
    o11 = o11_ref[0]
    ost = ost_ref[0]

    def emit(D, w011, w0st, c11, cst):
        cp11_s[:] = c11
        cpst_s[:] = cst
        w011_s[:] = w011
        w0st_s[:] = w0st
        d11l_ref[:] = D[0]
        dstl_ref[:] = D[1]
        invdl_ref[:] = jnp.concatenate([D[2], D[3]], axis=0)
        d11_ref[0] = D[0]
        dst_ref[0] = D[1]
        invd_ref[0] = jnp.concatenate([D[2], D[3]], axis=0)
        c11_ref[0] = c11
        cst_ref[0] = cst
        w011_ref[0] = w011
        w0st_ref[0] = w0st

    def cprev_from(D, o11_, ost_):
        ot11, otst = wb.wtranspose(o11_, ost_)
        x11, xst = wb.wsolve_lower(*D, ot11, otst)
        return wb.wtranspose(x11, xst)

    @pl.when(j == 0)
    def _():
        L11, Lst, i1, i2, _ = wb.wchol(r11, rst)
        D = (L11, Lst, i1, i2)
        w011, w0st = wb.wsolve_lower(*D, o011_ref[0], o0st_ref[0])
        c11, cst = cprev_from(D, o11, ost)
        a11, ast = wb.wmm_tn(w011, w0st, w011, w0st)
        acc11_s[:] = a11
        accst_s[:] = ast
        emit(D, w011, w0st, c11, cst)

    @pl.when(j > 0)
    def _():
        cp11, cpst = cp11_s[:], cpst_s[:]
        s11, sst = wb.wmm_nt(cp11, cpst, cp11, cpst)
        p11, pst = r11 - s11, rst - sst
        L11, Lst, i1, i2, _ = wb.wchol(p11, pst)
        D = (L11, Lst, i1, i2)
        m11, mst = wb.wmm(cp11, cpst, w011_s[:], w0st_s[:])
        w011, w0st = wb.wsolve_lower(*D, m11, mst)
        w011, w0st = -w011, -w0st
        c11, cst = cprev_from(D, o11, ost)
        a11, ast = wb.wmm_tn(w011, w0st, w011, w0st)
        acc11_s[:] = acc11_s[:] + a11
        accst_s[:] = accst_s[:] + ast
        emit(D, w011, w0st, c11, cst)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        acc11_ref[:] = acc11_s[:]
        accst_ref[:] = accst_s[:]
        w011l_ref[:] = w011_s[:]
        w0stl_ref[:] = w0st_s[:]


@partial(jax.jit, static_argnames=("jitter",))
def forward_sweep_inverse_wide_pallas(R11: Array, Rst: Array, O11: Array,
                                      Ost: Array, jitter: float = 0.0):
    """Wide forward sweep for the selected-inversion path: returns
    (acc11, accst, w011l, w0stl, d11l, dstl, invdl -- sliced to the true
    C -- and the per-step stacks d11s, dsts, invds, c11s, csts, w011s,
    w0sts, kernel-tile padded)."""
    s = R11.shape[0]
    e = Rst.shape[1] // 3
    d = 8 + e
    ct = _ct_for(d)
    y_dummy = jnp.zeros((s, d, R11.shape[-1]), dtype=R11.dtype)
    R11, Rst, O11, Ost, _, c = _pad_chunks_wide(
        R11, Rst, O11, Ost, y_dummy, ct)
    cpad = R11.shape[-1]
    nct = cpad // ct
    jit_arr = jnp.full((1, 1), jitter, dtype=R11.dtype)

    def b11(idx):
        return pl.BlockSpec((1, 8, 8, ct), idx, memory_space=pltpu.VMEM)

    def bst(idx):
        return pl.BlockSpec((1, 3 * e, 8, ct), idx,
                            memory_space=pltpu.VMEM)

    step = lambda t, j: (j + 1, 0, 0, t)  # noqa: E731
    first = lambda t, j: (0, 0, 0, t)  # noqa: E731
    hat = lambda t, j: (j, 0, 0, t)  # noqa: E731
    out11 = pl.BlockSpec((8, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    outst = pl.BlockSpec((3 * e, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    outv = pl.BlockSpec((d, 1, ct), lambda t, j: (0, 0, t),
                        memory_space=pltpu.VMEM)
    m11 = jax.ShapeDtypeStruct((8, 8, cpad), R11.dtype)
    mst = jax.ShapeDtypeStruct((3 * e, 8, cpad), R11.dtype)
    vec = jax.ShapeDtypeStruct((d, 1, cpad), R11.dtype)
    s11 = jax.ShapeDtypeStruct((s - 1, 8, 8, cpad), R11.dtype)
    sst = jax.ShapeDtypeStruct((s - 1, 3 * e, 8, cpad), R11.dtype)
    svec = jax.ShapeDtypeStruct((s - 1, d, 1, cpad), R11.dtype)

    outs = pl.pallas_call(
        _wide_inverse_collect_kernel,
        grid=(nct, s - 1),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
            b11(step), bst(step), b11(step), bst(step),
            b11(first), bst(first),
        ],
        out_specs=[out11, outst, out11, outst, out11, outst, outv,
                   b11(hat), bst(hat),
                   pl.BlockSpec((1, d, 1, ct), hat,
                                memory_space=pltpu.VMEM),
                   b11(hat), bst(hat), b11(hat), bst(hat)],
        out_shape=[m11, mst, m11, mst, m11, mst, vec,
                   s11, sst, svec, s11, sst, s11, sst],
        scratch_shapes=[
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
        ],
    )(jit_arr, R11, Rst, O11, Ost, O11, Ost)
    (acc11, accst, w011l, w0stl, d11l, dstl, invdl,
     d11s, dsts, invds, c11s, csts, w011s, w0sts) = outs

    def cut(x):
        return x[..., :c]

    return (cut(acc11), cut(accst), cut(w011l), cut(w0stl),
            cut(d11l), cut(dstl), cut(invdl)[:, 0, :],
            d11s, dsts, invds, c11s, csts, w011s, w0sts)


def _wide_takahashi_kernel(d11_ref, dst_ref, invd_ref, c11_ref, cst_ref,
                           w011_ref, w0st_ref,
                           p0011_ref, p00st_ref, p0111_ref, p01st_ref,
                           p1011_ref, p10st_ref, p1111_ref, p11st_ref,
                           phi11_ref, phist_ref, u011_ref, u0st_ref,
                           u111_ref, u1st_ref, a011_ref, a0st_ref,
                           a111_ref, a1st_ref,
                           diag11_ref, diagst_ref, off11_ref, offst_ref,
                           u0f11_ref, u0fst_ref, u1f11_ref, u1fst_ref,
                           phi11_s, phist_s, u011_s, u0st_s,
                           u111_s, u1st_s, a011_s, a0st_s, a111_s, a1st_s):
    """One wide Takahashi step on a chunk tile (grid walks steps
    DESCENDING; same recurrence as pallas_sweep._takahashi_kernel)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        phi11_s[:] = phi11_ref[:]
        phist_s[:] = phist_ref[:]
        u011_s[:] = u011_ref[:]
        u0st_s[:] = u0st_ref[:]
        u111_s[:] = u111_ref[:]
        u1st_s[:] = u1st_ref[:]
        a011_s[:] = a011_ref[:]
        a0st_s[:] = a0st_ref[:]
        a111_s[:] = a111_ref[:]
        a1st_s[:] = a1st_ref[:]

    e = dst_ref.shape[1] // 3
    dtype = d11_ref.dtype
    d11 = d11_ref[0]
    dst = dst_ref[0]
    invd = invd_ref[0]
    i1, i2 = invd[:8], invd[8:]
    D = (d11, dst, i1, i2)
    c11, cst = c11_ref[0], cst_ref[0]
    w011, w0st = w011_ref[0], w0st_ref[0]
    pn = (phi11_s[:], phist_s[:])
    u0n = (u011_s[:], u0st_s[:])
    u1n = (u111_s[:], u1st_s[:])

    # identity RHS anchored to kernel data (Mosaic constant-fold gotcha)
    eye11 = d11 * 0.0 + jnp.eye(8, dtype=dtype)[:, :, None]
    rows_e = jax.lax.broadcasted_iota(jnp.int32, (e, 1, 1), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    eye_e = dst[:e] * 0.0 + (rows_e == cols8).astype(dtype)
    eyest = jnp.concatenate([eye_e * 0.0, eye_e * 0.0, eye_e], axis=0)
    di = wb.wsolve_lower(*D, eye11, eyest)
    cd = wb.wmm(c11, cst, *di)
    po11, post = wb.wmm(*pn, *cd)
    po11, post = -po11, -post                       # Phi_{j+1, j}
    t11, tst = wb.wmm_tn(*cd, *pn)
    q11, qst = wb.wmm(t11, tst, *cd)
    g11, gst = wb.wmm_tn(*di, *di)
    phi11, phist = g11 + q11, gst + qst
    m11, mst = wb.wmm_tn(c11, cst, *u0n)
    u0_11, u0_st = wb.wsolve_lower_t(*D, w011 - m11, w0st - mst)
    m11, mst = wb.wmm_tn(c11, cst, *u1n)
    u1_11, u1_st = wb.wsolve_lower_t(*D, m11, mst)
    u1_11, u1_st = -u1_11, -u1_st
    x11, xst = wb.wmm_nt(p0011_ref[:], p00st_ref[:], u0_11, u0_st)
    y11, yst = wb.wmm_nt(p0111_ref[:], p01st_ref[:], u1_11, u1_st)
    a0_11, a0_st = x11 + y11, xst + yst
    x11, xst = wb.wmm_nt(p1011_ref[:], p10st_ref[:], u0_11, u0_st)
    y11, yst = wb.wmm_nt(p1111_ref[:], p11st_ref[:], u1_11, u1_st)
    a1_11, a1_st = x11 + y11, xst + yst
    x11, xst = wb.wmm(u0_11, u0_st, a0_11, a0_st)
    y11, yst = wb.wmm(u1_11, u1_st, a1_11, a1_st)
    diag11_ref[0] = phi11 + x11 + y11
    diagst_ref[0] = phist + xst + yst
    x11, xst = wb.wmm(*u0n, a0_11, a0_st)
    y11, yst = wb.wmm(*u1n, a1_11, a1_st)
    off11_ref[0] = po11 + x11 + y11
    offst_ref[0] = post + xst + yst

    phi11_s[:] = phi11
    phist_s[:] = phist
    u011_s[:] = u0_11
    u0st_s[:] = u0_st
    u111_s[:] = u1_11
    u1st_s[:] = u1_st
    a011_s[:] = a0_11
    a0st_s[:] = a0_st
    a111_s[:] = a1_11
    a1st_s[:] = a1_st

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        u0f11_ref[:] = u011_s[:]
        u0fst_ref[:] = u0st_s[:]
        u1f11_ref[:] = u111_s[:]
        u1fst_ref[:] = u1st_s[:]


@jax.jit
def takahashi_backward_wide_pallas(d11s, dsts, invds, c11s, csts,
                                   w011s, w0sts, wides):
    """Wide Takahashi recursion over interior steps j = s-2 .. 1.

    Stacks as produced by `forward_sweep_inverse_wide_pallas`
    (kernel-tile padded, rows 0..s-3 consumed descending).  ``wides`` is
    a tuple of 12 wide pairs padded to the same width:
    (p00, p01, p10, p11, phi0, u00, u10, a00, a10) -- the first nine as
    (a11, ast) pairs -- packed flat as 18 arrays.  Returns
    (diag11 [s-2, 8, 8, cpad], diagst, off11, offst, u0f pair, u1f pair).
    """
    sm1 = d11s.shape[0]
    e = dsts.shape[1] // 3
    d = 8 + e
    cpad = d11s.shape[-1]
    ct = min(_ct_for(d), cpad)
    nct = cpad // ct
    s3 = sm1 - 2  # grid step j reads stacked row (s3 - j): s-3 .. 0
    desc11 = pl.BlockSpec((1, 8, 8, ct), lambda t, j: (s3 - j, 0, 0, t),
                          memory_space=pltpu.VMEM)
    descst = pl.BlockSpec((1, 3 * e, 8, ct),
                          lambda t, j: (s3 - j, 0, 0, t),
                          memory_space=pltpu.VMEM)
    descv = pl.BlockSpec((1, d, 1, ct), lambda t, j: (s3 - j, 0, 0, t),
                         memory_space=pltpu.VMEM)
    fix11 = pl.BlockSpec((8, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    fixst = pl.BlockSpec((3 * e, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    s11 = jax.ShapeDtypeStruct((sm1 - 1, 8, 8, cpad), d11s.dtype)
    sst = jax.ShapeDtypeStruct((sm1 - 1, 3 * e, 8, cpad), d11s.dtype)
    m11 = jax.ShapeDtypeStruct((8, 8, cpad), d11s.dtype)
    mst = jax.ShapeDtypeStruct((3 * e, 8, cpad), d11s.dtype)
    fixed_specs = [fix11, fixst] * 9
    outs = pl.pallas_call(
        _wide_takahashi_kernel,
        grid=(nct, sm1 - 1),
        in_specs=[desc11, descst, descv, desc11, descst, desc11, descst]
        + fixed_specs,
        out_specs=[desc11, descst, desc11, descst,
                   fix11, fixst, fix11, fixst],
        out_shape=[s11, sst, s11, sst, m11, mst, m11, mst],
        scratch_shapes=(
            [pltpu.VMEM((8, 8, ct), d11s.dtype),
             pltpu.VMEM((3 * e, 8, ct), d11s.dtype)] * 5
        ),
    )(d11s, dsts, invds, c11s, csts, w011s, w0sts, *wides)
    return outs


# ---------------------------------------------------------------------------
# FUSED solve + selected inversion, wide (round 5, VERDICT r4 #1): the
# shared analytic-VJP backward for 8 < d < 16.  One wide collect sweep
# emits the solve hats PLUS pinv = P^{-1} (hat-form Takahashi needs no
# triangular ops), and ONE descending kernel runs back-substitution and
# the hat-form Takahashi walk together -- the wide twin of
# pallas_sweep.forward_sweep_solveinv_pallas /
# backward_solve_takahashi_pallas.  At d = 9 the plain kernels move and
# process 16/9 = 1.78x the useful data on ~6 matrix streams; here every
# stored stack is 8-aligned and every FMA fully packed.
# ---------------------------------------------------------------------------


def _ct_siw(d: int) -> int:
    """Chunk tile for the wide solveinv pair.  The descending kernel
    holds ~20 wide-pair buffers (stacks double-buffered + boundary
    inputs + scratch); 8-aligned panels are ~35-45% smaller than the
    plain [d, d, ct] blocks, so ct = 512 fits through d = 13 where the
    plain kernels halve at d >= 10 (measured rule, pallas_sweep)."""
    return 512 if d <= 13 else 256


def _wide_solveinv_kernel(jit_ref, r11_ref, rst_ref, o11_ref, ost_ref,
                          o011_ref, o0st_ref, y_ref,
                          acc11_ref, accst_ref, accy0_ref,
                          w011_ref, w0st_ref, wl_ref,
                          d11_ref, dst_ref, invd_ref, stats_ref,
                          hc11_ref, hcst_ref, hw011_ref, hw0st_ref, hw_ref,
                          pinv11_ref, pinvst_ref,
                          cp11_s, cpst_s, w011_s, w0st_s, w_s, acc11_s,
                          accst_s, accy0_s, stats_s):
    """`_wide_collect_kernel` emitting ONE extra per-step stack pair:
    pinv = P_j^{-1} = D^{-T} D^{-1}.  As in the plain solveinv kernel,
    the hats are built from the per-step triangular inverse
    di = D^{-1} (one wide inversion + three wide matmuls, replacing the
    collect kernel's three triangular solves), since pinv needs di
    anyway."""
    j = pl.program_id(1)
    e = rst_ref.shape[1] // 3
    dtype = r11_ref.dtype

    eye8 = r11_ref[0] * 0.0 + jnp.eye(8, dtype=dtype)[:, :, None]
    rows_e = jax.lax.broadcasted_iota(jnp.int32, (e, 1, 1), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    eye_e = rst_ref[0, :e] * 0.0 + (rows_e == cols8).astype(dtype)
    eyest = jnp.concatenate([eye_e * 0.0, eye_e * 0.0, eye_e], axis=0)
    jit = jit_ref[0, 0]
    r11 = r11_ref[0] + jit * eye8
    rst = rst_ref[0] + jit * jnp.concatenate(
        [eye_e * 0.0, eye_e * 0.0, eye_e], axis=0
    )
    o11 = o11_ref[0]
    ost = ost_ref[0]
    y_j = y_ref[0]  # [d, 1, ct]
    y1, y2 = y_j[:8], y_j[8:]

    def emit(D, w011, w0st, w1v, w2v, x11, xst):
        # x = L^{-1} O^T; the elimination carry is C_j = x^T
        c11, cst = wb.wtranspose(x11, xst)
        cp11_s[:] = c11
        cpst_s[:] = cst
        w011_s[:] = w011
        w0st_s[:] = w0st
        w_s[:] = jnp.concatenate([w1v, w2v], axis=0)
        d11_ref[:] = D[0]
        dst_ref[:] = D[1]
        invd_ref[:] = jnp.concatenate([D[2], D[3]], axis=0)
        di11, dist = wb.wsolve_lower(*D, eye8, eyest)
        h11, hst = wb.wmm_tn(di11, dist, x11, xst)
        hc11_ref[0] = h11
        hcst_ref[0] = hst
        g11, gst = wb.wmm_tn(di11, dist, w011, w0st)
        hw011_ref[0] = g11
        hw0st_ref[0] = gst
        hv1, hv2 = wb.wmv_t(di11, dist, w1v, w2v)
        hw_ref[0] = jnp.concatenate([hv1, hv2], axis=0)
        q11, qst = wb.wmm_tn(di11, dist, di11, dist)
        pinv11_ref[0] = q11
        pinvst_ref[0] = qst

    @pl.when(j == 0)
    def _():
        L11, Lst, i1, i2, ld = wb.wchol(r11, rst)
        D = (L11, Lst, i1, i2)
        w011, w0st = wb.wsolve_lower(*D, o011_ref[0], o0st_ref[0])
        w1v, w2v = wb.wsolve_lower_vec(*D, y1, y2)
        ot11, otst = wb.wtranspose(o11, ost)
        x11, xst = wb.wsolve_lower(*D, ot11, otst)
        a11, ast = wb.wmm_tn(w011, w0st, w011, w0st)
        acc11_s[:] = a11
        accst_s[:] = ast
        g1, g2 = wb.wmv_t(w011, w0st, w1v, w2v)
        accy0_s[:] = jnp.concatenate([g1, g2], axis=0)
        stats_s[0, 0] = jnp.sum(w1v * w1v) + jnp.sum(w2v * w2v)
        stats_s[0, 1] = ld
        emit(D, w011, w0st, w1v, w2v, x11, xst)

    @pl.when(j > 0)
    def _():
        cp11, cpst = cp11_s[:], cpst_s[:]
        s11, sst = wb.wmm_nt(cp11, cpst, cp11, cpst)
        p11, pst = r11 - s11, rst - sst
        L11, Lst, i1, i2, ld = wb.wchol(p11, pst)
        D = (L11, Lst, i1, i2)
        m11, mst = wb.wmm(cp11, cpst, w011_s[:], w0st_s[:])
        w011, w0st = wb.wsolve_lower(*D, m11, mst)
        w011, w0st = -w011, -w0st
        wprev = w_s[:]
        cv1, cv2 = wb.wmv(cp11, cpst, wprev[:8], wprev[8:])
        w1v, w2v = wb.wsolve_lower_vec(*D, y1 - cv1, y2 - cv2)
        ot11, otst = wb.wtranspose(o11, ost)
        x11, xst = wb.wsolve_lower(*D, ot11, otst)
        a11, ast = wb.wmm_tn(w011, w0st, w011, w0st)
        acc11_s[:] = acc11_s[:] + a11
        accst_s[:] = accst_s[:] + ast
        g1, g2 = wb.wmv_t(w011, w0st, w1v, w2v)
        accy0_s[:] = accy0_s[:] + jnp.concatenate([g1, g2], axis=0)
        stats_s[0, 0] = stats_s[0, 0] + jnp.sum(w1v * w1v) + jnp.sum(
            w2v * w2v)
        stats_s[0, 1] = stats_s[0, 1] + ld
        emit(D, w011, w0st, w1v, w2v, x11, xst)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        acc11_ref[:] = acc11_s[:]
        accst_ref[:] = accst_s[:]
        accy0_ref[:] = accy0_s[:]
        w011_ref[:] = w011_s[:]
        w0st_ref[:] = w0st_s[:]
        wl_ref[:] = w_s[:]
        ct = pl.program_id(0)
        stats_ref[ct, 0] = stats_s[0, 0]
        stats_ref[ct, 1] = stats_s[0, 1]


@partial(jax.jit, static_argnames=("jitter",))
def forward_sweep_solveinv_wide_pallas(R11: Array, Rst: Array, O11: Array,
                                       Ost: Array, y_cm: Array,
                                       jitter: float = 0.0):
    """Wide forward sweep collecting the SHARED backward stacks: the
    solve hats (hat_c, hat_w0, hat_w) plus pinv for the hat-form
    Takahashi walk.  Returns the `forward_sweep_collect_wide_pallas`
    tuple followed by the pinv stacks (pinv11 [s-1, 8, 8, cpad],
    pinvst [s-1, 3e, 8, cpad]); stacks stay kernel-tile padded
    (consumed as-is by `backward_solve_takahashi_wide_pallas`)."""
    s = R11.shape[0]
    e = Rst.shape[1] // 3
    d = 8 + e
    ct = _ct_siw(d)
    R11, Rst, O11, Ost, y_cm, c = _pad_chunks_wide(
        R11, Rst, O11, Ost, y_cm, ct)
    cpad = R11.shape[-1]
    nct = cpad // ct
    jit_arr = jnp.full((1, 1), jitter, dtype=R11.dtype)
    y3 = y_cm[:, :, None, :]

    def b11(idx):
        return pl.BlockSpec((1, 8, 8, ct), idx, memory_space=pltpu.VMEM)

    def bst(idx):
        return pl.BlockSpec((1, 3 * e, 8, ct), idx,
                            memory_space=pltpu.VMEM)

    step = lambda t, j: (j + 1, 0, 0, t)  # noqa: E731
    first = lambda t, j: (0, 0, 0, t)  # noqa: E731
    hat = lambda t, j: (j, 0, 0, t)  # noqa: E731
    out11 = pl.BlockSpec((8, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    outst = pl.BlockSpec((3 * e, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    outv = pl.BlockSpec((d, 1, ct), lambda t, j: (0, 0, t),
                        memory_space=pltpu.VMEM)
    m11 = jax.ShapeDtypeStruct((8, 8, cpad), R11.dtype)
    mst = jax.ShapeDtypeStruct((3 * e, 8, cpad), R11.dtype)
    vec = jax.ShapeDtypeStruct((d, 1, cpad), R11.dtype)
    s11 = jax.ShapeDtypeStruct((s - 1, 8, 8, cpad), R11.dtype)
    sst = jax.ShapeDtypeStruct((s - 1, 3 * e, 8, cpad), R11.dtype)
    svec = jax.ShapeDtypeStruct((s - 1, d, 1, cpad), R11.dtype)

    outs = pl.pallas_call(
        _wide_solveinv_kernel,
        grid=(nct, s - 1),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
            b11(step), bst(step), b11(step), bst(step),
            b11(first), bst(first),
            pl.BlockSpec((1, d, 1, ct), lambda t, j: (j + 1, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out11, outst, outv, out11, outst, outv,
                   out11, outst, outv,
                   pl.BlockSpec((nct, 2), lambda t, j: (0, 0),
                                memory_space=pltpu.SMEM),
                   b11(hat), bst(hat), b11(hat), bst(hat),
                   pl.BlockSpec((1, d, 1, ct), hat,
                                memory_space=pltpu.VMEM),
                   b11(hat), bst(hat)],
        out_shape=[m11, mst, vec, m11, mst, vec, m11, mst, vec,
                   jax.ShapeDtypeStruct((nct, 2), R11.dtype),
                   s11, sst, s11, sst, svec, s11, sst],
        scratch_shapes=[
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((d, 1, ct), R11.dtype),
            pltpu.VMEM((8, 8, ct), R11.dtype),
            pltpu.VMEM((3 * e, 8, ct), R11.dtype),
            pltpu.VMEM((d, 1, ct), R11.dtype),
            pltpu.SMEM((1, 2), R11.dtype),
        ],
    )(jit_arr, R11, Rst, O11, Ost, O11, Ost, y3)
    (acc11, accst, accy0, w011, w0st, wl, d11, dst, invd, stats,
     hc11, hcst, hw011, hw0st, hw, pinv11, pinvst) = outs

    def cut(x):
        return x[..., :c]

    mh = jnp.sum(stats[:, 0])
    ld = jnp.sum(stats[:, 1])
    if cpad != c and jitter:
        from cyclic_gps_tpu.ops.pallas_sweep import _pad_jitter_ld

        ld = ld - _pad_jitter_ld(s, d, cpad - c, jitter, R11.dtype)
    return (cut(acc11), cut(accst), cut(accy0)[:, 0, :],
            cut(w011), cut(w0st), cut(wl)[:, 0, :],
            cut(d11), cut(dst), cut(invd)[:, 0, :], mh, ld,
            hc11, hcst, hw011, hw0st, hw, pinv11, pinvst)


def _wide_backsolve_takahashi_kernel(
        hc11_ref, hcst_ref, hw011_ref, hw0st_ref, hw_ref,
        pinv11_ref, pinvst_ref,
        hw111_ref, hw1st_ref, xb_ref, xbn_ref,
        p0011_ref, p00st_ref, p0111_ref, p01st_ref,
        p1011_ref, p10st_ref, p1111_ref, p11st_ref,
        x_ref, diag11_ref, diagst_ref, off11_ref, offst_ref,
        u0f11_ref, u0fst_ref, u1f11_ref, u1fst_ref,
        xnext_s, phi11_s, phist_s, u011_s, u0st_s, u111_s, u1st_s):
    """Wide twin of pallas_sweep._backsolve_takahashi_kernel: ONE
    descending pass running the back-substitution AND the hat-form
    Takahashi recursion on the shared wide hat stacks (grid step j
    handles stack row sm1-1-j = elimination step s-1-j; the j = 0 step
    IS the s-1 seed).  All per-step algebra is plain wide matmuls --
    no triangular ops left."""
    j = pl.program_id(1)
    hc = (hc11_ref[0], hcst_ref[0])
    hw0 = (hw011_ref[0], hw0st_ref[0])
    pinv = (pinv11_ref[0], pinvst_ref[0])
    hw1 = (hw111_ref[:], hw1st_ref[:])
    p00 = (p0011_ref[:], p00st_ref[:])
    p01 = (p0111_ref[:], p01st_ref[:])
    p10 = (p1011_ref[:], p10st_ref[:])
    p11 = (p1111_ref[:], p11st_ref[:])
    hw = hw_ref[0]

    def mm(a, b):
        return wb.wmm(a[0], a[1], b[0], b[1])

    def tr(a):
        return wb.wtranspose(a[0], a[1])

    def add(a, b):
        return a[0] + b[0], a[1] + b[1]

    def sub(a, b):
        return a[0] - b[0], a[1] - b[1]

    def neg(a):
        return -a[0], -a[1]

    def mv(a, x1, x2):
        return wb.wmv(a[0], a[1], x1, x2)

    def sig_ut(u0, u1):
        ut0 = tr(u0)
        ut1 = tr(u1)
        a0 = add(mm(p00, ut0), mm(p01, ut1))
        a1 = add(mm(p10, ut0), mm(p11, ut1))
        return a0, a1

    h1, h2 = mv(hw0, xb_ref[:8], xb_ref[8:])
    c1 = hw[:8] - h1
    c2 = hw[8:] - h2

    @pl.when(j == 0)
    def _():
        # solve: last interior row (carries the W1 term, no x_{j+1})
        g1, g2 = mv(hw1, xbn_ref[:8], xbn_ref[8:])
        x = jnp.concatenate([c1 - g1, c2 - g2], axis=0)
        x_ref[0] = x
        xnext_s[:] = x
        # Takahashi seed at step s-1 + its output rows
        phi = pinv
        u0 = hw0
        u1 = hw1
        a0, a1 = sig_ut(u0, u1)
        dg = add(phi, add(mm(u0, a0), mm(u1, a1)))
        diag11_ref[0], diagst_ref[0] = dg
        off11_ref[0], offst_ref[0] = neg(a1)
        phi11_s[:], phist_s[:] = phi
        u011_s[:], u0st_s[:] = u0
        u111_s[:], u1st_s[:] = u1

    @pl.when(j > 0)
    def _():
        xn = xnext_s[:]
        g1, g2 = mv(hc, xn[:8], xn[8:])
        x = jnp.concatenate([c1 - g1, c2 - g2], axis=0)
        x_ref[0] = x
        xnext_s[:] = x
        phi_n = (phi11_s[:], phist_s[:])
        u0_n = (u011_s[:], u0st_s[:])
        u1_n = (u111_s[:], u1st_s[:])
        t = mm(phi_n, tr(hc))                  # phi_{j+1} hat_c^T
        phi_j = add(pinv, mm(hc, t))
        u0_j = sub(hw0, mm(hc, u0_n))
        u1_j = neg(mm(hc, u1_n))
        a0, a1 = sig_ut(u0_j, u1_j)
        dg = add(phi_j, add(mm(u0_j, a0), mm(u1_j, a1)))
        diag11_ref[0], diagst_ref[0] = dg
        of = add(neg(t), add(mm(u0_n, a0), mm(u1_n, a1)))
        off11_ref[0], offst_ref[0] = of
        phi11_s[:], phist_s[:] = phi_j
        u011_s[:], u0st_s[:] = u0_j
        u111_s[:], u1st_s[:] = u1_j

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        u0f11_ref[:] = u011_s[:]
        u0fst_ref[:] = u0st_s[:]
        u1f11_ref[:] = u111_s[:]
        u1fst_ref[:] = u1st_s[:]


@jax.jit
def backward_solve_takahashi_wide_pallas(hc11, hcst, hw011, hw0st, hw,
                                         pinv11, pinvst,
                                         hw1_11, hw1_st, xb, xb_next,
                                         p00, p01, p10, p11):
    """Fused wide back-substitution + hat-form Takahashi over the shared
    stacks (steps s-1 .. 1, descending).  Stacks as produced by
    `forward_sweep_solveinv_wide_pallas` (kernel-tile padded); the
    chunk-level inputs (hw1 pair, xb / xb_next [d, 1, C], and the
    reduced selected-inverse blocks p00..p11 as (a11, st) pairs) must be
    padded to the same width.  Returns
    (x rows [s-1, d, cpad] steps 1..s-1,
     diag pairs [s-1, ., ., cpad] = Sigma_jj steps 1..s-1,
     off pairs = Sigma_{j+1, j} rows 1..s-1 (the last is the right-edge
     block), u0_final pair, u1_final pair)."""
    sm1 = hc11.shape[0]
    e = hcst.shape[1] // 3
    d = 8 + e
    cpad = hc11.shape[-1]
    ct = min(_ct_siw(d), cpad)
    nct = cpad // ct
    s2 = sm1 - 1  # grid step j handles stack row (s2 - j): descending
    desc11 = pl.BlockSpec((1, 8, 8, ct), lambda t, j: (s2 - j, 0, 0, t),
                          memory_space=pltpu.VMEM)
    descst = pl.BlockSpec((1, 3 * e, 8, ct),
                          lambda t, j: (s2 - j, 0, 0, t),
                          memory_space=pltpu.VMEM)
    descv = pl.BlockSpec((1, d, 1, ct), lambda t, j: (s2 - j, 0, 0, t),
                         memory_space=pltpu.VMEM)
    fix11 = pl.BlockSpec((8, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    fixst = pl.BlockSpec((3 * e, 8, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM)
    fixv = pl.BlockSpec((d, 1, ct), lambda t, j: (0, 0, t),
                        memory_space=pltpu.VMEM)
    s11 = jax.ShapeDtypeStruct((sm1, 8, 8, cpad), hc11.dtype)
    sst = jax.ShapeDtypeStruct((sm1, 3 * e, 8, cpad), hc11.dtype)
    svec = jax.ShapeDtypeStruct((sm1, d, 1, cpad), hc11.dtype)
    m11 = jax.ShapeDtypeStruct((8, 8, cpad), hc11.dtype)
    mst = jax.ShapeDtypeStruct((3 * e, 8, cpad), hc11.dtype)
    outs = pl.pallas_call(
        _wide_backsolve_takahashi_kernel,
        grid=(nct, sm1),
        in_specs=[desc11, descst, desc11, descst, descv,
                  desc11, descst,
                  fix11, fixst, fixv, fixv,
                  fix11, fixst, fix11, fixst,
                  fix11, fixst, fix11, fixst],
        out_specs=[descv, desc11, descst, desc11, descst,
                   fix11, fixst, fix11, fixst],
        out_shape=[svec, s11, sst, s11, sst, m11, mst, m11, mst],
        scratch_shapes=[
            pltpu.VMEM((d, 1, ct), hc11.dtype),
            pltpu.VMEM((8, 8, ct), hc11.dtype),
            pltpu.VMEM((3 * e, 8, ct), hc11.dtype),
            pltpu.VMEM((8, 8, ct), hc11.dtype),
            pltpu.VMEM((3 * e, 8, ct), hc11.dtype),
            pltpu.VMEM((8, 8, ct), hc11.dtype),
            pltpu.VMEM((3 * e, 8, ct), hc11.dtype),
        ],
    )(hc11, hcst, hw011, hw0st, hw, pinv11, pinvst,
      hw1_11, hw1_st, xb[:, None, :], xb_next[:, None, :],
      p00[0], p00[1], p01[0], p01[1], p10[0], p10[1], p11[0], p11[1])
    x_rows, dg11, dgst, of11, ofst, u0f11, u0fst, u1f11, u1fst = outs
    return (x_rows[:, :, 0, :], (dg11, dgst), (of11, ofst),
            (u0f11, u0fst), (u1f11, u1fst))
