"""Pallas TPU kernel for the partitioned-engine forward sweep.

One kernel executes the whole chunk-interior elimination: the grid runs
sequentially over the s-1 in-chunk steps (TPU grid steps execute in order
on a core), the carried per-chunk state (C_j, W0_j, w_j, accumulators)
lives in VMEM scratch that persists across grid steps, and each step's
[d, d, C] block slices stream in with Pallas' automatic double-buffered
pipelining.  HBM traffic is exactly one read of the data -- no scan-state
spills.

The XLA `lax.scan` path (ops/partitioned.py) is already near this
device's bandwidth floor, so this kernel is primarily about (a) removing
the scan's state-passing overhead on real hardware and (b) providing the
fused in-VMEM form that the (v5p-class) roofline wants.  It is
forward-only (training uses the differentiable scan path).

Block math uses kernel-local helpers written in Mosaic's supported
subset: basic slices only (no integer/None advanced indexing, no stack/
concatenate), one-hot numpy constants instead of dynamic masks.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _swap(a):
    return jnp.swapaxes(a, 0, 1)


def _mm(a, b, ta=False, tb=False):
    """[d, p, C] @ [p, e, C] -> [d, e, C] with basic slices only."""
    if ta:
        a = _swap(a)
    if tb:
        b = _swap(b)
    p = a.shape[1]
    acc = a[:, 0:1, :] * b[0:1, :, :]
    for k in range(1, p):
        acc = acc + a[:, k:k + 1, :] * b[k:k + 1, :, :]
    return acc


def _chol(a):
    """Lower Cholesky of [d, d, C]; returns (L, inv_diag [d, 1, C],
    sum log diag -> scalar)."""
    d = a.shape[0]
    x = a
    L = jnp.zeros_like(a)
    invd = jnp.zeros_like(a[:, 0:1, :])
    ldsum = jnp.zeros((), dtype=a.dtype)
    for j in range(d):
        piv = x[j:j + 1, j:j + 1, :]  # [1, 1, C]
        piv_inv = jax.lax.rsqrt(piv)
        rows = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
        mask = (rows >= j).astype(a.dtype)
        col = x[:, j:j + 1, :] * piv_inv * mask  # [d, 1, C]
        onehot_row = (rows == j).astype(a.dtype)  # [d, 1, 1]
        onehot_col = jnp.swapaxes(onehot_row, 0, 1)  # [1, d, 1]
        L = L + onehot_col * col
        invd = invd + onehot_row * piv_inv
        ldsum = ldsum + 0.5 * jnp.sum(jnp.log(piv))
        if j + 1 < d:
            x = x - col * _swap(col)
    return L, invd, ldsum


def _solve_lower(L, invd, y):
    """L X = Y, Y [d, e, C]."""
    d = L.shape[0]
    res = y
    x = jnp.zeros_like(y)
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    for i in range(d):
        xi = res[i:i + 1, :, :] * invd[i:i + 1, :, :]
        onehot = (rows == i).astype(y.dtype)
        x = x + onehot * xi
        if i + 1 < d:
            res = res - L[:, i:i + 1, :] * xi
    return x


def _sweep_kernel(r_ref, o_ref, o0_ref, y_ref,
                  acc00_ref, accy0_ref, w0l_ref, wl_ref, dl_ref, invdl_ref,
                  stats_ref,
                  cprev_s, w0_s, w_s, acc00_s, accy0_s, stats_s):
    j = pl.program_id(1)
    r_j = r_ref[0]
    o_j = o_ref[0]
    y_j = y_ref[0]  # [d, 1, C]

    @pl.when(j == 0)
    def _():
        D, invd, ld = _chol(r_j)
        w0 = _solve_lower(D, invd, o0_ref[0])
        w = _solve_lower(D, invd, y_j)
        cprev_s[:] = _swap(_solve_lower(D, invd, _swap(o_j)))
        w0_s[:] = w0
        w_s[:] = w
        acc00_s[:] = _mm(w0, w0, ta=True)
        accy0_s[:] = _mm(w0, w, ta=True)
        stats_s[0, 0] = jnp.sum(w * w)
        stats_s[0, 1] = ld
        dl_ref[:] = D
        invdl_ref[:] = invd

    @pl.when(j > 0)
    def _():
        cp = cprev_s[:]
        p = r_j - _mm(cp, cp, tb=True)
        D, invd, ld = _chol(p)
        w0 = -_solve_lower(D, invd, _mm(cp, w0_s[:]))
        w = _solve_lower(D, invd, y_j - _mm(cp, w_s[:]))
        cprev_s[:] = _swap(_solve_lower(D, invd, _swap(o_j)))
        w0_s[:] = w0
        w_s[:] = w
        acc00_s[:] = acc00_s[:] + _mm(w0, w0, ta=True)
        accy0_s[:] = accy0_s[:] + _mm(w0, w, ta=True)
        stats_s[0, 0] = stats_s[0, 0] + jnp.sum(w * w)
        stats_s[0, 1] = stats_s[0, 1] + ld
        dl_ref[:] = D
        invdl_ref[:] = invd

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        acc00_ref[:] = acc00_s[:]
        accy0_ref[:] = accy0_s[:]
        w0l_ref[:] = w0_s[:]
        wl_ref[:] = w_s[:]
        ct = pl.program_id(0)
        stats_ref[ct, 0] = stats_s[0, 0]
        stats_ref[ct, 1] = stats_s[0, 1]


@jax.jit
def forward_sweep_pallas(R_cm: Array, O_cm: Array, y_cm: Array):
    """Fused forward sweep on chunk-major inputs (see
    partitioned._forward_sweep, collect=False).

    Returns (acc00 [d,d,C], accy0 [d,C], w0_last [d,d,C], w_last [d,C],
    d_last [d,d,C], invd_last [d,C], mh, ld) -- everything the reduced
    system and W1 assembly need.
    """
    s, d, _, c = R_cm.shape
    # tile the chunk axis so per-tile state + pipelined inputs fit VMEM
    ct = 1024
    while c % ct and ct > 128:
        ct //= 2
    if c % ct:
        ct = c  # fall back to one tile for awkward sizes
    nct = c // ct
    y3 = y_cm[:, :, None, :]  # vectors as [s, d, 1, C]
    mat = jax.ShapeDtypeStruct((d, d, c), R_cm.dtype)
    vec = jax.ShapeDtypeStruct((d, 1, c), R_cm.dtype)
    outs = pl.pallas_call(
        _sweep_kernel,
        grid=(nct, s - 1),
        in_specs=[
            pl.BlockSpec((1, d, d, ct), lambda t, j: (j + 1, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d, ct), lambda t, j: (j + 1, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d, ct), lambda t, j: (0, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, 1, ct), lambda t, j: (j + 1, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, d, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1, ct), lambda t, j: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nct, 2), lambda t, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[mat, vec, mat, vec, mat, vec,
                   jax.ShapeDtypeStruct((nct, 2), R_cm.dtype)],
        scratch_shapes=[
            pltpu.VMEM((d, d, ct), R_cm.dtype),
            pltpu.VMEM((d, d, ct), R_cm.dtype),
            pltpu.VMEM((d, 1, ct), R_cm.dtype),
            pltpu.VMEM((d, d, ct), R_cm.dtype),
            pltpu.VMEM((d, 1, ct), R_cm.dtype),
            pltpu.SMEM((1, 2), R_cm.dtype),
        ],
    )(R_cm, O_cm, O_cm, y3)
    acc00, accy0, w0l, wl, dl, invdl, stats = outs
    return (acc00, accy0[:, 0], w0l, wl[:, 0], dl, invdl[:, 0],
            jnp.sum(stats[:, 0]), jnp.sum(stats[:, 1]))
