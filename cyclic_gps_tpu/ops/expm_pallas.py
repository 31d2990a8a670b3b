"""Pallas TPU kernel for the LEG gap -> (transition, noise) map.

`leg.transition_and_noise_em` is the dominant cost of the IRREGULAR-grid
likelihood: the XLA Pade-13 pipeline on the [2r, 2r, N] Van Loan batch
keeps ~10 matrix-sized intermediates live, which XLA cannot fuse into one
kernel -- every Pade term round-trips HBM (~10 GB of traffic at
N = 1e6, r = 5; measured 140 ms for the augmented expm alone).  This
kernel computes the whole hybrid construction per lane tile in VMEM:

    e = expm(-0.5 d G)                   (scaling-and-squaring Pade-13)
    Q = I - e e^T  stably:
        |dG|/2 < 1:  Van Loan augmented expm on the CLAMPED gap
                     (no squaring needed: the clamp bounds the norm)
        else:        direct I - e e^T    (no cancellation for large gaps)

HBM traffic becomes: read dt [N] + write (e, q) [2 r^2 N] -- the
output floor.  Differentiability comes from a custom VJP in
models/leg.py that replays the XLA path's adjoint.

The math helpers are shared with ops/pallas_sweep.py (same Mosaic
dialect rules; see that module's docstring for the constant-anchoring
gotcha).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cyclic_gps_tpu.ops.pallas_sweep import _mm, _swap

Array = jnp.ndarray

_PADE13 = (
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0, 670442572800.0,
    33522128640.0, 1323241920.0, 40840800.0, 960960.0, 16380.0, 182.0, 1.0,
)
_THETA13 = 5.371920351148152
_MAXSQ = 40  # safety cap on the (dynamic) in-kernel squaring loop


def _lu_solve_k(a, b):
    """A X = B by unpivoted Gaussian elimination, a [d, d, C], b
    [d, e, C].  For the Pade denominator (well-conditioned by
    construction)."""
    d = a.shape[0]
    m = a
    rhs = b
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, d, 1), 1)
    for j in range(d):
        piv_inv = 1.0 / m[j:j + 1, j:j + 1, :]
        f = m[:, j:j + 1, :] * piv_inv * (rows > j).astype(a.dtype)
        m = m - f * m[j:j + 1, :, :]
        rhs = rhs - f * rhs[j:j + 1, :, :]
    x = jnp.zeros_like(rhs)
    for i in reversed(range(d)):
        m_row = m[i:i + 1, :, :] * (cols > i).astype(a.dtype)
        acc = rhs[i:i + 1, :, :] - _mm(m_row, x)
        xi = acc * (1.0 / m[i:i + 1, i:i + 1, :])
        x = x + (rows == i).astype(a.dtype) * xi
    return x


def _pade13_k(a, eye):
    """expm via the degree-13 Pade approximant (NO scaling/squaring --
    the caller guarantees/applies scaling).  a, eye: [d, d, C]."""
    b = _PADE13
    a2 = _mm(a, a)
    a4 = _mm(a2, a2)
    a6 = _mm(a2, a4)
    w1 = b[13] * a6 + b[11] * a4 + b[9] * a2
    w2 = b[7] * a6 + b[5] * a4 + b[3] * a2 + b[1] * eye
    u = _mm(a, _mm(a6, w1) + w2)
    z1 = b[12] * a6 + b[10] * a4 + b[8] * a2
    v = _mm(a6, z1) + b[6] * a6 + b[4] * a4 + b[2] * a2 + b[0] * eye
    return _lu_solve_k(v - u, v + u)


def _tn_kernel(half_ref, smax_ref, g_ref, gaug_ref, dt_ref, e_ref, q_ref):
    """One lane tile: dt [1, nt] -> e, q [r, r, nt]."""
    r = g_ref.shape[0]
    dtype = g_ref.dtype
    half = half_ref[0, 0]  # max-abs-row-sum of -G/2
    dt = dt_ref[0]  # [nt]
    dt3 = dt[None, None, :]

    # anchored identities (constant-only operands through the masked
    # sweeps crash Mosaic's layout pass -- see pallas_sweep)
    eye_r = g_ref[:] * 0.0 + jnp.eye(r, dtype=dtype)[:, :, None]
    eye_a = gaug_ref[:] * 0.0 + jnp.eye(2 * r, dtype=dtype)[:, :, None]

    # --- direct branch: e = expm(-0.5 dt G), scaling and squaring ---
    a = g_ref[:] * (-0.5) * dt3  # [r, r, nt]
    nrm = jnp.max(jnp.sum(jnp.abs(a), axis=1), axis=0)  # [nt]
    s = jnp.ceil(
        jnp.log2(jnp.maximum(nrm / _THETA13, 1.0))
    )
    s = jnp.clip(s, 0.0, float(_MAXSQ))
    a_s = a * jnp.exp2(-s)[None, None, :]
    e0 = _pade13_k(a_s, eye_r)

    # masked squaring, DYNAMIC trip count = the batch's max squaring
    # need (XLA-side scalar): typical LEG gaps need 0-3 rounds, so the
    # loop usually costs nothing
    def sq_body(k, e_c):
        do = (s > k.astype(dtype)).astype(dtype)[None, None, :]
        return do * _mm(e_c, e_c) + (1.0 - do) * e_c

    e = jax.lax.fori_loop(0, smax_ref[0, 0], sq_body, e0)

    # --- Van Loan branch on the clamped gap (norm < 1: no squaring) ---
    tn = dt * half
    small = (tn < 1.0)
    d_cl = jnp.where(small, dt, 1.0 / half)[None, None, :]
    m = gaug_ref[:] * d_cl  # [2r, 2r, nt]
    big = _pade13_k(m, eye_a)
    e_vl = big[:r, :r, :]
    p_vl = big[:r, r:, :]
    q_vl = _mm(p_vl, e_vl, tb=True)

    # --- direct Q (large gaps: no cancellation) ---
    q_dir = eye_r - _mm(e, e, tb=True)

    mask = small.astype(dtype)[None, None, :]
    q = mask * q_vl + (1.0 - mask) * q_dir
    q = 0.5 * (q + _swap(q))
    e_ref[:] = e
    q_ref[:] = q


def _tile_for_rank(r: int) -> int:
    if 2 * r <= 12:
        return 512
    if 2 * r <= 20:
        return 256
    return 128


@jax.jit
def transition_and_noise_pallas(g: Array, diffs: Array):
    """Fused (e, Q) construction on TPU: returns element-major
    (e [r, r, N], q [r, r, N]).  Matches `leg.transition_and_noise_em`
    (forward values; the caller supplies the VJP)."""
    r = g.shape[0]
    n = diffs.shape[0]
    nt = _tile_for_rank(r)
    npad = -(-n // nt) * nt
    dt = diffs
    if npad != n:
        dt = jnp.concatenate(
            [dt, jnp.ones((npad - n,), dtype=dt.dtype)]
        )
    a_half = -0.5 * g
    half_norm = jnp.max(jnp.sum(jnp.abs(a_half), axis=1))
    s_mat = 0.5 * (g + g.T)
    top = jnp.concatenate([a_half, s_mat], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(g), -a_half.T], axis=-1)
    gaug = jnp.concatenate([top, bot], axis=-2)  # [2r, 2r]

    # batch max squaring count (drives the kernel's dynamic loop)
    smax = jnp.ceil(
        jnp.log2(jnp.maximum(jnp.max(dt) * half_norm / _THETA13, 1.0))
    )
    smax = jnp.clip(smax, 0.0, float(_MAXSQ)).astype(jnp.int32)

    out = pl.pallas_call(
        _tn_kernel,
        grid=(npad // nt,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((r, r, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * r, 2 * r, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, r, nt), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, r, nt), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((r, r, npad), g.dtype)] * 2,
    )(half_norm.reshape(1, 1), smax.reshape(1, 1), g[:, :, None],
      gaug[:, :, None], dt[None, :])
    e, q = out
    return e[:, :, :n], q[:, :, :n]
