"""Partitioned block-Thomas engine for SPD block-tridiagonal systems.

The second (and faster) of the two solver engines in this framework, used
for the large-N hot paths.  Where cyclic reduction (ops/cyclic_reduction.py)
unrolls log2(N) halving levels -- O(log N) XLA program size and ~2x the
memory traffic of a single streaming pass -- this engine uses classic
domain decomposition:

  * the chain of N blocks is cut into C chunks of s blocks; chunk
    boundaries (every s-th block) are kept, interiors are eliminated;
  * all C interiors are eliminated *simultaneously*: one `lax.scan` over
    the s-1 interior positions with the huge chunk axis C vectorised on
    the VPU lanes (arrays are stored "chunk-major": [step, d, d, C]);
  * the Schur complement onto the boundaries is again block-tridiagonal
    with C blocks and is finished by the cyclic-reduction engine.

Consequences: a single streaming pass over the data (bandwidth-optimal),
an O(1)-size scan body (compiles in seconds regardless of N), autodiff
through `lax.scan` for free, and chunk boundaries that align naturally
with sequence sharding.

Math (standard 2x2 block elimination): order unknowns [interiors; bnd].
J = [[A, Bc], [Bc^T, S]] with A block-diagonal per chunk (tridiagonal
chains).  Per chain, with block-Cholesky factors D_j (diagonal) and
C_j = O_j D_j^{-T} (subdiagonal):
  W0_j = row j of L^{-1} (coupling column to the LEFT boundary):
         W0_1 = D_1^{-1} O_left;  W0_j = -D_j^{-1} C_{j-1} W0_{j-1},
  W1   = D_{s-1}^{-1} O_right^T  (right coupling touches only row s-1),
  w_j  = D_j^{-1} (y_j - C_{j-1} w_{j-1}).
Reduced system over the C boundary blocks:
  diag_c = R_{cs} - sum_j W0_j^T W0_j           (own chain, left side)
                  - (W1^T W1)_{chain c-1}       (left neighbour's chain),
  off_c  = -(W1^T W0_{s-1})_{chain c}           (= reduced J[b_{c+1}, b_c]),
  rhs_c  = y_{cs} - sum_j W0_j^T w_j - (W1^T w_{s-1})_{chain c-1}.
log|J| = 2 sum log diag D + log|reduced|;  y^T J^{-1} y = sum ||w||^2 +
mahal(reduced, rhs).  Back-substitution for J^{-1} y:
  x_{b} from the reduced solve, then per chain (j = s-1 .. 1):
  x_j = D_j^{-T} (w_j - W0_j x_{b_c} - [j = s-1] W1 x_{b_{c+1}}
                      - [j < s-1] C_j^T x_{j+1}).

Everything reuses the element-major small-block ops (ops/smallblock.py)
with batch = C.  The trailing-zero off-diagonal invariant (zero coupling
past the end of the real data) makes padding exact, as in the CR engine:
the last chunk's right coupling O_cm[s-1, :, :, C-1] is the padded zero
slot, so W1 vanishes there and the reduced system keeps the invariant.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import cyclic_reduction as cr
from . import smallblock as sb

Array = jnp.ndarray


def default_chunk_len(n: int) -> int:
    """Pick s so the scan depth and the reduced system are balanced."""
    if n < 32768:
        return 32
    return 128


_TERMINAL = 64  # below this, finish with cyclic reduction (tiny program)


def _chunk_layout(diag: Array, off: Array, y: Optional[Array], s: int):
    """Natural [N, d, d] blocks -> chunk-major element-major arrays.

    Returns (R_cm [s, d, d, C], O_cm [s, d, d, C], y_cm [s, d, C] | None,
    C).  Index i = c*s + j lives at [j, ..., c].  Padding blocks are
    identity (diag) / zero (off, y) -- exact for logdet / mahal / solve.
    """
    n, d, _ = diag.shape
    c = -(-n // s)
    m = c * s
    if m > n:
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=diag.dtype)[None], (m - n, d, d)
        )
        diag = jnp.concatenate([diag, eye], axis=0)
    off = jnp.concatenate(
        [off, jnp.zeros((m - n + 1, d, d), dtype=diag.dtype)], axis=0
    )
    R_cm = jnp.transpose(diag.reshape(c, s, d, d), (1, 2, 3, 0))
    O_cm = jnp.transpose(off.reshape(c, s, d, d), (1, 2, 3, 0))
    y_cm = None
    if y is not None:
        if m > n:
            y = jnp.concatenate(
                [y, jnp.zeros((m - n, d), dtype=y.dtype)], axis=0
            )
        y_cm = jnp.transpose(y.reshape(c, s, d), (1, 2, 0))
    return R_cm, O_cm, y_cm, c


class _SweepState(NamedTuple):
    c_prev: Array  # [d, d, C]  C_j after step j
    w0: Array  # [d, d, C]  W0_j
    w: Array  # [d, C]     w_j
    dj: Array  # [d, d, C]  D_j
    invd: Array  # [d, C]
    acc00: Array  # [d, d, C]  running sum W0^T W0
    accy0: Array  # [d, C]     running sum W0^T w
    mh: Array  # []         running sum ||w||^2
    ld: Array  # []         running sum log diag D


def _step(state: Optional[_SweepState], R_j, O_j, y_j, O_left, jitter):
    """One elimination step.  ``state is None`` marks j = 1 (no previous
    coupling; W0 seeded from the left-boundary coupling O_left)."""
    if state is None:
        P = R_j
    else:
        P = R_j - sb.matmul(state.c_prev, state.c_prev, tb=True)
    D, invd = sb.cholesky(P, jitter=jitter)
    if state is None:
        w0 = sb.solve_lower(D, invd, O_left)
        w = sb.solve_lower_vec(D, invd, y_j)
        acc00 = sb.matmul(w0, w0, ta=True)
        accy0 = sb.matvec(w0, w, ta=True)
        mh = jnp.sum(w * w)
        ld = sb.chol_log_diag_sum(D)
    else:
        w0 = -sb.solve_lower(D, invd, sb.matmul(state.c_prev, state.w0))
        w = sb.solve_lower_vec(
            D, invd, y_j - sb.matvec(state.c_prev, state.w)
        )
        acc00 = state.acc00 + sb.matmul(w0, w0, ta=True)
        accy0 = state.accy0 + sb.matvec(w0, w, ta=True)
        mh = state.mh + jnp.sum(w * w)
        ld = state.ld + sb.chol_log_diag_sum(D)
    c_new = sb.transpose(sb.solve_lower(D, invd, sb.transpose(O_j)))
    return _SweepState(c_new, w0, w, D, invd, acc00, accy0, mh, ld)


def _flat(a):
    """Identity hook for the per-step collected tensors.

    (Measured: flattening to [d*e*C] to dodge the stacked buffer's
    d -> 8 sublane padding makes things WORSE on TPU -- the per-step
    relayout costs more than the padding saves, and the extra reshapes
    blow up the compiled program.  Keep the natural [d, e, C] layout.)"""
    return a


def _collect_solve(state: _SweepState):
    """Per-step back-substitution factors, in 'hat' form so the backward
    scan is pure fused-multiply-add (no triangular solves):

      x_j = hat_w_j - hat_W0_j x_b - hat_C_j x_{j+1}

    with hat_C_j = D_j^{-T} C_j^T (= P_j^{-1} O_j^T), hat_W0_j =
    D_j^{-T} W0_j, hat_w_j = D_j^{-T} w_j.  55 floats/block vs the naive
    (D, invd, C, W0, w) = 85; the dominant HBM cost of the solve path.
    """
    hat_c = sb.solve_lower_t(state.dj, state.invd, sb.transpose(state.c_prev))
    hat_w0 = sb.solve_lower_t(state.dj, state.invd, state.w0)
    hat_w = sb.solve_lower_t_vec(state.dj, state.invd, state.w)
    return _flat(hat_c), _flat(hat_w0), _flat(hat_w)


def _collect_inverse(state: _SweepState):
    """Per-step factors for selected inversion (D, invd, C, W0)."""
    return (_flat(state.dj), _flat(state.invd), _flat(state.c_prev),
            _flat(state.w0))


def _collect_ldrows(state: _SweepState):
    """Per-step per-chunk pivot log-determinants 2 log|D_j| ([C] per
    step) -- the per-row decomposition of the sweep's logdet
    contribution (see `logdet_rows`)."""
    return 2.0 * sb.chol_log_diag_rows(state.dj)


def _collect_solve_ldrows(state: _SweepState):
    """Hat back-substitution factors AND the per-row pivot log-dets from
    the same step (the fused solve + per-row-logdet sweep,
    `solve_and_ld_rows_cm`)."""
    return _collect_solve(state) + (_collect_ldrows(state),)


def _collect_solve_inverse(state: _SweepState):
    """Hat back-substitution factors AND the hat-form Takahashi input
    from the same step: (hat_c, hat_w0, hat_w, pinv) with pinv =
    P_j^{-1} = D_j^{-T} D_j^{-1}.  The Takahashi recursion rewritten in
    hat variables (`_takahashi_hat_walk`) consumes exactly (hat_c,
    hat_w0, pinv), so ONE collect sweep serves BOTH halves of every
    analytic VJP backward -- the solve and the selected inversion --
    where the round-4 backward ran two full elimination sweeps
    (`_solve_from_cm` + `_inverse_from_cm`)."""
    di = sb.tri_lower_inverse(state.dj, state.invd)
    pinv = sb.matmul(di, di, ta=True)
    return _collect_solve(state) + (_flat(pinv),)


def _collect_solve_inverse_ld(state: _SweepState):
    """`_collect_solve_inverse` plus the per-row pivot log-dets (the
    fused backward of `solve_and_ld_rows_cm`)."""
    return _collect_solve_inverse(state) + (_collect_ldrows(state),)


_COLLECTORS = {"solve": _collect_solve, "inverse": _collect_inverse,
               "ldrows": _collect_ldrows,
               "solve_ldrows": _collect_solve_ldrows,
               "solve_inverse": _collect_solve_inverse,
               "solve_inverse_ld": _collect_solve_inverse_ld}


def _forward_sweep(R_cm, O_cm, y_cm, jitter, collect):
    """Eliminate all chunk interiors (j = 1 .. s-1).

    ``collect`` is None (fused mahal/logdet: nothing stored), "solve"
    (hat back-substitution factors, see `_collect_solve`) or "inverse"
    (raw factors for the Takahashi recursion).  Returns (final state, W1,
    stacked); stacked leaves are flattened per step (leading axis s-1).
    """
    s = R_cm.shape[0]
    collector = _COLLECTORS[collect] if collect else None
    state = _step(None, R_cm[1], O_cm[1], y_cm[1], O_cm[0], jitter)
    first = collector(state) if collector else None

    stacked = None
    if s > 2:
        xs = (R_cm[2:], O_cm[2:], y_cm[2:])

        def body(st, inp):
            r_j, o_j, yy = inp
            new = _step(st, r_j, o_j, yy, None, jitter)
            out = collector(new) if collector else None
            return new, out

        state, rest = jax.lax.scan(body, state, xs)
        if collector:
            stacked = jax.tree.map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0),
                first, rest,
            )
    elif collector:
        stacked = jax.tree.map(lambda a: a[None], first)

    # right coupling: W1 = D_{s-1}^{-1} O_cm[s-1]^T (zero for the last
    # chunk by the trailing-zero invariant)
    w1 = sb.solve_lower(state.dj, state.invd, sb.transpose(O_cm[s - 1]))
    return state, w1, stacked


def _reduced_system(R_cm, y_cm, state, w1):
    s11 = sb.matmul(w1, w1, ta=True)
    red_diag = R_cm[0] - state.acc00 - sb.shift_down(s11)
    red_off = -sb.matmul(w1, state.w0, ta=True)  # J[b_{c+1}, b_c]
    red_rhs = (
        y_cm[0]
        - state.accy0
        - sb.shift_down(sb.matvec(w1, state.w, ta=True))
    )
    return red_diag, red_off, red_rhs


def _chunk_layout_em(diag_em, off_em, y_em, s: int):
    """`_chunk_layout` on ELEMENT-MAJOR inputs (diag [d, d, n], off
    [d, d, >= n-1] valid to n-2, y [d, n]) -- the reduced-system
    recursion's native format.  One lane-regrouping transpose instead
    of the em -> natural -> chunk-major double conversion (the ladder's
    dominant cost at d >= 9, where every [d, d, n] pass tile-pads
    16/d)."""
    d, _, n = diag_em.shape
    c = -(-n // s)
    m = c * s
    if m > n:
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=diag_em.dtype)[:, :, None], (d, d, m - n)
        )
        diag_em = jnp.concatenate([diag_em, eye], axis=-1)
        y_em = jnp.concatenate(
            [y_em, jnp.zeros((d, m - n), dtype=y_em.dtype)], axis=-1
        )
    off_em = jnp.concatenate(
        [off_em[:, :, : n - 1],
         jnp.zeros((d, d, m - n + 1), dtype=diag_em.dtype)], axis=-1
    )
    R_cm = jnp.transpose(diag_em.reshape(d, d, c, s), (3, 0, 1, 2))
    O_cm = jnp.transpose(off_em.reshape(d, d, c, s), (3, 0, 1, 2))
    y_cm = jnp.transpose(y_em.reshape(d, c, s), (2, 0, 1))
    return R_cm, O_cm, y_cm, c


def _mahal_and_logdet_em(diag_em, off_em, y_em, jitter):
    """`_mahal_and_logdet_impl` on element-major inputs (off_em valid to
    n-2; trailing entries ignored) -- used for the reduced-system
    recursion so no level pays the em -> natural round trip."""
    d, _, n = diag_em.shape
    s = default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        return cr.mahal_and_logdet(
            sb.from_em(diag_em), sb.from_em(off_em)[: n - 1],
            sb.vec_from_em(y_em), jitter=jitter,
        )
    R_cm, O_cm, y_cm, c = _chunk_layout_em(diag_em, off_em, y_em, s)
    state, w1, _ = _forward_sweep(R_cm, O_cm, y_cm, jitter, collect=None)
    red_diag, red_off, red_rhs = _reduced_system(R_cm, y_cm, state, w1)
    red_mh, red_ld = _mahal_and_logdet_em(red_diag, red_off, red_rhs,
                                          jitter)
    return state.mh + red_mh, 2.0 * state.ld + red_ld


def _mahal_and_logdet_impl(diag, off, y, s, jitter):
    """Recursive partitioned elimination: each pass shrinks N by ~s until
    the terminal cyclic reduction (bounded program size at every level)."""
    n = diag.shape[0]
    s = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        return cr.mahal_and_logdet(diag, off, y, jitter=jitter)
    R_cm, O_cm, y_cm, c = _chunk_layout(diag, off, y, s)
    state, w1, _ = _forward_sweep(R_cm, O_cm, y_cm, jitter, collect=None)
    red_diag, red_off, red_rhs = _reduced_system(R_cm, y_cm, state, w1)
    red_mh, red_ld = _mahal_and_logdet_em(red_diag, red_off, red_rhs,
                                          jitter)
    return state.mh + red_mh, 2.0 * state.ld + red_ld


@partial(jax.jit, static_argnames=("s", "jitter", "backend"))
def mahal_and_logdet(
    diag: Array,
    off: Array,
    y: Array,
    s: Optional[int] = None,
    jitter: float = 0.0,
    backend: str = "auto",
) -> Tuple[Array, Array]:
    """Fused (y^T J^{-1} y, log|J|) via partitioned elimination.

    Matches cr.mahal_and_logdet exactly (tests/test_partitioned.py); a
    chain of streaming passes, each shrinking N by the chunk length.
    The top level routes through the chunk-major entry (custom VJP +
    Pallas kernels on TPU via ``backend="auto"``); the recursion tail
    stays on the XLA scan.
    """
    n = diag.shape[0]
    d = diag.shape[1]
    s = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        return cr.mahal_and_logdet(diag, off, y, jitter=jitter)
    if 8 < d < 16 and resolve_backend(backend) == "pallas":
        # wide-layout kernel: 8-aligned DMA + fully-packed VPU ops
        # (the plain layout pays 8*ceil(d/8)/d on both); analytic VJP
        return _mahal_wide(diag, off, y, s, jitter)
    R_cm, O_cm, y_cm, _ = _chunk_layout(diag, off, y, s)
    return mahal_and_logdet_cm(R_cm, O_cm, y_cm, jitter, backend)


def resolve_backend(backend: str) -> str:
    """"auto" picks the Pallas kernels on TPU-like devices, the XLA scan
    path on CPU (tests / oracles).

    The Pallas kernels are single-chip programs, so "auto" also falls
    back to the XLA scan when tracing happens under an ambient
    multi-device mesh (``jax.sharding.use_mesh`` / ``shard_map`` bodies
    see it as the abstract mesh): GSPMD would otherwise partition a
    kernel that assumes it owns the whole chunk axis.  Explicit
    ``backend="pallas"`` still overrides (shard-local callers that KNOW
    their block is chip-resident)."""
    if backend != "auto":
        return backend
    if jax.devices()[0].platform == "cpu":
        return "xla"
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is not None and mesh.size > 1:
            return "xla"
    except AttributeError:  # older jax: no ambient-mesh API
        pass
    return "pallas"


def _mahal_cm_primal(R_cm, O_cm, y_cm, jitter, backend):
    c = R_cm.shape[-1]
    s = R_cm.shape[0]
    if backend == "pallas":
        from cyclic_gps_tpu.ops.pallas_sweep import forward_sweep_pallas

        (acc00, accy0, w0l, wl, dl, invdl, mh,
         ld, _) = forward_sweep_pallas(R_cm, O_cm, y_cm, jitter=jitter)
        w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
        state = _SweepState(None, w0l, wl, dl, invdl, acc00, accy0, mh, ld)
    else:
        state, w1, _ = _forward_sweep(R_cm, O_cm, y_cm, jitter,
                                      collect=None)
    red_diag, red_off, red_rhs = _reduced_system(R_cm, y_cm, state, w1)
    red_mh, red_ld = _mahal_and_logdet_em(red_diag, red_off, red_rhs,
                                          jitter)
    return state.mh + red_mh, 2.0 * state.ld + red_ld


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mahal_cm(R_cm, O_cm, y_cm, jitter, backend):
    return _mahal_cm_primal(R_cm, O_cm, y_cm, jitter, backend)


def _mahal_cm_fwd(R_cm, O_cm, y_cm, jitter, backend):
    out = _mahal_cm_primal(R_cm, O_cm, y_cm, jitter, backend)
    return out, (R_cm, O_cm, y_cm)


def _mahal_cm_bwd(jitter, backend, res, cots):
    """Analytic adjoint (O(1) stored state: residuals are the inputs).

    With x = J^{-1} y, Sigma = J^{-1} (selected blocks):
      d(mh)/dR_i = -x_i x_i^T     d(mh)/dO_i = -2 x_{i+1} x_i^T
      d(ld)/dR_i = Sigma_ii       d(ld)/dO_i = 2 Sigma_{i+1,i}
      d(mh)/dy   = 2 x
    The backward is ONE fused collect sweep + one descending pass
    (`_solve_inverse_from_cm`: solve and selected inversion share the
    hat stacks) -- instead of autodiff through the scan (which stores
    every step's factorization).  This also makes the
    non-differentiable Pallas forward kernel usable under `grad`.
    """
    R_cm, O_cm, y_cm = res
    gm, gl = cots
    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    x_pad, sig_diag, sig_off = _solve_inverse_from_cm(
        R_cm, O_cm, y_cm, jitter, backend
    )
    xo = x_pad[:, :, None] * x_pad[:, None, :]
    x_next = jnp.concatenate(
        [x_pad[1:], jnp.zeros((1, d), x_pad.dtype)], axis=0
    )
    xo_off = x_next[:, :, None] * x_pad[:, None, :]  # x_{i+1} x_i^T
    g_diag = gl * sig_diag - gm * xo
    g_off = 2.0 * (gl * sig_off - gm * xo_off)
    g_y = 2.0 * gm * x_pad
    g_R = jnp.transpose(g_diag.reshape(c, s, d, d), (1, 2, 3, 0))
    g_O = jnp.transpose(g_off.reshape(c, s, d, d), (1, 2, 3, 0))
    g_yc = jnp.transpose(g_y.reshape(c, s, d), (1, 2, 0))
    return g_R, g_O, g_yc


_mahal_cm.defvjp(_mahal_cm_fwd, _mahal_cm_bwd)


def mahal_and_logdet_cm(R_cm: Array, O_cm: Array, y_cm: Array,
                        jitter: float = 0.0,
                        backend: str = "xla") -> Tuple[Array, Array]:
    """Fused (y^T J^{-1} y, log|J|) on ALREADY chunk-major inputs
    (R_cm/O_cm [s, d, d, C], y_cm [s, d, C], trailing-zero O invariant,
    identity/zero padding for any tail).  Producers that construct the
    blocks elementwise (e.g. the LEG precision) emit this layout for free,
    skipping the [N, d, d] -> chunk-major relayout passes entirely.

    ``backend``: "xla" (lax.scan sweep), "pallas" (fused TPU kernels,
    ~1.7x faster on-device -- PALLAS_TPU.md) or "auto" (pallas on TPU).
    Differentiable under every backend via an analytic custom VJP
    (`_mahal_cm_bwd`: one solve + one selected inversion, O(1) stored
    state)."""
    return _mahal_cm(R_cm, O_cm, y_cm, jitter, resolve_backend(backend))


# ---------------------------------------------------------------------------
# WIDE (8 < d < 16) Pallas path.  The plain [s, d, d, C] layout pads the
# block-column dimension to 8*ceil(d/8) sublanes in registers AND in
# tiled HBM storage/DMA -- 78% overhead at d = 9 (the measured 2.2x
# family-table step).  ops/wideblock's 8-aligned representation removes
# it; ops/pallas_wide runs the fused sweep on it.  d = 16 is exactly two
# tiles and gains nothing; d <= 8 is one tile.
# ---------------------------------------------------------------------------


def _chunk_layout_wide(diag: Array, off: Array, y: Array, s: int):
    """Natural [N, d, d] -> WIDE chunk-major
    (R11 [s, 8, 8, C], Rst [s, 3e, 8, C], O11, Ost, y_cm [s, d, C], C).

    Built straight from the natural arrays (one relayout pass writing
    8-aligned outputs); padding blocks are identity / zero as in
    `_chunk_layout`."""
    n, d, _ = diag.shape
    e = d - 8
    c = -(-n // s)
    m = c * s
    if m > n:
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=diag.dtype)[None], (m - n, d, d)
        )
        diag = jnp.concatenate([diag, eye], axis=0)
        y = jnp.concatenate(
            [y, jnp.zeros((m - n, d), dtype=y.dtype)], axis=0
        )
    off = jnp.concatenate(
        [off, jnp.zeros((m - n + 1, d, d), dtype=diag.dtype)], axis=0
    )

    def wide(x4):
        a11 = jnp.transpose(x4[:, :, :8, :8], (1, 2, 3, 0))
        a21 = jnp.transpose(x4[:, :, 8:, :8], (1, 2, 3, 0))
        a12t = jnp.transpose(x4[:, :, :8, 8:], (1, 3, 2, 0))
        a22 = jnp.transpose(x4[:, :, 8:, 8:], (1, 2, 3, 0))
        a22 = jnp.concatenate(
            [a22, jnp.zeros(a22.shape[:2] + (8 - e,) + a22.shape[3:],
                            dtype=x4.dtype)], axis=2
        )
        return a11, jnp.concatenate([a21, a12t, a22], axis=1)

    r11, rst = wide(diag.reshape(c, s, d, d))
    o11, ost = wide(off.reshape(c, s, d, d))
    y_cm = jnp.transpose(y.reshape(c, s, d), (1, 2, 0))
    return r11, rst, o11, ost, y_cm, c


def mahal_and_logdet_wide(r11, rst, o11, ost, y_cm,
                          jitter: float = 0.0):
    """Fused (mahal, logdet) on ALREADY wide-layout chunk-major inputs
    (see `_chunk_layout_wide` for the format) -- what an emission layer
    that builds blocks elementwise for 8 < d < 16 hands over directly.
    Forward-only entry (the differentiable route is the natural-layout
    `mahal_and_logdet`, whose analytic VJP covers the wide primal)."""
    c = r11.shape[-1]
    return _mahal_wide_cm_primal(r11, rst, o11, ost, y_cm, c, jitter)


def _mahal_wide_primal(diag, off, y, s, jitter):
    r11, rst, o11, ost, y_cm, c = _chunk_layout_wide(diag, off, y, s)
    return _mahal_wide_cm_primal(r11, rst, o11, ost, y_cm, c, jitter)


def _mahal_wide_cm_primal(r11, rst, o11, ost, y_cm, c, jitter):
    from cyclic_gps_tpu.ops import wideblock as wb
    from cyclic_gps_tpu.ops.pallas_wide import forward_sweep_wide_pallas

    s = r11.shape[0]
    (acc11, accst, accy0, w011, w0st, wl, d11, dst, invd, mh,
     ld) = forward_sweep_wide_pallas(r11, rst, o11, ost, y_cm,
                                     jitter=jitter)
    # C-sized conversions for the reduced boundary system (plain layout)
    state = _SweepState(
        None, wb.from_wide(w011, w0st), wl, wb.from_wide(d11, dst),
        invd, wb.from_wide(acc11, accst), accy0, mh, ld,
    )
    o_last = wb.from_wide(o11[s - 1], ost[s - 1])
    w1 = sb.solve_lower(state.dj, state.invd, sb.transpose(o_last))
    r0 = wb.from_wide(r11[0], rst[0])
    red_diag, red_off, red_rhs = _reduced_system(
        r0[None], y_cm[:1], state, w1
    )
    red_mh, red_ld = _mahal_and_logdet_em(red_diag, red_off, red_rhs,
                                          jitter)
    return state.mh + red_mh, 2.0 * state.ld + red_ld


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mahal_wide(diag, off, y, s, jitter):
    return _mahal_wide_primal(diag, off, y, s, jitter)


def _y_cm_of(y, s):
    """Natural [n, d] -> chunk-major [s, d, C] (zero-padded)."""
    n, d = y.shape
    c = -(-n // s)
    m = c * s
    if m > n:
        y = jnp.concatenate([y, jnp.zeros((m - n, d), y.dtype)], axis=0)
    return jnp.transpose(y.reshape(c, s, d), (1, 2, 0))


def _nat_from_wide_cm(a11, ast, rows):
    """Wide chunk-major stack [s, ., ., C] -> natural [rows, d, d]
    (the XLA-backend fallback of the wide VJP backwards)."""
    full = _from_wide_stack(a11, ast)            # [s, d, d, C]
    d = full.shape[1]
    nat = jnp.transpose(full, (3, 0, 1, 2)).reshape(-1, d, d)
    return nat[:rows]


def _solve_inverse_from_wide(r11, rst, o11, ost, y, jitter):
    """(x, sig_diag, sig_off) from CACHED wide residuals: under the
    pallas backend the wide fused pair runs directly (no natural->wide
    relayout -- the forward already paid it); under XLA (CPU oracles)
    the natural arrays are reconstructed first."""
    n = y.shape[0]
    s = r11.shape[0]
    if resolve_backend("auto") == "pallas":
        x_pad, sd_pad, so_pad = _solve_inverse_wide_cm(
            r11, rst, o11, ost, _y_cm_of(y, s), jitter)
        return x_pad[:n], sd_pad[:n], so_pad[: n - 1]
    diag = _nat_from_wide_cm(r11, rst, n)
    off = _nat_from_wide_cm(o11, ost, n - 1)
    return _solve_inverse_nat(diag, off, y, s, jitter,
                              resolve_backend("auto"))


def _mahal_wide_fwd(diag, off, y, s, jitter):
    r11, rst, o11, ost, y_cm, c = _chunk_layout_wide(diag, off, y, s)
    out = _mahal_wide_cm_primal(r11, rst, o11, ost, y_cm, c, jitter)
    # WIDE residuals: the backward reuses the forward's relayout (at
    # N = 1e6 d = 9 the natural -> wide pass is ~18 ms on device --
    # round-5 bench_backward)
    return out, (r11, rst, o11, ost, y)


def _mahal_wide_bwd(s, jitter, res, cots):
    """Same analytic adjoint as `_mahal_cm_bwd`, natural layout.  The
    backward runs the FUSED wide solve+inverse (one wide collect sweep
    + one wide descending pass, round 5) straight on the cached wide
    residuals."""
    r11, rst, o11, ost, y = res
    gm, gl = cots
    x, sig_diag, sig_off = _solve_inverse_from_wide(r11, rst, o11, ost,
                                                    y, jitter)
    xo = x[:, :, None] * x[:, None, :]
    xo_off = x[1:, :, None] * x[:-1, None, :]
    g_diag = gl * sig_diag - gm * xo
    g_off = 2.0 * (gl * sig_off - gm * xo_off)
    g_y = 2.0 * gm * x
    return g_diag, g_off, g_y


_mahal_wide.defvjp(_mahal_wide_fwd, _mahal_wide_bwd)


def solve_and_logdet_wide(r11, rst, o11, ost, y_cm, jitter: float = 0.0):
    """(J^{-1} y CHUNK-MAJOR [s, d, C], log|J|) on ALREADY wide-layout
    chunk-major inputs (`_chunk_layout_wide` format): the wide collect
    sweep + wide back-substitution kernels, with the C-sized reduced
    boundary system solved recursively on the plain path.  The solution
    stays in the engine-native chunk-major layout (matching `solve_cm`;
    the [s, d, C] -> natural transpose is a full-size relayout pass that
    only the natural-layout entry `_solve_wide` pays).  Forward-only
    entry (the differentiable route is `_solve_wide`)."""
    from cyclic_gps_tpu.ops import pallas_wide as pw
    from cyclic_gps_tpu.ops import wideblock as wb

    s = r11.shape[0]
    c = r11.shape[-1]
    (acc11, accst, accy0, w011, w0st, wl, d11, dst, invd, mh, ld,
     hc11, hcst, hw011, hw0st, hws) = pw.forward_sweep_collect_wide_pallas(
        r11, rst, o11, ost, y_cm, jitter=jitter)
    i1 = invd[:8][:, None, :]
    i2 = invd[8:][:, None, :]
    Dw = (d11, dst, i1, i2)
    # right coupling W1 = D^{-1} O_{s-1}^T and its hat, in wide form
    ot11, otst = wb.wtranspose(o11[s - 1], ost[s - 1])
    w1_11, w1_st = wb.wsolve_lower(*Dw, ot11, otst)
    hw1_11, hw1_st = wb.wsolve_lower_t(*Dw, w1_11, w1_st)
    # C-sized conversions for the reduced boundary system (plain layout)
    state = _SweepState(
        None, wb.from_wide(w011, w0st), wl, wb.from_wide(d11, dst),
        invd, wb.from_wide(acc11, accst), accy0, mh, ld,
    )
    w1 = wb.from_wide(w1_11, w1_st)
    r0 = wb.from_wide(r11[0], rst[0])
    red_diag, red_off, red_rhs = _reduced_system(
        r0[None], y_cm[:1], state, w1
    )
    xb, red_ld = _solve_em(red_diag, red_off, red_rhs, jitter)
    # [d, C] own-chunk boundary (element-major end to end)
    xb_next = sb.shift_up(xb)  # next chunk's boundary (0 for last)
    interior = pw.backward_substitute_wide_pallas(
        hc11, hcst, hw011, hw0st, hws, hw1_11, hw1_st, xb, xb_next,
    )  # [s-1, d, C], steps j = 1..s-1
    x_cm = jnp.concatenate([xb[None], interior], axis=0)
    return x_cm, 2.0 * state.ld + red_ld


def _solve_wide_primal(diag, off, y, s, jitter):
    r11, rst, o11, ost, y_cm, _ = _chunk_layout_wide(diag, off, y, s)
    x_cm, ld = solve_and_logdet_wide(r11, rst, o11, ost, y_cm, jitter)
    s_, d, c = x_cm.shape
    x_nat = jnp.transpose(x_cm, (2, 0, 1)).reshape(c * s_, d)
    return x_nat, ld


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _solve_wide(diag, off, y, s, jitter):
    x_pad, ld = _solve_wide_primal(diag, off, y, s, jitter)
    return x_pad[: diag.shape[0]], ld


def _solve_wide_fwd(diag, off, y, s, jitter):
    r11, rst, o11, ost, y_cm, c = _chunk_layout_wide(diag, off, y, s)
    x_cm, ld = solve_and_logdet_wide(r11, rst, o11, ost, y_cm, jitter)
    s_, d, c_ = x_cm.shape
    x = jnp.transpose(x_cm, (2, 0, 1)).reshape(c_ * s_, d)[: diag.shape[0]]
    # WIDE residuals (see _mahal_wide_fwd)
    return (x, ld), (r11, rst, o11, ost, x)


def _solve_wide_bwd(s, jitter, res, cots):
    """Same analytic adjoint as `_solve_cm_bwd`, natural layout; the
    fused wide solve+inverse backward on the cached wide residuals
    (see `_mahal_wide_bwd`)."""
    r11, rst, o11, ost, x = res
    gx, gl = cots
    u, sig_diag, sig_off = _solve_inverse_from_wide(r11, rst, o11, ost,
                                                    gx, jitter)
    g_diag = gl * sig_diag - u[:, :, None] * x[:, None, :]
    g_off = (
        2.0 * gl * sig_off
        - u[1:, :, None] * x[:-1, None, :]
        - x[1:, :, None] * u[:-1, None, :]
    )
    g_y = u
    return g_diag, g_off, g_y


_solve_wide.defvjp(_solve_wide_fwd, _solve_wide_bwd)


def _inverse_wide(diag, off, s, jitter):
    """Selected inversion for 8 < d < 16 on the wide kernels (raw-factor
    collect sweep + wide Takahashi recursion); same recurrence as
    `_inverse_from_cm_pallas` with all per-step algebra 8-aligned."""
    from cyclic_gps_tpu.ops import pallas_wide as pw
    from cyclic_gps_tpu.ops import wideblock as wb

    n, d, _ = diag.shape
    zeros_y = jnp.zeros((n, d), dtype=diag.dtype)
    r11, rst, o11, ost, _, c = _chunk_layout_wide(diag, off, zeros_y, s)
    s_ = r11.shape[0]
    (acc11, accst, w011l, w0stl, d11l, dstl, invdl,
     d11s, dsts, invds, c11s, csts, w011s,
     w0sts) = pw.forward_sweep_inverse_wide_pallas(r11, rst, o11, ost,
                                                   jitter=jitter)
    cpad = d11s.shape[-1]
    # C-sized plain conversions: reduced system + Takahashi seeds
    dl = wb.from_wide(d11l, dstl)
    w0l = wb.from_wide(w011l, w0stl)
    acc00 = wb.from_wide(acc11, accst)
    o_last = wb.from_wide(o11[s_ - 1], ost[s_ - 1])
    w1 = sb.solve_lower(dl, invdl, sb.transpose(o_last))
    s11m = sb.matmul(w1, w1, ta=True)
    r0 = wb.from_wide(r11[0], rst[0])
    red_diag = r0 - acc00 - sb.shift_down(s11m)
    red_off = -sb.matmul(w1, w0l, ta=True)
    bb_diag, bb_off = _inverse_impl(
        sb.from_em(red_diag), sb.from_em(red_off)[: c - 1], None, jitter
    )
    p00 = sb.to_em(bb_diag)
    p10 = jnp.concatenate(
        [sb.to_em(bb_off), jnp.zeros((d, d, 1), dtype=diag.dtype)], axis=-1
    )
    p11 = sb.shift_up(p00)
    p01 = sb.transpose(p10)

    def sigma_bb_ut(u0, u1):
        a0 = sb.matmul(p00, u0, tb=True) + sb.matmul(p01, u1, tb=True)
        a1 = sb.matmul(p10, u0, tb=True) + sb.matmul(p11, u1, tb=True)
        return a0, a1

    di_last = sb.tri_lower_inverse(dl, invdl)
    phi = sb.matmul(di_last, di_last, ta=True)
    u0 = sb.solve_lower_t(dl, invdl, w0l)
    u1 = sb.solve_lower_t(dl, invdl, w1)
    a0, a1 = sigma_bb_ut(u0, u1)
    diag_last = phi + sb.matmul(u0, a0) + sb.matmul(u1, a1)
    off_edge_right = -(
        sb.matmul(p10, u0, tb=True) + sb.matmul(p11, u1, tb=True)
    )

    def pad_eye(a):
        if cpad == c:
            return a
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=a.dtype)[:, :, None], (d, d, cpad - c)
        )
        return jnp.concatenate([a, eye], axis=-1)

    def pad_zero(a):
        if cpad == c:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((d, d, cpad - c), dtype=a.dtype)], axis=-1
        )

    wides = []
    for a, eye in ((p00, True), (p01, False), (p10, False), (p11, True),
                   (phi, True), (u0, False), (u1, False),
                   (a0, False), (a1, False)):
        wides.extend(wb.to_wide(pad_eye(a) if eye else pad_zero(a)))
    (diag11, diagst, off11, offst, u0f11, u0fst, u1f11,
     u1fst) = pw.takahashi_backward_wide_pallas(
        d11s, dsts, invds, c11s, csts, w011s, w0sts, tuple(wides))
    fw = jax.vmap(wb.from_wide)
    diag_mid = fw(diag11[..., :c], diagst[..., :c])
    off_mid = fw(off11[..., :c], offst[..., :c])
    u0f = wb.from_wide(u0f11[..., :c], u0fst[..., :c])
    u1f = wb.from_wide(u1f11[..., :c], u1fst[..., :c])

    diag_int = jnp.concatenate([diag_mid, diag_last[None]], axis=0)
    off_edge_left = -(sb.matmul(u0f, p00) + sb.matmul(u1f, p10))
    diag_cm = jnp.concatenate([p00[None], diag_int], axis=0)
    off_cm = jnp.concatenate(
        [off_edge_left[None], off_mid, off_edge_right[None]], axis=0
    )
    diag_nat = jnp.transpose(diag_cm, (3, 0, 1, 2)).reshape(-1, d, d)
    off_nat = jnp.transpose(off_cm, (3, 0, 1, 2)).reshape(-1, d, d)
    return diag_nat[:n], off_nat[: n - 1]


@partial(jax.jit, static_argnames=("s", "jitter"))
def logdet(
    diag: Array, off: Array, s: Optional[int] = None, jitter: float = 0.0
) -> Array:
    """log|J| via partitioned elimination (no RHS)."""
    n, d, _ = diag.shape
    zeros = jnp.zeros((n, d), dtype=diag.dtype)
    return mahal_and_logdet(diag, off, zeros, s=s, jitter=jitter)[1]


# ---------------------------------------------------------------------------
# Per-row pivot log-determinants.  Every pivot of the partitioned
# elimination (interior steps, reduced boundary levels, terminal
# sequential sweep) belongs to exactly one block row, so the scalar
# log|J| decomposes as a per-row vector ld_rows with sum(ld_rows) ==
# logdet.  For a system that is BLOCK-DIAGONAL over contiguous row
# segments (zero off blocks at every segment boundary -- the stacked
# multi-series posterior precision, leg.log_likelihood_stacked), no
# elimination step ever crosses a zero boundary coupling, so
# segment-summing ld_rows yields each segment's EXACT log|K_b|.  That is
# the intended use (leg.log_likelihood_per_series); for a coupled system
# the per-row values depend on the elimination order and only their
# total is meaningful.
# ---------------------------------------------------------------------------


def _ld_rows_seq(diag, off, jitter):
    """Terminal per-row sweep: sequential block-Cholesky over natural
    [n, d, d] rows (n < _TERMINAL-ish -- a tiny lax.scan program);
    returns ld_rows [n] with ld_rows[i] = 2 sum log diag L_i."""
    n, d, _ = diag.shape
    off_prev = jnp.concatenate(
        [jnp.zeros((1, d, d), diag.dtype), off[: n - 1]], axis=0
    )  # J[i, i-1] feeding row i's downdate (zero for i = 0)
    eye = jnp.eye(d, dtype=diag.dtype)[:, :, None]
    inv0 = jnp.ones((d, 1), diag.dtype)

    def body(carry, inp):
        l_prev, invd_prev = carry
        r_i, o_prev = inp
        r_em = sb.to_em(r_i[None])
        o_em = sb.to_em(o_prev[None])
        w = sb.solve_lower(l_prev, invd_prev, sb.transpose(o_em))
        p = r_em - sb.matmul(w, w, ta=True)
        l_i, invd_i = sb.cholesky(p, jitter=jitter)
        return (l_i, invd_i), 2.0 * sb.chol_log_diag_rows(l_i)[0]

    _, lds = jax.lax.scan(body, (eye, inv0), (diag, off_prev))
    return lds


def _ld_rows_cm_impl(R_cm, O_cm, jitter, backend="xla"):
    """Chunk-major per-row pivot log-dets [s, C]: rows j >= 1 from the
    interior elimination sweep, row j = 0 of chunk c from the reduced
    boundary system's own recursion (reduced row c IS natural row c*s).
    ``backend="pallas"`` runs the large first level as the fused sweep
    kernel (its per-step lq lane output); the recursion tail stays on
    the XLA scan, mirroring `_mahal_cm_primal`."""
    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    zy = jnp.zeros((s, d, c), R_cm.dtype)
    if backend == "pallas":
        from cyclic_gps_tpu.ops.pallas_sweep import forward_sweep_pallas

        (acc00, accy0, w0l, wl, dl, invdl, _, _,
         ld_int) = forward_sweep_pallas(R_cm, O_cm, zy, jitter=jitter)
        zero = jnp.zeros((), R_cm.dtype)
        state = _SweepState(None, w0l, wl, dl, invdl, acc00, accy0,
                            zero, zero)
        w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
    else:
        state, w1, ld_int = _forward_sweep(R_cm, O_cm, zy, jitter,
                                           collect="ldrows")  # [s-1, C]
    red_diag, red_off, _ = _reduced_system(R_cm, zy, state, w1)
    red_rows = logdet_rows(
        sb.from_em(red_diag), sb.from_em(red_off)[: c - 1], jitter=jitter
    )  # [C]
    return jnp.concatenate([red_rows[None], ld_int], axis=0)  # [s, C]


@partial(jax.jit, static_argnames=("s", "jitter"))
def logdet_rows(diag: Array, off: Array, s: Optional[int] = None,
                jitter: float = 0.0) -> Array:
    """Per-row pivot log-determinant partials [n] (see the section
    comment above; sum(logdet_rows(...)) == logdet(...) exactly).
    Differentiable by autodiff through the sweeps; for the analytic
    adjoint use `logdet_per_segment` / `logdet_rows_cm`."""
    n = diag.shape[0]
    s_ = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s_):
        return _ld_rows_seq(diag, off, jitter)
    R_cm, O_cm, _, c = _chunk_layout(diag, off, None, s_)
    rows_cm = _ld_rows_cm_impl(R_cm, O_cm, jitter)
    return jnp.transpose(rows_cm, (1, 0)).reshape(c * s_)[:n]


def _rows_cotangent_guard(w, O_cm, c, s):
    """Validity-domain guard for the analytic per-row adjoints: returns
    a scalar that is 0.0 when the per-row cotangent ``w`` (natural
    order, [c*s]) is constant across every NONZERO coupling of J, and
    NaN otherwise.  Adding it to the gradient turns a misuse -- a
    consumer differentiating individual rows of a COUPLED system, where
    the segment-wise formula is not the adjoint -- into a loud NaN
    instead of silently wrong values.  Valid consumers reach the rows
    only through segment sums over block-diagonal segments, whose VJP
    gathers the SAME scalar to every row of a segment (exact float
    equality), so no tolerance is needed and the guard never fires for
    them."""
    onorm = jnp.transpose(jnp.sum(jnp.abs(O_cm), axis=(1, 2)),
                          (1, 0)).reshape(c * s)
    coupled = onorm[: c * s - 1] > 0
    bad = jnp.any(coupled & (w[:-1] != w[1:]))
    return jnp.where(bad, jnp.nan, 0.0).astype(w.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _ld_rows_cm(R_cm, O_cm, jitter, backend):
    return _ld_rows_cm_impl(R_cm, O_cm, jitter, backend)


def _ld_rows_cm_fwd(R_cm, O_cm, jitter, backend):
    return _ld_rows_cm_impl(R_cm, O_cm, jitter, backend), (R_cm, O_cm)


def _ld_rows_cm_bwd(jitter, backend, res, w_cm):
    """Segment-wise analytic adjoint (one selected inversion, O(1)
    residuals).  VALID when the incoming per-row cotangent w is constant
    within each block-diagonal segment of J (the segment-sum use): then
      d(sum_i w_i ld_i)/dR_i = w_i Sigma_ii
      d(sum_i w_i ld_i)/dO_i = 2 w_i Sigma_{i+1,i}
    with Sigma = J^{-1} selected blocks (Sigma_{i+1,i} = 0 across
    segment boundaries, so the weight tie-break there is immaterial --
    matching `_mahal_cm_bwd`'s scalar-cotangent formula per segment).
    For general per-row cotangents the true adjoint depends on the
    elimination order and this formula is NOT it; consumers must
    segment-sum (leg.log_likelihood_per_series does).  A cotangent
    outside that domain NaN-poisons the gradient
    (`_rows_cotangent_guard`) rather than returning wrong values."""
    R_cm, O_cm = res
    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    sig_diag, sig_off = _inverse_from_cm(R_cm, O_cm, jitter, backend)
    w = jnp.transpose(w_cm, (1, 0)).reshape(c * s)  # natural order [m]
    w = w + _rows_cotangent_guard(w, O_cm, c, s)
    g_diag = w[:, None, None] * sig_diag
    g_off = 2.0 * w[:, None, None] * sig_off
    g_R = jnp.transpose(g_diag.reshape(c, s, d, d), (1, 2, 3, 0))
    g_O = jnp.transpose(g_off.reshape(c, s, d, d), (1, 2, 3, 0))
    return g_R, g_O


_ld_rows_cm.defvjp(_ld_rows_cm_fwd, _ld_rows_cm_bwd)


def logdet_rows_cm(R_cm: Array, O_cm: Array, jitter: float = 0.0,
                   backend: str = "auto") -> Array:
    """Per-row pivot log-dets [s, C] on ALREADY chunk-major inputs.
    ``backend`` selects the engine for BOTH the forward sweep (the fused
    Pallas kernel's per-step lq lane output on TPU) and the analytic
    adjoint's selected inversion.  Gradient validity: see
    `_ld_rows_cm_bwd` (segment-sum consumers)."""
    return _ld_rows_cm(R_cm, O_cm, jitter, resolve_backend(backend))


@partial(jax.jit, static_argnames=("num_segments", "s", "jitter",
                                   "backend"))
def logdet_per_segment(diag: Array, off: Array, seg_ids: Array,
                       num_segments: int, s: Optional[int] = None,
                       jitter: float = 0.0,
                       backend: str = "auto") -> Array:
    """Per-segment log-determinants [num_segments] of a block-tridiag
    system that is block-diagonal over contiguous row segments
    (``seg_ids`` sorted, off blocks crossing segment boundaries zero).
    Exact: out[b] == logdet of segment b's own subsystem.  The analog of
    running the reference's `det` (cyclic_reduction.py:441-470) once per
    segment, in ONE streaming elimination."""
    n = diag.shape[0]
    s_ = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s_):
        rows = _ld_rows_seq(diag, off, jitter)
    else:
        R_cm, O_cm, _, c = _chunk_layout(diag, off, None, s_)
        rows_cm = _ld_rows_cm(R_cm, O_cm, jitter,
                              resolve_backend(backend))
        rows = jnp.transpose(rows_cm, (1, 0)).reshape(c * s_)[:n]
    return jax.ops.segment_sum(rows, seg_ids,
                               num_segments=num_segments)


def _solve_em(diag_em, off_em, y_em, jitter):
    """(J^{-1} y ELEMENT-MAJOR [d, n], log|J|) on element-major inputs
    (off_em valid to n-2) -- the reduced boundary ladder's native
    format (both solve entries consume the boundary solution as a
    [d, C] em vector, so no level pays the em -> natural round trip
    on the [d, d, n] system blocks)."""
    d, _, n = diag_em.shape
    s = default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        decomp = cr.decompose(sb.from_em(diag_em),
                              sb.from_em(off_em)[: n - 1], jitter=jitter)
        x = cr.solve(decomp, sb.vec_from_em(y_em))
        return sb.vec_to_em(x), cr.logdet(decomp)
    R_cm, O_cm, y_cm, c = _chunk_layout_em(diag_em, off_em, y_em, s)
    x_nat, ld = _solve_from_cm(R_cm, O_cm, y_cm, jitter)
    return sb.vec_to_em(x_nat[:n]), ld


def _solve_impl(diag, off, y, s, jitter):
    """Returns (J^{-1} y, log|J|) -- the log-det falls out of the same
    forward sweep for free."""
    n, d = y.shape
    s = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        decomp = cr.decompose(diag, off, jitter=jitter)
        return cr.solve(decomp, y), cr.logdet(decomp)
    R_cm, O_cm, y_cm, c = _chunk_layout(diag, off, y, s)
    x_nat, ld = _solve_from_cm(R_cm, O_cm, y_cm, jitter)
    return x_nat[:n], ld


def _solve_from_cm(R_cm, O_cm, y_cm, jitter, backend: str = "xla"):
    """Solve + logdet on chunk-major inputs; returns the full padded
    natural-order solution [C*s, d] and log|J|.

    The forward sweep stores 'hat' factors (see `_collect_solve`) so the
    backward pass is pure FMA: x_j = hat_w_j - hat_W0_j x_b -
    hat_C_j x_{j+1}.  ``backend="pallas"`` runs the back-substitution as
    one Pallas kernel whose grid walks the steps in DESCENDING order with
    plain index maps (full-rate DMA streaming; a reversed `lax.scan`
    walks the stacked buffers backwards)."""
    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    if backend == "pallas":
        # both passes as Pallas kernels: the forward streams hat factors
        # to HBM as it eliminates; the backward walks them in descending
        # step order.  The hat stacks stay padded to the kernel tile so
        # no relayout/copy happens between the two kernels.
        from cyclic_gps_tpu.ops import pallas_sweep as ps

        (acc00, accy0, w0l, wl, dl, invdl, mh, ld,
         hat_cs, hat_w0s, hat_ws, _) = ps.forward_sweep_collect_pallas(
            R_cm, O_cm, y_cm, jitter=jitter)
        state = _SweepState(None, w0l, wl, dl, invdl, acc00, accy0, mh, ld)
        w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
    else:
        state, w1, stacked = _forward_sweep(R_cm, O_cm, y_cm, jitter,
                                            collect="solve")
        hat_cs, hat_w0s, hat_ws = stacked  # steps j = 1..s-1
    red_diag, red_off, red_rhs = _reduced_system(R_cm, y_cm, state, w1)

    x_b_em, red_ld = _solve_em(red_diag, red_off, red_rhs, jitter)
    x_nat = _back_substitute(state, w1, hat_cs, hat_w0s, hat_ws,
                             x_b_em, c, backend)
    return x_nat, 2.0 * state.ld + red_ld


def _back_substitute(state, w1, hat_cs, hat_w0s, hat_ws, xb, c, backend):
    """Chain back-substitution shared by the solve entries: hat factors
    + the reduced boundary solution xb [d, C] -> the full padded
    natural-order solution [C*s, d]."""
    s = hat_cs.shape[0] + 1
    xb_next = sb.shift_up(xb)  # next chunk's boundary (0 for last)
    hat_w1 = sb.solve_lower_t(state.dj, state.invd, w1)
    if backend == "pallas":
        from cyclic_gps_tpu.ops import pallas_sweep as ps

        cpad = hat_cs.shape[-1]  # kernel-tile padded width

        def padc(a):
            if cpad == c:
                return a
            return jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (cpad - c,), dtype=a.dtype)],
                axis=-1,
            )

        interior = ps.backward_substitute_pallas(
            hat_cs, hat_w0s, hat_ws,
            padc(hat_w1), padc(xb), padc(xb_next),
        )[:, :, :c]  # [s-1, d, C], steps j = 1..s-1
    else:
        # last interior row j = s-1 (carries the W1 term, no x_{j+1});
        # hats recomputed from the live final state (cheaper than
        # re-reading the stacked buffer tail)
        hat_w0_l = sb.solve_lower_t(state.dj, state.invd, state.w0)
        hat_w_l = sb.solve_lower_t_vec(state.dj, state.invd, state.w)
        x_last = (hat_w_l - sb.matvec(hat_w0_l, xb)
                  - sb.matvec(hat_w1, xb_next))

        if s > 2:
            def back(x_next, inp):
                hc, hw0, hw = inp
                x_j = hw - sb.matvec(hw0, xb) - sb.matvec(hc, x_next)
                return x_j, x_j

            inps = jax.tree.map(lambda a: a[:-1],
                                (hat_cs, hat_w0s, hat_ws))
            _, xs_rev = jax.lax.scan(back, x_last, inps, reverse=True)
            interior = jnp.concatenate([xs_rev, x_last[None]], axis=0)
        else:
            interior = x_last[None]

    # assemble [s, d, C] chunk-major solution, then back to natural order
    x_cm = jnp.concatenate([xb[None], interior], axis=0)
    d = xb.shape[0]
    return jnp.transpose(x_cm, (2, 0, 1)).reshape(c * s, d)


@partial(jax.jit, static_argnames=("s", "jitter", "backend"))
def solve(
    diag: Array,
    off: Array,
    y: Array,
    s: Optional[int] = None,
    jitter: float = 0.0,
    backend: str = "auto",
) -> Array:
    """J^{-1} y: recursive partitioned elimination + chain
    back-substitution."""
    return solve_and_logdet(diag, off, y, s=s, jitter=jitter,
                            backend=backend)[0]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _solve_cm(R_cm, O_cm, y_cm, jitter, backend):
    return _solve_from_cm(R_cm, O_cm, y_cm, jitter, backend)


def _solve_cm_fwd(R_cm, O_cm, y_cm, jitter, backend):
    x_nat, ld = _solve_from_cm(R_cm, O_cm, y_cm, jitter, backend)
    return (x_nat, ld), (R_cm, O_cm, y_cm, x_nat)


def _solve_cm_bwd(jitter, backend, res, cots):
    """Analytic adjoint of (x, ld) = (J^{-1} y, log|J|):

      g_y      = J^{-1} gx                     (one more solve)
      g_diag_i = gl Sigma_ii - u_i x_i^T       (u = J^{-1} gx)
      g_off_i  = 2 gl Sigma_{i+1,i} - u_{i+1} x_i^T - x_{i+1} u_i^T
    """
    R_cm, O_cm, y_cm, x_nat = res
    gx, gl = cots
    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    gx_cm = jnp.transpose(gx.reshape(c, s, d), (1, 2, 0))
    u_nat, sig_diag, sig_off = _solve_inverse_from_cm(
        R_cm, O_cm, gx_cm, jitter, backend
    )
    zrow = jnp.zeros((1, d), x_nat.dtype)
    x_next = jnp.concatenate([x_nat[1:], zrow], axis=0)
    u_next = jnp.concatenate([u_nat[1:], zrow], axis=0)
    g_diag = gl * sig_diag - u_nat[:, :, None] * x_nat[:, None, :]
    g_off = (
        2.0 * gl * sig_off
        - u_next[:, :, None] * x_nat[:, None, :]
        - x_next[:, :, None] * u_nat[:, None, :]
    )
    g_y = u_nat
    g_R = jnp.transpose(g_diag.reshape(c, s, d, d), (1, 2, 3, 0))
    g_O = jnp.transpose(g_off.reshape(c, s, d, d), (1, 2, 3, 0))
    g_yc = jnp.transpose(g_y.reshape(c, s, d), (1, 2, 0))
    return g_R, g_O, g_yc


_solve_cm.defvjp(_solve_cm_fwd, _solve_cm_bwd)


def solve_cm(R_cm: Array, O_cm: Array, y_cm: Array,
             jitter: float = 0.0,
             backend: str = "xla") -> Tuple[Array, Array]:
    """(J^{-1} y [C*s, d] padded natural order, log|J|) on chunk-major
    inputs (see mahal_and_logdet_cm).  ``backend="pallas"`` (or "auto"
    on TPU) runs both passes as Pallas kernels.  Differentiable under
    every backend via an analytic custom VJP (`_solve_cm_bwd`)."""
    return _solve_cm(R_cm, O_cm, y_cm, jitter, resolve_backend(backend))


@partial(jax.jit, static_argnames=("s", "jitter", "backend"))
def solve_and_logdet(
    diag: Array,
    off: Array,
    y: Array,
    s: Optional[int] = None,
    jitter: float = 0.0,
    backend: str = "auto",
) -> Tuple[Array, Array]:
    """(J^{-1} y, log|J|) in a single forward sweep + back-substitution --
    the headline benchmark op (BASELINE.md).  Top level routes through
    the chunk-major entry (custom VJP; Pallas kernels on TPU)."""
    n, d = y.shape
    s = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        decomp = cr.decompose(diag, off, jitter=jitter)
        return cr.solve(decomp, y), cr.logdet(decomp)
    if 8 < d < 16 and resolve_backend(backend) == "pallas":
        # wide-layout kernels (see mahal_and_logdet); analytic VJP
        return _solve_wide(diag, off, y, s, jitter)
    R_cm, O_cm, y_cm, _ = _chunk_layout(diag, off, y, s)
    x_pad, ld = solve_cm(R_cm, O_cm, y_cm, jitter, backend)
    return x_pad[:n], ld


# ---------------------------------------------------------------------------
# Fused solve + per-row pivot log-dets: ONE forward sweep (the collect
# kernel streams the lq lane alongside the hat factors) where separate
# solve_cm + logdet_rows_cm calls pay two full passes over J; the
# analytic adjoint shares ONE selected inversion between both parts.
# The per-series likelihood (leg.log_likelihood_per_series) is the
# consumer: its forward drops from three J-sized passes to two and its
# backward from ~two selected inversions + solve to one of each.
# ---------------------------------------------------------------------------


def _solve_ldr_impl(diag, off, y, s, jitter):
    """Natural-layout recursion: (J^{-1} y [n, d], per-row pivot
    log-dets [n])."""
    n, d = y.shape
    s = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        decomp = cr.decompose(diag, off, jitter=jitter)
        return cr.solve(decomp, y), _ld_rows_seq(diag, off, jitter)
    R_cm, O_cm, y_cm, c = _chunk_layout(diag, off, y, s)
    x_nat, rows_cm = _solve_ldr_from_cm(R_cm, O_cm, y_cm, jitter)
    rows = jnp.transpose(rows_cm, (1, 0)).reshape(c * s)
    return x_nat[:n], rows[:n]


def _solve_ldr_from_cm(R_cm, O_cm, y_cm, jitter, backend: str = "xla"):
    """Chunk-major fused solve + per-row log-dets; returns the full
    padded natural-order solution [C*s, d] and rows [s, C] (row c*s + j
    at [j, c]; sum == log|J| exactly, per-segment sums exact for
    block-diagonal J -- see `logdet_rows`)."""
    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    if backend == "pallas":
        from cyclic_gps_tpu.ops import pallas_sweep as ps

        (acc00, accy0, w0l, wl, dl, invdl, mh, ld,
         hat_cs, hat_w0s, hat_ws, ld_int) = ps.forward_sweep_collect_pallas(
            R_cm, O_cm, y_cm, jitter=jitter)
        state = _SweepState(None, w0l, wl, dl, invdl, acc00, accy0, mh, ld)
        w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
    else:
        state, w1, stacked = _forward_sweep(R_cm, O_cm, y_cm, jitter,
                                            collect="solve_ldrows")
        hat_cs, hat_w0s, hat_ws, ld_int = stacked  # ld_int [s-1, C]
    red_diag, red_off, red_rhs = _reduced_system(R_cm, y_cm, state, w1)
    x_b, red_rows = _solve_ldr_impl(
        sb.from_em(red_diag), sb.from_em(red_off)[: c - 1],
        sb.vec_from_em(red_rhs), None, jitter,
    )  # [C, d], [C] (reduced row c IS natural row c*s)
    x_nat = _back_substitute(state, w1, hat_cs, hat_w0s, hat_ws,
                             sb.vec_to_em(x_b), c, backend)
    rows_cm = jnp.concatenate([red_rows[None], ld_int], axis=0)  # [s, C]
    return x_nat, rows_cm


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _solve_ldr_cm(R_cm, O_cm, y_cm, jitter, backend):
    return _solve_ldr_from_cm(R_cm, O_cm, y_cm, jitter, backend)


def _solve_ldr_cm_fwd(R_cm, O_cm, y_cm, jitter, backend):
    x_nat, rows_cm = _solve_ldr_from_cm(R_cm, O_cm, y_cm, jitter, backend)
    return (x_nat, rows_cm), (R_cm, O_cm, y_cm, x_nat)


def _solve_ldr_cm_bwd(jitter, backend, res, cots):
    """Analytic adjoint sharing ONE selected inversion between the solve
    part (`_solve_cm_bwd`'s formula) and the per-row log-det part
    (`_ld_rows_cm_bwd`'s -- valid for SEGMENT-CONSTANT per-row
    cotangents only, which segment-sum consumers guarantee):

      u        = J^{-1} gx              (one more solve)
      g_diag_i = w_i Sigma_ii - u_i x_i^T
      g_off_i  = 2 w_i Sigma_{i+1,i} - u_{i+1} x_i^T - x_{i+1} u_i^T
      g_y      = u
    """
    R_cm, O_cm, y_cm, x_nat = res
    gx, w_cm = cots
    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    gx_cm = jnp.transpose(gx.reshape(c, s, d), (1, 2, 0))
    u_nat, sig_diag, sig_off = _solve_inverse_from_cm(
        R_cm, O_cm, gx_cm, jitter, backend
    )
    w = jnp.transpose(w_cm, (1, 0)).reshape(c * s)
    w = w + _rows_cotangent_guard(w, O_cm, c, s)
    zrow = jnp.zeros((1, d), x_nat.dtype)
    x_next = jnp.concatenate([x_nat[1:], zrow], axis=0)
    u_next = jnp.concatenate([u_nat[1:], zrow], axis=0)
    g_diag = (w[:, None, None] * sig_diag
              - u_nat[:, :, None] * x_nat[:, None, :])
    g_off = (
        2.0 * w[:, None, None] * sig_off
        - u_next[:, :, None] * x_nat[:, None, :]
        - x_next[:, :, None] * u_nat[:, None, :]
    )
    g_y = u_nat
    g_R = jnp.transpose(g_diag.reshape(c, s, d, d), (1, 2, 3, 0))
    g_O = jnp.transpose(g_off.reshape(c, s, d, d), (1, 2, 3, 0))
    g_yc = jnp.transpose(g_y.reshape(c, s, d), (1, 2, 0))
    return g_R, g_O, g_yc


_solve_ldr_cm.defvjp(_solve_ldr_cm_fwd, _solve_ldr_cm_bwd)


def solve_and_ld_rows_cm(R_cm: Array, O_cm: Array, y_cm: Array,
                         jitter: float = 0.0,
                         backend: str = "auto") -> Tuple[Array, Array]:
    """(J^{-1} y [C*s, d] padded natural order, per-row pivot log-dets
    [s, C]) from ONE forward sweep + one back-substitution -- the fused
    replacement for separate `solve_cm` + `logdet_rows_cm` calls (which
    pay two full passes over J).  sum(rows) == log|J| exactly;
    per-segment sums exact for block-diagonal J (`logdet_rows`).
    Differentiable under every backend with a SHARED analytic adjoint
    (one solve + one selected inversion total, `_solve_ldr_cm_bwd`);
    the per-row cotangent must be segment-constant (segment-sum
    consumers: leg.log_likelihood_per_series)."""
    return _solve_ldr_cm(R_cm, O_cm, y_cm, jitter,
                         resolve_backend(backend))


# ---------------------------------------------------------------------------
# Selected inversion: diagonal and lag-1 off-diagonal blocks of J^{-1}.
# ---------------------------------------------------------------------------


def _inverse_impl(diag, off, s, jitter):
    """Recursive partitioned selected inversion.

    With J = [[A, Bc], [Bc^T, S]] (chunk interiors / boundaries) and
    Sigma_BB the selected inverse of the reduced boundary system:

      Sigma_II = A^{-1} + U Sigma_BB U^T,    U = A^{-1} Bc = L_A^{-T} W,
      Sigma_IB = -U Sigma_BB,

    where W = [W0, W1] are the sweep's coupling solves.  A^{-1}'s
    tridiagonal blocks come from the Takahashi recursion along each chain
    (backward scan); U by back-substitution of W.  One forward sweep +
    one backward scan per recursion level; O(N d^3) total.
    """
    n, d, _ = diag.shape
    s = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        dec = cr.decompose(diag, off, jitter=jitter)
        return cr.inverse_blocks(dec)

    zeros_y = jnp.zeros((n, d), dtype=diag.dtype)
    R_cm, O_cm, y_cm, c = _chunk_layout(diag, off, zeros_y, s)
    diag_nat, off_nat = _inverse_from_cm(R_cm, O_cm, jitter)
    return diag_nat[:n], off_nat[: n - 1]


def _inverse_from_cm(R_cm, O_cm, jitter, backend: str = "xla"):
    """Selected inverse on chunk-major inputs; returns padded
    natural-order (diag [C*s, d, d], off [C*s, d, d]).

    ``backend="pallas"`` runs the forward elimination (raw-factor
    collection) and the Takahashi backward recursion as Pallas kernels
    (ops/pallas_sweep.py)."""
    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    if backend == "pallas" and s >= 3:
        return _inverse_from_cm_pallas(R_cm, O_cm, jitter)
    y_cm = jnp.zeros((s, d, c), dtype=R_cm.dtype)
    state, w1, stacked = _forward_sweep(R_cm, O_cm, y_cm, jitter,
                                        collect="inverse")
    red_diag, red_off, _ = _reduced_system(R_cm, y_cm, state, w1)

    bb_diag, bb_off = _inverse_impl(
        sb.from_em(red_diag), sb.from_em(red_off)[: c - 1], None, jitter
    )
    p00 = sb.to_em(bb_diag)  # Sigma_{b_c, b_c}                [d, d, C]
    # Sigma_{b_{c+1}, b_c}: pad the last chunk with zeros (no b_C)
    p10 = jnp.concatenate(
        [sb.to_em(bb_off), jnp.zeros((d, d, 1), dtype=R_cm.dtype)], axis=-1
    )
    p11 = sb.shift_up(p00)  # Sigma_{b_{c+1}, b_{c+1}} (pad irrelevant)
    p01 = sb.transpose(p10)

    ds, invds, cs_, w0s = stacked  # flattened, steps j = 1..s-1

    def sigma_bb_ut(u0, u1):
        """(Sigma_BB U^T) rows: A0 = row b_c, A1 = row b_{c+1}."""
        a0 = sb.matmul(p00, u0, tb=True) + sb.matmul(p01, u1, tb=True)
        a1 = sb.matmul(p10, u0, tb=True) + sb.matmul(p11, u1, tb=True)
        return a0, a1

    # init at j = s-1 (from the live final state; stacked tail unread)
    d_last, invd_last, w0_last = state.dj, state.invd, state.w0
    di_last = sb.tri_lower_inverse(d_last, invd_last)
    phi = sb.matmul(di_last, di_last, ta=True)
    u0 = sb.solve_lower_t(d_last, invd_last, w0_last)
    u1 = sb.solve_lower_t(d_last, invd_last, w1)
    a0, a1 = sigma_bb_ut(u0, u1)
    diag_last = phi + sb.matmul(u0, a0) + sb.matmul(u1, a1)
    # right-edge off block: Sigma[(c+1)s, (c+1)s-1] = -(P10 u0^T + P11 u1^T)
    off_edge_right = -(
        sb.matmul(p10, u0, tb=True) + sb.matmul(p11, u1, tb=True)
    )

    def back(carry, inp):
        phi_n, u0_n, u1_n, a0_n, a1_n = carry
        d_f, invd_f, c_f, w0_f = inp
        cc = R_cm.shape[-1]
        dd = R_cm.shape[1]
        d_j = d_f.reshape(dd, dd, cc)
        invd_j = invd_f.reshape(dd, cc)
        c_j = c_f.reshape(dd, dd, cc)
        w0_j = w0_f.reshape(dd, dd, cc)
        di = sb.tri_lower_inverse(d_j, invd_j)
        cd = sb.matmul(c_j, di)
        phi_off = -sb.matmul(phi_n, cd)  # Phi_{j+1, j}
        phi_j = sb.matmul(di, di, ta=True) + sb.matmul(
            sb.matmul(cd, phi_n, ta=True), cd
        )
        u0_j = sb.solve_lower_t(
            d_j, invd_j, w0_j - sb.matmul(c_j, u0_n, ta=True)
        )
        u1_j = -sb.solve_lower_t(d_j, invd_j, sb.matmul(c_j, u1_n, ta=True))
        a0_j, a1_j = sigma_bb_ut(u0_j, u1_j)
        diag_j = phi_j + sb.matmul(u0_j, a0_j) + sb.matmul(u1_j, a1_j)
        # off pair (j, j+1): Sigma[cs+j+1, cs+j]
        off_j = phi_off + sb.matmul(u0_n, a0_j) + sb.matmul(u1_n, a1_j)
        return (phi_j, u0_j, u1_j, a0_j, a1_j), (diag_j, off_j)

    if s > 2:
        inps = jax.tree.map(lambda a: a[:-1], (ds, invds, cs_, w0s))
        (phi, u0, u1, a0, a1), (diag_mid, off_mid) = jax.lax.scan(
            back, (phi, u0, u1, a0, a1), inps, reverse=True
        )
        # stack interior outputs j = 1..s-1
        diag_int = jnp.concatenate([diag_mid, diag_last[None]], axis=0)
        off_int = off_mid  # pairs (j, j+1) for j = 1..s-2
    else:
        diag_int = diag_last[None]
        off_int = jnp.zeros((0, d, d, R_cm.shape[-1]), dtype=R_cm.dtype)

    # left-edge off block: Sigma[cs+1, cs] = -(u0_1 P00 + u1_1 P10)
    off_edge_left = -(sb.matmul(u0, p00) + sb.matmul(u1, p10))

    # assemble chunk-major [s, d, d, C]
    diag_cm = jnp.concatenate([p00[None], diag_int], axis=0)
    off_cm = jnp.concatenate(
        [off_edge_left[None], off_int, off_edge_right[None]], axis=0
    )
    diag_nat = jnp.transpose(diag_cm, (3, 0, 1, 2)).reshape(-1, d, d)
    off_nat = jnp.transpose(off_cm, (3, 0, 1, 2)).reshape(-1, d, d)
    return diag_nat, off_nat


def _inverse_from_cm_pallas(R_cm, O_cm, jitter):
    """Pallas two-kernel selected inversion: forward raw-factor sweep +
    Takahashi backward recursion (kernels in ops/pallas_sweep.py); the
    small reduced boundary system and the per-chunk edge rows stay XLA.
    """
    from cyclic_gps_tpu.ops import pallas_sweep as ps

    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    (acc00, w0l, dl, invdl,
     ds, invds, cs_, w0s) = ps.forward_sweep_inverse_pallas(
        R_cm, O_cm, jitter=jitter)
    cpad = ds.shape[-1]
    w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
    s11 = sb.matmul(w1, w1, ta=True)
    red_diag = R_cm[0] - acc00 - sb.shift_down(s11)
    red_off = -sb.matmul(w1, w0l, ta=True)

    bb_diag, bb_off = _inverse_impl(
        sb.from_em(red_diag), sb.from_em(red_off)[: c - 1], None, jitter
    )
    p00 = sb.to_em(bb_diag)
    p10 = jnp.concatenate(
        [sb.to_em(bb_off), jnp.zeros((d, d, 1), dtype=R_cm.dtype)], axis=-1
    )
    p11 = sb.shift_up(p00)
    p01 = sb.transpose(p10)

    def sigma_bb_ut(u0, u1):
        a0 = sb.matmul(p00, u0, tb=True) + sb.matmul(p01, u1, tb=True)
        a1 = sb.matmul(p10, u0, tb=True) + sb.matmul(p11, u1, tb=True)
        return a0, a1

    # init at j = s-1 (true-C width, then padded for the kernel)
    di_last = sb.tri_lower_inverse(dl, invdl)
    phi = sb.matmul(di_last, di_last, ta=True)
    u0 = sb.solve_lower_t(dl, invdl, w0l)
    u1 = sb.solve_lower_t(dl, invdl, w1)
    a0, a1 = sigma_bb_ut(u0, u1)
    diag_last = phi + sb.matmul(u0, a0) + sb.matmul(u1, a1)
    off_edge_right = -(
        sb.matmul(p10, u0, tb=True) + sb.matmul(p11, u1, tb=True)
    )

    def pad_eye(a):
        if cpad == c:
            return a
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=a.dtype)[:, :, None], (d, d, cpad - c)
        )
        return jnp.concatenate([a, eye], axis=-1)

    def pad_zero(a):
        if cpad == c:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((d, d, cpad - c), dtype=a.dtype)], axis=-1
        )

    diag_mid_p, off_mid_p, u0f, u1f = ps.takahashi_backward_pallas(
        ds, invds, cs_, w0s,
        pad_eye(p00), pad_zero(p01), pad_zero(p10), pad_eye(p11),
        pad_eye(phi), pad_zero(u0), pad_zero(u1),
        pad_zero(a0), pad_zero(a1),
    )
    diag_mid = diag_mid_p[:, :, :, :c]
    off_mid = off_mid_p[:, :, :, :c]
    u0f, u1f = u0f[:, :, :c], u1f[:, :, :c]

    diag_int = jnp.concatenate([diag_mid, diag_last[None]], axis=0)
    off_int = off_mid
    off_edge_left = -(sb.matmul(u0f, p00) + sb.matmul(u1f, p10))

    diag_cm = jnp.concatenate([p00[None], diag_int], axis=0)
    off_cm = jnp.concatenate(
        [off_edge_left[None], off_int, off_edge_right[None]], axis=0
    )
    diag_nat = jnp.transpose(diag_cm, (3, 0, 1, 2)).reshape(-1, d, d)
    off_nat = jnp.transpose(off_cm, (3, 0, 1, 2)).reshape(-1, d, d)
    return diag_nat, off_nat


# ---------------------------------------------------------------------------
# FUSED solve + selected inversion: the shared backward of every analytic
# VJP (round 5, VERDICT r4 #1).  The backward of (mahal, logdet) / (solve,
# logdet) needs BOTH x = J^{-1} y and the selected blocks of J^{-1}; until
# round 4 it ran two full elimination sweeps (hat collect for the solve,
# raw collect for the Takahashi recursion).  The Takahashi recurrence
# rewritten in HAT variables needs only (hat_c = D^{-T} C^T, hat_w0 =
# D^{-T} W0, pinv = P^{-1} = D^{-T} D^{-1}):
#
#   phi_off_j = -phi_{j+1} hat_c_j^T          (was  -phi C D^{-1})
#   phi_j     = pinv_j + hat_c_j phi_{j+1} hat_c_j^T
#   u0_j      = hat_w0_j - hat_c_j u0_{j+1}
#   u1_j      = -hat_c_j u1_{j+1}
#
# -- identical algebra (hat_c^T = C D^{-1}), but with NO triangular solves
# or inversions left in the recursion: 13 plain block matmuls per step.
# One collect sweep (collect="solve_inverse") therefore serves both the
# back-substitution (hat_c, hat_w0, hat_w) and the Takahashi walk (hat_c,
# hat_w0, pinv); on TPU both walks fuse into ONE descending Pallas kernel
# (ops/pallas_sweep.backward_solve_takahashi_pallas) that reads each hat
# row once.  Reference analog under autograd:
# /root/reference/cyclic_gps/cyclic_reduction.py:441-503.
# ---------------------------------------------------------------------------


def _takahashi_hat_walk(hc_s, hw0_s, pinv_s, hat_w1, p00, p01, p10, p11):
    """Hat-form Takahashi recursion over one level's collected stacks
    (XLA scan; the Pallas twin is fused into
    `backward_solve_takahashi_pallas`).

    hc_s / hw0_s / pinv_s: [s-1, d, d, C] per-step stacks (steps
    j = 1..s-1); hat_w1 = D_{s-1}^{-T} W1; p00/p01/p10/p11: the reduced
    boundary system's selected-inverse blocks [d, d, C].  Returns
    (diag_int [s-1, d, d, C] = Sigma_jj rows j = 1..s-1,
     off_rows [s-1, d, d, C] = Sigma_{j+1, j} rows j = 1..s-1 (row s-1
     is the right-edge block), u0_final, u1_final [d, d, C] -- the
     step-1 carries the caller turns into the left-edge off block)."""

    def sigma_bb_ut(u0, u1):
        a0 = sb.matmul(p00, u0, tb=True) + sb.matmul(p01, u1, tb=True)
        a1 = sb.matmul(p10, u0, tb=True) + sb.matmul(p11, u1, tb=True)
        return a0, a1

    # seed at j = s-1: phi / u0 are literally the stacks' last rows
    phi = pinv_s[-1]
    u0 = hw0_s[-1]
    u1 = hat_w1
    a0, a1 = sigma_bb_ut(u0, u1)
    diag_last = phi + sb.matmul(u0, a0) + sb.matmul(u1, a1)
    off_edge_right = -a1

    def back(carry, inp):
        phi_n, u0_n, u1_n = carry
        hc_j, hw0_j, pinv_j = inp
        phi_off = -sb.matmul(phi_n, hc_j, tb=True)
        phi_j = pinv_j + sb.matmul(sb.matmul(hc_j, phi_n), hc_j, tb=True)
        u0_j = hw0_j - sb.matmul(hc_j, u0_n)
        u1_j = -sb.matmul(hc_j, u1_n)
        a0_j, a1_j = sigma_bb_ut(u0_j, u1_j)
        diag_j = phi_j + sb.matmul(u0_j, a0_j) + sb.matmul(u1_j, a1_j)
        off_j = phi_off + sb.matmul(u0_n, a0_j) + sb.matmul(u1_n, a1_j)
        return (phi_j, u0_j, u1_j), (diag_j, off_j)

    if hc_s.shape[0] > 1:
        inps = (hc_s[:-1], hw0_s[:-1], pinv_s[:-1])
        (phi, u0, u1), (diag_mid, off_mid) = jax.lax.scan(
            back, (phi, u0, u1), inps, reverse=True
        )
        diag_int = jnp.concatenate([diag_mid, diag_last[None]], axis=0)
        off_rows = jnp.concatenate([off_mid, off_edge_right[None]], axis=0)
    else:
        diag_int = diag_last[None]
        off_rows = off_edge_right[None]
    return diag_int, off_rows, u0, u1


def _solve_inverse_em(diag_em, off_em, y_em, jitter):
    """Recursive fused (J^{-1} y, selected inverse) on element-major
    inputs (off_em valid to n-2).  Returns (x [d, n], sig_diag
    [d, d, n], sig_off [d, d, n] with sig_off[..., i] = Sigma_{i+1, i}
    and the trailing slot zero).  The terminal level shares ONE CR
    decomposition between the solve and the selected inversion."""
    d, _, n = diag_em.shape
    s = default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        dec = cr.decompose(sb.from_em(diag_em), sb.from_em(off_em)[: n - 1],
                           jitter=jitter)
        x = cr.solve(dec, sb.vec_from_em(y_em))
        sd, so = cr.inverse_blocks(dec)
        so_em = jnp.concatenate(
            [sb.to_em(so), jnp.zeros((d, d, 1), dtype=diag_em.dtype)],
            axis=-1,
        )
        return sb.vec_to_em(x), sb.to_em(sd), so_em
    R_cm, O_cm, y_cm, c = _chunk_layout_em(diag_em, off_em, y_em, s)
    x_nat, sd_nat, so_nat = _solve_inverse_from_cm(R_cm, O_cm, y_cm,
                                                   jitter, "xla")
    return (sb.vec_to_em(x_nat[:n]), sb.to_em(sd_nat[:n]),
            sb.to_em(so_nat[:n]))


def _solve_inverse_from_cm(R_cm, O_cm, y_cm, jitter, backend: str = "xla"):
    """Fused (x = J^{-1} y, selected inverse of J) on chunk-major inputs
    from ONE forward collect sweep; returns padded natural-order
    (x [C*s, d], sig_diag [C*s, d, d], sig_off [C*s, d, d] with row i =
    Sigma_{i+1, i}).  ``backend="pallas"`` runs the sweep as the
    solve+inverse collect kernel and BOTH upward walks as one fused
    descending kernel."""
    s, d = R_cm.shape[0], R_cm.shape[1]
    c = R_cm.shape[-1]
    if backend == "pallas":
        from cyclic_gps_tpu.ops import pallas_sweep as ps

        (acc00, accy0, w0l, wl, dl, invdl, mh, ld, hc_s, hw0_s, hw_s,
         pinv_s, _) = ps.forward_sweep_solveinv_pallas(R_cm, O_cm, y_cm,
                                                       jitter=jitter)
        state = _SweepState(None, w0l, wl, dl, invdl, acc00, accy0, mh, ld)
        w1 = sb.solve_lower(dl, invdl, sb.transpose(O_cm[s - 1]))
    else:
        state, w1, stacked = _forward_sweep(R_cm, O_cm, y_cm, jitter,
                                            collect="solve_inverse")
        hc_s, hw0_s, hw_s, pinv_s = stacked
    red_diag, red_off, red_rhs = _reduced_system(R_cm, y_cm, state, w1)
    xb, p00, p10 = _solve_inverse_em(red_diag, red_off, red_rhs, jitter)
    p11 = sb.shift_up(p00)
    p01 = sb.transpose(p10)
    hat_w1 = sb.solve_lower_t(state.dj, state.invd, w1)
    xb_next = sb.shift_up(xb)

    if backend == "pallas":
        from cyclic_gps_tpu.ops import pallas_sweep as ps

        cpad = hc_s.shape[-1]

        def padz(a):
            if cpad == c:
                return a
            return jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (cpad - c,), dtype=a.dtype)],
                axis=-1,
            )

        def pade(a):
            if cpad == c:
                return a
            eye = jnp.broadcast_to(
                jnp.eye(d, dtype=a.dtype)[:, :, None], (d, d, cpad - c)
            )
            return jnp.concatenate([a, eye], axis=-1)

        (x_rows, diag_rows, off_rows,
         u0f, u1f) = ps.backward_solve_takahashi_pallas(
            hc_s, hw0_s, hw_s, pinv_s,
            padz(hat_w1), padz(xb), padz(xb_next),
            pade(p00), padz(p01), padz(p10), pade(p11),
        )
        interior = x_rows[:, :, :c]
        diag_int = diag_rows[:, :, :, :c]
        off_rows = off_rows[:, :, :, :c]
        u0f, u1f = u0f[:, :, :c], u1f[:, :, :c]
    else:
        interior = None  # assembled below via _back_substitute
        diag_int, off_rows, u0f, u1f = _takahashi_hat_walk(
            hc_s, hw0_s, pinv_s, hat_w1, p00, p01, p10, p11
        )

    off_edge_left = -(sb.matmul(u0f, p00) + sb.matmul(u1f, p10))
    diag_cm = jnp.concatenate([p00[None], diag_int], axis=0)
    off_cm = jnp.concatenate([off_edge_left[None], off_rows], axis=0)
    sig_diag = jnp.transpose(diag_cm, (3, 0, 1, 2)).reshape(-1, d, d)
    sig_off = jnp.transpose(off_cm, (3, 0, 1, 2)).reshape(-1, d, d)

    if interior is None:
        x_nat = _back_substitute(state, w1, hc_s, hw0_s, hw_s, xb, c,
                                 "xla")
    else:
        x_cm = jnp.concatenate([xb[None], interior], axis=0)
        x_nat = jnp.transpose(x_cm, (2, 0, 1)).reshape(c * s, d)
    return x_nat, sig_diag, sig_off


def solve_and_inverse_cm(R_cm: Array, O_cm: Array, y_cm: Array,
                         jitter: float = 0.0,
                         backend: str = "auto"):
    """(J^{-1} y [C*s, d] padded natural order, Sigma_ii [C*s, d, d],
    Sigma_{i+1,i} [C*s, d, d]) from ONE forward collect sweep + one
    descending pass -- the fused backward primitive of every analytic
    VJP (`_mahal_cm_bwd`, `_solve_cm_bwd`, `_solve_ldr_cm_bwd`).
    Forward-only entry (it IS the backward)."""
    return _solve_inverse_from_cm(R_cm, O_cm, y_cm, jitter,
                                  resolve_backend(backend))


def _from_wide_stack(a11, st):
    """wb.from_wide over a leading stack axis: (a11 [m, 8, 8, C],
    st [m, 3e, 8, C]) -> [m, d, d, C]."""
    e = st.shape[1] // 3
    a21 = st[:, :e]
    a12 = jnp.swapaxes(st[:, e:2 * e], 1, 2)
    a22 = st[:, 2 * e:][:, :, :e, :]
    top = jnp.concatenate([a11, a12], axis=2)
    bot = jnp.concatenate([a21, a22], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _pad_wide_pair(pair, npad, eye):
    """Right-pad a wide (a11, st) pair's chunk axis by ``npad`` lanes
    with identity (``eye=True``) or zero blocks."""
    a11, st = pair
    if not npad:
        return a11, st
    e = st.shape[0] // 3
    dt = a11.dtype
    if eye:
        p11 = jnp.broadcast_to(jnp.eye(8, dtype=dt)[:, :, None],
                               (8, 8, npad))
        pst = jnp.concatenate([
            jnp.zeros((2 * e, 8, npad), dt),
            jnp.broadcast_to(jnp.eye(e, 8, dtype=dt)[:, :, None],
                             (e, 8, npad)),
        ], axis=0)
    else:
        p11 = jnp.zeros((8, 8, npad), dt)
        pst = jnp.zeros((3 * e, 8, npad), dt)
    return (jnp.concatenate([a11, p11], axis=-1),
            jnp.concatenate([st, pst], axis=-1))


def _solve_inverse_wide_cm(r11, rst, o11, ost, y_cm, jitter):
    """Fused (x = J^{-1} y, selected inverse) on WIDE chunk-major inputs
    (round 5): one wide collect sweep (hats + pinv) and ONE wide
    descending kernel for both upward walks.  Returns padded
    natural-order (x [C*s, d], sig_diag [C*s, d, d], sig_off [C*s, d, d]
    with row i = Sigma_{i+1, i}) -- same contract as
    `_solve_inverse_from_cm`."""
    from cyclic_gps_tpu.ops import pallas_wide as pw
    from cyclic_gps_tpu.ops import wideblock as wb

    s = r11.shape[0]
    c = r11.shape[-1]
    d = 8 + rst.shape[1] // 3
    (acc11, accst, accy0, w011, w0st, wl, d11, dst, invd, mh, ld,
     hc11, hcst, hw011, hw0st, hws, pinv11,
     pinvst) = pw.forward_sweep_solveinv_wide_pallas(
        r11, rst, o11, ost, y_cm, jitter=jitter)
    i1 = invd[:8][:, None, :]
    i2 = invd[8:][:, None, :]
    Dw = (d11, dst, i1, i2)
    ot11, otst = wb.wtranspose(o11[s - 1], ost[s - 1])
    w1_11, w1_st = wb.wsolve_lower(*Dw, ot11, otst)
    hw1_11, hw1_st = wb.wsolve_lower_t(*Dw, w1_11, w1_st)
    # C-sized plain conversions for the reduced boundary system
    state = _SweepState(
        None, wb.from_wide(w011, w0st), wl, wb.from_wide(d11, dst),
        invd, wb.from_wide(acc11, accst), accy0, mh, ld,
    )
    w1 = wb.from_wide(w1_11, w1_st)
    r0 = wb.from_wide(r11[0], rst[0])
    red_diag, red_off, red_rhs = _reduced_system(
        r0[None], y_cm[:1], state, w1
    )
    xb, p00, p10 = _solve_inverse_em(red_diag, red_off, red_rhs, jitter)
    p11 = sb.shift_up(p00)
    p01 = sb.transpose(p10)
    xb_next = sb.shift_up(xb)

    cpad = hc11.shape[-1]
    npad = cpad - c

    def padz(a):
        if not npad:
            return a
        return jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (npad,), dtype=a.dtype)],
            axis=-1,
        )

    (x_rows, dg_pair, of_pair, u0f_pair,
     u1f_pair) = pw.backward_solve_takahashi_wide_pallas(
        hc11, hcst, hw011, hw0st, hws, pinv11, pinvst,
        padz(hw1_11), padz(hw1_st), padz(xb), padz(xb_next),
        _pad_wide_pair(wb.to_wide(p00), npad, eye=True),
        _pad_wide_pair(wb.to_wide(p01), npad, eye=False),
        _pad_wide_pair(wb.to_wide(p10), npad, eye=False),
        _pad_wide_pair(wb.to_wide(p11), npad, eye=True),
    )
    interior = x_rows[:, :, :c]
    diag_int = _from_wide_stack(dg_pair[0][..., :c], dg_pair[1][..., :c])
    off_rows = _from_wide_stack(of_pair[0][..., :c], of_pair[1][..., :c])
    u0f = wb.from_wide(u0f_pair[0][..., :c], u0f_pair[1][..., :c])
    u1f = wb.from_wide(u1f_pair[0][..., :c], u1f_pair[1][..., :c])

    off_edge_left = -(sb.matmul(u0f, p00) + sb.matmul(u1f, p10))
    diag_cm = jnp.concatenate([p00[None], diag_int], axis=0)
    off_cm = jnp.concatenate([off_edge_left[None], off_rows], axis=0)
    sig_diag = jnp.transpose(diag_cm, (3, 0, 1, 2)).reshape(-1, d, d)
    sig_off = jnp.transpose(off_cm, (3, 0, 1, 2)).reshape(-1, d, d)
    x_cm = jnp.concatenate([xb[None], interior], axis=0)
    x_nat = jnp.transpose(x_cm, (2, 0, 1)).reshape(c * s, d)
    return x_nat, sig_diag, sig_off


def _solve_inverse_nat(diag, off, y, s, jitter, backend):
    """Natural-layout fused (x, sig_diag, sig_off) -- the wide VJPs'
    backward.  For 8 < d < 16 under the pallas backend this routes
    through the WIDE fused pair (8-aligned stacks + blocked-panel
    matmuls; the hat-form walk has no triangular ops, so the wide
    algebra wins where the RAW wide Takahashi lost at d >= 12)."""
    n, d = y.shape
    s = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        dec = cr.decompose(diag, off, jitter=jitter)
        x = cr.solve(dec, y)
        sd, so = cr.inverse_blocks(dec)
        return x, sd, so
    if 8 < d < 16 and backend == "pallas":
        r11, rst, o11, ost, y_cm, _ = _chunk_layout_wide(diag, off, y, s)
        x_nat, sd_nat, so_nat = _solve_inverse_wide_cm(
            r11, rst, o11, ost, y_cm, jitter)
        return x_nat[:n], sd_nat[:n], so_nat[: n - 1]
    R_cm, O_cm, y_cm, _ = _chunk_layout(diag, off, y, s)
    x_nat, sd_nat, so_nat = _solve_inverse_from_cm(R_cm, O_cm, y_cm,
                                                   jitter, backend)
    return x_nat[:n], sd_nat[:n], so_nat[: n - 1]


def inverse_blocks_cm(R_cm: Array, O_cm: Array,
                      jitter: float = 0.0,
                      backend: str = "xla") -> Tuple[Array, Array]:
    """Selected inverse on chunk-major inputs; padded natural order
    ([C*s, d, d], [C*s, d, d]; the caller slices to [:n] / [:n-1]).
    ``backend``: "xla", "pallas", or "auto" (pallas on TPU)."""
    return _inverse_from_cm(R_cm, O_cm, jitter, resolve_backend(backend))


@partial(jax.jit, static_argnames=("s", "jitter", "backend"))
def inverse_blocks(
    diag: Array,
    off: Array,
    s: Optional[int] = None,
    jitter: float = 0.0,
    backend: str = "auto",
) -> Tuple[Array, Array]:
    """Diagonal and lower off-diagonal blocks of J^{-1} (selected
    inversion) via recursive partitioned elimination.  Matches
    cr.inverse_blocks (tests/test_partitioned.py); O(1) program size and
    one streaming pass per recursion level.  Top level routes through
    the chunk-major entry (Pallas Takahashi kernels on TPU)."""
    n, d, _ = diag.shape
    s = s or default_chunk_len(n)
    if n < max(_TERMINAL, 2 * s):
        dec = cr.decompose(diag, off, jitter=jitter)
        return cr.inverse_blocks(dec)
    if 8 < d < 11 and s >= 3 and resolve_backend(backend) == "pallas":
        # wide-layout kernels.  Unlike the sweeps (DMA-bound, wide wins
        # ~1.3-1.5x for all 8 < d < 16), the Takahashi recursion is
        # compute-bound: wide's blocked panels win at d = 9 (60.6 vs
        # 66.9 ms at N = 1e6), tie at d = 10, and LOSE at d >= 12
        # (90.7 vs 81.2 at d = 12) -- the strip algebra's extra column
        # passes outweigh the 8-alignment once e = d - 8 grows.
        return _inverse_wide(diag, off, s, jitter)
    R_cm, O_cm, _, _ = _chunk_layout(diag, off, None, s)
    diag_nat, off_nat = _inverse_from_cm(R_cm, O_cm, jitter,
                                         resolve_backend(backend))
    return diag_nat[:n], off_nat[: n - 1]
