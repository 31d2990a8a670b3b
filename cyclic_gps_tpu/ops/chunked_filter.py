"""Chunk-parallel CONDITIONAL Kalman filter: the O(N r^2 q) solve.

The precision-form partitioned engine eliminates dense [r, r] blocks at
O(r^3) work per step (Cholesky + triangular solves + Schur products).
When the transition is structured (celerite: block-diagonal 2x2
oscillators) the covariance-form Kalman filter needs only O(r^2 q) per
step -- no r x r factorization at all, just q x q innovation inverses --
but a filter is sequential across the whole series.  This module makes
it chunk-parallel EXACTLY:

  * Split the series into C chunks of s rows.  Interiors are
    conditionally independent given the boundary latents z_{b_c}
    (Markov property) -- the same decomposition the partitioned
    elimination engine uses (ops/partitioned.py), in covariance form.
  * Per chunk, run a Kalman filter CONDITIONED on the unknown boundary
    state z = z_{b_c}: with a deterministic-but-unknown init, every
    filter mean is AFFINE in z (m_j = a_j + F_j z) while the
    covariances P_j, innovation covariances S_j and gains K_j do not
    depend on z.  Accumulate the innovation quadratic
        sum_j |y_j - B m_j|^2_{S_j^{-1}}
          = z^T H z - 2 h^T z + c0,    H = sum F_j^T B^T S_j^{-1} B F_j
    plus sum log|S_j|, and the end-of-chunk map
    p(z_{b_{c+1}} | y_c, z) = N(a_s + F_s z, P_s).
  * The boundary latents then carry a C-node Gaussian chain whose
    block-tridiagonal precision/rhs are assembled from (H, h, F_s, a_s,
    P_s^{-1}); its (mahal, logdet) -- the existing partitioned reduced
    machinery -- finishes the marginal likelihood in closed form.

Exactness: verified against the dense O(N^3) marginal likelihood to
machine precision (tests/test_celerite.py).  Numerics: the innovation
form is the f32-SAFE organisation (S_j >= Lambda; the one r x r
inverse per CHUNK, P_s, has s-step-composed conditioning, not
single-gap conditioning), and masked/padded gaps degenerate cleanly
because only Q -- never Q^{-1} -- appears (dt = 0 gives e = I, Q = 0:
an exact no-op step).

Reference being completed: the celerite total-inference story the
`CeleriteFamily` sketch points at (cyclic_gps/models.py:552-592); the
reference itself solves nothing faster than its dense-block CR.

This XLA implementation is the parity oracle and CPU path; the TPU hot
path constructs (e, Q) closed-form in VMEM and runs the same recursion
as a Pallas kernel (ops/celerite_pallas.celerite_filter_sweep_pallas).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.ops import partitioned as pt

Array = jnp.ndarray


class ChunkFilterOut(NamedTuple):
    """Per-chunk conditional-filter sufficient statistics (batch-major).

    H [C, r, r], h [C, r], c0 [C], ld_s [C]: the innovation quadratic
    z^T H z - 2 h^T z + c0 and sum log|S_j| of chunk c as a function of
    its boundary latent z.  f_map [C, r, r], a_map [C, r], p_map
    [C, r, r]: the boundary map z_{b_{c+1}} | z_{b_c} = z ~
    N(a + F z, P) (row C-1's map crosses the series end and is unused).
    """

    H: Array
    h: Array
    c0: Array
    ld_s: Array
    f_map: Array
    a_map: Array
    p_map: Array


def conditional_filter_xla(e_cm: Array, q_cm: Array, bmat: Array,
                           lam: Array, y_cm: Array,
                           valid_cm: Array) -> ChunkFilterOut:
    """Batched conditional Kalman filters, one per chunk (XLA scan).

    e_cm / q_cm [s, C, r, r]: transition / process noise of the gap
    FOLLOWING row j of chunk c (row s-1's gap crosses into chunk c+1);
    invalid gaps MUST carry e = I, q = 0 (exact no-op).  y_cm [s, C, q]
    observations; valid_cm [s, C] 1.0 where row (j, c) is a real
    observation.  bmat [q, r], lam [q, q] observation model."""
    s, c, r, _ = e_cm.shape
    qd = bmat.shape[0]
    dtype = e_cm.dtype
    eye_r = jnp.eye(r, dtype=dtype)

    def step(carry, inp):
        a, F, P, H, h, c0, ld = carry
        e, q, y, v = inp
        # ---- update (masked by v) ----
        S = jnp.einsum("ai,cij,bj->cab", bmat, P, bmat) + lam[None]
        Si = jnp.linalg.inv(S)
        resid = y - jnp.einsum("ai,ci->ca", bmat, a)
        Gj = jnp.einsum("ai,cij->caj", bmat, F)          # [C, q, r]
        SiG = jnp.einsum("cab,cbj->caj", Si, Gj)
        Sr = jnp.einsum("cab,cb->ca", Si, resid)
        vv = v[:, None, None]
        H = H + vv * jnp.einsum("cai,caj->cij", Gj, SiG)
        h = h + v[:, None] * jnp.einsum("cai,ca->ci", Gj, Sr)
        c0 = c0 + v * jnp.einsum("ca,ca->c", resid, Sr)
        ld = ld + v * jnp.linalg.slogdet(S)[1]
        PBt = jnp.einsum("cij,aj->cia", P, bmat)         # [C, r, q]
        K = jnp.einsum("cia,cab->cib", PBt, Si)          # [C, r, q]
        a = a + v[:, None] * jnp.einsum("cia,ca->ci", K, resid)
        F = F - vv * jnp.einsum("cia,caj->cij", K, Gj)
        P = P - vv * jnp.einsum("cia,cja->cij", K, PBt)
        # ---- predict through the following gap ----
        a = jnp.einsum("cij,cj->ci", e, a)
        F = jnp.einsum("cij,cjk->cik", e, F)
        P = jnp.einsum("cij,cjk,clk->cil", e, P, e) + q
        return (a, F, P, H, h, c0, ld), None

    init = (
        jnp.zeros((c, r), dtype),
        jnp.broadcast_to(eye_r, (c, r, r)).astype(dtype),
        jnp.zeros((c, r, r), dtype),
        jnp.zeros((c, r, r), dtype),
        jnp.zeros((c, r), dtype),
        jnp.zeros((c,), dtype),
        jnp.zeros((c,), dtype),
    )
    (a, F, P, H, h, c0, ld), _ = jax.lax.scan(
        step, init, (e_cm, q_cm, y_cm, valid_cm)
    )
    return ChunkFilterOut(H, h, c0, ld, F, a, P)


def conditional_filter_collect_xla(e_cm: Array, q_cm: Array, bmat: Array,
                                   lam: Array, y_cm: Array,
                                   valid_cm: Array):
    """`conditional_filter_xla` that ALSO returns the per-step pre-update
    states (a_j, F_j, P_j) [s, C, ...] -- the minimal residual stream the
    analytic adjoint consumes (everything else -- S, S^{-1}, the gain --
    is O(r^2 q)-recomputable from them).  Used by the backward pass
    only; the plain forward never materialises the histories."""
    s, c, r, _ = e_cm.shape
    dtype = e_cm.dtype
    eye_r = jnp.eye(r, dtype=dtype)

    def step(carry, inp):
        a0, F0, P0, H, h, c0, ld = carry
        e, q, y, v = inp
        S = jnp.einsum("ai,cij,bj->cab", bmat, P0, bmat) + lam[None]
        Si = jnp.linalg.inv(S)
        resid = y - jnp.einsum("ai,ci->ca", bmat, a0)
        Gj = jnp.einsum("ai,cij->caj", bmat, F0)
        SiG = jnp.einsum("cab,cbj->caj", Si, Gj)
        Sr = jnp.einsum("cab,cb->ca", Si, resid)
        vv = v[:, None, None]
        H = H + vv * jnp.einsum("cai,caj->cij", Gj, SiG)
        h = h + v[:, None] * jnp.einsum("cai,ca->ci", Gj, Sr)
        c0 = c0 + v * jnp.einsum("ca,ca->c", resid, Sr)
        ld = ld + v * jnp.linalg.slogdet(S)[1]
        PBt = jnp.einsum("cij,aj->cia", P0, bmat)
        K = jnp.einsum("cia,cab->cib", PBt, Si)
        a = a0 + v[:, None] * jnp.einsum("cia,ca->ci", K, resid)
        F = F0 - vv * jnp.einsum("cia,caj->cij", K, Gj)
        P = P0 - vv * jnp.einsum("cia,cja->cij", K, PBt)
        a = jnp.einsum("cij,cj->ci", e, a)
        F = jnp.einsum("cij,cjk->cik", e, F)
        P = jnp.einsum("cij,cjk,clk->cil", e, P, e) + q
        return (a, F, P, H, h, c0, ld), (a0, F0, P0)

    init = (
        jnp.zeros((c, r), dtype),
        jnp.broadcast_to(eye_r, (c, r, r)).astype(dtype),
        jnp.zeros((c, r, r), dtype),
        jnp.zeros((c, r, r), dtype),
        jnp.zeros((c, r), dtype),
        jnp.zeros((c,), dtype),
        jnp.zeros((c,), dtype),
    )
    (a, F, P, H, h, c0, ld), hist = jax.lax.scan(
        step, init, (e_cm, q_cm, y_cm, valid_cm)
    )
    return ChunkFilterOut(H, h, c0, ld, F, a, P), hist


def conditional_filter_adjoint_xla(e_cm: Array, q_cm: Array, bmat: Array,
                                   lam: Array, y_cm: Array,
                                   valid_cm: Array, hist, cots):
    """Analytic adjoint of `conditional_filter_xla`: O(r^2 q) per step --
    the SAME scaling as the forward, vs the autodiff replay's extra
    residual streams.  ``hist`` is `conditional_filter_collect_xla`'s
    per-step (a_j, F_j, P_j); ``cots`` a ChunkFilterOut of output
    cotangents.  Returns (ebar, qbar, Bbar, Lambar, ybar) -- cotangents
    of (e_cm, q_cm, bmat, lam, y_cm).

    Structure: the accumulators (H, h, c0, ld) pass through every step,
    so their cotangents are step-constant; the carried state cotangents
    (abar, Fbar, Pbar) run a REVERSE recursion whose per-step
    coefficients are recomputed from the stored pre-update state.  Each
    line transposes one forward einsum exactly (incl. the inv/slogdet
    transposes), so parity with `jax.vjp` of the forward is
    machine-precision (tests/test_chunked.py)."""
    Hb, hb, c0b, ldb, Fsb, asb, Psb = cots

    def astep(carry, inp):
        abar_n, Fbar_n, Pbar_n, Bbar, Lambar = carry
        e, q, y, v, a0, F0, P0 = inp
        vv = v[:, None, None]
        # ---- recompute the forward intermediates (O(r^2 q)) ----
        S = jnp.einsum("ai,cij,bj->cab", bmat, P0, bmat) + lam[None]
        Si = jnp.linalg.inv(S)
        resid = y - jnp.einsum("ai,ci->ca", bmat, a0)
        Gj = jnp.einsum("ai,cij->caj", bmat, F0)
        SiG = jnp.einsum("cab,cbj->caj", Si, Gj)
        Sr = jnp.einsum("cab,cb->ca", Si, resid)
        PBt = jnp.einsum("cij,aj->cia", P0, bmat)
        K = jnp.einsum("cia,cab->cib", PBt, Si)
        a1 = a0 + v[:, None] * jnp.einsum("cia,ca->ci", K, resid)
        F1 = F0 - vv * jnp.einsum("cia,caj->cij", K, Gj)
        P1 = P0 - vv * jnp.einsum("cia,cja->cij", K, PBt)
        # ---- predict adjoint: a' = e a1, F' = e F1, P' = e P1 e^T + q
        qbar = Pbar_n
        ebar = (
            jnp.einsum("ci,cj->cij", abar_n, a1)
            + jnp.einsum("cik,cjk->cij", Fbar_n, F1)
            + jnp.einsum("cik,ckl,cjl->cij", Pbar_n, e, P1)
            + jnp.einsum("cki,ckl,clj->cij", Pbar_n, e, P1)
        )
        abar1 = jnp.einsum("cji,cj->ci", e, abar_n)
        Fbar1 = jnp.einsum("cji,cjk->cik", e, Fbar_n)
        Pbar1 = jnp.einsum("cji,cjk,ckl->cil", e, Pbar_n, e)
        # ---- update adjoint ----
        Kbar = (
            jnp.einsum("ci,ca->cia", abar1, resid)
            - jnp.einsum("cij,caj->cia", Fbar1, Gj)
            - jnp.einsum("cij,cja->cia", Pbar1, PBt)
        ) * vv
        rbar = v[:, None] * (
            jnp.einsum("cia,ci->ca", K, abar1)
            + jnp.einsum("cai,ci->ca", SiG, hb)
            + 2.0 * c0b[:, None] * Sr
        )
        Gbar = v[:, None, None] * (
            -jnp.einsum("cia,cij->caj", K, Fbar1)
            + jnp.einsum("cai,cij->caj", SiG, Hb + jnp.swapaxes(Hb, 1, 2))
            + jnp.einsum("ca,ci->cai", Sr, hb)
        )
        Sibar = (
            jnp.einsum("cia,cib->cab", PBt, Kbar)
            + vv * (
                jnp.einsum("cai,cij,cbj->cab", Gj, Hb, Gj)
                + jnp.einsum("cai,ci,cb->cab", Gj, hb, resid)
                + c0b[:, None, None]
                * jnp.einsum("ca,cb->cab", resid, resid)
            )
        )
        PBtbar = (
            -vv * jnp.einsum("cji,cja->cia", Pbar1, K)
            + jnp.einsum("cib,cab->cia", Kbar, Si)
        )
        # slogdet grad = S^{-T}; inv grad = -S^{-T} Sibar S^{-T}
        SiT = jnp.swapaxes(Si, 1, 2)
        Sbar = (v * ldb)[:, None, None] * SiT - jnp.einsum(
            "cab,cbd,cde->cae", SiT, Sibar, SiT
        )
        abar = abar1 - jnp.einsum("ai,ca->ci", bmat, rbar)
        Fbar = Fbar1 + jnp.einsum("ai,caj->cij", bmat, Gbar)
        Pbar = (
            Pbar1
            + jnp.einsum("cia,aj->cij", PBtbar, bmat)
            + jnp.einsum("ai,cab,bj->cij", bmat, Sbar, bmat)
        )
        ybar = rbar
        Bbar = Bbar + (
            jnp.einsum("cia,cij->caj", PBtbar, P0)
            + jnp.einsum("caj,cij->cai", Gbar, F0)
            - jnp.einsum("ca,ci->cai", rbar, a0)
            + jnp.einsum("cab,bi,cji->caj", Sbar, bmat, P0)
            + jnp.einsum("cba,bi,cij->caj", Sbar, bmat, P0)
        ).sum(axis=0)
        Lambar = Lambar + Sbar.sum(axis=0)
        return (abar, Fbar, Pbar, Bbar, Lambar), (ebar, qbar, ybar)

    a_h, F_h, P_h = hist
    carry0 = (asb, Fsb, Psb, jnp.zeros_like(bmat), jnp.zeros_like(lam))
    (abar, Fbar, Pbar, Bbar, Lambar), (ebar, qbar, ybar) = jax.lax.scan(
        astep, carry0, (e_cm, q_cm, y_cm, valid_cm, a_h, F_h, P_h),
        reverse=True,
    )
    # the carry cotangents at j = 0 belong to the constant init
    # (a = 0, F = I, P = 0) and are discarded
    del abar, Fbar, Pbar
    return ebar, qbar, Bbar, Lambar, ybar


@jax.custom_vjp
def conditional_filter(e_cm: Array, q_cm: Array, bmat: Array, lam: Array,
                       y_cm: Array, valid_cm: Array) -> ChunkFilterOut:
    """Differentiable `conditional_filter_xla`: the analytic O(r^2 q)
    adjoint replaces autodiff-through-the-scan (which stores ~4x the
    residual streams and was the reason celerite training could not
    ride the filter route -- VERDICT r4 #2)."""
    return conditional_filter_xla(e_cm, q_cm, bmat, lam, y_cm, valid_cm)


def _cf_fwd(e_cm, q_cm, bmat, lam, y_cm, valid_cm):
    # store only the INPUTS; the backward re-runs one forward collect
    # sweep (the per-step state histories are 2 r^2 + r floats/step --
    # writing them in the primal would tax every forward-only call)
    return (conditional_filter_xla(e_cm, q_cm, bmat, lam, y_cm, valid_cm),
            (e_cm, q_cm, bmat, lam, y_cm, valid_cm))


def _cf_bwd(res, cots):
    e_cm, q_cm, bmat, lam, y_cm, valid_cm = res
    _, hist = conditional_filter_collect_xla(
        e_cm, q_cm, bmat, lam, y_cm, valid_cm
    )
    ebar, qbar, Bbar, Lambar, ybar = conditional_filter_adjoint_xla(
        e_cm, q_cm, bmat, lam, y_cm, valid_cm, hist, tuple(cots)
    )
    return ebar, qbar, Bbar, Lambar, ybar, jnp.zeros_like(valid_cm)


conditional_filter.defvjp(_cf_fwd, _cf_bwd)


def boundary_loglik(out: ChunkFilterOut, nq_total: Array,
                    jitter: float = 0.0) -> Array:
    """Finish the marginal log-likelihood from per-chunk statistics.

    Integrates the boundary-latent chain exactly: a C-node Gaussian
    chain with block-tridiagonal precision assembled from the chunk
    quadratics and maps, solved by the partitioned engine.  ``nq_total``
    is the total number of observed SCALARS (sum of valid rows times
    obs_dim) for the 2-pi normalisation."""
    H, h, c0, ld_s, F, a, P = out
    c, r, _ = H.shape
    dtype = H.dtype
    log2pi = jnp.log(2.0 * jnp.pi).astype(dtype)
    eye_r = jnp.eye(r, dtype=dtype)

    Pm, Fm, am = P[:-1], F[:-1], a[:-1]
    chol = jnp.linalg.cholesky(Pm + jitter * eye_r[None])
    ld_p = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )
    pinv = jax.scipy.linalg.cho_solve(
        (chol, True), jnp.broadcast_to(eye_r, Pm.shape)
    )
    pi_f = jnp.einsum("cij,cjk->cik", pinv, Fm)
    pi_a = jnp.einsum("cij,cj->ci", pinv, am)

    diag = H.at[0].add(eye_r)                       # prior z_0 ~ N(0, I)
    diag = diag.at[:-1].add(jnp.einsum("cki,ckj->cij", Fm, pi_f))
    diag = diag.at[1:].add(pinv)
    off = -pi_f                                     # block (c+1, c)
    rhs = h.at[:-1].add(-jnp.einsum("cki,ck->ci", Fm, pi_a))
    rhs = rhs.at[1:].add(pi_a)

    const = (
        nq_total * log2pi + r * log2pi
        + jnp.sum(c0) + jnp.sum(ld_s)
        + jnp.sum(jnp.einsum("ci,ci->c", am, pi_a))
        + jnp.sum(ld_p) + (c - 1) * r * log2pi
    )
    mah, ld_k = pt.mahal_and_logdet(diag, off, rhs, jitter=jitter)
    return -0.5 * (const + ld_k - mah) + 0.5 * c * r * log2pi


def boundary_loglik_em(stats_em, nq_total: Array,
                       jitter: float = 0.0) -> Array:
    """`boundary_loglik` on ELEMENT-MAJOR per-chunk statistics.

    stats_em = (H [r, r, C], h [r, C], c0 [C], ld_s [C], F [r, r, C],
    a [r, C], P [r, r, C]) -- the layout the Pallas filter sweep
    produces natively.  Same math as `boundary_loglik`; the small-block
    element-major algebra replaces the batched [C, r, r] dense linalg
    (on TPU, [r, r] einsum matmuls MXU-pad to 128x128 and the [C, r, r]
    <-> [r, r, C] transposes round-trip ~40 MB of HBM at C ~ 8e3 --
    together they cost more than the filter sweep kernel itself)."""
    from cyclic_gps_tpu.ops import smallblock as sb

    H, h, c0, ld_s, F, a, P = stats_em
    r, _, c = H.shape
    dtype = H.dtype
    log2pi = jnp.log(2.0 * jnp.pi).astype(dtype)

    Pm, Fm, am = P[..., :-1], F[..., :-1], a[..., :-1]
    lp, invd = sb.cholesky(Pm, jitter=jitter)
    ld_p_total = 2.0 * sb.chol_log_diag_sum(lp)
    pinv = sb.solve_lower_t(
        lp, invd, sb.solve_lower(lp, invd, sb.identity_like(Pm))
    )
    pi_f = sb.matmul(pinv, Fm)
    pi_a = sb.solve_lower_t_vec(lp, invd, sb.solve_lower_vec(lp, invd, am))

    def pad_right(x):
        return jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (1,), dtype)], axis=-1)

    def pad_left(x):
        return jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (1,), dtype), x], axis=-1)

    eye0 = jnp.concatenate(
        [jnp.eye(r, dtype=dtype)[:, :, None],
         jnp.zeros((r, r, c - 1), dtype)], axis=-1)  # prior z_0 ~ N(0, I)
    diag = H + eye0 + pad_right(sb.matmul(Fm, pi_f, ta=True)) \
        + pad_left(pinv)
    off = -pi_f                                      # block (c+1, c)
    rhs = h + pad_right(-sb.matvec(Fm, pi_a, ta=True)) + pad_left(pi_a)

    const = (
        nq_total * log2pi + r * log2pi
        + jnp.sum(c0) + jnp.sum(ld_s)
        + jnp.sum(am * pi_a)
        + ld_p_total + (c - 1) * r * log2pi
    )
    mah, ld_k = pt.mahal_and_logdet(
        sb.from_em(diag), sb.from_em(off), sb.vec_from_em(rhs),
        jitter=jitter,
    )
    return -0.5 * (const + ld_k - mah) + 0.5 * c * r * log2pi
