"""Element-major batched matrix exponential tests."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from cyclic_gps_tpu.ops import smallblock as sb
from cyclic_gps_tpu.ops.expm_em import expm_em


def _batch(scales, d=6, seed=0, lean=-0.3):
    rng = np.random.RandomState(seed)
    mats = []
    for scale in scales:
        for _ in range(6):
            m = rng.randn(d, d) * scale / d + np.eye(d) * scale * lean
            mats.append(m)
    return np.stack(mats)


def test_matches_scipy_across_norms():
    mats = _batch([1e-6, 1e-3, 0.3, 1.0, 7.0, 50.0])
    ref = np.stack([sla.expm(m) for m in mats])
    out = np.asarray(sb.from_em(expm_em(sb.to_em(jnp.asarray(mats)))))
    denom = np.maximum(np.abs(ref).max(axis=(1, 2), keepdims=True), 1e-12)
    assert (np.abs(out - ref) / denom).max() < 1e-12


def test_custom_vjp_matches_jax_expm_grad():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(3, 3, 5) * 1.5)
    w = jnp.asarray(rng.randn(3, 3, 5))

    g = jax.grad(lambda m: jnp.sum(expm_em(m) * w))(a)

    def ref(m):
        outs = [jax.scipy.linalg.expm(m[:, :, k]) for k in range(5)]
        return jnp.sum(jnp.stack(outs, axis=-1) * w)

    g_ref = jax.grad(ref)(a)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-12)


def test_identity_and_zero():
    z = jnp.zeros((4, 4, 3))
    np.testing.assert_allclose(
        np.asarray(sb.from_em(expm_em(z))), np.broadcast_to(np.eye(4), (3, 4, 4)),
        atol=1e-15,
    )


def test_lu_solve_pivoted():
    """Partial-pivoted element-major solve handles near-zero leading
    pivots that the unpivoted Pade-denominator solver would amplify
    (ADVICE round 1, item 2: the parallel-filter combine's (I + C J)
    systems have eigenvalues >= 1 but no bound on the leading pivot)."""
    from cyclic_gps_tpu.ops.expm_em import lu_solve_pivoted

    rng = np.random.RandomState(0)
    d, B = 5, 64
    a = rng.randn(d, d, B)
    a[0, 0, :] = 1e-14  # pathological leading pivot
    b = rng.randn(d, 3, B)
    x = np.asarray(lu_solve_pivoted(jnp.asarray(a), jnp.asarray(b)))
    for k in range(B):
        np.testing.assert_allclose(
            x[:, :, k], np.linalg.solve(a[:, :, k], b[:, :, k]),
            rtol=1e-8, atol=1e-10,
        )


def test_transition_and_noise_pallas_matches_xla():
    """The fused Pallas (e, Q) kernel (interpret mode in CI) matches the
    XLA hybrid construction across gap scales, including the
    branch-switch region and the squaring path."""
    from jax.experimental.pallas import tpu as pltpu

    from cyclic_gps_tpu.models import leg
    from cyclic_gps_tpu.ops.expm_pallas import transition_and_noise_pallas

    rng = np.random.RandomState(0)
    r = 4
    z = rng.randn(r, r)
    g = jnp.asarray((z @ z.T * 0.3 + (z - z.T)) +
                    1e-5 * np.eye(r), jnp.float32)
    diffs = jnp.asarray(np.logspace(-4, 2, 700), jnp.float32)
    e_x, q_x = leg._transition_and_noise_em_xla(g, diffs)
    with pltpu.force_tpu_interpret_mode():
        e_p, q_p = transition_and_noise_pallas(g, diffs)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_x),
                               rtol=1e-4, atol=1e-5)


def test_tn_pallas_custom_vjp_matches_xla_grad():
    """The custom VJP of the Pallas dispatch replays the XLA adjoint."""
    from cyclic_gps_tpu.models import leg

    rng = np.random.RandomState(1)
    r = 3
    z = rng.randn(r, r)
    g = jnp.asarray((z - z.T) * 0.4 + np.eye(r), jnp.float32)
    diffs = jnp.asarray(rng.uniform(0.05, 2.0, 40), jnp.float32)
    w_e = jnp.asarray(rng.randn(r, r, 40), jnp.float32)
    w_q = jnp.asarray(rng.randn(r, r, 40), jnp.float32)

    def loss_path(fn):
        def f(g_, d_):
            e, q = fn(g_, d_)
            return jnp.sum(w_e * e) + jnp.sum(w_q * q)
        return jax.grad(f, argnums=(0, 1))(g, diffs)

    # the dispatch resolves to XLA on CPU; exercise the custom-VJP
    # machinery directly against the XLA autodiff
    g1 = loss_path(leg._transition_and_noise_em_xla)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        g2 = loss_path(leg._tn_pallas_diff)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_tn_replay_structured_matches_xla():
    """The structured Pade-7 adjoint replay (ops/expm_pallas.
    tn_replay_structured) matches the generic Pade-13 XLA path in value
    AND gradient across gap scales — including lanes needing unrolled
    squaring rounds (dt*augn > theta_7) and the branch switch.  A
    non-normal generator exercises the augmented-norm scaling."""
    from cyclic_gps_tpu.models import leg
    from cyclic_gps_tpu.ops.expm_pallas import tn_replay_structured

    rng = np.random.RandomState(3)
    r = 4
    z = rng.randn(r, r)
    g = jnp.asarray(z @ z.T * 0.3 + (z - z.T) * 1.5 + np.eye(r),
                    jnp.float32)
    diffs = jnp.asarray(np.logspace(-4, 2, 300), jnp.float32)

    e_x, q_x = leg._transition_and_noise_em_xla(g, diffs)
    e_s, q_s = tn_replay_structured(g, diffs)
    np.testing.assert_allclose(np.asarray(e_s), np.asarray(e_x),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(q_s), np.asarray(q_x),
                               rtol=2e-4, atol=2e-5)

    n = diffs.shape[0]
    w_e = jnp.asarray(rng.randn(r, r, n), jnp.float32)
    w_q = jnp.asarray(rng.randn(r, r, n), jnp.float32)

    def grads(fn):
        def f(g_, d_):
            e, q = fn(g_, d_)
            return jnp.sum(w_e * e) + jnp.sum(w_q * q)
        return jax.grad(f, argnums=(0, 1))(g, diffs)

    gx = grads(leg._transition_and_noise_em_xla)
    gs = grads(tn_replay_structured)
    for a, b in zip(gx, gs):
        scale = max(np.abs(np.asarray(a)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=5e-4, atol=5e-5)


def test_k_system_pallas_matches_xla():
    """The fused K-system emission kernel (interpret mode in CI) matches
    the XLA gap assembly -- values AND the custom-VJP gradient (which
    replays the XLA path; padding-chunk cotangents drop exactly)."""
    from jax.experimental.pallas import tpu as pltpu

    from cyclic_gps_tpu.models import leg

    rank, obs, n, s = 3, 2, 37, 4
    params = leg.init_params(jax.random.key(0), rank=rank, obs_dim=obs,
                             dtype=jnp.float32)
    g = leg.g_matrix(params)
    llt = leg.lambda_lambda_t(params)
    boost = params.b.T @ jnp.linalg.solve(llt, params.b)
    ts = jnp.cumsum(
        jax.random.exponential(jax.random.key(1), (n,)) * 0.3 + 0.01
    ).astype(jnp.float32)
    c = -(-n // s)

    k_x, o_x, lq_x = leg._k_gap_parts_xla(g, boost, ts, s, False, rank,
                                          jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        k_p, o_p, lq_p = leg._k_gap_parts_pallas(
            g, boost, ts, jnp.ones_like(ts), s)
    np.testing.assert_allclose(np.asarray(k_p[..., :c]), np.asarray(k_x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_p[..., :c]), np.asarray(o_x),
                               rtol=1e-3, atol=1e-4)
    # per-gap log|Q1| rows (kernel-tile padding lanes exactly zero)
    np.testing.assert_allclose(np.asarray(lq_p[:, :c]), np.asarray(lq_x),
                               rtol=1e-4, atol=1e-6)
    assert float(jnp.sum(jnp.abs(lq_p[:, c:]))) == 0.0

    rng = np.random.RandomState(2)
    w_k = jnp.asarray(rng.randn(*k_x.shape), jnp.float32)
    w_o = jnp.asarray(rng.randn(*o_x.shape), jnp.float32)
    w_l = jnp.asarray(rng.randn(*lq_x.shape), jnp.float32)

    def loss_x(g_, b_):
        k, o, lq = leg._k_gap_parts_xla(g_, b_, ts, s, False, rank,
                                        jnp.float32)
        return jnp.sum(k * w_k) + jnp.sum(o * w_o) + jnp.sum(lq * w_l)

    def loss_p(g_, b_):
        k, o, lq = leg._k_gap_parts_pallas(g_, b_, ts, jnp.ones_like(ts), s)
        return (jnp.sum(k[..., :c] * w_k) + jnp.sum(o[..., :c] * w_o)
                + jnp.sum(lq[:, :c] * w_l))

    g1 = jax.grad(loss_x, argnums=(0, 1))(g, boost)
    with pltpu.force_tpu_interpret_mode():
        g2 = jax.grad(loss_p, argnums=(0, 1))(g, boost)
    for a, b in zip(g1, g2):
        # f32 bar: since round 4 the pallas backward is the ANALYTIC
        # in-VMEM adjoint kernel (expm_pallas.k_system_adjoint_pallas)
        # -- same mathematical gradient as the XLA replay but a
        # different f32 operation ordering (observed max rel ~1e-4)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)
