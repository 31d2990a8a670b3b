"""Wide-block (8 < d <= 16) algebra vs dense element-major references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclic_gps_tpu.ops import smallblock as sb
from cyclic_gps_tpu.ops import wideblock as wb


def _batch(d, c, seed=0, spd=False):
    rng = np.random.RandomState(seed)
    x = rng.randn(d, d, c)
    if spd:
        xn = np.einsum("ijc,kjc->ikc", x, x) / d + 3 * np.eye(d)[:, :, None]
        return jnp.asarray(xn)
    return jnp.asarray(x)


@pytest.mark.parametrize("d", [9, 12, 16])
def test_roundtrip_and_transpose(d):
    a = _batch(d, 5, seed=d)
    a11, st = wb.to_wide(a)
    np.testing.assert_allclose(np.asarray(wb.from_wide(a11, st)),
                               np.asarray(a), atol=0)
    t11, tst = wb.wtranspose(a11, st)
    np.testing.assert_allclose(np.asarray(wb.from_wide(t11, tst)),
                               np.asarray(sb.transpose(a)), atol=0)


@pytest.mark.parametrize("d", [9, 11, 16])
def test_matmul_variants(d):
    a = _batch(d, 7, seed=d)
    b = _batch(d, 7, seed=d + 1)
    aw = wb.to_wide(a)
    bw = wb.to_wide(b)
    for name, wfn, ref in [
        ("nn", wb.wmm, sb.matmul(a, b)),
        ("tn", wb.wmm_tn, sb.matmul(a, b, ta=True)),
        ("nt", wb.wmm_nt, sb.matmul(a, b, tb=True)),
    ]:
        c11, cst = wfn(*aw, *bw)
        np.testing.assert_allclose(
            np.asarray(wb.from_wide(c11, cst)), np.asarray(ref),
            atol=1e-12, err_msg=name)


@pytest.mark.parametrize("d", [9, 13, 16])
def test_matvec(d):
    a = _batch(d, 6, seed=d)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(d, 1, 6))
    y1, y2 = wb.wmv(*wb.to_wide(a), x[:8], x[8:])
    ref = sb.matvec(a, x[:, 0, :])
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=0)[:, 0, :]),
        np.asarray(ref), atol=1e-12)
    y1, y2 = wb.wmv_t(*wb.to_wide(a), x[:8], x[8:])
    ref = sb.matvec(a, x[:, 0, :], ta=True)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=0)[:, 0, :]),
        np.asarray(ref), atol=1e-12)


@pytest.mark.parametrize("d", [9, 12, 16])
def test_cholesky_and_solves(d):
    p = _batch(d, 6, seed=d, spd=True)
    L_ref, invd_ref = sb.cholesky(p)
    ld_ref = sb.chol_log_diag_sum(L_ref)

    p11, pst = wb.to_wide(p)
    L11, Lst, invd1, invd2, ld = wb.wchol(p11, pst)
    np.testing.assert_allclose(np.asarray(wb.from_wide(L11, Lst)),
                               np.asarray(L_ref), atol=1e-10)
    np.testing.assert_allclose(float(ld), float(ld_ref), rtol=1e-12)

    b = _batch(d, 6, seed=d + 2)
    b11, bst = wb.to_wide(b)
    x11, xst = wb.wsolve_lower(L11, Lst, invd1, invd2, b11, bst)
    ref = sb.solve_lower(L_ref, invd_ref, b)
    np.testing.assert_allclose(np.asarray(wb.from_wide(x11, xst)),
                               np.asarray(ref), atol=1e-10)

    x11, xst = wb.wsolve_lower_t(L11, Lst, invd1, invd2, b11, bst)
    ref = sb.solve_lower_t(L_ref, invd_ref, b)
    np.testing.assert_allclose(np.asarray(wb.from_wide(x11, xst)),
                               np.asarray(ref), atol=1e-10)

    rng = np.random.RandomState(3)
    y = jnp.asarray(rng.randn(d, 1, 6))
    x1, x2 = wb.wsolve_lower_vec(L11, Lst, invd1, invd2, y[:8], y[8:])
    ref = sb.solve_lower_vec(L_ref, invd_ref, y[:, 0, :])
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([x1, x2], axis=0)[:, 0, :]),
        np.asarray(ref), atol=1e-10)
    x1, x2 = wb.wsolve_lower_t_vec(L11, Lst, invd1, invd2, y[:8], y[8:])
    ref = sb.solve_lower_t_vec(L_ref, invd_ref, y[:, 0, :])
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([x1, x2], axis=0)[:, 0, :]),
        np.asarray(ref), atol=1e-10)


def _nat_system(n, d, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, d, d)
    diag = jnp.asarray(
        (q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d)), dtype)
    off = jnp.asarray(rng.randn(n - 1, d, d) / d, dtype)
    y = jnp.asarray(rng.randn(n, d), dtype)
    return diag, off, y


@pytest.mark.parametrize("d,n,jitter", [
    (9, 96, 0.0),     # clean chunking
    (12, 90, 1e-3),   # chunk-pad tail + jitter path
])
def test_wide_mahal_matches_xla(d, n, jitter):
    """The wide-layout fused sweep kernel (interpret mode in CI) ==
    the plain partitioned engine, including padding edge cases and the
    jitter path.  (Small n: interpret mode executes each grid cell in
    Python; the on-device artifact at N = 1e6 is in BENCHMARKS.md.)"""
    from jax.experimental.pallas import tpu as pltpu

    from cyclic_gps_tpu.ops import partitioned as pt

    diag, off, y = _nat_system(n, d, seed=d)
    mh_x, ld_x = pt.mahal_and_logdet(diag, off, y, s=8, jitter=jitter,
                                     backend="xla")
    with pltpu.force_tpu_interpret_mode():
        mh_w, ld_w = pt._mahal_wide(diag, off, y, 8, jitter)
    np.testing.assert_allclose(float(mh_w), float(mh_x), rtol=2e-4)
    np.testing.assert_allclose(float(ld_w), float(ld_x), rtol=2e-5)


@pytest.mark.parametrize("d,n,jitter", [
    (9, 96, 0.0),     # clean chunking
    (12, 90, 1e-3),   # chunk-pad tail + jitter path
])
def test_wide_solve_matches_xla(d, n, jitter):
    """The wide-layout collect + back-substitution kernel pair
    (interpret mode in CI) == the plain partitioned solve."""
    from jax.experimental.pallas import tpu as pltpu

    from cyclic_gps_tpu.ops import partitioned as pt

    diag, off, y = _nat_system(n, d, seed=d + 20)
    x_ref, ld_ref = pt.solve_and_logdet(diag, off, y, s=8, jitter=jitter,
                                        backend="xla")
    with pltpu.force_tpu_interpret_mode():
        x_w, ld_w = pt._solve_wide(diag, off, y, 8, jitter)
    np.testing.assert_allclose(np.asarray(x_w), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(ld_w), float(ld_ref), rtol=2e-5)


def test_wide_solve_gradient():
    """The wide solve's analytic VJP == autodiff through the XLA engine
    (diag-block cotangents in the symmetric convention)."""
    from jax.experimental.pallas import tpu as pltpu

    from cyclic_gps_tpu.ops import partitioned as pt

    d, n = 9, 96
    diag, off, y = _nat_system(n, d, seed=7, dtype=jnp.float64)
    w = jnp.asarray(np.random.RandomState(11).randn(n, d))

    def loss_w(diag, off, y):
        x, ld = pt._solve_wide(diag, off, y, 8, 0.0)
        return jnp.sum(w * x) + 0.7 * ld

    def loss_x(diag, off, y):
        # raw scan-engine recursion (no custom VJP): the autodiff oracle
        x, ld = pt._solve_impl(diag, off, y, 8, 0.0)
        return jnp.sum(w * x) + 0.7 * ld

    with pltpu.force_tpu_interpret_mode():
        g_w = jax.grad(loss_w, argnums=(0, 1, 2))(diag, off, y)
    g_x = jax.grad(loss_x, argnums=(0, 1, 2))(diag, off, y)
    sym_w = 0.5 * (g_w[0] + jnp.swapaxes(g_w[0], 1, 2))
    sym_x = 0.5 * (g_x[0] + jnp.swapaxes(g_x[0], 1, 2))
    np.testing.assert_allclose(np.asarray(sym_w), np.asarray(sym_x),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g_w[1]), np.asarray(g_x[1]),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g_w[2]), np.asarray(g_x[2]),
                               rtol=1e-8, atol=1e-10)


def test_wide_mahal_gradient():
    """The wide path's analytic VJP == autodiff through the XLA engine
    (diag-block cotangents in the symmetric convention)."""
    from jax.experimental.pallas import tpu as pltpu

    from cyclic_gps_tpu.ops import partitioned as pt

    d, n = 9, 96
    diag, off, y = _nat_system(n, d, seed=3, dtype=jnp.float64)

    def loss_w(diag, off, y):
        mh, ld = pt._mahal_wide(diag, off, y, 8, 0.0)
        return 0.3 * mh + 0.7 * ld

    def loss_x(diag, off, y):
        mh, ld = pt.mahal_and_logdet(diag, off, y, s=8, backend="xla")
        return 0.3 * mh + 0.7 * ld

    with pltpu.force_tpu_interpret_mode():
        g_w = jax.grad(loss_w, argnums=(0, 1, 2))(diag, off, y)
    g_x = jax.grad(loss_x, argnums=(0, 1, 2))(diag, off, y)
    # symmetrise the diag-block gradients (the analytic VJP uses the
    # canonical symmetric convention; autodiff concentrates on the
    # lower triangle) -- same comparison as tests/test_partitioned.py
    sym_w = 0.5 * (g_w[0] + jnp.swapaxes(g_w[0], 1, 2))
    sym_x = 0.5 * (g_x[0] + jnp.swapaxes(g_x[0], 1, 2))
    np.testing.assert_allclose(np.asarray(sym_w), np.asarray(sym_x),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g_w[1]), np.asarray(g_x[1]),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g_w[2]), np.asarray(g_x[2]),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("d,n,jitter", [
    (9, 96, 0.0),     # clean chunking
    (12, 90, 1e-3),   # chunk-pad tail + jitter path
])
def test_wide_inverse_matches_xla(d, n, jitter):
    """The wide-layout selected inversion (raw-collect sweep + wide
    Takahashi kernels, interpret mode in CI) == the plain partitioned
    selected inversion."""
    from jax.experimental.pallas import tpu as pltpu

    from cyclic_gps_tpu.ops import partitioned as pt

    diag, off, _ = _nat_system(n, d, seed=d + 40)
    sd_x, so_x = pt.inverse_blocks(diag, off, s=8, jitter=jitter,
                                   backend="xla")
    with pltpu.force_tpu_interpret_mode():
        sd_w, so_w = pt._inverse_wide(diag, off, 8, jitter)
    np.testing.assert_allclose(np.asarray(sd_w), np.asarray(sd_x),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(so_w), np.asarray(so_x),
                               rtol=2e-4, atol=2e-6)
