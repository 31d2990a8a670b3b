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
