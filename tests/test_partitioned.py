"""Partitioned block-Thomas engine vs the cyclic-reduction engine and
dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.random as npr
import pytest

from cyclic_gps_tpu.ops import cyclic_reduction as cr
from cyclic_gps_tpu.ops import partitioned as pt


def well_conditioned(n, d, seed=0):
    rng = npr.RandomState(seed)
    q = rng.randn(n, d, d)
    diag = q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d)
    off = rng.randn(n - 1, d, d) / d
    v = rng.randn(n, d)
    return jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v)


@pytest.mark.parametrize("d", [1, 3])
@pytest.mark.parametrize("n", [16, 33, 64, 257, 1024])
def test_matches_cyclic_reduction(n, d):
    diag, off, v = well_conditioned(n, d, seed=n * 10 + d)
    s = 4 if n < 257 else None  # small chunks to exercise the sweep

    mh0, ld0 = cr.mahal_and_logdet(diag, off, v)
    mh1, ld1 = pt.mahal_and_logdet(diag, off, v, s=s)
    np.testing.assert_allclose(float(mh1), float(mh0), rtol=1e-12)
    np.testing.assert_allclose(float(ld1), float(ld0), rtol=1e-12)
    np.testing.assert_allclose(
        float(pt.logdet(diag, off, s=s)), float(ld0), rtol=1e-12
    )

    x0 = cr.solve(cr.decompose(diag, off), v)
    x1 = pt.solve(diag, off, v, s=s)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-12)

    x2, ld2 = pt.solve_and_logdet(diag, off, v, s=s)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x0), atol=1e-12)
    np.testing.assert_allclose(float(ld2), float(ld0), rtol=1e-12)


def test_dense_parity():
    n, d = 200, 2
    diag, off, v = well_conditioned(n, d, seed=3)
    J = np.zeros((n * d, n * d))
    dg, of = np.asarray(diag), np.asarray(off)
    for i in range(n):
        J[i*d:(i+1)*d, i*d:(i+1)*d] = dg[i]
    for i in range(n - 1):
        J[(i+1)*d:(i+2)*d, i*d:(i+1)*d] = of[i]
        J[i*d:(i+1)*d, (i+1)*d:(i+2)*d] = of[i].T
    vv = np.asarray(v)
    mh, ld = pt.mahal_and_logdet(diag, off, v, s=8)
    assert np.allclose(float(mh), vv.ravel() @ np.linalg.solve(J, vv.ravel()))
    assert np.allclose(float(ld), np.linalg.slogdet(J)[1])
    x = pt.solve(diag, off, v, s=8)
    assert np.allclose(np.asarray(x).ravel(), np.linalg.solve(J, vv.ravel()))


@pytest.mark.parametrize("n,d", [(16, 1), (33, 3), (257, 2), (1024, 3)])
def test_inverse_blocks_matches_cr(n, d):
    diag, off, _ = well_conditioned(n, d, seed=n + d)
    s = 4 if n < 257 else None
    id0, io0 = cr.inverse_blocks(cr.decompose(diag, off))
    id1, io1 = pt.inverse_blocks(diag, off, s=s)
    np.testing.assert_allclose(np.asarray(id1), np.asarray(id0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(io1), np.asarray(io0), atol=1e-12)


def test_gradients_match_cr_engine():
    """Autodiff through the scan-based sweep == autodiff through CR."""
    n, d = 70, 2
    diag, off, v = well_conditioned(n, d, seed=5)

    def f_pt(a, b, c):
        mh, ld = pt.mahal_and_logdet(a, b, c, s=8)
        return mh + 0.5 * ld

    def f_cr(a, b, c):
        mh, ld = cr.mahal_and_logdet(a, b, c)
        return mh + 0.5 * ld

    g_pt = jax.grad(f_pt, argnums=(0, 1, 2))(diag, off, v)
    g_cr = jax.grad(f_cr, argnums=(0, 1, 2))(diag, off, v)
    # the partitioned entry now carries the analytic custom VJP, whose
    # diag-block gradient is the canonical SYMMETRIC one; CR autodiff
    # reads only the lower triangle.  They agree as functionals on
    # symmetric perturbations, i.e. after symmetrisation.
    sym = lambda a: 0.5 * (a + np.swapaxes(np.asarray(a), -1, -2))
    np.testing.assert_allclose(sym(g_pt[0]), sym(g_cr[0]),
                               rtol=1e-9, atol=1e-11)
    for a, b in zip(g_pt[1:], g_cr[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)


def test_fused_solve_inverse_matches_separate_f64():
    """The hat-form Takahashi walk + shared collect sweep
    (`pt._solve_inverse_from_cm`, round 5) reproduces the separate solve
    and raw-Takahashi selected inversion to f64 machine precision -- the
    recurrences are algebraically identical (hat_c^T = C D^{-1})."""
    rng = np.random.RandomState(11)
    n, d, s = 700, 3, 32
    q = rng.randn(n, d, d)
    diag = jnp.asarray(q @ q.transpose(0, 2, 1) / d + 5 * np.eye(d))
    off = jnp.asarray(rng.randn(n - 1, d, d) / d)
    y = jnp.asarray(rng.randn(n, d))
    R_cm, O_cm, y_cm, _ = pt._chunk_layout(diag, off, y, s)
    x_new, sd_new, so_new = pt.solve_and_inverse_cm(R_cm, O_cm, y_cm,
                                                    backend="xla")
    x_old, _ = pt.solve_cm(R_cm, O_cm, y_cm)
    sd_old, so_old = pt.inverse_blocks_cm(R_cm, O_cm)
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x_old),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(sd_new), np.asarray(sd_old),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(so_new), np.asarray(so_old),
                               atol=1e-12)


@pytest.mark.parametrize("d", [9, 12])
def test_wide_fused_solve_inverse_matches_xla(d):
    """The WIDE fused backward (round 5: wide solveinv collect sweep +
    wide descending back-substitution/hat-Takahashi kernel,
    `pt._solve_inverse_wide_cm`) matches the XLA hat-walk path in
    interpret mode -- the 8 < d < 16 analytic-VJP backward route."""
    from jax.experimental.pallas import tpu as pltpu

    n, s = 200, 8
    rng = np.random.RandomState(d)
    q = rng.randn(n, d, d)
    diag = jnp.asarray(
        (q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d)).astype(np.float32))
    off = jnp.asarray((rng.randn(n - 1, d, d) / d).astype(np.float32))
    y = jnp.asarray(rng.randn(n, d).astype(np.float32))
    x_x, sd_x, so_x = pt._solve_inverse_nat(diag, off, y, s, 0.0, "xla")
    with pltpu.force_tpu_interpret_mode():
        x_p, sd_p, so_p = pt._solve_inverse_nat(diag, off, y, s, 0.0,
                                                "pallas")
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(sd_p), np.asarray(sd_x),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(so_p), np.asarray(so_x),
                               atol=2e-4)
