"""Cyclic-reduction core vs dense NumPy oracles.

Ports the reference's behavioural contracts
(reference tests/test_cyclic_reduction.py):

* mahal / solve / logdet / mahal_and_logdet / inverse_blocks against dense
  linear algebra on random SPD block-tridiagonal matrices, for
  block_dim in {1, 3} and num_dblocks in {1, 2, 6, 30, 31, 32, 33}
  (odd / even / power-of-two edge cases).
* halfsolve == L_perm^{-1} T v and backhalfsolve == (L_perm^T T)^{-1} v
  where L_perm = chol(T J T^T) for the recursive even/odd permutation T --
  i.e. the decomposition IS the permuted Cholesky.
* Closed-form known matrices (BAB tridiagonal Toeplitz, gram of a
  SCHUR_BLOCK matrix).
* Gradients of the fused mahal+logdet vs finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.random as npr
import pytest

from cyclic_gps_tpu.ops import cyclic_reduction as cr
from test_matrices import (
    bab_determinant,
    bab_inverse,
    bab_matrix,
    schur_block_determinant,
    schur_block_inverse,
    schur_block_matrix,
)


def recursive_eo(n):
    """The recursive even/odd elimination order of indices 0..n-1."""
    if n <= 2:
        return np.arange(n)
    evens = np.arange(0, n, 2)
    odds = np.arange(1, n, 2)
    return np.concatenate([evens, odds[recursive_eo(len(odds))]])


def perm_matrix(perm):
    n = len(perm)
    p = np.zeros((n, n))
    p[np.arange(n), perm] = 1.0
    return p


def random_spd_blocktridiag(rng, n, d):
    """J = L L^T from a random block-bidiagonal L with +3I conditioning."""
    total = n * d
    L = np.zeros((total, total))
    for i in range(n):
        L[i * d : (i + 1) * d, i * d : (i + 1) * d] = (
            rng.randn(d, d) + np.eye(d) * 3.0
        )
    for i in range(1, n):
        L[i * d : (i + 1) * d, (i - 1) * d : i * d] = rng.randn(d, d)
    J = L @ L.T
    diag = np.stack([J[i * d : (i + 1) * d, i * d : (i + 1) * d] for i in range(n)])
    off = np.stack(
        [J[(i + 1) * d : (i + 2) * d, i * d : (i + 1) * d] for i in range(n - 1)]
    ) if n > 1 else np.zeros((0, d, d))
    return J, diag, off


def dense_to_blocks(M, d):
    n = M.shape[0] // d
    diag = np.stack([M[i * d : (i + 1) * d, i * d : (i + 1) * d] for i in range(n)])
    off = np.stack(
        [M[(i + 1) * d : (i + 2) * d, i * d : (i + 1) * d] for i in range(n - 1)]
    )
    return diag, off


@pytest.mark.parametrize("d", [1, 3])
@pytest.mark.parametrize("n", [1, 2, 6, 30, 31, 32, 33])
def test_random_spd_matrices(n, d):
    rng = npr.RandomState(42 + n * 10 + d)
    J, diag, off = random_spd_blocktridiag(rng, n, d)
    v = rng.randn(n, d)

    decomp = cr.decompose(jnp.asarray(diag), jnp.asarray(off))

    # mahal == v^T J^{-1} v
    mahal_dense = v.ravel() @ np.linalg.solve(J, v.ravel())
    assert np.allclose(float(cr.mahal(decomp, jnp.asarray(v))), mahal_dense)

    # solve == J^{-1} v
    x = cr.solve(decomp, jnp.asarray(v))
    assert np.allclose(np.asarray(x).ravel(), np.linalg.solve(J, v.ravel()))

    # logdet == slogdet(J)
    assert np.allclose(float(cr.logdet(decomp)), np.linalg.slogdet(J)[1])

    # fused pass
    mh, ld = cr.mahal_and_logdet(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v))
    assert np.allclose(float(mh), mahal_dense)
    assert np.allclose(float(ld), np.linalg.slogdet(J)[1])
    assert np.allclose(
        float(cr.logdet_direct(jnp.asarray(diag), jnp.asarray(off))),
        np.linalg.slogdet(J)[1],
    )

    # halfsolve IS the permuted-Cholesky forward solve
    T = np.kron(perm_matrix(recursive_eo(n)), np.eye(d))
    L_perm = np.linalg.cholesky(T @ J @ T.T)
    zs = cr.halfsolve(decomp, jnp.asarray(v))
    z_flat = np.concatenate([np.asarray(z).ravel() for z in zs])
    assert np.allclose(z_flat, np.linalg.solve(L_perm, T @ v.ravel()))

    # backhalfsolve with arbitrary per-level input == (L^T T)^{-1} v
    sizes = [s for s in cr.level_sizes(n) if s > 0]
    vrep = [rng.randn(s, d) for s in sizes]
    v_flat = np.concatenate([b.ravel() for b in vrep])
    x_back = cr.backhalfsolve(decomp, [jnp.asarray(b) for b in vrep])
    assert np.allclose(
        np.asarray(x_back).ravel(), np.linalg.solve(L_perm.T @ T, v_flat)
    )

    # inverse blocks == blocks of dense inverse
    Sig = np.linalg.inv(J)
    Sig_d, Sig_o = dense_to_blocks(Sig, d) if n > 1 else (
        Sig[None], np.zeros((0, d, d)))
    inv_d, inv_o = cr.inverse_blocks(decomp)
    assert np.allclose(np.asarray(inv_d), Sig_d)
    assert np.allclose(np.asarray(inv_o), Sig_o)


def test_known_matrix_bab():
    n = 10
    BAB = bab_matrix(n, 5.0, 2.0)
    diag, off = dense_to_blocks(BAB, 1)
    x = npr.RandomState(0).rand(n, 1)

    decomp = cr.decompose(jnp.asarray(diag), jnp.asarray(off))
    gt_logdet = np.log(bab_determinant(n, 5.0, 2.0))
    assert np.allclose(float(cr.logdet(decomp)), gt_logdet)

    mh, ld = cr.mahal_and_logdet(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(x))
    assert np.allclose(float(ld), gt_logdet)

    gt_inv = bab_inverse(n, 5.0, 2.0)
    assert np.allclose(float(mh), x.ravel() @ gt_inv @ x.ravel())

    inv_d, inv_o = cr.inverse_blocks(decomp)
    gt_d, gt_o = dense_to_blocks(gt_inv, 1)
    assert np.allclose(np.asarray(inv_d), gt_d)
    assert np.allclose(np.asarray(inv_o), gt_o)


def test_known_matrix_schur_block_gram():
    n = 10
    x_par = [1.0] * 5
    y_par = [2.0] * 5
    S = schur_block_matrix(n, x_par, y_par)
    G = S.T @ S  # SPD gram
    diag, off = dense_to_blocks(G, 2)
    v = npr.RandomState(1).rand(5, 2)

    decomp = cr.decompose(jnp.asarray(diag), jnp.asarray(off))
    gt_logdet = np.log(schur_block_determinant(n, x_par, y_par) ** 2)
    assert np.allclose(float(cr.logdet(decomp)), gt_logdet)

    mh, ld = cr.mahal_and_logdet(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v))
    assert np.allclose(float(ld), gt_logdet)

    gt_inv_half = schur_block_inverse(n, x_par, y_par)
    gt_inv = gt_inv_half @ gt_inv_half.T
    assert np.allclose(float(mh), v.ravel() @ gt_inv @ v.ravel())

    inv_d, inv_o = cr.inverse_blocks(decomp)
    gt_d, gt_o = dense_to_blocks(gt_inv, 2)
    assert np.allclose(np.asarray(inv_d), gt_d)
    assert np.allclose(np.asarray(inv_o), gt_o)


@pytest.mark.parametrize("n", [5, 8])
def test_mahal_and_logdet_gradients(n):
    """Autodiff through the fused CR pass vs finite differences."""
    d = 2
    rng = npr.RandomState(7)
    _, diag, off = random_spd_blocktridiag(rng, n, d)
    v = rng.randn(n, d)

    def f(diag_, off_, v_):
        mh, ld = cr.mahal_and_logdet(diag_, off_, v_)
        return mh + 0.5 * ld

    grads = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v)
    )

    eps = 1e-6
    for argnum, arr in enumerate([diag, off, v]):
        g = np.asarray(grads[argnum])
        flat = arr.ravel()
        for idx in range(0, flat.size, max(1, flat.size // 7)):
            bump = np.zeros_like(flat)
            bump[idx] = eps
            args_p = [jnp.asarray(a) for a in (diag, off, v)]
            args_m = [jnp.asarray(a) for a in (diag, off, v)]
            args_p[argnum] = jnp.asarray((flat + bump).reshape(arr.shape))
            args_m[argnum] = jnp.asarray((flat - bump).reshape(arr.shape))
            fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
            assert np.allclose(g.ravel()[idx], fd, rtol=1e-4, atol=1e-6)


def test_jit_and_shapes():
    """The whole decomposition jits with static shapes."""
    rng = npr.RandomState(3)
    n, d = 33, 3
    _, diag, off = random_spd_blocktridiag(rng, n, d)
    v = rng.randn(n, d)

    fused = jax.jit(cr.mahal_and_logdet)
    mh, ld = fused(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v))
    mh2, ld2 = cr.mahal_and_logdet(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v))
    assert np.allclose(float(mh), float(mh2))
    assert np.allclose(float(ld), float(ld2))

    solve_jit = jax.jit(lambda dg, of, y: cr.solve(cr.decompose(dg, of), y))
    x = solve_jit(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v))
    assert x.shape == (n, d)
