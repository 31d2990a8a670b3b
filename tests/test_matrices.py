"""Closed-form test matrices (fresh implementations of classical results).

Mirrors the *coverage* of the generators the reference vendors from the
Burkardt test_matrix collection (reference tests/known_matrices_full.py:
bab_* at :914,:1069,:1196 and schur_block_* at :46651,:46747,:46790), using
the standard closed forms:

* BAB: the symmetric tridiagonal Toeplitz matrix (alpha on the diagonal,
  beta on the off-diagonals).  Its leading principal minors satisfy
  D_k = alpha D_{k-1} - beta^2 D_{k-2}; the inverse has the classical
  entries (A^{-1})_{ij} = (-beta)^{|i-j|} D_{min-1} D_{n-max} / D_n
  (da Fonseca & Petronilho, LAA 325 (2001) 7-21).

* SCHUR_BLOCK: block-diagonal with 2x2 real-Schur blocks
  [[x, y], [-y, x]]; det = prod (x^2 + y^2), inverse blockwise
  [[x, -y], [y, x]] / (x^2 + y^2).
"""

import numpy as np


def bab_matrix(n, alpha, beta):
    a = np.zeros((n, n))
    np.fill_diagonal(a, alpha)
    idx = np.arange(n - 1)
    a[idx, idx + 1] = beta
    a[idx + 1, idx] = beta
    return a


def _bab_minors(n, alpha, beta):
    d = np.empty(n + 1)
    d[0] = 1.0
    if n >= 1:
        d[1] = alpha
    for k in range(2, n + 1):
        d[k] = alpha * d[k - 1] - beta * beta * d[k - 2]
    return d


def bab_determinant(n, alpha, beta):
    return _bab_minors(n, alpha, beta)[n]


def bab_inverse(n, alpha, beta):
    d = _bab_minors(n, alpha, beta)
    inv = np.empty((n, n))
    for i in range(n):
        for j in range(n):
            lo, hi = min(i, j), max(i, j)
            inv[i, j] = (-beta) ** (hi - lo) * d[lo] * d[n - 1 - hi] / d[n]
    return inv


def schur_block_matrix(n, x, y):
    a = np.zeros((n, n))
    for i in range(n // 2):
        a[2 * i, 2 * i] = x[i]
        a[2 * i + 1, 2 * i + 1] = x[i]
        a[2 * i, 2 * i + 1] = y[i]
        a[2 * i + 1, 2 * i] = -y[i]
    if n % 2 == 1:
        a[n - 1, n - 1] = x[n // 2]
    return a


def schur_block_determinant(n, x, y):
    value = 1.0
    for i in range(n // 2):
        value *= x[i] ** 2 + y[i] ** 2
    if n % 2 == 1:
        value *= x[n // 2]
    return value


def schur_block_inverse(n, x, y):
    inv = np.zeros((n, n))
    for i in range(n // 2):
        den = x[i] ** 2 + y[i] ** 2
        inv[2 * i, 2 * i] = x[i] / den
        inv[2 * i + 1, 2 * i + 1] = x[i] / den
        inv[2 * i, 2 * i + 1] = -y[i] / den
        inv[2 * i + 1, 2 * i] = y[i] / den
    if n % 2 == 1:
        inv[n - 1, n - 1] = 1.0 / x[n // 2]
    return inv


def test_bab_closed_forms():
    a = bab_matrix(10, 5.0, 2.0)
    assert np.allclose(np.linalg.det(a), bab_determinant(10, 5.0, 2.0))
    assert np.allclose(np.linalg.inv(a), bab_inverse(10, 5.0, 2.0))


def test_schur_block_closed_forms():
    x = [1.0] * 5
    y = [2.0] * 5
    a = schur_block_matrix(10, x, y)
    assert np.allclose(np.linalg.det(a), schur_block_determinant(10, x, y))
    assert np.allclose(np.linalg.inv(a), schur_block_inverse(10, x, y))
