"""Implicit-differentiation tests: gradients through solves match
closed-form derivatives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pykrylov_tpu.ops import DiagonalOperator, MatrixOperator
from pykrylov_tpu.solvers.diff import cg_solve, bicgstab_solve, lsqr_solve


def test_grad_wrt_rhs_spd(rng):
    n = 20
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    op = MatrixOperator(jnp.asarray(A), symmetric=True)
    w = jnp.asarray(rng.standard_normal(n))

    def loss(b):
        return jnp.dot(w, cg_solve(op, b))

    b = jnp.asarray(rng.standard_normal(n))
    g = jax.grad(loss)(b)
    # dL/db = A^{-T} w = A^{-1} w (symmetric)
    np.testing.assert_allclose(np.asarray(g), np.linalg.solve(A, np.asarray(w)),
                               atol=1e-7)


def test_grad_wrt_operator_params(rng):
    """d/d(diag) of w' diag(d)^{-1} b = -w*b/d^2 elementwise."""
    n = 15
    d = jnp.asarray(1.0 + rng.random(n))
    b = jnp.asarray(rng.standard_normal(n))
    w = jnp.asarray(rng.standard_normal(n))

    def loss(dvec):
        return jnp.dot(w, cg_solve(DiagonalOperator(dvec), b))

    g = jax.grad(loss)(d)
    expected = -np.asarray(w) * np.asarray(b) / np.asarray(d) ** 2
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-8)


def test_grad_wrt_dense_matrix(rng):
    """dL/dA = -lambda x' for L = w' A^{-1} b, lambda = A^{-T} w."""
    n = 12
    A = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal(n)
    w = rng.standard_normal(n)

    def loss(Amat):
        return jnp.dot(jnp.asarray(w),
                       bicgstab_solve(MatrixOperator(Amat), jnp.asarray(b),
                                      rtol=1e-12, matvec_max=400))

    g = jax.grad(loss)(jnp.asarray(A))
    x = np.linalg.solve(A, b)
    lam = np.linalg.solve(A.T, w)
    np.testing.assert_allclose(np.asarray(g), -np.outer(lam, x), atol=1e-6)


def test_grad_matches_finite_differences(rng):
    n = 10
    d0 = 1.0 + rng.random(n)
    b = rng.standard_normal(n)

    def loss(dvec):
        x = cg_solve(DiagonalOperator(dvec), jnp.asarray(b))
        return jnp.sum(x ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(d0)))
    eps = 1e-6
    for i in range(0, n, 3):
        dp = d0.copy(); dp[i] += eps
        dm = d0.copy(); dm[i] -= eps
        fd = (float(loss(jnp.asarray(dp))) - float(loss(jnp.asarray(dm)))) \
            / (2 * eps)
        assert g[i] == pytest.approx(fd, rel=1e-4)


def test_grad_through_jit(rng):
    n = 14
    Q = rng.standard_normal((n, n))
    A = MatrixOperator(jnp.asarray(Q @ Q.T + n * np.eye(n)), symmetric=True)
    b = jnp.asarray(rng.standard_normal(n))
    f = jax.jit(lambda b: jnp.sum(cg_solve(A, b) ** 2))
    g1 = jax.grad(f)(b)
    g2 = jax.grad(lambda b: jnp.sum(cg_solve(A, b) ** 2))(b)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_lsqr_grad_consistent_system(rng):
    """Overdetermined but consistent: gradient wrt b equals A(A'A)^{-1}w."""
    m, n = 30, 12
    A = rng.standard_normal((m, n))
    op = MatrixOperator(jnp.asarray(A))
    w = rng.standard_normal(n)

    def loss(b):
        return jnp.dot(jnp.asarray(w), lsqr_solve(op, b))

    b = jnp.asarray(A @ rng.standard_normal(n))
    g = jax.grad(loss)(b)
    expected = A @ np.linalg.solve(A.T @ A, w)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)
