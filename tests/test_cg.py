"""CG solver tests.

Mirrors the reference protocol (``cg/tests/test_diagdom.py``): solve d-D
Poisson systems with known solution e = ones, rhs = A e, and assert the
recovered solution to a condition-number-aware tolerance computed from the
analytic Poisson eigenvalues.  Adds jit/curvature/preconditioning checks the
reference lacks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pykrylov_tpu.solvers import cg
from pykrylov_tpu.ops import MatrixOperator, DiagonalOperator
from pykrylov_tpu.gallery import (poisson1d_operator, poisson2d_operator,
                                  poisson_eigenvalue_bounds)
from pykrylov_tpu.utils import machine_epsilon


def _poisson_tol(n, dim):
    lmin, lmax = poisson_eigenvalue_bounds(n, dim)
    return (lmax / lmin) * machine_epsilon(np.float64)


class TestPoisson1D:
    @pytest.mark.parametrize("n", [10, 100, 1000, 10000])
    def test_recover_ones(self, n):
        A = poisson1d_operator(n, dtype=np.float64)
        e = jnp.ones(n, dtype=jnp.float64)
        b = A * e
        res = cg(A, b, rtol=1e-10, matvec_max=2 * n)
        tol = _poisson_tol(n, 1)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), np.ones(n), rtol=tol)


class TestPoisson2D:
    @pytest.mark.parametrize("n", [10, 50, 100])
    def test_recover_ones(self, n):
        # The reference's 2-D assertion is self-referential (rtol=err*n,
        # test_diagdom.py:88); we assert an absolute error bound consistent
        # with the rtol-1e-10 stopping rule instead.
        A = poisson2d_operator(n, dtype=np.float64)
        e = jnp.ones(n * n, dtype=jnp.float64)
        b = A * e
        res = cg(A, b, rtol=1e-10, matvec_max=2 * n * n)
        assert bool(res.converged)
        assert float(jnp.abs(res.x - e).max()) < 1e-8


class TestCGSemantics:
    def test_matches_direct_solve(self, rng):
        A = rng.standard_normal((30, 30))
        S = A @ A.T + 30 * np.eye(30)
        b = rng.standard_normal(30)
        res = cg(MatrixOperator(S, symmetric=True), jnp.asarray(b), rtol=1e-12)
        xd = np.linalg.solve(S, b)
        assert np.linalg.norm(np.asarray(res.x) - xd) < 1e-7 * np.linalg.norm(xd)

    def test_initial_guess_counts_extra_matvec(self, rng):
        A = rng.standard_normal((20, 20))
        S = A @ A.T + 20 * np.eye(20)
        b = rng.standard_normal(20)
        op = MatrixOperator(S, symmetric=True)
        r0 = cg(op, jnp.asarray(b), rtol=1e-12)
        r1 = cg(op, jnp.asarray(b), x0=jnp.asarray(np.linalg.solve(S, b)),
                rtol=1e-10)
        assert int(r1.n_matvec) == int(r1.n_iter) + 1
        assert int(r1.n_iter) <= 1  # exact guess: converge immediately
        assert int(r0.n_matvec) == int(r0.n_iter)

    def test_jacobi_preconditioning_reduces_iterations(self, rng):
        d = np.linspace(1, 1e4, 50)
        A = np.diag(d)
        A[0, 1] = A[1, 0] = 1.0
        b = rng.standard_normal(50)
        op = MatrixOperator(A, symmetric=True)
        M = DiagonalOperator(1.0 / np.diag(A))
        plain = cg(op, jnp.asarray(b), rtol=1e-10, maxiter=500)
        pre = cg(op, jnp.asarray(b), M=M, rtol=1e-10, maxiter=500)
        assert bool(pre.converged)
        assert int(pre.n_iter) < int(plain.n_iter)
        np.testing.assert_allclose(np.asarray(pre.x), np.linalg.solve(A, b),
                                   rtol=1e-6)

    def test_curvature_check_indefinite(self, rng):
        A = np.diag(np.array([1.0, -1.0, 2.0]))
        b = np.array([1.0, 1.0, 1.0])
        res = cg(MatrixOperator(A, symmetric=True), jnp.asarray(b),
                 check_curvature=True, maxiter=10)
        assert not bool(res.converged)
        assert int(res.istop) == 2
        assert not bool(res.info["definite"])
        assert np.linalg.norm(np.asarray(res.info["infinite_descent"])) > 0

    def test_history(self, rng):
        A = rng.standard_normal((25, 25))
        S = A @ A.T + 25 * np.eye(25)
        b = rng.standard_normal(25)
        res = cg(MatrixOperator(S, symmetric=True), jnp.asarray(b),
                 rtol=1e-10, store_history=True)
        h = res.history()
        assert len(h) == int(res.n_iter) + 1
        assert h[0] == pytest.approx(float(res.resid_norm0))
        assert h[-1] == pytest.approx(float(res.resid_norm), rel=1e-6)
        # monotone-ish decrease overall
        assert h[-1] < h[0]

    def test_maxiter_cap(self, rng):
        A = rng.standard_normal((40, 40))
        S = A @ A.T + 1e-3 * np.eye(40)
        b = rng.standard_normal(40)
        res = cg(MatrixOperator(S, symmetric=True), jnp.asarray(b),
                 rtol=1e-14, atol=0.0, maxiter=3)
        assert int(res.n_iter) == 3
        assert int(res.istop) == 1
        assert not bool(res.converged)

    def test_whole_solve_is_jittable(self, rng):
        """The solve can itself sit under an outer jit (e.g. in a pipeline)."""
        A = rng.standard_normal((16, 16))
        S = A @ A.T + 16 * np.eye(16)
        op = MatrixOperator(S, symmetric=True)

        @jax.jit
        def run(o, b):
            return cg(o, b, rtol=1e-12, maxiter=64).x

        b = jnp.asarray(rng.standard_normal(16))
        np.testing.assert_allclose(np.asarray(run(op, b)),
                                   np.linalg.solve(S, np.asarray(b)),
                                   rtol=1e-8)

    def test_reference_metric_1d_poisson_100(self):
        """BASELINE metric #1: 1-D Poisson n=100 matrix-free, matvec_max=200.

        Reference: 50 matvecs to resid 7.39e-14 (introduction.rst:21-50).
        Convergence in <= n/2 iterations and tiny error must reproduce.
        """
        n = 100
        A = poisson1d_operator(n, dtype=np.float64)
        e = jnp.ones(n, dtype=jnp.float64)
        b = A * e
        res = cg(A, b, rtol=1e-6, matvec_max=200)
        assert bool(res.converged)
        assert int(res.n_matvec) <= 55
        err = float(jnp.linalg.norm(res.x - e) / jnp.sqrt(n))
        assert err < 1e-12


def test_store_iterates():
    """Reference parity: cg.py:66-67 iterate history (review parity gap)."""
    import jax.numpy as jnp
    from pykrylov_tpu.solvers import cg
    from pykrylov_tpu.gallery import poisson1d_operator
    op = poisson1d_operator(40, dtype=jnp.float64)
    e = jnp.ones(40, dtype=jnp.float64)
    b = op * e
    res = cg(op, b, rtol=1e-10, store_iterates=True, maxiter=100)
    buf = res.info["iterates"]
    k = int(res.n_iter)
    assert buf.shape == (101, 40)
    np.testing.assert_array_equal(np.asarray(buf[0]), np.zeros(40))
    np.testing.assert_allclose(np.asarray(buf[k]), np.asarray(res.x))
    assert bool(jnp.all(jnp.isnan(buf[k + 1:])))


def test_store_resids():
    """Reference parity: cg.py:133-143 residual-vector history."""
    import jax.numpy as jnp
    from pykrylov_tpu.solvers import cg
    from pykrylov_tpu.gallery import poisson1d_operator
    op = poisson1d_operator(30, dtype=jnp.float64)
    e = jnp.ones(30, dtype=jnp.float64)
    b = op * e
    res = cg(op, b, rtol=1e-10, store_resids=True, maxiter=80)
    buf = res.info["resids"]
    k = int(res.n_iter)
    np.testing.assert_allclose(np.asarray(buf[0]), np.asarray(b))
    # last stored residual vector matches b - A x
    r_true = np.asarray(b) - np.asarray(op * res.x)
    np.testing.assert_allclose(np.asarray(buf[k]), r_true, atol=1e-9)
