"""Tests for the Lanczos-based symmetric solvers (MINRES, SYMMLQ).

The reference ships no unit tests for these (SURVEY §4); validation is the
doc numbers plus the algorithmic contract: symmetric indefinite systems,
shifts, istop codes, symmetry checks, and the etol direct-error stop.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.solvers import minres, symmlq, cg
from pykrylov_tpu.ops import MatrixOperator
from pykrylov_tpu.gallery import poisson1d_operator


def indefinite_symmetric(rng, n, n_neg):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.concatenate([np.linspace(1, 5, n - n_neg),
                        -np.linspace(1, 3, n_neg)])
    A = (Q * d) @ Q.T
    return (A + A.T) / 2


class TestMinres:
    def test_spd_poisson(self):
        op = poisson1d_operator(100, dtype=jnp.float64)
        e = jnp.ones(100, dtype=jnp.float64)
        res = minres(op, op * e, rtol=1e-12)
        assert bool(res.converged) and int(res.istop) in (1, 2, 10)
        np.testing.assert_allclose(np.asarray(res.x), np.ones(100),
                                   atol=1e-9)

    def test_indefinite_system(self, rng):
        A = indefinite_symmetric(rng, 60, 20)
        xs = rng.standard_normal(60)
        res = minres(MatrixOperator(jnp.asarray(A), symmetric=True),
                     jnp.asarray(A @ xs), rtol=1e-13, etol=1e-10)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), xs, atol=1e-7)

    def test_indefinite_system_breaks_cg(self, rng):
        """The point of MINRES: CG's curvature check aborts here."""
        A = indefinite_symmetric(rng, 40, 15)
        b = jnp.asarray(rng.standard_normal(40))
        op = MatrixOperator(jnp.asarray(A), symmetric=True)
        res_cg = cg(op, b, check_curvature=True)
        assert int(res_cg.istop) == 2  # indefinite abort
        res_mr = minres(op, b, rtol=1e-12, etol=1e-10)
        assert bool(res_mr.converged)

    def test_shift(self, rng):
        A = indefinite_symmetric(rng, 50, 10)
        b = rng.standard_normal(50)
        shift = 0.123
        res = minres(MatrixOperator(jnp.asarray(A), symmetric=True),
                     jnp.asarray(b), shift=shift, rtol=1e-13, etol=1e-10)
        resid = np.linalg.norm((A - shift * np.eye(50)) @ np.asarray(res.x)
                               - b)
        assert resid < 1e-6 * np.linalg.norm(b)

    def test_etol_window_stop(self):
        op = poisson1d_operator(400, dtype=jnp.float64)
        b = op * jnp.ones(400, dtype=jnp.float64)
        # Loose etol stops early via the direct-error window (istop=10).
        res = minres(op, b, rtol=1e-14, etol=1e-3, window=5)
        assert int(res.istop) == 10
        assert bool(res.converged)

    def test_check_rejects_unsymmetric(self, rng):
        B = MatrixOperator(jnp.asarray(rng.standard_normal((30, 30))))
        res = minres(B, jnp.ones(30), check=True)
        assert int(res.istop) == 7 and not bool(res.converged)

    def test_zero_rhs(self):
        op = poisson1d_operator(50, dtype=jnp.float64)
        res = minres(op, jnp.zeros(50, dtype=jnp.float64))
        assert bool(res.converged) and int(res.n_iter) == 0
        np.testing.assert_array_equal(np.asarray(res.x), np.zeros(50))

    def test_norm_estimates(self, rng):
        A = indefinite_symmetric(rng, 50, 10)
        res = minres(MatrixOperator(jnp.asarray(A), symmetric=True),
                     jnp.asarray(rng.standard_normal(50)), rtol=1e-12,
                     etol=1e-12)
        anorm_true = np.linalg.norm(A, 2)
        anorm_est = float(res.info["Anorm"])
        # Frobenius-style over-estimate of the 2-norm: right order.
        assert anorm_true * 0.5 <= anorm_est <= anorm_true * 10

    def test_singular_consistent_system(self, rng):
        """MINRES handles singular A when b lies in range(A)."""
        n = 40
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        d = np.concatenate([np.linspace(1, 4, n - 5), np.zeros(5)])
        A = (Q * d) @ Q.T
        b = A @ rng.standard_normal(n)  # consistent rhs
        res = minres(MatrixOperator(jnp.asarray(A), symmetric=True),
                     jnp.asarray(b), rtol=1e-10, etol=1e-14, itnlim=400)
        assert bool(res.converged)
        x = np.asarray(res.x)
        assert np.linalg.norm(A @ x - b) < 1e-7 * np.linalg.norm(b)


class TestSymmlq:
    def test_spd_poisson(self):
        op = poisson1d_operator(100, dtype=jnp.float64)
        e = jnp.ones(100, dtype=jnp.float64)
        res = symmlq(op, op * e, rtol=1e-10)
        assert bool(res.converged) and int(res.istop) in (1, 2)
        np.testing.assert_allclose(np.asarray(res.x), np.ones(100),
                                   atol=1e-8)

    def test_indefinite_system(self, rng):
        A = indefinite_symmetric(rng, 60, 20)
        xs = rng.standard_normal(60)
        res = symmlq(MatrixOperator(jnp.asarray(A), symmetric=True),
                     jnp.asarray(A @ xs), rtol=1e-11)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), xs, atol=1e-6)

    def test_true_final_residual(self, rng):
        """resid_norm is the recomputed true residual (symmlq.py:376-381)."""
        A = indefinite_symmetric(rng, 50, 15)
        b = rng.standard_normal(50)
        res = symmlq(MatrixOperator(jnp.asarray(A), symmetric=True),
                     jnp.asarray(b), rtol=1e-11)
        true_resid = np.linalg.norm(A @ np.asarray(res.x) - b)
        assert float(res.resid_norm) == pytest.approx(true_resid, rel=1e-6)

    def test_shift(self, rng):
        A = indefinite_symmetric(rng, 50, 10)
        b = rng.standard_normal(50)
        shift = -0.37
        res = symmlq(MatrixOperator(jnp.asarray(A), symmetric=True),
                     jnp.asarray(b), shift=shift, rtol=1e-11)
        resid = np.linalg.norm((A - shift * np.eye(50)) @ np.asarray(res.x)
                               - b)
        assert resid < 1e-6 * np.linalg.norm(b)

    def test_check_rejects_unsymmetric(self, rng):
        B = MatrixOperator(jnp.asarray(rng.standard_normal((30, 30))))
        res = symmlq(B, jnp.ones(30), check=True)
        assert int(res.istop) == 6 and not bool(res.converged)

    def test_zero_rhs(self):
        op = poisson1d_operator(50, dtype=jnp.float64)
        res = symmlq(op, jnp.zeros(50, dtype=jnp.float64))
        assert bool(res.converged) and int(res.n_iter) == 0
        np.testing.assert_array_equal(np.asarray(res.x), np.zeros(50))

    def test_matvec_budget(self, rng):
        A = indefinite_symmetric(rng, 80, 30)
        b = jnp.asarray(rng.standard_normal(80))
        res = symmlq(MatrixOperator(jnp.asarray(A), symmetric=True), b,
                     rtol=1e-15, matvec_max=10)
        assert int(res.n_matvec) <= 12  # budget + final-residual matvec
        assert int(res.istop) == 5 and not bool(res.converged)


def test_minres_symmlq_1138bus_jacobi():
    """North-star config #2: MINRES + SYMMLQ on 1138bus with Jacobi."""
    from pykrylov_tpu.sparse import sparse_operator, jacobi_preconditioner
    op = sparse_operator("1138bus", symmetric=True)
    M = jacobi_preconditioner("1138bus")
    n = 1138
    e = jnp.ones(n, dtype=jnp.float64)
    b = op * e
    rm = minres(op, b, M=M, rtol=1e-10)
    rs = symmlq(op, b, M=M, rtol=1e-8)
    assert bool(rm.converged) and bool(rs.converged)
    assert float(jnp.linalg.norm(rm.x - e) / jnp.sqrt(n)) < 5e-3
    assert float(jnp.linalg.norm(rs.x - e) / jnp.sqrt(n)) < 5e-4


def test_minres_telemetry_buffers():
    """store_iterates + dir_errors_window parity (minres.py:105-107)."""
    op = poisson1d_operator(60, dtype=jnp.float64)
    b = op * jnp.ones(60, dtype=jnp.float64)
    res = minres(op, b, rtol=1e-12, store_history=True,
                 store_iterates=True, itnlim=200)
    k = int(res.n_iter)
    it = res.info["iterates"]
    assert it.shape == (201, 60)
    np.testing.assert_allclose(np.asarray(it[k]), np.asarray(res.x))
    de = np.asarray(res.info["dir_errors_window"])
    vals = de[~np.isnan(de)]
    assert len(vals) >= 1 and np.all(vals >= 0)


def test_symmlq_store_iterates():
    op = poisson1d_operator(50, dtype=jnp.float64)
    b = op * jnp.ones(50, dtype=jnp.float64)
    res = symmlq(op, b, rtol=1e-10, store_iterates=True, matvec_max=200)
    buf = np.asarray(res.info["iterates"])
    k = int(res.n_iter)
    assert buf.shape[1] == 50
    # SYMMLQ tests at the top of each iteration: the stopping iteration k
    # performs no step, so LQ iterates occupy rows 0..k-1 (the returned x
    # additionally applies the CG-point move and the b-step).
    assert np.all(np.isfinite(buf[:k]))
    assert np.all(np.isnan(buf[k + 1:]))
    # Like the reference's buffers, LQ iterates exclude the component
    # along b that SYMMLQ accumulates separately (bstep, symmlq.py:331,
    # applied only at exit) — so they are NOT directly solution
    # approximations; check the stored trajectory is the LQ sequence by
    # confirming the first step is nonzero and iterates change each step.
    assert np.linalg.norm(buf[1]) > 0
    assert np.linalg.norm(buf[k - 1] - buf[k - 2]) > 0
