"""Tests for the least-squares family (LSQR, LSMR, CRAIG, CRAIG-MR).

The reference ships no unit tests for these (SURVEY §4).  Oracles here are
closed-form solutions: ``np.linalg.lstsq`` for LSQR/LSMR, and the exact SQD
solutions for the generalized CRAIG methods, which solve
``[M A; A' -N][r; x] = [b; 0]`` (with default M = N = I this is Tikhonov
regularization, NOT plain Ax=b — see ``lls/craig.py:40-47``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.solvers import lsqr, lsmr, craig, craigmr
from pykrylov_tpu.ops import MatrixOperator, DiagonalOperator


@pytest.fixture
def overdetermined(rng):
    m, n = 120, 50
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n) + 0.01 * rng.standard_normal(m)
    x_ls, *_ = np.linalg.lstsq(A, b, rcond=None)
    return A, b, x_ls


@pytest.mark.parametrize("solve", [lsqr, lsmr], ids=["lsqr", "lsmr"])
class TestLsqrLsmr:
    def test_overdetermined_least_squares(self, solve, overdetermined):
        A, b, x_ls = overdetermined
        res = solve(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                    atol=1e-12, btol=1e-12, etol=0.0, itnlim=500)
        assert bool(res.converged) and int(res.istop) == 2
        np.testing.assert_allclose(np.asarray(res.x), x_ls, atol=1e-10)
        assert int(res.n_matvec) == 2 * int(res.n_iter)

    def test_consistent_square_system(self, solve, rng):
        A = rng.standard_normal((50, 50)) + 8 * np.eye(50)
        b = A @ np.ones(50)
        res = solve(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                    atol=1e-12, btol=1e-12, etol=0.0, itnlim=500)
        assert int(res.istop) == 1  # "approximate solution to Ax = b"
        np.testing.assert_allclose(np.asarray(res.x), np.ones(50),
                                   atol=1e-9)

    def test_damped(self, solve, overdetermined):
        A, b, _ = overdetermined
        n = A.shape[1]
        damp = 0.5
        res = solve(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                    damp=damp, atol=1e-13, btol=1e-13, etol=0.0,
                    itnlim=1000)
        x_damp = np.linalg.solve(A.T @ A + damp**2 * np.eye(n), A.T @ b)
        np.testing.assert_allclose(np.asarray(res.x), x_damp, atol=1e-9)

    def test_underdetermined_min_norm(self, solve, rng):
        """For consistent underdetermined systems started from x0=0, LSQR
        and LSMR converge to the minimum-norm solution."""
        m, n = 40, 90
        A = rng.standard_normal((m, n))
        b = A @ rng.standard_normal(n)
        x_mn = A.T @ np.linalg.solve(A @ A.T, b)
        res = solve(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                    atol=1e-12, btol=1e-12, etol=0.0, itnlim=500)
        np.testing.assert_allclose(np.asarray(res.x), x_mn, atol=1e-8)

    def test_zero_rhs(self, solve, rng):
        A = MatrixOperator(jnp.asarray(rng.standard_normal((30, 20))))
        res = solve(A, jnp.zeros(30, dtype=jnp.float64))
        assert bool(res.converged) and int(res.istop) == 0
        np.testing.assert_array_equal(np.asarray(res.x), np.zeros(20))

    def test_itnlim(self, solve, overdetermined):
        A, b, _ = overdetermined
        res = solve(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                    atol=0.0, btol=0.0, conlim=0.0, etol=0.0, itnlim=5)
        assert int(res.istop) == 7
        assert int(res.n_iter) == 5

    def test_norm_estimates(self, solve, overdetermined):
        A, b, x_ls = overdetermined
        res = solve(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                    atol=1e-12, btol=1e-12, etol=0.0, itnlim=500)
        key = "Anorm" if solve is lsqr else "normA"
        anorm_est = float(res.info[key])
        fro = np.linalg.norm(A, "fro")
        assert 0.1 * fro <= anorm_est <= 1.5 * fro
        xnorm_key = "xnorm" if solve is lsqr else "normx"
        assert float(res.info[xnorm_key]) == pytest.approx(
            np.linalg.norm(x_ls), rel=1e-6)


class TestLsqrSQD:
    def test_sqd_2x2(self):
        """The reference's own demo system (``lls/lsqr.py:457-472``):
        [2 1; 1 -3][r; x] = [2; 0] with M=inv(2), N=inv(3), damp=1."""
        A = MatrixOperator(jnp.asarray([[1.0]]))
        M = DiagonalOperator(jnp.asarray([0.5]))
        N = DiagonalOperator(jnp.asarray([1.0 / 3.0]))
        res = lsqr(A, jnp.asarray([2.0]), M=M, N=N, damp=1.0,
                   atol=1e-14, btol=1e-14, etol=0.0)
        assert float(res.x[0]) == pytest.approx(2.0 / 7.0, abs=1e-12)

    def test_wantvar(self, rng):
        m, n = 60, 20
        A = rng.standard_normal((m, n))
        b = A @ np.ones(n)
        res = lsqr(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                   atol=1e-12, btol=1e-12, etol=0.0, itnlim=200,
                   wantvar=True)
        var = np.asarray(res.info["var"])
        true_var = np.diag(np.linalg.inv(A.T @ A))
        # LSQR's var is an estimate; check order of magnitude agreement.
        assert var.shape == (n,)
        assert np.all(var > 0)
        assert np.linalg.norm(var - true_var) / np.linalg.norm(true_var) < 0.5


class TestCraig:
    def test_sqd_solution(self, rng):
        """Default M=N=I: x solves [I A; A' -I][r;x]=[b;0], i.e.
        x = A'(AA'+I)^{-1} b, and r = b - Ax."""
        A = rng.standard_normal((50, 50)) + 8 * np.eye(50)
        b = A @ np.ones(50)
        x_sqd = A.T @ np.linalg.solve(A @ A.T + np.eye(50), b)
        res = craig(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                    btol=1e-12, etol=1e-14, itnlim=500)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), x_sqd, atol=1e-10)
        np.testing.assert_allclose(np.asarray(res.info["r"]),
                                   b - A @ x_sqd, atol=1e-10)

    def test_underdetermined(self, rng):
        m, n = 40, 90
        A = rng.standard_normal((m, n))
        b = A @ rng.standard_normal(n)
        x_sqd = A.T @ np.linalg.solve(A @ A.T + np.eye(m), b)
        res = craig(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                    btol=1e-12, etol=1e-14, itnlim=500)
        np.testing.assert_allclose(np.asarray(res.x), x_sqd, atol=1e-9)

    def test_matvec_accounting(self, rng):
        A = MatrixOperator(jnp.asarray(rng.standard_normal((30, 30))))
        res = craig(A, jnp.ones(30, dtype=jnp.float64), itnlim=10,
                    btol=0.0, etol=0.0)
        assert int(res.n_matvec) == 2 * int(res.n_iter)

    def test_zero_rhs(self, rng):
        A = MatrixOperator(jnp.asarray(rng.standard_normal((30, 20))))
        res = craig(A, jnp.zeros(30, dtype=jnp.float64))
        assert bool(res.converged) and int(res.n_iter) == 0
        np.testing.assert_array_equal(np.asarray(res.x), np.zeros(20))


class TestCraigMR:
    def test_regularized_dual_solution(self, rng):
        """CRAIG-MR's iterate is the dual y = (AA' + I)^{-1} b
        (length m, ``craigmr.py:112``)."""
        m, n = 40, 90
        A = rng.standard_normal((m, n))
        b = A @ rng.standard_normal(n)
        y_reg = np.linalg.solve(A @ A.T + np.eye(m), b)
        res = craigmr(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                      etol=1e-13, itnlim=400)
        assert int(res.istop) == 8
        assert np.asarray(res.x).shape == (m,)
        np.testing.assert_allclose(np.asarray(res.x), y_reg, atol=1e-9)

    def test_iteration_limit(self, rng):
        A = MatrixOperator(jnp.asarray(rng.standard_normal((30, 30))))
        res = craigmr(A, jnp.ones(30, dtype=jnp.float64), etol=0.0,
                      itnlim=7)
        assert int(res.istop) == 7 and int(res.n_iter) == 7


def test_sym_ortho_matches_reference_semantics():
    """sym_ortho sign conventions (``lls/lsmr.py:495-519``)."""
    from pykrylov_tpu.solvers.lls_common import sym_ortho

    def ref(a, b):
        sign = lambda v: -1.0 if v < 0 else 1.0
        if b == 0:
            return sign(a), 0.0, abs(a)
        if a == 0:
            return 0.0, sign(b), abs(b)
        if abs(b) > abs(a):
            tau = a / b
            s = sign(b) / np.sqrt(1 + tau * tau)
            return s * tau, s, b / s
        tau = b / a
        c = sign(a) / np.sqrt(1 + tau * tau)
        return c, c * tau, a / c

    cases = [(3.0, 4.0), (4.0, 3.0), (0.0, 2.0), (2.0, 0.0), (0.0, 0.0),
             (-3.0, 4.0), (3.0, -4.0), (-5.0, -12.0), (1e-30, 1e30)]
    for a, b in cases:
        c_r, s_r, r_r = ref(a, b)
        c_j, s_j, r_j = sym_ortho(jnp.float64(a), jnp.float64(b))
        assert float(c_j) == pytest.approx(c_r, abs=1e-14), (a, b)
        assert float(s_j) == pytest.approx(s_r, abs=1e-14), (a, b)
        assert float(r_j) == pytest.approx(r_r, rel=1e-14, abs=1e-300), (a, b)
        # rotation property
        if r_r != 0:
            assert float(c_j) * a + float(s_j) * b == pytest.approx(
                r_r, rel=1e-10)


def test_lsqr_normal_eqns_history(rng):
    """Reference parity: lsqr.py:80,304 normal_eqns_resids telemetry —
    LSMR-adjacent monotonicity isn't guaranteed for LSQR, but values track
    the Arnorm estimate per iteration."""
    m, n = 60, 25
    A = rng.standard_normal((m, n))
    b = A @ np.ones(n) + 0.01 * rng.standard_normal(m)
    res = lsqr(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
               atol=1e-10, btol=1e-10, etol=0.0, itnlim=200,
               store_history=True)
    ne = np.asarray(res.info["normal_eqns_resids"])
    k = int(res.n_iter)
    assert np.all(np.isfinite(ne[:k + 1]))
    assert ne[k] == pytest.approx(float(res.info["Arnorm"]), rel=1e-6)


def test_craig_primal_dual_iterates(rng):
    """Reference parity: craig.py:100-101 iterates_p / iterates_d."""
    m, n = 30, 70
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n)
    res = craig(MatrixOperator(jnp.asarray(A)), jnp.asarray(b),
                btol=1e-10, etol=1e-12, itnlim=200, store_iterates=True)
    k = int(res.n_iter)
    ip = np.asarray(res.info["iterates_p"])
    idu = np.asarray(res.info["iterates_d"])
    assert ip.shape[1] == n and idu.shape[1] == m
    np.testing.assert_allclose(ip[k], np.asarray(res.x), atol=1e-12)
    np.testing.assert_allclose(idu[k], np.asarray(res.info["r"]),
                               atol=1e-12)
    assert np.all(np.isnan(ip[k + 1:]))


def test_lsqr_lsmr_verify_final_certificates():
    # the verified certificates must match directly computed
    # ||b - Ax|| and ||A'(b-Ax) - damp^2 x|| (Euclidean metric)
    import numpy as np
    from pykrylov_tpu.solvers import lsqr, lsmr

    rng = np.random.default_rng(40)
    m, n = 120, 80
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    damp = 0.3
    for solver in (lsqr, lsmr):
        res = solver(a, jnp.asarray(b), damp=damp, atol=1e-12,
                     btol=1e-12, verify_final=True)
        x = np.asarray(res.x)
        rt = b - a @ x
        ar = a.T @ rt - damp**2 * x
        assert abs(float(res.info["true_resid_norm"])
                   - np.linalg.norm(rt)) < 1e-8 * np.linalg.norm(b)
        assert abs(float(res.info["true_normar"])
                   - np.linalg.norm(ar)) < 1e-8 * np.linalg.norm(b)
        # at convergence the optimality residual is genuinely small
        # (scale: ||A''r|| ~ ||A||*||rt||, rt = O(||b||) on an
        # inconsistent random LS problem)
        scale = np.linalg.norm(a, 2) * np.linalg.norm(rt)
        assert float(res.info["true_normar"]) < 1e-4 * scale


def test_craig_craigmr_verify_final_certificates(rng):
    # SQD block-equation certificates, expressible with the available
    # inverse-weight applies (identity weights here)
    m, n = 40, 90
    a = rng.standard_normal((m, n))
    b = a @ rng.standard_normal(n)
    res = craig(MatrixOperator(jnp.asarray(a)), jnp.asarray(b),
                btol=1e-12, etol=0.0, itnlim=400, verify_final=True)
    x, r = np.asarray(res.x), np.asarray(res.info["r"])
    d1 = (b - a @ x) - r
    d2 = a.T @ r - x
    assert abs(float(res.info["true_dual_resid"])
               - np.linalg.norm(d1)) < 1e-9 * np.linalg.norm(b)
    assert abs(float(res.info["true_primal_resid"])
               - np.linalg.norm(d2)) < 1e-9 * np.linalg.norm(b)
    # CRAIG solves the regularized SQD system: both blocks near zero
    assert float(res.info["true_dual_resid"]) < 1e-6 * np.linalg.norm(b)
    assert float(res.info["true_primal_resid"]) < 1e-6 * np.linalg.norm(b)

    res2 = craigmr(MatrixOperator(jnp.asarray(a)), jnp.asarray(b),
                   etol=1e-13, itnlim=400, verify_final=True)
    y = np.asarray(res2.x)
    d = (b - a @ (a.T @ y)) - y
    assert abs(float(res2.info["true_dual_resid"])
               - np.linalg.norm(d)) < 1e-9 * np.linalg.norm(b)
    assert float(res2.info["true_dual_resid"]) < 1e-6 * np.linalg.norm(b)
