"""Tests for the transpose-free unsymmetric solvers (BiCGSTAB, CGS, TFQMR).

The reference has no unit tests for these solvers (SURVEY §4); their
validation there is the published jpwh_991 numbers, which live in
tests/test_golden.py.  Here we test the algorithmic contract on synthetic
systems, mirroring the protocol of ``cg/tests/test_diagdom.py``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.solvers import bicgstab, cgs, tfqmr
from pykrylov_tpu.ops import MatrixOperator, DiagonalOperator
from pykrylov_tpu.gallery import poisson1d_operator

SOLVERS = [bicgstab, cgs, tfqmr]
IDS = ["bicgstab", "cgs", "tfqmr"]


def random_unsymmetric(rng, n, diag_boost=None):
    """Well-conditioned unsymmetric test matrix (diagonally dominant)."""
    A = rng.standard_normal((n, n))
    A += np.diag((diag_boost or n) * np.ones(n))
    return A


@pytest.mark.parametrize("solve", SOLVERS, ids=IDS)
class TestUnsymmetric:
    def test_dense_system(self, solve, rng):
        n = 60
        A = random_unsymmetric(rng, n)
        e = np.ones(n)
        b = jnp.asarray(A @ e)
        res = solve(MatrixOperator(jnp.asarray(A)), b, rtol=1e-10)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), e, rtol=1e-6)

    def test_spd_system_also_works(self, solve):
        op = poisson1d_operator(100, dtype=jnp.float64)
        e = jnp.ones(100, dtype=jnp.float64)
        b = op * e
        res = solve(op, b, rtol=1e-10, matvec_max=800)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), np.ones(100),
                                   rtol=1e-6)

    def test_guess_warm_start(self, solve, rng):
        n = 50
        A = random_unsymmetric(rng, n)
        xstar = rng.standard_normal(n)
        b = jnp.asarray(A @ xstar)
        op = MatrixOperator(jnp.asarray(A))
        cold = solve(op, b, rtol=1e-10)
        # Start very close to the solution: must converge in fewer matvecs.
        warm = solve(op, b, x0=jnp.asarray(xstar + 1e-8), rtol=1e-10)
        assert bool(warm.converged)
        assert int(warm.n_matvec) < int(cold.n_matvec)

    def test_preconditioner_reduces_matvecs(self, solve, rng):
        n = 80
        d = np.linspace(1.0, 1e4, n)
        A = np.diag(d) + rng.standard_normal((n, n)) * 0.1
        b = jnp.asarray(A @ np.ones(n))
        op = MatrixOperator(jnp.asarray(A))
        M = DiagonalOperator(jnp.asarray(1.0 / d))
        plain = solve(op, b, rtol=1e-8, matvec_max=4 * n)
        pre = solve(op, b, M=M, rtol=1e-8, matvec_max=4 * n)
        assert bool(pre.converged)
        assert int(pre.n_matvec) <= int(plain.n_matvec)

    def test_matvec_budget_respected(self, solve, rng):
        n = 60
        A = random_unsymmetric(rng, n, diag_boost=2)  # harder system
        b = jnp.asarray(rng.standard_normal(n))
        res = solve(MatrixOperator(jnp.asarray(A)), b, rtol=1e-14,
                    atol=0.0, matvec_max=6)
        assert int(res.n_matvec) <= 7  # <= budget + the pair in flight
        if not bool(res.converged):
            assert int(res.istop) == 1

    def test_history(self, solve, rng):
        n = 40
        A = random_unsymmetric(rng, n)
        b = jnp.asarray(A @ np.ones(n))
        res = solve(MatrixOperator(jnp.asarray(A)), b, rtol=1e-9,
                    store_history=True)
        h = res.history()
        assert len(h) == int(res.n_iter) + 1
        assert h[0] == pytest.approx(float(res.resid_norm0))
        assert h[-1] <= h[0]

    def test_zero_rhs(self, solve):
        op = poisson1d_operator(30, dtype=jnp.float64)
        res = solve(op, jnp.zeros(30, dtype=jnp.float64))
        assert bool(res.converged)
        assert int(res.n_matvec) == 0
        np.testing.assert_array_equal(np.asarray(res.x), np.zeros(30))


@pytest.mark.parametrize("solve", SOLVERS, ids=IDS)
def test_breakdown_detected(solve):
    """r0 = b on jpwh_991 is a degenerate shadow vector (scipy's BiCGSTAB
    fails with info=-10 there too); the solver must stop with istop=3 and
    a finite residual instead of spinning NaNs to the matvec cap."""
    from pykrylov_tpu.sparse import sparse_operator
    op = sparse_operator("jpwh_991")
    b = op * jnp.ones(991, dtype=jnp.float64)
    res = solve(op, b, rtol=1e-4)
    assert not bool(res.converged)
    assert int(res.istop) == 3
    assert int(res.n_matvec) <= 10
    assert bool(jnp.isfinite(res.resid_norm))
    assert bool(jnp.all(jnp.isfinite(res.x)))


def test_bicgstab_counts_guess_matvec(rng):
    """Bi-CGSTAB counts the r0-forming matvec (bicgstab.py:61-63); CGS and
    TFQMR do not (cgs.py:59-60, tfqmr.py:59-60)."""
    n = 40
    A = random_unsymmetric(rng, n)
    op = MatrixOperator(jnp.asarray(A))
    xstar = np.ones(n)
    b = jnp.asarray(A @ xstar)
    # Guess = exact solution: zero residual, so no iterations run.
    res_b = bicgstab(op, b, x0=jnp.asarray(xstar), rtol=1e-6)
    res_c = cgs(op, b, x0=jnp.asarray(xstar), rtol=1e-6)
    res_t = tfqmr(op, b, x0=jnp.asarray(xstar), rtol=1e-6)
    assert int(res_b.n_matvec) == 1
    assert int(res_c.n_matvec) == 0
    assert int(res_t.n_matvec) == 0
    for r in (res_b, res_c, res_t):
        assert bool(r.converged)


@pytest.mark.parametrize("solve", SOLVERS, ids=IDS)
def test_complex_unsymmetric_system(solve, rng):
    """The reference's np.dot is unconjugated; the recurrences must stay
    correct for genuinely complex unsymmetric A (review finding)."""
    n = 24
    A = (8j * np.eye(n)
         + 0.5 * (rng.standard_normal((n, n))
                  + 1j * rng.standard_normal((n, n))))
    xs = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = jnp.asarray(A @ xs)
    res = solve(MatrixOperator(jnp.asarray(A)), b, rtol=1e-10)
    assert bool(res.converged)
    relres = (np.linalg.norm(A @ np.asarray(res.x) - np.asarray(b))
              / np.linalg.norm(b))
    assert relres < 1e-8


@pytest.mark.parametrize("solve", SOLVERS, ids=IDS)
def test_overflow_returns_finite_iterate(solve):
    """When the matvec overflows f32 mid-iteration, the solver must stop
    with istop=3 and a finite best iterate, never committing NaNs."""
    A = np.eye(16, dtype=np.float32)
    A[0, 0] = np.float32(3.4e38)
    A[0, 1] = np.float32(-3.4e38)
    res = solve(MatrixOperator(jnp.asarray(A)),
                jnp.ones(16, dtype=jnp.float32), rtol=1e-12, matvec_max=64)
    assert int(res.istop) == 3
    assert bool(jnp.all(jnp.isfinite(res.x)))
    assert bool(jnp.isfinite(res.resid_norm))


def test_verify_final_reports_true_residual():
    # f32 jpwh_991: the recurrence's claimed residual and the verified
    # true residual are both reported; on this well-behaved solve they
    # agree to the f32 matvec floor
    from pykrylov_tpu.io.datasets import load_bundled
    from pykrylov_tpu.sparse import sparse_operator
    from pykrylov_tpu.solvers.bicgstab import bicgstab
    from pykrylov_tpu.solvers.cgs import cgs
    from pykrylov_tpu.solvers.tfqmr import tfqmr

    vals, rows, cols, shape = load_bundled("jpwh_991")
    a = np.zeros(shape)
    np.add.at(a, (rows, cols), vals)
    op = sparse_operator((vals.astype(np.float32), rows, cols, shape),
                         fmt="ell")
    x0 = jnp.asarray(1.0 + np.arange(shape[0]), jnp.float32)
    b = jnp.asarray(a @ np.ones(shape[0]), jnp.float32)
    for solver in (bicgstab, cgs, tfqmr):
        res = solver(op, b, x0=x0, rtol=1e-5, verify_final=True)
        tr = float(res.info["true_resid_norm"])
        ext = np.linalg.norm(a @ np.asarray(res.x, np.float64)
                             - np.asarray(b, np.float64))
        # verified norm matches an external f64 oracle to the f32 floor
        assert abs(tr - ext) <= 1e-5 * max(ext, 1.0), (solver, tr, ext)
