"""Tests for the reference-style class API (compat layer).

Exercises the attribute contract of ``KrylovMethod``
(``generic/generic.py:79-87``): after ``solve``, instances carry
``converged``, ``nMatvec``, ``bestSolution``/``x``, ``residNorm``,
``residNorm0``, ``residHistory``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.compat import (CG, Minres, Symmlq, BiCGSTAB, CGS, TFQMR,
                                 LSQRFramework, LSMRFramework,
                                 CRAIGFramework, CRAIGMRFramework)
from pykrylov_tpu.ops import MatrixOperator, DiagonalOperator
from pykrylov_tpu.gallery import poisson1d_operator


def test_cg_reference_protocol():
    """The reference's introductory example (doc/source/introduction.rst):
    1-D Poisson n=100, matrix-free, matvec_max=200 → 50 matvecs,
    resid 7.39e-14, err 2.06e-15 (BASELINE metric #1)."""
    n = 100
    op = poisson1d_operator(n, dtype=jnp.float64)
    e = jnp.ones(n, dtype=jnp.float64)
    rhs = op * e
    cg = CG(op, reltol=1.0e-8)
    cg.solve(rhs, matvec_max=200)
    assert cg.converged
    assert abs(cg.nMatvec - 50) <= 2
    assert cg.residNorm <= 1.0e-8 * cg.residNorm0
    err = float(jnp.linalg.norm(cg.bestSolution - e)) / np.sqrt(n)
    assert err < 1e-12
    assert len(cg.residHistory) == cg.nIter + 1
    assert cg.residHistory[0] == pytest.approx(cg.residNorm0)


def test_cg_precon_kwarg():
    n = 80
    d = jnp.asarray(np.linspace(1.0, 1e4, n))
    A = DiagonalOperator(d)
    M = DiagonalOperator(1.0 / d)
    b = jnp.ones(n, dtype=jnp.float64)
    plain = CG(A, reltol=1e-10)
    plain.solve(b)
    pre = CG(A, precon=M, reltol=1e-10)
    pre.solve(b)
    assert pre.converged and pre.nMatvec < plain.nMatvec


def test_unsymmetric_classes(rng):
    A = rng.standard_normal((50, 50)) + 50 * np.eye(50)
    op = MatrixOperator(jnp.asarray(A))
    b = jnp.asarray(A @ np.ones(50))
    for cls in (BiCGSTAB, CGS, TFQMR):
        ks = cls(op, reltol=1e-10)
        ks.solve(b)
        assert ks.converged, cls.__name__
        np.testing.assert_allclose(np.asarray(ks.bestSolution),
                                   np.ones(50), rtol=1e-6)
        assert ks.x is ks.bestSolution
        assert ks.acronym in ks.prefix


def test_minres_class_attributes():
    op = poisson1d_operator(60, dtype=jnp.float64)
    b = op * jnp.ones(60, dtype=jnp.float64)
    K = Minres(op)
    K.solve(b, rtol=1e-12)
    assert K.converged and K.istop in (1, 2, 10)
    assert K.Anorm > 0 and K.Acond >= 1
    assert K.rnorm == K.residNorm


def test_symmlq_class_attributes():
    op = poisson1d_operator(60, dtype=jnp.float64)
    b = op * jnp.ones(60, dtype=jnp.float64)
    K = Symmlq(op)
    K.solve(b, rtol=1e-10)
    assert K.converged
    assert K.xNorm == pytest.approx(float(jnp.linalg.norm(K.x)), rel=1e-6)


def test_lsqr_framework(rng):
    A = rng.standard_normal((80, 30))
    b = A @ np.ones(30) + 0.01 * rng.standard_normal(80)
    K = LSQRFramework(MatrixOperator(jnp.asarray(A)))
    K.solve(jnp.asarray(b), atol=1e-12, btol=1e-12, etol=0.0)
    assert K.optimal and K.istop == 2
    assert K.nMatvec == 2 * K.nIter
    x_ls, *_ = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(np.asarray(K.x), x_ls, atol=1e-9)
    assert K.r1norm == pytest.approx(np.linalg.norm(A @ x_ls - b), rel=1e-6)


def test_lsmr_returns_reference_tuple(rng):
    A = rng.standard_normal((80, 30))
    b = A @ np.ones(30)
    K = LSMRFramework(MatrixOperator(jnp.asarray(A)))
    out = K.solve(jnp.asarray(b), atol=1e-12, btol=1e-12, etol=0.0)
    x, istop, itn, normr, normar, normA, condA, normx = out
    assert istop == 1
    np.testing.assert_allclose(np.asarray(x), np.ones(30), atol=1e-9)
    assert K.normx == pytest.approx(normx)


def test_craig_frameworks(rng):
    m, n = 30, 70
    A = rng.standard_normal((m, n))
    b = A @ rng.standard_normal(n)
    K = CRAIGFramework(MatrixOperator(jnp.asarray(A)))
    K.solve(jnp.asarray(b), btol=1e-12, etol=1e-14)
    x_sqd = A.T @ np.linalg.solve(A @ A.T + np.eye(m), b)
    np.testing.assert_allclose(np.asarray(K.x), x_sqd, atol=1e-9)
    assert np.asarray(K.r).shape == (m,)

    K2 = CRAIGMRFramework(MatrixOperator(jnp.asarray(A)))
    K2.solve(jnp.asarray(b), etol=1e-13)
    y = np.linalg.solve(A @ A.T + np.eye(m), b)
    np.testing.assert_allclose(np.asarray(K2.x), y, atol=1e-9)
    K2.init_data()
    assert K2.x is None and not K2.converged
