"""Sparse container + MatrixMarket loader tests.

Every format's matvec/rmatvec is checked against the dense product on random
matrices and on the bundled benchmark matrices; the MM parser round-trips
and expands symmetric storage (1138bus) correctly.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import pykrylov_tpu.sparse.formats as F
from pykrylov_tpu.sparse import (sparse_operator, operator_from_coo,
                                 jacobi_preconditioner)
from pykrylov_tpu.io import read_matrix_market, write_matrix_market, load_bundled
from pykrylov_tpu.gallery import poisson2d_coo, poisson1d_coo


def random_coo(rng, m, n, density=0.2, dtype=np.float64):
    A = rng.standard_normal((m, n)).astype(dtype)
    A[rng.random((m, n)) > density] = 0.0
    # make sure no empty matrix
    A[0, 0] = 1.5
    rows, cols = np.nonzero(A)
    return A, F.coo_from_arrays(A[rows, cols], rows, cols, (m, n))


class TestFormats:
    @pytest.mark.parametrize("shape", [(13, 13), (7, 11), (11, 7)])
    def test_coo_csr_ell_matvec(self, rng, shape):
        m, n = shape
        A, coo = random_coo(rng, m, n)
        csr = F.csr_from_coo(coo)
        ell = F.ell_from_coo(coo, pad_to=4)
        x = rng.standard_normal(n)
        y = rng.standard_normal(m)
        for mv, a in ((F.coo_matvec, coo), (F.csr_matvec, csr),
                      (F.ell_matvec, ell)):
            np.testing.assert_allclose(np.asarray(mv(a, jnp.asarray(x))),
                                       A @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(F.coo_rmatvec(coo, jnp.asarray(y))),
                                   A.T @ y, atol=1e-12)
        np.testing.assert_allclose(np.asarray(F.csr_rmatvec(csr, jnp.asarray(y))),
                                   A.T @ y, atol=1e-12)

    @pytest.mark.parametrize("shape", [(16, 16), (9, 14), (14, 9)])
    def test_dia_matvec_banded(self, rng, shape):
        m, n = shape
        A = np.zeros(shape)
        for off in (-3, -1, 0, 2):
            for i in range(m):
                j = i + off
                if 0 <= j < n:
                    A[i, j] = rng.standard_normal()
        rows, cols = np.nonzero(A)
        coo = F.coo_from_arrays(A[rows, cols], rows, cols, shape)
        dia = F.dia_from_coo(coo)
        x = rng.standard_normal(n)
        y = rng.standard_normal(m)
        np.testing.assert_allclose(np.asarray(F.dia_matvec(dia, jnp.asarray(x))),
                                   A @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(F.dia_rmatvec(dia, jnp.asarray(y))),
                                   A.T @ y, atol=1e-12)
        np.testing.assert_allclose(np.asarray(F.to_dense(dia)), A, atol=1e-14)

    def test_to_dense_roundtrip(self, rng):
        A, coo = random_coo(rng, 10, 12)
        for a in (coo, F.csr_from_coo(coo), F.ell_from_coo(coo)):
            np.testing.assert_allclose(np.asarray(F.to_dense(a)), A, atol=1e-14)

    def test_bandwidth_profile_poisson(self):
        vals, rows, cols, shape = poisson1d_coo(50)
        coo = F.coo_from_arrays(vals, rows, cols, shape)
        ndiag, density = F.bandwidth_profile(coo)
        assert ndiag == 3
        assert density > 0.9


class TestSparseOperator:
    def test_auto_format_poisson_is_dia(self):
        vals, rows, cols, shape = poisson2d_coo(8)
        op = operator_from_coo(vals, rows, cols, shape, symmetric=True)
        assert isinstance(op.container, F.DIA)
        x = np.random.default_rng(1).standard_normal(64)
        dense = np.asarray(F.to_dense(op.container))
        np.testing.assert_allclose(np.asarray(op * jnp.asarray(x)), dense @ x,
                                   atol=1e-12)

    def test_general_uses_ell_and_transpose(self, rng):
        A, coo = random_coo(rng, 20, 20, density=0.1)
        op = sparse_operator(A)
        assert isinstance(op.container, F.ELL)
        x = rng.standard_normal(20)
        np.testing.assert_allclose(np.asarray(op * jnp.asarray(x)), A @ x,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.T * jnp.asarray(x)), A.T @ x,
                                   atol=1e-12)

    def test_jit_solver_compatible(self, rng):
        import jax
        from pykrylov_tpu.solvers import cg
        vals, rows, cols, shape = poisson1d_coo(64)
        op = operator_from_coo(vals, rows, cols, shape, symmetric=True)
        b = jnp.asarray(rng.standard_normal(64))
        res = cg(op, b, rtol=1e-12)
        assert bool(res.converged)
        dense = np.asarray(F.to_dense(op.container))
        np.testing.assert_allclose(np.asarray(res.x),
                                   np.linalg.solve(dense, np.asarray(b)),
                                   rtol=1e-6, atol=1e-9)


class TestMatrixMarket:
    def test_write_read_roundtrip(self, rng, tmp_path):
        A, coo = random_coo(rng, 9, 7)
        p = str(tmp_path / "t.mtx")
        write_matrix_market(p, np.asarray(coo.data), np.asarray(coo.row),
                            np.asarray(coo.col), coo.shape)
        vals, rows, cols, shape, info = read_matrix_market(p)
        assert shape == (9, 7)
        B = np.zeros(shape)
        B[rows, cols] = vals
        np.testing.assert_allclose(B, A, atol=1e-14)

    def test_symmetric_expansion(self, tmp_path):
        # lower triangle of [[2,1],[1,3]]
        p = str(tmp_path / "s.mtx")
        with open(p, "w") as f:
            f.write("%%MatrixMarket matrix coordinate real symmetric\n")
            f.write("2 2 3\n1 1 2.0\n2 1 1.0\n2 2 3.0\n")
        vals, rows, cols, shape, info = read_matrix_market(p)
        B = np.zeros(shape)
        B[rows, cols] = vals
        np.testing.assert_allclose(B, [[2, 1], [1, 3]])
        assert info.symmetry == "symmetric"

    def test_pattern_field(self, tmp_path):
        p = str(tmp_path / "p.mtx")
        with open(p, "w") as f:
            f.write("%%MatrixMarket matrix coordinate pattern general\n")
            f.write("2 3 2\n1 1\n2 3\n")
        vals, rows, cols, shape, info = read_matrix_market(p)
        assert shape == (2, 3)
        np.testing.assert_allclose(vals, [1.0, 1.0])

    def test_bundled_1138bus(self):
        vals, rows, cols, shape = load_bundled("1138bus")
        assert shape == (1138, 1138)
        # expanded from 2596 stored: 2596*2 - n_diag entries
        diag = (np.asarray(rows) == np.asarray(cols)).sum()
        assert len(vals) == 2 * 2596 - diag
        # SPD: diagonal positive, matrix symmetric
        d = np.zeros(1138)
        m = np.asarray(rows) == np.asarray(cols)
        d[np.asarray(rows)[m]] = np.asarray(vals)[m]
        assert (d > 0).all()

    def test_bundled_jpwh(self):
        vals, rows, cols, shape = load_bundled("jpwh_991")
        assert shape == (991, 991)
        assert len(vals) == 6027


class TestJacobi:
    def test_from_bundled(self):
        M = jacobi_preconditioner("1138bus")
        assert M.shape == (1138, 1138)
        x = np.ones(1138)
        assert np.isfinite(np.asarray(M * jnp.asarray(x))).all()


def test_dia_duplicates_accumulate():
    """Duplicate COO entries must accumulate in every format (review
    finding: DIA used last-write-wins while COO/ELL/BSR accumulated)."""
    from pykrylov_tpu.sparse import formats as F
    coo = F.coo_from_arrays([1.0, 2.0], [0, 0], [0, 0], (4, 4))
    for conv in (F.dia_from_coo, F.ell_from_coo, F.csr_from_coo):
        d = np.asarray(F.to_dense(conv(coo)))
        assert d[0, 0] == pytest.approx(3.0), conv.__name__


def test_sparse_operator_preserves_coo_container():
    """A COO container must hit the container branch, not be re-built from
    raw triples (review finding: COO is itself a length-4 tuple)."""
    from pykrylov_tpu.sparse import formats as F, sparse_operator
    from pykrylov_tpu.sparse.linop import SparseOperator
    coo = F.coo_from_arrays([1.0, 2.0], [0, 1], [1, 0], (2, 2))
    op = sparse_operator(coo)
    assert isinstance(op, SparseOperator)
    assert isinstance(op.container, F.COO)


def test_jacobi_zero_diagonal_guard():
    """Structurally zero diagonal entries must not produce inf in the
    preconditioner (review finding)."""
    from pykrylov_tpu.sparse import jacobi_preconditioner
    M = jacobi_preconditioner((np.array([1.0, 2.0]), np.array([0, 1]),
                               np.array([1, 1]), (2, 2)))
    assert bool(jnp.all(jnp.isfinite(M.diag)))
