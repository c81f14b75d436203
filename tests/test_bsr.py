"""BSR container + scalar-prefetch DMA kernel tests (interpreter mode).

Oracle: dense reconstruction.  The compiled TPU path is exercised by the
verify drive; here the interpreter validates packing, both matvec paths,
the operator wrapper, and solver integration.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.bsr import (BSR, bsr_from_coo, bsr_matvec,
                                     bsr_matvec_pallas, bsr_to_dense,
                                     bsr_operator, block_fill, BC, BR,
                                     GROUP)
from pykrylov_tpu.solvers import bicgstab, cg


def random_coo(rng, m, n, nnz):
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    return F.coo_from_arrays(vals, rows, cols, (m, n))


class TestPacking:
    def test_dense_roundtrip(self, rng):
        coo = random_coo(rng, 300, 250, 2000)
        bsr = bsr_from_coo(coo)
        np.testing.assert_allclose(bsr_to_dense(bsr),
                                   np.asarray(F.to_dense(coo)), atol=1e-12)

    def test_duplicates_accumulate(self):
        coo = F.coo_from_arrays([1.0, 2.0], [3, 3], [5, 5], (10, 10))
        bsr = bsr_from_coo(coo)
        assert bsr_to_dense(bsr)[3, 5] == pytest.approx(3.0)

    def test_block_fill_dense_blocks(self, rng):
        # One fully dense (8, 128) block -> fill 1.0
        rr, cc = np.meshgrid(np.arange(BR), np.arange(BC), indexing="ij")
        coo = F.coo_from_arrays(rng.standard_normal(BR * BC),
                                rr.ravel(), cc.ravel(), (BR, BC))
        bsr = bsr_from_coo(coo)
        assert bsr.data.shape[1] == 1
        assert block_fill(bsr) == pytest.approx(1.0)


class TestMatvec:
    @pytest.mark.parametrize("m,n,nnz", [(300, 250, 2000), (64, 512, 400),
                                         (1000, 1000, 5000)])
    def test_both_paths_match_dense(self, rng, m, n, nnz):
        coo = random_coo(rng, m, n, nnz)
        bsr = bsr_from_coo(coo)
        dense = np.asarray(F.to_dense(coo))
        x = rng.standard_normal(n)
        y_xla = np.asarray(bsr_matvec(bsr, jnp.asarray(x)))
        np.testing.assert_allclose(y_xla, dense @ x, atol=1e-10)
        npad = (n + BC - 1) // BC * BC
        xp = np.zeros(npad)
        xp[:n] = x
        y_k = np.asarray(bsr_matvec_pallas(bsr, jnp.asarray(xp),
                                           interpret=True))[:m]
        np.testing.assert_allclose(y_k, dense @ x, atol=1e-10)


class TestOperator:
    def test_matvec_and_transpose(self, rng):
        n = 300
        A = np.zeros((n, n))
        idx = rng.integers(0, n, (1500, 2))
        A[idx[:, 0], idx[:, 1]] = rng.standard_normal(1500)
        op = bsr_operator(A, use_pallas=False)
        x = rng.standard_normal(n)
        np.testing.assert_allclose(np.asarray(op * jnp.asarray(x)), A @ x,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(op.T * jnp.asarray(x)),
                                   A.T @ x, atol=1e-10)

    def test_solver_integration(self, rng):
        n = 200
        A = np.zeros((n, n))
        idx = rng.integers(0, n, (900, 2))
        A[idx[:, 0], idx[:, 1]] = rng.standard_normal(900)
        A += np.diag(20 + np.abs(A).sum(1))
        op = bsr_operator(A, use_pallas=False)
        res = bicgstab(op, jnp.asarray(A @ np.ones(n)), rtol=1e-10)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-7)

    def test_symmetric_spd(self, rng):
        n = 150
        B = rng.standard_normal((n, 30))
        A = B @ B.T + n * np.eye(n)
        rr, cc = np.nonzero(np.abs(A) > 1e-12)
        coo = F.coo_from_arrays(A[rr, cc], rr, cc, (n, n))
        op = bsr_operator(coo, symmetric=True, use_pallas=False)
        res = cg(op, jnp.asarray(A @ np.ones(n)), rtol=1e-10)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-6)
