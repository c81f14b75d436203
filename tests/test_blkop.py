"""Block-operator tests (mirrors ``linop/tests/test_blkop.py`` strategy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.ops import (
    MatrixOperator, DiagonalOperator, IdentityOperator, ZeroOperator,
    BlockLinearOperator, BlockDiagonalLinearOperator,
    BlockPreconditioner, BlockDiagonalPreconditioner, ShapeError,
)


@pytest.fixture
def mats(rng):
    A = rng.standard_normal((2, 2)); A = A + A.T      # 2x2 symmetric
    B = rng.standard_normal((2, 3))
    C = rng.standard_normal((3, 3)); C = C + C.T      # 3x3 symmetric
    D = rng.standard_normal((3, 2))
    return A, B, C, D


def dense_of(blocks):
    return np.block(blocks)


class TestBlockLinearOperator:
    def test_matvec_vs_dense(self, mats, rng):
        A, B, C, D = mats
        op = BlockLinearOperator([
            [MatrixOperator(A), MatrixOperator(B)],
            [MatrixOperator(D), MatrixOperator(C)],
        ])
        M = dense_of([[A, B], [D, C]])
        assert op.shape == (5, 5)
        x = rng.standard_normal(5)
        np.testing.assert_allclose(op * x, M @ x, rtol=1e-12)
        np.testing.assert_allclose(op.T * x, M.T @ x, rtol=1e-12)

    def test_rectangular(self, mats, rng):
        A, B, C, D = mats
        op = BlockLinearOperator([[MatrixOperator(A), MatrixOperator(B)]])
        M = np.hstack([A, B])
        x = rng.standard_normal(5)
        y = rng.standard_normal(2)
        np.testing.assert_allclose(op * x, M @ x, rtol=1e-12)
        np.testing.assert_allclose(op.T * y, M.T @ y, rtol=1e-12)

    def test_symmetric_autofill(self, mats, rng):
        A, B, C, D = mats
        opA = MatrixOperator(A, symmetric=True)
        opB = MatrixOperator(B)
        opC = MatrixOperator(C, symmetric=True)
        op = BlockLinearOperator([[opA, opB], [opC]], symmetric=True)
        assert op.symmetric
        # lower triangle filled with transpose twin
        assert op.blocks[1][0].shape == (3, 2)
        M = dense_of([[A, B], [B.T, C]])
        x = rng.standard_normal(5)
        np.testing.assert_allclose(op * x, M @ x, rtol=1e-12)

    def test_shape_consistency_errors(self, mats):
        A, B, C, D = mats
        with pytest.raises(ShapeError):
            BlockLinearOperator([
                [MatrixOperator(A), MatrixOperator(B)],
                [MatrixOperator(C), MatrixOperator(D)],
            ])

    def test_non_symmetric_diagonal_raises(self, mats):
        A, B, C, D = mats
        with pytest.raises(ValueError):
            BlockLinearOperator([[MatrixOperator(A), MatrixOperator(B)],
                                 [MatrixOperator(C)]], symmetric=True)

    def test_getitem(self, mats):
        A, B, C, D = mats
        opA, opB = MatrixOperator(A), MatrixOperator(B)
        opC, opD = MatrixOperator(C), MatrixOperator(D)
        op = BlockLinearOperator([[opA, opB], [opD, opC]])
        assert op[0, 0] is opA
        assert opA in op
        assert len(list(iter(op))) == 4

    def test_contains_and_setitem(self, mats):
        A, B, C, D = mats
        opA, opB = MatrixOperator(A), MatrixOperator(B)
        opC, opD = MatrixOperator(C), MatrixOperator(D)
        op = BlockLinearOperator([[opA, opB], [opD, opC]])
        newA = MatrixOperator(A * 2)
        op[0, 0] = newA
        assert op[0, 0] is newA


class TestBlockDiagonal:
    def test_matvec_vs_dense(self, mats, rng):
        A, B, C, D = mats
        op = BlockDiagonalLinearOperator(
            [MatrixOperator(A, symmetric=True), MatrixOperator(C, symmetric=True)])
        assert op.symmetric
        M = np.zeros((5, 5)); M[:2, :2] = A; M[2:, 2:] = C
        x = rng.standard_normal(5)
        np.testing.assert_allclose(op * x, M @ x, rtol=1e-12)
        np.testing.assert_allclose(op.T * x, M.T @ x, rtol=1e-12)

    def test_slice_indexing(self, mats):
        A, B, C, D = mats
        blocks = [MatrixOperator(A), MatrixOperator(C), IdentityOperator(4)]
        op = BlockDiagonalLinearOperator(blocks)
        sub = op[:2]
        assert isinstance(sub, BlockDiagonalLinearOperator)
        assert sub.shape == (5, 5)
        assert op[2] is blocks[2]

    def test_rejects_non_operator(self):
        with pytest.raises(ValueError):
            BlockDiagonalLinearOperator([np.eye(2)])


class TestPreconditioners:
    def test_solve_alias(self, mats, rng):
        A, B, C, D = mats
        op = BlockDiagonalPreconditioner(
            [DiagonalOperator(np.array([1., 2.])), IdentityOperator(3)])
        x = rng.standard_normal(5)
        np.testing.assert_allclose(op.solve(x), op * x)

    def test_block_precon(self, mats, rng):
        A, B, C, D = mats
        op = BlockPreconditioner([
            [MatrixOperator(A), MatrixOperator(B)],
            [MatrixOperator(D), MatrixOperator(C)],
        ])
        x = rng.standard_normal(5)
        np.testing.assert_allclose(op.solve(x), op * x)


def test_getitem_row_and_column_orientation(rng):
    """blk[0] is the 1xk block ROW, blk[:, 0] the kx1 column (review
    finding: the old guard transposed scalar-row selections)."""
    from pykrylov_tpu.ops import BlockLinearOperator, MatrixOperator
    A = MatrixOperator(jnp.asarray(rng.standard_normal((2, 2))))
    B = MatrixOperator(jnp.asarray(rng.standard_normal((2, 3))))
    C = MatrixOperator(jnp.asarray(rng.standard_normal((4, 2))))
    D = MatrixOperator(jnp.asarray(rng.standard_normal((4, 3))))
    blk = BlockLinearOperator([[A, B], [C, D]])
    row0 = blk[0]
    assert row0.shape == (2, 5)
    x = jnp.asarray(rng.standard_normal(5))
    expect = np.asarray(A.matrix) @ np.asarray(x[:2]) \
        + np.asarray(B.matrix) @ np.asarray(x[2:])
    np.testing.assert_allclose(np.asarray(row0 * x), expect, atol=1e-12)
    col0 = blk[:, 0]
    assert col0.shape == (6, 2)


def test_setitem_validates_and_resets_twins(rng):
    from pykrylov_tpu.ops import (BlockLinearOperator, MatrixOperator,
                                  ShapeError)
    A = MatrixOperator(jnp.asarray(rng.standard_normal((2, 2))))
    B = MatrixOperator(jnp.asarray(rng.standard_normal((2, 2))))
    blk = BlockLinearOperator([[A, B]])
    t_before = blk.T
    with pytest.raises(ShapeError):
        blk[0, 1] = MatrixOperator(jnp.asarray(np.ones((3, 3))))
    B2 = MatrixOperator(jnp.asarray(2.0 * np.asarray(B.matrix)))
    blk[0, 1] = B2
    x = jnp.asarray(rng.standard_normal(2))
    # the rebuilt transpose sees the NEW block
    y = np.asarray(blk.T * x)
    expect = np.concatenate([np.asarray(A.matrix).T @ np.asarray(x),
                             np.asarray(B2.matrix).T @ np.asarray(x)])
    np.testing.assert_allclose(y, expect, atol=1e-12)
