"""JAX-transform integration: solvers under jit / vmap, operators as
pytree arguments, donated buffers.

The reference cannot do any of this (host loops); these tests pin down the
functional design's key payoffs (SURVEY §7 design stance).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pykrylov_tpu.ops import MatrixOperator, DiagonalOperator
from pykrylov_tpu.solvers import cg, bicgstab, lsqr
from pykrylov_tpu.gallery import poisson1d_operator


def test_solver_inside_user_jit():
    op = poisson1d_operator(80, dtype=jnp.float64)

    @jax.jit
    def residual_of(b):
        res = cg(op, b, rtol=1e-10)
        return res.resid_norm, res.x

    b = op * jnp.ones(80, dtype=jnp.float64)
    rn, x = residual_of(b)
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-8)


def test_vmap_over_rhs():
    """Batched solves: one compiled program, B systems."""
    op = poisson1d_operator(60, dtype=jnp.float64)
    B = 5
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((B, 60)))
    bs = jax.vmap(lambda x: op.apply_with(op._mv, x))(xs)
    solve = jax.vmap(lambda b: cg(op, b, rtol=1e-11, maxiter=200).x)
    out = solve(bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xs), atol=1e-7)


def test_vmap_over_operator_params(rng):
    """Batch over operator parameters (diagonal systems)."""
    n, B = 40, 4
    diags = jnp.asarray(1.0 + rng.random((B, n)))
    b = jnp.ones(n, dtype=jnp.float64)

    def solve_one(d):
        return cg(DiagonalOperator(d), b, rtol=1e-12).x

    out = jax.vmap(solve_one)(diags)
    np.testing.assert_allclose(np.asarray(out), 1.0 / np.asarray(diags),
                               atol=1e-9)


def test_operator_pytree_roundtrip():
    op = poisson1d_operator(30, dtype=jnp.float64)
    leaves, treedef = jax.tree_util.tree_flatten(op)
    op2 = jax.tree_util.tree_unflatten(treedef, leaves)
    x = jnp.arange(30.0)
    np.testing.assert_array_equal(np.asarray(op * x), np.asarray(op2 * x))

    A = MatrixOperator(jnp.eye(4) * 2.0)
    leaves, treedef = jax.tree_util.tree_flatten(A)
    assert len(leaves) == 1 and leaves[0].shape == (4, 4)
    A2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(A2 * jnp.ones(4)),
                                  2.0 * np.ones(4))


def test_composed_operator_traces_once(rng):
    """Algebraic compositions stay jittable as arguments."""
    n = 25
    A = MatrixOperator(jnp.asarray(rng.standard_normal((n, n))
                                   + 10 * np.eye(n)))
    D = DiagonalOperator(jnp.asarray(1.0 + rng.random(n)))
    comp = (2.0 * A + D) @ D  # scalar*op + op, then composition
    b = jnp.ones(n, dtype=jnp.float64)
    res = bicgstab(comp, b, rtol=1e-11, matvec_max=500)
    assert bool(res.converged)
    dense = (2.0 * np.asarray(A.matrix) + np.diag(np.asarray(D.diag))) \
        @ np.diag(np.asarray(D.diag))
    np.testing.assert_allclose(dense @ np.asarray(res.x), np.ones(n),
                               atol=1e-8)


def test_vmap_lsqr(rng):
    m, n, B = 40, 15, 3
    A = MatrixOperator(jnp.asarray(rng.standard_normal((m, n))))
    xs = rng.standard_normal((B, n))
    bs = jnp.asarray(xs @ np.asarray(A.matrix).T)
    out = jax.vmap(lambda b: lsqr(A, b, atol=1e-12, btol=1e-12,
                                  etol=0.0, itnlim=100).x)(bs)
    np.testing.assert_allclose(np.asarray(out), xs, atol=1e-8)


class TestSolveDispatcher:
    def test_spd_auto(self):
        from pykrylov_tpu import solve
        op = poisson1d_operator(80, dtype=jnp.float64)
        b = op * jnp.ones(80, dtype=jnp.float64)
        res = solve(op, b, rtol=1e-10)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)

    def test_indefinite_falls_back_to_minres(self, rng):
        from pykrylov_tpu import solve
        n = 40
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        d = np.concatenate([np.linspace(1, 4, 25), -np.linspace(1, 2, 15)])
        A = (Q * d) @ Q.T
        xs = rng.standard_normal(n)
        res = solve(MatrixOperator(jnp.asarray(A), symmetric=True),
                    jnp.asarray(A @ xs))
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), xs, atol=1e-4)

    def test_rectangular_uses_lsmr(self, rng):
        from pykrylov_tpu import solve
        A = rng.standard_normal((50, 20))
        b = A @ np.ones(20)
        res = solve(MatrixOperator(jnp.asarray(A)), jnp.asarray(b))
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-6)

    def test_unsymmetric_and_explicit_method(self, rng):
        from pykrylov_tpu import solve
        A = rng.standard_normal((30, 30)) + 30 * np.eye(30)
        b = jnp.asarray(A @ np.ones(30))
        res = solve(MatrixOperator(jnp.asarray(A)), b, rtol=1e-10)
        assert bool(res.converged)
        res2 = solve(MatrixOperator(jnp.asarray(A)), b, method="cgs",
                     rtol=1e-10)
        assert bool(res2.converged)
        with pytest.raises(ValueError, match="unknown method"):
            solve(MatrixOperator(jnp.asarray(A)), b, method="nope")


def test_square_solver_shape_guards(rng):
    from pykrylov_tpu.solvers import cg, bicgstab, minres
    rect = MatrixOperator(jnp.asarray(rng.standard_normal((10, 6))))
    sq = MatrixOperator(jnp.asarray(np.eye(6)))
    for f in (cg, bicgstab, minres):
        with pytest.raises(ValueError, match="square operator"):
            f(rect, jnp.ones(10))
        with pytest.raises(ValueError, match="rhs has shape"):
            f(sq, jnp.ones(10))
