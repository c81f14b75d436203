"""Utility tests: machine_epsilon, roots_quadratic, randomized oracles,
and the Cholesky operators."""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.utils import (machine_epsilon, roots_quadratic,
                                check_symmetric, check_positive_definite)
from pykrylov_tpu.ops import (MatrixOperator, CholeskyOperator,
                              HostFactorizationOperator, DiagonalOperator)


class TestMachineEpsilon:
    def test_float64(self):
        assert machine_epsilon(np.float64) == pytest.approx(2.220446049250313e-16)

    def test_float32(self):
        assert machine_epsilon(np.float32) == pytest.approx(1.1920929e-07)


class TestRootsQuadratic:
    def test_two_roots(self):
        roots = sorted(roots_quadratic(1.0, -3.0, 2.0))
        np.testing.assert_allclose(roots, [1.0, 2.0], rtol=1e-12)

    def test_linear(self):
        roots = roots_quadratic(0.0, 2.0, -4.0)
        np.testing.assert_allclose(roots, [2.0])

    def test_no_real_roots(self):
        assert roots_quadratic(1.0, 0.0, 1.0) == []

    def test_cancellation_stable(self):
        # x^2 - 1e8 x + 1 = 0: naive formula loses the small root.
        r = sorted(roots_quadratic(1.0, -1e8, 1.0))
        np.testing.assert_allclose(r[0], 1e-8, rtol=1e-6)
        np.testing.assert_allclose(r[1], 1e8, rtol=1e-12)

    def test_constant_zero(self):
        assert roots_quadratic(0.0, 0.0, 0.0) == [0.0]


class TestOracles:
    def test_symmetric_detects(self, rng):
        A = rng.standard_normal((8, 8))
        assert check_symmetric(MatrixOperator(A + A.T, symmetric=True))
        assert not check_symmetric(MatrixOperator(A))

    def test_pd_detects(self, rng):
        A = rng.standard_normal((8, 8))
        spd = A @ A.T + 8 * np.eye(8)
        assert check_positive_definite(MatrixOperator(spd, symmetric=True))
        assert not check_positive_definite(MatrixOperator(-spd, symmetric=True))


class TestCholesky:
    def test_inverse_action(self, rng):
        A = rng.standard_normal((6, 6))
        spd = A @ A.T + 6 * np.eye(6)
        inv = CholeskyOperator(spd)
        x = rng.standard_normal(6)
        np.testing.assert_allclose(inv * (spd @ x), x, rtol=1e-10)
        assert inv.symmetric

    def test_from_operator(self, rng):
        A = rng.standard_normal((5, 5))
        spd = A @ A.T + 5 * np.eye(5)
        inv = CholeskyOperator(MatrixOperator(spd, symmetric=True))
        x = rng.standard_normal(5)
        np.testing.assert_allclose(inv * (spd @ x), x, rtol=1e-10)

    def test_host_factorization(self, rng):
        import scipy.sparse as sp
        d = rng.standard_normal(8) ** 2 + 1
        A = sp.diags(d).tocsc()
        op = HostFactorizationOperator.from_scipy_spd(A)
        x = rng.standard_normal(8)
        np.testing.assert_allclose(op * (d * x), x, rtol=1e-12)

    def test_host_factorization_under_jit(self, rng):
        import jax
        d = rng.standard_normal(4) ** 2 + 1
        op = HostFactorizationOperator(4, lambda r: r / d)

        @jax.jit
        def apply(o, x):
            return o.matvec(x)

        x = jnp.asarray(rng.standard_normal(4))
        np.testing.assert_allclose(apply(op, x), np.asarray(x) / d, rtol=1e-12)
