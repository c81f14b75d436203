"""L-BFGS operator tests (mirrors ``linop/tests/test_lbfgs.py`` strategy:
randomized symmetry/PD oracles, inverse-pair identity B·H ≈ I, curvature
rejection)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.ops import (
    InverseLBFGSOperator, LBFGSOperator, CompactLBFGSOperator,
    StructuredLBFGSOperator,
)
from pykrylov_tpu.utils import check_symmetric, check_positive_definite


N = 10
NPAIRS = 5


def filled_pair_ops(rng, scaling=False):
    H = InverseLBFGSOperator(N, NPAIRS, scaling=scaling, dtype=np.float64)
    B = LBFGSOperator(N, NPAIRS, scaling=scaling, dtype=np.float64)
    C = CompactLBFGSOperator(N, NPAIRS, scaling=scaling, dtype=np.float64)
    for _ in range(NPAIRS + 2):   # overfill: exercises the ring buffer
        s = rng.standard_normal(N)
        y = rng.standard_normal(N)
        if np.dot(s, y) < 0:
            y = -y
        for op in (H, B, C):
            op.store(jnp.asarray(s), jnp.asarray(y))
    return H, B, C


class TestInverseLBFGS:
    def test_starts_as_identity(self):
        H = InverseLBFGSOperator(N, NPAIRS, dtype=np.float64)
        x = np.arange(1., N + 1)
        np.testing.assert_allclose(H * x, x)

    def test_symmetric_and_pd(self, rng):
        H, B, C = filled_pair_ops(rng)
        assert check_symmetric(H)
        assert check_positive_definite(H)

    def test_secant_equation(self, rng):
        """After storing (s,y), H y == s must hold for the newest pair."""
        H = InverseLBFGSOperator(N, NPAIRS, scaling=False, dtype=np.float64)
        s = rng.standard_normal(N)
        y = rng.standard_normal(N)
        if np.dot(s, y) < 0:
            y = -y
        H.store(jnp.asarray(s), jnp.asarray(y))
        np.testing.assert_allclose(H * y, s, rtol=1e-12)

    def test_curvature_rejection(self, rng):
        H = InverseLBFGSOperator(N, NPAIRS, dtype=np.float64)
        s = rng.standard_normal(N)
        y = -s  # negative curvature: s.y < 0
        H.store(jnp.asarray(s), jnp.asarray(y))
        assert not bool(H.data.valid.any())
        x = np.arange(1., N + 1)
        np.testing.assert_allclose(H * x, x)  # still identity

    def test_restart(self, rng):
        H, _, _ = filled_pair_ops(rng)
        H.restart()
        x = np.ones(N)
        np.testing.assert_allclose(H * x, x)


class TestForwardInversePair:
    @pytest.mark.parametrize("scaling", [False, True])
    def test_BH_is_identity(self, rng, scaling):
        H, B, C = filled_pair_ops(rng, scaling=scaling)
        assert check_symmetric(B)
        assert check_positive_definite(B)
        X = np.eye(N)
        BH = np.column_stack([np.asarray(B * np.asarray(H * X[:, i]))
                              for i in range(N)])
        np.testing.assert_allclose(BH, np.eye(N), atol=1e-8)

    @pytest.mark.parametrize("scaling", [False, True])
    def test_compact_matches_forward(self, rng, scaling):
        H, B, C = filled_pair_ops(rng, scaling=scaling)
        x = rng.standard_normal(N)
        np.testing.assert_allclose(np.asarray(C * x), np.asarray(B * x),
                                   rtol=1e-8, atol=1e-10)

    def test_forward_secant(self, rng):
        B = LBFGSOperator(N, NPAIRS, scaling=False, dtype=np.float64)
        s = rng.standard_normal(N)
        y = rng.standard_normal(N)
        if np.dot(s, y) < 0:
            y = -y
        B.store(jnp.asarray(s), jnp.asarray(y))
        np.testing.assert_allclose(B * s, y, rtol=1e-12)


class TestStructuredLBFGS:
    def test_runs_and_symmetric(self, rng):
        S = StructuredLBFGSOperator(N, NPAIRS, dtype=np.float64)
        for _ in range(3):
            s = rng.standard_normal(N)
            y = rng.standard_normal(N)
            if np.dot(s, y) < 0:
                y = -y
            S.store(jnp.asarray(s), jnp.asarray(y), jnp.asarray(y))
        assert check_symmetric(S)

    @staticmethod
    def _dense_oracle(pairs, n, gamma):
        """Apply the structured secant updates to an explicit matrix:
        B <- B + (A y' + y A')/y's - (s'A) y y'/(y's)^2, A = yd - B s."""
        B = np.eye(n) / gamma
        for s, y, yd in pairs:
            ys = y @ s
            A = yd - B @ s
            B = (B + (np.outer(A, y) + np.outer(y, A)) / ys
                 - (s @ A) * np.outer(y, y) / ys**2)
        return B

    def test_matches_dense_oracle(self, rng):
        S = StructuredLBFGSOperator(N, NPAIRS, scaling=False,
                                    dtype=np.float64)
        pairs = []
        for _ in range(3):  # within memory
            s = rng.standard_normal(N)
            y = rng.standard_normal(N)
            if np.dot(s, y) < 0:
                y = -y
            yd = y + 0.1 * rng.standard_normal(N)
            pairs.append((s, y, yd))
            S.store(jnp.asarray(s), jnp.asarray(y), jnp.asarray(yd))
        B = self._dense_oracle(pairs, N, 1.0)
        v = rng.standard_normal(N)
        np.testing.assert_allclose(np.asarray(S * jnp.asarray(v)), B @ v,
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.abs(B - B.T).max(), 0, atol=1e-12)

    def test_structured_secant_condition(self, rng):
        # B_{k+1} s_k = yd_k must hold exactly for the newest pair
        S = StructuredLBFGSOperator(N, NPAIRS, scaling=False,
                                    dtype=np.float64)
        for _ in range(4):
            s = rng.standard_normal(N)
            y = rng.standard_normal(N)
            if np.dot(s, y) < 0:
                y = -y
            yd = y + 0.05 * rng.standard_normal(N)
            S.store(jnp.asarray(s), jnp.asarray(y), jnp.asarray(yd))
            np.testing.assert_allclose(np.asarray(S * jnp.asarray(s)), yd,
                                       rtol=1e-9, atol=1e-9)

    def test_oracle_with_eviction(self, rng):
        # more pairs than memory: the oracle sees only the surviving ones,
        # but each surviving A_k was formed against the FULL history B_k —
        # replay the evicted prefix into the starting matrix.
        mem = 3
        S = StructuredLBFGSOperator(N, mem, scaling=False, dtype=np.float64)
        allp = []
        for _ in range(5):
            s = rng.standard_normal(N)
            y = rng.standard_normal(N)
            if np.dot(s, y) < 0:
                y = -y
            yd = y + 0.1 * rng.standard_normal(N)
            allp.append((s, y, yd))
            S.store(jnp.asarray(s), jnp.asarray(y), jnp.asarray(yd))
        # operator rebuilds from B0=I using only the live window
        B = self._dense_oracle(allp[-mem:], N, 1.0)
        v = rng.standard_normal(N)
        np.testing.assert_allclose(np.asarray(S * jnp.asarray(v)), B @ v,
                                   rtol=1e-9, atol=1e-9)

    def test_rejects_bad_pair(self, rng):
        S = StructuredLBFGSOperator(N, NPAIRS, scaling=False,
                                    dtype=np.float64)
        s = rng.standard_normal(N)
        y = -s  # y's < 0 and s'Bs > 0: acceptance test fails
        S.store(jnp.asarray(s), jnp.asarray(y), jnp.asarray(y))
        assert not bool(np.asarray(S.data["valid"]).any())
