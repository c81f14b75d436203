"""Golden parity tests against the reference's published numbers.

BASELINE.md metrics: the build must match the reference's residual histories
/ convergence behavior on the bundled matrices within its stopping
tolerances.  Matvec counts may differ by a few iterations (different but
equally valid floating-point orderings); residuals must respect the same
threshold and errors must land in the same decade.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.solvers import cg
from pykrylov_tpu.sparse import sparse_operator, jacobi_preconditioner


class TestCG1138Bus:
    """BASELINE metric #2: CG on 1138bus, reltol 1e-6, rhs = A·e.

    Reference: 1759 matvecs, resid0 1.46e+03, resid 1.44e-03, err 1.30e-05
    (``doc/source/cg.rst:56-66``).
    """

    def test_convergence_parity(self):
        op = sparse_operator("1138bus", symmetric=True)
        n = 1138
        e = jnp.ones(n, dtype=jnp.float64)
        b = op * e
        res = cg(op, b, rtol=1e-6, matvec_max=2 * n)
        assert bool(res.converged)
        resid0 = float(res.resid_norm0)
        assert resid0 == pytest.approx(1.46e3, rel=0.01)
        # converged under the same threshold the reference used
        assert float(res.resid_norm) <= 1e-6 * resid0
        # same matvec decade (reference 1759; allow ±5%)
        assert abs(int(res.n_matvec) - 1759) <= 90
        err = float(jnp.linalg.norm(res.x - e) / jnp.sqrt(n))
        assert err < 5e-5  # reference 1.30e-05

    def test_jacobi_preconditioned_faster(self):
        op = sparse_operator("1138bus", symmetric=True)
        M = jacobi_preconditioner("1138bus")
        n = 1138
        e = jnp.ones(n, dtype=jnp.float64)
        b = op * e
        plain = cg(op, b, rtol=1e-6, matvec_max=2 * n)
        pre = cg(op, b, M=M, rtol=1e-6, matvec_max=2 * n)
        assert bool(pre.converged)
        assert int(pre.n_matvec) < int(plain.n_matvec)
