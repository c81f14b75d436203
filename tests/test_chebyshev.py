"""Chebyshev polynomial preconditioning (`ops/chebyshev.py`): Lanczos
spectral bounds, SPD-ness and polynomial-identity of the operator, and
end-to-end iteration-count reduction in (batched) CG/MINRES."""

import numpy as np
import jax.numpy as jnp
import pytest

from pykrylov_tpu.ops import (ChebyshevOperator, chebyshev_preconditioner,
                              lanczos_bounds, linop_from_ndarray)
from pykrylov_tpu.gallery import poisson1d_operator
from pykrylov_tpu.solvers import cg, cg_batched, minres
from pykrylov_tpu.utils import check_symmetric, check_positive_definite


def _spd(n=120, cond=1e4, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.logspace(0, np.log10(cond), n)
    return (Q * lam) @ Q.T, lam


def test_lanczos_bounds_poisson():
    # 1-D Poisson eigenvalues are 2 - 2 cos(k pi / (n+1)); both ends
    # cluster, so Ritz estimates are inherently loose there — the
    # contract is: lmax covers the top (the end that matters for p > 0
    # on the spectrum), lmin stays positive and lands within the low
    # cluster (an overestimated lmin only damps the lowest modes less)
    n = 200
    op = poisson1d_operator(n, dtype=jnp.float64)
    lmin, lmax = lanczos_bounds(op, k=30, safety=0.05)
    lam = 2 - 2 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    assert float(lmax) >= lam.max()             # must cover the top
    assert float(lmax) <= lam.max() * 1.2
    assert 0 < float(lmin) <= 20 * lam.min()    # inside the low cluster
    # extremes separated relative to the WHOLE spread converge in a
    # couple of steps: a two-cluster spectrum is pinned exactly
    d = np.repeat([1.0, 100.0], 25)
    dop = linop_from_ndarray(jnp.asarray(np.diag(d)), symmetric=True)
    lmin2, lmax2 = lanczos_bounds(dop, k=10, safety=0.05)
    assert float(lmin2) <= d.min() <= d.max() <= float(lmax2)
    assert float(lmin2) >= d.min() * 0.9
    assert float(lmax2) <= d.max() * 1.1


def test_chebyshev_operator_is_spd_polynomial():
    a, lam = _spd(n=60, cond=100.0, seed=1)
    op = linop_from_ndarray(jnp.asarray(a), symmetric=True)
    M = ChebyshevOperator(op, lam.min(), lam.max(), degree=6)
    assert M.symmetric and M.shape == (60, 60)
    assert check_symmetric(M)
    assert check_positive_definite(M)
    # p(A) is a fixed polynomial of A: same eigenvectors, eigenvalues
    # p(lam); p(lam)*lam must cluster near 1 with the Chebyshev radius
    # 2*rho^d / (1 + rho^(2d))
    dense = np.column_stack([np.asarray(M * jnp.eye(60, dtype=jnp.float64)[:, j])
                             for j in range(60)])
    np.testing.assert_allclose(dense, dense.T, atol=1e-10)
    pa_eigs = np.linalg.eigvalsh(dense @ a)
    kappa = lam.max() / lam.min()
    rho = (np.sqrt(kappa) - 1) / (np.sqrt(kappa) + 1)
    radius = 2 * rho**6 / (1 + rho**12)
    assert np.all(np.abs(pa_eigs - 1) <= radius * 1.05)


def test_degree_one_and_validation():
    a, lam = _spd(n=20, cond=10.0, seed=2)
    op = linop_from_ndarray(jnp.asarray(a), symmetric=True)
    M = ChebyshevOperator(op, lam.min(), lam.max(), degree=1)
    x = jnp.arange(20.0)
    # degree 1: pure Richardson scaling x / theta
    theta = (lam.min() + lam.max()) / 2
    np.testing.assert_allclose(np.asarray(M * x), np.asarray(x) / theta,
                               rtol=1e-12)
    with pytest.raises(ValueError):
        ChebyshevOperator(op, 1.0, 2.0, degree=0)
    nonsym = linop_from_ndarray(jnp.asarray(np.triu(a)))
    with pytest.raises(ValueError):
        ChebyshevOperator(nonsym, 1.0, 2.0)


def test_indefinite_interval_raises():
    # concrete lmin <= 0 (indefinite/semidefinite operator): p(A) has
    # roots in the interval and is not SPD — fail loud at construction
    a, _ = _spd(n=30, cond=10.0, seed=7)
    ind = a - 5.0 * np.eye(30)          # shifts the spectrum below 0
    op = linop_from_ndarray(jnp.asarray(ind), symmetric=True)
    with pytest.raises(ValueError, match="not positive"):
        chebyshev_preconditioner(op, k_lanczos=20)
    spd_op = linop_from_ndarray(jnp.asarray(a), symmetric=True)
    with pytest.raises(ValueError, match="not positive"):
        chebyshev_preconditioner(spd_op, bounds=(2.0, 1.0))
    with pytest.raises(ValueError, match="not positive"):
        chebyshev_preconditioner(spd_op, bounds=(-1.0, 2.0))


def test_lanczos_breakdown_masks_padding():
    # an SPD operator whose Krylov space exhausts in r << k steps:
    # EXACT breakdown (beta == 0) must not inject spurious ~0 Ritz
    # values — lmin must stay inside the true (positive) spectrum.
    # v0 = e0 is an exact eigenvector of a diagonal matrix, so the
    # first step computes w = 3*e0 - 3*e0 = 0 bit-exactly and the scan
    # zero-fills steps 2..k.
    n = 32
    d = np.full(n, 5.0)
    d[0], d[1] = 3.0, 10.0
    op = linop_from_ndarray(jnp.asarray(np.diag(d)), symmetric=True)
    v0 = jnp.zeros(n, jnp.float64).at[0].set(1.0)
    lmin, lmax = lanczos_bounds(op, k=8, v0=v0, safety=0.0)
    np.testing.assert_allclose(float(lmin), 3.0, rtol=1e-12)
    np.testing.assert_allclose(float(lmax), 3.0, rtol=1e-12)


def test_cg_iteration_count_drops():
    a, lam = _spd(n=150, cond=1e4, seed=3)
    op = linop_from_ndarray(jnp.asarray(a), symmetric=True)
    b = jnp.asarray(a @ np.ones(150))
    plain = cg(op, b, rtol=1e-8)
    M = chebyshev_preconditioner(op, degree=8, k_lanczos=20)
    pre = cg(op, b, M=M, rtol=1e-8)
    assert bool(pre.converged)
    # measured on this spectrum: 91 vs 300 outer iterations with either
    # estimated or true bounds (Lanczos lmin looseness is immaterial:
    # CG mops up the few under-damped low modes)
    assert int(pre.n_iter) * 3 <= int(plain.n_iter), \
        (int(pre.n_iter), int(plain.n_iter))
    np.testing.assert_allclose(np.asarray(pre.x), np.ones(150),
                               rtol=1e-4, atol=1e-6)


def test_minres_and_batched_cg_with_chebyshev():
    a, lam = _spd(n=100, cond=1e3, seed=4)
    op = linop_from_ndarray(jnp.asarray(a), symmetric=True)
    M = chebyshev_preconditioner(op, bounds=(lam.min(), lam.max()),
                                 degree=6)
    b = jnp.asarray(a @ np.ones(100))
    res = minres(op, b, M=M, rtol=1e-10, etol=0.0)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.ones(100),
                               rtol=1e-5, atol=1e-7)
    # block path: the matmat rule runs the recurrence on whole blocks
    rng = np.random.default_rng(5)
    Z = rng.standard_normal((100, 3))
    B = jnp.asarray(a @ Z)
    rb = cg_batched(op, B, M=M, rtol=1e-8)
    assert bool(rb.converged.all())
    np.testing.assert_allclose(np.asarray(rb.x), Z, rtol=1e-4, atol=1e-5)
    # block application agrees with column-by-column application
    X = jnp.asarray(rng.standard_normal((100, 2)))
    blk = M * X
    cols = jnp.stack([M * X[:, 0], M * X[:, 1]], axis=1)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(cols),
                               rtol=1e-10, atol=1e-12)


def test_preconditioner_protocol_solve_alias():
    a, lam = _spd(n=30, cond=10.0, seed=6)
    op = linop_from_ndarray(jnp.asarray(a), symmetric=True)
    M = ChebyshevOperator(op, lam.min(), lam.max(), degree=4)
    x = jnp.arange(30.0)
    np.testing.assert_allclose(np.asarray(M.solve(x)), np.asarray(M * x),
                               rtol=1e-12)


def test_chebyshev_composes_with_sharded_operator():
    # preconditioning shards for free: p(A) of a halo-exchange sharded
    # operator is itself a sharded operator (matvec-only composition) —
    # bounds estimation, the polynomial recurrence and CG all run as
    # sharded device programs
    from pykrylov_tpu.parallel import make_mesh
    from pykrylov_tpu.parallel.sharded import sharded_poisson3d
    from pykrylov_tpu.ops import chebyshev_preconditioner, lanczos_bounds

    mesh = make_mesh(8)
    op, b, e, pad = sharded_poisson3d(8, mesh, halo=True)
    lmin, lmax = lanczos_bounds(op, k=12)
    assert 0 < float(lmin) < float(lmax) <= 12.7  # 3-D Poisson < 12 + pad
    M = chebyshev_preconditioner(op, degree=6, bounds=(lmin, lmax))
    plain = cg(op, b, rtol=1e-10)
    pre = cg(op, b, M=M, rtol=1e-10)
    assert bool(pre.converged)
    assert int(pre.n_iter) * 2 <= int(plain.n_iter)
    assert float(jnp.linalg.norm(pre.x - e)) < 1e-5
    # solution sharding survives the preconditioned while_loop
    assert len(pre.x.sharding.device_set) == 8
