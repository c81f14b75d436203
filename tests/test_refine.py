"""Verified iterative refinement (`solvers/refine.py`) — the f32 parity
strategy generalized beyond CG (SURVEY §7 "compensated algorithms to
match residual histories in f32").  All oracles are f64 dense."""

import numpy as np
import jax.numpy as jnp
import pytest

from pykrylov_tpu.io.datasets import load_bundled
from pykrylov_tpu.ops.base import DiagonalOperator, linop_from_ndarray
from pykrylov_tpu.sparse import sparse_operator
from pykrylov_tpu.solvers import (bicgstab, cg, cgs, minres, refined_solve,
                                  symmlq, tfqmr)


def _bus_f32():
    vals, rows, cols, shape = load_bundled("1138bus")
    a64 = np.zeros(shape)
    np.add.at(a64, (rows, cols), vals.astype(np.float32).astype(np.float64))
    op = sparse_operator((vals.astype(np.float32), rows, cols, shape),
                         symmetric=True, fmt="ell")
    d = np.zeros(shape[0], np.float32)
    dm = rows == cols
    d[rows[dm]] = vals[dm].astype(np.float32)
    M = DiagonalOperator(jnp.asarray(1.0 / np.maximum(np.abs(d), 1.0),
                                     jnp.float32))
    b64 = a64 @ np.ones(shape[0])
    return op, M, a64, b64


def _true_relres(a64, b64, res):
    x = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    return np.linalg.norm(a64 @ x - b64) / np.linalg.norm(b64)


def test_refined_minres_f32_verified_1e6_on_hard_system():
    # BASELINE north-star config #2 (MINRES / 1138bus / Jacobi) in f32:
    # plain MINRES at rtol 1e-8 reports an estimate 21x below its true
    # residual (2.5e-3 relative).  Round 2's refined path floored at
    # ~1e-4 here because plain-f32 legs drift destructively after ~150
    # iterations; the ff-MINRES legs (minres's replace_every, enabled
    # automatically by leg_replace_every="auto") carry the whole
    # Lanczos/Givens recurrence as double-f32 pairs, so legs long
    # enough to regain Krylov momentum stay drift-free and the wrapper
    # reaches the reference's f64-class rtol 1e-6 VERIFIED.
    op, M, a64, b64 = _bus_f32()
    b = jnp.asarray(b64, jnp.float32)
    res = refined_solve(minres, op, b, rtol=1e-6, M=M, leg_rtol=1e-2,
                        max_legs=12, leg_maxiter=1200)
    rel = _true_relres(a64, b64, res)
    assert bool(res.converged), (int(res.istop), rel)
    assert rel < 2.5e-6, rel
    # the reported residual IS the verified one (within the compensated
    # evaluation's tiny floor)
    assert abs(float(res.resid_norm)
               - rel * np.linalg.norm(b64)) <= 1e-2 * float(res.resid_norm)
    hist = np.asarray(res.resid_history)
    assert hist[0] == float(res.resid_norm0)


def _indefinite_f32(n=200, nneg=10):
    # shifted 1-D Poisson: symmetric INDEFINITE with moderate kappa —
    # the regime MINRES-leg refinement is designed for
    main = np.full(n, 2.0)
    off = np.full(n - 1, -1.0)
    a = np.diag(main) + np.diag(off, 1) + np.diag(off, -1)
    eig = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    shift = 0.5 * (eig[nneg - 1] + eig[nneg])
    a -= shift * np.eye(n)
    a32 = a.astype(np.float32)
    return a32, a32.astype(np.float64)


def test_refined_minres_f32_verified_1e6_indefinite():
    a32, a64 = _indefinite_f32()
    n = a32.shape[0]
    rng = np.random.default_rng(5)
    b64 = a64 @ rng.standard_normal(n)
    b = jnp.asarray(b64, jnp.float32)
    res = refined_solve(minres, jnp.asarray(a32), b, rtol=1e-6,
                        leg_rtol=1e-2, max_legs=30, leg_maxiter=400)
    assert bool(res.converged), (int(res.istop), float(res.resid_norm))
    assert _true_relres(a64, b64, res) < 2.5e-6
    assert res.info["n_legs"] >= 2


def test_refined_minres_f32_verified_1e6_kappa1e7_indefinite():
    # VERDICT r2 #3's done-bar: verified <= 1e-6 relative TRUE residual
    # on a kappa~1e7 SYMMETRIC INDEFINITE system in f32.  The system is
    # saddle-point-like (1138bus plus a small negative-definite block) —
    # a realistic indefinite spectrum an exact-arithmetic MINRES solves
    # in ~500 iterations.  (A spectrum filling BOTH intervals +-[1,1e7]
    # needs ~50k iterations even in f64 — that is Krylov complexity,
    # not a precision limitation; measured with this suite's f64
    # oracle.)
    vals, rows, cols, shape = load_bundled("1138bus")
    n0 = shape[0]
    k = 20
    n = n0 + k
    dneg = -np.logspace(3, 4, k)
    v2 = np.concatenate([vals, dneg]).astype(np.float32)
    r2 = np.concatenate([rows, n0 + np.arange(k)])
    c2 = np.concatenate([cols, n0 + np.arange(k)])
    op = sparse_operator((v2, r2, c2, (n, n)), symmetric=True)
    a64 = np.zeros((n, n))
    np.add.at(a64, (r2, c2), v2.astype(np.float64))
    d = np.abs(np.diag(a64))
    M = DiagonalOperator(jnp.asarray(1.0 / d, jnp.float32))
    b64 = a64 @ np.ones(n)
    b = jnp.asarray(b64, jnp.float32)
    res = refined_solve(minres, op, b, rtol=1e-6, M=M, leg_rtol=1e-2,
                        max_legs=12, leg_maxiter=1200)
    rel = _true_relres(a64, b64, res)
    assert bool(res.converged), (int(res.istop), rel)
    assert rel < 2.5e-6, rel


def test_minres_replace_every_certificate_is_honest():
    # the in-loop verified path alone (no refinement legs) may stop
    # short of the target on kappa~1e7, but its reported resid_norm
    # must MATCH the true residual of (x + x_lo) — never an unverified
    # recurrence claim (plain f32 MINRES misreports by 21x here)
    op, M, a64, b64 = _bus_f32()
    b = jnp.asarray(b64, jnp.float32)
    res = minres(op, b, M=M, rtol=1e-6, itnlim=1500, replace_every=50)
    rel = _true_relres(a64, b64, res)
    reported = float(res.resid_norm) / np.linalg.norm(b64)
    assert abs(reported - rel) <= 0.05 * max(rel, 1e-12), (reported, rel)
    assert int(res.info["n_replacements"]) >= 1


def test_refined_symmlq_f32():
    a32, a64 = _indefinite_f32()
    n = a32.shape[0]
    rng = np.random.default_rng(6)
    b64 = a64 @ rng.standard_normal(n)
    b = jnp.asarray(b64, jnp.float32)
    res = refined_solve(symmlq, jnp.asarray(a32), b, rtol=1e-6,
                        leg_rtol=1e-2, max_legs=30, leg_maxiter=400)
    assert bool(res.converged), int(res.istop)
    assert _true_relres(a64, b64, res) < 2.5e-6


def test_refined_cg_matches_ff_cg_contract():
    op, M, a64, b64 = _bus_f32()
    b = jnp.asarray(b64, jnp.float32)
    res = refined_solve(cg, op, b, rtol=1e-6, leg_rtol=1e-2, max_legs=40)
    assert bool(res.converged), int(res.istop)
    assert _true_relres(a64, b64, res) < 2.5e-6
    # inner telemetry shape agrees with leg count
    assert len(np.asarray(res.info["inner_istop"])) == res.info["n_legs"]
    # matvec accounting: inner matvecs + one compensated verify per leg
    inner = int(np.asarray(res.info["inner_n_iter"]).sum())
    assert int(res.n_matvec) == inner + res.info["n_legs"]


def test_refined_transpose_free_f32():
    # nonsymmetric: jpwh_991 with the reference bmark protocol guess
    vals, rows, cols, shape = load_bundled("jpwh_991")
    a64 = np.zeros(shape)
    np.add.at(a64, (rows, cols), vals.astype(np.float32).astype(np.float64))
    op = sparse_operator((vals.astype(np.float32), rows, cols, shape),
                         fmt="ell")
    e = np.ones(shape[0])
    b64 = a64 @ e
    b = jnp.asarray(b64, jnp.float32)
    x0 = jnp.asarray(1.0 + np.arange(shape[0]), jnp.float32)
    for solver in (cgs, tfqmr, bicgstab):
        res = refined_solve(solver, op, b, rtol=1e-6, x0=x0,
                            leg_rtol=1e-2, max_legs=30)
        assert bool(res.converged), (solver.__name__, int(res.istop))
        x = (np.asarray(res.x, np.float64)
             + np.asarray(res.info["x_lo"], np.float64))
        rn = np.linalg.norm(a64 @ x - b64)
        assert rn <= 1.001 * 1e-6 * float(res.resid_norm0), \
            (solver.__name__, rn)


def test_refined_stall_reports_floor():
    # an f32 target below the compensated floor must stop with istop 3
    # (stagnation), finite, not spin to the leg budget
    op, M, a64, b64 = _bus_f32()
    b = jnp.asarray(b64, jnp.float32)
    res = refined_solve(minres, op, b, rtol=1e-14, M=M, leg_rtol=1e-2,
                        max_legs=60)
    assert not bool(res.converged)
    assert int(res.istop) in (2, 3)
    assert np.isfinite(float(res.resid_norm))
    assert res.info["n_legs"] < 60


def test_refined_zero_rhs():
    op, M, a64, b64 = _bus_f32()
    res = refined_solve(minres, op, jnp.zeros(op.shape[0], jnp.float32),
                        rtol=1e-6)
    assert bool(res.converged)
    assert res.info["n_legs"] == 0
    np.testing.assert_array_equal(np.asarray(res.x), 0.0)


def test_refined_small_norm_rhs_not_floored_by_leg_atol():
    # legs must get atol=0: the solvers' absolute default (1e-8) would
    # stop small-norm legs immediately and misreport a reachable
    # relative target as a precision floor (code-review finding)
    rng = np.random.default_rng(11)
    n = 100
    a = (np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1)
         + np.diag(np.full(n - 1, -1.0), -1)).astype(np.float32)
    x_true = rng.standard_normal(n).astype(np.float32) * 1e-3
    b = (a.astype(np.float64) @ x_true).astype(np.float32)
    res = refined_solve(cg, jnp.asarray(a), jnp.asarray(b), rtol=1e-6)
    assert bool(res.converged), (int(res.istop), float(res.resid_norm))
    assert float(res.resid_norm) <= 1e-6 * float(res.resid_norm0)


def test_solve_verified_indefinite_falls_back_to_minres_legs():
    # declared-symmetric indefinite operator: the verified auto path
    # must keep the unverified path's safety net — CG legs abort on
    # curvature and the dispatcher reroutes to refined MINRES legs
    # (code-review finding)
    from pykrylov_tpu import solve
    from pykrylov_tpu.ops import MatrixOperator
    a32, a64 = _indefinite_f32()
    n = a32.shape[0]
    rng = np.random.default_rng(13)
    b64 = a64 @ rng.standard_normal(n)
    op = MatrixOperator(jnp.asarray(a32), symmetric=True)
    res = solve(op, jnp.asarray(b64, jnp.float32),
                verified=True, rtol=1e-6, leg_maxiter=400)
    assert bool(res.converged), (int(res.istop), float(res.resid_norm))
    assert _true_relres(a64, b64, res) < 2.5e-6


# ---------------------------------------------------------------------------
# refined_lls: verified least-squares refinement
# ---------------------------------------------------------------------------

def _lls_f32(cond_exp=3, m=600, n=200, seed=0):
    """f32-stored dense LS problem with controlled conditioning; the
    f64 view of the SAME f32 values is the oracle problem."""
    rng = np.random.default_rng(seed)
    U, _ = np.linalg.qr(rng.standard_normal((m, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, cond_exp, n)
    a = ((U * s) @ V.T).astype(np.float32)
    a64 = a.astype(np.float64)
    b = (a64 @ rng.standard_normal(n)
         + 0.01 * rng.standard_normal(m)).astype(np.float32)
    b64 = b.astype(np.float64)
    from pykrylov_tpu.ops import linop_from_ndarray
    return linop_from_ndarray(jnp.asarray(a)), a64, b64


def _true_test2(a64, b64, res):
    x = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    rt = b64 - a64 @ x
    anorm = np.linalg.norm(a64, 2)
    return np.linalg.norm(a64.T @ rt) / (anorm * np.linalg.norm(rt))


def test_refined_lls_beats_single_f32_run():
    # cond 1e3: a single f32 LSQR run floors at true test2 ~ 7e-2 while
    # its internal estimates report convergence; refinement must certify
    # ~100x better on the SAME f32-stored matrix
    from pykrylov_tpu.solvers import lsqr
    from pykrylov_tpu.solvers.refine import refined_lls
    A, a64, b64 = _lls_f32(cond_exp=3)
    b = jnp.asarray(b64, jnp.float32)
    single = lsqr(A, b, atol=1e-10, btol=1e-10, etol=0.0, itnlim=4000)
    xs = np.asarray(single.x, np.float64)
    rt_s = b64 - a64 @ xs
    t2_single = (np.linalg.norm(a64.T @ rt_s)
                 / (np.linalg.norm(a64, 2) * np.linalg.norm(rt_s)))
    res = refined_lls(lsqr, A, b, atol=1e-4, max_legs=15, leg_tol=1e-3)
    t2_ref = _true_test2(a64, b64, res)
    assert t2_ref < 2e-3, t2_ref
    assert t2_ref < 0.1 * t2_single, (t2_ref, t2_single)
    # the reported certificate tracks the true one
    anorm = np.linalg.norm(a64, 2)
    claimed = float(res.info["true_normar"])
    x = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    true_na = np.linalg.norm(a64.T @ (b64 - a64 @ x))
    assert abs(claimed - true_na) <= 0.5 * true_na + 1e-3 * anorm


def test_refined_lls_lsmr_legs_well_conditioned():
    from pykrylov_tpu.solvers import lsmr
    from pykrylov_tpu.solvers.refine import refined_lls
    A, a64, b64 = _lls_f32(cond_exp=1, seed=3)
    b = jnp.asarray(b64, jnp.float32)
    res = refined_lls(lsmr, A, b, atol=1e-5, max_legs=15)
    t2 = _true_test2(a64, b64, res)
    assert t2 < 1e-4, t2
    # x must be near the oracle LS solution on a well-conditioned system
    x_ref = np.linalg.lstsq(a64, b64, rcond=None)[0]
    x = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    assert np.linalg.norm(x - x_ref) < 1e-3 * np.linalg.norm(x_ref)


def test_refined_lls_consistent_system_btol_stop():
    # consistent rhs: must stop on the residual test (||rt|| <= btol||b||)
    from pykrylov_tpu.solvers import lsqr
    from pykrylov_tpu.solvers.refine import refined_lls
    rng = np.random.default_rng(7)
    m, n = 300, 80
    a = rng.standard_normal((m, n)).astype(np.float32)
    a64 = a.astype(np.float64)
    x_true = rng.standard_normal(n)
    b64 = a64 @ x_true
    res = refined_lls(lsqr, jnp.asarray(a), jnp.asarray(b64, jnp.float32),
                      btol=1e-5, max_legs=10)
    assert bool(res.converged), int(res.istop)
    assert float(res.resid_norm) <= 1e-5 * np.linalg.norm(b64) * 1.01


def test_refined_lls_rejects_damp_and_preconditioners():
    import pytest
    from pykrylov_tpu.solvers import lsqr
    from pykrylov_tpu.solvers.refine import refined_lls
    A, a64, b64 = _lls_f32(cond_exp=1, m=120, n=40, seed=5)
    b = jnp.asarray(b64, jnp.float32)
    for kw in ({"damp": 0.5}, {"M": DiagonalOperator(jnp.ones(120))},
               {"N": DiagonalOperator(jnp.ones(40))}):
        with pytest.raises(ValueError):
            refined_lls(lsqr, A, b, **kw)


def test_solve_verified_rectangular_routes_to_refined_lls():
    from pykrylov_tpu import solve
    A, a64, b64 = _lls_f32(cond_exp=2, m=300, n=100, seed=9)
    res = solve(A, jnp.asarray(b64, jnp.float32), verified=True,
                atol=1e-4, max_legs=10)
    assert "true_normar" in res.info
    t2 = _true_test2(a64, b64, res)
    assert t2 < 5e-3, t2


def test_refined_lls_array_preconditioner_rejection_message():
    # M/N passed as raw arrays must hit the intended ValueError, not an
    # ambiguous-truth-value error from bool(ndarray)
    import pytest
    from pykrylov_tpu.solvers import lsqr
    from pykrylov_tpu.solvers.refine import refined_lls
    A, a64, b64 = _lls_f32(cond_exp=1, m=120, n=40, seed=5)
    b = jnp.asarray(b64, jnp.float32)
    with pytest.raises(ValueError, match="refined_lls does not support"):
        refined_lls(lsqr, A, b, M=np.ones(120, np.float32))
    # the harmless defaults pass through
    res = refined_lls(lsqr, A, b, damp=0.0, M=None, N=None, max_legs=5)
    assert np.isfinite(float(res.resid_norm))


def test_refined_lls_atol_stop_without_leg_anorm():
    # a contract-conforming leg solver that exposes NO Anorm estimate:
    # the verified lower bound ||A'rt||/||rt|| must keep the atol stop
    # armed (previously anorm stayed 0 and the stop could never fire)
    from pykrylov_tpu.solvers import lsqr
    from pykrylov_tpu.solvers.refine import refined_lls

    def bare_lsqr(A, rhs, atol=0.0, btol=0.0, **kw):
        res = lsqr(A, rhs, atol=atol, btol=btol, **kw)
        import dataclasses
        return dataclasses.replace(res, info={})

    A, a64, b64 = _lls_f32(cond_exp=1, seed=11)
    res = refined_lls(bare_lsqr, A, jnp.asarray(b64, jnp.float32),
                      atol=1e-4, max_legs=10)
    assert bool(res.converged), (int(res.istop), float(res.info["true_normar"]))
    assert res.info["n_legs"] < 10


def test_refined_lls_inf_leg_anorm_cannot_fake_convergence():
    # a blown-up leg reporting Anorm=inf must not loosen the certificate
    # threshold into a vacuous pass
    from pykrylov_tpu.solvers.refine import refined_lls
    from pykrylov_tpu.solvers.result import SolveResult

    def exploding(A, rhs, atol=0.0, btol=0.0, **kw):
        n = A.shape[1]
        return SolveResult(
            x=jnp.full(n, jnp.nan, jnp.float32),
            converged=jnp.asarray(False), istop=jnp.asarray(7, jnp.int32),
            n_iter=jnp.asarray(1, jnp.int32), n_matvec=jnp.asarray(2, jnp.int32),
            resid_norm=jnp.asarray(jnp.inf), resid_norm0=jnp.asarray(1.0),
            resid_history=jnp.ones(1), info={"Anorm": jnp.asarray(jnp.inf)})

    A, a64, b64 = _lls_f32(cond_exp=2, m=120, n=40, seed=6)
    res = refined_lls(exploding, A, jnp.asarray(b64, jnp.float32),
                      atol=1e-4, max_legs=5)
    assert not bool(res.converged)
    assert int(res.istop) == 2
    assert np.isfinite(float(res.info["anorm"]))


def test_refined_lls_initial_matvec_count_is_exact():
    # x0=None performs exactly one transpose product up front (A'b);
    # each leg then adds its own count + the verify cost (1 ff or 2
    # plain forward + 1 transpose)
    from pykrylov_tpu.solvers import lsqr
    from pykrylov_tpu.solvers.refine import refined_lls
    A, a64, b64 = _lls_f32(cond_exp=1, m=120, n=40, seed=8)
    res = refined_lls(lsqr, A, jnp.asarray(b64, jnp.float32), max_legs=4)
    inner = int(np.sum(res.info["inner_n_iter"])) * 2
    legs = int(res.info["n_legs"])
    # dense operator resolves a compensated matvec -> verify cost 2
    assert int(res.n_matvec) == 1 + inner + 2 * legs


# ---------------------------------------------------------------------------
# Block refinement driver (round 4)
# ---------------------------------------------------------------------------

def test_refined_solve_batched_general_f32_per_column():
    # GENERAL (nonsymmetric) verified blocks: each column certified at
    # a true relative residual <= rtol via fused bicgstab_batched legs
    from pykrylov_tpu.solvers import bicgstab_batched, refined_solve_batched
    rng = np.random.default_rng(70)
    n = 300
    # Ginibre radius 0.1*sqrt(300) ~ 1.7 keeps the spectrum well
    # inside the +4 shift (0.3 would cover the origin)
    a64 = rng.standard_normal((n, n)) * 0.1 + 4.0 * np.eye(n)
    a32 = a64.astype(np.float32)
    a64 = a32.astype(np.float64)
    op = linop_from_ndarray(jnp.asarray(a32))
    B64 = np.stack([a64 @ rng.standard_normal(n) for _ in range(4)],
                   axis=1)
    B = jnp.asarray(B64, jnp.float32)
    B64 = np.asarray(B, np.float64)
    res = refined_solve_batched(bicgstab_batched, op, B, rtol=1e-6,
                                atol=0.0, max_legs=20)
    assert bool(jnp.all(res.converged)), (np.asarray(res.istop),
                                          np.asarray(res.resid_norm))
    X = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    for j in range(4):
        rel = (np.linalg.norm(a64 @ X[:, j] - B64[:, j])
               / np.linalg.norm(B64[:, j]))
        assert rel < 2.5e-6, (j, rel)
        # reported residual IS the verified one
        reported = float(res.resid_norm[j]) / np.linalg.norm(B64[:, j])
        assert abs(reported - rel) <= 0.05 * max(rel, 1e-12)
    assert res.info["n_legs"] >= 2
    # history rows are per-leg verified norms
    h = np.asarray(res.resid_history)
    assert h.shape == (res.info["n_legs"] + 1, 4)
    assert np.all(h[0] == np.asarray(res.resid_norm0))


def test_refined_solve_batched_front_door_and_mixed_columns():
    from pykrylov_tpu import solve as front
    rng = np.random.default_rng(71)
    n = 200
    a64 = rng.standard_normal((n, n)) * 0.1 + 3.0 * np.eye(n)
    a32 = a64.astype(np.float32)
    a64 = a32.astype(np.float64)
    op = linop_from_ndarray(jnp.asarray(a32))
    # one trivial column (already converged at x=0 threshold) + two live
    B64 = np.stack([np.zeros(n), a64 @ np.ones(n),
                    a64 @ rng.standard_normal(n)], axis=1)
    B = jnp.asarray(B64, jnp.float32)
    B64 = np.asarray(B, np.float64)
    res = front(op, B, verified=True, rtol=1e-6, atol=0.0, max_legs=20)
    assert bool(jnp.all(res.converged)), np.asarray(res.istop)
    X = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    np.testing.assert_array_equal(X[:, 0], 0.0)
    for j in (1, 2):
        rel = (np.linalg.norm(a64 @ X[:, j] - B64[:, j])
               / np.linalg.norm(B64[:, j]))
        assert rel < 2.5e-6, (j, rel)


def test_refined_solve_batched_slow_but_converging_is_converged():
    # a column crossing the threshold on a slow leg is CONVERGED, not a
    # floor; and x0 is the outer accumulator, not every leg's guess
    # (round-4 review findings)
    from pykrylov_tpu.solvers import bicgstab_batched, refined_solve_batched
    rng = np.random.default_rng(80)
    n = 150
    a64 = rng.standard_normal((n, n)) * 0.1 + 4.0 * np.eye(n)
    a32 = a64.astype(np.float32)
    a64 = a32.astype(np.float64)
    op = linop_from_ndarray(jnp.asarray(a32))
    B64 = np.stack([a64 @ rng.standard_normal(n) for _ in range(2)],
                   axis=1)
    B = jnp.asarray(B64, jnp.float32)
    B64 = np.asarray(B, np.float64)
    # stall_factor ~1: every leg counts as "slow" yet convergence must
    # still be promoted to istop 0
    res = refined_solve_batched(bicgstab_batched, op, B, rtol=1e-6,
                                atol=0.0, max_legs=20,
                                stall_factor=1.0 - 1e-12)
    assert bool(jnp.all(res.converged)), np.asarray(res.istop)
    # x0 is the verified OUTER accumulator: the threshold is relative
    # to ||B - A x0|| (the single driver's documented contract), so a
    # warm start refines BELOW it rather than feeding legs a big guess
    X0 = np.linalg.solve(a64, B64) + 1e-9
    res2 = refined_solve_batched(bicgstab_batched, op, B, rtol=1e-6,
                                 atol=0.0, max_legs=20,
                                 x0=jnp.asarray(X0, jnp.float32))
    assert bool(jnp.all(res2.converged))
    r0 = np.asarray(res2.resid_norm0)
    assert np.all(r0 < 1e-5)                   # verified at the warm x0
    assert np.all(np.asarray(res2.resid_norm) <= 1e-6 * r0 * (1 + 1e-6))
    assert res2.info["n_legs"] <= 6


def test_verified_blocks_symmetric_explicit_tf_method():
    # explicit method='bicgstab' verified blocks on a SYMMETRIC operator
    # must route through block refinement, like the 1-D path
    from pykrylov_tpu import solve as front
    a = np.diag(np.linspace(1.0, 10.0, 80))
    op = linop_from_ndarray(jnp.asarray(a.astype(np.float32)),
                            symmetric=True)
    B = jnp.asarray((a @ np.ones((80, 2))).astype(np.float32))
    res = front(op, B, verified=True, method="bicgstab", rtol=1e-6)
    assert bool(jnp.all(res.converged))
    assert "n_legs" in res.info


def test_refinement_drivers_fail_loud_under_jit():
    import jax
    from pykrylov_tpu.solvers import (bicgstab_batched, cg, refined_solve,
                                      refined_solve_batched)
    a = np.diag(np.linspace(1.0, 5.0, 20))
    op = linop_from_ndarray(jnp.asarray(a), symmetric=True)

    @jax.jit
    def run1(b):
        return refined_solve(cg, op, b).x

    with pytest.raises(ValueError, match="host-side driver"):
        run1(jnp.ones(20))

    @jax.jit
    def run2(B):
        return refined_solve_batched(bicgstab_batched, op, B).x

    with pytest.raises(ValueError, match="host-side driver"):
        run2(jnp.ones((20, 2)))
