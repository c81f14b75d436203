"""Verified iterative refinement around any square-system solver.

The f32-on-TPU parity strategy (SURVEY §7 "compensated algorithms to
match residual histories") generalized beyond CG: ``refined_solve``
wraps ANY of the square-system solvers (cg, minres, symmlq, bicgstab,
cgs, tfqmr) in an outer refinement loop —

  1. run the inner solver on the residual system ``A d = r`` to a
     modest per-leg tolerance (``leg_rtol``, comfortably inside f32's
     reliable range),
  2. accumulate ``x += d`` on a double-f32 (hi, lo) carry
     (:mod:`pykrylov_tpu.utils.ff`),
  3. recompute the TRUE residual ``b - A x`` with the compensated
     matvec when the operator storage supports one
     (:func:`~pykrylov_tpu.solvers.ffmv.resolve_ff_matvec`),
  4. stop only on the verified residual.

This is the same refinement structure ff-CG runs fused inside its
``lax.while_loop`` (``cg.py`` with ``replace_every``), hoisted to a
host-level loop so the inner solver is pluggable: MINRES/SYMMLQ legs
give verified f32 solves of symmetric indefinite systems, BiCGSTAB/
CGS/TFQMR legs the nonsymmetric ones.  The reference needs no such
machinery because it runs f64 NumPy throughout (its unverified
recurrences drift invisibly at its tolerances); in f32 an unverified
stopping test is meaningless for ill-conditioned systems — MINRES on
1138bus at rtol 1e-8 reports a residual estimate 21x below its true
residual.

Each leg is one fused device program (the inner solver's while_loop);
only one scalar rides back to the host per leg for the outer control
flow.  Through a remote transport that is ``n_legs`` round-trips —
for a fully fused single-program verified CG use
``cg(..., replace_every=...)`` instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .common import as_operator, apply_op, promote_rhs, require_square
from .ffmv import resolve_ff_matvec
from .result import SolveResult

__all__ = ["refined_solve", "ISTOP_MSG"]

ISTOP_MSG = {
    0: "verified residual small enough (relative/absolute tolerance "
       "reached)",
    1: "leg budget exhausted before verified convergence",
    2: "inner solver failed (breakdown or indefiniteness); see "
       "info['inner_istop']",
    3: "stagnation: verified residual stopped improving (precision "
       "floor reached)",
}


@functools.lru_cache(maxsize=None)
def _verifier(ff_mv):
    """Jitted verified-residual evaluation, memoized per compensated
    matvec so equal-storage operators share one compiled program.
    Returns (r, ||r||) with r the compensated ``b - A x`` rounded to
    the working dtype."""
    from ..utils.ff import two_sum

    if ff_mv is None:
        @jax.jit
        def verify(A, b, xh, xl):
            sh = apply_op(A, xh)
            sl = apply_op(A, xl)
            d, de = two_sum(b, -sh)
            rt = d + (de - sl)
            return rt, jnp.linalg.norm(rt)
    else:
        @jax.jit
        def verify(A, b, xh, xl):
            sh, sl = ff_mv(A._params, xh, xl)
            d, de = two_sum(b, -sh)
            rt = d + (de - sl)
            return rt, jnp.linalg.norm(rt)
    return verify


@jax.jit
def _accumulate(xh, xl, d):
    from ..utils.ff import ff_add
    return ff_add(xh, xl, d)


def _solver_params(solver):
    import inspect
    try:
        return inspect.signature(solver).parameters
    except (TypeError, ValueError):  # builtins / partials without sig
        return {}


def _accepts_kwarg(solver, name):
    return name in _solver_params(solver)


def _leg_cap_kwarg(solver):
    """Map a leg iteration cap onto the solver's own cap kwarg."""
    for name in ("itnlim", "maxiter", "matvec_max"):
        if name in _solver_params(solver):
            return name
    return None


def refined_solve(solver, A, b, *, rtol=1.0e-6, atol=0.0, x0=None, M=None,
                  leg_rtol=1.0e-2, max_legs=40, stall_factor=0.9,
                  leg_maxiter=None, **solver_kwargs):
    """Solve ``A x = b`` to a VERIFIED tolerance by iterative refinement
    with ``solver`` as the inner correction solver.

    Parameters
    ----------
    solver : one of the square-system solver functions (``cg``,
        ``minres``, ``symmlq``, ``bicgstab``, ``cgs``, ``tfqmr``) or any
        callable ``solver(A, rhs, rtol=..., M=..., **kw) -> SolveResult``.
    A, b : operator and right-hand side.
    rtol, atol : OUTER stopping rule on the verified true residual:
        ``||b - A x|| <= max(atol, rtol * ||b - A x0||)`` in the plain
        2-norm (``M`` only accelerates the legs — same contract as
        ff-CG's ``replace_every`` path).
    x0 : optional initial iterate (verified before the first leg).
    M : preconditioner forwarded to every inner leg.
    leg_rtol : INITIAL per-leg tolerance; each leg solves ``A d = r``
        with this inner ``rtol``.  1e-2 is comfortably inside f32's
        reliable range; smaller values mean fewer legs but risk the
        inner recurrence drifting within a leg.  Because some solvers'
        stopping tests are scaled (MINRES's test1 divides by
        ``Anorm*ynorm``), the leg tolerance ADAPTS: legs that fail to
        shrink the verified residual below ``stall_factor`` times the
        previous one tighten the inner rtol 10x (worsening legs are
        reverted first); five consecutive no-progress legs declare the
        precision floor (istop 3).
    max_legs : outer iteration cap.
    stall_factor : minimum per-leg verified-residual reduction that
        counts as progress.
    leg_maxiter : optional per-leg iteration cap (mapped onto the
        solver's ``itnlim``/``maxiter``/``matvec_max`` kwarg).  An f32
        MINRES recurrence drifts DESTRUCTIVELY past a few hundred
        iterations (measured on 1138bus: a 300-iteration leg multiplies
        the true residual by 3.6); capping legs keeps each correction
        inside the drift-free range.
    **solver_kwargs : forwarded verbatim to every inner leg (e.g.
        ``shift=``, ``check_curvature=``).  Legs additionally receive
        ``atol=0.0`` when the solver accepts it (inheriting the
        solvers' absolute default would stop small-norm legs
        immediately and misreport a reachable outer target as a
        precision floor).

    Notes
    -----
    Refinement restarts lose Krylov momentum: once the verified
    residual concentrates in the operator's worst-conditioned subspace,
    a fresh leg needs the asymptotic (superlinear-delayed) iteration
    count to make progress — on 1138bus/Jacobi an f64 leg needs ~600
    iterations for 1000x, which an f32 MINRES leg cannot survive
    without drifting.  On such systems (kappa ~ 1e7) the verified floor
    is ~1e-4 relative (20x below the unverified f32 stopping point) and
    the wrapper reports it honestly with istop 3.  SPD systems should
    prefer ``cg`` legs (or fused ff-CG via ``cg(replace_every=...)``),
    whose double-f32 in-loop carries survive long legs.

    Returns
    -------
    :class:`SolveResult` — ``x`` is the double-f32 high part
    (``info["x_lo"]`` the low part), ``resid_norm`` the VERIFIED true
    residual norm, ``resid_history`` the per-leg verified norms,
    ``n_matvec`` the total inner matvecs plus one compensated (or two
    plain) applications per verification, and ``info`` carries
    ``n_legs``, ``inner_istop``, ``inner_converged`` and
    ``inner_n_iter`` telemetry.
    """
    A = as_operator(A)
    M = as_operator(M) if M is not None else None
    b = promote_rhs(b, A, M)
    require_square(A, b, "refined_solve")
    n = b.shape[0]

    ff = resolve_ff_matvec(A)
    verify = _verifier(ff)
    verify_cost = 1 if ff is not None else 2

    n_matvec = 0
    if x0 is None:
        xh = jnp.zeros(n, b.dtype)
        xl = jnp.zeros(n, b.dtype)
        r = b
        resid = jnp.linalg.norm(b)
    else:
        xh = jnp.asarray(x0, b.dtype)
        xl = jnp.zeros(n, b.dtype)
        r, resid = verify(A, b, xh, xl)
        n_matvec += verify_cost
    resid0 = resid
    thresh = max(float(atol), float(rtol) * float(resid0))

    leg_resids = [float(resid)]
    inner_istops, inner_iters, inner_conv = [], [], []
    istop = 1
    n_iter = 0
    kwargs = dict(solver_kwargs)
    if M is not None:
        kwargs["M"] = M
    if leg_maxiter is not None:
        cap = _leg_cap_kwarg(solver)
        if cap is not None:
            kwargs.setdefault(cap, int(leg_maxiter))
    if _accepts_kwarg(solver, "atol"):
        # legs are rtol-driven: inheriting the solvers' absolute
        # atol=1e-8 default would stop small-norm legs immediately and
        # misreport a reachable outer target as a precision floor
        kwargs.setdefault("atol", 0.0)

    # Solvers with SCALED stopping tests (MINRES's test1 divides by
    # Anorm*ynorm) satisfy a fixed leg_rtol long before reducing the
    # actual leg residual by that factor, so the leg tolerance adapts:
    # whenever a leg fails to shrink the verified residual below
    # ``stall_factor`` times the previous one, the inner rtol tightens
    # 10x and a WORSENING leg is reverted; after ``_MAX_TIGHTENS``
    # consecutive no-progress legs the compensated evaluation's floor is
    # declared (istop 3).
    _MAX_TIGHTENS = 4
    inner_rtol = float(leg_rtol)
    tightens = 0
    for _ in range(int(max_legs)):
        if float(resid) <= thresh:
            istop = 0
            break
        res = solver(A, r, rtol=inner_rtol, **kwargs)
        n_matvec += int(res.n_matvec)
        n_iter += int(res.n_iter)
        inner_istops.append(int(res.istop))
        inner_iters.append(int(res.n_iter))
        inner_conv.append(bool(res.converged))
        xh2, xl2 = _accumulate(xh, xl, res.x)
        r2, new_resid = verify(A, b, xh2, xl2)
        n_matvec += verify_cost
        leg_resids.append(float(new_resid))
        bad = not bool(jnp.isfinite(new_resid))
        if bad or float(new_resid) >= float(resid):
            # worsening (or non-finite) correction: revert to the last
            # verified iterate before retrying tighter
            if bad and not bool(res.converged):
                istop = 2   # inner breakdown produced garbage
                break
            tightens += 1
            inner_rtol *= 0.1
        elif float(new_resid) > stall_factor * float(resid):
            # progress, but too slow: keep it and tighten the legs
            xh, xl, r, resid = xh2, xl2, r2, new_resid
            tightens += 1
            inner_rtol *= 0.1
        else:
            xh, xl, r, resid = xh2, xl2, r2, new_resid
            tightens = 0
        if tightens > _MAX_TIGHTENS:
            istop = 3
            break
    if float(resid) <= thresh:
        istop = 0

    info = {
        "x_lo": xl,
        "n_legs": len(inner_istops),
        "inner_istop": jnp.asarray(inner_istops or [0], jnp.int32),
        "inner_n_iter": jnp.asarray(inner_iters or [0], jnp.int32),
        "inner_converged": jnp.asarray(inner_conv or [False]),
        "true_resid_norm": resid,
    }
    return SolveResult(
        x=xh, converged=jnp.asarray(istop == 0),
        istop=jnp.asarray(istop, jnp.int32),
        n_iter=jnp.asarray(n_iter, jnp.int32),
        n_matvec=jnp.asarray(n_matvec, jnp.int32),
        resid_norm=resid, resid_norm0=resid0,
        resid_history=jnp.asarray(leg_resids, jnp.result_type(resid)),
        info=info)
