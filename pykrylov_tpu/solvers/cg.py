"""Preconditioned conjugate gradients as a fused ``lax.while_loop``.

TPU-native redesign of the reference CG (``/root/reference/pykrylov/cg/
cg.py:9-165``).  The reference runs a host Python loop with one matvec, two
dots and three axpys per iteration and checks scalars on the host every
pass; here the whole iteration is one jit-compiled ``lax.while_loop`` with
an on-device convergence predicate, so a solve is a single device program
regardless of iteration count.

Preserved semantics (SURVEY §2.3):
  * preconditioned residual norm ``residNorm = sqrt(r'·M r)`` drives the
    stopping rule ``max(abstol, reltol · residNorm0)`` (``cg.py:99-102``);
  * ``matvec_max`` cap (default 2n) on operator applications;
  * optional curvature check: if ``p'Ap <= 0`` the method aborts, flags the
    operator indefinite and returns the direction of (near-)infinite
    descent for trust-region callers (``cg.py:119-124``);
  * optional residual history (``cg.py:101,155``) as a fixed device buffer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import (as_operator, apply_op, threshold_of, history_init,
                     history_push, default_maxiter, promote_rhs, require_square)
from .result import SolveResult

__all__ = ["cg", "ISTOP_MSG"]

ISTOP_MSG = {
    0: "residual small enough (relative/absolute tolerance reached)",
    1: "matvec budget exhausted before convergence",
    2: "operator appears indefinite: nonpositive curvature encountered",
}


@partial(jax.jit, static_argnames=("maxiter", "check_curvature",
                                   "store_history", "store_iterates",
                                   "store_resids"))
def _cg(A, b, x0, M, rtol, atol, maxiter, check_curvature, store_history,
        store_iterates, store_resids):
    dtype = b.dtype
    n = b.shape[0]

    if x0 is None:
        x = jnp.zeros(n, dtype=dtype)
        r = b
        extra_matvec = 0
    else:
        x = x0.astype(dtype)
        r = b - apply_op(A, x)
        extra_matvec = 1

    y = apply_op(M, r) if M is not None else r
    ry = jnp.vdot(r, y).real
    resid0 = jnp.sqrt(ry)
    thresh = threshold_of(resid0, rtol, atol)
    hist = history_init(store_history, maxiter, resid0.dtype)
    hist = history_push(hist, 0, resid0)
    # Optional iterate / residual-vector histories (reference
    # ``store_iterates``/``store_resids``, cg.py:66-67,79-80,133-143):
    # fixed (maxiter+1, n) device buffers.
    # The reference stores the PRECONDITIONED residual vectors y = M r
    # (cg.py:97,143), which coincide with r only when M is None.
    iters_buf = (jnp.full((maxiter + 1, n), jnp.nan, dtype=dtype)
                 .at[0].set(x) if store_iterates else None)
    resids_buf = (jnp.full((maxiter + 1, n), jnp.nan, dtype=dtype)
                  .at[0].set(y) if store_resids else None)
    # Per-iteration curvature p'Ap telemetry (the value the reference logs
    # each iteration, cg.py:158) — NaN at row 0 (no curvature yet).
    curv_hist = history_init(store_history, maxiter, resid0.dtype)

    def cond(carry):
        (x, r, y, p, ry, k, resid, definite, inf_desc, hist, ib, rb,
         cb) = carry
        return (resid > thresh) & (k < maxiter) & definite

    def body(carry):
        (x, r, y, p, ry, k, resid, definite, inf_desc, hist, ib, rb,
         cb) = carry
        Ap = apply_op(A, p)
        pAp = jnp.vdot(p, Ap).real

        def indefinite(_):
            # Record the direction of nonpositive curvature and abort.
            # Telemetry rows for the aborted iteration repeat the current
            # (unchanged) values so the buffers stay finite through
            # n_iter (the reference appends nothing on abort).
            return (x, r, y, p, ry, k + 1, resid, jnp.asarray(False), p,
                    history_push(hist, k + 1, resid),
                    history_push(ib, k + 1, x),
                    history_push(rb, k + 1, y),
                    history_push(cb, k + 1, pAp))

        def step(_):
            alpha = ry / pAp
            x2 = x + alpha * p
            r2 = r - alpha * Ap
            y2 = apply_op(M, r2) if M is not None else r2
            ry2 = jnp.vdot(r2, y2).real
            beta = ry2 / ry
            p2 = y2 + beta * p
            resid2 = jnp.sqrt(ry2)
            h2 = history_push(hist, k + 1, resid2)
            ib2 = history_push(ib, k + 1, x2)
            rb2 = history_push(rb, k + 1, y2)
            cb2 = history_push(cb, k + 1, pAp)
            return (x2, r2, y2, p2, ry2, k + 1, resid2, definite, inf_desc,
                    h2, ib2, rb2, cb2)

        if check_curvature:
            return jax.lax.cond(pAp <= 0, indefinite, step, None)
        return step(None)

    p0 = y
    carry0 = (x, r, y, p0, ry, jnp.zeros((), jnp.int32), resid0,
              jnp.asarray(True), jnp.zeros_like(b), hist, iters_buf,
              resids_buf, curv_hist)
    (x, r, y, p, ry, k, resid, definite, inf_desc, hist, iters_buf,
     resids_buf, curv_hist) = jax.lax.while_loop(cond, body, carry0)

    converged = resid <= thresh
    istop = jnp.where(converged, 0, jnp.where(definite, 1, 2))
    info = {"definite": definite}
    if check_curvature:
        info["infinite_descent"] = inf_desc
    if store_iterates:
        info["iterates"] = iters_buf
    if store_resids:
        info["resids"] = resids_buf
    if store_history:
        info["curvatures"] = curv_hist
    return SolveResult(
        x=x, converged=converged, istop=istop.astype(jnp.int32),
        n_iter=k, n_matvec=k + extra_matvec,
        resid_norm=resid, resid_norm0=resid0,
        resid_history=hist, info=info)


def cg(A, b, *, x0=None, M=None, rtol=1.0e-6, atol=1.0e-8, maxiter=None,
       matvec_max=None, check_curvature=False, store_history=False,
       store_iterates=False, store_resids=False):
    """Solve SPD ``A x = b`` by preconditioned conjugate gradients.

    Parameters
    ----------
    A : LinearOperator or dense array — symmetric positive definite.
    b : right-hand side vector.
    x0 : optional initial guess (costs one extra matvec, ``cg.py:85-88``).
    M : optional preconditioner operator approximating A^{-1}.
    rtol, atol : stopping rule ``resid <= max(atol, rtol * resid0)`` on the
        preconditioned residual norm sqrt(r'Mr).
    maxiter : iteration cap; default derived from ``matvec_max`` (2n).
    check_curvature : abort on nonpositive curvature and report the
        direction of infinite descent in ``result.info`` (trust-region use).
    store_history : keep the residual-norm history in a device buffer.
    store_iterates : keep every iterate in a (maxiter+1, n) device buffer
        returned as ``result.info["iterates"]`` (NaN rows beyond
        ``n_iter``) — the reference's ``store_iterates`` (cg.py:66-67).
        Memory scales with maxiter*n; prefer ``checkpointed_solve`` for
        long runs.
    store_resids : likewise for the preconditioned residual vectors
        ``y = M r`` (``result.info["resids"]``; reference cg.py:97,143 —
        equal to the raw residuals when ``M`` is None).

    Returns :class:`SolveResult`.
    """
    A = as_operator(A)
    M = as_operator(M) if M is not None else None
    b = promote_rhs(b, A, M)
    require_square(A, b, "cg")
    if maxiter is None:
        maxiter = default_maxiter(b.shape[0], 1, matvec_max)
    x0 = jnp.asarray(x0) if x0 is not None else None
    return _cg(A, b, x0, M, rtol, atol, int(maxiter),
               bool(check_curvature), bool(store_history),
               bool(store_iterates), bool(store_resids))
