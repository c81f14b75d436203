"""Multi-right-hand-side solves: block-batched CG + a generic column
driver.

The reference solves one RHS per call (its solvers hold a single
``self.x``; ``generic/generic.py:79-87``).  On TPU that leaves the
dominant cost — streaming the operator out of HBM — unamortized: an
HBM-bound SpMV moves ``A_bytes + x_bytes + y_bytes`` per product, so
solving K systems one by one streams A K times.  ``cg_batched`` runs
one fused ``lax.while_loop`` over an (n, K) block iterate instead: each
iteration applies the operator to ALL K direction columns (one
traced block product — a matmul on the MXU for dense operators, a
K-column gather/segment product for sparse formats), turning K solves
into ``A_bytes + K·(x+y)_bytes`` of traffic per iteration and a single
device program for the whole family.

Semantics: each column runs EXACTLY the reference CG recurrence
(``/root/reference/pykrylov/cg/cg.py:113-158``) under a per-column
active mask — converged (or curvature-failed) columns freeze: their
``alpha`` is forced to 0 and their direction column is carried
unchanged, so a column's iterate history matches a single-RHS ``cg``
call up to floating-point reduction order (the block product sums in
a different order than the single dot; stopping iterations track
within 1-2 over hundreds of iterations — tested), while
the loop keeps running until every column has stopped or the iteration
cap hits.  Per-column stopping uses the reference rule
``resid_k <= max(atol, rtol * resid0_k)`` on the preconditioned norm
``sqrt(r'M r)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import apply_op, as_operator, default_maxiter
from .result import SolveResult

__all__ = ["cg_batched", "solve_columns", "ISTOP_MSG"]

ISTOP_MSG = {
    0: "residual small enough (relative/absolute tolerance reached)",
    1: "iteration budget exhausted before convergence",
    2: "operator appears indefinite: nonpositive curvature encountered",
}


def _apply_block(op, X):
    """Block product ``A @ X`` on an (n, K) column block via trace-time
    vmap (the same lowering the operator layer's 2-D ``matvec`` uses,
    ``ops/base.py``: XLA fuses it into one dot_general for dense
    operators and a batched gather for the sparse formats)."""
    return jax.vmap(lambda c: apply_op(op, c), in_axes=1, out_axes=1)(X)


def _col_dot(A, B):
    """Per-column conjugated real inner products ``Re(a_k' b_k)``."""
    return jnp.sum(jnp.conj(A) * B, axis=0).real


@partial(jax.jit, static_argnames=("maxiter", "check_curvature",
                                   "store_history"))
def _cg_batched(A, B, X0, M, rtol, atol, maxiter, check_curvature,
                store_history):
    dtype = B.dtype
    n, K = B.shape
    if X0 is None:
        X = jnp.zeros((n, K), dtype)
        R = B
        extra = 0
    else:
        X = X0.astype(dtype)
        R = B - _apply_block(A, X)
        extra = 1
    Y = _apply_block(M, R) if M is not None else R
    ry = _col_dot(R, Y)
    resid0 = jnp.sqrt(jnp.maximum(ry, 0))
    thresh = jnp.maximum(jnp.asarray(atol, resid0.dtype),
                         jnp.asarray(rtol, resid0.dtype) * resid0)
    hist = (jnp.full((maxiter + 1, K), jnp.nan, resid0.dtype)
            .at[0].set(resid0) if store_history else None)

    active0 = resid0 > thresh
    carry0 = (X, R, Y, Y, ry, jnp.zeros((), jnp.int32), resid0, active0,
              jnp.ones(K, bool), jnp.zeros(K, jnp.int32), hist)

    def cond(carry):
        _, _, _, _, _, k, _, active, _, _, _ = carry
        return jnp.any(active) & (k < maxiter)

    def body(carry):
        X, R, Y, P, ry, k, resid, active, definite, iters, hist = carry
        AP = _apply_block(A, P)
        pAp = _col_dot(P, AP)
        if check_curvature:
            bad = active & (pAp <= 0)
        else:
            bad = jnp.zeros_like(active)
        act = active & ~bad
        # frozen columns get alpha = beta-mix 0 so every array column
        # they own is carried bit-unchanged through the remaining sweeps
        alpha = jnp.where(act, ry / jnp.where(pAp == 0, 1, pAp), 0)
        X2 = X + alpha * P
        R2 = R - alpha * AP
        Y2 = _apply_block(M, R2) if M is not None else R2
        ry2 = _col_dot(R2, Y2)
        beta = jnp.where(act, ry2 / jnp.where(ry == 0, 1, ry), 0)
        P2 = jnp.where(act, Y2 + beta * P, P)
        resid2 = jnp.where(act, jnp.sqrt(jnp.maximum(ry2, 0)), resid)
        done = act & (resid2 <= thresh)
        h2 = hist if hist is None else hist.at[k + 1].set(
            jnp.where(active, resid2, jnp.nan))
        return (X2, R2, jnp.where(act, Y2, Y), P2,
                jnp.where(act, ry2, ry), k + 1, resid2, act & ~done,
                definite & ~bad, iters + active.astype(jnp.int32), h2)

    (X, R, Y, P, ry, k, resid, active, definite, iters, hist) = \
        jax.lax.while_loop(cond, body, carry0)

    converged = resid <= thresh
    istop = jnp.where(converged, 0, jnp.where(definite, 1, 2))
    info = {"definite": definite, "n_iter_columns": iters,
            "active_at_exit": active}
    return SolveResult(
        x=X, converged=converged, istop=istop.astype(jnp.int32),
        n_iter=k, n_matvec=k + extra,
        resid_norm=resid, resid_norm0=resid0,
        resid_history=hist, info=info)


def cg_batched(A, B, *, x0=None, M=None, rtol=1.0e-6, atol=1.0e-8,
               maxiter=None, matvec_max=None, check_curvature=False,
               store_history=False):
    """Solve SPD ``A X = B`` for an (n, K) block of right-hand sides in
    ONE fused while-loop.

    Each column follows the reference CG recurrence and stopping rule
    independently (``/root/reference/pykrylov/cg/cg.py:99-158``) under
    a per-column freeze mask — results match K separate
    :func:`~pykrylov_tpu.solvers.cg` calls up to floating-point
    reduction order — while the
    operator is applied to the whole direction block at once, streaming
    A's data a single time per iteration for all K systems.

    Parameters mirror :func:`~pykrylov_tpu.solvers.cg` (no
    residual-replacement / telemetry-buffer options; ``x0`` is an
    (n, K) block).  ``maxiter`` caps BLOCK iterations; a column that
    converges early freezes and stops counting
    (``info["n_iter_columns"]``).

    Returns
    -------
    :class:`SolveResult` with per-column fields: ``x`` is (n, K);
    ``converged``/``istop``/``resid_norm``/``resid_norm0`` are (K,)
    arrays; ``resid_history`` (when stored) is (maxiter+1, K) with NaN
    after each column's own stop.  ``n_matvec`` counts BLOCK products
    (each = K column matvecs); ``info["n_iter_columns"]`` the
    per-column iteration counts, ``info["definite"]`` the per-column
    curvature verdicts.
    """
    A = as_operator(A)
    M = as_operator(M) if M is not None else None
    B = jnp.asarray(B)
    if B.ndim == 1:
        B = B[:, None]
    if B.ndim != 2 or B.shape[0] != A.shape[1] or A.shape[0] != A.shape[1]:
        from ..ops.base import ShapeError
        raise ShapeError("cg_batched: operator %r with rhs block %s"
                         % (A, B.shape))
    dtype = jnp.result_type(B.dtype, A.dtype,
                            *([M.dtype] if M is not None else []))
    B = B.astype(dtype)
    if maxiter is None:
        maxiter = default_maxiter(B.shape[0], 1, matvec_max)
    X0 = None if x0 is None else jnp.asarray(x0).reshape(B.shape)
    return _cg_batched(A, B, X0, M, float(rtol), float(atol), int(maxiter),
                       bool(check_curvature), bool(store_history))


def solve_columns(solver, A, B, **kwargs):
    """Generic multi-RHS driver: run ``solver`` once per column of
    ``B`` (host loop, one compile shared across columns) and stack the
    results.

    The pedestrian fallback for methods without a fused block variant
    (:func:`cg_batched` covers CG): per-column results are bitwise
    those of individual calls, nothing is amortized except compilation.
    Returns a list of :class:`SolveResult`, one per column.
    """
    A = as_operator(A)
    B = jnp.asarray(B)
    if B.ndim != 2:
        raise ValueError("solve_columns expects an (n, K) block, got %s"
                         % (B.shape,))
    return [solver(A, B[:, j], **kwargs) for j in range(B.shape[1])]
