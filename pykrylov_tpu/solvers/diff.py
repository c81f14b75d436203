"""Implicitly differentiable solves (custom VJP via adjoint systems).

A capability with no reference counterpart, natural in the functional
design: since ``x* = A^{-1} b`` satisfies ``A x* - b = 0``, gradients flow
through a converged solve by the implicit function theorem instead of
differentiating the iteration:

    dL/db      = A^{-T} g              (one adjoint solve)
    dL/d(A_p)  = - vjp of (p -> A(p) x*) applied at  lambda = A^{-T} g

so the backward pass is ONE additional linear solve plus one matvec-VJP —
independent of how many iterations the forward solve took, and with no
memory footprint from unrolling (``lax.while_loop`` is not reverse-mode
differentiable at all, so this is also what makes ``grad`` work).

``make_differentiable`` wraps any functional solver; ``cg_solve`` /
``bicgstab_solve`` / ``lsqr_solve`` are ready-made wrappers returning just
``x`` (custom-VJP functions must return differentiable outputs only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .common import as_operator

__all__ = ["make_differentiable", "cg_solve", "bicgstab_solve",
           "lsqr_solve"]


def _operator_cotangent(A, dparams):
    """Build a cotangent pytree matching operator ``A`` with ``dparams``
    in the params slot (all metadata is static aux data)."""
    leaves, treedef = jax.tree_util.tree_flatten(A)
    dleaves = jax.tree_util.tree_leaves(
        dparams, is_leaf=lambda x: x is None)
    if len(dleaves) != len(leaves):
        # params structure mismatch: fall back to zeros
        dleaves = [jnp.zeros_like(l) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, dleaves)


def make_differentiable(solve_fn, adjoint_solve_fn=None, symmetric=False,
                        **default_opts):
    """Wrap a functional solver into ``f(A, b) -> x`` with a custom VJP.

    Parameters
    ----------
    solve_fn : e.g. :func:`pykrylov_tpu.solvers.cg`; called as
        ``solve_fn(A, b, **opts)`` and must return a SolveResult.
    adjoint_solve_fn : solver for the adjoint system ``A^T lam = g``;
        defaults to ``solve_fn``.  With ``symmetric=True`` the forward
        operator is reused directly (no transpose needed).
    default_opts : solver options baked into both passes (rtol, atol,
        maxiter, ...).

    Returns a function of ``(A, b)`` differentiable in both the rhs and
    the operator's array parameters.
    """
    adjoint_solve_fn = adjoint_solve_fn or solve_fn

    @jax.custom_vjp
    def solve(A, b):
        return solve_fn(A, b, **default_opts).x

    def fwd(A, b):
        x = solve_fn(A, b, **default_opts).x
        return x, (A, x)

    def bwd(residuals, g):
        A, x = residuals
        AT = A if symmetric else A.T
        lam = adjoint_solve_fn(AT, g, **default_opts).x
        db = lam

        def apply_params(params):
            return A._mv(params, x)

        if A.params is None or not jax.tree_util.tree_leaves(A.params):
            dA = _operator_cotangent(A, None)
        else:
            _, vjp_fn = jax.vjp(apply_params, A.params)
            (dparams,) = vjp_fn(-lam)
            dA = _operator_cotangent(A, dparams)
        return dA, db

    solve.defvjp(fwd, bwd)

    def wrapper(A, b, **_ignored):
        return solve(as_operator(A), jnp.asarray(b))

    return wrapper


def cg_solve(A, b, **opts):
    """Differentiable CG solve (SPD A): returns x with implicit-diff VJP."""
    from .cg import cg
    opts.setdefault("rtol", 1e-10)
    return make_differentiable(cg, symmetric=True, **opts)(A, b)


def bicgstab_solve(A, b, **opts):
    """Differentiable Bi-CGSTAB solve (general square A)."""
    from .bicgstab import bicgstab
    opts.setdefault("rtol", 1e-10)
    return make_differentiable(bicgstab, symmetric=False, **opts)(A, b)


def lsqr_solve(A, b, **opts):
    """Differentiable least-squares solve.

    For full-column-rank A, ``x* = (A^T A)^{-1} A^T b``; the VJP solves the
    normal-equations adjoint with LSQR on ``A^T`` applied via the
    Golub-Kahan machinery.  Gradients wrt A parameters use the residual
    form of the least-squares implicit function theorem only when the
    system is consistent; for inconsistent systems prefer differentiating
    a damped formulation.
    """
    from .lsqr import lsqr
    opts.setdefault("atol", 1e-12)
    opts.setdefault("btol", 1e-12)

    def solve_T(AT, g, **o):
        return lsqr(AT, g, **o)

    return make_differentiable(lsqr, adjoint_solve_fn=solve_T,
                               symmetric=False, **opts)(A, b)
