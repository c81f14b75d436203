"""Unified solver result contract.

The reference returns results inconsistently — most solvers set attributes
(``converged``, ``nMatvec``, ``bestSolution``, ``residNorm``,
``generic/generic.py:79-87``) while LSMR returns a tuple
(``lls/lsmr.py:492``).  Per SURVEY §7 the build unifies on one contract:
every functional solver returns a :class:`SolveResult` pytree, so results
flow through ``jit``/``vmap``/``lax`` unchanged, and the compat layer maps
fields back onto reference-style attributes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

__all__ = ["SolveResult"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveResult:
    """Result of a Krylov solve.

    Fields mirror the reference result state (``generic/generic.py:79-87``)
    plus per-method extras carried in ``info``.

    Attributes
    ----------
    x : solution estimate (the reference's ``bestSolution``).
    converged : bool scalar — stopping test satisfied before iteration cap.
    istop : int32 scalar — solver-specific stop code; each solver module
        exports an ``ISTOP_MSG`` table mapping codes to messages.
    n_iter : int32 scalar — iterations performed.
    n_matvec : int32 scalar — operator applications (incl. transpose for
        the LLS family), the reference's ``nMatvec``.
    resid_norm : final residual norm (preconditioned norm where the
        reference uses one, e.g. CG's sqrt(r'My)).
    resid_norm0 : initial residual norm.
    resid_history : optional (maxiter+1,) buffer of residual norms, NaN
        beyond ``n_iter`` (the reference's ``residHistory`` list).
    info : dict of solver-specific extras (Anorm/Acond/xnorm estimates,
        energy norms, direction of infinite descent, ...).
    """

    x: jnp.ndarray
    converged: jnp.ndarray
    istop: jnp.ndarray
    n_iter: jnp.ndarray
    n_matvec: jnp.ndarray
    resid_norm: jnp.ndarray
    resid_norm0: jnp.ndarray
    resid_history: Optional[jnp.ndarray] = None
    info: dict = dataclasses.field(default_factory=dict)

    def history(self):
        """Residual history trimmed to the iterations performed (host-side)."""
        if self.resid_history is None:
            return []
        h = jax.device_get(self.resid_history)
        k = int(self.n_iter)
        return list(h[: k + 1])

    def __repr__(self):
        try:
            return ("SolveResult(converged=%s, istop=%d, n_iter=%d, "
                    "n_matvec=%d, resid=%.3e)") % (
                bool(self.converged), int(self.istop), int(self.n_iter),
                int(self.n_matvec), float(self.resid_norm))
        except Exception:
            return object.__repr__(self)
