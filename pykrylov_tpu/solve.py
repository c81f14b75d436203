"""Top-level ``solve`` front door with automatic method selection.

The reference makes users pick a solver class; this convenience picks a
sensible method from the operator's shape and declared symmetry (something
scipy users expect from ``spsolve``-style entry points):

  * rectangular (m != n)            → LSMR (monotone ‖Aᵀr‖, safe stops)
  * square + symmetric/hermitian    → CG, falling back to MINRES when CG's
    curvature check detects an indefinite operator
  * square, general                 → Bi-CGSTAB, falling back to TFQMR if
    the recurrence breaks down

Explicit ``method=`` accepts any solver name exported by
:mod:`pykrylov_tpu.solvers`.
"""

from __future__ import annotations

from . import solvers as _S
from .solvers.common import as_operator

__all__ = ["solve"]

_METHODS = ("cg", "cg_pipelined", "minres", "symmlq", "bicgstab", "cgs",
            "tfqmr", "lsqr", "lsmr", "craig", "craigmr")


def solve(A, b, method=None, **opts):
    """Solve ``A x = b`` (or ``min ‖Ax-b‖`` for rectangular A).

    Returns a :class:`~pykrylov_tpu.solvers.SolveResult`.  ``opts`` pass
    through to the chosen solver.
    """
    A = as_operator(A)
    if method is not None:
        if method not in _METHODS:
            raise ValueError("unknown method %r (have %s)"
                             % (method, ", ".join(_METHODS)))
        return getattr(_S, method)(A, b, **opts)

    m, n = A.shape
    if m != n:
        return _S.lsmr(A, b, **opts)

    if A.symmetric or A.hermitian:
        res = _S.cg(A, b, check_curvature=True, **opts)
        if int(res.istop) == 2:  # indefinite → MINRES handles it
            minres_opts = {k: v for k, v in opts.items()
                           if k in ("M", "rtol", "etol", "window",
                                    "store_history")}
            # Map the square-solver caps onto MINRES's itnlim.
            if "maxiter" in opts:
                minres_opts["itnlim"] = opts["maxiter"]
            elif "matvec_max" in opts:
                minres_opts["itnlim"] = opts["matvec_max"]
            return _S.minres(A, b, **minres_opts)
        return res

    res = _S.bicgstab(A, b, **opts)
    if int(res.istop) == 3:  # breakdown → different recurrence
        return _S.tfqmr(A, b, **opts)
    return res
