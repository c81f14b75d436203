"""Krylov solver family — pure functions over operator pytrees.

Every solver is ``solve(A, b, **opts) -> SolveResult`` with the iteration
fused into a jit-compiled ``lax.while_loop`` (SURVEY §7 design stance).
"""

from .result import SolveResult
from .cg import cg

__all__ = ["SolveResult", "cg"]


def __getattr__(name):
    # Solvers are added incrementally; lazy imports keep partial builds
    # importable and speed up cold start.
    _lazy = {
        "minres": ".minres", "symmlq": ".symmlq", "bicgstab": ".bicgstab",
        "cgs": ".cgs", "tfqmr": ".tfqmr", "lsqr": ".lsqr", "lsmr": ".lsmr",
        "craig": ".craig", "craigmr": ".craigmr",
        "cg_pipelined": ".pipelined",
        # Implicit-differentiation wrappers (custom VJP).
        "make_differentiable": ".diff", "cg_solve": ".diff",
        "bicgstab_solve": ".diff", "lsqr_solve": ".diff",
    }
    if name in _lazy:
        import importlib
        mod = importlib.import_module(_lazy[name], __name__)
        fn = getattr(mod, name)
        globals()[name] = fn
        return fn
    raise AttributeError(name)
