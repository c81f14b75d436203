"""Krylov solver family — pure functions over operator pytrees.

Every solver is ``solve(A, b, **opts) -> SolveResult`` with the iteration
fused into a jit-compiled ``lax.while_loop`` (SURVEY §7 design stance).

Submodules are imported EAGERLY and the solver function names are bound
LAST: a first-time submodule import (``from .lsqr import ISTOP_MSG``
anywhere) sets the submodule as a package attribute, silently shadowing
a lazily-cached function of the same name — an order-dependent landmine
this layout removes (subsequent imports of already-loaded submodules do
not rebind the attribute).
"""

from .result import SolveResult

# eager submodule loads (each sets the package attribute to the MODULE)
from . import (cg as _m_cg, minres as _m_minres, symmlq as _m_symmlq,
               bicgstab as _m_bicgstab, cgs as _m_cgs, tfqmr as _m_tfqmr,
               lsqr as _m_lsqr, lsmr as _m_lsmr, craig as _m_craig,
               craigmr as _m_craigmr, pipelined as _m_pipelined,
               diff as _m_diff, show as _m_show,
               refine as _m_refine)  # noqa: F401

# function bindings win (rebinding the attributes set just above)
from .cg import cg
from .minres import minres
from .symmlq import symmlq
from .bicgstab import bicgstab
from .cgs import cgs
from .tfqmr import tfqmr
from .lsqr import lsqr
from .lsmr import lsmr
from .craig import craig
from .craigmr import craigmr
from .pipelined import cg_pipelined
from .diff import make_differentiable, cg_solve, bicgstab_solve, lsqr_solve
from .refine import refined_solve, refined_solve_batched, refined_lls
from .batched import (cg_batched, cg_pipelined_batched,
                      bicgstab_batched, cgs_batched,
                      tfqmr_batched, minres_batched, symmlq_batched,
                      lsqr_batched, lsmr_batched, craig_batched,
                      craigmr_batched, solve_columns)

__all__ = ["SolveResult", "cg", "minres", "symmlq", "bicgstab", "cgs",
           "tfqmr", "lsqr", "lsmr", "craig", "craigmr", "cg_pipelined",
           "make_differentiable", "cg_solve", "bicgstab_solve",
           "lsqr_solve", "refined_solve", "refined_solve_batched",
           "refined_lls", "cg_batched", "cg_pipelined_batched",
           "lsqr_batched", "bicgstab_batched", "cgs_batched",
           "tfqmr_batched", "minres_batched", "symmlq_batched",
           "lsmr_batched", "craig_batched", "craigmr_batched",
           "solve_columns"]
