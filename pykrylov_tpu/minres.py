"""MINRES (import-path parity with ``pykrylov.minres``)."""

from .compat import Minres
from .solvers import minres as solve_minres
from .solvers.minres import ISTOP_MSG

__all__ = ["Minres", "solve_minres", "ISTOP_MSG"]
