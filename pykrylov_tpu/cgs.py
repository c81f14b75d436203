"""CGS (import-path parity with ``pykrylov.cgs``)."""

from .compat import CGS
from .solvers import cgs as solve_cgs
from .solvers.cgs import ISTOP_MSG

__all__ = ["CGS", "solve_cgs", "ISTOP_MSG"]
