"""SYMMLQ (import-path parity with ``pykrylov.symmlq``)."""

from .compat import Symmlq
from .solvers import symmlq as solve_symmlq
from .solvers.symmlq import ISTOP_MSG

__all__ = ["Symmlq", "solve_symmlq", "ISTOP_MSG"]
