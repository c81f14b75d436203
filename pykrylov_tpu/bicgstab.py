"""Bi-CGSTAB (import-path parity with ``pykrylov.bicgstab``)."""

from .compat import BiCGSTAB
from .solvers import bicgstab as solve_bicgstab
from .solvers.bicgstab import ISTOP_MSG

__all__ = ["BiCGSTAB", "solve_bicgstab", "ISTOP_MSG"]
