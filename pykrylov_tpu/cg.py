"""Conjugate-gradient algorithm (import-path parity with the
reference package ``pykrylov.cg``)."""

from .compat import CG
from .solvers import cg as solve_cg
from .solvers.cg import ISTOP_MSG

__all__ = ["CG", "solve_cg", "ISTOP_MSG"]
