"""Generic solver template (import-path parity with
``pykrylov.generic``)."""

from .compat import KrylovMethod, null_log
from .solvers import SolveResult

__all__ = ["KrylovMethod", "null_log", "SolveResult"]
