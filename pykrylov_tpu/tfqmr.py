"""TFQMR (import-path parity with ``pykrylov.tfqmr``)."""

from .compat import TFQMR
from .solvers import tfqmr as solve_tfqmr
from .solvers.tfqmr import ISTOP_MSG

__all__ = ["TFQMR", "solve_tfqmr", "ISTOP_MSG"]
