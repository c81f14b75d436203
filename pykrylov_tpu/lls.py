"""Least-squares family (import-path parity with ``pykrylov.lls``)."""

from .compat import (LSQRFramework, LSMRFramework, CRAIGFramework,
                     CRAIGMRFramework)
from .solvers import lsqr, lsmr, craig, craigmr
from .solvers.lls_common import sym_ortho as symOrtho

__all__ = ["LSQRFramework", "LSMRFramework", "CRAIGFramework",
           "CRAIGMRFramework", "lsqr", "lsmr", "craig", "craigmr",
           "symOrtho"]
