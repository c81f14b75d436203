"""Linear-operator layer (import-path parity with ``pykrylov.linop``)."""

from .ops import *  # noqa: F401,F403
from .ops import __all__ as _ops_all

__all__ = list(_ops_all)
