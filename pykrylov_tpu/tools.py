"""Compat alias: the reference exposes numerics helpers as
``pykrylov.tools`` (``/root/reference/pykrylov/tools/``); this build keeps
them in :mod:`pykrylov_tpu.utils` and re-exports here so reference-style
imports (``from pykrylov.tools import check_symmetric``) port by renaming
only the package.
"""

from .utils.types import (allowed_types, integer_types, real_types,
                          complex_types)
from .utils.utils import (machine_epsilon, roots_quadratic, check_symmetric,
                          check_positive_definite)

__all__ = [
    "allowed_types", "integer_types", "real_types", "complex_types",
    "machine_epsilon", "roots_quadratic", "check_symmetric",
    "check_positive_definite",
]
