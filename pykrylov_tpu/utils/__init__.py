"""Numeric utilities and dtype tables."""

from .types import (allowed_types, integer_types, real_types, complex_types,
                    is_complex_dtype, is_real_dtype, result_type)
from .utils import (machine_epsilon, roots_quadratic, check_symmetric,
                    check_positive_definite)

__all__ = [
    "allowed_types", "integer_types", "real_types", "complex_types",
    "is_complex_dtype", "is_real_dtype", "result_type",
    "machine_epsilon", "roots_quadratic", "check_symmetric",
    "check_positive_definite",
]
