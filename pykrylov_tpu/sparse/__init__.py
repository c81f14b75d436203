"""Sparse containers, device SpMV kernels, and sparse-backed operators."""

from .formats import (COO, CSR, ELL, DIA,
                      coo_from_arrays, csr_from_coo, ell_from_coo,
                      dia_from_coo, transpose_coo, bandwidth_profile,
                      coo_matvec, csr_matvec, ell_matvec, dia_matvec,
                      to_dense)
from .linop import (SparseOperator, sparse_operator, operator_from_coo,
                    jacobi_preconditioner, diag_of_coo)

__all__ = [
    "COO", "CSR", "ELL", "DIA",
    "coo_from_arrays", "csr_from_coo", "ell_from_coo", "dia_from_coo",
    "transpose_coo", "bandwidth_profile",
    "coo_matvec", "csr_matvec", "ell_matvec", "dia_matvec", "to_dense",
    "SparseOperator", "sparse_operator", "operator_from_coo",
    "jacobi_preconditioner", "diag_of_coo",
]
