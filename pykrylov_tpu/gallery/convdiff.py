"""Convection-diffusion gallery: the nonsymmetric stencil problem.

The reference gallery carries only the symmetric Poisson matvecs
(``/root/reference/pykrylov/gallery/gallery.py:3-29``); its NONSYMMETRIC
solvers (BiCGSTAB/CGS/TFQMR) are exercised on file matrices instead.
This module adds the canonical generated nonsymmetric test problem — the
2-D convection-diffusion operator ``-Δu + (wx, wy)·∇u`` on the unit
square (Dirichlet), discretized with central differences for the
diffusion and first-order upwinding for the convection — as both a
matrix-free jit-safe matvec and COO triples for the sparse kernels.

Upwinding keeps the matrix an M-matrix (row-wise diagonally dominant)
for every Péclet number, so the transpose-free solvers converge without
preconditioning; the skew part grows with ``w``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["convdiff2d_matvec", "convdiff2d_coo", "convdiff2d_operator"]


def _coeffs(n, wx, wy):
    """Stencil coefficients on the n x n interior grid with h = 1/(n+1):
    (center, west, east, south, north) scaled by h^2."""
    h = 1.0 / (n + 1)
    # diffusion: 4, -1, -1, -1, -1 ; upwind convection adds |w|h terms
    cw = -1.0 - max(wx, 0.0) * h
    ce = -1.0 + min(wx, 0.0) * h
    cs = -1.0 - max(wy, 0.0) * h
    cn = -1.0 + min(wy, 0.0) * h
    cc = 4.0 + (abs(wx) + abs(wy)) * h
    return cc, cw, ce, cs, cn


def convdiff2d_matvec(x, wx=20.0, wy=10.0):
    """Matrix-free ``y = A x`` for the n² unknowns of the 2-D
    convection-diffusion stencil (x flattened row-major, jit-safe)."""
    n = int(np.sqrt(x.shape[0]))
    cc, cw, ce, cs, cn = _coeffs(n, wx, wy)
    u = x.reshape(n, n)
    y = cc * u
    y = y.at[:, 1:].add(cw * u[:, :-1])
    y = y.at[:, :-1].add(ce * u[:, 1:])
    y = y.at[1:, :].add(cs * u[:-1, :])
    y = y.at[:-1, :].add(cn * u[1:, :])
    return y.reshape(-1)


def convdiff2d_coo(n, wx=20.0, wy=10.0, dtype=np.float64):
    """COO triples ``(vals, rows, cols, shape)`` of the n² x n² matrix."""
    cc, cw, ce, cs, cn = _coeffs(n, wx, wy)
    idx = np.arange(n * n).reshape(n, n)
    rows, cols, vals = [idx.ravel()], [idx.ravel()], [
        np.full(n * n, cc, dtype)]

    def add(r, c, v):
        rows.append(r.ravel())
        cols.append(c.ravel())
        vals.append(np.full(r.size, v, dtype))

    add(idx[:, 1:], idx[:, :-1], cw)
    add(idx[:, :-1], idx[:, 1:], ce)
    add(idx[1:, :], idx[:-1, :], cs)
    add(idx[:-1, :], idx[1:, :], cn)
    return (np.concatenate(vals), np.concatenate(rows),
            np.concatenate(cols), (n * n, n * n))


@functools.lru_cache(maxsize=None)
def _convdiff_mv_factory(wx, wy):
    # weights are STATIC (they pick the upwind branch); shared function
    # objects per (wx, wy) keep equal operators trace-compatible
    def mv(params, x):
        return convdiff2d_matvec(x, wx, wy)

    def rmv(params, x):
        # A^T is the same stencil with the convection reversed (the
        # upwind coefficients swap west<->east and south<->north)
        return convdiff2d_matvec(x, -wx, -wy)

    return mv, rmv


def convdiff2d_operator(n, wx=20.0, wy=10.0, dtype=jnp.float32):
    """Matrix-free LinearOperator (with exact transpose) on n² unknowns."""
    from ..ops.base import LinearOperator

    mv, rmv = _convdiff_mv_factory(float(wx), float(wy))
    return LinearOperator(n * n, n * n, matvec=mv, matvec_transp=rmv,
                          params=(), _takes_params=True,
                          symmetric=False, hermitian=False,
                          dtype=jnp.dtype(dtype))
