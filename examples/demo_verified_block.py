"""Verified multi-RHS demo (round 4): ``solve(A, B, verified=True)``.

Combines the two flagship capabilities that round 3 could not: the
fused multi-RHS block path AND verified f32 stopping.  Each column of
the (n, K) block rides double-f32 (hi, lo) carries and stops only on
its own recomputed TRUE residual — the f32-on-chip answer to running
the reference's f64 protocol K times.

Runs on any backend (CPU is fine — smaller than the bench sizes).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo root

import numpy as np
import jax.numpy as jnp

from pykrylov_tpu import solve
from pykrylov_tpu.io.datasets import load_bundled
from pykrylov_tpu.sparse import sparse_operator, jacobi_preconditioner


def main(K=4):
    vals, rows, cols, shape = load_bundled("1138bus")
    n = shape[0]
    vals32 = vals.astype(np.float32)
    a64 = np.zeros(shape)
    np.add.at(a64, (rows, cols), vals32.astype(np.float64))
    op = sparse_operator((vals32, rows, cols, shape), symmetric=True,
                         fmt="ell")
    M = jacobi_preconditioner((vals32, rows, cols, shape))

    rng = np.random.default_rng(0)
    B64 = np.stack([a64 @ rng.standard_normal(n) for _ in range(K)],
                   axis=1)
    B = jnp.asarray(B64, jnp.float32)
    B64 = np.asarray(B, np.float64)

    res = solve(op, B, verified=True, M=M, rtol=1e-6, atol=0.0,
                maxiter=30000, replace_every=500)
    X = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    print("verified block solve on 1138bus f32, K=%d:" % K)
    for j in range(K):
        rel = (np.linalg.norm(a64 @ X[:, j] - B64[:, j])
               / np.linalg.norm(B64[:, j]))
        print("  col %d: converged=%-5s iters=%5d replacements=%2d "
              "TRUE relres=%.2e" % (
                  j, bool(res.converged[j]),
                  int(res.info["n_iter_columns"][j]),
                  int(res.info["n_replacements"][j]), rel))


def general(K=3):
    # GENERAL (nonsymmetric) verified blocks: block iterative
    # refinement — every leg is ONE fused bicgstab_batched solve
    rng = np.random.default_rng(1)
    n = 400
    a64 = rng.standard_normal((n, n)) * 0.08 + 4.0 * np.eye(n)
    a32 = a64.astype(np.float32)
    a64 = a32.astype(np.float64)
    op_params = jnp.asarray(a32)
    from pykrylov_tpu.ops import linop_from_ndarray
    op = linop_from_ndarray(op_params)
    B64 = np.stack([a64 @ rng.standard_normal(n) for _ in range(K)],
                   axis=1)
    B = jnp.asarray(B64, jnp.float32)
    B64 = np.asarray(B, np.float64)
    res = solve(op, B, verified=True, rtol=1e-6, atol=0.0, max_legs=20)
    X = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    print("verified GENERAL block solve (nonsymmetric, n=%d, K=%d): "
          "legs=%d" % (n, K, res.info["n_legs"]))
    for j in range(K):
        rel = (np.linalg.norm(a64 @ X[:, j] - B64[:, j])
               / np.linalg.norm(B64[:, j]))
        print("  col %d: converged=%-5s TRUE relres=%.2e"
              % (j, bool(res.converged[j]), rel))


if __name__ == "__main__":
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
    general()
