"""Verified iterative refinement demo (`solvers/refine.py`).

The reference runs f64 NumPy, where unverified recurrences drift
invisibly at its tolerances; on TPU the native dtype is f32, where an
unverified stopping test can be off by orders of magnitude.  This demo
shows the family-wide answer:

1. ``solve(A, b, verified=True)`` — front-door verified solve (CG legs
   for SPD operators);
2. ``refined_solve(minres, ...)`` — verified MINRES legs on a symmetric
   INDEFINITE system (where CG does not apply);
3. honest floor reporting: asking for a tolerance below the f32
   refinement floor returns istop 3, not a false claim.

Runs on any backend (CPU here is fine — refinement is solver-level).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo root

import numpy as np
import jax.numpy as jnp

from pykrylov_tpu import solve
from pykrylov_tpu.io.datasets import load_bundled
from pykrylov_tpu.sparse import sparse_operator
from pykrylov_tpu.solvers import minres, refined_solve


def spd_front_door():
    vals, rows, cols, shape = load_bundled("1138bus")
    a64 = np.zeros(shape)
    np.add.at(a64, (rows, cols), vals.astype(np.float32).astype(np.float64))
    op = sparse_operator((vals.astype(np.float32), rows, cols, shape),
                         symmetric=True, fmt="ell")
    b64 = a64 @ np.ones(shape[0])
    res = solve(op, jnp.asarray(b64, jnp.float32), verified=True,
                rtol=1e-6)
    x = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    rel = np.linalg.norm(a64 @ x - b64) / np.linalg.norm(b64)
    print("[spd] solve(verified=True) on 1138bus f32: converged=%s "
          "legs=%d TRUE relres=%.2e (reference f64 protocol: rtol 1e-6)"
          % (bool(res.converged), res.info["n_legs"], rel))


def indefinite_minres():
    n, nneg = 400, 12
    a = (np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1)
         + np.diag(np.full(n - 1, -1.0), -1))
    eig = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    a -= 0.5 * (eig[nneg - 1] + eig[nneg]) * np.eye(n)
    rng = np.random.default_rng(0)
    b64 = a @ rng.standard_normal(n)
    res = refined_solve(minres, jnp.asarray(a, jnp.float32),
                        jnp.asarray(b64, jnp.float32), rtol=1e-6,
                        leg_maxiter=400)
    x = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    rel = np.linalg.norm(a @ x - b64) / np.linalg.norm(b64)
    print("[indefinite] refined MINRES (%d negative eigenvalues): "
          "converged=%s legs=%d TRUE relres=%.2e"
          % (nneg, bool(res.converged), res.info["n_legs"], rel))

def minres_floor():
    # kappa~1e7 flagship honesty case.  Plain f32 MINRES at rtol 1e-8
    # "converges" with a TRUE residual of 2.5e-3 here; round 2's
    # refined path floored at ~1e-4.  With the restart-free ff-MINRES
    # legs (round 3+) the same system converges VERIFIED at rtol 1e-6 —
    # and when a target genuinely is unreachable, the wrapper reports
    # istop 1 (budget) or istop 3 (precision floor), never a claim.
    from pykrylov_tpu.ops import DiagonalOperator
    vals, rows, cols, shape = load_bundled("1138bus")
    a64 = np.zeros(shape)
    np.add.at(a64, (rows, cols), vals.astype(np.float32).astype(np.float64))
    op = sparse_operator((vals.astype(np.float32), rows, cols, shape),
                         symmetric=True, fmt="ell")
    d = np.zeros(shape[0], np.float32)
    dm = rows == cols
    d[rows[dm]] = vals[dm].astype(np.float32)
    M = DiagonalOperator(jnp.asarray(1.0 / np.maximum(np.abs(d), 1.0),
                                     jnp.float32))
    b64 = a64 @ np.ones(shape[0])
    res = refined_solve(minres, op, jnp.asarray(b64, jnp.float32),
                        rtol=1e-6, M=M, leg_rtol=1e-2, max_legs=12,
                        leg_maxiter=1200)
    x = (np.asarray(res.x, np.float64)
         + np.asarray(res.info["x_lo"], np.float64))
    rel = np.linalg.norm(a64 @ x - b64) / np.linalg.norm(b64)
    print("[hard] refined ff-MINRES on 1138bus (kappa~1e7) at rtol "
          "1e-6: converged=%s istop=%d legs=%d TRUE relres=%.2e "
          "(plain f32 claims 1e-8 while truly at 2.5e-3; unreachable "
          "targets report istop 1/3 honestly)"
          % (bool(res.converged), int(res.istop), res.info["n_legs"],
             rel))


if __name__ == "__main__":
    spd_front_door()
    indefinite_minres()
    minres_floor()
