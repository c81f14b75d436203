"""Checkpoint / resume for long solves.

The reference has no checkpointing; its closest feature is warm restart via
``guess`` (SURVEY §5: ``cg/cg.py:77``, ``bicgstab.py:58``, ...).  Because
this build's solvers are pure functions whose state is an explicit carry,
checkpointing falls out naturally: run the solve in bounded chunks, save
the result pytree after each chunk, and resume by warm-starting from the
saved iterate.  Mathematically this is a solver *restart* at each chunk
boundary (short-recurrence methods lose at most a few iterations of
superlinearity; for CG on SPD systems restarting is standard practice).

No orbax dependency: checkpoints are plain ``.npz`` files of the result
pytree, portable across hosts and device counts (arrays are gathered to
host; on resume they are resharded by the operator's own layout).
"""

from __future__ import annotations

import os
import tempfile
import time

import numpy as np
import jax.numpy as jnp

__all__ = ["save_result", "load_result", "checkpointed_solve"]


def save_result(path, result, extra=None):
    """Persist a :class:`SolveResult`'s arrays + scalars to ``.npz``
    (atomic: write to a temp file, then rename)."""
    payload = {
        "x": np.asarray(result.x),
        "converged": np.asarray(result.converged),
        "istop": np.asarray(result.istop),
        "n_iter": np.asarray(result.n_iter),
        "n_matvec": np.asarray(result.n_matvec),
        "resid_norm": np.asarray(result.resid_norm),
        "resid_norm0": np.asarray(result.resid_norm0),
    }
    if result.resid_history is not None:
        payload["resid_history"] = np.asarray(result.resid_history)
    if extra:
        for k, v in extra.items():
            payload["extra_" + k] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_result(path):
    """Load a checkpoint as a dict of NumPy arrays (or None if absent)."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def checkpointed_solve(solve_fn, A, b, path, chunk_iters=500,
                       max_chunks=1000, keep_going=None, **solve_kwargs):
    """Run ``solve_fn(A, b, ...)`` in bounded chunks with checkpointing.

    Parameters
    ----------
    solve_fn : a functional solver accepting ``x0`` and an iteration cap
        (``maxiter`` or ``matvec_max`` — passed via ``chunk_kw`` detection).
    path : checkpoint file; if it exists the solve resumes from it.
    chunk_iters : iteration budget per chunk.
    keep_going : optional callback ``(chunk_index, result) -> bool``;
        return False to stop early (e.g. external preemption signal).

    Returns the final :class:`SolveResult` (with cumulative ``n_matvec``
    across chunks in ``info['total_matvec']``).
    """
    state = load_result(path)
    x0 = solve_kwargs.pop("x0", None)
    total_mv = 0
    if state is not None:
        x0 = jnp.asarray(state["x"])
        total_mv = int(state.get("extra_total_matvec", 0))

    import inspect
    params = inspect.signature(solve_fn).parameters
    cap_kw = "maxiter" if "maxiter" in params else "matvec_max"
    # A restarted chunk would re-derive its relative threshold from the
    # warm-start residual, silently loosening the overall stopping rule.
    # Freeze the absolute threshold max(atol, rtol*resid0) after the first
    # chunk instead (resumed runs inherit it from the checkpoint).
    can_freeze = "rtol" in params and "atol" in params
    if can_freeze:
        # Resolve solver defaults so the freeze below also happens when the
        # caller relied on default tolerances — otherwise every chunk would
        # re-derive its relative threshold from its own warm start and the
        # overall stopping rule silently loosens.
        solve_kwargs.setdefault("rtol", params["rtol"].default)
        solve_kwargs.setdefault("atol", params["atol"].default)
    if state is not None and can_freeze \
            and "extra_abs_threshold" in state:
        solve_kwargs["atol"] = float(state["extra_abs_threshold"])
        solve_kwargs["rtol"] = 0.0
    abs_threshold = solve_kwargs.get("atol", 0.0)

    res = None
    for chunk in range(max_chunks):
        t0 = time.perf_counter()
        res = solve_fn(A, b, x0=x0, **{cap_kw: chunk_iters},
                       **solve_kwargs)
        total_mv += int(res.n_matvec)
        if chunk == 0 and can_freeze and solve_kwargs.get("rtol", 0.0):
            abs_threshold = max(
                solve_kwargs.get("atol", 0.0),
                solve_kwargs["rtol"] * float(res.resid_norm0))
            solve_kwargs["atol"] = abs_threshold
            solve_kwargs["rtol"] = 0.0
        save_result(path, res, extra={"total_matvec": total_mv,
                                      "chunk": chunk,
                                      "abs_threshold": abs_threshold,
                                      "chunk_time": time.perf_counter() - t0})
        if bool(res.converged):
            break
        if keep_going is not None and not keep_going(chunk, res):
            break
        x0 = res.x
    res.info["total_matvec"] = total_mv
    return res
