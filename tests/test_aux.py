"""Auxiliary-subsystem tests: checkpoint/resume, observability, tools alias."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pykrylov_tpu.solvers import cg
from pykrylov_tpu.gallery import poisson1d_operator
from pykrylov_tpu.utils import (checkpointed_solve, save_result, load_result,
                                solve_stats, assert_replicated)


class TestCheckpointedSolve:
    def test_chunked_converges_and_resumes(self, tmp_path):
        op = poisson1d_operator(200, dtype=jnp.float64)
        e = jnp.ones(200, dtype=jnp.float64)
        b = op * e
        path = str(tmp_path / "ck.npz")
        calls = []
        res = checkpointed_solve(cg, op, b, path, chunk_iters=25,
                                 keep_going=lambda c, r: calls.append(c)
                                 or True, rtol=1e-10)
        assert bool(res.converged)
        # Stopping threshold = max(cg's default atol 1e-8, rtol*resid0),
        # identical to a non-chunked cg call with the same kwargs.
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-5)
        assert len(calls) >= 1  # took multiple chunks
        assert res.info["total_matvec"] >= int(res.n_matvec)

        # Resume from the checkpoint: converged state → finishes in one
        # cheap chunk (warm start at the solution).
        res2 = checkpointed_solve(cg, op, b, path, chunk_iters=25,
                                  rtol=1e-10)
        assert bool(res2.converged)
        assert int(res2.n_iter) <= 2

    def test_save_load_roundtrip(self, tmp_path):
        op = poisson1d_operator(50, dtype=jnp.float64)
        b = op * jnp.ones(50, dtype=jnp.float64)
        res = cg(op, b, rtol=1e-8, store_history=True)
        path = str(tmp_path / "r.npz")
        save_result(path, res, extra={"tag": 7})
        z = load_result(path)
        np.testing.assert_array_equal(z["x"], np.asarray(res.x))
        assert int(z["extra_tag"]) == 7
        assert "resid_history" in z
        assert load_result(str(tmp_path / "missing.npz")) is None


def test_solve_stats():
    op = poisson1d_operator(60, dtype=jnp.float64)
    b = op * jnp.ones(60, dtype=jnp.float64)
    res = cg(op, b, rtol=1e-8)
    s = solve_stats(res, wall_time=0.5)
    assert s["converged"] and s["n_iter"] > 0
    assert s["iter_per_s"] == pytest.approx(s["n_iter"] / 0.5)


def test_assert_replicated():
    from pykrylov_tpu.parallel import make_mesh, replicate, shard_vector
    mesh = make_mesh(8)
    x = replicate(jnp.arange(16, dtype=jnp.float64), mesh)
    v = assert_replicated(x)
    np.testing.assert_array_equal(v, np.arange(16.0))
    # A row-sharded array is NOT replicated: shards differ.
    y = shard_vector(jnp.arange(16, dtype=jnp.float64), mesh)
    with pytest.raises(AssertionError):
        assert_replicated(y)


def test_tools_alias():
    from pykrylov_tpu.tools import (machine_epsilon, check_symmetric,
                                    allowed_types)
    assert machine_epsilon(np.float64) == np.finfo(np.float64).eps
    from pykrylov_tpu.gallery import poisson1d_operator as p
    assert check_symmetric(p(32, dtype=jnp.float64))
    assert np.float64 in allowed_types
