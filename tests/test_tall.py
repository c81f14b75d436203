"""Row-sharded rectangular operators (`parallel/tall.py`) on the
virtual 8-device CPU mesh: sharded LSQR/LSMR with replicated n-side
vectors and one psum per transpose product."""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.parallel import (make_mesh, shard_vector,
                                   TallSkinnyOperator)
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.solvers.lsqr import lsqr
from pykrylov_tpu.solvers.lsmr import lsmr


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _tall_dense(m=200, n=17, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    return a, b


def test_dense_products_match_oracle(mesh):
    a, _ = _tall_dense(101, 13, 1)   # m does not divide the mesh
    op = TallSkinnyOperator(a, mesh)
    assert op.pad == 3
    rng = np.random.default_rng(2)
    x = rng.standard_normal(13)
    y = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(y[:101], a @ x, rtol=1e-12)
    assert np.all(y[101:] == 0)
    u = np.zeros(op.nargout)
    u[:101] = rng.standard_normal(101)
    us = shard_vector(jnp.asarray(u), mesh)
    np.testing.assert_allclose(np.asarray(op.T @ us), a.T @ u[:101],
                               rtol=1e-12)


def test_lsqr_sharded_dense_matches_lstsq(mesh):
    a, b = _tall_dense()
    op = TallSkinnyOperator(a, mesh)
    bp = np.zeros(op.nargout)
    bp[:len(b)] = b
    bs = shard_vector(jnp.asarray(bp), mesh)
    res = lsqr(op, bs, atol=1e-12, btol=1e-12)
    x_ref = np.linalg.lstsq(a, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8,
                               atol=1e-10)


def test_lsqr_sharded_damped(mesh):
    a, b = _tall_dense(150, 11, 3)
    damp = 0.7
    op = TallSkinnyOperator(a, mesh)
    bp = np.zeros(op.nargout)
    bp[:len(b)] = b
    bs = shard_vector(jnp.asarray(bp), mesh)
    res = lsqr(op, bs, damp=damp, atol=1e-12, btol=1e-12)
    aug = np.vstack([a, damp * np.eye(11)])
    x_ref = np.linalg.lstsq(aug, np.r_[b, np.zeros(11)], rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8,
                               atol=1e-10)


def test_lsmr_sharded_sparse_ell(mesh):
    rng = np.random.default_rng(4)
    m, n, nnz = 500, 23, 3000
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    rows, cols, vals = rows[first], cols[first], vals[first]
    a = np.zeros((m, n))
    a[rows, cols] = vals
    coo = F.coo_from_arrays(vals, rows, cols, (m, n), device=False)
    op = TallSkinnyOperator(coo, mesh)
    b = rng.standard_normal(m)
    bp = np.zeros(op.nargout)
    bp[:m] = b
    bs = shard_vector(jnp.asarray(bp), mesh)
    res = lsmr(op, bs, atol=1e-12, btol=1e-12)
    x_ref = np.linalg.lstsq(a, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7,
                               atol=1e-9)


def test_tall_block_product_matches_columns():
    # matmat protocol on the sharded rectangular operators (round 3):
    # one shard_map block product == per-column matvecs
    import numpy as np
    import jax.numpy as jnp
    from pykrylov_tpu.parallel import make_mesh
    from pykrylov_tpu.parallel.tall import TallSkinnyOperator
    from pykrylov_tpu.sparse import formats as F

    mesh = make_mesh(4)
    rng = np.random.default_rng(3)
    m, n, K = 37, 9, 3
    a = rng.standard_normal((m, n)).astype(np.float64)
    for src in (a, F.ell_from_coo(
            F.coo_from_arrays(a[np.nonzero(a)],
                              np.nonzero(a)[0], np.nonzero(a)[1],
                              (m, n), device=False), device=False)):
        op = TallSkinnyOperator(src, mesh)
        assert op._mm is not None and op._rmm is not None
        X = rng.standard_normal((n, K))
        Y = np.asarray(op @ jnp.asarray(X))
        cols = np.stack([np.asarray(op @ jnp.asarray(X[:, j]))
                         for j in range(K)], axis=1)
        np.testing.assert_allclose(Y, cols, rtol=1e-12, atol=1e-12)
        U = rng.standard_normal((op.nargout, K))
        YT = np.asarray(op.T @ jnp.asarray(U))
        colsT = np.stack([np.asarray(op.T @ jnp.asarray(U[:, j]))
                          for j in range(K)], axis=1)
        np.testing.assert_allclose(YT, colsT, rtol=1e-12, atol=1e-12)


def test_halo_block_product_matches_columns():
    import numpy as np
    import jax.numpy as jnp
    from pykrylov_tpu.parallel import make_mesh
    from pykrylov_tpu.parallel.halo import HaloDiaOperator
    from pykrylov_tpu.sparse import formats as F
    from pykrylov_tpu.gallery.poisson import poisson2d_coo

    mesh = make_mesh(4)
    vals, rows, cols, shape = poisson2d_coo(9)
    dia = F.dia_from_coo(F.coo_from_arrays(
        vals, rows, cols, shape, device=False), device=False)
    op = HaloDiaOperator(dia, mesh)
    assert op._mm is not None
    rng = np.random.default_rng(5)
    X = rng.standard_normal((op.nargin, 3))
    Y = np.asarray(op @ jnp.asarray(X))
    colsv = np.stack([np.asarray(op @ jnp.asarray(X[:, j]))
                      for j in range(3)], axis=1)
    np.testing.assert_allclose(Y, colsv, rtol=1e-12, atol=1e-12)
