"""MatrixMarket I/O tests: writer/reader roundtrips across fields and
symmetries, gzip handling, symmetric expansion, bundled datasets.
"""

import gzip

import numpy as np
import pytest

from pykrylov_tpu.io.matrix_market import (read_matrix_market,
                                           write_matrix_market, mm_to_coo)
from pykrylov_tpu.io.datasets import load_bundled, BUNDLED


def dense_of(vals, rows, cols, shape):
    d = np.zeros(shape, dtype=np.asarray(vals).dtype)
    np.add.at(d, (rows, cols), vals)
    return d


class TestRoundtrip:
    def test_general_real(self, tmp_path, rng):
        m, n, nnz = 20, 15, 60
        rows = rng.integers(0, m, nnz)
        cols = rng.integers(0, n, nnz)
        vals = rng.standard_normal(nnz)
        p = tmp_path / "g.mtx"
        write_matrix_market(p, vals, rows, cols, (m, n),
                            comment="roundtrip\ntest")
        v, r, c, shape, info = read_matrix_market(p)
        assert shape == (m, n) and info.symmetry == "general"
        np.testing.assert_allclose(dense_of(v, r, c, shape),
                                   dense_of(vals, rows, cols, (m, n)))

    def test_symmetric_expansion(self, tmp_path):
        # lower triangle of [[2,-1],[-1,2]]
        p = tmp_path / "s.mtx"
        write_matrix_market(p, [2.0, -1.0, 2.0], [0, 1, 1], [0, 0, 1],
                            (2, 2), symmetry="symmetric")
        v, r, c, shape, info = read_matrix_market(p)
        np.testing.assert_allclose(dense_of(v, r, c, shape),
                                   [[2, -1], [-1, 2]])
        v2, *_ = read_matrix_market(p, expand_symmetric=False)
        assert len(v2) == 3

    def test_skew_symmetric(self, tmp_path):
        p = tmp_path / "k.mtx"
        write_matrix_market(p, [3.0], [1], [0], (2, 2),
                            symmetry="skew-symmetric")
        v, r, c, shape, info = read_matrix_market(p)
        np.testing.assert_allclose(dense_of(v, r, c, shape),
                                   [[0, -3], [3, 0]])

    def test_complex_hermitian(self, tmp_path):
        p = tmp_path / "h.mtx"
        write_matrix_market(p, np.array([2 + 0j, 1 + 2j, 3 + 0j]),
                            [0, 1, 1], [0, 0, 1], (2, 2),
                            symmetry="hermitian")
        v, r, c, shape, info = read_matrix_market(p)
        d = dense_of(v, r, c, shape)
        np.testing.assert_allclose(d, np.array([[2, 1 - 2j], [1 + 2j, 3]]))

    def test_gzip(self, tmp_path, rng):
        p = tmp_path / "g.mtx"
        write_matrix_market(p, [1.5, -2.5], [0, 2], [1, 2], (3, 3))
        gz = tmp_path / "g.mtx.gz"
        gz.write_bytes(gzip.compress(p.read_bytes()))
        v, r, c, shape, info = read_matrix_market(gz)
        np.testing.assert_allclose(sorted(v), [-2.5, 1.5])

    def test_dtype_override(self, tmp_path):
        p = tmp_path / "d.mtx"
        write_matrix_market(p, [1.0], [0], [0], (1, 1))
        v, *_ = read_matrix_market(p, dtype=np.float32)
        assert v.dtype == np.float32


class TestReferenceFiles:
    @pytest.mark.parametrize("name,mtx", [
        ("1138bus", "/root/reference/examples/1138bus.mtx"),
        ("jpwh_991", "/root/reference/examples/jpwh_991.mtx"),
    ])
    def test_bundled_matches_mtx(self, name, mtx):
        import os
        if not os.path.exists(mtx):
            pytest.skip("reference matrices not present")
        vb, rb, cb, sb = load_bundled(name)
        vm, rm, cm, sm = mm_to_coo(mtx)
        assert sb == sm
        np.testing.assert_allclose(dense_of(vb, rb, cb, sb),
                                   dense_of(vm, rm, cm, sm))

    def test_bundled_metadata(self):
        for name, (shape, sym, _) in BUNDLED.items():
            vals, rows, cols, s = load_bundled(name)
            assert s == shape
            d = dense_of(vals, rows, cols, s)
            if sym:
                np.testing.assert_allclose(d, d.T)
