"""Pallas DIA kernel tests (interpreter mode on the CPU backend).

Validates the (rows, 128) tiled layout, the static row-shift + lane-roll
shift decomposition, padding semantics, the host-side DIA transpose, and
the packed kernel-backed operator inside full solver loops.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.gallery import poisson1d_coo, poisson3d_coo
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.kernels import (dia_matvec_pallas, dia_transpose,
                                         ensure_dia_padded,
                                         pallas_dia_operator)
from pykrylov_tpu.solvers import cg


def dia_of(coo_args):
    vals, rows, cols, shape = coo_args
    return F.dia_from_coo(F.coo_from_arrays(vals, rows, cols, shape)), shape


@pytest.mark.parametrize("coo_args,blk", [
    (poisson1d_coo(1000), 256),       # offsets (-1, 0, 1): pure lane rolls
    (poisson3d_coo(9), 384),          # offsets ±1, ±9, ±81: mixed shifts
    (poisson3d_coo(12), 1024),        # block > bandwidth comfortably
])
def test_matches_dense(coo_args, blk, rng):
    dia, shape = dia_of(coo_args)
    dia_p, pad = ensure_dia_padded(dia, block=blk)
    m = dia_p.shape[0]
    x = np.zeros(m)
    x[:shape[0]] = rng.standard_normal(shape[0])
    y = np.asarray(dia_matvec_pallas(dia_p, jnp.asarray(x), block=blk,
                                     interpret=True))
    A = np.asarray(F.to_dense(dia))
    np.testing.assert_allclose(y[:shape[0]], A @ x[:shape[0]], atol=1e-11)
    np.testing.assert_allclose(y[shape[0]:], 0.0)


def test_guards():
    dia, _ = dia_of(poisson1d_coo(100))
    with pytest.raises(ValueError, match="not a multiple"):
        dia_matvec_pallas(dia, jnp.zeros(100), block=256)
    dia_p, _ = ensure_dia_padded(dia, block=256)
    with pytest.raises(ValueError, match="multiple of 128"):
        dia_matvec_pallas(dia_p, jnp.zeros(256), block=100)


def test_dia_transpose_matches_dense(rng):
    # Unsymmetric banded matrix: random values on offsets {-3, 0, 2, 5}.
    m = 40
    offs = (-3, 0, 2, 5)
    data = rng.standard_normal((len(offs), m))
    # zero out-of-range slots as dia_from_coo would
    for k, off in enumerate(offs):
        for i in range(m):
            if not (0 <= i + off < m):
                data[k, i] = 0.0
    dia = F.DIA(jnp.asarray(data), offs, (m, m))
    diat = dia_transpose(dia)
    np.testing.assert_allclose(np.asarray(F.to_dense(diat)),
                               np.asarray(F.to_dense(dia)).T, atol=1e-14)


def test_pallas_operator_symmetric_solve():
    vals, rows, cols, shape = poisson3d_coo(10)
    dia = F.dia_from_coo(F.coo_from_arrays(vals, rows, cols, shape))
    op = pallas_dia_operator(dia, symmetric=True, block=512, interpret=True)
    m0 = shape[0]
    e = np.zeros(op.nargin)
    e[:m0] = 1.0
    b = op * jnp.asarray(e)
    res = cg(op, b, rtol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x)[:m0], 1.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.x)[m0:], 0.0, atol=1e-12)


def test_pallas_operator_transpose(rng):
    m = 30
    offs = (-2, 0, 1)
    data = rng.standard_normal((len(offs), m))
    for k, off in enumerate(offs):
        for i in range(m):
            if not (0 <= i + off < m):
                data[k, i] = 0.0
    dia = F.DIA(jnp.asarray(data), offs, (m, m))
    op = pallas_dia_operator(dia, symmetric=False, block=128,
                             interpret=True)
    A = np.asarray(F.to_dense(dia))
    x = np.zeros(op.nargin)
    x[:m] = rng.standard_normal(m)
    y = np.asarray(op.T * jnp.asarray(x))
    np.testing.assert_allclose(y[:m], A.T @ x[:m], atol=1e-11)


def test_ring_matches_blockspec_path():
    # ring-buffered x (each block DMA'd once) must equal the BlockSpec
    # halo-sliver path bit-for-bit in interpret mode
    import numpy as np
    from pykrylov_tpu.sparse import formats as F
    from pykrylov_tpu.sparse.kernels import (ensure_dia_padded, pack_dia,
                                             dia_matvec_packed)
    from pykrylov_tpu.gallery.poisson import poisson3d_coo
    vals, rows, cols, shape = poisson3d_coo(8, dtype=np.float32)
    dia = F.dia_from_coo(F.COO(vals, rows.astype(np.int32),
                               cols.astype(np.int32), shape),
                         device=False)
    block = 256
    dia, _ = ensure_dia_padded(dia, block)
    d3, offsets = pack_dia(dia, block)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        dia.shape[0]).astype(np.float32))
    y_ring = dia_matvec_packed(d3, offsets, x, block=block,
                               interpret=True, ring=True)
    y_bs = dia_matvec_packed(d3, offsets, x, block=block,
                             interpret=True, ring=False)
    np.testing.assert_array_equal(np.asarray(y_ring), np.asarray(y_bs))


@pytest.mark.parametrize("ring", [True, False])
def test_bf16_diagonal_storage_f32_compute(ring):
    # bf16-stored diagonals (2 B/value stream) with f32 x: exact in the
    # stored matrix up to f32 rounding — variable-coefficient stencil
    import ml_dtypes
    rng_ = np.random.default_rng(17)
    vals, rows, cols, shape = poisson3d_coo(9)
    vals = vals * (1.0 + 0.3 * rng_.standard_normal(len(vals)))
    v16 = np.asarray(vals, dtype=ml_dtypes.bfloat16)
    a16 = np.zeros(shape)
    np.add.at(a16, (rows, cols), v16.astype(np.float64))
    dia = F.dia_from_coo(F.coo_from_arrays(v16, rows, cols, shape),
                         device=False)
    dia_p, pad = ensure_dia_padded(dia, block=384)
    m = dia_p.shape[0]
    assert np.dtype(dia_p.data.dtype) == np.dtype(ml_dtypes.bfloat16)
    x = np.zeros(m)
    x[:shape[0]] = rng_.standard_normal(shape[0])
    y = np.asarray(dia_matvec_pallas(dia_p, jnp.asarray(x, jnp.float32),
                                     block=384, interpret=True,
                                     ring=ring))
    assert y.dtype == np.float32
    ref = a16 @ x[:shape[0]]
    np.testing.assert_allclose(y[:shape[0]], ref, rtol=2e-6, atol=2e-6)


def test_halo_rows_are_mosaic_aligned():
    # Mosaic rejects BlockSpec row counts not divisible by 8 (unless
    # equal to the array dim): a main-diagonal-only matrix (need=1)
    # must take an 8-row halo sliver, not a (1, 128) block (round-4
    # hybrid probe crash)
    from pykrylov_tpu.sparse.kernels import _halo_rows
    for offsets in ([0], [-1, 0, 1], [0, 128], [-4096, 0, 4096]):
        for brows in (512, 1024, 2048):
            h = _halo_rows(offsets, brows)
            assert h % 8 == 0 or h == brows, (offsets, brows, h)
            need = max(1, *(-o // 128 for o in offsets),
                       *((o // 128) + (1 if o % 128 else 0)
                         for o in offsets))
            assert h >= need
