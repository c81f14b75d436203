"""BELL (band-sliced ELL) general-sparsity Pallas kernel tests.

Oracle: dense reconstruction + NumPy matvec.  All Pallas runs use
interpret mode on the CPU backend (conftest); on-chip correctness is
asserted separately by the TPU-marked test in test_tpu_entry paths and
the bench harness.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.bell import (
    BELL, LANES, SpanError, bell_fill, bell_from_coo, bell_matvec_pallas,
    bell_operator, bell_to_dense, reorder_rcm)


def _random_coo(m, n, nnz, seed, bandwidth=None, dtype=np.float64):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, size=nnz)
    if bandwidth is None:
        cols = rng.integers(0, n, size=nnz)
    else:
        cols = np.clip(rows + rng.integers(-bandwidth, bandwidth + 1,
                                           size=nnz), 0, n - 1)
    vals = rng.standard_normal(nnz).astype(dtype)
    # dedupe so dense oracle comparisons don't rely on accumulation order
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    return (F.coo_from_arrays(vals[first], rows[first], cols[first],
                              (m, n), device=False),
            rows[first], cols[first], vals[first])


def _dense(coo):
    a = np.zeros(coo.shape)
    np.add.at(a, (np.asarray(coo.row), np.asarray(coo.col)),
              np.asarray(coo.data))
    return a


@pytest.mark.parametrize("m,n,nnz,bw,seed", [
    (96, 96, 400, None, 0),          # single block, scattered
    (1000, 1000, 8000, 90, 1),       # multi-block, banded — pair windows
    (991, 991, 6027, None, 2),       # jpwh-ish scattered square
    (700, 300, 2500, None, 3),       # rectangular wide-to-narrow
    (300, 700, 2500, None, 4),       # rectangular narrow-to-wide
    (129, 257, 60, None, 5),         # just over block boundaries
])
def test_pack_roundtrip_and_matvec(m, n, nnz, bw, seed):
    coo, *_ = _random_coo(m, n, nnz, seed, bandwidth=bw)
    b = bell_from_coo(coo)
    a = _dense(coo)
    np.testing.assert_allclose(bell_to_dense(b), a, rtol=0, atol=0)

    rng = np.random.default_rng(100 + seed)
    x = rng.standard_normal(b.padded_shape[1])
    y = bell_matvec_pallas(b, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y)[:m], a @ x[:n],
                               rtol=1e-12, atol=1e-12)


def test_duplicate_entries_accumulate():
    rows = np.array([0, 0, 5, 5, 5])
    cols = np.array([3, 3, 7, 7, 7])
    vals = np.array([1.0, 2.0, 1.0, 1.0, 1.0])
    coo = F.coo_from_arrays(vals, rows, cols, (16, 16), device=False)
    b = bell_from_coo(coo)
    d = bell_to_dense(b)
    assert d[0, 3] == 3.0 and d[5, 7] == 3.0


def test_empty_matrix():
    coo = F.coo_from_arrays(np.zeros(0), np.zeros(0, int),
                            np.zeros(0, int), (64, 64), device=False)
    b = bell_from_coo(coo)
    x = np.ones(b.padded_shape[1])
    y = bell_matvec_pallas(b, jnp.asarray(x), interpret=True)
    assert np.all(np.asarray(y) == 0)


def test_fill_reports_true_nnz_fraction():
    coo, *_ = _random_coo(512, 512, 4000, 7)
    b = bell_from_coo(coo)
    assert bell_fill(b) == (b.nnz - b.nnz_spill) / b.data.size
    assert 0 < bell_fill(b) <= 1
    assert 0 <= b.nnz_spill < b.nnz
    # disabling the spill stores every entry in a slot
    b0 = bell_from_coo(coo, spill_cost=None)
    assert b0.nnz_spill == 0 and b0.sp_val.shape[0] == 0


def test_spill_matvec_exact():
    # heavy-tailed row degrees force a large spill fraction; the
    # kernel+remainder split must still reproduce the dense product.
    rng = np.random.default_rng(31)
    rows = np.repeat(np.arange(600), rng.integers(1, 40, size=600))
    cols = rng.integers(0, 600, size=len(rows))
    key = rows * 600 + cols
    _, first = np.unique(key, return_index=True)
    rows, cols = rows[first], cols[first]
    vals = rng.standard_normal(len(rows))
    coo = F.coo_from_arrays(vals, rows, cols, (600, 600), device=False)
    b = bell_from_coo(coo)
    assert b.nnz_spill > 0
    a = _dense(coo)
    np.testing.assert_allclose(bell_to_dense(b), a, rtol=0, atol=0)
    x = rng.standard_normal(b.padded_shape[1])
    y = bell_matvec_pallas(b, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y)[:600], a @ x[:600],
                               rtol=1e-12, atol=1e-12)


def test_pair_windows_beat_single_bands():
    # rows straddling two adjacent bands: pair windows should give a
    # much denser packing than one sublane row per band would.
    coo, *_ = _random_coo(2048, 2048, 30000, 11, bandwidth=128)
    b = bell_from_coo(coo)
    assert bell_fill(b) > 0.25


def test_span_error_and_rcm_rescue():
    # block-diagonal-after-permutation matrix scattered across the full
    # column range: raw span blows the window budget at nb_max=16,
    # RCM reordering brings it back.
    n = 4096
    rng = np.random.default_rng(13)
    perm = rng.permutation(n)
    rows, cols, vals = [], [], []
    for blk in range(0, n, 64):
        rr = rng.integers(blk, blk + 64, size=300)
        cc = rng.integers(blk, blk + 64, size=300)
        rows.append(perm[rr]); cols.append(perm[cc])
        vals.append(rng.standard_normal(300))
    rows = np.concatenate(rows); cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    coo = F.coo_from_arrays(vals, rows, cols, (n, n), device=False)
    with pytest.raises(SpanError):
        bell_from_coo(coo, nb_max=16, spill_cost=None)
    rcoo, p = reorder_rcm(coo)
    b = bell_from_coo(rcoo, nb_max=16, spill_cost=None)
    # A'[i,j] = A[p[i], p[j]]
    a = _dense(coo)
    np.testing.assert_allclose(bell_to_dense(b), a[np.ix_(p, p)],
                               rtol=0, atol=0)


def test_operator_forward_and_transpose():
    coo, *_ = _random_coo(500, 300, 3000, 17)
    op = bell_operator(coo)
    a = _dense(coo)
    rng = np.random.default_rng(18)
    x = rng.standard_normal(300)
    y = rng.standard_normal(500)
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)), a @ x,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.T @ jnp.asarray(y)), a.T @ y,
                               rtol=1e-12, atol=1e-12)
    assert op.shape == (500, 300)


def test_operator_symmetric():
    coo, *_ = _random_coo(256, 256, 2000, 19)
    a = _dense(coo)
    a = a + a.T
    op = bell_operator(a, symmetric=True)
    x = np.random.default_rng(20).standard_normal(256)
    np.testing.assert_allclose(np.asarray(op.T @ jnp.asarray(x)),
                               np.asarray(op @ jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)), a @ x,
                               rtol=1e-12, atol=1e-12)


def test_operator_in_solver():
    # CG on a BELL-wrapped SPD matrix reaches the tolerance.
    from pykrylov_tpu.solvers.cg import cg
    n = 384
    rng = np.random.default_rng(23)
    a = np.zeros((n, n))
    for off in (-3, -1, 0, 1, 3):
        d = rng.standard_normal(n - abs(off)) * 0.1
        a += np.diag(d, off)
    a = a @ a.T + np.eye(n) * 4
    op = bell_operator(a, symmetric=True)
    b = rng.standard_normal(n)
    res = cg(op, jnp.asarray(b), rtol=1e-10, atol=0.0, maxiter=4 * n)
    x = np.asarray(res.x)
    assert np.linalg.norm(a @ x - b) <= 1e-8 * np.linalg.norm(b)


def test_bundled_jpwh_matches_scipy():
    from pykrylov_tpu.io.datasets import load_bundled
    vals, rows, cols, shape = load_bundled("jpwh_991")
    coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
    b = bell_from_coo(coo)
    a = _dense(coo)
    np.testing.assert_allclose(bell_to_dense(b), a, rtol=0, atol=0)
    x = np.random.default_rng(29).standard_normal(b.padded_shape[1])
    y = bell_matvec_pallas(b, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y)[:shape[0]],
                               a @ x[:shape[1]], rtol=1e-12, atol=1e-10)


def test_operator_from_coo_bell_fmt():
    from pykrylov_tpu.sparse.linop import operator_from_coo, _try_bell
    coo, rows, cols, vals = _random_coo(1024, 1024, 9000, 41, bandwidth=100)
    a = _dense(coo)
    x = np.random.default_rng(42).standard_normal(1024)
    for fmt in ("bell", "bell-rcm"):
        op = operator_from_coo(np.asarray(coo.data), np.asarray(coo.row),
                               np.asarray(coo.col), coo.shape, fmt=fmt)
        np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)), a @ x,
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(op.T @ jnp.asarray(x)),
                                   a.T @ x, rtol=1e-10, atol=1e-10)


def test_try_bell_policy():
    from pykrylov_tpu.sparse.linop import _try_bell
    # banded: qualifies
    coo, *_ = _random_coo(2048, 2048, 20000, 43, bandwidth=120)
    op = _try_bell(coo, symmetric=False)
    assert op is not None and op.spill_frac <= 0.35
    a = _dense(coo)
    x = np.random.default_rng(44).standard_normal(2048)
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)), a @ x,
                               rtol=1e-10, atol=1e-10)
    # uniform random scatter at ~2 nnz/row: packs far above the density
    # budget (slots/nnz in the tens), but the COST-BASED escape accepts
    # it — the predicted kernel time still beats the 24 ns/nnz XLA ELL
    # estimate by far, and the padding is a few MB (VERDICT r3: change
    # the format policy, not the kernel)
    coo2, *_ = _random_coo(4096, 4096, 8192, 45)
    op2 = _try_bell(coo2, symmetric=False)
    assert op2 is not None
    a2 = _dense(coo2)
    x2 = np.random.default_rng(46).standard_normal(4096)
    np.testing.assert_allclose(np.asarray(op2 @ jnp.asarray(x2)), a2 @ x2,
                               rtol=1e-9, atol=1e-9)
    # ... unless the absolute padding budget says no
    assert _try_bell(coo2, symmetric=False, max_pad_bytes=1 << 16) is None
    # ... or the predicted speedup over ELL is too thin
    assert _try_bell(coo2, symmetric=False,
                     min_speedup_vs_ell=1e9) is None


def test_try_bell_cost_based_accepts_power_law():
    # heavy-tailed (power-law) row degrees with banded locality: plans
    # around ~10-30 slots/nnz — over the density budget, far under the
    # ELL cost — and must now ride the kernel instead of falling to the
    # 625x-slower XLA path
    from pykrylov_tpu.sparse.linop import _try_bell
    rng = np.random.default_rng(5)
    n = 8192
    deg = np.clip((rng.pareto(2.0, n) + 1).astype(int) * 3, 3, 200)
    rows = np.repeat(np.arange(n), deg)
    base = rows + rng.integers(-300, 301, rows.shape)
    far = rng.random(rows.shape) < 0.05
    cols = np.where(far, rng.integers(0, n, rows.shape), base) % n
    vals = rng.standard_normal(rows.shape)
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    coo = F.coo_from_arrays(vals[first], rows[first], cols[first], (n, n),
                            device=False)
    op = _try_bell(coo, symmetric=False)
    assert op is not None
    a = _dense(coo)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)), a @ x,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(op.T @ jnp.asarray(x)), a.T @ x,
                               rtol=1e-9, atol=1e-9)


def test_mixed_bell_fwd_ell_bwd():
    # heavy-tailed COLUMN degrees: forward packs well, transpose does
    # not — the policy should emit a mixed operator (BELL forward,
    # XLA-ELL transpose) with both directions exact
    from pykrylov_tpu.sparse.linop import _try_bell, _bell_fwd_ell_bwd
    rng = np.random.default_rng(71)
    n = 8192
    rows = np.repeat(np.arange(n), 6)
    cols = np.clip(rows + rng.integers(-900, 901, size=len(rows)), 0, n - 1)
    # pile extra entries onto a few hot columns (heavy col degrees)
    hot = rng.integers(0, n, size=40)
    hr = rng.integers(0, n, size=4000)
    hc = hot[rng.integers(0, len(hot), size=4000)]
    rows = np.concatenate([rows, hr])
    cols = np.concatenate([cols, np.clip(hc, rows[len(rows)-4000:]*0
                                         + hc, n - 1)])
    vals = rng.standard_normal(len(rows))
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    rows, cols, vals = rows[first], cols[first], vals[first]
    coo = F.coo_from_arrays(vals, rows, cols, (n, n), device=False)
    op = _try_bell(coo, symmetric=False)
    assert op is not None
    a = _dense(coo)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)), a @ x,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(op.T @ jnp.asarray(x)), a.T @ x,
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("m,n,nnz,bw,seed", [
    (96, 96, 400, None, 0),
    (1000, 1000, 8000, 90, 1),
    (700, 300, 2500, None, 3),
    (129, 257, 60, None, 5),
])
def test_window1_roundtrip_and_matvec(m, n, nnz, bw, seed):
    # v3 layout: single-band windows, 8-aligned block depths, grouped
    # scatter (one block id per 8-row group)
    coo, *_ = _random_coo(m, n, nnz, seed, bandwidth=bw)
    b = bell_from_coo(coo, window=1)
    assert b.window == 1
    assert b.blocks.shape[2] == b.data.shape[1] // 4
    a = _dense(coo)
    np.testing.assert_allclose(bell_to_dense(b), a, rtol=0, atol=0)
    rng = np.random.default_rng(200 + seed)
    x = rng.standard_normal(b.padded_shape[1])
    y = bell_matvec_pallas(b, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(y)[:m], a @ x[:n],
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("stage", ["bf16", "bf16s", "int8", "f32"])
def test_window1_stage_modes_exact_f32(stage):
    # every staging mode is an EXACT f32 transport (one-hot selects):
    # bf16 Veltkamp splits are error-free, int8 moves raw bit planes,
    # f32 uses Precision.HIGHEST
    coo, *_ = _random_coo(500, 500, 4000, 21)
    coo = F.COO(np.asarray(coo.data, np.float32), coo.row, coo.col,
                coo.shape)
    a = _dense(coo).astype(np.float32)
    rng = np.random.default_rng(22)
    for window in (1, 2):
        b = bell_from_coo(coo, window=window)
        x = rng.standard_normal(b.padded_shape[1]).astype(np.float32)
        y = bell_matvec_pallas(b, jnp.asarray(x), interpret=True,
                               stage=stage)
        ref = a.astype(np.float64) @ x[:500].astype(np.float64)
        err = np.abs(np.asarray(y)[:500] - ref.astype(np.float32)).max()
        assert err <= 2e-6 * max(1.0, np.abs(ref).max()), (window, err)


def test_window_auto_picks_by_cost_model():
    from pykrylov_tpu.sparse.bell import _SLOT_COST_PS, _pack_levels

    coo, *_ = _random_coo(2048, 2048, 30000, 11, bandwidth=128)
    lv_auto = _pack_levels(coo, 1024, 12.0, 2, device=False,
                           window="auto")
    lv1 = _pack_levels(coo, 1024, 12.0, 2, device=False, window=1)
    lv2 = _pack_levels(coo, 1024, 12.0, 2, device=False, window=2)

    def cost(lv):
        return sum(b.data.size * _SLOT_COST_PS[b.window] for b in lv)

    assert cost(lv_auto) == min(cost(lv1), cost(lv2))


def test_window1_spill_and_operator():
    coo, r, c, v = _random_coo(1500, 1500, 12000, 31)
    a = _dense(coo)
    op = bell_operator(coo, window=1, spill_cost=12.0, levels=1,
                       interpret=True)
    rng = np.random.default_rng(32)
    x = rng.standard_normal(1500)
    np.testing.assert_allclose(np.asarray(op @ x), a @ x, rtol=1e-10,
                               atol=1e-10)
    y = rng.standard_normal(1500)
    np.testing.assert_allclose(np.asarray(op.T @ y), a.T @ y, rtol=1e-10,
                               atol=1e-10)


@pytest.mark.parametrize("window", [1, 2])
def test_idx_fmt_int8_matches_packed(window):
    coo, rows, cols, vals = _random_coo(500, 500, 3000, 21, bandwidth=90)
    a = _dense(coo)
    x = np.random.default_rng(1).standard_normal(500)
    bp = bell_from_coo(coo, spill_cost=None, window=window)
    b8 = bell_from_coo(coo, spill_cost=None, window=window,
                       idx_fmt="int8")
    assert b8.lanes.dtype == jnp.uint8
    assert b8.lanes.shape == b8.data.shape
    # host oracle agrees for both layouts
    np.testing.assert_allclose(bell_to_dense(b8), a, rtol=1e-13)
    xp = jnp.zeros(b8.padded_shape[1]).at[:500].set(jnp.asarray(x))
    yp = np.asarray(bell_matvec_pallas(bp, xp, interpret=True))[:500]
    y8 = np.asarray(bell_matvec_pallas(b8, xp, interpret=True))[:500]
    np.testing.assert_allclose(y8, a @ x, rtol=1e-10)
    np.testing.assert_array_equal(y8, yp)  # same arithmetic, same result


def test_bell_with_idx_fmt_roundtrip():
    from pykrylov_tpu.sparse.bell import bell_with_idx_fmt
    coo, *_ = _random_coo(300, 300, 1500, 22, bandwidth=70)
    b = bell_from_coo(coo, spill_cost=None, window=1, device=False)
    b8 = bell_with_idx_fmt(b, "int8")
    bp = bell_with_idx_fmt(b8, "packed")
    np.testing.assert_array_equal(np.asarray(bp.lanes),
                                  np.asarray(b.lanes))
    np.testing.assert_allclose(bell_to_dense(b8), bell_to_dense(b),
                               rtol=0, atol=0)


def test_operator_idx_fmt_int8():
    coo, rows, cols, vals = _random_coo(400, 400, 2400, 23, bandwidth=80)
    a = _dense(coo)
    op = bell_operator(coo, interpret=True, idx_fmt="int8")
    x = np.random.default_rng(2).standard_normal(400)
    y = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(y, a @ x, rtol=1e-10)
    yt = np.asarray(op.T @ jnp.asarray(x))
    np.testing.assert_allclose(yt, a.T @ x, rtol=1e-10)


def test_bf16_storage_f32_compute():
    # bf16-stored values (2 B/slot stream), f32 x and accumulation: the
    # matvec must be EXACT in the stored (bf16-rounded) matrix up to
    # f32 product/reduction rounding
    import ml_dtypes
    coo, rows, cols, vals = _random_coo(400, 400, 2500, 31, bandwidth=80)
    v16 = np.asarray(vals, dtype=ml_dtypes.bfloat16)
    a16 = np.zeros((400, 400))
    np.add.at(a16, (rows, cols), v16.astype(np.float64))
    c16 = F.coo_from_arrays(v16, rows, cols, (400, 400), device=False)
    for window in (1, 2):
        b = bell_from_coo(c16, spill_cost=None, window=window)
        assert np.dtype(b.data.dtype) == np.dtype(ml_dtypes.bfloat16)
        from pykrylov_tpu.sparse.bell import bell_stream_bytes
        assert bell_stream_bytes(b) == 3 * int(np.prod(b.data.shape))
        x = np.random.default_rng(3).standard_normal(400)
        xp = jnp.zeros(b.padded_shape[1], jnp.float32).at[:400].set(
            jnp.asarray(x, jnp.float32))
        y = np.asarray(bell_matvec_pallas(b, xp, interpret=True))[:400]
        assert y.dtype == np.float32
        ref = a16 @ x.astype(np.float64)
        np.testing.assert_allclose(y, ref, rtol=2e-6, atol=2e-6)


def test_bf16_storage_operator_solver():
    # a bf16-stored operator drives a solver with f32 vectors end to
    # end; verified against the bf16-rounded dense system
    import ml_dtypes
    from pykrylov_tpu.solvers.bicgstab import bicgstab
    rng = np.random.default_rng(33)
    n = 384
    rows = np.repeat(np.arange(n), 5)
    cols = np.clip(rows + rng.integers(-40, 41, size=len(rows)), 0, n - 1)
    vals = rng.standard_normal(len(rows)) * 0.05
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    rows, cols, vals = rows[first], cols[first], vals[first]
    # diagonally dominant
    rows = np.r_[rows, np.arange(n)]
    cols = np.r_[cols, np.arange(n)]
    vals = np.r_[vals, np.full(n, 4.0)]
    v16 = np.asarray(vals, dtype=ml_dtypes.bfloat16)
    a16 = np.zeros((n, n))
    np.add.at(a16, (rows, cols), v16.astype(np.float64))
    op = bell_operator(F.coo_from_arrays(v16, rows, cols, (n, n),
                                         device=False), interpret=True)
    b64 = a16 @ np.ones(n)
    res = bicgstab(op, jnp.asarray(b64, jnp.float32), rtol=1e-5)
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    rel = np.linalg.norm(a16 @ x - b64) / np.linalg.norm(b64)
    assert rel < 1e-4, rel


def test_bell_with_values_dtype_roundtrip():
    import ml_dtypes
    from pykrylov_tpu.sparse.bell import bell_with_values_dtype
    coo, *_ = _random_coo(256, 256, 1200, 41, bandwidth=60)
    b = bell_from_coo(coo, window=1)  # spilled entries exist
    b16 = bell_with_values_dtype(b, ml_dtypes.bfloat16)
    assert np.dtype(b16.data.dtype) == np.dtype(ml_dtypes.bfloat16)
    assert np.dtype(b16.sp_val.dtype) == np.dtype(ml_dtypes.bfloat16)
    # oracle equals the bf16-rounded reconstruction
    d16 = bell_to_dense(b16)
    d = bell_to_dense(b)
    np.testing.assert_allclose(
        d16.astype(np.float64),
        np.asarray(d, np.float64).astype(ml_dtypes.bfloat16)
          .astype(np.float64), rtol=0, atol=0)


def test_multilevel_survives_unpackable_comparison():
    # code-review finding: a valid multi-level packing (level 1 spills
    # clustered far entries, level 2 packs them alone) used to be
    # DISCARDED by a SpanError raised inside its own uncapped-comparison
    # packing, silently demoting the operator to the XLA ELL path.
    rng = np.random.default_rng(51)
    m, n = 256, 6400
    rows = np.repeat(np.arange(m), 4)
    cols = np.clip(rows + rng.integers(-6, 7, size=len(rows)), 0, m - 1)
    vals = rng.standard_normal(len(rows))
    # 10 clustered far entries in block 0, ~40 bands away from the core
    fr = np.arange(10)
    fc = 40 * 128 + np.arange(10)
    rows = np.r_[rows, fr]
    cols = np.r_[cols, fc]
    vals = np.r_[vals, np.ones(10)]
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    rows, cols, vals = rows[first], cols[first], vals[first]
    coo = F.coo_from_arrays(vals, rows, cols, (m, n), device=False)
    a = np.zeros((m, n))
    a[rows, cols] = vals
    op = bell_operator(coo, nb_max=16, levels=2, interpret=True,
                       with_transpose=False, window=1)
    x = rng.standard_normal(n)
    y = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(y, a @ x, rtol=1e-10, atol=1e-12)


def test_empty_matrix_with_spill_cost_has_no_spill():
    # code-review finding: the synthetic placeholder entry of an empty
    # matrix used to be spill-analyzed, reporting nnz_spill=1 > nnz=0
    coo = F.coo_from_arrays(np.zeros(0), np.zeros(0, np.int64),
                            np.zeros(0, np.int64), (200, 200),
                            device=False)
    b = bell_from_coo(coo, spill_cost=12.0)
    assert b.nnz == 0 and b.nnz_spill == 0
    assert bell_fill(b) == 0.0


def test_matvec_pallas_passes_none():
    coo, *_ = _random_coo(200, 200, 900, 61, bandwidth=50)
    a = _dense(coo)
    b = bell_from_coo(coo, spill_cost=None, window=1)
    x = np.random.default_rng(5).standard_normal(200)
    xp = jnp.zeros(b.padded_shape[1]).at[:200].set(jnp.asarray(x))
    y = np.asarray(bell_matvec_pallas(b, xp, interpret=True,
                                      passes=None))[:200]
    np.testing.assert_allclose(y, a @ x, rtol=1e-10)


def test_vectorized_w2_planner_matches_loop_oracle():
    # the vectorized cross-block DP fallback must reproduce the
    # per-block-loop reference plan BIT-EXACTLY, including spill costs
    # where the cost plateau is decided by floating-point residue
    from pykrylov_tpu.sparse.bell import _plan_blocks_loop, _plan_blocks_py
    for seed, (m, nnz, cw) in enumerate([(2048, 12000, 2048),
                                         (512, 40000, 512),
                                         (1024, 3000, 4096),
                                         (128, 50, 128), (256, 1, 999)]):
        rng = np.random.default_rng(seed)
        rows = np.sort(rng.integers(0, m, size=nnz).astype(np.int64))
        cols = np.clip((rows * cw // m)
                       + rng.integers(-300, 301, nnz), 0, cw - 1)
        order = np.lexsort((cols, rows))
        rs, cs = rows[order], cols[order].astype(np.int64)
        bs = cs // 128
        nblocks = -(-m // 128)
        bounds = np.searchsorted(rs // 128, np.arange(nblocks + 1))
        for sc in (12.0, None, 640.0 / 7, 640.0 / 64, 1e9, 0.51):
            vec = _plan_blocks_py(rs, cs, bs, bounds, nblocks, sc)
            ref = _plan_blocks_loop(rs, cs, bs, bounds, nblocks, sc)
            for a, b in zip(vec, ref):
                np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# round 5: segmented staging + heavy-row split


def _wide_window_coo(m=2048, n=90000, far_frac=0.05, heavy=0, hot=None,
                     seed=11):
    """Banded locality + scatter tail: spans exceed SEG_BANDS so the
    packer segments (mixed narrow/wide when the tail is uniform)."""
    rng = np.random.default_rng(seed)
    deg = rng.integers(3, 12, m)
    if heavy:
        deg[rng.integers(0, m, heavy)] = 300
    rows = np.repeat(np.arange(m), deg)
    if hot:
        hb = rng.integers(0, n // 128, hot)
        fc = hb[rng.integers(0, hot, rows.shape)] * 128 \
            + rng.integers(0, 128, rows.shape)
    else:
        fc = rng.integers(0, n, rows.shape)
    far = rng.random(rows.shape) < far_frac
    cols = np.where(far, fc,
                    (rows * (n // m) + rng.integers(-300, 301,
                                                    rows.shape)) % n)
    vals = rng.standard_normal(rows.shape)
    key = rows.astype(np.int64) * n + cols
    _, first = np.unique(key, return_index=True)
    return F.coo_from_arrays(vals[first], rows[first], cols[first],
                             (m, n), device=False)


@pytest.mark.parametrize("far_frac,heavy,hot", [
    (0.002, 0, None),     # nearly all segments narrow
    (0.08, 10, None),     # mixed: uniform tail forces wide sentinels
    (0.06, 0, 24),        # clustered tail (hot bands)
])
def test_segmented_matvec_matches_dense(far_frac, heavy, hot):
    coo = _wide_window_coo(far_frac=far_frac, heavy=heavy, hot=hot)
    a = _dense(coo)
    b = bell_from_coo(coo, spill_cost=None, window=1, segment=True,
                      device=False)
    assert b.seg is not None and b.nb > 256
    # oracle reconstruction understands segment-relative bands
    np.testing.assert_allclose(bell_to_dense(b), a, rtol=0, atol=0)
    from pykrylov_tpu.sparse.bell import bell_to_device
    bd = bell_to_device(b)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(b.padded_shape[1])
    y = np.asarray(bell_matvec_pallas(bd, jnp.asarray(x),
                                      interpret=True))[:coo.shape[0]]
    np.testing.assert_allclose(y, a @ x[:coo.shape[1]], rtol=1e-9,
                               atol=1e-9 * np.abs(a @ x[:coo.shape[1]]).max())
    # segmented and monolithic kernels agree to rounding (the pack-time
    # group permutation changes scatter accumulation order only)
    bm = bell_to_device(bell_from_coo(coo, spill_cost=None, window=1,
                                      segment=False, device=False))
    y2 = np.asarray(bell_matvec_pallas(bm, jnp.asarray(x),
                                       interpret=True))[:coo.shape[0]]
    np.testing.assert_allclose(y, y2, rtol=1e-12,
                               atol=1e-12 * np.abs(y2).max())


def test_segmented_matmat_matches_dense():
    from pykrylov_tpu.sparse.bell import bell_matmat_pallas, bell_to_device
    coo = _wide_window_coo(far_frac=0.08, heavy=10)
    a = _dense(coo)
    b = bell_from_coo(coo, spill_cost=None, window=1, segment=True,
                      device=False)
    assert b.seg is not None and b.seg_mixed > 0
    X = np.random.default_rng(6).standard_normal((b.padded_shape[1], 3))
    Y = np.asarray(bell_matmat_pallas(bell_to_device(b), jnp.asarray(X),
                                      interpret=True))[:coo.shape[0]]
    ref = a @ X[:coo.shape[1]]
    np.testing.assert_allclose(Y, ref, rtol=1e-9,
                               atol=1e-9 * np.abs(ref).max())


def test_row_split_operator_all_products():
    from pykrylov_tpu.sparse.bell import bell_operator, _row_split_plan
    rng = np.random.default_rng(3)
    m = n = 4096
    deg = rng.integers(2, 6, m)
    deg[rng.integers(0, m, 12)] = 300
    rows = np.repeat(np.arange(m), deg)
    cols = np.where(rng.random(rows.shape) < 0.2,
                    rng.integers(0, n, rows.shape),
                    np.clip(rows + rng.integers(-100, 101, rows.shape),
                            0, n - 1))
    vals = rng.standard_normal(rows.shape)
    key = rows.astype(np.int64) * n + cols
    _, first = np.unique(key, return_index=True)
    coo = F.coo_from_arrays(vals[first], rows[first], cols[first],
                            (m, n), device=False)
    assert _row_split_plan(coo) is not None
    a = _dense(coo)
    op = bell_operator(coo, split_rows="auto")
    assert op.split_rows == 12
    x = rng.standard_normal(n)
    xt = rng.standard_normal(m)
    X = rng.standard_normal((n, 4))
    Xt = rng.standard_normal((m, 4))
    sc = np.abs(a @ x).max()
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)), a @ x,
                               rtol=1e-9, atol=1e-9 * sc)
    np.testing.assert_allclose(np.asarray(op.T @ jnp.asarray(xt)),
                               a.T @ xt, rtol=1e-9, atol=1e-9 * sc)
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(X)), a @ X,
                               rtol=1e-9, atol=1e-9 * sc)
    np.testing.assert_allclose(np.asarray(op.T @ jnp.asarray(Xt)),
                               a.T @ Xt, rtol=1e-9, atol=1e-9 * sc)


def test_row_split_symmetric_solve():
    from pykrylov_tpu.sparse.bell import bell_operator
    from pykrylov_tpu.solvers import cg
    rng = np.random.default_rng(9)
    m = 2048
    deg = rng.integers(2, 5, m)
    deg[rng.integers(0, m, 6)] = 200
    rows = np.repeat(np.arange(m), deg)
    cols = rng.integers(0, m, rows.shape)
    vals = 0.05 * rng.standard_normal(rows.shape)
    allr = np.concatenate([rows, cols, np.arange(m)])
    allc = np.concatenate([cols, rows, np.arange(m)])
    d = np.zeros(m)
    np.add.at(d, rows, np.abs(vals)); np.add.at(d, cols, np.abs(vals))
    allv = np.concatenate([vals, vals, d + 1.0])
    coo = F.coo_from_arrays(allv, allr, allc, (m, m), device=False)
    op = bell_operator(coo, symmetric=True, split_rows="auto")
    assert op.split_rows > 0
    xstar = rng.standard_normal(m)
    b = op @ jnp.asarray(xstar)
    res = cg(op, b, rtol=1e-10)
    assert res.converged
    r = np.asarray(b) - np.asarray(op @ res.x)
    assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(np.asarray(b))


def test_segmented_with_bf16_and_int8idx():
    # storage knobs compose with segmented staging
    import ml_dtypes
    from pykrylov_tpu.sparse.bell import (bell_with_values_dtype,
                                          bell_with_idx_fmt,
                                          bell_to_device)
    coo = _wide_window_coo(far_frac=0.05, heavy=6)
    a = _dense(coo)
    b = bell_from_coo(coo, spill_cost=None, window=1, segment=True,
                      device=False)
    assert b.seg is not None
    x = np.random.default_rng(2).standard_normal(b.padded_shape[1])
    ref = a @ x[:coo.shape[1]]
    for variant in (bell_with_idx_fmt(b, "int8"),
                    bell_with_values_dtype(b, ml_dtypes.bfloat16)):
        assert variant.seg is not None      # knobs preserve seg fields
        assert variant.seg_bands == b.seg_bands
        y = np.asarray(bell_matvec_pallas(
            bell_to_device(variant), jnp.asarray(x, jnp.float32),
            interpret=True))[:coo.shape[0]]
        tol = 1e-5 if variant.data.dtype == np.dtype("float32") else 2e-2
        np.testing.assert_allclose(y, ref, rtol=tol,
                                   atol=tol * np.abs(ref).max())


def test_segmented_multilevel_spill_levels():
    # depth-capped level-1 + uncapped level-2 packings both segment
    # (or fall back) independently and still sum to the exact matvec
    from pykrylov_tpu.sparse.bell import _pack_levels, bell_to_device
    from pykrylov_tpu.sparse.bell import _bell_matvec_call, LANES
    coo = _wide_window_coo(far_frac=0.08, heavy=8)
    a = _dense(coo)
    lv = _pack_levels(coo, 1024, 12.0, 2, device=False, window=1,
                      segment=True)
    assert sum(b.nnz_spill for b in lv) == 0
    x = np.random.default_rng(4).standard_normal(
        max(b.padded_shape[1] for b in lv)).astype(np.float32)
    y = None
    for b in lv:
        bd = bell_to_device(b)
        xp = jnp.zeros(b.padded_shape[1], jnp.float32).at[
            :coo.shape[1]].set(jnp.asarray(x[:coo.shape[1]]))
        yk = np.asarray(_bell_matvec_call(
            bd.data, bd.lanes, bd.bands, bd.blocks, bd.band_lo,
            xp.reshape(-1, LANES), bd.sp_row, bd.sp_col, bd.sp_val,
            bd.nb, bd.nblk, True, window=1, seg=bd.seg,
            seg_mixed=int(bd.seg_mixed),
            seg_bands=int(bd.seg_bands)))[:coo.shape[0]]
        y = yk if y is None else y + yk
    ref = a @ x[:coo.shape[1]].astype(np.float64)
    np.testing.assert_allclose(y, ref, rtol=1e-5,
                               atol=1e-5 * np.abs(ref).max())


def test_row_split_rectangular():
    # heavy rows in a RECTANGULAR operator: split + two-piece transpose
    from pykrylov_tpu.sparse.bell import bell_operator
    rng = np.random.default_rng(13)
    m, n = 2048, 5000
    deg = rng.integers(2, 5, m)
    deg[rng.integers(0, m, 8)] = 250
    rows = np.repeat(np.arange(m), deg)
    cols = rng.integers(0, n, rows.shape)
    vals = rng.standard_normal(rows.shape)
    key = rows.astype(np.int64) * n + cols
    _, first = np.unique(key, return_index=True)
    coo = F.coo_from_arrays(vals[first], rows[first], cols[first],
                            (m, n), device=False)
    a = _dense(coo)
    op = bell_operator(coo, split_rows="auto")
    assert op.split_rows == 8
    assert op.shape == (m, n)
    x = rng.standard_normal(n)
    xt = rng.standard_normal(m)
    sc = np.abs(a @ x).max()
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(x)), a @ x,
                               rtol=1e-9, atol=1e-9 * sc)
    np.testing.assert_allclose(np.asarray(op.T @ jnp.asarray(xt)),
                               a.T @ xt, rtol=1e-9, atol=1e-9 * sc)


@pytest.mark.parametrize("seed", range(6))
def test_packer_fuzz_all_knobs(seed):
    """Property fuzz over the packer's full knob space: every
    combination must reconstruct the dense oracle exactly
    (bell_to_dense) and produce an exact interpret-mode matvec.
    Catches interactions the targeted tests miss (segmentation x
    spill levels x window mode x idx_fmt x dtype x shapes)."""
    import itertools
    rng = np.random.default_rng(1000 + seed)
    m = int(rng.integers(100, 1200))
    n = int(rng.integers(100, 40000))
    nnz = int(rng.integers(50, 4000))
    bw = None if rng.random() < 0.5 else int(rng.integers(30, 500))
    coo, rows, cols, vals = _random_coo(m, n, nnz, seed + 7,
                                        bandwidth=bw)
    if rng.random() < 0.3:   # sprinkle a heavy row
        r0 = int(rng.integers(0, m))
        cc = rng.integers(0, n, 150)
        vv = rng.standard_normal(150)
        allr = np.concatenate([rows, np.full(150, r0)])
        allc = np.concatenate([cols, cc])
        allv = np.concatenate([vals, vv])
        key = allr.astype(np.int64) * n + allc
        _, first = np.unique(key, return_index=True)
        coo = F.coo_from_arrays(allv[first], allr[first], allc[first],
                                (m, n), device=False)
    a = _dense(coo)
    x = rng.standard_normal(-(-n // 128) * 128 + 256)
    combos = [(w, sc, seg, fmt)
              for w in (1, 2) for sc in (None, 12.0)
              for seg in (True, False) for fmt in ("packed", "int8")]
    rng.shuffle(combos)
    for w, sc, seg, fmt in combos[:6]:   # bounded per seed
        try:
            b = bell_from_coo(coo, window=w, spill_cost=sc, segment=seg,
                              idx_fmt=fmt, device=False)
        except SpanError:
            continue
        np.testing.assert_allclose(bell_to_dense(b), a, rtol=0, atol=0,
                                   err_msg=str((w, sc, seg, fmt)))
        from pykrylov_tpu.sparse.bell import bell_to_device
        xp = np.zeros(b.padded_shape[1])
        k = min(len(x), len(xp))
        xp[:k] = x[:k]
        y = np.asarray(bell_matvec_pallas(bell_to_device(b),
                                          jnp.asarray(xp),
                                          interpret=True))[:m]
        ref = a @ xp[:n]
        np.testing.assert_allclose(
            y, ref, rtol=1e-9, atol=1e-9 * max(1.0, np.abs(ref).max()),
            err_msg=str((w, sc, seg, fmt)))
