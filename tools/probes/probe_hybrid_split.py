"""Host-side probe: predicted win of a DIA+BELL hybrid split.

For each matrix class, extract diagonals above a density threshold into
a DIA part and re-pack the remainder with the BELL planner; predict
times with the round-3 measured cost model:

  BELL  : slots * 12.5 ps (w1) / 16.1 ps (w2)  [compute-bound]
  DIA   : stream bytes / 675 GB/s  ((ndiag + 2) * m * 4 B)
  merge : one extra y add = 3 * m * 4 B / 675 GB/s

No chip needed: the planner is the NumPy path; the model constants are
the on-chip round-3 measurements (ROADMAP 'BELL general SpMV').

Usage: python tools/probes/probe_hybrid_split.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np

from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.bell import (_pack_levels, _SLOT_COST_PS,
                                      NB_MAX, _SPILL_BYTES, SpanError)

DIA_PS_PER_SLOT = 8.6 / 0.825   # measured stream floor scaled by util
BW = 675e9


def plan_cost(coo):
    try:
        lv = _pack_levels(coo, NB_MAX, _SPILL_BYTES, 2, device=False,
                          window="auto")
    except SpanError:
        return None, None
    t = sum(int(np.prod(b.data.shape)) * _SLOT_COST_PS[b.window]
            for b in lv) * 1e-12
    spill = sum(b.nnz_spill for b in lv)
    t += spill * 16e-9   # XLA scatter remainder ~16 ns/entry
    return t, lv


def diag_profile(coo, m):
    d = np.asarray(coo.col, np.int64) - np.asarray(coo.row, np.int64)
    offs, counts = np.unique(d, return_counts=True)
    dens = counts / np.minimum(m - np.abs(offs), m)
    return offs, counts, dens


def split(coo, m, thresh):
    offs, counts, dens = diag_profile(coo, m)
    dense_offs = set(offs[dens >= thresh].tolist())
    d = np.asarray(coo.col, np.int64) - np.asarray(coo.row, np.int64)
    in_dia = np.isin(d, list(dense_offs)) if dense_offs else \
        np.zeros(len(d), bool)
    return in_dia, len(dense_offs), counts[dens >= thresh].sum()


def analyze(name, vals, rows, cols, shape):
    m = shape[0]
    coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
    t_full, lv_full = plan_cost(coo)
    nnz = len(np.asarray(coo.data))
    print(f"\n== {name}: m={m} nnz={nnz}")
    if t_full is None:
        print("  full BELL: SpanError")
        return
    slots_full = sum(int(np.prod(b.data.shape)) for b in lv_full)
    print(f"  full BELL: slots/nnz={slots_full/nnz:.2f} "
          f"pred={t_full*1e3:.3f} ms  ({nnz/t_full/1e9:.1f} Gnnz/s)")
    for thresh in (0.9, 0.5, 0.25, 0.1):
        in_dia, ndiag, nnz_dia = split(coo, m, thresh)
        if ndiag == 0 or nnz_dia == nnz:
            continue
        rem = F.coo_from_arrays(np.asarray(coo.data)[~in_dia],
                                np.asarray(coo.row)[~in_dia],
                                np.asarray(coo.col)[~in_dia], shape,
                                device=False)
        t_rem, lv_rem = plan_cost(rem)
        if t_rem is None:
            print(f"  thresh={thresh}: remainder SpanError")
            continue
        slots_rem = sum(int(np.prod(b.data.shape)) for b in lv_rem)
        t_dia = (ndiag + 2) * m * 4 / BW
        t_add = 3 * m * 4 / BW
        t_hyb = t_rem + t_dia + t_add
        print(f"  thresh={thresh}: ndiag={ndiag} nnz_dia={nnz_dia} "
              f"({100*nnz_dia/nnz:.0f}%) rem slots/nnz="
              f"{slots_rem/max(1,nnz-nnz_dia):.2f} "
              f"pred={t_hyb*1e3:.3f} ms ({nnz/t_hyb/1e9:.1f} Gnnz/s) "
              f"[dia {t_dia*1e3:.3f} + bell {t_rem*1e3:.3f} + add "
              f"{t_add*1e3:.3f}]  speedup={t_full/t_hyb:.2f}x")


if __name__ == "__main__":
    from pykrylov_tpu.gallery.general import tiled_general_coo
    analyze("jpwh_991 x 64 tiles", *tiled_general_coo(tiles=64))

    from pykrylov_tpu.gallery.convdiff import convdiff2d_coo
    v, r, c, s = convdiff2d_coo(320)          # 102400 rows, 5-point+conv
    analyze("convdiff2d n=320", v.astype(np.float32), r, c, s)

    # power-law / random banded irregular class
    rng = np.random.default_rng(0)
    n = 1 << 17
    deg = np.clip((rng.pareto(2.0, n) + 1).astype(int) * 3, 3, 400)
    rws = np.repeat(np.arange(n), deg)
    base = rws + rng.integers(-300, 301, rws.shape)
    far = rng.random(rws.shape) < 0.05
    cls = np.where(far, rng.integers(0, n, rws.shape), base) % n
    vls = rng.standard_normal(rws.shape).astype(np.float32)
    key = rws * n + cls
    _, first = np.unique(key, return_index=True)
    analyze("power-law banded n=131072", vls[first], rws[first],
            cls[first], (n, n))


def stencil_scatter(n=1 << 17, scatter_per_row=2, seed=1):
    """7-diagonal stencil + uniform long-range scatter: periodic-BC PDE /
    power-grid class — the structure a diagonal split is built for."""
    rng = np.random.default_rng(seed)
    offs = np.array([-1024, -32, -1, 0, 1, 32, 1024])
    rws, cls, vls = [], [], []
    for o in offs:
        r = np.arange(max(0, -o), min(n, n - o))
        rws.append(r); cls.append(r + o)
        vls.append(np.full(len(r), 6.0 if o == 0 else -1.0, np.float32))
    ns = scatter_per_row * n
    sr = rng.integers(0, n, ns)
    sc = rng.integers(0, n, ns)
    rws.append(sr); cls.append(sc)
    vls.append(0.1 * rng.standard_normal(ns).astype(np.float32))
    rws = np.concatenate(rws); cls = np.concatenate(cls)
    vls = np.concatenate(vls)
    key = rws.astype(np.int64) * n + cls
    _, first = np.unique(key, return_index=True)
    return vls[first], rws[first], cls[first], (n, n)
