"""Host-side: real-packer slot counts for window/spill/level variants on
the bench matrix, plus capped-depth what-ifs straight from the per-window
count distributions."""
import sys
import time
import numpy as np

sys.path.insert(0, ".")
from pykrylov_tpu.gallery.general import tiled_general_coo  # noqa: E402
from pykrylov_tpu.sparse import formats as F  # noqa: E402
from pykrylov_tpu.sparse.bell import bell_from_coo, _pack_levels  # noqa: E402

LANES = 128
vals, rows, cols, shape = tiled_general_coo(tiles=1024)
m, n = shape
nnz = len(vals)
coo = F.coo_from_arrays(vals.astype(np.float32), rows, cols, shape,
                        device=False)
print(f"m={m} nnz={nnz}", flush=True)


def pk(tag, **kw):
    t0 = time.perf_counter()
    try:
        lv = _pack_levels(coo, 1024, kw.pop("spill_cost", None),
                          kw.pop("levels", 1), device=False, **kw)
    except Exception as e:
        print(f"{tag:44s} FAILED {e}", flush=True)
        return
    slots = sum(int(np.prod(b.data.shape)) for b in lv)
    spill = sum(b.nnz_spill for b in lv)
    gs = [b.data.shape[1] for b in lv]
    stream = sum(
        int(np.prod(b.data.shape)) * (np.dtype(b.data.dtype).itemsize + 1)
        + b.nnz_spill * 12 for b in lv)
    print(f"{tag:44s} slots/nnz={slots/nnz:.3f} B/nnz={stream/nnz:.2f} "
          f"levels={len(lv)} GS={gs} spill={spill} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)


pk("w1 levels=1 nospill", window=1)
pk("w2 levels=1 nospill", window=2)
pk("w1 levels=2 spill=12B", window=1, levels=2, spill_cost=12.0)
pk("w2 levels=2 spill=12B", window=2, levels=2, spill_cost=12.0)
pk("w1 levels=2 spill=8B", window=1, levels=2, spill_cost=8.0)
pk("w1 levels=2 spill=15B", window=1, levels=2, spill_cost=15.0)
pk("w1 levels=3 spill=12B", window=1, levels=3, spill_cost=12.0)

# --- floor for wider windows (w = 1,2,4,8): per block, greedy fixed
# aligned windows of w consecutive bands starting at band 0 mod w; depth
# = max per-lane count in the window (no DP, lower bound-ish for real) --
blk = rows // LANES
lane = rows % LANES
for w in (1, 2, 4, 8):
    wb = (cols // LANES) // w
    key = (blk * ((n // (LANES * w)) + 2) + wb) * LANES + lane
    uk, cnt = np.unique(key, return_counts=True)
    wkey = uk // LANES
    wfirst = np.flatnonzero(np.r_[True, np.diff(wkey) != 0])
    depths = np.maximum.reduceat(cnt, wfirst)
    print(f"aligned-window w={w}: floor slots/nnz="
          f"{depths.sum()*LANES/nnz:.3f} windows={len(wfirst)}",
          flush=True)
    # capped-depth what-if: overflow entries cost r slots each (a level-2
    # repack); optimal cap per window from count histograms
    order = np.argsort(uk)
    for r_over in (1.5, 2.0, 3.0):
        # per window: sorted lane counts; cost(d) = 128*d + r*sum(max(c-d,0))
        tot = 0.0
        ov_tot = 0
        # vector approach: for t-th largest count rule: raise d while
        # 128 <= r * #{lanes with count > d}  =>  keep d = count at rank
        # t = ceil(128/r)
        t = int(np.ceil(LANES / r_over))
        # per window rank-t largest lane count
        # build (windows, counts) ragged: use reduceat on sorted counts
        # simpler: loop in chunks over windows via np.add.at histogram
        nw = len(wfirst)
        wid = np.repeat(np.arange(nw), np.diff(np.r_[wfirst, len(uk)]))
        D = int(depths.max())
        hist = np.zeros((nw, D + 1), np.int64)
        np.add.at(hist, (wid, cnt), 1)
        nlanes_pos = hist.sum(1)  # lanes with >=1 entry
        # deeper[d] = #lanes with count > d  (count-0 lanes excluded from
        # hist so add them implicitly: they never exceed 0)
        cum = np.cumsum(hist, axis=1)
        deeper = nlanes_pos[:, None] - cum  # #{count > d}, d=0..D
        dgrid = np.arange(D + 1)
        # overflow(d) = sum_{e>d} (e-d)*hist[e] = suffix sums
        sfx = np.zeros((nw, D + 2), np.int64)
        sfx[:, :-1] = deeper
        overflow = np.cumsum(sfx[:, ::-1], axis=1)[:, ::-1][:, 1:]
        cost = LANES * dgrid[None, :] + r_over * overflow
        j = np.argmin(cost, axis=1)
        slots = LANES * j.sum()
        ov = overflow[np.arange(nw), j].sum()
        tot = slots + r_over * ov
        print(f"  cap r={r_over}: L1 slots/nnz={slots/nnz:.3f} "
              f"overflow={ov/nnz:.3%} est total={tot/nnz:.3f}",
              flush=True)
