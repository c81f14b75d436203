"""Host-side (NumPy-only) decomposition of BELL slot overhead on the
1M-row tiled-jpwh bench matrix, and what-if evaluation of fill levers:

  floor   = sum over (block, band) windows of 128 * max-per-lane count
  + align = 4-aligned per-block depths (scatter grouping)
  + GS    = uniform GS across steps (max over steps of row sums)

Levers evaluated without touching the kernel:
  L1 block->step bin packing (locality-bucketed) to cut GS padding
  L2 2-aligned depths
  L3 within-bucket row grouping (profile sort) to cut the floor
"""
import sys
import time
import numpy as np

sys.path.insert(0, ".")
from pykrylov_tpu.gallery.general import tiled_general_coo  # noqa: E402

LANES = 128

vals, rows, cols, shape = tiled_general_coo(tiles=1024)
m, n = shape
nnz = len(vals)
print(f"matrix: m={m} nnz={nnz}", flush=True)

rows = rows.astype(np.int64)
cols = cols.astype(np.int64)


def window_depths(rows, cols):
    """per-(block, band) max-per-lane count, as dict arrays."""
    blk = rows // LANES
    band = cols // LANES
    lane = rows % LANES
    key = (blk * ((n // LANES) + 2) + band) * LANES + lane
    uk, cnt = np.unique(key, return_counts=True)
    wkey = uk // LANES
    # max count within each window
    wfirst = np.flatnonzero(np.r_[True, np.diff(wkey) != 0])
    depths = np.maximum.reduceat(cnt, wfirst)
    wblk = wkey[wfirst] // ((n // LANES) + 2)
    return wblk, depths


def report(tag, rows_p, cols_p, nblk=96, bucket_steps=None, align=4):
    nblocks = -(-m // LANES)
    wblk, depths = window_depths(rows_p, cols_p)
    floor_slots = int(depths.sum()) * LANES
    dpb = np.zeros(nblocks, dtype=np.int64)
    np.add.at(dpb, wblk, depths)
    dpb_a = -(-dpb // align) * align
    align_slots = int(dpb_a.sum()) * LANES
    # GS padding: steps of nblk consecutive blocks, uniform GS
    nsteps = -(-nblocks // nblk)
    dpb_pad = np.zeros(nsteps * nblk, dtype=np.int64)
    dpb_pad[:nblocks] = dpb_a
    rps = dpb_pad.reshape(nsteps, nblk).sum(1)
    GS = max(32, -(-int(rps.max()) // 32) * 32)
    gs_slots = nsteps * GS * LANES
    # L1: bin-pack blocks into steps within locality buckets
    if bucket_steps:
        bs = bucket_steps * nblk  # blocks per bucket
        tot = 0
        for lo in range(0, nsteps * nblk, bs):
            d = dpb_pad[lo:lo + bs]
            k = len(d) // nblk
            # greedy: sort desc, assign to least-loaded step
            loads = np.zeros(k, dtype=np.int64)
            cnts = np.zeros(k, dtype=np.int64)
            for dep in -np.sort(-d):
                cand = np.flatnonzero(cnts < nblk)
                j = cand[np.argmin(loads[cand])]
                loads[j] += dep
                cnts[j] += 1
            tot = max(tot, int(loads.max()))
        GSb = max(32, -(-tot // 32) * 32)
        bin_slots = nsteps * GSb * LANES
    else:
        bin_slots = None
    line = (f"{tag:34s} floor={floor_slots/nnz:.3f} "
            f"+align{align}={align_slots/nnz:.3f} "
            f"+GS(nblk={nblk})={gs_slots/nnz:.3f}")
    if bin_slots is not None:
        line += f" binpack({bucket_steps}st)={bin_slots/nnz:.3f}"
    print(line, flush=True)
    return gs_slots


t0 = time.perf_counter()
report("baseline (current order)", rows, cols, align=4)
report("baseline align=2", rows, cols, align=2)
report("baseline binpack", rows, cols, align=4, bucket_steps=8)

# L3: row grouping within locality buckets.  Profile key per row: sort
# rows within a bucket of B blocks by (nnz, first band, last band).
order = np.argsort(rows * (2**20) + cols)  # row-major entry order
rs, cs = rows[order], cols[order]
rfirst = np.flatnonzero(np.r_[True, np.diff(rs) != 0])
rcnt = np.diff(np.r_[rfirst, nnz])
rids = rs[rfirst]
firstband = cs[rfirst] // LANES
lastband = cs[np.r_[rfirst[1:], nnz] - 1] // LANES
# rows with no entries: give neutral keys
nnz_of = np.zeros(m, dtype=np.int64)
nnz_of[rids] = rcnt
fb = np.zeros(m, dtype=np.int64)
fb[rids] = firstband
lb = np.zeros(m, dtype=np.int64)
lb[rids] = lastband

for bucket_blocks in (8, 32, 128):
    B = bucket_blocks * LANES
    perm = np.arange(m)
    for lo in range(0, m, B):
        hi = min(m, lo + B)
        seg = np.arange(lo, hi)
        key = (nnz_of[seg] * (2**24) + fb[seg] * (2**12) + lb[seg])
        perm[lo:hi] = seg[np.argsort(key, kind="stable")]
    inv = np.empty(m, dtype=np.int64)
    inv[perm] = np.arange(m)
    rp = inv[rows]
    report(f"rowgroup nnz/fb/lb bucket={bucket_blocks}blk", rp, cols,
           align=4, bucket_steps=8)

# alternative key: first band only (locality-preserving-ish)
for bucket_blocks in (32,):
    B = bucket_blocks * LANES
    perm = np.arange(m)
    for lo in range(0, m, B):
        hi = min(m, lo + B)
        seg = np.arange(lo, hi)
        key = (fb[seg] * (2**24) + nnz_of[seg])
        perm[lo:hi] = seg[np.argsort(key, kind="stable")]
    inv = np.empty(m, dtype=np.int64)
    inv[perm] = np.arange(m)
    rp = inv[rows]
    report(f"rowgroup fb/nnz bucket={bucket_blocks}blk", rp, cols,
           align=4, bucket_steps=8)

print(f"total {time.perf_counter()-t0:.1f}s", flush=True)
