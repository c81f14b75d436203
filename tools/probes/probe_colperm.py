"""Host-side: effect of column-spreading permutations on the BELL fill
floor (max-per-lane window depths) for the bench matrix.

A column permutation Pc is free at matvec time (one XLA gather on x,
O(n) vs O(nnz) kernel work); the packer can exploit it to flatten
per-(row, band) counts, which drive window depths.
"""
import sys
import numpy as np

sys.path.insert(0, ".")
from pykrylov_tpu.gallery.general import tiled_general_coo  # noqa: E402

LANES = 128
vals, rows, cols, shape = tiled_general_coo(tiles=1024)
m, n = shape
nnz = len(vals)
rows = rows.astype(np.int64)
cols = cols.astype(np.int64)
print(f"m={m} nnz={nnz}", flush=True)

# diagnostic: distribution of per-(row, band) counts
key = rows * ((n // LANES) + 2) + cols // LANES
_, c = np.unique(key, return_counts=True)
hist = np.bincount(c)
print("per-(row,band) count hist:", dict(enumerate(hist.tolist())), flush=True)


def floor_of(cols_p, w=1, tag=""):
    blk = rows // LANES
    lane = rows % LANES
    wb = (cols_p // LANES) // w
    key = (blk * ((n // (LANES * w)) + 2) + wb) * LANES + lane
    uk, cnt = np.unique(key, return_counts=True)
    wkey = uk // LANES
    wfirst = np.flatnonzero(np.r_[True, np.diff(wkey) != 0])
    depths = np.maximum.reduceat(cnt, wfirst)
    # span per block (bands) for window-budget sanity
    wblk = wkey[wfirst] // ((n // (LANES * w)) + 2)
    bnd = wkey[wfirst] % ((n // (LANES * w)) + 2)
    bfirst = np.flatnonzero(np.r_[True, np.diff(wblk) != 0])
    lo = np.minimum.reduceat(bnd, bfirst)
    hi = np.maximum.reduceat(bnd, bfirst)
    span = int((hi - lo).max()) + 1
    print(f"{tag:36s} w={w} floor={depths.sum()*LANES/nnz:.3f} "
          f"windows={len(wfirst)} maxspan={span}", flush=True)


floor_of(cols, 1, "identity")
floor_of(cols, 2, "identity")

TILE = 991
tile_of = cols // TILE
within = cols % TILE

# stride permutation within tile: c -> (c * s) % TILE, s coprime to 991
for s in (191, 409):
    wp = (within * s) % TILE
    cp = tile_of * TILE + wp
    floor_of(cp, 1, f"stride s={s}")
    floor_of(cp, 2, f"stride s={s}")

# random permutation within tile (same permutation each tile)
rng = np.random.default_rng(7)
rp = rng.permutation(TILE)
cp = tile_of * TILE + rp[within]
floor_of(cp, 1, "random-in-tile")

# greedy balancing: assign columns (within tile) to positions so that
# heavy columns spread across bands.  Heaviness = column nnz in base tile.
colw = np.bincount(within, minlength=TILE)
order = np.argsort(-colw, kind="stable")
# deal columns round-robin across 8 "virtual bands" then concatenate
K = 8
pos = np.empty(TILE, dtype=np.int64)
slots = [[] for _ in range(K)]
for i, c in enumerate(order):
    slots[i % K].append(c)
flat = [c for g in slots for c in g]
pos[np.array(flat)] = np.arange(TILE)
cp = tile_of * TILE + pos[within]
floor_of(cp, 1, "greedy-deal")

# row-segment spreading: per row, order its in-tile cols and interleave:
# permute by rank within column's ROW-cluster... simpler: global stride
# is likely enough; also try stride on the raw global columns
for s in (2654435761 % n | 1,):
    cp = (cols * 40503) % n  # global Fibonacci-ish stride (may blow span)
    floor_of(cp, 1, "global stride (span check)")
