"""BELL (band-sliced ELL): the general-sparsity Pallas SpMV format.

This is the TPU answer to the reference's pysparse C SpMV — the hot path
its solvers use for *general* matrices
(``/root/reference/pykrylov/linop/linop.py:697-706``).  TPUs have no
arbitrary gather: Mosaic supports exactly one dynamic-index primitive on
vectors, the lane-dimension ``take_along_axis`` over a (rows, 128) tile.
BELL is a storage layout that reduces every sparse row to that primitive.

Layout (v2):

  * Matrix rows are mapped to LANES, 128 per block.  Each *sublane row*
    of a step is a *(column-window, depth)* slot shared by the block's
    128 rows: a window is one or two consecutive 128-wide column bands
    (chosen per block by a small DP minimizing padded depth), and entry
    (q, r) multiplies ``x[128*base(q) + idx(q, r)]`` with
    ``idx ∈ [0, 256)``.
  * Indices are packed 4-per-int32 (1 byte per slot — idx < 256 exactly
    fits): with 4 B values the stream is 5 B/slot, so achieved nnz/s is
    ``BW / (5 / fill)`` — at the measured fills (0.27–0.37 on
    RCM-reordered circuit matrices, 0.8+ on banded/stencil remainders)
    this beats the classic 8 B/nnz CSR-stream accounting at fill ≥ 0.6.
  * The gather is staged in two supported steps: one-hot MXU matmuls
    select each sublane row's two candidate bands from the step's x
    window (``_dot_onehot``: the one-hot operand is bf16-exact, so three
    bf16 passes reconstruct f32 — half the passes of Precision.HIGHEST),
    then two ``take_along_axis`` + select pick each lane's element.
  * The y scatter is a second one-hot matmul over the step's sublane
    rows (fuses the depth reduction), so the kernel body is loop-free —
    a per-tile loop is iteration-latency-bound (~130 ns/tile measured).
  * Each grid step covers ``nblk`` consecutive 128-row blocks; its x
    window (``nb`` bands) is DMA'd from HBM with a dynamic start
    (scalar-prefetched) into a WIN_AHEAD-deep ring buffer.

Matrices whose rows span a wider column range than the window budget
(:class:`SpanError`) should be RCM-reordered first (``reorder_rcm``) or
fall back to the XLA ELL path — ``operator_from_coo`` does this
automatically.

Containers are host-built (NumPy — device round-trips through a remote
transport dominate construction otherwise) and immutable pytrees.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import formats as F

__all__ = ["BELL", "SpanError", "bell_from_coo", "bell_fill",
           "bell_stream_bytes", "bell_matvec_pallas",
           "bell_matmat_pallas", "bell_to_dense", "bell_operator",
           "reorder_rcm", "LANES"]

LANES = 128     # matrix rows per block (lane dimension)
NB_MAX = 1024   # window budget: 1024 bands = 512 KB of x in VMEM
GS_TARGET = 1024  # sublane rows per grid step the packer aims for
WIN_AHEAD = 4   # x-window prefetch depth (ring buffer slots)
SEG_ROWS = 256   # sublane rows per staging segment (segmented mode)
SEG_BANDS = 256  # x bands staged per segment (segmented mode)


class SpanError(ValueError):
    """A grid step's rows reference a wider column range than the window
    budget allows.  Reorder (RCM) or use the XLA ELL path."""


class BELL(NamedTuple):
    """Packed band-sliced ELL (see module docstring).

    ``data``:  (nsteps, GS, 128) values (zero-padded).
    ``lanes``: window-local indices in [0, 256).  ``idx_fmt="packed"``:
               (nsteps, GS//4, 128) int32, 4 per word — byte j of word m
               is the index of sublane row ``j*GS//4 + m``; the kernel
               unpacks with 4 shift/mask passes + a sublane concat.
               ``idx_fmt="int8"``: (nsteps, GS, 128) uint8 stored
               directly — same stream bytes, one zero-extending upcast
               instead of the unpack (fewer VPU ops per slot; subject to
               Mosaic's (32,128) 1-byte tiling, GS is always a multiple
               of 32).
    ``bands``: (nsteps, 1, GS) int32 — window-relative base band of each
               sublane row, lane-major (the window is bands
               [base, base+1]; a (GS, 1) layout would waste a full
               (8,128) VMEM tile per 8 values).
    ``blocks``: int32 scatter map, lane-major; dummy slots point at
               ``nblk`` so no row of the scatter one-hot matches.
               (nsteps, 1, GS//4): one id per 4-row group stored in the
               kernel's [even tile halves | odd halves] fold order
               (block depths are 4-aligned in BOTH window modes so
               groups never straddle blocks — the grouped scatter's
               4x-smaller matmul beats the ~7% alignment slots).
    ``band_lo``: (nsteps,) int32 — first band of each step's x window.
    ``sp_row/sp_col/sp_val``: COO remainder — entries whose (row, window)
               depth exceeded the byte-optimal cap (see
               ``_plan_block_windows``); applied by an XLA scatter-add
               alongside the kernel.
    ``shape``: logical (m, n); ``padded_shape``: the kernel's operand
               sizes; ``nb``: window bands; ``nblk``: blocks per step;
               ``nnz``: true nonzeros (incl. ``nnz_spill`` in the
               remainder).
    ``seg``:   ``None`` (monolithic staging) or an (nsteps, nseg) int32
               array of per-segment window starts (window-relative
               bands, 8-aligned) for SEGMENTED staging: each step's
               sublane rows are pack-time sorted by base band and split
               into ``SEG_ROWS``-row segments; segment s of step st
               stages only x bands [seg[st,s], seg[st,s]+SEG_BANDS), so
               the one-hot staging cost scales with SEG_BANDS instead
               of the packing-wide ``nb``.  ``bands`` is then stored
               SEGMENT-relative (base − band_lo − seg[st, s]).
    """
    data: jnp.ndarray
    lanes: jnp.ndarray
    bands: jnp.ndarray
    blocks: jnp.ndarray
    band_lo: jnp.ndarray
    sp_row: jnp.ndarray
    sp_col: jnp.ndarray
    sp_val: jnp.ndarray
    shape: Tuple[int, int]
    padded_shape: Tuple[int, int]
    nb: int
    nblk: int
    nnz: int
    nnz_spill: int
    window: int = 2
    idx_fmt: str = "packed"
    seg: object = None
    seg_mixed: int = 0        # count of segments with the wide sentinel
    seg_bands: int = SEG_BANDS  # narrow-segment window width (bands)


def _reg():
    def flatten(v):
        return ((v.data, v.lanes, v.bands, v.blocks, v.band_lo,
                 v.sp_row, v.sp_col, v.sp_val, v.seg),
                (v.shape, v.padded_shape, v.nb, v.nblk, v.nnz,
                 v.nnz_spill, v.window, v.idx_fmt, v.seg_mixed,
                 v.seg_bands))

    def unflatten(aux, children):
        return BELL(*children[:8], *aux[:8], seg=children[8],
                    seg_mixed=aux[8], seg_bands=aux[9])

    jax.tree_util.register_pytree_node(BELL, flatten, unflatten)


_reg()


try:
    import ml_dtypes as _ml
    _BF16 = np.dtype(_ml.bfloat16)
except ImportError:  # pragma: no cover - ml_dtypes ships with jax
    _BF16 = None

_SLOT_BYTES = 5       # 4 B value + 1 B packed index per stored slot
_SPILL_BYTES = 12.0   # 4 B value + 4 B row + 4 B col in the COO remainder


def _capped_depth(c, spill_cost):
    """Optimal capped depth for one window with per-lane counts ``c``:
    minimize ``5*128*d + spill_cost*Σ_r max(c_r - d, 0)`` over d ≥ 0.
    Returns (cost, d)."""
    cmax = int(c.max(initial=0))
    if cmax == 0:
        return 0.0, 0
    if spill_cost is None:
        return float(_SLOT_BYTES * LANES * cmax), cmax
    d = np.arange(cmax + 1)
    overflow = np.maximum(c[:, None] - d[None, :], 0).sum(axis=0)
    cost = _SLOT_BYTES * LANES * d + spill_cost * overflow
    j = int(np.argmin(cost))
    return float(cost[j]), j


def _plan_block_windows(C, bu, spill_cost):
    """DP: cover the present bands ``bu`` (ascending) of one block with
    windows of 1–2 *consecutive* bands, minimizing total stream bytes
    ``Σ_w [5·128·d_w + spill·overflow_w]`` where each window's depth d_w
    is itself byte-optimally capped (rows deeper than d_w spill to the
    COO remainder).  ``C`` is (128, len(bu)) per-row-per-band counts.
    Returns (window start band, capped depth, width) lists."""
    nbp = len(bu)
    INF = float("inf")
    dp = np.full(nbp + 1, INF)
    choice = np.zeros(nbp + 1, dtype=np.int8)
    dcap = np.zeros(nbp + 1, dtype=np.int64)
    dp[0] = 0.0
    for j in range(1, nbp + 1):
        c1, d1 = _capped_depth(C[:, j - 1], spill_cost)
        dp[j] = dp[j - 1] + c1
        choice[j], dcap[j] = 1, d1
        if j >= 2 and bu[j - 1] == bu[j - 2] + 1:
            c2, d2 = _capped_depth(C[:, j - 1] + C[:, j - 2], spill_cost)
            if dp[j - 2] + c2 < dp[j]:
                dp[j] = dp[j - 2] + c2
                choice[j], dcap[j] = 2, d2
    starts, depths, width = [], [], []
    j = nbp
    while j > 0:
        w = int(choice[j])
        starts.append(int(bu[j - w]))
        depths.append(int(dcap[j]))
        width.append(w)
        j -= w
    starts.reverse(); depths.reverse(); width.reverse()
    return starts, depths, width


def _plan_blocks_loop(rs, cs, bs, bounds, nblocks, spill_cost):
    """Per-block-Python-loop window planning — kept as the readable
    reference oracle for :func:`_plan_blocks_py` (mirrors native.cpp
    ``bell_plan`` line for line)."""
    e_base = np.zeros(len(rs), dtype=np.int64)   # window base band
    e_woff = np.zeros(len(rs), dtype=np.int64)   # window row offset in blk
    e_cap = np.zeros(len(rs), dtype=np.int64)    # window capped depth
    depth_per_block = np.zeros(nblocks, dtype=np.int64)
    for bi in range(nblocks):
        lo, hi = bounds[bi], bounds[bi + 1]
        if lo == hi:
            continue
        bloc = bs[lo:hi]
        bu, bmap = np.unique(bloc, return_inverse=True)
        C = np.zeros((LANES, len(bu)), dtype=np.int64)
        np.add.at(C, (rs[lo:hi] % LANES, bmap), 1)
        starts, depths, width = _plan_block_windows(C, bu, spill_cost)
        # map band -> window index
        wof = np.cumsum([0] + depths[:-1])
        band2w = {}
        for wi, (s, w) in enumerate(zip(starts, width)):
            for bb in range(s, s + w):
                band2w[bb] = wi
        wsel = np.array([band2w[b] for b in bloc], dtype=np.int64)
        darr = np.array(depths, dtype=np.int64)
        e_base[lo:hi] = np.array(starts, dtype=np.int64)[wsel]
        e_woff[lo:hi] = wof[wsel]
        e_cap[lo:hi] = darr[wsel]
        depth_per_block[bi] = int(np.sum(depths))
    return e_base, e_woff, e_cap, depth_per_block


def _cap_and_cost(C, spill_cost):
    """Vectorized byte-optimal capped depth per window.  ``C`` is
    (nkeys, LANES) per-lane counts; returns (cap, cost) arrays.

    Evaluates the SAME float expression as :func:`_capped_depth`
    (``cost(d) = 5*128*d + spill*overflow(d)`` with integer overflow)
    and takes the same first-argmin, so results are bit-identical even
    where the convex cost plateaus and the minimizer is decided by
    floating-point residue (e.g. ``spill_cost = 640/t`` for integer t).
    ``overflow(d)`` comes from per-key count histograms via suffix sums
    — O(LANES + maxdepth) per key, chunked to bound the (keys, depth)
    scratch matrix."""
    nkeys = C.shape[0]
    if spill_cost is None:
        cap = C.max(axis=1)
        return cap, _SLOT_BYTES * LANES * cap.astype(np.float64)
    cap = np.zeros(nkeys, dtype=np.int64)
    cost = np.zeros(nkeys, dtype=np.float64)
    step = max(1, (1 << 22) // max(2, int(C.max(initial=0)) + 2))
    for lo in range(0, nkeys, step):
        Cc = C[lo:lo + step]
        D = int(Cc.max(initial=0))
        ch = Cc.shape[0]
        if D == 0:
            continue
        hist = np.zeros((ch, D + 1), dtype=np.int64)
        np.add.at(hist, (np.repeat(np.arange(ch), LANES), Cc.ravel()), 1)
        deeper = LANES - np.cumsum(hist, axis=1)      # #{c > d}, d=0..D
        overflow = np.zeros((ch, D + 1), dtype=np.int64)
        overflow[:, :-1] = deeper[:, :-1][:, ::-1].cumsum(axis=1)[:, ::-1]
        costs = (_SLOT_BYTES * LANES * np.arange(D + 1, dtype=np.int64)
                 + spill_cost * overflow)
        j = np.argmin(costs, axis=1)
        cap[lo:lo + step] = j
        cost[lo:lo + step] = costs[np.arange(ch), j]
    return cap, cost


def _plan_blocks_py(rs, cs, bs, bounds, nblocks, spill_cost):
    """Pure-NumPy per-block window planning — the fallback for
    environments without g++ (same plan as native.cpp ``bell_plan``
    and :func:`_plan_blocks_loop`, which it is tested against).

    Vectorized across blocks: the 1-or-2-consecutive-band window DP
    runs as a lockstep sweep over band POSITIONS (all blocks advance
    their own DP simultaneously), so the Python-level work is
    O(max bands per block) iterations instead of O(nblocks)."""
    n = len(rs)
    if n == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64), np.zeros(nblocks, np.int64))
    blks = rs // LANES
    # (block, band) keys in sorted order; kid maps entries -> keys
    key = blks * (np.int64(bs.max()) + 2) + bs
    ukey, kid = np.unique(key, return_inverse=True)
    nkeys = len(ukey)
    C = np.zeros((nkeys, LANES), dtype=np.int64)
    np.add.at(C, (kid, rs % LANES), 1)
    ublk = ukey // (np.int64(bs.max()) + 2)
    uband = ukey % (np.int64(bs.max()) + 2)

    cap1, cost1 = _cap_and_cost(C, spill_cost)
    # pair windows join key k-1 and k when same block, consecutive bands
    pair_ok = np.zeros(nkeys, dtype=bool)
    if nkeys > 1:
        pair_ok[1:] = (ublk[1:] == ublk[:-1]) & (uband[1:] == uband[:-1] + 1)
    cap2 = np.zeros(nkeys, dtype=np.int64)
    cost2 = np.full(nkeys, np.inf)
    if pair_ok.any():
        pk = np.flatnonzero(pair_ok)
        cap2[pk], cost2[pk] = _cap_and_cost(C[pk] + C[pk - 1], spill_cost)

    # per-block key ranges
    bfirst = np.flatnonzero(np.r_[True, np.diff(ublk) != 0])
    bcnt = np.diff(np.r_[bfirst, nkeys])       # keys per present block
    nb = len(bfirst)
    J = int(bcnt.max())

    # lockstep DP over band positions: dp[:, j] = best bytes covering
    # the block's first j bands; choice 1 = single-band window ending
    # at j, 2 = pair window covering bands j-1..j
    INF = np.inf
    dp = np.full((nb, J + 1), INF)
    choice = np.zeros((nb, J + 1), dtype=np.int8)
    dp[:, 0] = 0.0
    pos = np.arange(nb)
    for j in range(1, J + 1):
        act = bcnt >= j
        gk = (bfirst + (j - 1)) % nkeys   # mod only guards inactive rows
        v1 = np.where(act, dp[:, j - 1] + cost1[gk], INF)
        if j >= 2:
            ok2 = act & pair_ok[gk]
            v2 = np.where(ok2, dp[:, j - 2] + cost2[gk], INF)
        else:
            v2 = np.full(nb, INF)
        take2 = v2 < v1                         # strict: ties keep singles
        dp[:, j] = np.where(take2, v2, v1)
        choice[:, j] = np.where(act, np.where(take2, 2, 1), 0)

    # lockstep backtrack: every block walks its choice row from its top
    # position down, stamping one window per sweep iteration
    wstart = np.zeros(nkeys, dtype=bool)        # key starts a window
    wwidth = np.zeros(nkeys, dtype=np.int8)
    ptr = bcnt.copy()
    while True:
        act = ptr > 0
        if not act.any():
            break
        w = choice[pos[act], ptr[act]].astype(np.int64)
        sk = bfirst[act] + ptr[act] - w
        wstart[sk] = True
        wwidth[sk] = w.astype(np.int8)
        ptr[act] -= w
    # window cap: singles read cap1 at the start key, pairs read cap2 at
    # the SECOND key of the pair
    sidx = np.flatnonzero(wstart)
    capw = np.where(wwidth[sidx] == 2, cap2[np.minimum(sidx + 1, nkeys - 1)],
                    cap1[sidx])
    # per-key window start: widths are <= 2, so a non-start key's window
    # starts at the previous key
    ws_of_key = np.arange(nkeys)
    ws_of_key[~wstart] -= 1
    # window row offsets: cumulative depth of earlier windows in the block
    csum = np.cumsum(capw) - capw
    sblk = ublk[sidx]
    sblk_first = np.flatnonzero(np.r_[True, np.diff(sblk) != 0])
    scnt = np.diff(np.r_[sblk_first, len(sidx)])
    woff_w = csum - np.repeat(csum[sblk_first], scnt)
    # scatter window attrs back to keys, then to entries
    win_of_key = np.zeros(nkeys, dtype=np.int64)
    win_of_key[sidx] = np.arange(len(sidx))
    win = win_of_key[ws_of_key]
    cap_of_key = capw[win]
    woff_of_key = woff_w[win]
    base_of_key = uband[ws_of_key]
    depth_per_block = np.zeros(nblocks, dtype=np.int64)
    np.add.at(depth_per_block, sblk, capw)
    return (base_of_key[kid], woff_of_key[kid], cap_of_key[kid],
            depth_per_block)


def _plan_bands_sorted(rows, bs, blk, nblocks, spill_cost):
    """Vectorized single-band window planning (``window=1``) over
    entries PRE-SORTED by (block, band, row, col): each present
    (block, band) pair is its own window with a byte-optimally capped
    depth.  Same contract as the pair-DP planners (per-entry base band
    / window row offset / capped depth + per-block depth) plus the
    (row, window) group starts for the ordinal pass — all from
    run-boundary flags on the sorted arrays (no np.unique, no per-block
    Python loop, no native planner needed)."""
    n = len(rows)
    newb = np.empty(n, dtype=bool)
    newb[0] = True
    np.not_equal(blk[1:], blk[:-1], out=newb[1:])
    neww = np.empty(n, dtype=bool)
    neww[0] = True
    np.not_equal(bs[1:], bs[:-1], out=neww[1:])
    neww |= newb                      # (block, band) window boundaries
    kid = np.cumsum(neww) - 1         # window id per entry, 0..nkeys-1
    nkeys = int(kid[-1]) + 1 if n else 0
    C = np.zeros((nkeys, LANES), dtype=np.int64)
    np.add.at(C, (kid, rows % LANES), 1)
    if spill_cost is None:
        cap = C.max(axis=1)
    else:
        # marginal analysis of cost(d) = 5·128·d + spill·overflow(d):
        # raising d by one pays 5·128 bytes and saves
        # spill·#{lanes with count ≥ d}; the optimum is the largest d
        # still worth paying for — the t-th largest per-lane count with
        # t = ceil(5·128 / spill).
        t = int(np.ceil(_SLOT_BYTES * LANES / spill_cost))
        if t > LANES:
            cap = np.zeros(nkeys, dtype=np.int64)
        elif t < 1:
            cap = C.max(axis=1)
        else:
            cap = np.partition(C, LANES - t, axis=1)[:, LANES - t]
    wfirst = np.flatnonzero(neww)     # first entry of each window
    blk_of_key = blk[wfirst]
    csum = np.cumsum(cap) - cap
    kfirst = np.flatnonzero(np.r_[True, np.diff(blk_of_key) != 0])
    kcnt = np.diff(np.r_[kfirst, nkeys])
    woff_key = csum - np.repeat(csum[kfirst], kcnt)
    depth_per_block = np.zeros(nblocks, dtype=np.int64)
    np.add.at(depth_per_block, blk_of_key, cap)
    # (row, window) ordinal-group starts: row changes OR window changes
    newg = neww.copy()
    newg[1:] |= rows[1:] != rows[:-1]
    gfirst = np.flatnonzero(newg)
    return (bs, woff_key[kid], cap[kid], depth_per_block, gfirst)


def bell_from_coo(coo: F.COO, nblk=None, nb_max: int = NB_MAX,
                  min_cols: int = 0, spill_cost: float = _SPILL_BYTES,
                  device: bool = True, window: int = 2,
                  idx_fmt: str = "packed", segment: bool = False) -> BELL:
    """Pack COO triples into BELL v2 (host-side).

    ``spill_cost`` is the per-entry byte cost charged for routing an
    entry to the COO remainder instead of a kernel slot; the packer
    minimizes total streamed bytes under it.  ``None`` disables
    spilling (every entry gets a slot, as v1 did).

    ``device=False`` keeps the container arrays in NumPy — candidate
    packings that may be discarded must not ride the device transport
    (tens of MB each through a remote tunnel).

    ``window=2`` (v2 layout) plans one-or-two-band windows with the
    per-block DP; ``window=1`` (v3) plans single-band windows with
    8-aligned block depths, enabling the kernel's grouped scatter
    (8x smaller scatter matmul) and halving the staging matmul — at
    a ~1.2-1.5x slot (stream) cost.  Faster whenever the kernel is
    MXU-bound rather than HBM-bound (scattered sparsity); the banded /
    high-fill regime keeps v2.

    ``segment=True`` enables SEGMENTED staging for wide windows
    (``window=1`` packings whose span exceeds ``SEG_BANDS``): each
    step's 4-row scatter groups are sorted by base band and split into
    ``SEG_ROWS``-row segments, each staging only a ``SEG_BANDS``-band
    slice of the step's x window — the one-hot staging matmuls (whose
    (nb, GS) operands made wide-window packings run ~3x their per-slot
    cost model in round 4) then cost the same as an nb=256 packing
    regardless of the true window width.  Falls back to monolithic
    staging when some sorted segment still spans more than
    ``SEG_BANDS`` bands (the container's ``seg`` field stays None).
    The 4-row group order is free to permute: the grouped scatter map
    is arbitrary per group and the depth fold is group-local.

    Raises :class:`SpanError` when some step's column span exceeds
    ``nb_max`` bands.
    """
    if idx_fmt not in ("packed", "int8"):
        raise ValueError("idx_fmt must be 'packed' or 'int8', got %r"
                         % (idx_fmt,))
    m, n = coo.shape
    rows = np.asarray(coo.row).astype(np.int64)
    cols = np.asarray(coo.col).astype(np.int64)
    vals = np.asarray(coo.data)
    store_dtype = vals.dtype
    if store_dtype == _BF16:
        # bf16 STORAGE (2 B/slot value stream; the kernel computes in
        # f32 — exact in the stored matrix): NumPy ufuncs like add.at
        # don't cover ml_dtypes, so pack through f32 (bf16->f32 is
        # exact) and round the emitted arrays back
        vals = vals.astype(np.float32)
    nnz = len(vals)
    if nnz == 0:
        # synthetic zero entry so the shapes below are non-degenerate;
        # it must never be spill-analyzed (a spurious remainder entry
        # would report nnz_spill=1 > nnz=0 and corrupt fill stats)
        rows = np.zeros(1, dtype=np.int64)
        cols = np.zeros(1, dtype=np.int64)
        vals = np.zeros(1, dtype=vals.dtype)
        spill_cost = None

    nblocks = max(1, -(-m // LANES))
    ncb = max(1, -(-n // LANES), -(-min_cols // LANES))
    blk = rows // LANES
    band = cols // LANES

    # --- per-block window plan (DP over present bands) ---------------
    if window == 1:
        # Single-sort pipeline: order by (block, band, row, col) so
        # (block, band) windows AND (row, window) ordinal groups are
        # both contiguous runs — no np.unique, no second lexsort, no
        # ordinal scatter-back (each costs seconds at 1M rows on a
        # slow host).  The native planner fuses sort + caps + ordinals
        # in one C++ pass.
        plan = None
        try:
            from .. import native as _native
            plan = _native.bell_sort_plan_w1_native(rows, cols, nblocks,
                                                    spill_cost)
        except Exception:  # pragma: no cover - no compiler in env
            plan = None
        if plan is not None:
            order, rs, cs, e_woff, e_cap, k1, depth_per_block = plan
            bs = cs // LANES
            vs = vals[order]
            e_base = bs
            gfirst = None
        else:
            order = np.lexsort((cols, rows, band, rows // LANES))
            rs, cs, bs, vs = (rows[order], cols[order], band[order],
                              vals[order])
            k1 = None
            e_base, e_woff, e_cap, depth_per_block, gfirst = \
                _plan_bands_sorted(rs, bs, rs // LANES, nblocks,
                                   spill_cost)
        blks = bs_blk = rs // LANES
        bounds = np.searchsorted(bs_blk, np.arange(nblocks + 1))
        # 4-align block depths so scatter groups never straddle blocks
        # (the kernel folds 4-row halves of each (8,128) tile; 8-align
        # wasted +24% slots on jpwh-class scatter, 4-align +7.5%)
        depth_per_block = -(-depth_per_block // 4) * 4
    else:
        order = np.lexsort((cols, rows))
        rs, cs, bs, vs = rows[order], cols[order], band[order], vals[order]
        blks = bs_blk = rs // LANES
        bounds = np.searchsorted(bs_blk, np.arange(nblocks + 1))
        plan = None
        try:
            # native C++ planner: the per-block DP is the packer's
            # Python hot spot (~30-45 s at 1M rows; <2 s native)
            from .. import native as _native
            plan = _native.bell_plan_native(rs, cs, nblocks, spill_cost)
        except Exception:  # pragma: no cover - no compiler in env
            plan = None
        if plan is not None:
            e_base, e_woff, e_cap, depth_per_block = plan
        else:
            e_base, e_woff, e_cap, depth_per_block = _plan_blocks_py(
                rs, cs, bs, bounds, nblocks, spill_cost)
        depth_per_block = np.maximum(depth_per_block, 1)
        # 4-align so the grouped scatter applies to band-pair windows
        # too (window caps stay exact; only block TOTALS pad)
        depth_per_block = -(-depth_per_block // 4) * 4

    # --- per-entry depth ordinal within (row, window) -----------------
    # Entries whose ordinal reaches the window's capped depth spill to
    # the COO remainder.
    if window == 1:
        if k1 is not None:       # native planner already computed them
            k = k1
        else:
            # already sorted so (row, window) groups are contiguous;
            # the planner returned their start offsets
            gsizes = np.diff(np.r_[gfirst, len(rs)])
            k = np.arange(len(rs)) - np.repeat(gfirst, gsizes)
    else:
        # entries are (row, col)-sorted; within a row, same-window
        # entries are consecutive in this order only per band pair —
        # order by (row, window) explicitly
        wkey = blks * (2 * ncb + 2) + e_base  # unique per (blk, window)
        okey = np.lexsort((cs, wkey, rs))
        r2, w2 = rs[okey], wkey[okey]
        gfirst = np.flatnonzero(np.r_[True, (np.diff(r2) != 0) |
                                      (np.diff(w2) != 0)])
        gsizes = np.diff(np.r_[gfirst, len(r2)])
        k2 = np.arange(len(r2)) - np.repeat(gfirst, gsizes)
        k = np.empty(len(rs), dtype=np.int64)
        k[okey] = k2
    keep = k < e_cap

    # per-block window-base extent (kept entries only — the remainder
    # never touches the kernel's x window), for sizing each step's span
    blk_lo = np.full(nblocks, np.iinfo(np.int64).max, dtype=np.int64)
    blk_hi = np.full(nblocks, -1, dtype=np.int64)
    np.minimum.at(blk_lo, blks[keep], e_base[keep])
    np.maximum.at(blk_hi, blks[keep], e_base[keep])

    def _step_span(nb_per_step):
        ns = -(-nblocks // nb_per_step)
        lo = np.full(ns * nb_per_step, np.iinfo(np.int64).max, np.int64)
        hi = np.full(ns * nb_per_step, -1, np.int64)
        lo[:nblocks], hi[:nblocks] = blk_lo, blk_hi
        slo = lo.reshape(ns, nb_per_step).min(1)
        shi = hi.reshape(ns, nb_per_step).max(1)
        ok = shi >= 0
        return int((shi[ok] - slo[ok]).max()) + 2 if ok.any() else 2

    # --- steps of nblk blocks, padded to uniform GS -------------------
    if nblk is None:
        avg_d = max(1.0, float(depth_per_block.mean()))
        # w1's cheaper per-slot path tolerates (and measured-prefers)
        # larger steps: GS 1440-2144 beat 1088 by ~10% on the 1M-row
        # chain (probe_bell_chain), so target ~1.5x more rows per step
        gs_target = GS_TARGET * 3 // 2 if window == 1 else GS_TARGET
        cap = 96 if window == 1 else 64
        nblk = int(max(1, min(cap, round(gs_target / avg_d))))
        nblk = max(8, -(-int(nblk) // 8) * 8)
        # fewer blocks per step ⇒ narrower per-step column span; shrink
        # until the x window fits the budget (the final check still
        # raises if even 8 blocks/step cannot fit).  When the WHOLE
        # column space fits one window (full-width matrices like the
        # 131k power-law class: exactly nb_max bands), shrinking buys
        # nothing — the conservative +2 margin here otherwise forces
        # nblk=8 and fragments the grid into tiny steps (r5).
        if -(-n // LANES) > nb_max:
            while nblk > 8 and _step_span(nblk) > nb_max:
                nblk = max(8, nblk // 2)
    nblk = max(8, -(-int(nblk) // 8) * 8)
    # more blocks per step than exist just inflates the scatter matmul
    nblk = min(nblk, max(8, -(-nblocks // 8) * 8))

    def _gs_for(nblk_c):
        ns = -(-nblocks // nblk_c)
        d = np.zeros(ns * nblk_c, dtype=np.int64)
        d[:nblocks] = depth_per_block
        return max(32, -(-int(d.reshape(ns, nblk_c).sum(1).max())
                         // 32) * 32)

    # scoped-VMEM feasibility cap: the kernel's stack transients scale
    # with GS (~10 slots of (GS, 128) f32) next to >= 2 ring slots —
    # a packing the acceptance guard (linop._try_bell) would reject
    # must not be generated when a smaller nblk avoids it
    nbE = min(nb_max, max(8, -(-n // LANES)))
    while nblk > 8:
        GS_e = _gs_for(nblk)
        ring_e = (nbE * LANES * 4 + GS_e * LANES * 4
                  + (GS_e // 4) * LANES * 4)
        if 10 * GS_e * LANES * 4 + 2 * ring_e <= (15 << 20):
            break
        nblk = max(8, nblk - 8)
    nsteps = -(-nblocks // nblk)
    nblocks_p = nsteps * nblk

    dpb = np.zeros(nblocks_p, dtype=np.int64)
    dpb[:nblocks] = depth_per_block
    step_of_block = np.arange(nblocks_p) // nblk
    rows_per_step = np.zeros(nsteps, dtype=np.int64)
    np.add.at(rows_per_step, step_of_block, dpb)
    # lanes/4 stays 8-aligned; >= 32 even when the byte-optimal plan
    # spills every entry (the kernel then just emits zeros and the COO
    # remainder carries the matrix)
    GS = max(32, -(-int(rows_per_step.max()) // 32) * 32)

    # sublane-row offset of each block within its step
    roff = np.cumsum(dpb) - dpb
    step_row0 = np.zeros(nsteps, dtype=np.int64)
    step_row0[1:] = np.cumsum(rows_per_step)[:-1]
    row_in_step_of_block = roff - step_row0[step_of_block]

    # --- kept-entry placement ------------------------------------------
    rs_k, cs_k, vs_k = rs[keep], cs[keep], vs[keep]
    blks_k, base_k = blks[keep], e_base[keep]
    e_step = blks_k // nblk
    e_q = (row_in_step_of_block[blks_k] + e_woff[keep]
           + k[keep])                                 # sublane row in step
    e_lane = rs_k % LANES
    e_idx = cs_k - base_k * LANES                     # in [0, 128*window)
    if len(e_idx):
        assert e_idx.min() >= 0 and e_idx.max() < LANES * window

    # --- window span per step ----------------------------------------
    band_lo_raw = np.full(nsteps, 2**31 - 1, dtype=np.int64)
    band_hi = np.zeros(nsteps, dtype=np.int64)
    np.minimum.at(band_lo_raw, e_step, base_k)
    np.maximum.at(band_hi, e_step, base_k)
    band_lo_raw = np.minimum(band_lo_raw, band_hi)
    # 8-align the window starts: Mosaic dynamic HBM slices of operands
    # wider than one lane tile (the SpMM kernel's (nbands, K*128) x
    # block) must be provably 8-divisible in the sliced dimension
    band_lo_raw = (band_lo_raw // 8) * 8
    span = int((band_hi - band_lo_raw).max()) + window if nnz else window
    # budget check on the TRUE span; nb itself rounds up to the 8-aligned
    # DMA shape (a non-multiple-of-8 nb_max must not reject fitting spans)
    if span > nb_max:
        raise SpanError(
            "step column span of %d bands exceeds the %d-band window "
            "budget; RCM-reorder the matrix or use the ELL path"
            % (span, nb_max))
    nb = max(8, -(-span // 8) * 8)
    ncb = max(ncb, nb)
    # the right-edge clamp must PRESERVE the 8-alignment the SpMM
    # kernel's oct-unit window start depends on: pad the x bands so the
    # clamp target (ncb - nb) is itself a multiple of 8 (<= 7 extra
    # zero bands; a non-aligned clamp silently shifted the SpMM window
    # left and returned wrong products on right-edge steps)
    ncb = nb + -(-(ncb - nb) // 8) * 8
    band_lo = np.minimum(band_lo_raw, ncb - nb).astype(np.int32)
    assert not band_lo.size or not (band_lo % 8).any()

    # --- segmented staging (wide single-band windows) ------------------
    # Sort each step's 4-row scatter groups by base band, split rows
    # into SEG_ROWS segments, give each its own SEG_BANDS sub-window:
    # the staging one-hots then cost O(SEG_BANDS · GS) per step instead
    # of O(nb · GS).  Group order is free (the scatter map is per-group
    # and the fold is group-local); kept-entry placement just rides the
    # permuted sublane-row positions.
    seg = None
    seg_mixed = 0
    seg_bands = SEG_BANDS
    base_rel = base_k - band_lo[e_step].astype(np.int64)
    gperm = None
    if segment and window == 1 and nb > SEG_BANDS and len(e_q):
        gsg = GS // 4
        gmin = np.full((nsteps, gsg), np.iinfo(np.int64).max)
        np.minimum.at(gmin, (e_step, e_q // 4), base_rel)
        order = np.argsort(gmin, axis=1, kind="stable")  # new pos -> old g
        inv = np.argsort(order, axis=1, kind="stable")   # old g -> new pos
        e_q2 = inv[e_step, e_q // 4] * 4 + (e_q % 4)
        nseg = -(-GS // SEG_ROWS)
        eseg = e_q2 // SEG_ROWS
        big = np.iinfo(np.int64).max
        smin = np.full((nsteps, nseg), big)
        smax = np.full((nsteps, nseg), -1)
        np.minimum.at(smin, (e_step, eseg), base_rel)
        np.maximum.at(smax, (e_step, eseg), base_rel)
        smin0 = np.where(smin == big, 0, smin)
        # Candidate narrow widths: pick the one minimizing the measured
        # two-term staging model (3.2 ps per staged (band, row) pair —
        # probe_ablate_r5); segments whose sorted span exceeds even the
        # widest candidate stage against the FULL window in-kernel
        # (sentinel -8, bands stay window-relative).  Monolithic staging
        # (nsteps · nb · GS) stays when it models cheaper.
        best = (nsteps * nb * GS, None)   # (staged band·rows, plan)
        for W in (256, 384, 512):
            if W >= nb:
                break
            sloW = np.minimum(smin0 // 8 * 8, nb - W)
            narW = smax - sloW <= W - window
            nwide = int((~narW).sum())
            cost = ((narW.size - nwide) * W + nwide * nb) * SEG_ROWS
            if cost < best[0]:
                best = (cost, (W, sloW, narW, nwide))
        if best[1] is not None:
            seg_bands, slo, narrow, seg_mixed = best[1]
            e_nar = narrow[e_step, eseg]
            base_rel = np.where(e_nar, base_rel - slo[e_step, eseg],
                                base_rel)
            e_q = e_q2
            seg = np.where(narrow, slo, -8).astype(np.int32)
            gperm = order

    # --- emit arrays ---------------------------------------------------
    data = np.zeros((nsteps, GS, LANES), dtype=vals.dtype)
    # idx fits a byte by construction (window-local < 128*window); the
    # u8 scratch is upcast once at packing time
    idx8 = np.zeros((nsteps, GS, LANES), dtype=np.uint8)
    bands = np.zeros((nsteps, 1, GS), dtype=np.int32)

    # add.at: duplicate COO entries accumulate (matches to_dense).
    # Every non-dummy sublane row (window, k) has k < d_w ≤ max_r count,
    # so some row with count > k witnesses it (that row's k-th entry is
    # kept): bands/blocks are fully covered by the per-entry writes
    # (all entries at a row agree on base and block).
    np.add.at(data, (e_step, e_q, e_lane), vs_k)
    idx8[e_step, e_q, e_lane] = e_idx
    bands[e_step, 0, e_q] = base_rel.astype(np.int32)

    # grouped scatter map (both window modes): one block id per
    # 4-sublane-row group (depths are 4-aligned so groups never straddle
    # blocks).  The kernel reduces each (8,128) tile's two 4-row halves
    # separately and concatenates [even halves | odd halves], so the map
    # is stored in that split order.
    gsg = GS // 4
    blocksN = np.full((nsteps, gsg), nblk, dtype=np.int32)
    ngrp = dpb // 4
    tot = int(ngrp.sum())
    if tot:
        gstep = np.repeat(step_of_block, ngrp)
        gpos0 = np.repeat(row_in_step_of_block // 4, ngrp)
        within = np.arange(tot) - np.repeat(np.cumsum(ngrp) - ngrp,
                                            ngrp)
        blocksN[gstep, gpos0 + within] = np.repeat(
            np.arange(nblocks_p) % nblk, ngrp).astype(np.int32)
    if gperm is not None:
        # new group position p holds old group gperm[st, p]
        blocksN = np.take_along_axis(blocksN, gperm, axis=1)
    blocks = np.concatenate([blocksN[:, 0::2], blocksN[:, 1::2]],
                            axis=1)[:, None, :]

    if seg is not None:
        # segmented layout stores bands (nsteps, nseg, SEG_ROWS), tail
        # zero-padded: each kernel segment reads its bands at lane
        # offset 0 (a lane-offset slice of a (1, GS) row cannot be
        # sublane-broadcast by Mosaic)
        nseg = seg.shape[1]
        bpad = np.zeros((nsteps, nseg * SEG_ROWS), dtype=np.int32)
        bpad[:, :GS] = bands[:, 0, :]
        bands = bpad.reshape(nsteps, nseg, SEG_ROWS)

    if idx_fmt == "int8":
        lanes_packed = idx8  # stored directly (uint8, zero-extended load)
    else:
        lanes_packed = _pack_idx(idx8)

    # COO remainder (the spilled tail)
    sp = ~keep
    nnz_spill = int(sp.sum())
    sp_row = rs[sp].astype(np.int32)
    sp_col = cs[sp].astype(np.int32)
    sp_val = vs[sp]
    if store_dtype == _BF16:
        data = data.astype(store_dtype)
        sp_val = sp_val.astype(store_dtype)

    cvt = jnp.asarray if device else np.asarray
    return BELL(cvt(data), cvt(lanes_packed), cvt(bands), cvt(blocks),
                cvt(band_lo), cvt(sp_row), cvt(sp_col), cvt(sp_val),
                (m, n), (nsteps * nblk * LANES, ncb * LANES),
                int(nb), int(nblk), nnz, nnz_spill, int(window),
                str(idx_fmt), seg=None if seg is None else cvt(seg),
                seg_mixed=int(seg_mixed), seg_bands=int(seg_bands))


def bell_to_device(b: BELL) -> BELL:
    """Ship a host-resident (NumPy) BELL's arrays to the device."""
    return BELL(*(jnp.asarray(c) for c in b[:8]), *b[8:16],
                seg=None if b.seg is None else jnp.asarray(b.seg),
                seg_mixed=b.seg_mixed, seg_bands=b.seg_bands)


def bell_fill(b: BELL) -> float:
    """Fraction of stored value slots holding true (kernel-path)
    nonzeros; the COO remainder holds the other ``nnz_spill``."""
    return (b.nnz - b.nnz_spill) / max(1, int(np.prod(b.data.shape)))


def bell_stream_bytes(b: BELL) -> int:
    """Bytes the SpMV streams from HBM for the matrix itself: value +
    packed-index slots plus the COO remainder triples (excludes the
    x window and y, which are O(rows) not O(nnz))."""
    # read dtype off the array directly — np.asarray on a device-resident
    # array pulls the whole buffer through the transport (CLAUDE.md)
    itm = np.dtype(b.data.dtype).itemsize
    slots = int(np.prod(b.data.shape))
    return slots * (itm + 1) + b.nnz_spill * (itm + 8)


def _pack_idx(idx8):
    """Pack (nsteps, GS, LANES) byte indices 4-per-int32: byte j of
    word m is sublane row ``j*GS/4 + m`` — the layout contract the
    kernel's unpack concat depends on (single source of truth; the
    sharded repack in ``bell_sharded`` reuses this)."""
    nsteps, GS, L = idx8.shape
    i4 = idx8.reshape(nsteps, 4, GS // 4, L).astype(np.uint32)
    return (i4[:, 0] | (i4[:, 1] << 8) | (i4[:, 2] << 16)
            | (i4[:, 3] << 24)).view(np.int32)


def _unpack_idx(b: BELL):
    """(nsteps, GS, LANES) int window-local indices (host-side)."""
    if b.idx_fmt == "int8":
        return np.asarray(b.lanes).astype(np.int64)
    p = np.asarray(b.lanes).astype(np.int64) & 0xFFFFFFFF
    parts = [(p >> (8 * j)) & 255 for j in range(4)]
    return np.concatenate(parts, axis=1)


def bell_with_values_dtype(b: BELL, dtype) -> BELL:
    """Round a BELL container's stored values to ``dtype`` (host- or
    device-side) without re-planning — e.g. bf16 storage (3 B/slot
    stream; the kernel computes at the promoted dtype, see
    ``_bell_matvec_call``).

    MEMORY-FOOTPRINT-ONLY knob for the matvec, by measurement: the
    kernel is compute-bound — time/slot = max(stream ~8.6 ps, compute
    ~12.5 ps on v5e) — so halving the value stream changes wall time by
    exactly 1.00x (BENCH r2/r3 bf16 legs; per-op breakdown and the
    rejected compute-reduction attempts in ROADMAP.md 'BELL general
    SpMV').  It still cuts HBM residency ~40% (larger systems fit) and
    the matvec stays exact in the stored (bf16-rounded) matrix."""
    dtype = jnp.dtype(dtype) if not isinstance(b.data, np.ndarray) \
        else np.dtype(dtype)
    if b.data.dtype == dtype:
        return b
    return b._replace(data=b.data.astype(dtype),
                      sp_val=b.sp_val.astype(dtype))


def bell_with_idx_fmt(b: BELL, idx_fmt: str) -> BELL:
    """Repack a BELL container's index storage (host-side) without
    re-planning; useful for A/B-ing the kernel's unpack path."""
    if idx_fmt == b.idx_fmt:
        return b
    idx = _unpack_idx(b).astype(np.uint8)
    if idx_fmt == "int8":
        lanes = idx
    elif idx_fmt == "packed":
        lanes = _pack_idx(idx)
    else:
        raise ValueError("idx_fmt must be 'packed' or 'int8'")
    cvt = jnp.asarray if not isinstance(b.data, np.ndarray) else np.asarray
    return b._replace(lanes=cvt(lanes), idx_fmt=str(idx_fmt))


def bell_to_dense(b: BELL):
    """Host-side oracle reconstruction (NumPy; tests only)."""
    mp, npad = b.padded_shape
    out = np.zeros((mp, npad), dtype=np.asarray(b.data).dtype)
    data = np.asarray(b.data)
    idx = _unpack_idx(b)
    nst = np.asarray(b.data).shape[0]
    # (nsteps, 1, GS) monolithic or (nsteps, nseg, SEG_ROWS) segmented
    bands = np.asarray(b.bands).reshape(nst, -1)[:, :b.data.shape[1]]
    blocks = np.asarray(b.blocks)[:, 0, :]
    band_lo = np.asarray(b.band_lo)
    seg = None if b.seg is None else np.asarray(b.seg)
    nsteps, GS, L = data.shape
    for st in range(nsteps):
        for q in range(GS):
            g4 = q // 4       # storage order: [even halves | odd halves]
            blko = blocks[st, g4 // 2 + (g4 % 2) * (GS // 8)]
            if blko >= b.nblk:
                continue
            blkrow = (st * b.nblk + blko) * LANES
            base = bands[st, q]
            if seg is not None:
                s = seg[st, q // SEG_ROWS]
                if s >= 0:        # narrow segment: segment-relative
                    base = base + s
                # wide sentinel (-8): bands stay window-relative
            col0 = (band_lo[st] + base) * LANES
            for r in range(L):
                v = data[st, q, r]
                if v != 0:
                    out[blkrow + r, col0 + idx[st, q, r]] += v
    np.add.at(out, (np.asarray(b.sp_row), np.asarray(b.sp_col)),
              np.asarray(b.sp_val))
    return out[:b.shape[0], :b.shape[1]]


def _dot_onehot(oh, v, passes=3, transposed=False):
    """``oh @ v`` where ``oh`` is a 0/1 one-hot matrix.

    One-hot entries are exact in bf16, so splitting only ``v`` into
    ``passes`` bf16 components gives (passes·8)-bit-mantissa accuracy —
    3 passes ≈ f32 at half the MXU passes of ``Precision.HIGHEST``
    (which must split both operands); 2 passes trade ~1.5e-5 relative
    error for 1/3 less MXU time.  f64 (CPU interpret oracle runs) keeps
    the native product.

    ``transposed=True`` computes ``oh.T @ v`` (contraction over dim 0
    of both operands) — same MXU cost, lets callers build the one-hot
    in lane-major orientation.
    """
    dims = ((((0,) if transposed else (1,)), (0,)), ((), ()))
    if v.dtype != jnp.float32 or passes is None:
        # native-precision product: exact for a one-hot operand under
        # Precision.HIGHEST; costs 6 MXU passes but ZERO VPU work —
        # the right trade in the VPU-bound regime (see _bell_kernel)
        return jax.lax.dot_general(oh.astype(v.dtype), v, dims,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=v.dtype)
    ohb = oh.astype(jnp.bfloat16)
    out = None
    r = v
    for _ in range(passes):
        vp = r.astype(jnp.bfloat16)
        r = r - vp.astype(jnp.float32)
        t = jax.lax.dot_general(ohb, vp, dims,
                                preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


def _select_int8(ohs, w, transposed=False):
    """Exact f32 one-hot selects via int8 bit planes on the MXU.

    A one-hot row picks exactly one element, so transporting the f32
    BITS through int8 matmuls is lossless: split the window into four
    byte planes (packed along lanes), run one (k·GS, nb) @ (nb, 512)
    int8 matmul with int32 accumulation over the ``k`` stacked one-hot
    operands, mask each accumulator back to its byte (int8
    sign-extends bytes >= 128) and reassemble.  v5e MXU int8 rate is
    2x bf16, so this replaces 3 bf16 passes with the equivalent of 2 —
    exact instead of ~f32-rounded.
    """
    L = w.shape[-1]
    bits = jax.lax.bitcast_convert_type(w, jnp.int32)
    planes = jnp.concatenate(
        [((bits >> (8 * j)) & 255).astype(jnp.int8) for j in range(4)],
        axis=1)                                           # (nb, 4L)

    def one(oh):
        dims = ((((0,) if transposed else (1,)), (0,)), ((), ()))
        acc = jax.lax.dot_general(oh.astype(jnp.int8), planes, dims,
                                  preferred_element_type=jnp.int32)
        out = ((acc[:, :L] & 255) | ((acc[:, L:2 * L] & 255) << 8)
               | ((acc[:, 2 * L:3 * L] & 255) << 16)
               | ((acc[:, 3 * L:] & 255) << 24))
        return jax.lax.bitcast_convert_type(out, jnp.float32)

    if transposed or len(ohs) == 1:
        return tuple(one(oh) for oh in ohs)
    gs = ohs[0].shape[0]
    y = one(jnp.concatenate(ohs, axis=0))
    return tuple(y[i * gs:(i + 1) * gs] for i in range(len(ohs)))


def _bell_kernel(nb, nblk, GS, nsteps, passes, stage, window, nring,
                 seg_sizes, seg_mixed, seg_bands, band_lo_ref, seg_ref,
                 data_hbm, lanes_hbm, bands_ref, blocks_ref, x_hbm,
                 y_ref, win, sems, dbuf, dsems, lbuf, lsems, *scr):
    st = pl.program_id(0)
    L = LANES
    GQ = GS // 4

    # nring slots give an (nring-1)-deep prefetch distance: with only
    # nring-1 slots, step st's start for st+nring-1 would overwrite the
    # very slot st is about to read (distance-0 write/read race).
    # nring adapts to GS (deep-block packings would blow scoped VMEM at
    # the default depth — see _bell_matvec_call).
    nslots = nring
    AHEAD = nring - 1

    def win_dma(step):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(band_lo_ref[step], nb), :],
            win.at[step % nslots], sems.at[step % nslots])

    # data/lanes stream through manual rings too: the automatic BlockSpec
    # pipeline only double-buffers, and with per-step DMA latency on par
    # with per-step compute that floors the stream at ~520 GB/s of the
    # chip's ~1070 achievable; a deeper ring keeps several block copies
    # in flight (measured: the whole kernel was stream-floor-bound).
    def dat_dma(step):
        return pltpu.make_async_copy(
            data_hbm.at[step], dbuf.at[step % nslots],
            dsems.at[step % nslots])

    def lan_dma(step):
        return pltpu.make_async_copy(
            lanes_hbm.at[step], lbuf.at[step % nslots],
            lsems.at[step % nslots])

    # Ring-buffered prefetch: a one-step-ahead double buffer stalls
    # every step on HBM DMA latency.
    @pl.when(st == 0)
    def _():
        for kk in range(min(AHEAD, nsteps)):
            win_dma(kk).start()
            dat_dma(kk).start()
            lan_dma(kk).start()
    win_dma(st).wait()
    dat_dma(st).wait()
    lan_dma(st).wait()

    @pl.when(st + AHEAD < nsteps)
    def _():
        win_dma(st + AHEAD).start()
        dat_dma(st + AHEAD).start()
        lan_dma(st + AHEAD).start()

    slot = st % nslots
    dat = dbuf[slot]                                       # (GS, 128)
    p = lbuf[slot]                                         # (GQ, 128)

    nseg = len(seg_sizes)
    if seg_sizes and seg_mixed:
        # SEGMENTED staging, mixed mode: narrow segments (seg >= 0)
        # stage a SEG_BANDS-band slice of the x window; wide segments
        # (sentinel -1 in /8 units — sorted scatter tails that fit no
        # 256-band window) stage against the full (nb, rows) window.
        # Predicated writes land in a VMEM scratch because each branch
        # must only PAY when taken.  bands is stored (1, nseg,
        # SEG_ROWS) so every segment's row reads at lane offset 0.
        xs = scr[0]
        for si in range(nseg):
            sb = seg_ref[st, si]
            bseg = bands_ref[0, si:si + 1, :]             # (1, SEG_ROWS)
            r0 = si * SEG_ROWS

            # two predicated branches per segment; an unconditional
            # narrow pass + predicated wide OVERWRITE was measured
            # SLOWER (power_law 0.451 -> 0.496 ms/mv: the wasted narrow
            # staging on wide segments exceeds the branch savings)
            @pl.when(sb >= 0)
            def _(r0=r0, sb=sb, bseg=bseg):
                iot_s = jax.lax.broadcasted_iota(
                    jnp.int32, (seg_bands, SEG_ROWS), 0)
                wseg = win[slot, pl.ds(sb * 8, seg_bands), :]
                xs[r0:r0 + SEG_ROWS, :] = _dot_onehot(
                    iot_s == bseg, wseg, passes, transposed=True)

            @pl.when(sb < 0)
            def _(r0=r0, bseg=bseg):
                iot_w = jax.lax.broadcasted_iota(
                    jnp.int32, (nb, SEG_ROWS), 0)
                xs[r0:r0 + SEG_ROWS, :] = _dot_onehot(
                    iot_w == bseg, win[slot], passes, transposed=True)

        xsel = xs[:GS, :]
        w = xsel  # dtype witness for the cast below
    elif seg_sizes:
        # SEGMENTED staging (window=1 only): sublane rows were pack-time
        # sorted by base band and split into SEG_ROWS segments; segment
        # si stages only the SEG_BANDS-band slice of the x window at
        # seg_ref[st, si] (stored /8 so the dynamic VMEM sublane start
        # is syntactically 8-aligned).  Staging cost per step is
        # O(SEG_BANDS · GS) whatever the packing-wide nb — the wide-
        # window fix of round 5 (BENCH_r04 measured ~40 ps/slot at
        # nb=1024 vs the 12.5 ps model; the (nb, GS) one-hots were the
        # cost).  `bands` holds SEGMENT-relative bases.
        parts = []
        for si in range(nseg):
            sb = seg_ref[st, si] * 8
            wseg = win[slot, pl.ds(sb, seg_bands), :]
            bseg = bands_ref[0, si:si + 1, :]             # (1, SEG_ROWS)
            iot_s = jax.lax.broadcasted_iota(
                jnp.int32, (seg_bands, SEG_ROWS), 0)
            parts.append(_dot_onehot(iot_s == bseg, wseg, passes,
                                     transposed=True))    # (SEG_ROWS, 128)
        xsel = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                else parts[0])[:GS, :]
        w = xsel  # dtype witness for the cast below
    else:
        base = bands_ref[0]                                # (1, GS)
        w = win[slot]                                      # (nb, 128)

    # Stage each sublane row's candidate band(s): base (+ base+1 for
    # two-band windows).  The one-hot is built TRANSPOSED, (nb, GS):
    # bands rides along as a lane-major (1, GS) row (a (GS, 1) layout
    # wastes a full (8,128) VMEM tile per 8 values and its strided DMA
    # measurably stalls the stream); the MXU contracts dim 0 of both
    # operands at identical cost.
    iot = None if seg_sizes else \
        jax.lax.broadcasted_iota(jnp.int32, (nb, GS), 0)
    if seg_sizes:
        pass
    elif stage == "bf16s" and w.dtype == jnp.float32:
        # Stacked-contraction staging: put the three exact bf16
        # components of w along the CONTRACTION dim so the MXU
        # accumulates them internally — one dot, one f32 output, no
        # VPU pass-adds (the kernel is VMEM-traffic-bound; every
        # avoided (GS,128) intermediate matters).
        comps, r = [], w
        for _ in range(3):
            vp = r.astype(jnp.bfloat16)
            r = r - vp.astype(jnp.float32)
            comps.append(vp)
        w3 = jnp.concatenate(comps, axis=0)                # (3nb, 128)
        oh = (iot == base).astype(jnp.bfloat16)
        oh3 = jnp.concatenate([oh, oh, oh], axis=0)        # (3nb, GS)
        dimsT = (((0,), (0,)), ((), ()))
        xsel = jax.lax.dot_general(
            oh3, w3, dimsT, preferred_element_type=jnp.float32)
        if window != 1:
            oh1 = (iot == base + 1).astype(jnp.bfloat16)
            oh31 = jnp.concatenate([oh1, oh1, oh1], axis=0)
            xsel1 = jax.lax.dot_general(
                oh31, w3, dimsT, preferred_element_type=jnp.float32)
            xsel0 = xsel
    else:
        if stage == "f32":
            # all transport on the MXU at native precision (exact for
            # one-hot operands): doubles MXU passes vs bf16 splitting
            # but removes every VPU staging op
            passes = None
        use_i8 = stage == "int8" and w.dtype == jnp.float32
        if window == 1:
            if use_i8:
                (xsel,) = _select_int8((iot == base,), w,
                                       transposed=True)
            else:
                xsel = _dot_onehot(iot == base, w, passes,
                                   transposed=True)        # (GS, 128)
        elif use_i8:
            xsel0, xsel1 = _select_int8((iot == base, iot == base + 1),
                                        w, transposed=True)
        else:
            xsel0 = _dot_onehot(iot == base, w, passes,
                                transposed=True)           # (GS, 128)
            xsel1 = _dot_onehot(iot == base + 1, w, passes,
                                transposed=True)           # (GS, 128)

    if p.dtype == jnp.uint8:
        # int8 layout: stored per-slot, one zero-extending upcast
        idx = p.astype(jnp.int32)                          # (GS, 128)
    else:
        # Unpack the per-slot bytes: byte j of word m -> sublane row
        # j*GS/4 + m, so a sublane-aligned concat restores row order.
        idx = jnp.concatenate(
            [(p >> (8 * j)) & 255 for j in range(4)], axis=0)  # (GS, 128)

    if window == 1:
        vals = jnp.take_along_axis(xsel, idx, axis=1)
    else:
        low = jnp.take_along_axis(xsel0, idx & 127, axis=1)
        high = jnp.take_along_axis(xsel1, idx & 127, axis=1)
        vals = jnp.where(idx < 128, low, high)
    if dat.dtype != vals.dtype:
        # bf16-stored values, f32 compute: the only extra VPU op of the
        # half-stream layout (the x window, staging, gather, fold and
        # scatter all run at the compute dtype already)
        dat = dat.astype(vals.dtype)
    prod = dat * vals                                      # (GS, 128)

    # Scatter sublane rows to y blocks (fuses the depth reduction).
    # Block depths are 4-aligned (both window modes): fold each (8,128)
    # tile's two 4-row halves on the VPU (same total adds as one 8-fold,
    # each half tile-local), then scatter the 4x-smaller partial-sum
    # matrix; blocks_ref stores the map in the matching
    # [even halves | odd halves] order.
    s8 = prod.reshape(GS // 8, 8, LANES)
    ps = jnp.concatenate([s8[:, :4, :].sum(axis=1),
                          s8[:, 4:, :].sum(axis=1)],
                         axis=0)                           # (GS/4, 128)
    ohY = (jax.lax.broadcasted_iota(jnp.int32, (nblk, GS // 4), 0)
           == blocks_ref[0])                               # (nblk, GS/4)
    y_ref[:] = _dot_onehot(ohY, ps, passes)                # (nblk, 128)


def _default_stage(window):
    # measured on v5e (tools/probes/probe_bell_chain.py): the kernel is
    # VMEM-traffic-bound, so the cheapest staging differs by layout —
    # plain bf16 3-pass for single-band windows, int8 bit-planes for
    # band pairs (whose two selects amortize the plane extraction)
    return "bf16" if window == 1 else "int8"


@functools.partial(jax.jit, static_argnames=("nb", "nblk", "interpret",
                                             "passes", "stage", "window",
                                             "seg_mixed", "seg_bands"))
def _bell_matvec_call(data, lanes, bands, blocks, band_lo, x2,
                      sp_row, sp_col, sp_val, nb, nblk, interpret,
                      passes=3, stage=None, window=2, seg=None,
                      seg_mixed=0, seg_bands=SEG_BANDS):
    if stage is None:
        stage = _default_stage(window)
    nsteps, GS, L = data.shape
    if seg is None:
        seg_sizes = ()
        seg8 = jnp.zeros((nsteps, 1), jnp.int32)
    else:
        nseg = seg.shape[1]
        seg_sizes = (SEG_ROWS,) * (nseg - 1) \
            + (GS - SEG_ROWS * (nseg - 1),)
        # narrow starts stay 8-aligned; the wide sentinel -8 becomes -1
        seg8 = seg // 8
    gsc = GS // 4                          # grouped scatter-map rows
    # mixed-precision storage: bf16 values with an f32 x keep the value
    # stream at 2 B/slot while every accumulation runs in f32 (the
    # matvec is EXACT in the stored matrix; only the product/reduction
    # rounding is f32, same as full-f32 storage)
    ct = jnp.promote_types(data.dtype, x2.dtype)
    if x2.dtype != ct:
        x2 = x2.astype(ct)
    xflat = x2.reshape(-1)
    if not interpret:
        # Multi-MB inputs otherwise get parked in VMEM around the call and
        # blow the scoped budget (see kernels.py:155-160).
        x2 = pltpu.with_memory_space_constraint(x2, pltpu.HBM)
        data = pltpu.with_memory_space_constraint(data, pltpu.HBM)
        lanes = pltpu.with_memory_space_constraint(lanes, pltpu.HBM)

    # Adaptive ring depth: deep-block packings (dense bands, GS >= 4k)
    # would blow the 16 MB scoped-VMEM budget at the default depth; the
    # per-slot ring cost is the three buffers below plus staging/product
    # transients that SCALE with GS (~9.1 slots of (GS, L) f32 measured
    # from a Mosaic stack-OOM at GS=1856: 16.42 M total with 8.15 M of
    # rings — the old flat 4 MB transient assumption under-budgeted;
    # round-4 hybrid probe).  Keep a 4 MB floor so small-GS packings
    # keep their full prefetch depth.
    ring_bytes = (nb * L * np.dtype(ct).itemsize
                  + GS * L * np.dtype(data.dtype).itemsize
                  + int(np.prod(lanes.shape[1:]))
                  * np.dtype(lanes.dtype).itemsize)
    transient_bytes = max(4 << 20,
                          int(10 * GS * L * np.dtype(ct).itemsize))
    nring = int(max(2, min(WIN_AHEAD + 1,
                           ((16 << 20) - transient_bytes)
                           // max(1, ring_bytes))))
    if not interpret and transient_bytes + 2 * ring_bytes > (16 << 20):
        # Even the minimum ring depth cannot fit next to the GS-scaled
        # stack transients.  Fail LOUD at trace time: a GS=3424/nring=2
        # config passed compilation but CRASHED the TPU worker at run
        # time (round-4 probe; libtpu fault).  The auto format policy
        # (linop._try_bell) rejects such packings up front; direct
        # bell_operator callers get this error instead of a dead chip.
        raise ValueError(
            "BELL packing (GS=%d, nb=%d) needs ~%.1f MB of scoped VMEM "
            "against the 16 MB limit; repack with a smaller nb_max / "
            "window budget, more levels, or use the XLA ELL path"
            % (GS, nb, (transient_bytes + 2 * ring_bytes) / 2**20))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,           # band_lo, seg (/8)
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # data: manual ring
            pl.BlockSpec(memory_space=pl.ANY),      # lanes: manual ring
            # bands: (1, 1, GS) monolithic / (1, nseg, SEG_ROWS) segmented
            pl.BlockSpec((1,) + bands.shape[1:], lambda s, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gsc), lambda s, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
        ],
        out_specs=pl.BlockSpec((nblk, L), lambda s, *_: (s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nring, nb, L), ct),            # x window ring
            pltpu.SemaphoreType.DMA((nring,)),
            pltpu.VMEM((nring, GS, L), data.dtype),    # value-block ring
            pltpu.SemaphoreType.DMA((nring,)),
            # idx ring: (GS/4,128) int32 packed or (GS,128) uint8 direct
            pltpu.VMEM((nring,) + lanes.shape[1:], lanes.dtype),
            pltpu.SemaphoreType.DMA((nring,)),
        ] + ([pltpu.VMEM((len(seg_sizes) * SEG_ROWS, L), ct)]
             if seg_mixed else []),
    )
    kernel = functools.partial(_bell_kernel, nb, nblk, GS, nsteps, passes,
                               stage, window, nring, seg_sizes,
                               seg_mixed, seg_bands)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nsteps * nblk, L), ct),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * GS * L * (2 * nb + nblk),
            bytes_accessed=5 * data.size * data.dtype.itemsize // 4,
            transcendentals=0),
        interpret=interpret,
    )(band_lo, seg8, data, lanes, bands, blocks, x2)
    y = y.reshape(-1)
    if sp_val.shape[0]:
        # COO remainder: small gather + scatter-add handled by XLA; the
        # tail above each window's capped depth lives here.
        y = y.at[sp_row].add(sp_val * xflat[sp_col])
    return y


def bell_matvec_pallas(b: BELL, x, interpret: bool = False, passes=3,
                       stage=None):
    """``y = A @ x`` for a padded input ``x`` of length
    ``padded_shape[1]``; returns y of length ``padded_shape[0]`` — slice
    to ``shape[0]``.  ``stage``: x-window staging mode — ``None``
    picks the measured-fastest per window mode; ``"int8"`` transports
    f32 bits exactly through int8 MXU planes; ``"bf16"`` uses
    ``passes`` exact bf16 one-hot passes (3 = f32-exact: the Veltkamp
    splits are error-free and a one-hot dot adds at most one product
    per output); ``"bf16s"`` stacks the 3 components along the
    contraction dim (one dot); ``"f32"`` native HIGHEST.  Non-f32
    dtypes always use the native-precision product."""
    x2 = x.reshape(-1, LANES)
    return _bell_matvec_call(b.data, b.lanes, b.bands, b.blocks,
                             b.band_lo, x2, b.sp_row, b.sp_col, b.sp_val,
                             b.nb, b.nblk, bool(interpret),
                             None if passes is None else int(passes),
                             None if stage is None else str(stage),
                             int(b.window), seg=b.seg,
                             seg_mixed=int(b.seg_mixed),
                             seg_bands=int(b.seg_bands))


_MM_AHEAD = 3     # SpMM max ring depth (adaptive below it): per-step
#                   compute is ~K x the matvec's; measured-best on the
#                   bench matrix at K=8 (probe_spmm_tune)
_MM_KCHUNK = 1    # stage one RHS column at a time: minimal staging
#                   transients measured 17% faster than 4-wide chunks
#                   at K=8 (probe_spmm_tune) AND keep scoped VMEM in
#                   budget
_MM_KMAX = 8      # max RHS columns per kernel call (scoped-VMEM limit
#                   at bench sizes); wider blocks chunk at XLA level


def _mm_ring_bytes(nb, GS, K, ct_size, dat_size, lanes_bytes):
    """Per-ring-slot VMEM bytes of the SpMM kernel's three streams."""
    return (nb * LANES * K * ct_size + GS * LANES * dat_size
            + lanes_bytes)


def _mm_kmax(nb, GS, lanes_shape, lanes_size):
    """Largest per-kernel-call K the 16 MB scoped-VMEM budget admits
    for this packing (2-slot rings + ~5 MB staging/product transients
    reserved); XLA-level chunking covers wider blocks."""
    lanes_bytes = int(np.prod(lanes_shape)) * lanes_size
    for k in range(_MM_KMAX, 1, -1):
        if 2 * _mm_ring_bytes(nb, GS, k, 4, 4, lanes_bytes) \
                + k * GS * LANES + 4 * GS * LANES <= (10 << 20):
            return k
    return 1


def _bell_mm_kernel(nb, nblk, GS, nsteps, K, passes, window, nring,
                    seg_sizes, seg_mixed, seg_bands, band_lo_ref, seg_ref,
                    data_hbm, lanes_hbm, bands_ref, blocks_ref, x_hbm,
                    y_ref, win, sems, dbuf, dsems, lbuf, lsems, *scr):
    """Block-product (SpMM) kernel: same slot stream as the matvec, K
    right-hand sides ride the lane dimension (x window (nb, K*128),
    staging dots over <=_MM_KCHUNK-column chunks, K lane gathers, one
    scatter dot set).  The matrix stream, index unpack and one-hot
    builds amortize over K — the whole point: vmapping the matvec
    kernel re-streams A per column (~1000x slower, ROADMAP 'Batched
    solvers')."""
    st = pl.program_id(0)
    L = LANES
    GQ = GS // 4
    nslots = nring
    _MM_AHEAD = nring - 1

    def win_dma(step):
        # band_lo_ref holds band_lo // 8 ("oct" units): the *8 makes the
        # slice start SYNTACTICALLY divisible by the (8, 128) tiling —
        # Mosaic rejects dynamic HBM slices of multi-lane-tile operands
        # ((nbands, K*128)) whose start it cannot prove 8-divisible.
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(band_lo_ref[step] * 8, nb), :],
            win.at[step % nslots], sems.at[step % nslots])

    def dat_dma(step):
        return pltpu.make_async_copy(
            data_hbm.at[step], dbuf.at[step % nslots],
            dsems.at[step % nslots])

    def lan_dma(step):
        return pltpu.make_async_copy(
            lanes_hbm.at[step], lbuf.at[step % nslots],
            lsems.at[step % nslots])

    @pl.when(st == 0)
    def _():
        for kk in range(min(_MM_AHEAD, nsteps)):
            win_dma(kk).start()
            dat_dma(kk).start()
            lan_dma(kk).start()
    win_dma(st).wait()
    dat_dma(st).wait()
    lan_dma(st).wait()

    @pl.when(st + _MM_AHEAD < nsteps)
    def _():
        win_dma(st + _MM_AHEAD).start()
        dat_dma(st + _MM_AHEAD).start()
        lan_dma(st + _MM_AHEAD).start()

    slot = st % nslots
    dat = dbuf[slot]                                   # (GS, 128)
    p = lbuf[slot]

    if p.dtype == jnp.uint8:
        idx = p.astype(jnp.int32)
    else:
        idx = jnp.concatenate(
            [(p >> (8 * j)) & 255 for j in range(4)], axis=0)

    nseg = len(seg_sizes)
    if seg_sizes:
        iot = None
        oh0 = oh1 = None
    else:
        base = bands_ref[0]                            # (1, GS)
        iot = jax.lax.broadcasted_iota(jnp.int32, (nb, GS), 0)
        oh0 = iot == base
        oh1 = None if window == 1 else (iot == base + 1)
        w = win[slot]                                  # (nb, K*128)
    datc = None
    parts = []
    for klo in range(0, K, _MM_KCHUNK):
        khi = min(K, klo + _MM_KCHUNK)
        kc = khi - klo
        if seg_sizes and seg_mixed:
            xs = scr[0]
            for si in range(nseg):
                sb = seg_ref[st, si]
                bseg = bands_ref[0, si:si + 1, :]      # (1, SEG_ROWS)
                r0 = si * SEG_ROWS

                @pl.when(sb >= 0)
                def _(r0=r0, sb=sb, bseg=bseg):
                    iot_s = jax.lax.broadcasted_iota(
                        jnp.int32, (seg_bands, SEG_ROWS), 0)
                    wseg = win[slot, pl.ds(sb * 8, seg_bands),
                               klo * L:khi * L]
                    xs[r0:r0 + SEG_ROWS, :kc * L] = _dot_onehot(
                        iot_s == bseg, wseg, passes, transposed=True)

                @pl.when(sb < 0)
                def _(r0=r0, bseg=bseg):
                    iot_w = jax.lax.broadcasted_iota(
                        jnp.int32, (nb, SEG_ROWS), 0)
                    xs[r0:r0 + SEG_ROWS, :kc * L] = _dot_onehot(
                        iot_w == bseg, win[slot, :, klo * L:khi * L],
                        passes, transposed=True)

            xsel0 = xs[:GS, :kc * L]                   # (GS, kc*128)
        elif seg_sizes:
            xparts = [
                _dot_onehot(
                    jax.lax.broadcasted_iota(
                        jnp.int32, (seg_bands, SEG_ROWS), 0)
                    == bands_ref[0, si:si + 1, :],
                    win[slot, pl.ds(seg_ref[st, si] * 8, seg_bands),
                        klo * L:khi * L],
                    passes, transposed=True)
                for si in range(nseg)]
            xsel0 = (jnp.concatenate(xparts, axis=0) if len(xparts) > 1
                     else xparts[0])[:GS, :]           # (GS, kc*128)
        else:
            wc = w[:, klo * L:khi * L]
            xsel0 = _dot_onehot(oh0, wc, passes,
                                transposed=True)       # (GS, kc*128)
        if oh1 is not None:
            xsel1 = _dot_onehot(oh1, wc, passes, transposed=True)
        if datc is None:
            datc = dat if dat.dtype == xsel0.dtype else \
                dat.astype(xsel0.dtype)
        for k in range(khi - klo):
            x0k = xsel0[:, k * L:(k + 1) * L]
            if window == 1:
                vals = jnp.take_along_axis(x0k, idx, axis=1)
            else:
                x1k = xsel1[:, k * L:(k + 1) * L]
                low = jnp.take_along_axis(x0k, idx & 127, axis=1)
                high = jnp.take_along_axis(x1k, idx & 127, axis=1)
                vals = jnp.where(idx < 128, low, high)
            prod = datc * vals
            s8 = prod.reshape(GS // 8, 8, L)
            parts.append(jnp.concatenate(
                [s8[:, :4, :].sum(axis=1), s8[:, 4:, :].sum(axis=1)],
                axis=0))
    ps = jnp.concatenate(parts, axis=1)                # (GS/4, K*128)
    ohY = (jax.lax.broadcasted_iota(jnp.int32, (nblk, GQ), 0)
           == blocks_ref[0])
    y_ref[:] = _dot_onehot(ohY, ps, passes)            # (nblk, K*128)


@functools.partial(jax.jit, static_argnames=("nb", "nblk", "K",
                                             "interpret", "passes",
                                             "window", "seg_mixed",
                                             "seg_bands"))
def _bell_matmat_call(data, lanes, bands, blocks, band_lo, Xb,
                      sp_row, sp_col, sp_val, X, nb, nblk, K, interpret,
                      passes=3, window=2, seg=None, seg_mixed=0,
                      seg_bands=SEG_BANDS):
    """Fused SpMM: ``Xb`` is the band-major RHS block
    (nbands, K*LANES) with ``Xb[b, k*128+l] = X[b*128+l, k]``; ``X`` is
    the original (n_pad, K) block (used only for the COO remainder).
    Returns (rows_pad, K)."""
    nsteps, GS, L = data.shape
    if seg is None:
        seg_sizes = ()
        seg8 = jnp.zeros((nsteps, 1), jnp.int32)
    else:
        nseg = seg.shape[1]
        seg_sizes = (SEG_ROWS,) * (nseg - 1) \
            + (GS - SEG_ROWS * (nseg - 1),)
        seg8 = seg // 8
    ct = jnp.promote_types(data.dtype, Xb.dtype)
    if Xb.dtype != ct:
        Xb = Xb.astype(ct)
    if not interpret:
        Xb = pltpu.with_memory_space_constraint(Xb, pltpu.HBM)
        data = pltpu.with_memory_space_constraint(data, pltpu.HBM)
        lanes = pltpu.with_memory_space_constraint(lanes, pltpu.HBM)

    # adaptive ring depth (same budget logic as the matvec): wide
    # windows / deep blocks at K>1 blow scoped VMEM at a fixed depth
    lanes_bytes = (int(np.prod(lanes.shape[1:]))
                   * np.dtype(lanes.dtype).itemsize)
    rb = _mm_ring_bytes(nb, GS, K, np.dtype(ct).itemsize,
                        np.dtype(data.dtype).itemsize, lanes_bytes)
    nring = int(max(2, min(_MM_AHEAD + 1, (9 << 20) // max(1, rb))))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1,) + bands.shape[1:], lambda s, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, GS // 4), lambda s, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nblk, K * L), lambda s, *_: (s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nring, nb, K * L), ct),
            pltpu.SemaphoreType.DMA((nring,)),
            pltpu.VMEM((nring, GS, L), data.dtype),
            pltpu.SemaphoreType.DMA((nring,)),
            pltpu.VMEM((nring,) + lanes.shape[1:], lanes.dtype),
            pltpu.SemaphoreType.DMA((nring,)),
        ] + ([pltpu.VMEM((len(seg_sizes) * SEG_ROWS, _MM_KCHUNK * L),
                         ct)] if seg_mixed else []),
    )
    kernel = functools.partial(_bell_mm_kernel, nb, nblk, GS, nsteps, K,
                               passes, window, nring, seg_sizes,
                               seg_mixed, seg_bands)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nsteps * nblk, K * L), ct),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * GS * L * K * (2 * nb + nblk),
            bytes_accessed=(5 * data.size * data.dtype.itemsize // 4
                            + X.size * 4),
            transcendentals=0),
        interpret=interpret,
    )(band_lo // 8, seg8, data, lanes, bands, blocks, Xb)
    # (srows, K*128) -> (K, m) -> (m, K).  Only MAJOR-dim transposes
    # (the 128-lane minor dim stays in place): a minor-dim transpose
    # measured 3.2 ms on 4 MB (5 GB/s — tile-shuffle pathology,
    # tools/probes/probe_layout_k.py) where these run at ~900 GB/s.
    # The barrier keeps the transpose from fusing into the pallas
    # call's output allocation (XLA otherwise parks the full multi-MB
    # result in VMEM and blows the scoped budget).
    y = jax.lax.optimization_barrier(y)
    Y = y.reshape(nsteps * nblk, K, L).transpose(1, 0, 2).reshape(
        K, nsteps * nblk * L).T
    if sp_val.shape[0]:
        Y = Y.at[sp_row, :].add(sp_val[:, None].astype(ct)
                                * X[sp_col, :].astype(ct))
    return Y


def _to_band_major(X):
    """(n_pad, K) -> (n_pad/128, K*128) with Xb[b, k*128+l] =
    X[b*128+l, k], via MAJOR-dim transposes only (see
    _bell_matmat_call's layout note)."""
    npad, K = X.shape
    return X.T.reshape(K, npad // LANES, LANES).transpose(
        1, 0, 2).reshape(npad // LANES, K * LANES)


def bell_matmat_pallas(b: BELL, X, interpret: bool = False, passes=3):
    """``Y = A @ X`` for an (padded_cols, K) RHS block; returns
    (padded_rows, K) — slice to ``shape[0]``."""
    npad, K = X.shape
    Xb = _to_band_major(X)
    return _bell_matmat_call(b.data, b.lanes, b.bands, b.blocks,
                             b.band_lo, Xb, b.sp_row, b.sp_col, b.sp_val,
                             X, b.nb, b.nblk, int(K), bool(interpret),
                             None if passes is None else int(passes),
                             int(b.window), seg=b.seg,
                             seg_mixed=int(b.seg_mixed),
                             seg_bands=int(b.seg_bands))


def reorder_rcm(coo: F.COO):
    """Reverse Cuthill–McKee permutation (host-side, via scipy) minimizing
    bandwidth so BELL windows stay small.

    Returns ``(permuted_coo, perm)`` with ``A' = A[perm][:, perm]`` (square
    matrices only); un/re-permuting vectors is the caller's job.
    """
    m, n = coo.shape
    if m != n:
        raise ValueError("RCM reordering needs a square matrix")
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    rows = np.asarray(coo.row)
    cols = np.asarray(coo.col)
    a = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(m, n))
    perm = np.asarray(reverse_cuthill_mckee(a.tocsr(),
                                            symmetric_mode=False))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(m)
    return F.coo_from_arrays(np.asarray(coo.data), inv[rows], inv[cols],
                             (m, n), device=False), perm


@functools.lru_cache(maxsize=None)
def _bell_mv_factory(slot, cfg, rows_out, interpret):
    # Shared per-config function objects: per-instance closures would force
    # a full solver recompile per matrix (CLAUDE.md conventions).
    # ``cfg``: tuple of (nb, nblk, padded_cols, window) per level — the
    # matvec is the sum of every level's kernel product.
    def mv(params, x):
        levels = params[slot]
        # NumPy-style promotion: a mixed-precision apply (f32 container,
        # f64 vector under x64) computes in the promoted dtype — the
        # kernel's window scratch is typed off `data`, so both operands
        # must agree.
        ct = jnp.promote_types(levels[0].data.dtype, x.dtype)
        x = x if x.dtype == ct else x.astype(ct)
        out = None
        for (nb, nblk, cols_in, window), c in zip(cfg, levels):
            # stored values ride at their STORAGE dtype (bf16 storage
            # keeps its 2 B/slot stream); the kernel itself computes at
            # the promoted dtype
            if x.shape[0] == cols_in:   # static shapes: skip the pad copy
                xp = x
            else:
                xp = jnp.zeros(cols_in, dtype=ct).at[:x.shape[0]].set(x)
            y = _bell_matvec_call(c.data, c.lanes, c.bands, c.blocks,
                                  c.band_lo, xp.reshape(-1, LANES),
                                  c.sp_row, c.sp_col, c.sp_val,
                                  nb, nblk, interpret, window=window,
                                  seg=c.seg, seg_mixed=int(c.seg_mixed),
                                  seg_bands=int(c.seg_bands))
            y = y if y.shape[0] == rows_out else y[:rows_out]
            out = y if out is None else out + y
        return out
    return mv


@functools.lru_cache(maxsize=None)
def _bell_mm_factory(slot, cfg, rows_out, interpret):
    """Native block-product (SpMM) rule: per level, one fused kernel
    call that streams the slots once for all K columns."""
    def mm(params, X):
        levels = params[slot]
        ct = jnp.promote_types(levels[0].data.dtype, X.dtype)
        X = X if X.dtype == ct else X.astype(ct)
        K = X.shape[1]
        # scoped-VMEM bound (per packing): chunk wide blocks at the
        # XLA level; wide-window packings admit fewer columns per call
        kmax = min(
            _mm_kmax(nb_, c.data.shape[1], tuple(c.lanes.shape[1:]),
                     np.dtype(c.lanes.dtype).itemsize)
            for (nb_, _, _, _), c in zip(cfg, levels))
        if K > kmax:
            # lax.map over uniform kmax-column chunks: the scan
            # serializes the kernel calls (scoped VMEM never doubles)
            # without the optimization-barrier + concatenate chaining
            # it replaces, compiles the kernel once for all chunks and
            # writes one stacked output.  Measured on the 1M-row bench
            # matrix (r5): K=64 0.159 -> 0.152 ms/col (amortization
            # 1.54x -> 1.63x); the remaining per-chunk cost is the
            # scan's stacked input/output copies.  An in-grid 2-D
            # chunking variant (chunks as a second grid dim, A-block
            # resident across chunks) was built and measured SLOWER
            # (0.195 ms/col at K=64) — rejected.  Only major-dim
            # moves: (n, Kp) -> (nch, n, kmax) and back.
            n_in = X.shape[0]
            Kp = -(-K // kmax) * kmax
            Xp2 = X if Kp == K else jnp.concatenate(
                [X, jnp.zeros((n_in, Kp - K), X.dtype)], axis=1)
            nch = Kp // kmax
            Xc = Xp2.reshape(n_in, nch, kmax).transpose(1, 0, 2)
            Yc = jax.lax.map(lambda Xi: mm(params, Xi), Xc)
            Y = Yc.transpose(1, 0, 2).reshape(Yc.shape[1], Kp)
            return Y if Kp == K else Y[:, :K]
        out = None
        for (nb, nblk, cols_in, window), c in zip(cfg, levels):
            if X.shape[0] == cols_in:
                Xp = X
            else:
                Xp = jnp.zeros((cols_in, K), ct).at[:X.shape[0], :].set(X)
            Xb = _to_band_major(Xp)
            Y = _bell_matmat_call(c.data, c.lanes, c.bands, c.blocks,
                                  c.band_lo, Xb, c.sp_row, c.sp_col,
                                  c.sp_val, Xp, nb, nblk, int(K),
                                  interpret, window=window, seg=c.seg,
                                  seg_mixed=int(c.seg_mixed),
                                  seg_bands=int(c.seg_bands))
            Y = Y if Y.shape[0] == rows_out else Y[:rows_out]
            out = Y if out is None else out + Y
        return out
    return mm


@functools.lru_cache(maxsize=None)
def _bell_mm_perm_factory(slot, cfg, rows_out, interpret):
    inner = _bell_mm_factory(slot, cfg, rows_out, interpret)

    def mm(params, X):
        p, ip = params[2], params[3]
        Y = inner(params, jnp.take(X, p, axis=0))
        return jnp.take(Y, ip, axis=0)
    return mm


@functools.lru_cache(maxsize=None)
def _bell_mv_perm_factory(slot, cfg, rows_out, interpret):
    """Symmetrically-permuted variant: params carry (perm, iperm) device
    arrays at slots 2/3 and the operator applies
    ``A = Pᵀ A' P`` (``A'[i,j] = A[p[i], p[j]]``) via gather both ways."""
    inner = _bell_mv_factory(slot, cfg, rows_out, interpret)

    def mv(params, x):
        p, ip = params[2], params[3]
        y = inner(params, jnp.take(x, p, axis=0))
        return jnp.take(y, ip, axis=0)
    return mv


def _strip_spill(b: BELL) -> BELL:
    empty_i = np.zeros(0, dtype=np.int32)
    empty_v = np.zeros(0, dtype=np.asarray(b.sp_val).dtype)
    return b._replace(sp_row=empty_i, sp_col=empty_i, sp_val=empty_v,
                      nnz=b.nnz - b.nnz_spill, nnz_spill=0)


# Measured per-slot kernel cost on v5e (ps/slot at 1M rows,
# tools/probes/probe_w2_grouped.py, 2026-08-19): single-band windows
# stream more slots but run a cheaper per-slot path (one gather); band
# pairs pack ~15% tighter but pay two gathers + select.  Both use the
# grouped (GS/4) scatter now.  The kernel is COMPUTE-bound at these
# costs (the 5 B/slot HBM stream alone would be ~8.6 ps/slot incl. ring
# overhead): idx packing, value dtype and staging-precision changes all
# measured time-neutral — see tools/probes/probe_ablate_r3*.py.
_SLOT_COST_PS = {1: 12.5, 2: 16.1}
# Two-term kernel cost model, measured on v5e (probe_ablate_r5,
# 2026-08-20): time = slots · BASE + staged_band_rows · STAGE where
# BASE covers stream + unpack + gather + fold + scatter (the `nostage`
# ablation: 12.6 ps/slot on power_law incl. its window DMA; the bench
# matrix backs out ~10 ps once its small staging term is separated)
# and STAGE is the one-hot staging cost per (band, sublane-row) pair
# (build + 3 bf16 MXU passes).  Validates within 8% on the bench
# matrix (pred 0.247 / meas 0.245 ms), power_law (0.65 / 0.70) and
# stencil_scatter (0.186 / 0.202).
_SLOT_BASE_PS = {1: 10.0, 2: 13.5}
_STAGE_PS_PER_BR = 3.2
# mixed segmented staging adds ~0.35 us per segment (xsel scratch
# round trip + two predicated regions; fitted on power_law 137 us /
# 440 segs and stencil_scatter 68 us / 176 segs, on-chip r5)
_SEG_OVERHEAD_PS = 0.35e6


def _staged_band_rows(b: BELL) -> int:
    """Total (band, sublane-row) pairs the packing's staging one-hots
    cover across all steps — the second term of the cost model."""
    nsteps, GS, _ = (int(s) for s in b.data.shape)
    if b.seg is not None:
        nseg_tot = int(np.prod(b.seg.shape))
        narrow = nseg_tot - b.seg_mixed
        return (narrow * b.seg_bands + b.seg_mixed * b.nb) * SEG_ROWS
    return nsteps * b.nb * GS


def _slot_cost_ps(b: BELL) -> float:
    """Predicted kernel cost per stored slot (ps, v5e two-term model);
    see _SLOT_BASE_PS.  window=2 keeps the legacy flat fit (two
    staging one-hots; never segmented) plus the wide-window scaling."""
    slots = max(1, int(np.prod(b.data.shape)))
    if b.window == 2:
        return _SLOT_COST_PS[2] * max(1.0, b.nb / 256.0)
    seg_oh = 0.0
    if b.seg is not None and b.seg_mixed:
        seg_oh = _SEG_OVERHEAD_PS * int(np.prod(b.seg.shape)) / slots
    return _SLOT_BASE_PS[1] + seg_oh \
        + _STAGE_PS_PER_BR * _staged_band_rows(b) / slots


def _pack_window_auto(coo, nb_max, spill_cost, levels, device=True,
                      idx_fmt="packed", segment=True):
    """Pack with both window modes (host-side) and keep the one the
    measured per-slot cost model predicts faster.  The w2 pair-DP
    packing is only attempted when the native planner is available or
    the matrix is small — its Python fallback is a 30-45 s per-block
    loop at 1M rows, and w1 wins on every scattered matrix measured."""
    try:
        lv1 = _pack_levels(coo, nb_max, spill_cost, levels,
                           device=False, window=1, idx_fmt=idx_fmt,
                           segment=segment)
    except SpanError:
        lv1 = None
    lv2 = None
    native_ok = False
    try:
        from .. import native as _native
        native_ok = _native.available()
    except Exception:
        pass
    if lv1 is None or native_ok or coo.data.shape[0] < 100_000:
        try:
            lv2 = _pack_levels(coo, nb_max, spill_cost, levels,
                               device=False, window=2, idx_fmt=idx_fmt)
        except SpanError:
            lv2 = None
    if lv1 is None and lv2 is None:
        raise SpanError("neither window mode fits the band budget; "
                        "RCM-reorder or use the ELL path")

    def cost(lv):
        if lv is None:
            return float("inf")
        # an XLA scatter remainder costs ~16 ns/entry on-chip — three
        # orders of magnitude above a kernel slot — so spilly packings
        # must lose to clean ones of any window mode
        return (sum(int(np.prod(b.data.shape)) * _slot_cost_ps(b)
                    for b in lv)
                + sum(b.nnz_spill for b in lv) * 16000.0)

    win = lv1 if cost(lv1) <= cost(lv2) else lv2
    return tuple(bell_to_device(b) for b in win) if device else win


def _pack_levels(coo, nb_max, spill_cost, levels, device=True, window=2,
                 idx_fmt="packed", segment=True):
    """Pack a COO matrix into up to ``levels`` BELL levels: all but the
    last are depth-capped and their overflow feeds the next level's
    (much smaller) packing; the last level is uncapped.  A thin overflow
    can pack WORSE than not capping at all (max-over-128-lanes ≥ 1 per
    touched window), so the multi-level split is kept only when it
    stores fewer total slots than the single uncapped packing.  Levels
    after the first keep an XLA COO remainder only if their own packing
    overflows the window budget (SpanError).  ``window="auto"``
    dispatches to :func:`_pack_window_auto` (plans both layouts, keeps
    the cost-model winner)."""
    if window == "auto":
        return _pack_window_auto(coo, nb_max, spill_cost, levels, device,
                                 idx_fmt, segment=segment)
    # candidate packings stay host-resident (NumPy) — only the winner
    # rides the device transport
    cvt = bell_to_device if device else (lambda b: b)
    b1 = bell_from_coo(coo, nb_max=nb_max, device=False, window=window,
                       idx_fmt=idx_fmt, segment=segment,
                       spill_cost=spill_cost if levels > 1 else None)
    if levels <= 1 or b1.nnz_spill == 0:
        return (cvt(b1),)
    out = [_strip_spill(b1)]
    cur = b1
    for li in range(1, levels):
        last = li == levels - 1
        nxt_coo = F.coo_from_arrays(np.asarray(cur.sp_val),
                                    np.asarray(cur.sp_row),
                                    np.asarray(cur.sp_col), coo.shape,
                                    device=False)
        try:
            b = bell_from_coo(nxt_coo, nb_max=nb_max, device=False,
                              window=window, idx_fmt=idx_fmt,
                              segment=segment,
                              spill_cost=None if last else spill_cost)
        except SpanError:
            # the overflow is too scattered to window: keep it as the
            # previous level's XLA remainder instead of a new level
            out[-1] = cur
            break
        if b.nnz_spill and not last:
            out.append(_strip_spill(b))
            cur = b
        else:
            out.append(b)
            break
    multi_slots = sum(int(np.prod(b.data.shape)) for b in out)
    if sum(b.nnz_spill for b in out) == 0:
        # compare against the uncapped single-level packing; keep multi
        # only on a clear (>10%) stream win — each extra level is
        # another kernel launch plus its own staging matmuls.  The
        # comparison packing itself may exceed the window budget (the
        # clustered far entries the capped level spilled ARE what blow
        # the span) — that must not discard the valid multi-level
        # result in hand.
        try:
            b1u = bell_from_coo(coo, nb_max=nb_max, spill_cost=None,
                                device=False, window=window,
                                idx_fmt=idx_fmt, segment=segment)
        except SpanError:
            b1u = None
        if b1u is not None and \
                int(np.prod(b1u.data.shape)) <= 1.1 * multi_slots:
            return (cvt(b1u),)
    return tuple(cvt(b) for b in out)


ROW_SPLIT_DEG = 64   # rows at least this dense get a private block


def _row_split_plan(coo, thresh=ROW_SPLIT_DEG):
    """Detect pathologically heavy rows and split each into a private
    128-lane virtual block appended past the row space.

    The w1 layout prices a row by its per-lane depth: a deg-d row keeps
    all d entries in ONE lane, so its windows cap at depth ~d/bands and
    the block stores 128 lanes per depth row — measured 422 slots/nnz
    on the power-law class (69% of all slots from 273 rows, round 5).
    Splitting gives row h a virtual block whose 128 lanes hold its
    column-sorted entries in contiguous chunks (few bands per lane, so
    per-lane depth ~d/128); the matvec sums the block's 128 lane
    outputs back into y[h] (an (H, 128) fold + H-element scatter-add —
    O(heavy rows), not O(nnz)).

    Returns ``(split_coo, heavy_rows, M0)`` with the virtual blocks at
    rows ``M0 + i*128 .. +127`` (``M0`` = row space padded to a block
    boundary), or None when no row qualifies.  The transpose identity:
    with ``B = [[L], [Av]]`` (light part stacked over virtual part) and
    ``S`` the lane-summing selector, ``A = L + S Av`` and
    ``A^T x = B^T [x; S^T x]`` where ``S^T x`` replicates ``x[heavy]``
    over each virtual block's lanes.
    """
    m, n = coo.shape
    rows = np.asarray(coo.row).astype(np.int64)
    cols = np.asarray(coo.col).astype(np.int64)
    vals = np.asarray(coo.data)
    deg = np.bincount(rows, minlength=m)
    heavy = np.flatnonzero(deg >= thresh)
    if len(heavy) == 0 or deg[heavy].sum() < max(256, 0.005 * len(rows)):
        return None
    M0 = -(-m // LANES) * LANES
    hidx = np.full(m, -1, np.int64)
    hidx[heavy] = np.arange(len(heavy))
    is_h = hidx[rows] >= 0
    hr, hc, hv = rows[is_h], cols[is_h], vals[is_h]
    order = np.lexsort((hc, hr))
    hr, hc, hv = hr[order], hc[order], hv[order]
    starts = np.flatnonzero(np.r_[True, hr[1:] != hr[:-1]])
    sizes = np.diff(np.r_[starts, len(hr)])
    posin = np.arange(len(hr)) - np.repeat(starts, sizes)
    lane = posin * LANES // np.repeat(sizes, sizes)
    vrow = M0 + hidx[hr] * LANES + lane
    rows2 = np.concatenate([rows[~is_h], vrow])
    cols2 = np.concatenate([cols[~is_h], hc])
    vals2 = np.concatenate([vals[~is_h], hv])
    shape2 = (int(M0 + len(heavy) * LANES), n)
    return (F.coo_from_arrays(vals2, rows2, cols2, shape2, device=False),
            heavy.astype(np.int32), int(M0))


@functools.lru_cache(maxsize=None)
def _bell_split_mv_factory(slot, cfg, m, M0, H, interpret):
    """Row-split forward matvec: kernel product over the split matrix
    B, then fold each heavy row's 128 virtual lanes back into y."""
    inner = _bell_mv_factory(slot, cfg, M0 + H * LANES, interpret)

    def mv(params, x):
        y = inner(params, x)
        hv = y[M0:].reshape(H, LANES).sum(axis=1)
        return y[:m].at[params[2]].add(hv)
    return mv


@functools.lru_cache(maxsize=None)
def _bell_split_rmv_factory(cfgL, cfgA, n, interpret):
    """Row-split transpose matvec as two kernel products:
    ``A^T x = L^T x + Av^T (S^T x)`` — the stacked B^T would put the
    virtual columns past the window budget, so the light and virtual
    transposes are packed separately (``params[1] = (bwdL, bwdA)``)."""
    innerL = _bell_mv_factory(0, cfgL, n, interpret)
    innerA = _bell_mv_factory(0, cfgA, n, interpret)

    def rmv(params, x):
        bwdL, bwdA = params[1]
        z = jnp.repeat(x[params[2]], LANES)
        return innerL((bwdL,), x) + innerA((bwdA,), z)
    return rmv


@functools.lru_cache(maxsize=None)
def _bell_split_mm_factory(slot, cfg, m, M0, H, interpret):
    inner = _bell_mm_factory(slot, cfg, M0 + H * LANES, interpret)

    def mm(params, X):
        Y = inner(params, X)
        hv = Y[M0:].reshape(H, LANES, -1).sum(axis=1)
        return Y[:m].at[params[2], :].add(hv)
    return mm


@functools.lru_cache(maxsize=None)
def _bell_split_rmm_factory(cfgL, cfgA, n, interpret):
    innerL = _bell_mm_factory(0, cfgL, n, interpret)
    innerA = _bell_mm_factory(0, cfgA, n, interpret)

    def rmm(params, X):
        bwdL, bwdA = params[1]
        Z = jnp.repeat(X[params[2], :], LANES, axis=0)
        return innerL((bwdL,), X) + innerA((bwdA,), Z)
    return rmm


def _split_transpose_levels(coo_k, M0, nb_max, sc, levels, window,
                            idx_fmt, segment):
    """Pack ``(L^T, Av^T)`` from the row-split matrix ``coo_k`` (light
    entries at rows < M0, virtual entries at rows >= M0)."""
    rows = np.asarray(coo_k.row)
    cols = np.asarray(coo_k.col)
    vals = np.asarray(coo_k.data)
    n = coo_k.shape[1]
    light = rows < M0
    cooLT = F.coo_from_arrays(vals[light], cols[light], rows[light],
                              (n, M0), device=False)
    cooAT = F.coo_from_arrays(vals[~light], cols[~light],
                              rows[~light] - M0,
                              (n, coo_k.shape[0] - M0), device=False)
    lvL = _pack_levels(cooLT, nb_max, sc, levels, window=window,
                       idx_fmt=idx_fmt, segment=segment)
    lvA = _pack_levels(cooAT, nb_max, sc, levels, window=window,
                       idx_fmt=idx_fmt, segment=segment)
    return (lvL, lvA)


def _pad_blocks_w1(bl, gs_old, gs_new, nblk, nsteps_new):
    """Pad a window-1 scatter map to a larger (nsteps, GS): the stored
    [even halves | odd halves] split order depends on GS, so padding
    must go through the natural group order (like the packed lanes)."""
    bl = np.asarray(bl)[:, 0, :]
    g_old, g_new = gs_old // 4, gs_new // 4
    nat = np.empty((bl.shape[0], g_old), bl.dtype)
    nat[:, 0::2] = bl[:, :g_old - g_old // 2]
    nat[:, 1::2] = bl[:, g_old - g_old // 2:]
    natp = np.full((nsteps_new, g_new), nblk, bl.dtype)
    natp[:bl.shape[0], :g_old] = nat
    return np.concatenate([natp[:, 0::2], natp[:, 1::2]],
                          axis=1)[:, None, :]


def _ensure_device_levels(lv):
    if lv is None:
        return None
    return tuple(bell_to_device(b) if isinstance(b.data, np.ndarray) else b
                 for b in lv)


def _build_split_operator(split, m, n, symmetric, with_transpose,
                          interpret, nb_max, sc, levels, window, idx_fmt,
                          segment, prepacked):
    """Assemble the row-split LinearOperator (see _row_split_plan):
    forward = one kernel product over B = [[L], [Av]] + lane fold;
    transpose = two kernel products (L^T, Av^T)."""
    from ..ops.base import LinearOperator

    coo_k, heavy, M0 = split
    H = int(len(heavy))
    if prepacked is not None:
        fwd, bwd = prepacked
        fwd = _ensure_device_levels(fwd)
        bwd = None if bwd is None else tuple(
            _ensure_device_levels(p) for p in bwd)
    else:
        fwd = _pack_levels(coo_k, nb_max, sc, levels, window=window,
                           idx_fmt=idx_fmt, segment=segment)
        if symmetric or not with_transpose:
            bwd = None
        else:
            bwd = _split_transpose_levels(coo_k, M0, nb_max, sc, levels,
                                          window, idx_fmt, segment)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    interpret = bool(interpret)

    def _cfg(lv):
        return tuple((b.nb, b.nblk, b.padded_shape[1], b.window)
                     for b in lv)

    mv = _bell_split_mv_factory(0, _cfg(fwd), m, M0, H, interpret)
    mm = _bell_split_mm_factory(0, _cfg(fwd), m, M0, H, interpret)
    if symmetric:
        rmv, rmm = mv, mm
    elif bwd is None:
        rmv = rmm = None
    else:
        rmv = _bell_split_rmv_factory(_cfg(bwd[0]), _cfg(bwd[1]), n,
                                      interpret)
        rmm = _bell_split_rmm_factory(_cfg(bwd[0]), _cfg(bwd[1]), n,
                                      interpret)
    params = (fwd, bwd, jnp.asarray(np.asarray(heavy, dtype=np.int32)))
    dtype = np.dtype(fwd[0].data.dtype)
    op = LinearOperator(n, m, matvec=mv, matvec_transp=rmv,
                        matmat=mm, matmat_transp=rmm,
                        params=params, _takes_params=True,
                        symmetric=symmetric,
                        hermitian=symmetric and not np.issubdtype(
                            dtype, np.complexfloating),
                        dtype=dtype)
    nnz_tot = sum(b.nnz for b in fwd)
    op.fill = bell_fill(fwd[0])
    op.spill_frac = (nnz_tot - fwd[0].nnz + fwd[0].nnz_spill) / max(
        1, nnz_tot)
    op.stream_bytes = sum(bell_stream_bytes(b) for b in fwd)
    op.bytes_per_nnz = op.stream_bytes / max(1, nnz_tot)
    op.xla_remainder = sum(b.nnz_spill for b in fwd)
    op.nb_max_level = max(b.nb for b in fwd)
    op.split_rows = H
    return op


def bell_operator(source, shape=None, symmetric=False, interpret=None,
                  nb_max: int = NB_MAX, spill_cost: float = None,
                  reorder=False, levels: int = 2, with_transpose=True,
                  window="auto", idx_fmt="packed", segment=True,
                  split_rows="auto", _prepacked=None, _split=None):
    """Wrap a matrix as a LinearOperator whose matvec is the BELL kernel.

    ``source``: COO container or ``(vals, rows, cols, shape)`` triples or
    a dense array.  The operator acts on the LOGICAL (m, n) shapes:
    inputs are zero-padded and outputs trimmed internally.  The transpose
    product uses a prebuilt BELL of A^T.  ``interpret=None`` auto-selects
    interpreter mode off-TPU.

    ``levels=2`` (default) packs depth-capped level 1 plus an uncapped
    level 2 holding the overflow — both run the Pallas kernel.  An XLA
    COO scatter remainder (``spill_cost`` on the last level) measured
    ~16 ns/entry on a v5e through XLA scatter-add — three orders of
    magnitude off the kernel's stream — so it is reserved for overflow
    the window budget cannot hold at all.

    ``reorder=True`` packs the RCM-permuted matrix (square only) and
    wraps the permutation into the matvec (two O(m) gathers per apply) —
    the operator still acts in the ORIGINAL ordering.

    ``window="auto"`` (default) plans both the single-band (v3) and
    band-pair (v2) layouts host-side and keeps the one the measured
    per-slot cost model predicts faster (see ``_SLOT_COST_PS``); pass
    1 or 2 to force a layout.

    ``with_transpose=False`` skips packing A^T (halves construction for
    forward-only uses like CG/MINRES or benchmarking); ``op.T @ y`` then
    raises.
    """
    from ..ops.base import LinearOperator

    if isinstance(source, F.COO):
        coo = source
    elif isinstance(source, tuple) and len(source) == 4:
        vals, rows, cols, shp = source
        coo = F.coo_from_arrays(vals, rows, cols, shp, device=False)
    else:
        a = np.asarray(source)
        rr, cc = np.nonzero(a)
        coo = F.coo_from_arrays(a[rr, cc], rr, cc, a.shape, device=False)

    m, n = coo.shape
    perm = None
    if reorder:
        coo, perm = reorder_rcm(coo)
    split = _split
    if split is None and split_rows and perm is None \
            and _prepacked is None:
        split = _row_split_plan(coo)
    if split is not None:
        sc = _SPILL_BYTES if spill_cost is None else spill_cost
        return _build_split_operator(
            split, m, n, symmetric, with_transpose, interpret, nb_max,
            sc, levels, window, idx_fmt, segment, _prepacked)
    if _prepacked is not None:
        # host-planned candidates from the auto-format policy: only the
        # accepted packing rides the device transport, here
        fwd, bwd = _prepacked
        fwd = _ensure_device_levels(fwd)
        bwd = _ensure_device_levels(bwd)
    else:
        sc = _SPILL_BYTES if spill_cost is None else spill_cost
        skip_bwd = symmetric or not with_transpose
        if levels <= 1 and window != "auto":
            fwd = (bell_from_coo(coo, nb_max=nb_max, window=window,
                                 spill_cost=spill_cost, idx_fmt=idx_fmt,
                                 segment=segment),)
            bwd = None if skip_bwd else (bell_from_coo(
                F.transpose_coo(coo), nb_max=nb_max, window=window,
                spill_cost=spill_cost, idx_fmt=idx_fmt,
                segment=segment),)
        else:
            if levels <= 1:
                sc = spill_cost   # keep the explicit no-spill request
            fwd = _pack_levels(coo, nb_max, sc, levels, window=window,
                               idx_fmt=idx_fmt, segment=segment)
            bwd = None if skip_bwd else _pack_levels(
                F.transpose_coo(coo), nb_max, sc, levels, window=window,
                idx_fmt=idx_fmt, segment=segment)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    interpret = bool(interpret)

    def _cfg(lv):
        return tuple((b.nb, b.nblk, b.padded_shape[1], b.window)
                     for b in lv)

    factory = _bell_mv_factory if perm is None else _bell_mv_perm_factory
    mmfac = _bell_mm_factory if perm is None else _bell_mm_perm_factory
    mv = factory(0, _cfg(fwd), m, interpret)
    mm = mmfac(0, _cfg(fwd), m, interpret)
    if symmetric:
        rmv, rmm = mv, mm
    elif bwd is None:
        rmv = rmm = None
    else:
        rmv = factory(1, _cfg(bwd), n, interpret)
        rmm = mmfac(1, _cfg(bwd), n, interpret)

    params = (fwd, bwd)
    if perm is not None:
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(m)
        params = (fwd, bwd, jnp.asarray(perm.astype(np.int32)),
                  jnp.asarray(iperm.astype(np.int32)))

    dtype = np.dtype(fwd[0].data.dtype)
    op = LinearOperator(n, m, matvec=mv, matvec_transp=rmv,
                        matmat=mm, matmat_transp=rmm,
                        params=params, _takes_params=True,
                        symmetric=symmetric,
                        hermitian=symmetric and not np.issubdtype(
                            dtype, np.complexfloating),
                        dtype=dtype)
    nnz_tot = sum(b.nnz for b in fwd)
    op.fill = bell_fill(fwd[0])
    op.spill_frac = (nnz_tot - fwd[0].nnz + fwd[0].nnz_spill) / max(
        1, nnz_tot)
    op.stream_bytes = sum(bell_stream_bytes(b) for b in fwd)
    op.bytes_per_nnz = op.stream_bytes / max(1, nnz_tot)
    op.xla_remainder = sum(b.nnz_spill for b in fwd)
    op.nb_max_level = max(b.nb for b in fwd)
    if perm is not None:
        # The permutation-wrapped matvec pays two O(m) XLA gathers per
        # apply — measured GATHER-DOMINATED on-chip (a 131k-row
        # RCM-rescued matrix: 1.92 ms/mv of which ~98% was the two
        # jnp.take calls; the kernel core modeled 0.036 ms).  For
        # SOLVES the gathers are avoidable entirely: solve in the
        # permuted space and transform b/x once.  ``solve()`` consumes
        # this attribute: ``A = P^T A' P`` with ``(P v)[i] = v[p[i]]``,
        # so ``x = P^T x'`` where ``A' x' = P b``.
        inner_mv = _bell_mv_factory(0, _cfg(fwd), m, interpret)
        inner_mm = _bell_mm_factory(0, _cfg(fwd), m, interpret)
        if symmetric:
            inner_rmv, inner_rmm = inner_mv, inner_mm
        elif bwd is None:
            inner_rmv = inner_rmm = None
        else:
            inner_rmv = _bell_mv_factory(1, _cfg(bwd), n, interpret)
            inner_rmm = _bell_mm_factory(1, _cfg(bwd), n, interpret)
        inner = LinearOperator(n, m, matvec=inner_mv,
                               matvec_transp=inner_rmv,
                               matmat=inner_mm, matmat_transp=inner_rmm,
                               params=(fwd, bwd), _takes_params=True,
                               symmetric=symmetric,
                               hermitian=op.hermitian, dtype=dtype)
        op.solve_permutation = (params[2], params[3], inner)
    return op
