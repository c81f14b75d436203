"""BELL (band-sliced ELL): the general-sparsity Pallas SpMV format.

This is the TPU answer to the reference's pysparse C SpMV — the hot path
its solvers use for *general* matrices
(``/root/reference/pykrylov/linop/linop.py:697-706``).  TPUs have no
arbitrary gather: Mosaic supports exactly one dynamic-index primitive on
vectors, the lane-dimension ``take_along_axis`` over a (rows, 128) tile.
BELL is a storage layout that reduces every sparse row to that primitive:

  * Matrix rows are mapped to LANES, 128 per block.  Each (8, 128) f32
    tile covers one block: lane r = matrix row ``128*blk + r``, sublane
    ``s`` = one *(column-band, depth)* slot.  A column band is a 128-wide
    column range; entry value at (s, r) multiplies
    ``x[128*band(s) + lane(s, r)]``.
  * Per-sublane (not per-tile) band ids: a block's (band, depth) pairs
    pack densely into sublanes, so fill is ``nnz / (8*128*ceil(Σ_β d_β/8))``
    per block — no 8-slot round-up per band.  ``d_β`` is the max number of
    entries any of the 128 rows has in band β.
  * The gather is staged in two supported steps: (1) a one-hot MXU matmul
    ``onehot(bands) @ x_window`` materializes, per sublane-slot, the
    128-wide x band it needs (amortized over the whole grid step — per
    tile it would be MXU-latency-bound); (2) ``take_along_axis(axis=1)``
    picks each lane's element.
  * Each grid step covers NBLK consecutive blocks and G tiles; its x
    window (NB bands, chosen at pack time) is DMA'd from HBM with a
    dynamic start (``make_async_copy`` + scalar prefetch) and
    double-buffered across steps.  x/window traffic is O(NB*512 B) per
    step — negligible next to the 8 B/slot data+lane stream, so achieved
    nnz/s ≈ BW / (8 * pad_factor): at fill ≥ 0.8 this meets the >80%%-of-
    roofline BASELINE target under the standard data+index accounting.

Matrices whose rows span a wider column range than the window budget
(``SpanError``) should be RCM-reordered first (``reorder_rcm``) or fall
back to the XLA ELL path — ``operator_from_coo`` does this automatically.

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
           "bell_matvec_pallas", "bell_to_dense", "bell_operator",
           "reorder_rcm", "LANES", "SLOTS"]

LANES = 128   # matrix rows per block (lane dimension)
SLOTS = 8     # sublane slots per tile (f32 tile height)
NB_MAX = 1024  # window budget: 1024 bands = 512 KB of x in VMEM
G_TARGET = 128  # tiles per grid step the packer aims for


class SpanError(ValueError):
    """A grid step's rows reference a wider column range than the window
    budget allows.  Reorder (RCM) or use the XLA ELL path."""


class BELL(NamedTuple):
    """Packed band-sliced ELL.

    ``data``:  (nsteps, G, SLOTS, LANES) f32/f64 values (zero-padded).
    ``lanes``: (nsteps, G, SLOTS, LANES) int32 in [0, 128) — lane of the
               entry's column within its band.
    ``bands``: (nsteps, G*SLOTS, 1) int32 — window-relative band id per
               sublane slot (dummy slots point at band 0 with zero data).
    ``block_local``: (nsteps, G) int32 in [0, NBLK) — output block of each
               tile within its step.
    ``band_lo``: (nsteps,) int32 — first band of each step's x window.
    ``shape``: logical (m, n); ``padded_shape``: (nsteps*NBLK*128,
               ncb*128) the kernel actually computes with; ``nb``: window
               bands; ``nblk``: blocks per step; ``nnz``: true nonzeros.
    """
    data: jnp.ndarray
    lanes: jnp.ndarray
    bands: jnp.ndarray
    block_local: jnp.ndarray
    band_lo: jnp.ndarray
    shape: Tuple[int, int]
    padded_shape: Tuple[int, int]
    nb: int
    nblk: int
    nnz: int


def _reg():
    def flatten(v):
        return ((v.data, v.lanes, v.bands, v.block_local, v.band_lo),
                (v.shape, v.padded_shape, v.nb, v.nblk, v.nnz))

    def unflatten(aux, children):
        return BELL(*children, *aux)

    jax.tree_util.register_pytree_node(BELL, flatten, unflatten)


_reg()


def bell_from_coo(coo: F.COO, nblk=None, nb_max: int = NB_MAX,
                  min_cols: int = 0) -> BELL:
    """Pack COO triples into BELL (host-side, vectorized NumPy).

    ``nblk`` fixes the blocks-per-step (default: sized so a step carries
    ~``G_TARGET`` tiles).  ``min_cols`` forces the padded column count up
    (used to square-pad).  Raises :class:`SpanError` when some step's
    column span exceeds ``nb_max`` bands.
    """
    m, n = coo.shape
    rows = np.asarray(coo.row).astype(np.int64)
    cols = np.asarray(coo.col).astype(np.int64)
    vals = np.asarray(coo.data)
    nnz = len(vals)
    if nnz == 0:
        rows = np.zeros(1, dtype=np.int64)
        cols = np.zeros(1, dtype=np.int64)
        vals = np.zeros(1, dtype=np.float32)

    blk = rows // LANES
    band = cols // LANES
    lane = cols % LANES
    nblocks = max(1, -(-m // LANES))
    ncb = max(1, -(-n // LANES), -(-min_cols // LANES))

    # Per-(row, band) depth ordinal k: position of the entry within its
    # row's entries in that band (column-sorted).
    order = np.lexsort((cols, rows))
    r_s, b_s = rows[order], band[order]
    grp = np.flatnonzero(np.r_[True, (np.diff(r_s) != 0) |
                               (np.diff(b_s) != 0)])
    sizes = np.diff(np.r_[grp, len(r_s)])
    k_s = np.arange(len(r_s)) - np.repeat(grp, sizes)
    k = np.empty(len(r_s), dtype=np.int64)
    k[order] = k_s

    # Per-(block, band) depth d = max_r count(r, band) = max k + 1, and the
    # block's sublane list = [(band, depth-level)] pairs, bands ascending.
    bb_key = blk * (ncb + 1) + band
    uniq_bb, inv_bb = np.unique(bb_key, return_inverse=True)
    d = np.zeros(len(uniq_bb), dtype=np.int64)
    np.maximum.at(d, inv_bb, k + 1)
    u_blk = uniq_bb // (ncb + 1)

    # Sublane ordinal of each (block, band, level) triple within its block.
    d_starts_in_block = np.zeros(len(uniq_bb), dtype=np.int64)
    # cumulative depth within each block, bands ascending (uniq_bb sorted).
    csum = np.cumsum(d)
    blk_first = np.flatnonzero(np.r_[True, np.diff(u_blk) != 0])
    base = np.zeros(len(uniq_bb), dtype=np.int64)
    base[blk_first] = np.r_[0, csum[blk_first[1:] - 1]]
    np.maximum.accumulate(base, out=base)
    d_starts_in_block = csum - d - base          # start ordinal of (blk, β)
    sub_ord = d_starts_in_block[inv_bb] + k      # sublane ordinal of entry

    # Tiles per block, then steps of nblk blocks padded to uniform G.
    depth_per_block = np.zeros(nblocks, dtype=np.int64)
    np.add.at(depth_per_block, u_blk, d)
    tiles_per_block = np.maximum(1, -(-depth_per_block // SLOTS))

    if nblk is None:
        avg_t = max(1.0, float(tiles_per_block.mean()))
        nblk = int(max(1, min(64, round(G_TARGET / avg_t))))
    # The y output block is (nblk, 128): Mosaic requires sublane-divisible
    # block shapes, so round up to a multiple of 8.
    nblk = max(8, -(-int(nblk) // 8) * 8)
    nsteps = -(-nblocks // nblk)
    nblocks_p = nsteps * nblk

    tpb = np.zeros(nblocks_p, dtype=np.int64)
    tpb[:nblocks] = tiles_per_block
    step_of_block = np.arange(nblocks_p) // nblk
    tiles_per_step = np.zeros(nsteps, dtype=np.int64)
    np.add.at(tiles_per_step, step_of_block, tpb)
    G = int(max(1, tiles_per_step.max()))

    # Tile index within step: running tile offset of each block.
    tile_off = np.cumsum(tpb) - tpb              # global running offset
    step_tile0 = np.zeros(nsteps, dtype=np.int64)
    step_tile0[1:] = np.cumsum(tiles_per_step)[:-1]
    tile_in_step_of_block = tile_off - step_tile0[step_of_block]

    # Per-entry placement.
    e_step = blk // nblk
    e_tile = (tile_in_step_of_block[blk] + sub_ord // SLOTS)
    e_slot = sub_ord % SLOTS
    e_sub = e_tile * SLOTS + e_slot              # sublane row within step

    # Window per step: span of bands referenced.
    band_lo_raw = np.full(nsteps, 2**31 - 1, dtype=np.int64)
    band_hi = np.zeros(nsteps, dtype=np.int64)
    np.minimum.at(band_lo_raw, e_step, band)
    np.maximum.at(band_hi, e_step, band)
    band_lo_raw = np.minimum(band_lo_raw, band_hi)  # empty steps → 0
    span = int((band_hi - band_lo_raw).max()) + 1 if nnz else 1
    nb = max(8, -(-span // 8) * 8)
    if nb > nb_max:
        raise SpanError(
            "step column span of %d bands exceeds the %d-band window "
            "budget; RCM-reorder the matrix or use the ELL path"
            % (span, nb_max))
    ncb = max(ncb, nb)
    band_lo = np.minimum(band_lo_raw, ncb - nb).astype(np.int32)

    data = np.zeros((nsteps, G, SLOTS, LANES), dtype=vals.dtype)
    lanes = np.zeros((nsteps, G, SLOTS, LANES), dtype=np.int32)
    bands = np.zeros((nsteps, G * SLOTS, 1), dtype=np.int32)
    block_local = np.zeros((nsteps, G), dtype=np.int32)

    e_lane_r = rows % LANES
    # add.at: duplicate COO entries accumulate (matches to_dense).
    np.add.at(data, (e_step, e_tile, e_slot, e_lane_r), vals)
    lanes[e_step, e_tile, e_slot, e_lane_r] = lane.astype(np.int32)
    bands[e_step, e_sub, 0] = (band - band_lo[e_step]).astype(np.int32)
    # Tag every tile of every block (incl. a block's padded tail tiles
    # that hold no entry); step-padding tiles stay at block 0, harmless.
    all_blk = np.repeat(np.arange(nblocks_p), tpb)
    all_tile = (np.arange(len(all_blk))
                - np.repeat(step_tile0[step_of_block], tpb))
    block_local[np.repeat(step_of_block, tpb), all_tile] = \
        (all_blk % nblk).astype(np.int32)

    return BELL(jnp.asarray(data), jnp.asarray(lanes), jnp.asarray(bands),
                jnp.asarray(block_local), jnp.asarray(band_lo),
                (m, n), (nblocks_p * LANES, ncb * LANES),
                int(nb), nblk, nnz)


def bell_fill(b: BELL) -> float:
    """Fraction of stored value slots holding true nonzeros."""
    return b.nnz / max(1, int(np.prod(b.data.shape)))


def bell_to_dense(b: BELL):
    """Host-side oracle reconstruction (NumPy; tests only)."""
    mp, npad = b.padded_shape
    out = np.zeros((mp, npad), dtype=np.asarray(b.data).dtype)
    data = np.asarray(b.data)
    lanes = np.asarray(b.lanes)
    bands = np.asarray(b.bands)[..., 0]
    block_local = np.asarray(b.block_local)
    band_lo = np.asarray(b.band_lo)
    nsteps, G, S, L = data.shape
    for st in range(nsteps):
        for g in range(G):
            blk = st * b.nblk + block_local[st, g]
            for s in range(S):
                bd = band_lo[st] + bands[st, g * S + s]
                for r in range(L):
                    v = data[st, g, s, r]
                    if v != 0:
                        out[blk * LANES + r,
                            bd * LANES + lanes[st, g, s, r]] += v
    return out[:b.shape[0], :b.shape[1]]


def _bell_kernel(nb, nblk, G, block_local_ref, band_lo_ref,
                 data_ref, lanes_ref, bands_ref, x_hbm,
                 y_ref, win, xsel, sems):
    st = pl.program_id(0)
    nsteps = pl.num_programs(0)
    S = SLOTS

    def win_dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(band_lo_ref[step], nb), :],
            win.at[slot], sems.at[slot])

    # Double-buffered window: step st computes from slot st%2 and prefetches
    # st+1 into the other slot.
    @pl.when(st == 0)
    def _():
        win_dma(0, 0).start()
    win_dma(st % 2, st).wait()

    @pl.when(st + 1 < nsteps)
    def _():
        win_dma((st + 1) % 2, st + 1).start()

    # Stage the per-sublane-slot x bands with one one-hot MXU matmul for
    # the whole step (per tile this would be MXU-latency-bound).
    w = win[st % 2]                                        # (nb, 128)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (G * S, nb), 1)
              == bands_ref[0]).astype(w.dtype)             # (G*S, nb)
    # HIGHEST: the MXU's default bf16 passes would round the staged x
    # values to ~3 decimal digits; the one-hot operand is exact either
    # way, so 3-pass f32 emulation reconstructs x to full f32.
    xsel[:] = jax.lax.dot_general(
        onehot, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=w.dtype,
        precision=jax.lax.Precision.HIGHEST)               # (G*S, 128)

    y_ref[:] = jnp.zeros_like(y_ref)

    def body(g, _):
        xs = xsel[pl.ds(pl.multiple_of(g * S, S), S), :]   # (S, 128)
        vals = jnp.take_along_axis(xs, lanes_ref[0, g], axis=1)
        contrib = jnp.sum(data_ref[0, g] * vals, axis=0, keepdims=True)
        blk = block_local_ref[st, g]
        y_ref[pl.ds(blk, 1), :] = y_ref[pl.ds(blk, 1), :] + contrib
        return 0

    jax.lax.fori_loop(0, G, body, 0)  # Mosaic supports only unroll=1/full


@functools.partial(jax.jit, static_argnames=("nb", "nblk", "interpret"))
def _bell_matvec_call(data, lanes, bands, block_local, band_lo, x2,
                      nb, nblk, interpret):
    nsteps, G, S, L = data.shape
    if not interpret:
        # Multi-MB inputs otherwise get parked in VMEM around the call and
        # blow the scoped budget (see kernels.py:155-160).
        x2 = pltpu.with_memory_space_constraint(x2, pltpu.HBM)
        data = pltpu.with_memory_space_constraint(data, pltpu.HBM)
        lanes = pltpu.with_memory_space_constraint(lanes, pltpu.HBM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,           # block_local, band_lo
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, G, S, L), lambda s, *_: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, S, L), lambda s, *_: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * S, 1), lambda s, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
        ],
        out_specs=pl.BlockSpec((nblk, L), lambda s, *_: (s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nb, L), data.dtype),     # x window, dbl-buffered
            pltpu.VMEM((G * S, L), data.dtype),     # staged x rows
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bell_kernel, nb, nblk, G)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nsteps * nblk, L), data.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * G * S * L + 2 * nsteps * G * S * nb * L,
            bytes_accessed=2 * data.size * data.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(block_local, band_lo, data, lanes, bands.reshape(nsteps, G * S, 1),
      x2)
    return y.reshape(-1)


def bell_matvec_pallas(b: BELL, x, interpret: bool = False):
    """``y = A @ x`` for a padded input ``x`` of length
    ``padded_shape[1]``; returns y of length ``padded_shape[0]`` — slice
    to ``shape[0]``."""
    x2 = x.reshape(-1, LANES)
    return _bell_matvec_call(b.data, b.lanes, b.bands, b.block_local,
                             b.band_lo, x2, b.nb, b.nblk, bool(interpret))


def reorder_rcm(coo: F.COO):
    """Reverse Cuthill–McKee permutation (host-side, via scipy when
    available) minimizing bandwidth so BELL windows stay small.

    Returns ``(permuted_coo, perm)`` with ``A' = A[perm][:, perm]`` (square
    matrices only); ``x = x'[inv]`` etc. is the caller's job — see
    ``bell_operator(reorder=...)``.
    """
    m, n = coo.shape
    if m != n:
        raise ValueError("RCM reordering needs a square matrix")
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    rows = np.asarray(coo.row)
    cols = np.asarray(coo.col)
    a = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(m, n))
    perm = np.asarray(reverse_cuthill_mckee(a.tocsr(), symmetric_mode=False))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(m)
    return F.coo_from_arrays(np.asarray(coo.data), inv[rows], inv[cols],
                             (m, n), device=False), perm


@functools.lru_cache(maxsize=None)
def _bell_mv_factory(slot, nb, nblk, rows_out, cols_in, interpret):
    # Shared per-config function objects: per-instance closures would force
    # a full solver recompile per matrix (CLAUDE.md conventions).
    def mv(params, x):
        c = params[slot]
        if x.shape[0] == cols_in:       # static shapes: skip the pad copy
            xp = x
        else:
            xp = jnp.zeros(cols_in, dtype=x.dtype).at[:x.shape[0]].set(x)
        y = _bell_matvec_call(c.data, c.lanes, c.bands, c.block_local,
                              c.band_lo, xp.reshape(-1, LANES),
                              nb, nblk, interpret)
        return y if y.shape[0] == rows_out else y[:rows_out]
    return mv


def bell_operator(source, shape=None, symmetric=False, interpret=None,
                  nb_max: int = NB_MAX):
    """Wrap a matrix as a LinearOperator whose matvec is the BELL kernel.

    ``source``: COO container or ``(vals, rows, cols, shape)`` triples or a
    dense array.  The operator acts on the LOGICAL (m, n) shapes: inputs
    are zero-padded and outputs trimmed internally.  The transpose product
    uses a prebuilt BELL of A^T.  ``interpret=None`` auto-selects
    interpreter mode off-TPU.
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
    fwd = bell_from_coo(coo, nb_max=nb_max)
    bwd = None if symmetric else bell_from_coo(F.transpose_coo(coo),
                                               nb_max=nb_max)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    interpret = bool(interpret)

    mv = _bell_mv_factory(0, fwd.nb, fwd.nblk, m, fwd.padded_shape[1],
                          interpret)
    rmv = mv if symmetric else _bell_mv_factory(
        1, bwd.nb, bwd.nblk, n, bwd.padded_shape[1], interpret)

    dtype = np.asarray(fwd.data).dtype
    op = LinearOperator(n, m, matvec=mv, matvec_transp=rmv,
                        params=(fwd, bwd), _takes_params=True,
                        symmetric=symmetric,
                        hermitian=symmetric and not np.issubdtype(
                            dtype, np.complexfloating),
                        dtype=dtype)
    op.fill = bell_fill(fwd)
    return op
