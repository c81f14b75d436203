"""Pallas TPU kernels for sparse matvecs.

The XLA expression of the DIA matvec (``formats.dia_matvec``) re-reads the
padded x vector once per diagonal and materializes a padded copy — measured
~61 GB/s on v5e, 7% of the HBM roofline.  The kernel here streams each
operand exactly once per row block and keeps the VPU's (8, 128) tiles fully
occupied:

  * the length-m vector is viewed as a (m/128, 128) matrix — the native
    lane layout, so every loaded tile is dense work (a (1, m) layout runs
    at 1/8 utilization: only one sublane live per tile);
  * a flat shift by a static diagonal offset ``off`` decomposes as
    ``off = dr*128 + dl`` → a static row shift plus a static lane rotate,
    implemented as two static VMEM slices and one lane-axis concatenate;
  * each grid step sees a three-block window of x (previous/current/next
    row blocks), so every x element is fetched from HBM at most 3x and the
    Mosaic pipeline double-buffers the block DMAs behind the VPU
    multiply-adds.

HBM traffic per block is ``(ndiag + 3 + 1) * BLOCK * 4`` bytes — within
1.2x of the roofline minimum for 7-diagonal stencils.

Out-of-range reads need no masking: ``dia_from_coo`` zero-fills data slots
whose column index would fall outside the matrix (``formats.py:144-159``),
so whatever x value a shifted window holds there is multiplied by zero.
The neighbor-window index maps clamp at the global edges for the same
reason.

Requirements: ``m`` a multiple of ``block`` (see :func:`ensure_dia_padded`;
``block`` itself a multiple of 128) and ``max|offset| < block``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import formats as F

__all__ = ["dia_matvec_pallas", "dia_matvec_packed", "pack_dia",
           "ensure_dia_padded", "dia_transpose", "pallas_dia_operator",
           "choose_block", "DEFAULT_BLOCK"]

LANES = 128
DEFAULT_BLOCK = 65536  # elements per grid step: 512 rows x 128 lanes


def choose_block(ndiag, offsets, vmem_budget=14 << 20, itemsize=4,
                 m=None, max_pad=0.04):
    """Pick a block size for a diagonal structure.

    Bigger blocks amortize per-step costs, bounded by (a) every
    |offset| < block and (b) the VMEM footprint of the (default)
    ring-buffered path: double-buffered diagonal data at the STORAGE
    itemsize (pass 2 for bf16 diagonals) + the 4-slot f32 x ring +
    the double-buffered f32 output.  Measured on v5e: 131072 beats the
    65536 default by ~9% effective bandwidth on 7-diagonal stencils
    with n^2-scale offsets.  Raises when no supported block exceeds
    the bandwidth; falls back to the smallest supported block when
    every candidate overshoots the budget (the compile may still be
    tight — shrink the stencil or the budget caller-side).

    When the row count ``m`` is given, padded rows count against the
    choice: the kernel streams ``(ndiag+2)·mp`` bytes, so a 330k-row
    system padded to a 131072 multiple paid 19% extra (round-5 probe).
    The LARGEST VMEM-feasible block whose padding stays under
    ``max_pad`` wins; if none qualifies, the minimum-padding one.
    """
    w = max((abs(int(o)) for o in offsets), default=0)
    feasible = [b for b in (262144, 131072, 65536, 32768, 16384, 8192)
                if w < b]
    if not feasible:
        raise ValueError("offset %d exceeds every supported block" % w)

    def vmem_ok(block):
        brows = block // LANES
        data_b = ndiag * brows * LANES * itemsize * 2
        ring_b = _RING * brows * LANES * 4
        out_b = brows * LANES * 4 * 2
        return data_b + ring_b + out_b <= vmem_budget

    fits = [b for b in feasible if vmem_ok(b)] or [feasible[-1]]
    if m is None:
        return fits[0]

    def pad_frac(block):
        return (-(-m // block) * block - m) / m

    for block in fits:           # largest-first
        if pad_frac(block) <= max_pad:
            return block
    return min(fits, key=pad_frac)


def ensure_dia_padded(dia: F.DIA, block: int = DEFAULT_BLOCK):
    """Pad a DIA container's row dimension to a multiple of ``block``.

    Returns ``(padded_dia, pad)``.  Padded rows hold zero data so they
    produce zero output; the operator becomes (mp x mp).
    """
    m, n = dia.shape
    if m != n:
        raise ValueError("DIA kernel expects a square operator")
    mp = (m + block - 1) // block * block
    if mp == m:
        return dia, 0
    data = np.zeros((dia.data.shape[0], mp), dtype=dia.data.dtype)
    data[:, :m] = np.asarray(dia.data)
    return F.DIA(jnp.asarray(data), dia.offsets, (mp, mp)), mp - m


def _dia_accumulate(offsets, brows, hrows, ndiag, data_ref, xw, y_ref):
    """Shared accumulation body of both DIA kernels over an assembled
    x window ``xw`` = [left halo (hrows) | block (brows) | right halo].

    A flat shift by static ``off`` on the (rows, 128) view is a row
    shift dr plus a lane rotate dl.  Mosaic cannot concatenate
    lane-misaligned slices, so the rotate is a circular pltpu.roll +
    lane-mask select — and since offsets sharing the same dl need the
    SAME rotation, the whole window is rolled once per distinct dl
    (2.5x fewer rolls than rolling the two contributing row blocks per
    offset)."""
    rolled = {0: xw}
    lane = jax.lax.broadcasted_iota(jnp.int32, (brows, LANES), 1)
    for off in offsets:
        dl = off % LANES
        if dl and dl not in rolled:
            rolled[dl] = pltpu.roll(xw, LANES - dl, 1)  # roll left by dl

    def shifted(off):
        dr, dl = divmod(off, LANES)  # dl in [0, 128)
        base = hrows + dr
        rw = rolled[dl]
        if dl == 0:
            return rw[base:base + brows, :]
        # Lanes < 128-dl come from row base+r, the carry lanes from the
        # next row — both static slices of the same rolled window.
        return jnp.where(lane < LANES - dl,
                         rw[base:base + brows, :],
                         rw[base + 1:base + 1 + brows, :])

    def diag(k):
        d = data_ref[k]
        # bf16-stored diagonals, f32 compute (cast per diagonal slice)
        return d if d.dtype == xw.dtype else d.astype(xw.dtype)

    acc = diag(0) * shifted(offsets[0])
    for k in range(1, ndiag):  # static unroll over diagonals
        acc = acc + diag(k) * shifted(offsets[k])
    y_ref[:] = acc


def _dia_kernel(offsets, brows, hrows, ndiag, data_ref, xl_ref, xc_ref,
                xr_ref, y_ref):
    # Window = [left halo | current block | right halo]:
    # (hrows + brows + hrows, LANES).  Halos are slim (hrows rows), so x
    # HBM traffic is (1 + 2*hrows/brows)x instead of 3x.
    xw = jnp.concatenate([xl_ref[:], xc_ref[:], xr_ref[:]], axis=0)

    # A flat shift by static `off` on the (rows, 128) view is a row shift
    # dr plus a lane rotate dl.  Mosaic cannot concatenate lane-misaligned
    # slices, so the rotate is a circular pltpu.roll + lane-mask select —
    # and since offsets sharing the same dl need the SAME rotation, the
    # whole window is rolled once per distinct dl (2.5x fewer rolls than
    # rolling the two contributing row blocks per offset).
    _dia_accumulate(offsets, brows, hrows, ndiag, data_ref, xw, y_ref)


def _halo_rows(offsets, brows):
    """Smallest divisor of ``brows`` covering the diagonal halo in rows.

    Mosaic requires BlockSpec row counts divisible by 8 (or equal to the
    full array dimension), so the divisor is also 8-aligned — a
    main-diagonal-only matrix (need = 1) must still take an 8-row halo
    sliver, not a (1, 128) block (found by the round-4 hybrid probe:
    fmt="auto" on a near-diagonal matrix crashed the lowering)."""
    need = 1  # window layout assumes at least one halo row per side
    for off in offsets:
        dr, dl = divmod(off, LANES)
        need = max(need, -dr, dr + (1 if dl else 0))
    for d in range(1, brows + 1):
        if brows % d == 0 and d >= need and (d % 8 == 0 or d == brows):
            return d
    raise ValueError("halo %d rows exceeds block of %d rows"
                     % (need, brows))


def _halo_rows_exact(offsets, brows):
    """Exact halo rows (8-aligned) — the ring kernel has no divisor
    constraint, so wide-offset stencils (3-D Poisson: ±n² ⇒ ~450 rows)
    pay only what they need instead of the next divisor (512)."""
    need = 1
    for off in offsets:
        dr, dl = divmod(off, LANES)
        need = max(need, -dr, dr + (1 if dl else 0))
    if need > brows:
        raise ValueError("halo %d rows exceeds block of %d rows"
                         % (need, brows))
    return min(-(-need // 8) * 8, brows)


_RING = 4  # x ring slots: blocks i-1, i, i+1 resident + 1 in flight
_MM_VMEM_BUDGET = 12 << 20  # SpMM scoped-VMEM estimate cap (16 MB hard)


def _dia_kernel_ring(offsets, brows, hrows, ndiag, nblk,
                     data_ref, x_hbm, y_ref, ring, sems):
    """Ring-buffered variant: each x block is DMA'd from HBM exactly
    once (the BlockSpec kernel re-reads ``2·hrows`` halo rows per step —
    a 1.9x x stream for 3-D Poisson at brows=1024).  Slot j%4 holds
    block j; step i reads slivers of blocks i-1 and i+1 plus block i,
    waits on block i+1's fetch and prefetches block i+2."""
    i = pl.program_id(0)

    def dma(j):
        # fetch x block j into slot j % _RING (j is a traced index)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(j * brows, brows), :],
            ring.at[j % _RING], sems.at[j % _RING])

    @pl.when(i == 0)
    def _():
        dma(jnp.int32(0)).start()
        if nblk > 1:
            dma(jnp.int32(1)).start()
        if nblk > 2:
            dma(jnp.int32(2)).start()
        dma(jnp.int32(0)).wait()
        if nblk > 1:
            dma(jnp.int32(1)).wait()

    @pl.when((i >= 1) & (i + 1 <= nblk - 1))
    def _():
        dma(i + 1).wait()

    @pl.when((i >= 1) & (i + 2 <= nblk - 1))
    def _():
        dma(i + 2).start()

    # Edge slots hold garbage (i=0's left, i=nblk-1's right): the data
    # there is zero, but uninitialized VMEM could be NaN and NaN*0 is
    # NaN — mask the slivers at the global edges explicitly.
    xl = ring[(i - 1) % _RING][brows - hrows:, :]
    xl = jnp.where(i == 0, jnp.zeros_like(xl), xl)
    xr = ring[(i + 1) % _RING][:hrows, :]
    xr = jnp.where(i == nblk - 1, jnp.zeros_like(xr), xr)
    xw = jnp.concatenate([xl, ring[i % _RING], xr], axis=0)

    _dia_accumulate(offsets, brows, hrows, ndiag, data_ref, xw, y_ref)


@functools.partial(jax.jit, static_argnames=("offsets", "block",
                                             "interpret", "ring"))
def _dia_matvec_call(d3, x, offsets, block, interpret, ring=None):
    """d3: packed diagonals (ndiag, m/128, 128); x: flat (m,)."""
    ndiag, rows, _ = d3.shape
    m = rows * LANES
    nblk = m // block
    brows = block // LANES
    # mixed-precision storage: bf16 diagonals with an f32 x — every
    # accumulation runs at the promoted dtype, so the matvec is exact
    # in the stored (bf16-rounded) matrix (2 B/value diagonal stream)
    ct = jnp.promote_types(d3.dtype, x.dtype)
    if x.dtype != ct:
        x = x.astype(ct)
    x2 = x.reshape(rows, LANES)
    if not interpret:
        # Without this, XLA may keep the whole x vector and the diagonal
        # array resident in VMEM around the kernel (they can individually
        # fit), blowing the 16 MB scoped budget for multi-MB systems.
        x2 = pltpu.with_memory_space_constraint(x2, pltpu.HBM)
        d3 = pltpu.with_memory_space_constraint(d3, pltpu.HBM)

    if ring is None:
        ring = nblk >= 2
    if ring:
        # Ring-buffered x: each block DMA'd once — the BlockSpec path
        # re-reads 2·hrows halo rows per step (1.9x x traffic for 3-D
        # Poisson stencils whose ±n² offsets force ~450-row halos).
        hrows = _halo_rows_exact(offsets, brows)
        kernel = functools.partial(_dia_kernel_ring, offsets, brows,
                                   hrows, ndiag, nblk)
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), ct),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((ndiag, brows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
            ],
            out_specs=pl.BlockSpec((brows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_RING, brows, LANES), ct),   # x ring
                pltpu.SemaphoreType.DMA((_RING,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * ndiag * m,
                bytes_accessed=(ndiag + 2) * m * d3.dtype.itemsize,
                transcendentals=0),
            interpret=interpret,
        )(d3, x2)
        return y.reshape(m)

    hrows = _halo_rows(offsets, brows)
    # Halo index maps address x in (hrows, LANES) units.
    hper = brows // hrows
    nh = rows // hrows

    kernel = functools.partial(_dia_kernel, offsets, brows, hrows, ndiag)
    h_shape = (hrows, LANES)
    grid_spec = pl.GridSpec(
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((ndiag, brows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # Slim halo slivers; edge blocks clamp (data there is zero).
            pl.BlockSpec(h_shape,
                         lambda i: (jnp.maximum(i * hper - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((brows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(h_shape,
                         lambda i: (jnp.minimum((i + 1) * hper, nh - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((brows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), ct),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * m,
            bytes_accessed=(ndiag + 2) * m * d3.dtype.itemsize
            + 2 * hrows * LANES * nblk * d3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(d3, x2, x2, x2)
    # Note: the OUTPUT buffer cannot be HBM-constrained here — the memory-
    # space tag propagates through reshape and is rejected at the jit
    # boundary.  With block > DEFAULT_BLOCK XLA sometimes parks the multi-MB
    # output in VMEM and fails scoped allocation; stick to the default
    # block size for large systems.
    return y.reshape(m)


def _dia_mm_kernel_ring(offsets, brows, hrows, ndiag, nblk, K,
                        data_ref, x_hbm, y_ref, ring, sems):
    """Block-product (SpMM) variant of the ring kernel: the diagonal
    block is loaded ONCE per step and multiplied against all K columns
    (x_hbm is (K, rows, LANES)); only the x/y streams scale with K.
    vmapping the matvec kernel instead re-streams the diagonals per
    column and defeats the DMA ring (measured ~1000x slower, ROADMAP
    'Batched solvers')."""
    i = pl.program_id(0)

    def dma(j):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(j * brows, brows), :],
            ring.at[j % _RING], sems.at[j % _RING])

    @pl.when(i == 0)
    def _():
        dma(jnp.int32(0)).start()
        if nblk > 1:
            dma(jnp.int32(1)).start()
        if nblk > 2:
            dma(jnp.int32(2)).start()
        dma(jnp.int32(0)).wait()
        if nblk > 1:
            dma(jnp.int32(1)).wait()

    @pl.when((i >= 1) & (i + 1 <= nblk - 1))
    def _():
        dma(i + 1).wait()

    @pl.when((i >= 1) & (i + 2 <= nblk - 1))
    def _():
        dma(i + 2).start()

    for k in range(K):  # static unroll: diagonals stay resident
        xl = ring[(i - 1) % _RING][k, brows - hrows:, :]
        xl = jnp.where(i == 0, jnp.zeros_like(xl), xl)
        xr = ring[(i + 1) % _RING][k, :hrows, :]
        xr = jnp.where(i == nblk - 1, jnp.zeros_like(xr), xr)
        xw = jnp.concatenate([xl, ring[i % _RING][k], xr], axis=0)
        _dia_accumulate(offsets, brows, hrows, ndiag, data_ref, xw,
                        y_ref.at[k])


@functools.partial(jax.jit, static_argnames=("offsets", "block",
                                             "interpret"))
def _dia_matmat_call(d3, X, offsets, block, interpret):
    """Fused DIA SpMM: ``X`` is (m, K); returns (m, K)."""
    ndiag, rows, _ = d3.shape
    m = rows * LANES
    nblk = m // block
    brows = block // LANES
    K = X.shape[1]
    # The x ring, the output double-buffer AND the per-k accumulate
    # temporaries (one rolled window per distinct lane shift) scale
    # with K: shrink the grid block (d3's layout is block-independent)
    # until the scoped VMEM estimate fits the 16 MB budget.
    def _vmem_est(br):
        return (_RING * K * br          # x ring
                + 2 * ndiag * br        # diagonal double-buffer
                + 2 * K * br            # output double-buffer
                + K * br * (1 + min(ndiag, 8))   # rolled windows/temps
                ) * LANES * 4

    while _vmem_est(brows) > _MM_VMEM_BUDGET and brows % 2 == 0:
        try:
            _halo_rows_exact(offsets, brows // 2)
        except ValueError:
            break
        brows //= 2
        nblk *= 2
    ct = jnp.promote_types(d3.dtype, X.dtype)
    if X.dtype != ct:
        X = X.astype(ct)
    xk = X.T.reshape(K, rows, LANES)
    if not interpret:
        xk = pltpu.with_memory_space_constraint(xk, pltpu.HBM)
        d3 = pltpu.with_memory_space_constraint(d3, pltpu.HBM)
    hrows = _halo_rows_exact(offsets, brows)
    kernel = functools.partial(_dia_mm_kernel_ring, offsets, brows,
                               hrows, ndiag, nblk, int(K))
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, rows, LANES), ct),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((ndiag, brows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec((K, brows, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_RING, K, brows, LANES), ct),
            pltpu.SemaphoreType.DMA((_RING,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * m * K,
            bytes_accessed=(ndiag + 2 * K) * m * d3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(d3, xk)
    # barrier: without it XLA assigns the multi-MB pallas result a VMEM
    # layout to fuse the transpose and blows the scoped budget
    y = jax.lax.optimization_barrier(y)
    return y.reshape(K, m).T


def dia_matmat_packed(d3, offsets, X, block: int = DEFAULT_BLOCK,
                      interpret: bool = False):
    """``Y = A @ X`` for an (m, K) RHS block from a packed diagonal
    array — streams the diagonals once for all K columns."""
    _check_dia(d3.shape[1] * LANES, offsets, int(block))
    return _dia_matmat_call(d3, X, offsets, int(block), bool(interpret))


def _check_dia(m, offsets, block):
    if block % LANES:
        raise ValueError("block must be a multiple of %d" % LANES)
    if m % block:
        raise ValueError("m=%d not a multiple of block=%d; call "
                         "ensure_dia_padded first" % (m, block))
    w = max((abs(o) for o in offsets), default=0)
    if w >= block:
        raise ValueError("offset %d exceeds block %d" % (w, block))


def pack_dia(a: F.DIA, block: int = DEFAULT_BLOCK):
    """Pre-reshape a padded DIA container's data to the kernel layout
    (ndiag, m/128, 128).  Do this ONCE at operator construction — packing
    inside a solver loop would re-copy the (large) diagonal array every
    matvec."""
    m, n = a.shape
    _check_dia(m, a.offsets, block)
    d3 = jnp.asarray(a.data).reshape(a.data.shape[0], m // LANES, LANES)
    return d3, tuple(int(o) for o in a.offsets)


def dia_matvec_packed(d3, offsets, x, block: int = DEFAULT_BLOCK,
                      interpret: bool = False, ring=None):
    """``y = A @ x`` from a :func:`pack_dia`-packed diagonal array.
    ``ring=None`` auto-selects the ring-buffered x path (each block
    fetched once) whenever the grid has >= 2 steps."""
    # a block inconsistent with the packed shape would otherwise return
    # garbage (nblk=0 grids run no step at all and the output buffer
    # comes back uninitialized)
    _check_dia(d3.shape[1] * LANES, offsets, int(block))
    return _dia_matvec_call(d3, x, offsets, int(block), bool(interpret),
                            ring)


def dia_matvec_pallas(a: F.DIA, x, block: int = DEFAULT_BLOCK,
                      interpret: bool = False, ring=None):
    """``y = A @ x`` for a row-padded DIA container via the Pallas kernel.

    ``a.shape[0]`` must be a multiple of ``block`` (see
    :func:`ensure_dia_padded`), ``block`` a multiple of 128, and every
    ``|offset| < block``.  ``interpret=True`` runs in interpreter mode
    (CPU testing).  For repeated matvecs (solver loops) use
    :func:`pack_dia` + :func:`dia_matvec_packed` so the data reshape
    happens once.
    """
    d3, offsets = pack_dia(a, block)
    return _dia_matvec_call(d3, x, offsets, int(block), bool(interpret),
                            ring)


def dia_transpose(a: F.DIA) -> F.DIA:
    """Host-side transpose of a square DIA container.

    Entry (i, i+off) of A is entry (j, j-off) of A^T at j = i+off, so
    diagonal ``off`` becomes diagonal ``-off`` with its data shifted by
    ``off``: ``dataT[-off][j] = data[off][j-off]``.
    """
    m, n = a.shape
    if m != n:
        raise ValueError("dia_transpose expects a square container")
    data = np.asarray(a.data)
    offsets_t = tuple(sorted(-o for o in a.offsets))
    out = np.zeros((len(offsets_t), m), dtype=data.dtype)
    pos = {o: k for k, o in enumerate(offsets_t)}
    for k, off in enumerate(a.offsets):
        row = out[pos[-off]]
        if off >= 0:
            row[off:] = data[k, :m - off] if off else data[k]
        else:
            row[:m + off] = data[k, -off:]
    return F.DIA(jnp.asarray(out), offsets_t, (m, n))


@functools.lru_cache(maxsize=None)
def _packed_mv_factory(slot, offsets, block, interpret):
    # Memoized per config: equal-config operators share one function
    # object in their pytree aux data (shared solver jit caches).
    def mv(params, x):
        return _dia_matvec_call(params[slot], x, offsets, block, interpret)
    return mv


@functools.lru_cache(maxsize=None)
def _packed_mm_factory(slot, offsets, block, interpret):
    def mm(params, X):
        return _dia_matmat_call(params[slot], X, offsets, block, interpret)
    return mm


def pallas_dia_operator(dia: F.DIA, symmetric=False,
                        block=None, interpret=None):
    """Build a :class:`~pykrylov_tpu.ops.LinearOperator` whose matvec is the
    Pallas DIA kernel, with the diagonal data packed once at construction.

    The container is padded to a ``block`` multiple automatically (the
    operator then acts on vectors of length ``op.nargout``; read back the
    first ``dia.shape[0]`` entries).  ``interpret=None`` auto-selects
    interpreter mode off-TPU so the operator works on the CPU backend.
    """
    from ..ops.base import LinearOperator

    m0 = dia.shape[0]
    if block is None:
        block = choose_block(dia.data.shape[0], dia.offsets,
                             itemsize=np.dtype(dia.data.dtype).itemsize,
                             m=m0)
    dia_p, pad = ensure_dia_padded(dia, block)
    d3, offsets = pack_dia(dia_p, block)
    if symmetric:
        bwd = None
    else:
        dia_t, _ = ensure_dia_padded(dia_transpose(dia), block)
        bwd = pack_dia(dia_t, block)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    interpret = bool(interpret)
    mp = dia_p.shape[0]

    mv = _packed_mv_factory(0, offsets, block, interpret)
    mm = _packed_mm_factory(0, offsets, block, interpret)
    if symmetric:
        rmv, rmm = mv, mm
    else:
        rmv = _packed_mv_factory(1, bwd[1], block, interpret)
        rmm = _packed_mm_factory(1, bwd[1], block, interpret)

    dtype = dia.data.dtype
    op = LinearOperator(mp, mp, matvec=mv, matvec_transp=rmv,
                        matmat=mm, matmat_transp=rmm,
                        params=(d3, None if symmetric else bwd[0]),
                        _takes_params=True, symmetric=symmetric,
                        hermitian=symmetric and not np.issubdtype(
                            dtype, np.complexfloating),
                        dtype=dtype)
    op.pad = pad
    op.rows_unpadded = m0
    op.block = block
    return op
