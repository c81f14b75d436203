"""On-chip probe (VERDICT r3 #8): DIA ring kernel with MANUAL diagonal
data DMA.

The shipping kernel BlockSpec-loads the whole (ndiag, brows, 128) data
block per step — auto double-buffered, so VMEM holds 2*ndiag*brows*128*4
bytes, which rules out brows=2048 (block=262144) for 7-diagonal
stencils.  This variant streams the data one DIAGONAL at a time through
a 2-slot ring (prefetch diagonal k+1 while accumulating diagonal k,
crossing into block i+1's first diagonal at the step edge), so data
VMEM is 2 slots of ONE diagonal: 262144-blocks fit, halving the step
count and its fixed bubbles.

Adopt-or-reject: correctness vs the shipping kernel, then best-of-3
chained timing at block = 131072 (shipping best) and 262144 (newly
feasible).
"""
import sys, os, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.kernels import (LANES, _halo_rows_exact, pack_dia,
                                         ensure_dia_padded,
                                         _dia_matvec_call, _RING)
from pykrylov_tpu.gallery.poisson import poisson3d_coo


def _dia_kernel_mdma(offsets, brows, hrows, ndiag, nblk,
                     data_hbm, x_hbm, y_ref, xring, xsems, dring, dsems):
    i = pl.program_id(0)

    def xdma(j):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(j * brows, brows), :],
            xring.at[j % _RING], xsems.at[j % _RING])

    def ddma(k, j, slot):
        return pltpu.make_async_copy(
            data_hbm.at[k, pl.ds(j * brows, brows), :],
            dring.at[slot], dsems.at[slot])

    # ring slots follow GLOBAL diagonal-stream position parity
    # (g = i*ndiag + k): with odd ndiag the within-block parity flips
    # every block (the first probe run returned wrong values from
    # exactly this producer/consumer slot mismatch)
    par = (i * ndiag) % 2

    @pl.when(i == 0)
    def _():
        xdma(jnp.int32(0)).start()
        if nblk > 1:
            xdma(jnp.int32(1)).start()
        if nblk > 2:
            xdma(jnp.int32(2)).start()
        # first two positions of block 0's diagonal stream
        ddma(0, jnp.int32(0), jnp.int32(0)).start()
        if ndiag > 1:
            ddma(1, jnp.int32(0), jnp.int32(1)).start()
        xdma(jnp.int32(0)).wait()
        if nblk > 1:
            xdma(jnp.int32(1)).wait()

    @pl.when((i >= 1) & (i + 1 <= nblk - 1))
    def _():
        xdma(i + 1).wait()

    @pl.when((i >= 1) & (i + 2 <= nblk - 1))
    def _():
        xdma(i + 2).start()

    xl = xring[(i - 1) % _RING][brows - hrows:, :]
    xl = jnp.where(i == 0, jnp.zeros_like(xl), xl)
    xr = xring[(i + 1) % _RING][:hrows, :]
    xr = jnp.where(i == nblk - 1, jnp.zeros_like(xr), xr)
    xw = jnp.concatenate([xl, xring[i % _RING], xr], axis=0)

    # lane-roll cache shared across diagonals (same scheme as the
    # shipping _dia_accumulate)
    rolled = {0: xw}
    lane = jax.lax.broadcasted_iota(jnp.int32, (brows, LANES), 1)
    for off in offsets:
        dl = off % LANES
        if dl and dl not in rolled:
            rolled[dl] = pltpu.roll(xw, LANES - dl, 1)

    def shifted(off):
        dr, dl = divmod(off, LANES)
        base = hrows + dr
        rw = rolled[dl]
        if dl == 0:
            return rw[base:base + brows, :]
        return jnp.where(lane < LANES - dl,
                         rw[base:base + brows, :],
                         rw[base + 1:base + 1 + brows, :])

    acc = None
    for k in range(ndiag):  # static unroll: diagonal ring of depth 2
        # position k's block was prefetched two positions earlier (init
        # for k=0,1 of block 0; the tail of block i-1 for k=0,1 of
        # later blocks; the post-consume start below otherwise)
        slot = (par + k) % 2
        pltpu.make_async_copy(dring.at[slot], dring.at[slot],
                              dsems.at[slot]).wait()
        d = dring[slot]
        term = d * shifted(offsets[k])
        acc = term if acc is None else acc + term
        # this slot is free now: fetch position k+2 of the stream
        # (diagonal k+2, or diagonals 0/1 of block i+1) — same global
        # parity as the slot just consumed
        nxt = k + 2
        if nxt < ndiag:
            ddma(nxt, i, slot).start()
        else:
            pl.when(i + 1 <= nblk - 1)(
                lambda nxt=nxt, slot=slot: ddma(nxt - ndiag, i + 1,
                                                slot).start())
    y_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "block"))
def dia_matvec_mdma(d3, x, offsets, block):
    ndiag, rows, _ = d3.shape
    m = rows * LANES
    nblk = m // block
    brows = block // LANES
    ct = jnp.promote_types(d3.dtype, x.dtype)
    x2 = x.astype(ct).reshape(rows, LANES)
    x2 = pltpu.with_memory_space_constraint(x2, pltpu.HBM)
    d3 = pltpu.with_memory_space_constraint(d3, pltpu.HBM)
    hrows = _halo_rows_exact(offsets, brows)
    kernel = functools.partial(_dia_kernel_mdma, offsets, brows, hrows,
                               ndiag, nblk)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), ct),
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((brows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_RING, brows, LANES), ct),
            pltpu.SemaphoreType.DMA((_RING,)),
            pltpu.VMEM((2, brows, LANES), ct),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * m,
            bytes_accessed=(ndiag + 2) * m * 4, transcendentals=0),
    )(d3, x2)
    return y.reshape(m)


def bench_chain(fn, d3, m, iters=400, tag=""):
    @jax.jit
    def chain(d3, x):
        return jax.lax.fori_loop(0, iters, lambda _, x: fn(d3, x), x)
    t0 = time.perf_counter()
    float(chain(d3, jnp.ones(m, jnp.float32))[0])
    print("  [%s] compile %.1fs" % (tag, time.perf_counter() - t0),
          flush=True)
    best = np.inf
    for rep in range(3):
        xr = jnp.full(m, 1.0 + 0.125 * (rep + 1), jnp.float32)
        float(xr[0])
        t0 = time.perf_counter()
        float(chain(d3, xr)[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


if __name__ == "__main__":
    n = 240
    vals, rows, cols, shape = poisson3d_coo(n, dtype=np.float32)
    dia = F.dia_from_coo(F.COO(vals / 12.0, rows.astype(np.int32),
                               cols.astype(np.int32), shape),
                         device=False)
    m0 = dia.shape[0]
    for block in (131072, 262144):
        dia_p, _ = ensure_dia_padded(dia, block)
        d3, offsets = pack_dia(dia_p, block)
        m = dia_p.shape[0]
        ndiag = dia_p.data.shape[0]
        # correctness vs shipping kernel (at 131072 both run)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal(m).astype(np.float32))
        y_new = dia_matvec_mdma(d3, x, offsets, block)
        if block == 131072:
            y_ref = _dia_matvec_call(d3, x, offsets, block, False)
            diff = float(jnp.abs(y_new - y_ref).max())
            print("block=%d: max|diff| vs shipping = %.2e"
                  % (block, diff), flush=True)
            assert diff < 1e-5
            t_ref = bench_chain(
                lambda d3, x: _dia_matvec_call(d3, x, offsets, block,
                                               False),
                d3, m, tag="ship-%d" % block)
            gb = (ndiag + 2) * m * 4 / t_ref / 1e9
            print("  shipping %d: %.4f ms/mv  %.1f GB/s"
                  % (block, t_ref * 1e3, gb), flush=True)
        else:
            # reference at the largest shipping-feasible block
            dia_s, _ = ensure_dia_padded(dia, 131072)
            d3s, offs_s = pack_dia(dia_s, 131072)
            y_ref = _dia_matvec_call(
                d3s, x[:dia_s.shape[0]], offs_s, 131072, False)
            diff = float(jnp.abs(y_new[:dia_s.shape[0]]
                                 - y_ref).max())
            print("block=%d: max|diff| vs shipping-131072 = %.2e"
                  % (block, diff), flush=True)
            assert diff < 1e-5
        t_new = bench_chain(
            lambda d3, x: dia_matvec_mdma(d3, x, offsets, block),
            d3, m, tag="mdma-%d" % block)
        gb = (ndiag + 2) * m * 4 / t_new / 1e9
        print("  manual-dma %d: %.4f ms/mv  %.1f GB/s"
              % (block, t_new * 1e3, gb), flush=True)
