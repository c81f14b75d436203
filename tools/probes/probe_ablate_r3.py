"""Bisect the CURRENT w1 BELL kernel per-slot cost on-chip: which op
eats the 12.5 ps/slot (stream floor alone would be ~7.3)?

Each variant replaces one op with a cheap stand-in — results are WRONG,
timing only.  Loop-carried dependence through x prevents hoisting.
"""
import sys
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from pykrylov_tpu.gallery.general import tiled_general_coo  # noqa: E402
from pykrylov_tpu.sparse import formats as F  # noqa: E402
from pykrylov_tpu.sparse.bell import (bell_from_coo, bell_to_device,  # noqa: E402
                                      _dot_onehot, WIN_AHEAD, LANES)

assert jax.default_backend() == "tpu"
ITERS = 1000

vals, rows, cols, shape = tiled_general_coo(tiles=1024)
rowsum = np.zeros(shape[0])
np.add.at(rowsum, rows, np.abs(vals))
vals = (vals / rowsum.max()).astype(np.float32)
coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
n = shape[0]
b = bell_to_device(bell_from_coo(coo, spill_cost=None, device=False,
                                 window=1))
print(f"pack: slots/nnz={b.data.size/b.nnz:.3f} nb={b.nb} nblk={b.nblk} "
      f"GS={b.data.shape[1]} steps={b.data.shape[0]}", flush=True)


def make_kernel(nb, nblk, GS, nsteps, *, unpack="yes", gather=True,
                mul=True, fold=True, stage="bf16", scatter=True,
                rings=("win", "dat", "lan"), nbsub=None):
    nslots = WIN_AHEAD + 1

    def kernel(band_lo_ref, data_hbm, lanes_hbm, bands_ref, blocks_ref,
               x_hbm, y_ref, win, sems, dbuf, dsems, lbuf, lsems):
        st = pl.program_id(0)
        GQ = GS // 4

        def win_dma(step):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(band_lo_ref[step], nb), :],
                win.at[step % nslots], sems.at[step % nslots])

        def dat_dma(step):
            return pltpu.make_async_copy(
                data_hbm.at[step], dbuf.at[step % nslots],
                dsems.at[step % nslots])

        def lan_dma(step):
            return pltpu.make_async_copy(
                lanes_hbm.at[step], lbuf.at[step % nslots],
                lsems.at[step % nslots])

        dmas = {"win": win_dma, "dat": dat_dma, "lan": lan_dma}
        act = [dmas[r] for r in rings]

        @pl.when(st == 0)
        def _():
            for kk in range(min(WIN_AHEAD, nsteps)):
                for f in act:
                    f(kk).start()
        for f in act:
            f(st).wait()

        @pl.when(st + WIN_AHEAD < nsteps)
        def _():
            for f in act:
                f(st + WIN_AHEAD).start()

        w = win[st % nslots]
        dat = dbuf[st % nslots] if "dat" in rings else \
            jnp.zeros((GS, LANES), jnp.float32)
        p = lbuf[st % nslots] if "lan" in rings else None

        nbs = nbsub or nb
        iot = jax.lax.broadcasted_iota(jnp.int32, (nbs, GS), 0)
        base = bands_ref[0]
        if stage == "bf16":
            xsel = _dot_onehot(iot == base, w[:nbs], 3, transposed=True)
        elif stage == "none":
            xsel = jnp.broadcast_to(w[:1], (GS, LANES)) * 1.0
        elif stage == "p1":
            xsel = _dot_onehot(iot == base, w[:nbs], 1, transposed=True)

        if unpack == "yes":
            idx = jnp.concatenate(
                [(p >> (8 * j)) & 255 for j in range(4)], axis=0)
        else:
            idx = jax.lax.broadcasted_iota(jnp.int32, (GS, LANES), 1)

        vals_ = jnp.take_along_axis(xsel, idx, axis=1) if gather else xsel
        prod = dat * vals_ if mul else vals_
        if fold:
            s8 = prod.reshape(GS // 8, 8, LANES)
            ps = jnp.concatenate([s8[:, :4, :].sum(axis=1),
                                  s8[:, 4:, :].sum(axis=1)], axis=0)
        else:
            ps = prod[:GQ] * 1.0
        if scatter:
            ohY = (jax.lax.broadcasted_iota(jnp.int32, (nblk, GQ), 0)
                   == blocks_ref[0])
            y_ref[:] = _dot_onehot(ohY, ps, 3)
        else:
            y_ref[:] = ps[:nblk]
    return kernel


def run(tag, **kw):
    nsteps, GS, L = b.data.shape
    nb, nblk = b.nb, b.nblk
    kernel = make_kernel(nb, nblk, GS, nsteps, **kw)
    nring = WIN_AHEAD + 1

    @jax.jit
    def chain(data, lanes, bands, blocks, band_lo, x2):
        data_c = pltpu.with_memory_space_constraint(data, pltpu.HBM)
        lanes_c = pltpu.with_memory_space_constraint(lanes, pltpu.HBM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, GS), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, GS // 4), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((nblk, L), lambda s, *_: (s, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nring, nb, L), jnp.float32),
                pltpu.SemaphoreType.DMA((nring,)),
                pltpu.VMEM((nring, GS, L), jnp.float32),
                pltpu.SemaphoreType.DMA((nring,)),
                pltpu.VMEM((nring, GS // 4, L), jnp.int32),
                pltpu.SemaphoreType.DMA((nring,)),
            ],
        )
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nsteps * nblk, L),
                                           jnp.float32),
            grid_spec=grid_spec)
        npad_rows = x2.shape[0]

        def body(_, x2):
            y = call(band_lo, data_c, lanes_c, bands, blocks,
                     pltpu.with_memory_space_constraint(x2, pltpu.HBM))
            return jnp.zeros((npad_rows, L), jnp.float32).at[
                :min(y.shape[0], npad_rows)].set(
                y[:min(y.shape[0], npad_rows)])
        return jax.lax.fori_loop(0, ITERS, body, x2)[0, 0]

    mp, npad = b.padded_shape
    try:
        float(chain(b.data, b.lanes, b.bands, b.blocks, b.band_lo,
                    jnp.ones((npad // LANES, LANES), jnp.float32)))
    except Exception as e:
        print(f"{tag:38s} FAILED {str(e)[:120]}", flush=True)
        return
    best = np.inf
    for rep in range(3):
        x2 = jnp.full((npad // LANES, LANES), 1.0 + 0.1 * rep,
                      jnp.float32)
        float(x2[0, 0])
        t0 = time.perf_counter()
        float(chain(b.data, b.lanes, b.bands, b.blocks, b.band_lo, x2))
        best = min(best, time.perf_counter() - t0)
    ps = best / ITERS / b.data.size * 1e12
    print(f"{tag:38s} {best/ITERS*1e3:.3f} ms ps/slot={ps:.1f}",
          flush=True)


run("full (parity with prod kernel)")
run("dma-only (y=fold(dat))", stage="none", gather=False, unpack="no",
    mul=True)
run("no-stage (xsel=bcast)", stage="none")
run("stage passes=1", stage="p1")
run("stage nb/4 contraction", nbsub=max(8, b.nb // 4))
run("no-unpack (idx=iota)", unpack="no")
run("no-gather", gather=False)
run("no-mul", mul=False)
run("no-fold", fold=False)
run("no-scatter", scatter=False)
run("no-win-ring", rings=("dat", "lan"), stage="none")
run("no-dat-ring", rings=("win", "lan"), mul=False)
run("no-lan-ring", rings=("win", "dat"), unpack="no")
