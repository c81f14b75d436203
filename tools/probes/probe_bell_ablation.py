"""Bisect BELL kernel time: full vs no-DMA vs no-staging vs no-scatter.

Ablated variants return WRONG results — timing only.
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pykrylov_tpu.gallery.general import tiled_general_coo
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.bell import (bell_from_coo, bell_to_device,
                                      _dot_onehot, WIN_AHEAD, LANES)

assert jax.default_backend() == "tpu"
BW = 819.0
ITERS = 600

vals, rows, cols, shape = tiled_general_coo(tiles=1024)
rowsum = np.zeros(shape[0]); np.add.at(rowsum, rows, np.abs(vals))
vals = (vals / rowsum.max()).astype(np.float32)
coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
b = bell_to_device(bell_from_coo(coo, spill_cost=None, device=False))
print("slots", b.data.size, "nb", b.nb, "nblk", b.nblk, "GS", b.data.shape[1],
      "steps", b.data.shape[0], flush=True)


def make_kernel(nb, nblk, GS, nsteps, do_dma, do_stage, do_scatter, passes):
    nslots = WIN_AHEAD + 1

    def kernel(band_lo_ref, data_ref, lanes_ref, bands_ref, blocks_ref,
               x_hbm, y_ref, win, sems):
        st = pl.program_id(0)

        def win_dma(step):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(band_lo_ref[step], nb), :],
                win.at[step % nslots], sems.at[step % nslots])

        if do_dma:
            @pl.when(st == 0)
            def _():
                for kk in range(min(WIN_AHEAD, nsteps)):
                    win_dma(kk).start()
            win_dma(st).wait()

            @pl.when(st + WIN_AHEAD < nsteps)
            def _():
                win_dma(st + WIN_AHEAD).start()

        w = win[st % nslots]
        p = lanes_ref[0]
        idx = jnp.concatenate([(p >> (8 * j)) & 255 for j in range(4)],
                              axis=0)
        if do_stage:
            iot = jax.lax.broadcasted_iota(jnp.int32, (GS, nb), 1)
            base = bands_ref[0]
            xsel0 = _dot_onehot(iot == base, w, passes)
            xsel1 = _dot_onehot(iot == base + 1, w, passes)
            low = jnp.take_along_axis(xsel0, idx & 127, axis=1)
            high = jnp.take_along_axis(xsel1, idx & 127, axis=1)
            vals_ = jnp.where(idx < 128, low, high)
        else:
            vals_ = jnp.take_along_axis(
                jnp.broadcast_to(w[:1], (GS, LANES)), idx & 127, axis=1)
        prod = data_ref[0] * vals_
        if do_scatter:
            ohY = (jax.lax.broadcasted_iota(jnp.int32, (nblk, GS), 0)
                   == blocks_ref[0])
            y_ref[:] = _dot_onehot(ohY, prod, passes)
        else:
            y_ref[:] = prod[:nblk, :]
    return kernel


def run(tag, do_dma, do_stage, do_scatter, passes=3):
    nsteps, GS, L = b.data.shape
    nb, nblk = b.nb, b.nblk
    kernel = make_kernel(nb, nblk, GS, nsteps, do_dma, do_stage,
                         do_scatter, passes)

    @jax.jit
    def chain(data, lanes, bands, blocks, band_lo, x2):
        data_c = pltpu.with_memory_space_constraint(data, pltpu.HBM)
        lanes_c = pltpu.with_memory_space_constraint(lanes, pltpu.HBM)
        L = x2.shape[1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, GS, L), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, GS // 4, L), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, GS, 1), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, GS), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((nblk, L), lambda s, *_: (s, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((WIN_AHEAD + 1, nb, L), data.dtype),
                pltpu.SemaphoreType.DMA((WIN_AHEAD + 1,)),
            ],
        )
        call = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((nsteps * nblk, L),
                                                   data.dtype),
            grid_spec=grid_spec)

        npad_rows = x2.shape[0]

        def body(_, x2):
            y = call(band_lo, data_c, lanes_c, bands, blocks,
                     pltpu.with_memory_space_constraint(x2, pltpu.HBM))
            # loop-carried dependence: identical operands every iteration
            # let XLA hoist the (pure) pallas call out of the loop
            return jnp.zeros((npad_rows, L), jnp.float32).at[
                :y.shape[0] // (y.shape[0] // npad_rows + 1) if False
                else min(y.shape[0], npad_rows)].set(
                y[:min(y.shape[0], npad_rows)])
        return jax.lax.fori_loop(0, ITERS, body, x2)[0, 0]

    mp, npad = b.padded_shape
    x2 = jnp.ones((npad // LANES, LANES), jnp.float32)
    try:
        float(chain(b.data, b.lanes, b.bands, b.blocks, b.band_lo, x2))
    except Exception as e:
        print(f"{tag}: FAILED {str(e)[:100]}", flush=True)
        return
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        float(chain(b.data, b.lanes, b.bands, b.blocks, b.band_lo, x2))
        best = min(best, time.perf_counter() - t0)
    sb = b.data.size * 5
    print(f"{tag}: {best/ITERS*1e3:.3f} ms/call stream={ITERS*sb/best/1e9:.0f} "
          f"GB/s util={ITERS*sb/best/1e9/BW:.3f}", flush=True)


import sys
VARIANTS = {
    "full-p3": (True, True, True, 3),
    "full-p2": (True, True, True, 2),
    "no-dma": (False, True, True, 3),
    "no-scatter": (True, True, False, 3),
    "no-stage": (True, False, True, 3),
    "stream-only": (False, False, False, 3),
}
names = sys.argv[1:] or list(VARIANTS)
for name in names:
    run(name, *VARIANTS[name])
