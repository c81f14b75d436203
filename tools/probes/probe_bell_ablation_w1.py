"""Bisect the window=1 BELL kernel's VPU phase: which per-slot op eats
the time (idx unpack / lane gather / multiply / 8-row group sum)?

Ablated variants return WRONG results — timing only.  Keep a
loop-carried dependence through x so XLA cannot hoist the pallas call.
Run from repo root: python -c "import sys; sys.path.insert(0,'.');
exec(open('tools/probes/probe_bell_ablation_w1.py').read())"
"""
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
b = bell_to_device(bell_from_coo(coo, nblk=64, spill_cost=None,
                                 device=False, window=1))
print("slots", b.data.size, "nb", b.nb, "nblk", b.nblk,
      "GS", b.data.shape[1], "steps", b.data.shape[0], flush=True)


def make_kernel(nb, nblk, GS, nsteps, unpack, gather, mul, rsum, stage,
                passes, ringdma=True, use_bands=True, use_blocks=True):
    nslots = WIN_AHEAD + 1

    def kernel(band_lo_ref, data_ref, lanes_ref, bands_ref, blocks_ref,
               x_hbm, y_ref, win, sems):
        st = pl.program_id(0)

        def win_dma(step):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(band_lo_ref[step], nb), :],
                win.at[step % nslots], sems.at[step % nslots])

        if ringdma:
            @pl.when(st == 0)
            def _():
                for kk in range(min(WIN_AHEAD, nsteps)):
                    win_dma(kk).start()
            win_dma(st).wait()

            @pl.when(st + WIN_AHEAD < nsteps)
            def _():
                win_dma(st + WIN_AHEAD).start()
        else:
            @pl.when(st == 0)
            def _():
                win_dma(0).start()
                win_dma(0).wait()

        w = win[st % nslots] if ringdma else win[0]
        if not use_bands:
            bands0 = jnp.zeros((GS, 1), jnp.int32)
        else:
            bands0 = None
        if stage:
            iot = jax.lax.broadcasted_iota(jnp.int32, (GS, nb), 1)
            base = bands_ref[0] if use_bands else bands0
            xsel = _dot_onehot(iot == base, w, passes)
        else:
            xsel = jnp.broadcast_to(w[:1], (GS, LANES)) * 1.0
        if unpack:
            p = lanes_ref[0]
            idx = jnp.concatenate([(p >> (8 * j)) & 255
                                   for j in range(4)], axis=0)
        else:
            idx = jax.lax.broadcasted_iota(jnp.int32, (GS, LANES), 1)
        vals_ = jnp.take_along_axis(xsel, idx, axis=1) if gather else xsel
        prod = data_ref[0] * vals_ if mul else vals_
        if rsum:
            ps = prod.reshape(GS // 8, 8, LANES).sum(axis=1)
        else:
            ps = prod.reshape(GS // 8, 8, LANES)[:, 0, :] * 1.0
        iob = jax.lax.broadcasted_iota(jnp.int32, (nblk, GS // 8), 0)
        ohY = (iob == blocks_ref[0]) if use_blocks else \
            (iob == (jax.lax.broadcasted_iota(jnp.int32, (nblk, GS // 8),
                                              1) // 8))
        y_ref[:] = _dot_onehot(ohY, ps, passes)
    return kernel


def run(tag, unpack=True, gather=True, mul=True, rsum=True, stage=True,
        passes=3, ringdma=True, use_bands=True, use_blocks=True,
        nbuf=None):
    nsteps, GS, L = b.data.shape
    nb, nblk = b.nb, b.nblk
    kernel = make_kernel(nb, nblk, GS, nsteps, unpack, gather, mul, rsum,
                         stage, passes, ringdma, use_bands, use_blocks)
    pm = None if nbuf is None else pl.Buffered(buffer_count=nbuf)

    @jax.jit
    def chain(data, lanes, bands, blocks, band_lo, x2):
        data_c = pltpu.with_memory_space_constraint(data, pltpu.HBM)
        lanes_c = pltpu.with_memory_space_constraint(lanes, pltpu.HBM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, GS, L), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=pm),
                pl.BlockSpec((1, GS // 4, L), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=pm),
                pl.BlockSpec((1, GS, 1), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=pm),
                pl.BlockSpec((1, 1, GS // 8), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=pm),
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
            return jnp.zeros((npad_rows, L), jnp.float32).at[
                :min(y.shape[0], npad_rows)].set(
                y[:min(y.shape[0], npad_rows)])
        return jax.lax.fori_loop(0, ITERS, body, x2)[0, 0]

    mp, npad = b.padded_shape
    x2 = jnp.ones((npad // LANES, LANES), jnp.float32)
    try:
        float(chain(b.data, b.lanes, b.bands, b.blocks, b.band_lo, x2))
    except Exception as e:
        print(f"{tag}: FAILED {str(e)[:140]}", flush=True)
        return
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        float(chain(b.data, b.lanes, b.bands, b.blocks, b.band_lo, x2))
        best = min(best, time.perf_counter() - t0)
    sb = b.data.size * 5
    print(f"{tag}: {best/ITERS*1e3:.3f} ms/call "
          f"stream={ITERS*sb/best/1e9:.0f} GB/s", flush=True)


run("touch-data nbuf=None", unpack=False, gather=False, mul=True,
    rsum=False, stage=False, use_bands=False, use_blocks=False,
    ringdma=False)
for nbuf in (3, 4, 8):
    run("touch-data nbuf=%d" % nbuf, unpack=False, gather=False,
        mul=True, rsum=False, stage=False, use_bands=False,
        use_blocks=False, ringdma=False, nbuf=nbuf)
run("full nbuf=4", nbuf=4)
run("full nbuf=8", nbuf=8)
