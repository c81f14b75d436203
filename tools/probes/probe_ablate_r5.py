"""Round-5 ablation: which op dominates the wide-window (power_law)
kernel step?  Monkeypatches _bell_kernel with a variant that can skip
each stage (results are WRONG on purpose — timing only)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from bench import _gen_power_law
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse import bell
from pykrylov_tpu.sparse.bell import (_pack_levels, NB_MAX, _SPILL_BYTES,
                                      bell_to_device, _dot_onehot, LANES)

orig_kernel = bell._bell_kernel

def ablating_kernel(nb, nblk, GS, nsteps, passes, stage, window, nring,
                    seg_sizes, seg_mixed, band_lo_ref, seg_ref, data_hbm,
                    lanes_hbm, bands_ref, blocks_ref, x_hbm, y_ref, win,
                    sems, dbuf, dsems, lbuf, lsems, *scr):
    mode = stage.split(":")[1] if (stage and ":" in stage) else "full"
    st = pl.program_id(0)
    L = LANES
    nslots = nring
    AHEAD = nring - 1

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

    @pl.when(st == 0)
    def _():
        for kk in range(min(AHEAD, nsteps)):
            win_dma(kk).start(); dat_dma(kk).start(); lan_dma(kk).start()
    win_dma(st).wait(); dat_dma(st).wait(); lan_dma(st).wait()

    @pl.when(st + AHEAD < nsteps)
    def _():
        win_dma(st + AHEAD).start(); dat_dma(st + AHEAD).start()
        lan_dma(st + AHEAD).start()

    slot = st % nslots
    dat = dbuf[slot]
    p = lbuf[slot]
    base = bands_ref[0]
    w = win[slot]

    if mode == "dma":     # pure stream: touch each buffer minimally
        y_ref[:] = dat[:nblk] + w[:nblk] + p[:nblk].astype(dat.dtype)
        return

    if mode == "nostage":
        xsel = jnp.full((GS, L), w[0, 0], dat.dtype)
    else:
        iot = jax.lax.broadcasted_iota(jnp.int32, (nb, GS), 0)
        xsel = _dot_onehot(iot == base, w, 3, transposed=True)
    if mode == "stageonly":
        y_ref[:] = xsel[:nblk]
        return

    if p.dtype == jnp.uint8:
        idx = p.astype(jnp.int32)
    else:
        idx = jnp.concatenate([(p >> (8 * j)) & 255 for j in range(4)],
                              axis=0)
    if mode == "notake":
        vals = xsel
    else:
        vals = jnp.take_along_axis(xsel, idx, axis=1)
    prod = dat * vals
    s8 = prod.reshape(GS // 8, 8, LANES)
    ps = jnp.concatenate([s8[:, :4, :].sum(axis=1),
                          s8[:, 4:, :].sum(axis=1)], axis=0)
    if mode == "noscatter":
        y_ref[:] = ps[:nblk]
        return
    ohY = (jax.lax.broadcasted_iota(jnp.int32, (nblk, GS // 4), 0)
           == blocks_ref[0])
    y_ref[:] = _dot_onehot(ohY, ps, 3)

bell._bell_kernel = ablating_kernel

vals, rws, cls, shape = _gen_power_law()
m = shape[0]
rowsum = np.zeros(m); np.add.at(rowsum, rws, np.abs(vals))
vals = (vals / rowsum.max()).astype(np.float32)
coo = F.coo_from_arrays(vals, rws, cls, shape, device=False)
lv = _pack_levels(coo, NB_MAX, _SPILL_BYTES, 2, device=False,
                  window="auto", segment=False)
b = bell_to_device(lv[0])
slots = int(np.prod(b.data.shape))
npad = b.padded_shape[1]; mpad = b.padded_shape[0]
iters = 2000
for mode in ("full", "nostage", "notake", "noscatter", "stageonly", "dma"):
    def mv(x):
        return bell._bell_matvec_call(
            b.data, b.lanes, b.bands, b.blocks, b.band_lo,
            x.reshape(-1, LANES), b.sp_row, b.sp_col, b.sp_val,
            b.nb, b.nblk, False, stage="bf16:%s" % mode,
            window=b.window, seg=b.seg, seg_mixed=int(b.seg_mixed))

    @jax.jit
    def chain(x):
        def body(_, x):
            y = mv(x); k = min(m, mpad)
            return jnp.zeros(npad, y.dtype).at[:k].set(y[:k])
        return jax.lax.fori_loop(0, iters, body, x)
    t0 = time.perf_counter(); float(chain(jnp.ones(npad, jnp.float32))[0])
    comp = time.perf_counter() - t0
    best = np.inf
    for rep in range(3):
        xr = jnp.full(npad, 1.0 + 0.1*rep, jnp.float32); float(xr[0])
        t0 = time.perf_counter(); float(chain(xr)[0])
        best = min(best, time.perf_counter()-t0)
    ms = best/iters*1e3
    print("%-10s %.4f ms/mv  %.1f ps/slot  %.2f us/step (compile %.0fs)"
          % (mode, ms, ms*1e9/slots/1e3*1e3, ms*1e3/b.data.shape[0], comp),
          flush=True)
