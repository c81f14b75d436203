"""Decompose the mixed segmented-staging overhead (~0.35 us/segment
fit) on the power-law class: floor / +branches / +scratch / staging
variants.  Results WRONG on purpose for ablations — timing only."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from bench import _gen_power_law
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse import bell
from pykrylov_tpu.sparse.bell import (_row_split_plan, _pack_levels,
                                      NB_MAX, _SPILL_BYTES,
                                      bell_to_device, _dot_onehot,
                                      SEG_ROWS, LANES)

orig = bell._bell_kernel

def abl_kernel(nb, nblk, GS, nsteps, passes, stage, window, nring,
               seg_sizes, seg_mixed, seg_bands, band_lo_ref, seg_ref,
               data_hbm, lanes_hbm, bands_ref, blocks_ref, x_hbm, y_ref,
               win, sems, dbuf, dsems, lbuf, lsems, *scr):
    mode = stage.split(":")[1]
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
    nseg = len(seg_sizes)

    if mode == "floor":
        xsel = dat
    elif mode == "branches":
        xs = scr[0]
        for si in range(nseg):
            sb = seg_ref[st, si]
            r0 = si * SEG_ROWS

            @pl.when(sb >= 0)
            def _(r0=r0):
                xs[r0:r0 + 8, :] = dat[:8]

            @pl.when(sb < 0)
            def _(r0=r0):
                xs[r0:r0 + 8, :] = dat[:8] + 1.0
        xsel = dat + xs[:GS]
    elif mode == "narrow_concat":
        parts = []
        for si in range(nseg):
            sb = seg_ref[st, si]
            sbc = jnp.maximum(sb, 0)
            wseg = win[slot, pl.ds(sbc * 8, seg_bands), :]
            bseg = bands_ref[0, si:si + 1, :]
            iot_s = jax.lax.broadcasted_iota(
                jnp.int32, (seg_bands, SEG_ROWS), 0)
            parts.append(_dot_onehot(iot_s == bseg, wseg, passes,
                                     transposed=True))
        xsel = jnp.concatenate(parts, axis=0)[:GS]
    elif mode == "narrow_scratch":
        xs = scr[0]
        for si in range(nseg):
            sb = seg_ref[st, si]
            sbc = jnp.maximum(sb, 0)
            r0 = si * SEG_ROWS
            wseg = win[slot, pl.ds(sbc * 8, seg_bands), :]
            bseg = bands_ref[0, si:si + 1, :]
            iot_s = jax.lax.broadcasted_iota(
                jnp.int32, (seg_bands, SEG_ROWS), 0)
            xs[r0:r0 + SEG_ROWS, :] = _dot_onehot(
                iot_s == bseg, wseg, passes, transposed=True)
        xsel = xs[:GS]
    elif mode == "narrow_pred":
        # all segments staged NARROW but inside always-true predicates:
        # isolates the cost of predication around the dots themselves
        xs = scr[0]
        for si in range(nseg):
            sb = seg_ref[st, si]
            bseg = bands_ref[0, si:si + 1, :]
            r0 = si * SEG_ROWS

            @pl.when(sb > -999)
            def _(r0=r0, sb=sb, bseg=bseg):
                sbc = jnp.maximum(sb, 0)
                iot_s = jax.lax.broadcasted_iota(
                    jnp.int32, (seg_bands, SEG_ROWS), 0)
                wseg = win[slot, pl.ds(sbc * 8, seg_bands), :]
                xs[r0:r0 + SEG_ROWS, :] = _dot_onehot(
                    iot_s == bseg, wseg, passes, transposed=True)
        xsel = xs[:GS]
    elif mode == "wide_all":
        # every segment staged WIDE (no predicates): the pure cost of
        # 8 full-window one-hot dots per step
        xs = scr[0]
        for si in range(nseg):
            bseg = bands_ref[0, si:si + 1, :]
            r0 = si * SEG_ROWS
            iot_w = jax.lax.broadcasted_iota(
                jnp.int32, (nb, SEG_ROWS), 0)
            xs[r0:r0 + SEG_ROWS, :] = _dot_onehot(
                iot_w == bseg, win[slot], passes, transposed=True)
        xsel = xs[:GS]
    elif mode == "uncond_fori3":
        # candidate structure: unconditional narrow for ALL segments +
        # ONE fori_loop of (here 3 static-average) wide dots writing at
        # dynamic segment positions — no pl.when anywhere
        xs = scr[0]
        for si in range(nseg):
            sb = seg_ref[st, si]
            bseg = bands_ref[0, si:si + 1, :]
            r0 = si * SEG_ROWS
            sbc = jnp.maximum(sb, 0)
            iot_s = jax.lax.broadcasted_iota(
                jnp.int32, (seg_bands, SEG_ROWS), 0)
            wseg = win[slot, pl.ds(sbc * 8, seg_bands), :]
            xs[r0:r0 + SEG_ROWS, :] = _dot_onehot(
                iot_s == bseg, wseg, passes, transposed=True)

        def wide_body(si, _):
            bseg = bands_ref[0, pl.ds(si, 1), :]
            iot_w = jax.lax.broadcasted_iota(
                jnp.int32, (nb, SEG_ROWS), 0)
            v = _dot_onehot(iot_w == bseg, win[slot], passes,
                            transposed=True)
            xs[pl.ds(si * SEG_ROWS, SEG_ROWS), :] = v
            return 0

        jax.lax.fori_loop(0, 3, wide_body, 0)
        xsel = xs[:GS]
    elif mode in ("mixed", "mixed_i8"):
        # CORRECT mixed staging; wide branches optionally via int8
        # bit planes with the plane build hoisted per step
        xs = scr[0]
        if mode == "mixed_i8":
            w = win[slot]
            bits = jax.lax.bitcast_convert_type(w, jnp.int32)
            planes = jnp.concatenate(
                [((bits >> (8 * j)) & 255).astype(jnp.int8)
                 for j in range(4)], axis=1)          # (nb, 4L)
        for si in range(nseg):
            sb = seg_ref[st, si]
            bseg = bands_ref[0, si:si + 1, :]
            r0 = si * SEG_ROWS

            @pl.when(sb >= 0)
            def _(r0=r0, sb=sb, bseg=bseg):
                iot_s = jax.lax.broadcasted_iota(
                    jnp.int32, (seg_bands, SEG_ROWS), 0)
                wseg = win[slot, pl.ds(sb * 8, seg_bands), :]
                xs[r0:r0 + SEG_ROWS, :] = _dot_onehot(
                    iot_s == bseg, wseg, passes, transposed=True)

            if mode == "mixed_i8":
                @pl.when(sb < 0)
                def _(r0=r0, bseg=bseg):
                    iot_w = jax.lax.broadcasted_iota(
                        jnp.int32, (nb, SEG_ROWS), 0)
                    oh = (iot_w == bseg).astype(jnp.int8)
                    dims = (((0,), (0,)), ((), ()))
                    acc = jax.lax.dot_general(
                        oh, planes, dims,
                        preferred_element_type=jnp.int32)
                    out = ((acc[:, :L] & 255)
                           | ((acc[:, L:2 * L] & 255) << 8)
                           | ((acc[:, 2 * L:3 * L] & 255) << 16)
                           | ((acc[:, 3 * L:] & 255) << 24))
                    xs[r0:r0 + SEG_ROWS, :] =                         jax.lax.bitcast_convert_type(out, jnp.float32)
            else:
                @pl.when(sb < 0)
                def _(r0=r0, bseg=bseg):
                    iot_w = jax.lax.broadcasted_iota(
                        jnp.int32, (nb, SEG_ROWS), 0)
                    xs[r0:r0 + SEG_ROWS, :] = _dot_onehot(
                        iot_w == bseg, win[slot], passes,
                        transposed=True)
        xsel = xs[:GS]
    else:
        raise ValueError(mode)

    if p.dtype == jnp.uint8:
        idx = p.astype(jnp.int32)
    else:
        idx = jnp.concatenate([(p >> (8 * j)) & 255 for j in range(4)],
                              axis=0)
    vals = jnp.take_along_axis(xsel, idx, axis=1)
    prod = dat * vals
    s8 = prod.reshape(GS // 8, 8, LANES)
    ps = jnp.concatenate([s8[:, :4, :].sum(axis=1),
                          s8[:, 4:, :].sum(axis=1)], axis=0)
    ohY = (jax.lax.broadcasted_iota(jnp.int32, (nblk, GS // 4), 0)
           == blocks_ref[0])
    y_ref[:] = _dot_onehot(ohY, ps, passes)

bell._bell_kernel = abl_kernel

vals, rws, cls, shape = _gen_power_law()
m = shape[0]
rowsum = np.zeros(m); np.add.at(rowsum, rws, np.abs(vals))
vals = (vals / rowsum.max()).astype(np.float32)
coo = F.coo_from_arrays(vals, rws, cls, shape, device=False)
sp = _row_split_plan(coo)
lv = _pack_levels(sp[0], NB_MAX, _SPILL_BYTES, 2, device=False,
                  window="auto")
b = bell_to_device(lv[0])
slots = int(np.prod(b.data.shape))
nsteps, GS, _ = b.data.shape
nseg_tot = int(np.prod(b.seg.shape))
print("packing: nsteps %d GS %d segs %d wide %d segW %d"
      % (nsteps, GS, nseg_tot, b.seg_mixed, b.seg_bands), flush=True)
npad = b.padded_shape[1]; mpad = b.padded_shape[0]
iters = 2000
for mode in ("uncond_fori3",):
    def mv(x):
        return bell._bell_matvec_call(
            b.data, b.lanes, b.bands, b.blocks, b.band_lo,
            x.reshape(-1, LANES), b.sp_row, b.sp_col, b.sp_val,
            b.nb, b.nblk, False, stage="bf16:%s" % mode,
            window=b.window, seg=b.seg, seg_mixed=1,
            seg_bands=int(b.seg_bands))

    @jax.jit
    def chain(x):
        def body(_, x):
            y = mv(x); k = min(m, mpad)
            return jnp.zeros(npad, y.dtype).at[:k].set(y[:k])
        return jax.lax.fori_loop(0, iters, body, x)
    t0 = time.perf_counter()
    float(chain(jnp.ones(npad, jnp.float32))[0])
    comp = time.perf_counter() - t0
    best = np.inf
    for rep in range(3):
        xr = jnp.full(npad, 1.0 + 0.1*rep, jnp.float32); float(xr[0])
        t0 = time.perf_counter(); float(chain(xr)[0])
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    print("%-14s %.4f ms/mv  %.2f us/step (compile %.0fs)"
          % (mode, ms, ms * 1e3 / nsteps, comp), flush=True)
