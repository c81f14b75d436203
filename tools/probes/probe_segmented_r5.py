"""Round-5 on-chip probe: segmented BELL staging on the heavy-tail
matrix classes (VERDICT r4 #1).  Measures the wide-window classes with
the mixed segmented kernel vs their round-4 monolithic numbers."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import _gen_power_law, _gen_stencil_scatter
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.bell import (_pack_levels, NB_MAX, _SPILL_BYTES,
                                      bell_to_device, _bell_matvec_call,
                                      _slot_cost_ps, LANES)

iters = 2000
for name, g in [("power_law", _gen_power_law),
                ("stencil_scatter", _gen_stencil_scatter)]:
    vals, rws, cls, shape = g()
    m = shape[0]
    rowsum = np.zeros(m); np.add.at(rowsum, rws, np.abs(vals))
    vals = (vals / rowsum.max()).astype(np.float32)
    nnz = len(vals)
    coo = F.coo_from_arrays(vals, rws, cls, shape, device=False)
    for segmode in (True, False):
        lv = _pack_levels(coo, NB_MAX, _SPILL_BYTES, 2, device=False,
                          window="auto", segment=segmode)
        b = bell_to_device(lv[0])
        assert len(lv) == 1 and b.nnz_spill == 0
        npad = b.padded_shape[1]
        mpad = b.padded_shape[0]

        def mv(x):
            return _bell_matvec_call(
                b.data, b.lanes, b.bands, b.blocks, b.band_lo,
                x.reshape(-1, LANES), b.sp_row, b.sp_col, b.sp_val,
                b.nb, b.nblk, False, window=b.window, seg=b.seg,
                seg_mixed=int(b.seg_mixed))

        @jax.jit
        def chain(x):
            def body(_, x):
                y = mv(x)
                k = min(m, mpad)
                return jnp.zeros(npad, y.dtype).at[:k].set(y[:k])
            return jax.lax.fori_loop(0, iters, body, x)

        t0 = time.perf_counter()
        float(chain(jnp.ones(npad, jnp.float32))[0])
        print("%s seg=%s compile %.1fs" % (name, segmode,
                                           time.perf_counter() - t0),
              file=sys.stderr, flush=True)
        best = np.inf
        for rep in range(3):
            xr = jnp.full(npad, 1.0 + 0.1 * rep, jnp.float32)
            float(xr[0])
            t0 = time.perf_counter()
            float(chain(xr)[0])
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        slots = int(np.prod(b.data.shape))
        model = slots * _slot_cost_ps(lv[0]) * 1e-9
        print("%s seg=%s: %.4f ms/mv  %.2f Gnnz/s  model %.4f  m/m %.2f "
              "(slots/nnz %.2f, wide %d)"
              % (name, segmode, ms, nnz / ms / 1e6, model, ms / model,
                 slots / nnz, b.seg_mixed), flush=True)
