import time
import numpy as np
import jax
import jax.numpy as jnp
from pykrylov_tpu.gallery.general import tiled_general_coo
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.bell import (bell_from_coo, bell_to_device,
                                      _bell_matvec_call, LANES)

assert jax.default_backend() == "tpu"
BW = 819.0

vals, rows, cols, shape = tiled_general_coo(tiles=1024)
rowsum = np.zeros(shape[0]); np.add.at(rowsum, rows, np.abs(vals))
vals = (vals / rowsum.max()).astype(np.float32)
coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
n = shape[0]
ITERS = 1000

def run(b, passes, stage="bf16", iters=ITERS):
    mp, npad = b.padded_shape
    sb = b.data.size * 5
    def chain(b, x):
        def body(_, x2):
            y = _bell_matvec_call(b.data, b.lanes, b.bands, b.blocks,
                                  b.band_lo, x2, b.sp_row, b.sp_col,
                                  b.sp_val, b.nb, b.nblk, False, passes,
                                  stage, b.window)
            return jnp.zeros(npad, jnp.float32).at[:n].set(
                y[:n]).reshape(-1, LANES)
        return jax.lax.fori_loop(0, iters, body, x)
    cj = jax.jit(chain)
    x0 = jnp.ones((npad // LANES, LANES), jnp.float32)
    float(cj(b, x0)[0, 0])
    best = np.inf
    for rep in range(3):
        xr = jnp.full((npad // LANES, LANES), 1.0 + 0.1 * rep, jnp.float32)
        float(xr[0, 0])
        t0 = time.perf_counter()
        float(cj(b, xr)[0, 0])
        best = min(best, time.perf_counter() - t0)
    gbps = iters * sb / best / 1e9
    nnzps = iters * b.nnz / best
    print(f"nblk={b.nblk} w={b.window} stage={stage} passes={passes} "
          f"GS={b.data.shape[1]} nb={b.nb} "
          f"steps={b.data.shape[0]}: {best/iters*1e3:.3f} ms/mv "
          f"stream={gbps:.0f}GB/s util={gbps/BW:.3f} "
          f"nnz/s={nnzps/1e9:.1f}G vs8B={nnzps/(BW*1e9/8):.3f}", flush=True)

for nblk in (64, 96):
    t0 = time.perf_counter()
    bh = bell_from_coo(coo, nblk=nblk, spill_cost=None, device=False,
                       window=1)
    print(f"pack w1 nblk={nblk}: {time.perf_counter()-t0:.1f}s "
          f"slots/nnz={bh.data.size/bh.nnz:.2f}", flush=True)
    b = bell_to_device(bh)
    run(b, 3, "bf16")

