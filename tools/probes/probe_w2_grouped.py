"""On-chip sweep after the w2 grouped-scatter unification: window mode x
idx_fmt x value dtype x staging, on the 1M-row tiled-jpwh bench matrix.

Decides: the _SLOT_COST_PS cost model constants, the idx_fmt default,
and the stage defaults.  Chain >=1000 matvecs (remote dispatch ~30 ms).
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pykrylov_tpu.gallery.general import tiled_general_coo  # noqa: E402
from pykrylov_tpu.sparse import formats as F  # noqa: E402
from pykrylov_tpu.sparse.bell import (bell_from_coo, bell_to_device,  # noqa: E402
                                      bell_with_idx_fmt,
                                      bell_with_values_dtype,
                                      _bell_matvec_call, LANES)

assert jax.default_backend() == "tpu"
BW = 819.0
ITERS = 1000

vals, rows, cols, shape = tiled_general_coo(tiles=1024)
rowsum = np.zeros(shape[0])
np.add.at(rowsum, rows, np.abs(vals))
vals = (vals / rowsum.max()).astype(np.float32)
coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
n = shape[0]


def run(b, stage=None, passes=3, iters=ITERS, tag=""):
    mp, npad = b.padded_shape
    itm = np.dtype(b.data.dtype).itemsize
    sb = b.data.size * (itm + 1)

    def chain(b, x):
        def body(_, x2):
            y = _bell_matvec_call(b.data, b.lanes, b.bands, b.blocks,
                                  b.band_lo, x2, b.sp_row, b.sp_col,
                                  b.sp_val, b.nb, b.nblk, False, passes,
                                  stage, b.window)
            return jnp.zeros(npad, jnp.float32).at[:n].set(
                y[:n].astype(jnp.float32)).reshape(-1, LANES)
        return jax.lax.fori_loop(0, iters, body, x)

    cj = jax.jit(chain)
    x0 = jnp.ones((npad // LANES, LANES), jnp.float32)
    float(cj(b, x0)[0, 0])
    best = np.inf
    for rep in range(3):
        xr = jnp.full((npad // LANES, LANES), 1.0 + 0.1 * rep,
                      jnp.float32)
        float(xr[0, 0])
        t0 = time.perf_counter()
        float(cj(b, xr)[0, 0])
        best = min(best, time.perf_counter() - t0)
    gbps = iters * sb / best / 1e9
    nnzps = iters * b.nnz / best
    ps_slot = best / iters / b.data.size * 1e12
    print(f"{tag:42s} {best/iters*1e3:.3f} ms/mv stream={gbps:.0f}GB/s "
          f"nnz/s={nnzps/1e9:.1f}G vs8B={nnzps/(BW*1e9/8):.3f} "
          f"ps/slot={ps_slot:.1f}", flush=True)
    return best / iters


packs = {}
for w in (1, 2):
    t0 = time.perf_counter()
    bh = bell_from_coo(coo, spill_cost=None, device=False, window=w)
    print(f"pack w{w}: {time.perf_counter()-t0:.1f}s "
          f"slots/nnz={bh.data.size/bh.nnz:.3f} GS={bh.data.shape[1]} "
          f"nblk={bh.nblk} steps={bh.data.shape[0]} nb={bh.nb}",
          flush=True)
    packs[w] = bh

import ml_dtypes  # noqa: E402

# w1 legs
b = bell_to_device(packs[1])
run(b, "bf16", tag="w1 packed f32 bf16-stage (r02 cfg)")
b8 = bell_to_device(bell_with_idx_fmt(packs[1], "int8"))
run(b8, "bf16", tag="w1 int8 f32 bf16-stage")
run(b8, "bf16s", tag="w1 int8 f32 bf16s-stage")
b8f = bell_to_device(bell_with_values_dtype(
    bell_with_idx_fmt(packs[1], "int8"), ml_dtypes.bfloat16))
run(b8f, "bf16", tag="w1 int8 BF16VALS bf16-stage")

# w2 legs (now grouped scatter)
b = bell_to_device(packs[2])
run(b, "int8", tag="w2 packed f32 int8-stage (old default)")
b8 = bell_to_device(bell_with_idx_fmt(packs[2], "int8"))
run(b8, "int8", tag="w2 int8 f32 int8-stage")
run(b8, "bf16s", tag="w2 int8 f32 bf16s-stage")
run(b8, "bf16", tag="w2 int8 f32 bf16-stage")
b8f = bell_to_device(bell_with_values_dtype(
    bell_with_idx_fmt(packs[2], "int8"), ml_dtypes.bfloat16))
run(b8f, "bf16s", tag="w2 int8 BF16VALS bf16s-stage")
run(b8f, "int8", tag="w2 int8 BF16VALS int8-stage")

# nblk sweep on the best-looking w2 config
for nblk in (96, 128):
    t0 = time.perf_counter()
    bh = bell_from_coo(coo, nblk=nblk, spill_cost=None, device=False,
                       window=2)
    print(f"pack w2 nblk={nblk}: {time.perf_counter()-t0:.1f}s "
          f"slots/nnz={bh.data.size/bh.nnz:.3f} GS={bh.data.shape[1]}",
          flush=True)
    b8 = bell_to_device(bell_with_idx_fmt(bh, "int8"))
    run(b8, "bf16s", tag=f"w2 int8 f32 bf16s nblk={nblk}")
