"""SpMM tuning on-chip: ring depth / K-chunk width sweeps, and a
solver-level bicgstab_batched K=8 vs 8 single solves timing on the
1M-row bench matrix (fixed iteration budget, timing only)."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import pykrylov_tpu.sparse.bell as bell  # noqa: E402
from pykrylov_tpu.gallery.general import tiled_general_coo  # noqa: E402
from pykrylov_tpu.sparse import formats as F  # noqa: E402

assert jax.default_backend() == "tpu"
ITERS = 300

vals, rows, cols, shape = tiled_general_coo(tiles=1024)
rowsum = np.zeros(shape[0])
np.add.at(rowsum, rows, np.abs(vals))
vals = (vals / rowsum.max()).astype(np.float32)
coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
n = shape[0]
bh = bell.bell_from_coo(coo, spill_cost=None, device=False, window=1)
b = bell.bell_to_device(bh)
mp, npad = b.padded_shape


def run_mm(K, tag, iters=ITERS):
    bell._bell_matmat_call.clear_cache()

    def chain(b, X):
        def body(_, X):
            Y = bell.bell_matmat_pallas(b, X)
            return jnp.zeros((npad, K), jnp.float32).at[:n].set(Y[:n])
        return jax.lax.fori_loop(0, iters, body, X)
    cj = jax.jit(chain)
    try:
        float(cj(b, jnp.ones((npad, K), jnp.float32))[0, 0])
    except Exception as e:
        print(f"{tag:34s} FAILED {str(e)[:90]}", flush=True)
        return
    best = np.inf
    for rep in range(3):
        Xr = jnp.full((npad, K), 1.0 + 0.1 * rep, jnp.float32)
        float(Xr[0, 0])
        t0 = time.perf_counter()
        float(cj(b, Xr)[0, 0])
        best = min(best, time.perf_counter() - t0)
    ms = best / iters / K * 1e3
    print(f"{tag:34s} {ms:.4f} ms/col eff nnz/s="
          f"{iters*b.nnz*K/best/1e9:.1f}G", flush=True)


for ahead, kchunk in ((2, 4), (3, 4), (2, 8), (3, 2), (4, 4)):
    bell._MM_AHEAD, bell._MM_KCHUNK = ahead, kchunk
    run_mm(8, f"K=8 ahead={ahead} kchunk={kchunk}")
bell._MM_AHEAD, bell._MM_KCHUNK = 2, 4
