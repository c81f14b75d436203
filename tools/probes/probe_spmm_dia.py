"""On-chip: DIA SpMM (diagonals streamed once per block product) vs K
sequential matvecs on 3-D Poisson."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pykrylov_tpu.gallery.poisson import poisson3d_coo  # noqa: E402
from pykrylov_tpu.sparse import formats as F  # noqa: E402
from pykrylov_tpu.sparse.kernels import (ensure_dia_padded, pack_dia,  # noqa: E402
                                         dia_matvec_packed,
                                         dia_matmat_packed, choose_block)

assert jax.default_backend() == "tpu"

n = 160  # 4.1M rows, 7 diagonals (~115 MB data): HBM-filling
vals, rows, cols, shape = poisson3d_coo(n, dtype=np.float32)
dia = F.dia_from_coo(F.COO(vals / 12.0, rows.astype(np.int32),
                           cols.astype(np.int32), shape), device=False)
block = choose_block(dia.data.shape[0], dia.offsets)
dia, _ = ensure_dia_padded(dia, block)
d3, offsets = pack_dia(dia, block)
m = dia.shape[0]
nnz = len(vals)
print(f"3-D Poisson n={n}: m={m} nnz={nnz}", flush=True)

# correctness
rng = np.random.default_rng(0)
X0 = rng.standard_normal((m, 3)).astype(np.float32)
Y = np.asarray(dia_matmat_packed(d3, offsets, jnp.asarray(X0),
                                 block=block))
y0 = np.asarray(dia_matvec_packed(d3, offsets, jnp.asarray(X0[:, 0]),
                                  block=block))
err = np.abs(Y[:, 0] - y0).max() / np.abs(y0).max()
print(f"mm-vs-mv col0 rel err: {err:.2e}", flush=True)
assert err < 1e-5

ITERS = 200


def timed(fn, shape, iters=ITERS):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, iters, lambda _, x: fn(x), x)
    float(chain(jnp.ones(shape, jnp.float32)).reshape(-1)[0])
    best = np.inf
    for rep in range(3):
        xr = jnp.full(shape, 1.0 + 0.1 * rep, jnp.float32)
        float(xr.reshape(-1)[0])
        t0 = time.perf_counter()
        float(chain(xr).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


t1 = timed(lambda x: dia_matvec_packed(d3, offsets, x, block=block),
           (m,), 400)
print(f"matvec: {t1*1e3:.3f} ms/mv", flush=True)
for K in (4, 8):
    tK = timed(lambda X: dia_matmat_packed(d3, offsets, X, block=block),
               (m, K))
    print(f"SpMM K={K}: {tK*1e3:.3f} ms/block {tK/K*1e3:.4f} ms/col "
          f"(amortization {K*t1/tK:.2f}x, {tK/t1:.2f}x single time)",
          flush=True)
