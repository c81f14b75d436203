"""On-chip: BELL SpMM (block product) throughput vs K sequential
matvecs on the 1M-row tiled-jpwh bench matrix."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pykrylov_tpu.gallery.general import tiled_general_coo  # noqa: E402
from pykrylov_tpu.sparse import formats as F  # noqa: E402
from pykrylov_tpu.sparse.bell import (bell_from_coo, bell_to_device,  # noqa: E402
                                      bell_matmat_pallas,
                                      bell_matvec_pallas, LANES)

assert jax.default_backend() == "tpu"
ITERS = 300

vals, rows, cols, shape = tiled_general_coo(tiles=1024)
rowsum = np.zeros(shape[0])
np.add.at(rowsum, rows, np.abs(vals))
vals = (vals / rowsum.max()).astype(np.float32)
coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
n = shape[0]
bh = bell_from_coo(coo, spill_cost=None, device=False, window=1)
b = bell_to_device(bh)
print(f"pack: slots/nnz={b.data.size/b.nnz:.3f} nb={b.nb} nblk={b.nblk} "
      f"GS={b.data.shape[1]}", flush=True)
mp, npad = b.padded_shape

# correctness spot-check on chip
rng = np.random.default_rng(0)
X0 = rng.standard_normal((npad, 3)).astype(np.float32)
Y = np.asarray(bell_matmat_pallas(b, jnp.asarray(X0)))
y0 = np.asarray(bell_matvec_pallas(b, jnp.asarray(X0[:, 0])))
err = np.abs(Y[:, 0] - y0).max() / np.abs(y0).max()
print(f"on-chip mm-vs-mv col0 rel err: {err:.2e}", flush=True)
assert err < 1e-5


def run_mm(K, iters=ITERS):
    def chain(b, X):
        def body(_, X):
            Y = bell_matmat_pallas(b, X)
            return jnp.zeros((npad, K), jnp.float32).at[:n].set(Y[:n])
        return jax.lax.fori_loop(0, iters, body, X)
    cj = jax.jit(chain, static_argnums=())
    X = jnp.ones((npad, K), jnp.float32)
    float(cj(b, X)[0, 0])
    best = np.inf
    for rep in range(3):
        Xr = jnp.full((npad, K), 1.0 + 0.1 * rep, jnp.float32)
        float(Xr[0, 0])
        t0 = time.perf_counter()
        float(cj(b, Xr)[0, 0])
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    nnzps = iters * b.nnz * K / best
    print(f"SpMM K={K:2d}: {ms:.3f} ms/block  {ms/K:.4f} ms/col "
          f"eff nnz/s={nnzps/1e9:.1f}G vs8B={nnzps/(819e9/8):.3f}",
          flush=True)
    return best / iters


def run_mv(iters=ITERS):
    def chain(b, x2):
        def body(_, x2):
            y = bell_matvec_pallas(b, x2.reshape(-1))
            return jnp.zeros(npad, jnp.float32).at[:n].set(
                y[:n]).reshape(-1, LANES)
        return jax.lax.fori_loop(0, iters, body, x2)
    cj = jax.jit(chain)
    x = jnp.ones((npad // LANES, LANES), jnp.float32)
    float(cj(b, x)[0, 0])
    best = np.inf
    for rep in range(3):
        xr = jnp.full((npad // LANES, LANES), 1.0 + 0.1 * rep, jnp.float32)
        float(xr[0, 0])
        t0 = time.perf_counter()
        float(cj(b, xr)[0, 0])
        best = min(best, time.perf_counter() - t0)
    print(f"matvec   : {best/iters*1e3:.3f} ms/mv", flush=True)
    return best / iters


t1 = run_mv(1000)
for K in (2, 4, 8, 16):
    tK = run_mm(K)
    print(f"  -> K={K}: {tK/t1:.2f}x single-mv time for {K} columns "
          f"(amortization {K*t1/tK:.2f}x)", flush=True)
