"""Is an (n, K) f32 array with tiny K tile-padded on TPU (minor dims
padded to (8,128))?  Times elementwise chains on (n, K) vs (K, n) and
the transposes the SpMM staging needs."""
import time
import numpy as np
import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu"
n = 1 << 20
ITERS = 400


def bench(tag, shape, body):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, ITERS, body, x)
    x0 = jnp.ones(shape, jnp.float32)
    float(chain(x0).reshape(-1)[0])
    best = np.inf
    for rep in range(3):
        xr = jnp.full(shape, 1.0 + 0.1 * rep, jnp.float32)
        float(xr.reshape(-1)[0])
        t0 = time.perf_counter()
        float(chain(xr).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    nbytes = 2 * int(np.prod(shape)) * 4
    print(f"{tag:36s} {best/ITERS*1e6:8.1f} us/iter  "
          f"eff-BW {ITERS*nbytes/best/1e9:7.1f} GB/s", flush=True)


for K in (2, 8):
    bench(f"(n,{K}) elementwise", (n, K), lambda _, x: x * 0.999)
    bench(f"({K},n) elementwise", (K, n), lambda _, x: x * 0.999)

for K in (2, 8):
    rows = n // 128

    def body_minor(_, x, K=K, rows=rows):
        # (rows, 128, K) -> (rows, K, 128): minor-dim transpose
        return x.reshape(rows, 128, K).transpose(
            0, 2, 1).reshape(n, K) * 0.999

    bench(f"minor transpose rt K={K}", (n, K), body_minor)

    def body_major(_, x, K=K, rows=rows):
        # (K, rows, 128) <-> (rows, K*128): major-dims transpose x2
        t = x.reshape(K, rows, 128).transpose(1, 0, 2).reshape(
            rows, K * 128)
        return t.reshape(rows, K, 128).transpose(1, 0, 2).reshape(
            K, n) * 0.999

    bench(f"major transpose rt K={K}", (K, n), body_major)

    def body_nk_to_kn(_, x, K=K):
        # the API transpose itself: (n, K) -> (K, n) -> back
        return x.T.T * 0.999

    bench(f"(n,K)<->(K,n) rt K={K}", (n, K), body_nk_to_kn)
