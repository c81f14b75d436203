"""Probe: BELL SpMM per-column time at K = 8 / 12 / 16 per kernel call.

The round-3 K=8 block-product measurement (0.126 ms/col vs 0.245 ms/mv)
splits into fixed ~0.136 ms of column-count-independent work per call
(matrix stream, idx unpack, one-hot builds) and ~0.109 ms per column
(staging dot, gather, product, fold, scatter columns).  If that model
holds, K=16 lands at ~0.117 ms/col => ~52.7 eff Gnnz/s = 0.515 of the
8 B/nnz CSR roofline (vs 0.48 at K=8).  The VMEM budget formula admits
K=16 at 2 ring slots (7.84 MB of the 10 MB ring budget on the bench
packing: nb=104, GS=1696); this probe checks whether Mosaic agrees and
whether the projected win materializes on the chip.

RESULT (on-chip 2026-08-20): it does NOT — the fixed/variable model
breaks past K=8.  K=8: 0.1316 ms/col (46.95 eff Gnnz/s); K=12: 0.1613
ms/col (38.3 — 23% WORSE per column); K=16: Mosaic compile failure
(tpu_compile_helper exit 1 — scoped-VMEM infeasible despite the budget
formula).  Per-column cost GROWS past K=8: the (GS, K*128) product /
fold / scatter transients push the working set past what fits VMEM
alongside the rings, so Mosaic serializes or spills.  _MM_KMAX = 8
stays; this probe is the evidence.

Run on the real chip: timeout 550 python tools/probes/probe_spmm_k16.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pykrylov_tpu.gallery.general import tiled_general_coo  # noqa: E402
from pykrylov_tpu.sparse import bell as B  # noqa: E402
from pykrylov_tpu.sparse.bell import bell_operator  # noqa: E402


def main():
    on_tpu = jax.default_backend() == "tpu"
    tiles = 1024 if on_tpu else 2
    vals, rows, cols, shape = tiled_general_coo(tiles=tiles)
    rowsum = np.zeros(shape[0])
    np.add.at(rowsum, rows, np.abs(vals))
    vals = (vals / rowsum.max()).astype(np.float32)
    n = shape[0]

    t0 = time.perf_counter()
    op = bell_operator((vals, rows, cols, shape), with_transpose=False,
                       interpret=not on_tpu, levels=1, spill_cost=None)
    print("pack+ship %.1fs" % (time.perf_counter() - t0), flush=True)
    mm, params = op._mm, op._params
    nnz = sum(b.nnz for b in params[0])

    iters = 200 if on_tpu else 2
    results = {}
    for K in ([8, 12, 16] if on_tpu else [2]):
        B._MM_KMAX = K  # trace-time global read by _mm_kmax

        @jax.jit
        def chain(params, X):
            return jax.lax.fori_loop(0, iters,
                                     lambda _, X: mm(params, X), X)

        X0 = jnp.ones((n, K), jnp.float32)
        t0 = time.perf_counter()
        try:
            float(chain(params, X0)[0, 0])
        except Exception as e:
            print("K=%d FAILED: %s: %s" % (K, type(e).__name__,
                                           str(e)[:200]), flush=True)
            results[K] = None
            continue
        print("K=%d compile %.1fs" % (K, time.perf_counter() - t0),
              flush=True)
        best = np.inf
        for rep in range(3):
            Xr = jnp.full((n, K), 1.0 + 0.1 * rep, jnp.float32)
            float(Xr[0, 0])
            t0 = time.perf_counter()
            float(chain(params, Xr)[0, 0])
            best = min(best, time.perf_counter() - t0)
        ms_col = best / iters / K * 1e3
        eff = iters * K * nnz / best / 1e9
        results[K] = (round(ms_col, 4), round(eff, 2))
        print("K=%2d  %.4f ms/col  %.2f eff Gnnz/s  vs_csr8B %.4f"
              % (K, ms_col, eff, eff / (819.0 / 8)), flush=True)
    print(results)


if __name__ == "__main__":
    main()
