"""On-chip probe: XLA shifted-slice DIA vs the Pallas ring kernel as a
function of m (round 4).

The class-table bench measured the pallas-DIA path 4.9x over its stream
model at m=331k (convdiff2d): each pallas_call carries ~tens of us of
fixed per-call overhead that the 13.9M-row headline amortizes away but
a small matrix cannot.  This probe times BOTH paths at several sizes on
the same 5-diagonal convdiff matrix and prints the measured crossover,
to set `operator_from_coo`'s pallas-dia threshold honestly.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax, jax.numpy as jnp

from pykrylov_tpu.gallery.convdiff import convdiff2d_coo
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.linop import (SparseOperator,
                                       pallas_dia_sparse_operator)


def chain_ms(op, n, iters=500):
    mv, params = op._mv, op._params

    @jax.jit
    def chain(params, x):
        return jax.lax.fori_loop(0, iters, lambda _, x: mv(params, x), x)

    float(chain(params, jnp.ones(n, jnp.float32))[0])
    best = np.inf
    for rep in range(3):
        xr = jnp.full(n, 1.0 + 0.1 * rep, jnp.float32)
        float(xr[0])
        t0 = time.perf_counter()
        float(chain(params, xr)[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


if __name__ == "__main__":
    for ng in (575, 1024, 2048, 3725):
        v, r, c, s = convdiff2d_coo(ng)
        m = s[0]
        rowsum = np.zeros(m)
        np.add.at(rowsum, r, np.abs(v))
        v = (v / rowsum.max()).astype(np.float32)
        coo = F.coo_from_arrays(v, r, c, s, device=False)
        dia = F.dia_from_coo(coo, device=False)
        op_x = SparseOperator(F.DIA(jnp.asarray(dia.data), dia.offsets,
                                    dia.shape), None, symmetric=False)
        t_x = chain_ms(op_x, m)
        op_p = pallas_dia_sparse_operator(coo)
        t_p = chain_ms(op_p, m)
        model = (len(dia.offsets) + 2) * m * 4 / 675e9 * 1e3
        print("m=%8d  xla %.4f ms  pallas %.4f ms  model %.4f  "
              "pallas/xla %.2f" % (m, t_x, t_p, model, t_p / t_x),
              flush=True)
