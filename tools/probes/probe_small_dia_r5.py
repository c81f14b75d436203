"""Round-5: where do the 48 us/mv of convdiff2d (330k rows) overhead
go?  Times the bare packed kernel, the logical-shape wrapper, and the
XLA dia path, at two chain lengths (dispatch-amortization check)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pykrylov_tpu.gallery.convdiff import convdiff2d_coo
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.kernels import (ensure_dia_padded, pack_dia,
                                         dia_matvec_packed, choose_block,
                                         pallas_dia_operator)
from pykrylov_tpu.sparse.linop import pallas_dia_sparse_operator

nc = 575
cv, cr, cc, cs = convdiff2d_coo(nc)
m = cs[0]
rowsum = np.zeros(m); np.add.at(rowsum, cr, np.abs(cv))
cv = (cv / rowsum.max()).astype(np.float32)
dia = F.dia_from_coo(F.COO(cv, cr.astype(np.int32), cc.astype(np.int32), cs),
                     device=False)
block = choose_block(dia.data.shape[0], dia.offsets)
diap, pad = ensure_dia_padded(dia, block)
d3, offsets = pack_dia(diap, block)
mp = diap.shape[0]
ndiag = d3.shape[0]
print("m=%d mp=%d block=%d ndiag=%d model_us=%.1f"
      % (m, mp, block, ndiag, (ndiag + 2) * m * 4 / 685e9 * 1e6))

def timeit(fn, x0, iters, tag):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, iters, lambda _, x: fn(x), x)
    float(chain(x0)[0])
    best = np.inf
    for rep in range(3):
        xr = x0 * (1.0 + 0.1 * rep)
        float(xr[0])
        t0 = time.perf_counter()
        float(chain(xr)[0])
        best = min(best, time.perf_counter() - t0)
    print("%-22s %6d iters  %8.2f us/mv" % (tag, iters, best / iters * 1e6),
          flush=True)
    return best / iters

xpad = jnp.ones(mp, jnp.float32)
xlog = jnp.ones(m, jnp.float32)
for iters in (500, 4000):
    timeit(lambda x: dia_matvec_packed(d3, offsets, x, block=block), xpad,
           iters, "bare kernel (padded)")
op_in = pallas_dia_operator(dia, symmetric=False)
mv_in, prm = op_in._mv, op_in._params
for iters in (500, 4000):
    timeit(lambda x: mv_in(prm, x), xpad, iters, "inner operator")
wrap = pallas_dia_sparse_operator(F.COO(cv, cr.astype(np.int32),
                                        cc.astype(np.int32), cs))
mvw, prw = wrap._mv, wrap._params
for iters in (500, 4000):
    timeit(lambda x: mvw(prw, x), xlog, iters, "logical wrapper")
# XLA dia path
diad = F.DIA(jnp.asarray(dia.data), dia.offsets, dia.shape)
for iters in (500,):
    timeit(lambda x: F.dia_matvec(diad, x), xlog, iters, "xla dia")
