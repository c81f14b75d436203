"""On-chip probe: DIA+BELL hybrid split vs pure BELL (VERDICT r3 #1).

Host-side planning (probe_hybrid_split.py) predicts the split LOSES on
the bench matrix class (0.92x: the remainder packs worse once the dense
diagonal leaves — the per-lane max stays, the mean drops) and stays
within ~1.2x even on its best constructed class (stencil + clustered
scatter).  This probe runs both sides on the real chip:

  t_full   : pure-BELL chained matvec on the whole matrix
  t_split  : chained  y = bell(remainder)(x) + pallas_dia(dense diags)(x)

Classes: (a) jpwh_991 x 128 tiles (the bench class), (b) the 7-diagonal
stencil + clustered-scatter class (the split's best case).

Usage (on the TPU host): python tools/probes/probe_hybrid_onchip.py
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp

from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.bell import bell_operator
from pykrylov_tpu.sparse.linop import pallas_dia_sparse_operator

ITERS = 500


def chain_time(mv, params, n, tag):
    @jax.jit
    def chain(params, x):
        return jax.lax.fori_loop(0, ITERS, lambda _, x: mv(params, x), x)
    t0 = time.perf_counter()
    float(chain(params, jnp.ones(n, jnp.float32))[0])
    print("  [%s] compile %.1fs" % (tag, time.perf_counter() - t0),
          flush=True)
    best = np.inf
    for rep in range(3):
        xr = jnp.full(n, 1.0 + 0.1 * rep, jnp.float32)
        float(xr[0])
        t0 = time.perf_counter()
        float(chain(params, xr)[0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def split_diagonals(vals, rows, cols, shape, thresh=0.9):
    m = shape[0]
    d = cols.astype(np.int64) - rows.astype(np.int64)
    offs, counts = np.unique(d, return_counts=True)
    dens = counts / np.minimum(m - np.abs(offs), m)
    dense = set(offs[dens >= thresh].tolist())
    in_dia = np.isin(d, list(dense))
    return in_dia, len(dense)


def probe(name, vals, rows, cols, shape):
    m = shape[0]
    rowsum = np.zeros(m)
    np.add.at(rowsum, rows, np.abs(vals))
    vals = (vals / rowsum.max()).astype(np.float32)
    nnz = len(vals)
    print("== %s: m=%d nnz=%d" % (name, m, nnz), flush=True)

    op_full = bell_operator((vals, rows, cols, shape),
                            with_transpose=False)
    t_full = chain_time(op_full._mv, op_full._params, m, "full-bell")
    print("  full BELL: %.4f ms/mv (%.1f Gnnz/s)"
          % (t_full * 1e3, nnz / t_full / 1e9), flush=True)

    in_dia, ndiag = split_diagonals(vals, rows, cols, shape)
    if ndiag == 0 or in_dia.all():
        print("  no split possible"); return
    op_rem = bell_operator((vals[~in_dia], rows[~in_dia], cols[~in_dia],
                            shape), with_transpose=False)
    coo_d = F.coo_from_arrays(vals[in_dia], rows[in_dia], cols[in_dia],
                              shape, device=False)
    op_dia = pallas_dia_sparse_operator(coo_d)

    bmv, bp = op_rem._mv, op_rem._params
    dmv, dp = op_dia._mv, op_dia._params

    def hyb_mv(params, x):
        pb, pd = params
        return bmv(pb, x) + dmv(pd, x)

    t_split = chain_time(hyb_mv, (bp, dp), m, "split")
    print("  split (%d diag, %.0f%% nnz): %.4f ms/mv (%.1f Gnnz/s)  "
          "speedup=%.2fx"
          % (ndiag, 100 * in_dia.sum() / nnz, t_split * 1e3,
             nnz / t_split / 1e9, t_full / t_split), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "jpwh"):
        from pykrylov_tpu.gallery.general import tiled_general_coo
        probe("jpwh_991 x 128 tiles", *tiled_general_coo(tiles=128))
    if which in ("all", "stencil"):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "..", ".."))
        import bench
        probe("stencil_scatter_131k", *bench._gen_stencil_scatter())
