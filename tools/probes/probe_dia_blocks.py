import time
import numpy as np
import jax
import jax.numpy as jnp
from pykrylov_tpu.gallery.poisson import poisson3d_coo
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.kernels import (ensure_dia_padded, pack_dia,
                                         dia_matvec_packed, choose_block,
                                         _halo_rows, LANES)

assert jax.default_backend() == "tpu"
BW = 819.0
ITERS = 400

def bench_case(tag, vals, rows, cols, shape, block):
    dia = F.dia_from_coo(F.COO(vals, rows.astype(np.int32),
                               cols.astype(np.int32), shape), device=False)
    dia, _ = ensure_dia_padded(dia, block)
    d3, offsets = pack_dia(dia, block)
    m = dia.shape[0]
    ndiag = d3.shape[0]
    brows = block // LANES
    hrows = _halo_rows(offsets, brows)

    @jax.jit
    def chain(d3, x):
        def body(_, x):
            return dia_matvec_packed(d3, offsets, x, block=block)
        return jax.lax.fori_loop(0, ITERS, body, x)

    try:
        t0 = time.perf_counter()
        float(chain(d3, jnp.ones(m, jnp.float32))[0])
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{tag} block={block}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return
    best = np.inf
    for rep in range(3):
        x0 = jnp.full(m, 1.0 + 0.01 * rep, jnp.float32)
        float(x0[0])
        t0 = time.perf_counter()
        float(chain(d3, x0)[0])
        best = min(best, time.perf_counter() - t0)
    ideal = (ndiag + 2) * m * 4
    actual = ideal + 2 * hrows * LANES * (m // block) * 4
    g_ideal = ITERS * ideal / best / 1e9
    g_act = ITERS * actual / best / 1e9
    print(f"{tag} block={block} brows={brows} hrows={hrows} ndiag={ndiag} "
          f"m={m}: {best/ITERS*1e3:.3f} ms/mv vs_ideal={g_ideal/BW:.3f} "
          f"vs_actual={g_act/BW:.3f} (compile {comp:.0f}s)", flush=True)

# 3-D Poisson n=240 (the current bench case)
vals, rows, cols, shape = poisson3d_coo(240, dtype=np.float32)
vals = vals / 12.0
for block in (131072, 262144):
    bench_case("poisson3d n=240", vals, rows, cols, shape, block)

# 2-D Poisson 3726^2 (~13.9M unknowns, 5 diagonals, 30-row halo)
n2 = 3726
mm = n2 * n2
diag_offs = [0, -1, 1, -n2, n2]
r_, c_, v_ = [], [], []
for off in diag_offs:
    lo, hi = max(0, -off), min(mm, mm - off)
    idx = np.arange(lo, hi, dtype=np.int64)
    r_.append(idx); c_.append(idx + off)
    v_.append(np.full(len(idx), -1.0/8 if off else 0.5, np.float32))
vals2 = np.concatenate(v_); rows2 = np.concatenate(r_); cols2 = np.concatenate(c_)
for block in (131072, 262144):
    bench_case("poisson2d n=3726", vals2, rows2, cols2, (mm, mm), block)
