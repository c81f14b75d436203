"""BSR's best case vs BELL and DIA on-chip: a dense-band matrix (the
only sparsity where (8,128) blocks fill well).  VERDICT r2 #7: wire BSR
into auto-selection if it wins anywhere, delete it if it doesn't.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pykrylov_tpu.sparse import formats as F  # noqa: E402
from pykrylov_tpu.sparse.bell import bell_from_coo, bell_to_device, \
    bell_matvec_pallas, LANES  # noqa: E402
from pykrylov_tpu.sparse.bsr import bsr_from_coo, bsr_matvec_pallas, \
    block_fill  # noqa: E402
from pykrylov_tpu.sparse.kernels import (ensure_dia_padded, pack_dia,
                                         dia_matvec_packed,
                                         choose_block)  # noqa: E402

assert jax.default_backend() == "tpu"
ITERS = 300

# dense band: every row has the full [c-192, c+192] window -> (8,128)
# blocks on the band are ~fully dense (BSR's ideal case)
m = 65536
half = 192
rows_l, cols_l, vals_l = [], [], []
rng = np.random.default_rng(0)
i = np.arange(m, dtype=np.int64)
for off in range(-half, half + 1):
    j = i + off
    ok = (j >= 0) & (j < m)
    rows_l.append(i[ok])
    cols_l.append(j[ok])
vals_rows = np.concatenate(rows_l)
vals_cols = np.concatenate(cols_l)
vals_v = (rng.standard_normal(len(vals_rows)) / (2 * half + 1)) \
    .astype(np.float32)
nnz = len(vals_v)
print(f"dense-band m={m} nnz={nnz} ({nnz/m:.0f}/row)", flush=True)


def time_chain(fn, xshape, iters=ITERS):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, iters, lambda _, x: fn(x), x)
    x0 = jnp.ones(xshape, jnp.float32)
    float(chain(x0).reshape(-1)[0])
    best = np.inf
    for rep in range(3):
        xr = jnp.full(xshape, 1.0 + 0.1 * rep, jnp.float32)
        float(xr.reshape(-1)[0])
        t0 = time.perf_counter()
        float(chain(xr).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


coo = F.coo_from_arrays(vals_v, vals_rows, vals_cols, (m, m),
                        device=False)

# BSR
t0 = time.perf_counter()
bsr = bsr_from_coo(coo)
print(f"bsr pack {time.perf_counter()-t0:.1f}s block_fill="
      f"{block_fill(bsr):.3f} slots/nnz="
      f"{bsr.data.size/nnz:.2f}", flush=True)
np_ = bsr.shape[1]
npad = -(-np_ // LANES) * LANES


def bsr_mv(x):
    y = bsr_matvec_pallas(bsr, x[:np_])
    return jnp.zeros(npad, jnp.float32).at[:y.shape[0]].set(y)


t = time_chain(bsr_mv, (npad,))
print(f"BSR : {t*1e3:.3f} ms/mv nnz/s={nnz/t/1e9:.1f}G", flush=True)

# BELL (auto window)
t0 = time.perf_counter()
bh = bell_from_coo(coo, spill_cost=None, device=False, window=2)
b = bell_to_device(bh)
print(f"bell pack {time.perf_counter()-t0:.1f}s w={b.window} "
      f"slots/nnz={b.data.size/nnz:.2f}", flush=True)
mp, ncp = b.padded_shape


def bell_mv(x2):
    y = bell_matvec_pallas(b, x2.reshape(-1))
    return jnp.zeros(ncp, jnp.float32).at[:m].set(
        y[:m]).reshape(-1, LANES)


t = time_chain(bell_mv, (ncp // LANES, LANES))
print(f"BELL: {t*1e3:.3f} ms/mv nnz/s={nnz/t/1e9:.1f}G", flush=True)

# DIA (the format a dense band actually wants)
dia = F.dia_from_coo(coo, device=False)
block = choose_block(dia.data.shape[0], dia.offsets)
dia_p, _ = ensure_dia_padded(dia, block)
d3, offsets = pack_dia(dia_p, block)
mpd = dia_p.shape[0]


def dia_mv(x):
    return dia_matvec_packed(d3, offsets, x, block=block)


t = time_chain(dia_mv, (mpd,))
print(f"DIA : {t*1e3:.3f} ms/mv nnz/s={nnz/t/1e9:.1f}G", flush=True)
