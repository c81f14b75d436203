import time
import numpy as np
import jax
import jax.numpy as jnp
from pykrylov_tpu.gallery.general import tiled_general_coo
from pykrylov_tpu.sparse import formats as F
from pykrylov_tpu.sparse.bell import (bell_from_coo, bell_fill,
                                      _bell_matvec_call, LANES)

assert jax.default_backend() == "tpu"

vals, rows, cols, shape = tiled_general_coo(tiles=1024)
rowsum = np.zeros(shape[0]); np.add.at(rowsum, rows, np.abs(vals))
vals = (vals / rowsum.max()).astype(np.float32)
coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
n = shape[0]
ITERS = 50

b = bell_from_coo(coo)
mp, npad = b.padded_shape
nsp = int(b.sp_val.shape[0])
print("nsp", nsp, "slots", b.data.size, flush=True)

def timeit(f, *args):
    jax.block_until_ready(f(*args))
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best

# (a) kernel only (spill stripped)
b0 = b._replace(sp_row=jnp.zeros(0, jnp.int32), sp_col=jnp.zeros(0, jnp.int32),
                sp_val=jnp.zeros(0, jnp.float32))
@jax.jit
def chain_kernel(data, lanes, bands, blocks, band_lo, x0):
    def body(_, x2):
        y = _bell_matvec_call(data, lanes, bands, blocks, band_lo, x2,
                              b0.sp_row, b0.sp_col, b0.sp_val,
                              b.nb, b.nblk, False, 3)
        return jnp.zeros(npad, jnp.float32).at[:n].set(y[:n]).reshape(-1, LANES)
    return jax.lax.fori_loop(0, ITERS, body, x0)

x0 = jnp.ones((npad // LANES, LANES), jnp.float32)
t = timeit(chain_kernel, b.data, b.lanes, b.bands, b.blocks, b.band_lo, x0)
sb = b.data.size * 5
print(f"kernel-only: {t/ITERS*1e3:.2f} ms/mv, {ITERS*sb/t/1e9:.0f} GB/s slots-stream", flush=True)

# (b) spill only
sp_row, sp_col, sp_val = b.sp_row, b.sp_col, b.sp_val
@jax.jit
def chain_spill(xf):
    def body(_, xf):
        y = jnp.zeros(mp, jnp.float32).at[sp_row].add(sp_val * xf[sp_col])
        return jnp.zeros(npad, jnp.float32).at[:n].set(y[:n])
    return jax.lax.fori_loop(0, ITERS, body, xf)
t = timeit(chain_spill, jnp.ones(npad, jnp.float32))
print(f"spill-only: {t/ITERS*1e3:.2f} ms/mv", flush=True)

# (c) gather only
@jax.jit
def chain_gather(xf):
    def body(_, xf):
        g = sp_val * xf[sp_col]
        return jnp.zeros(npad, jnp.float32).at[:nsp].set(g)
    return jax.lax.fori_loop(0, ITERS, body, xf)
t = timeit(chain_gather, jnp.ones(npad, jnp.float32))
print(f"gather-only: {t/ITERS*1e3:.2f} ms/mv", flush=True)

# (d) scatter only (fixed source)
g0 = jnp.ones(nsp, jnp.float32)
@jax.jit
def chain_scatter(y0):
    def body(_, y):
        y2 = jnp.zeros(mp, jnp.float32).at[sp_row].add(g0 * y[0])
        return y2
    return jax.lax.fori_loop(0, ITERS, body, y0)
t = timeit(chain_scatter, jnp.ones(mp, jnp.float32))
print(f"scatter-only: {t/ITERS*1e3:.2f} ms/mv", flush=True)

# (e) sorted segment_sum variant for spill
order = np.argsort(np.asarray(b.sp_row), kind="stable")
sr = jnp.asarray(np.asarray(b.sp_row)[order])
sc = jnp.asarray(np.asarray(b.sp_col)[order])
sv = jnp.asarray(np.asarray(b.sp_val)[order])
@jax.jit
def chain_seg(xf):
    def body(_, xf):
        g = sv * xf[sc]
        y = jax.ops.segment_sum(g, sr, num_segments=mp,
                                indices_are_sorted=True)
        return jnp.zeros(npad, jnp.float32).at[:n].set(y[:n])
    return jax.lax.fori_loop(0, ITERS, body, xf)
t = timeit(chain_seg, jnp.ones(npad, jnp.float32))
print(f"sorted-segsum spill: {t/ITERS*1e3:.2f} ms/mv", flush=True)
