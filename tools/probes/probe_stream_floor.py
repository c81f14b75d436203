"""How fast can a Pallas TPU kernel STREAM from HBM, as a function of
block size, stream count, and pipelining mode?

Isolates the BELL kernel's streaming floor (~520 GB/s observed vs the
~1070 GB/s XLA elementwise chain achieves on the same chip).  Each
variant reduces the streamed block into a (8,128) accumulator so the
copies cannot be elided.
Run: python -c "import sys; sys.path.insert(0,'.');
exec(open('tools/probes/probe_stream_floor.py').read())"
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

assert jax.default_backend() == "tpu"
TOT_MB = 512           # total bytes streamed per call
ITERS = 40


def bench(tag, fn, *args):
    @jax.jit
    def chain(*args):
        def body(i, acc):
            return acc + fn(*args) * (1.0 + i)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros((8, 128), jnp.float32))
    try:
        float(chain(*args)[0, 0])
    except Exception as e:
        print(f"{tag}: FAILED {str(e)[:120]}", flush=True)
        return
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args)[0, 0])
        best = min(best, time.perf_counter() - t0)
    gbps = ITERS * TOT_MB * 2**20 / best / 1e9
    print(f"{tag}: {gbps:.0f} GB/s", flush=True)


def blockspec_stream(nstreams, rows):
    """nstreams equal arrays, each in (rows,128) blocks via BlockSpec."""
    nsteps = TOT_MB * 2**20 // (nstreams * rows * 128 * 4)

    def kernel(*refs):
        out = refs[-1]
        acc = jnp.zeros((8, 128), jnp.float32)
        for r in refs[:-1]:
            acc = acc + r[0].reshape(rows // 8, 8, 128).sum(axis=0)
        out[:] = acc

    def fn(*arrs):
        arrs = [pltpu.with_memory_space_constraint(a, pltpu.HBM)
                for a in arrs]
        return pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((1, rows, 128), lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM)
                      for _ in arrs],
            out_specs=pl.BlockSpec((8, 128), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(*arrs)
    arrs = [jnp.ones((nsteps, rows, 128), jnp.float32) * (k + 1)
            for k in range(nstreams)]
    return fn, arrs


def ring_stream(nstreams, rows, depth):
    nsteps = TOT_MB * 2**20 // (nstreams * rows * 128 * 4)
    nring = depth + 1

    def kernel(*refs):
        bufs = refs[nstreams + 1:nstreams + 1 + nstreams]
        sems = refs[nstreams + 1 + nstreams:]
        hbms = refs[:nstreams]
        out = refs[nstreams]
        st = pl.program_id(0)

        def dma(k, step):
            return pltpu.make_async_copy(hbms[k].at[step],
                                         bufs[k].at[step % nring],
                                         sems[k].at[step % nring])

        @pl.when(st == 0)
        def _():
            for kk in range(min(depth, nsteps)):
                for k in range(nstreams):
                    dma(k, kk).start()
        for k in range(nstreams):
            dma(k, st).wait()

        @pl.when(st + depth < nsteps)
        def _():
            for k in range(nstreams):
                dma(k, st + depth).start()
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(nstreams):
            acc = acc + bufs[k][st % nring].reshape(
                rows // 8, 8, 128).sum(axis=0)
        out[:] = acc

    def fn(*arrs):
        arrs = [pltpu.with_memory_space_constraint(a, pltpu.HBM)
                for a in arrs]
        return pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)
                      for _ in range(nstreams)],
            out_specs=pl.BlockSpec((8, 128), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=(
                [pltpu.VMEM((nring, rows, 128), jnp.float32)
                 for _ in range(nstreams)]
                + [pltpu.SemaphoreType.DMA((nring,))
                   for _ in range(nstreams)]),
        )(*arrs)
    arrs = [jnp.ones((nsteps, rows, 128), jnp.float32) * (k + 1)
            for k in range(nstreams)]
    return fn, arrs


for rows in (512, 1440, 4096):
    fn, arrs = blockspec_stream(1, rows)
    bench(f"blockspec 1-stream rows={rows}", fn, *arrs)
for rows in (512, 1440, 4096):
    fn, arrs = ring_stream(1, rows, 4)
    bench(f"ring d4  1-stream rows={rows}", fn, *arrs)
fn, arrs = blockspec_stream(2, 1440)
bench("blockspec 2-stream rows=1440", fn, *arrs)
fn, arrs = ring_stream(2, 1440, 4)
bench("ring d4  2-stream rows=1440", fn, *arrs)
fn, arrs = ring_stream(1, 1440, 8)
bench("ring d8  1-stream rows=1440", fn, *arrs)
