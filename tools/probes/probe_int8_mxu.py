"""Probe: int8 MXU matmul + bitcast inside a Pallas TPU kernel.

Feasibility check for int8-plane staging in the BELL kernel
(ROADMAP "options if more is needed"): transport f32 x-window entries
through the MXU as 4 exact int8 bit-planes (one-hot selector is 0/1 so
each int32 accumulator holds a single byte value), then reassemble the
f32 bits with shifts + bitcast.  If Mosaic lowers the int8 dot to the
MXU at its 2x int8 rate, staging drops from 3 bf16 passes to the
equivalent of 2 — a ~1.5x kernel speedup where staging dominates.

Run from the repo root on the chip: python tools/probes/probe_int8_mxu.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GS, NB, L = 1024, 256, 128
DIMS = (((1,), (0,)), ((), ()))


def k_int8(oh_ref, w_ref, o_ref):
    # w: (NB, 128) f32 -> uint32 bit planes packed along lanes (NB, 512)
    bits = jax.lax.bitcast_convert_type(w_ref[:], jnp.int32)
    planes = jnp.concatenate(
        [((bits >> (8 * j)) & 255).astype(jnp.int8) for j in range(4)],
        axis=1)                                        # (NB, 512)
    oh = oh_ref[:].astype(jnp.int8)                    # (GS, NB)
    acc = jax.lax.dot_general(oh, planes, DIMS,
                              preferred_element_type=jnp.int32)
    # bytes >=128 ride the MXU sign-extended (int8); mask each
    # accumulator back to its byte before reassembly
    out = ((acc[:, 0:L] & 255) | ((acc[:, L:2*L] & 255) << 8)
           | ((acc[:, 2*L:3*L] & 255) << 16)
           | ((acc[:, 3*L:4*L] & 255) << 24))
    o_ref[:] = jax.lax.bitcast_convert_type(out, jnp.float32)


def k_bf16(oh_ref, w_ref, o_ref):
    ohb = oh_ref[:].astype(jnp.bfloat16)
    r = w_ref[:]
    out = None
    for _ in range(3):
        vp = r.astype(jnp.bfloat16)
        r = r - vp.astype(jnp.float32)
        t = jax.lax.dot_general(ohb, vp, DIMS,
                                preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    o_ref[:] = out


def run(kernel, name, oh, w, reps=1):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((GS, L), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def chain(oh, w):
        def body(_, acc):
            y = f(oh, w + acc[0, :1] * 0)   # loop-carried dep
            return y
        return jax.lax.fori_loop(0, 200, body, jnp.zeros((GS, L)))

    y = f(oh, w)
    ref = np.asarray(oh, np.float64) @ np.asarray(w, np.float64)
    err = float(np.abs(np.asarray(y) - ref).max())
    t0 = time.perf_counter()
    float(chain(oh, w)[0, 0])
    dt_c = time.perf_counter() - t0
    best = np.inf
    for r in range(3):
        w2 = w * (1.0 + 0.01 * r)
        float(w2[0, 0])
        t0 = time.perf_counter()
        float(chain(oh, w2)[0, 0])
        best = min(best, time.perf_counter() - t0)
    print("%s: max_abs_err=%.3e  %.1f us/call (compile %.1fs)"
          % (name, err, best / 200 * 1e6, dt_c))


def main():
    rng = np.random.default_rng(0)
    base = rng.integers(0, NB, size=GS)
    oh = (base[:, None] == np.arange(NB)[None, :])
    w = rng.standard_normal((NB, L)).astype(np.float32)
    oh = jnp.asarray(oh)
    w = jnp.asarray(w)
    run(k_bf16, "bf16 3-pass", oh, w)
    run(k_int8, "int8 planes", oh, w)


if __name__ == "__main__":
    main()
