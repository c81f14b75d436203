"""Scaling evidence: weak-scaling CG over a device mesh + communication
volume accounting (BASELINE ">=75% weak-scaling efficiency").

Runs on whatever devices exist: a virtual 8-device CPU mesh by default
(the collectives are real; absolute times are CPU times, so the curve
validates wiring and communication *structure*, to be re-run as-is on a
real slice with PYKRYLOV_REAL_MESH=1).  Emits one JSON report with:

  * weak-scaling curve: Jacobi-preconditioned halo-exchange CG on
    generated 3-D Poisson, fixed per-device load, 1..D devices —
    per-iteration time and efficiency vs 1 device;
  * communication accounting per matvec: halo-exchange volume
    (2·w·dtype per device, size-independent) vs the generic all-gather
    volume at each width, and the partition-time gather schedule's
    entries on a general matrix (jpwh_991 pattern, 8-way) vs its
    all-gather fallback (parallel/gather.py).

Usage: python bench_scaling.py [--out SCALING_r02.json] [--scale N]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import jax as _jax
if not _os.environ.get("PYKRYLOV_REAL_MESH"):
    _jax.config.update("jax_platforms", "cpu")
    try:
        _jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def weak_scaling_curve(scale):
    from pykrylov_tpu.parallel import make_mesh, sharded_poisson3d, replicate
    from pykrylov_tpu.ops import DiagonalOperator
    from pykrylov_tpu.solvers import cg

    n_avail = len(jax.devices())
    rows = []
    t1 = None
    d = 1
    while d <= n_avail:
        n_grid = int(round(scale * d ** (1.0 / 3.0)))
        mesh = make_mesh(d)
        op, b, e, pad = sharded_poisson3d(n_grid, mesh, halo=True,
                                          dtype=np.float32)
        m = n_grid ** 3 + pad
        M = DiagonalOperator(replicate(
            jnp.full(m, 1.0 / 6.0, dtype=jnp.float32), mesh))
        res = cg(op, b, M=M, rtol=1e-6, maxiter=2 * m)  # compile+converge
        jax.block_until_ready(res.x)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(cg(op, b, M=M, rtol=1e-6,
                                     maxiter=2 * m).x)
            best = min(best, time.perf_counter() - t0)
        iters = int(res.n_iter)
        tpi = best / max(iters, 1)
        if t1 is None:
            t1 = tpi
        halo_bytes = 2 * op.halo_width * 4  # per device per matvec
        allgather_bytes = (d - 1) * (m // d) * 4
        rows.append({
            "devices": d, "grid_n": n_grid, "unknowns": n_grid ** 3,
            "iters": iters, "time_s": round(best, 4),
            "time_per_iter_ms": round(tpi * 1e3, 4),
            "weak_efficiency": round(t1 / tpi, 4),
            "converged": bool(res.converged),
            "halo_bytes_per_dev_per_mv": halo_bytes,
            "allgather_bytes_per_dev_per_mv": allgather_bytes,
            "comm_reduction_x": round(allgather_bytes / max(halo_bytes, 1),
                                      1),
        })
        d *= 2
    return rows


def gather_schedule_accounting():
    from pykrylov_tpu.parallel import make_mesh
    from pykrylov_tpu.parallel.gather import GatherEllOperator
    from pykrylov_tpu.sparse import formats as F
    from pykrylov_tpu.io.datasets import load_bundled

    d = min(8, len(jax.devices()))
    mesh = make_mesh(d)
    vals, rows, cols, shape = load_bundled("jpwh_991")
    coo = F.coo_from_arrays(vals, rows, cols, shape, device=False)
    op = GatherEllOperator(coo, mesh)
    # the BELL-kernel sharded operator rides the SAME schedule; check
    # compute parity and record its per-device kernel footprint
    from pykrylov_tpu.parallel import GatherBellOperator, shard_vector
    import numpy as np
    opb = GatherBellOperator(coo, mesh, with_transpose=True)
    x = np.random.default_rng(0).standard_normal(op.nargin)
    xs = shard_vector(jnp.asarray(x), mesh)
    diff = float(jnp.abs((op @ xs) - (opb @ xs)).max())
    # transpose products ride the REVERSED schedule at identical volume
    # (sharded LSQR on general square systems); check both local
    # computes agree
    diff_t = float(jnp.abs((op.T @ xs) - (opb.T @ xs)).max())
    return {
        "matrix": "jpwh_991", "devices": d,
        "scheduled_entries_per_mv": op.comm_entries_per_matvec,
        "scheduled_entries_unpadded": op.comm_entries_true,
        "allgather_entries_per_mv": op.allgather_entries_per_matvec,
        "reduction_x": round(op.allgather_entries_per_matvec
                             / max(1, op.comm_entries_per_matvec), 2),
        "transpose_entries_per_mv": op.comm_entries_per_matvec,
        "transpose_max_abs_diff_ell_vs_bell": diff_t,
        "bell_local_kernel": {
            "max_abs_diff_vs_ell": diff,
            "slots_per_device": opb.slots_per_device,
        },
    }


def tall_skinny_accounting():
    """Sharded rectangular LSQR: per-iteration collective volume is one
    psum of n floats (the replicated n-side partial), independent of m."""
    import numpy as np
    from pykrylov_tpu.parallel import (make_mesh, shard_vector,
                                       TallSkinnyOperator)
    from pykrylov_tpu.solvers import lsqr

    d = min(8, len(jax.devices()))
    mesh = make_mesh(d)
    rng = np.random.default_rng(0)
    m, n = 4096, 32
    a = rng.standard_normal((m, n)).astype(np.float32)
    xt = rng.standard_normal(n).astype(np.float32)
    op = TallSkinnyOperator(a, mesh)
    b = np.zeros(op.nargout, np.float32)
    b[:m] = a @ xt
    res = lsqr(op, shard_vector(jnp.asarray(b), mesh), atol=1e-6,
               btol=1e-6)
    return {
        "m": m, "n": n, "devices": d,
        "iters": int(res.n_iter),
        "err": float(jnp.linalg.norm(res.x - xt)),
        "psum_floats_per_iteration": n,
        "allgather_equivalent_floats": (d - 1) * (m // d),
    }


def rectangular_gather_accounting():
    """Fully-sharded rectangular LSQR (rows AND columns blocked over the
    mesh, no replicated side): scheduled gather volume per product vs
    the all-gather fallback and vs replicating the n-side (what
    TallSkinnyOperator would ship once n is large)."""
    import numpy as np
    from pykrylov_tpu.parallel import (make_mesh, shard_vector,
                                       GatherEllOperator)
    from pykrylov_tpu.sparse import formats as F
    from pykrylov_tpu.solvers import lsqr

    d = min(8, len(jax.devices()))
    mesh = make_mesh(d)
    rng = np.random.default_rng(1)
    m, n = 6000, 2500   # both sides too large to want replication
    nnz = 12 * m
    rows = np.concatenate([np.arange(m) % m,
                           rng.integers(0, m, nnz - m)])
    cols = np.concatenate([(np.arange(m) * 3 + 1) % n,
                           rng.integers(0, n, nnz - m)])
    # column locality: most references land near the row's home block
    # (the PDE-coupling profile general rectangular systems show);
    # the 5% tail is uniform long-range coupling
    near = rng.random(nnz - m) < 0.95
    cols[m:][near] = ((rows[m:][near] * n) // m
                      + rng.integers(-25, 26, near.sum())) % n
    vals = (np.where(np.arange(nnz) < m, 3.0, 0.05)
            * (1.0 + 0.1 * rng.standard_normal(nnz))).astype(np.float32)
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    coo = F.coo_from_arrays(vals[first], rows[first], cols[first],
                            (m, n), device=False)
    op = GatherEllOperator(coo, mesh)
    # f32 run with f32-reachable tolerances (this script never enables
    # x64; f64 inputs would silently downcast and 1e-8 is unreachable)
    b = np.zeros(op.nargout, np.float32)
    b[:m] = rng.standard_normal(m)
    res = lsqr(op, shard_vector(jnp.asarray(b), mesh), atol=1e-5,
               btol=1e-5, itnlim=4 * n)
    return {
        "m": m, "n": n, "nnz": int(coo.data.shape[0]), "devices": d,
        "iters": int(res.n_iter), "istop": int(res.istop),
        # all counts are mesh totals per product
        "scheduled_entries_per_product": op.comm_entries_per_matvec,
        "allgather_entries_per_product": op.allgather_entries_per_matvec,
        # what a replicated n-side (TallSkinny-style) would ship instead:
        # one ring all-reduce of the n-vector per transpose product
        "replicated_nside_allreduce_entries": 2 * (d - 1) * op.nargin,
        "reduction_vs_allgather_x": round(
            op.allgather_entries_per_matvec
            / max(1, op.comm_entries_per_matvec), 2),
    }


def projected_weak_efficiency():
    """Convert the measured per-iteration communication volumes into a
    PROJECTED weak-scaling efficiency curve (VERDICT r2 #4a): the
    virtual-mesh wall clock times the oversubscribed host, not the mesh,
    so the ≥75% BASELINE target needs a model with stated inputs
    instead.

    Model (all inputs in the emitted dict):
      * compute: per-device CG iteration on the HEADLINE bench problem
        (3-D Poisson, n=240 per device, 7 diagonals) is HBM-bound; time
        = bytes/BW with the MEASURED DIA kernel bandwidth (bench.py:
        665 GB/s on this v5e).  Iteration traffic = matvec stream
        ((ndiag+2)·m·4 B) + ~10 vector passes (axpys/dots of r,p,x).
      * halo exchange: 2 neighbor ppermutes of w = n_grid^2 entries
        (row-block 1-D partition; measured in weak_scaling rows as
        halo_bytes_per_dev_per_mv), each costing bytes/link_bw + hop
        latency, riding ICI inside a slice and DCN across hosts.
      * dot products: 2 scalar psums per iteration, latency-bound:
        2·ceil(log2 D) hops on the torus (tree schedule), plus one DCN
        latency per level crossing hosts.
    ICI/DCN parameters are v5e-class public numbers, stated explicitly
    so the model can be re-fit from a real-slice run (the structure —
    surface/volume halo + latency-bound scalar psums — is what the
    measured volumes validate).
    """
    # stated model inputs
    BW_HBM_EFF = 665e9        # measured DIA SpMV stream on this v5e (B/s)
    ICI_LINK_BW = 40e9        # sustained per-neighbor ICI, one direction
    ICI_HOP_LAT = 1.5e-6      # per-hop collective latency (s)
    DCN_BW = 25e9             # per-host data-center network (B/s)
    DCN_LAT = 10e-6           # cross-host collective latency (s)
    NDIAG = 7
    n_grid = 240              # per-device load of the headline bench
    m_local = n_grid ** 3
    VEC_PASSES = 10           # r/p/x axpys + 2 dots read traffic per iter

    t_comp = (NDIAG + 2 + VEC_PASSES) * m_local * 4 / BW_HBM_EFF
    halo_bytes = n_grid * n_grid * 4   # one direction, one neighbor

    def t_iter(devices, hosts):
        if devices == 1:
            return t_comp
        import math
        # halo: 2 neighbor exchanges; hosts > 1 puts 2 boundary
        # exchanges per host on DCN, the rest on ICI
        t_halo_ici = 2 * (halo_bytes / ICI_LINK_BW + ICI_HOP_LAT)
        t_halo = t_halo_ici
        if hosts > 1:
            t_halo = max(t_halo,
                         2 * (halo_bytes / DCN_BW + DCN_LAT))
        # 2 scalar psums, tree over the slice + one DCN level
        hops = math.ceil(math.log2(devices))
        t_dots = 2 * (hops * ICI_HOP_LAT
                      + (DCN_LAT * math.ceil(math.log2(hosts))
                         if hosts > 1 else 0.0))
        return t_comp + t_halo + t_dots

    rows = []
    for devices, hosts in [(1, 1), (4, 1), (8, 1), (16, 1), (64, 1),
                           (256, 1), (16, 2), (32, 4), (64, 8),
                           (256, 32)]:
        t = t_iter(devices, hosts)
        rows.append({
            "devices": devices, "hosts": hosts,
            "time_per_iter_ms": round(t * 1e3, 4),
            "projected_weak_efficiency": round(t_comp / t, 4),
        })
    return {
        "model_inputs": {
            "hbm_eff_gbps": BW_HBM_EFF / 1e9,
            "ici_link_gbps": ICI_LINK_BW / 1e9,
            "ici_hop_latency_us": ICI_HOP_LAT * 1e6,
            "dcn_gbps": DCN_BW / 1e9,
            "dcn_latency_us": DCN_LAT * 1e6,
            "per_device_unknowns": m_local,
            "ndiag": NDIAG, "vector_passes_per_iter": VEC_PASSES,
            "halo_bytes_per_direction": halo_bytes,
        },
        "note": ("projection from measured single-chip bandwidth + "
                 "measured comm volumes; halo traffic is surface/volume "
                 "-small (0.23 MB vs 1.05 GB per iteration), so the "
                 ">=75% BASELINE weak-scaling target is met with large "
                 "margin at every modeled size — the risk is latency-"
                 "bound scalar psums at very small per-device loads, "
                 "not bandwidth"),
        "curve": rows,
        "meets_75pct_target_at_2plus_hosts": all(
            r["projected_weak_efficiency"] >= 0.75 for r in rows
            if r["hosts"] >= 2),
    }


def real_mesh_degenerate_leg():
    """PYKRYLOV_REAL_MESH escape hatch exercised on hardware (VERDICT r2
    #8): a 1-device mesh on the real chip through the exact code path a
    slice run would take — ``initialize_multihost`` bootstrap, mesh
    construction, sharded operator, halo-CG solve."""
    from pykrylov_tpu.parallel import (make_mesh, sharded_poisson3d,
                                       replicate)
    from pykrylov_tpu.parallel.mesh import initialize_multihost
    from pykrylov_tpu.ops import DiagonalOperator
    from pykrylov_tpu.solvers import cg

    boot = initialize_multihost()
    d = len(jax.devices())
    mesh = make_mesh(d)
    n_grid = 64
    op, b, e, pad = sharded_poisson3d(n_grid, mesh, halo=True,
                                      dtype=np.float32)
    m = n_grid ** 3 + pad
    M = DiagonalOperator(replicate(
        jnp.full(m, 1.0 / 6.0, dtype=jnp.float32), mesh))
    res = cg(op, b, M=M, rtol=1e-6, maxiter=2 * m)
    jax.block_until_ready(res.x)
    t0 = time.perf_counter()
    res = cg(op, b, M=M, rtol=1e-6, maxiter=2 * m)
    jax.block_until_ready(res.x)
    dt = time.perf_counter() - t0
    return {
        "initialize_multihost": repr(boot),
        "devices": d,
        "device_kind": str(jax.devices()[0]),
        "grid_n": n_grid,
        "iters": int(res.n_iter),
        "converged": bool(res.converged),
        "time_s": round(dt, 4),
        "time_per_iter_ms": round(dt / max(int(res.n_iter), 1) * 1e3, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r03.json")
    ap.add_argument("--scale", type=int, default=32,
                    help="per-device grid scale (n = scale * d^(1/3))")
    args = ap.parse_args()

    host_cores = len(_os.sched_getaffinity(0))
    report = {
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "host_cores": host_cores,
        "device_kind": str(jax.devices()[0]),
        "virtual_mesh": not bool(_os.environ.get("PYKRYLOV_REAL_MESH")),
        "note": ("virtual CPU mesh: collectives, sharding and the "
                 "communication-volume accounting are real and transfer "
                 "to hardware; the wall-clock weak_efficiency column "
                 "does NOT (virtual devices share %d host cores, so the "
                 "oversubscribed runs time the host, not the mesh) — "
                 "re-run with PYKRYLOV_REAL_MESH=1 on a slice for real "
                 "efficiency" % host_cores),
        "weak_scaling": weak_scaling_curve(args.scale),
        "projected_weak_efficiency": projected_weak_efficiency(),
        "general_sparsity_gather_schedule": gather_schedule_accounting(),
        "tall_skinny_lsqr": tall_skinny_accounting(),
        "rectangular_gather_lsqr": rectangular_gather_accounting(),
    }
    if _os.environ.get("PYKRYLOV_REAL_MESH"):
        report["real_mesh"] = real_mesh_degenerate_leg()
    out = json.dumps(report, indent=1)
    print(out)
    with open(args.out, "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
