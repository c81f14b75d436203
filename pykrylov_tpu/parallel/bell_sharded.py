"""Row-sharded general sparsity with the BELL Pallas kernel as the
local matvec.

:class:`~pykrylov_tpu.parallel.gather.GatherEllOperator` already
replaces the all-gather fallback with a partition-time schedule (only
the x entries a device actually references travel, one ``ppermute``
round per mesh shift — the TPU analogue of the reference-era MPI
neighbor exchange, reference ``linop/linop.py:697-706`` being the
single-process C SpMV this generalizes).  Its local compute is an XLA
ELL gather, ~500x off the BELL kernel on large blocks.  This module
keeps the same schedule but packs each device's local block — columns
remapped into the private ``[local x | round-1 buffer | ...]`` address
space — as a BELL v3 container and runs the Pallas kernel inside
``shard_map``.

Per-device packings have data-dependent shapes; ``shard_map`` needs one
program, so the containers are padded to common (nsteps, GS, nb, nblk)
and stacked with a leading device axis sharded over the mesh (padding
steps carry zero data and sentinel block ids — they contribute nothing).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.base import LinearOperator, _register_as_linop
from ..sparse import formats as F
from ..sparse.bell import LANES, bell_from_coo, _bell_matvec_call
from .gather import build_gather_schedule
from .mesh import ROW_AXIS
from .sharded import pad_to_multiple

__all__ = ["GatherBellOperator"]


def _pack_local_blocks(data, cols_local, d, L, width, nblk,
                       transpose=False):
    """Pack each device's (L, K) remapped ELL block as a BELL v3
    container over the uniform private address space ``[0, width)``;
    pad all containers to common shapes and stack along a device axis.
    Host-side NumPy throughout.

    ``transpose=True`` packs each device's TRANSPOSED block instead —
    shape (width, L): rows are private-address positions, columns the
    device's local rows — the local compute of the reversed-schedule
    ``A' x`` product."""
    bells = []
    for i in range(d):
        blk = slice(i * L, (i + 1) * L)
        db, cb = data[blk], cols_local[blk]
        live = db != 0
        rr = np.nonzero(live)[0]
        vv = db[live]
        cc = cb[live]
        if transpose:
            coo = F.coo_from_arrays(vv, cc, rr, (width, L), device=False)
            bells.append(bell_from_coo(coo, nblk=nblk, min_cols=L,
                                       spill_cost=None, device=False,
                                       window=1))
            continue
        coo = F.coo_from_arrays(vv, rr, cc, (L, width), device=False)
        bells.append(bell_from_coo(coo, nblk=nblk, min_cols=width,
                                   spill_cost=None, device=False,
                                   window=1))
    # the packer clamps nblk (no more blocks per step than exist):
    # every device has the same L so the clamped value is uniform
    nblk = bells[0].nblk
    assert all(b.nblk == nblk for b in bells)
    nsteps = max(b.data.shape[0] for b in bells)
    GS = max(b.data.shape[1] for b in bells)
    nb = max(b.nb for b in bells)
    # stored bands are relative to band_lo, so band_lo must NOT be
    # re-clamped to the unified nb; grow the x pad instead so every
    # window [band_lo, band_lo + nb) stays in bounds
    ncb = max(max(b.padded_shape[1] // LANES for b in bells),
              max(int(np.asarray(b.band_lo).max(initial=0))
                  for b in bells) + nb)

    def pad3(a, shp, fill=0):
        out = np.full(shp, fill, dtype=a.dtype)
        out[:a.shape[0], :a.shape[1], :a.shape[2]] = a
        return out

    dat = np.stack([pad3(np.asarray(b.data), (nsteps, GS, LANES))
                    for b in bells])

    def repack_lanes(b):
        # the packed-lanes byte<->row interleave depends on GS (byte j
        # of word m is sublane row j*GS/4 + m), so padding to a larger
        # GS must go through the unpacked form
        from ..sparse.bell import _pack_idx, _unpack_idx
        return _pack_idx(pad3(_unpack_idx(b), (nsteps, GS, LANES))
                         .astype(np.uint8))

    lan = np.stack([repack_lanes(b) for b in bells])
    from ..sparse.bell import _pad_blocks_w1
    bnd = np.stack([pad3(np.asarray(b.bands), (nsteps, 1, GS))
                    for b in bells])
    blo = np.stack([_pad_blocks_w1(b.blocks, b.data.shape[1], GS, nblk,
                                   nsteps) for b in bells])
    bl = np.stack([np.pad(np.asarray(b.band_lo),
                          (0, nsteps - b.band_lo.shape[0]))
                   for b in bells]).astype(np.int32)
    rows_pad = nsteps * nblk * LANES
    return (dat, lan, bnd, blo, bl), (nb, nblk, ncb, rows_pad)


@functools.lru_cache(maxsize=None)
def _bell_gather_mv_factory(axis, n_dev, round_lens, cfg, L, mesh,
                            interpret, _shadow=False):
    """shard_map-wrapped scheduled-gather BELL matvec, memoized per
    config so equal-config operators share one function object.
    ``_shadow`` does not change the matvec — it keys DISTINCT function
    objects for operators that carry the verified ELL shadow, so the
    ff registry (keyed on matvec identity) can't hand a shadow ff to a
    shadowless operator sharing the same config."""
    nb, nblk, ncb, rows_pad = cfg
    perms = [tuple((j, (j - k) % n_dev) for j in range(n_dev))
             for k in range(1, n_dev)]
    empty_i = jnp.zeros(0, dtype=jnp.int32)

    def local_mv(dat, lan, bnd, blo, bl, x_blk, *send_blks):
        bufs = [x_blk]
        for k, Lk in enumerate(round_lens):
            if Lk == 0:
                continue
            out = jax.lax.ppermute(x_blk[send_blks[k][0]], axis,
                                   perm=list(perms[k]))
            bufs.append(out)
        xfull = jnp.concatenate(bufs) if len(bufs) > 1 else bufs[0]
        xp = jnp.zeros(ncb * LANES, xfull.dtype).at[
            :xfull.shape[0]].set(xfull)
        empty_v = jnp.zeros(0, dtype=dat.dtype)
        y = _bell_matvec_call(dat[0], lan[0], bnd[0], blo[0], bl[0],
                              xp.reshape(-1, LANES), empty_i, empty_i,
                              empty_v, nb, nblk, interpret, window=1)
        return y[:L]

    nsend = len(round_lens)
    mapped = shard_map(
        local_mv, mesh=mesh,
        in_specs=(P(axis, None, None, None),) * 4 + (P(axis, None),)
        + (P(axis),) + (P(axis, None),) * nsend,
        out_specs=P(axis),
        # pallas_call can't annotate varying-mesh-axes on its outputs
        check_vma=False)

    def mv(params, x):
        (dat, lan, bnd, blo, bl), send = params[0], params[1]
        return mapped(dat, lan, bnd, blo, bl, x, *send)

    return mv


@functools.lru_cache(maxsize=None)
def _bell_gather_mm_factory(axis, n_dev, round_lens, cfg, L, mesh,
                            interpret):
    """Block-product twin of the scheduled-gather matvec: the ppermute
    rounds ship (len, K) slices and the per-device local product is the
    fused BELL SpMM (slots streamed once for all K columns)."""
    from ..sparse.bell import _bell_matmat_call, _to_band_major
    nb, nblk, ncb, rows_pad = cfg
    perms = [tuple((j, (j - k) % n_dev) for j in range(n_dev))
             for k in range(1, n_dev)]
    empty_i = jnp.zeros(0, dtype=jnp.int32)

    def local_mm(dat, lan, bnd, blo, bl, X_blk, *send_blks):
        bufs = [X_blk]
        for k, Lk in enumerate(round_lens):
            if Lk == 0:
                continue
            out = jax.lax.ppermute(X_blk[send_blks[k][0], :], axis,
                                   perm=list(perms[k]))
            bufs.append(out)
        Xfull = jnp.concatenate(bufs) if len(bufs) > 1 else bufs[0]
        K = X_blk.shape[1]
        Xp = jnp.zeros((ncb * LANES, K), Xfull.dtype).at[
            :Xfull.shape[0], :].set(Xfull)
        empty_v = jnp.zeros(0, dtype=dat.dtype)
        Y = _bell_matmat_call(dat[0], lan[0], bnd[0], blo[0], bl[0],
                              _to_band_major(Xp), empty_i, empty_i,
                              empty_v, Xp, nb, nblk, int(K), interpret,
                              window=1)
        return Y[:L]

    nsend = len(round_lens)
    mapped = shard_map(
        local_mm, mesh=mesh,
        in_specs=(P(axis, None, None, None),) * 4 + (P(axis, None),)
        + (P(axis, None),) + (P(axis, None),) * nsend,
        out_specs=P(axis, None),
        check_vma=False)

    def mm(params, X):
        (dat, lan, bnd, blo, bl), send = params[0], params[1]
        return mapped(dat, lan, bnd, blo, bl, X, *send)

    return mm


@functools.lru_cache(maxsize=None)
def _bell_gather_mvT_factory(axis, n_dev, round_lens, cfg_t, Lrow, Lx,
                             mesh, interpret):
    """Transpose product: per-device BELL kernel over the TRANSPOSED
    local block (outputs in the private address space), then the
    reversed exchange scatter-adds each round's buffer segment back at
    the owner's forward send list — same traffic as the forward
    schedule, direction reversed (see ``gather._gather_mvT_factory``).

    ``Lrow`` is the per-device row-block size (length of the m-sharded
    input block); ``Lx`` the per-device x-block size (length of the
    n-sharded output block) — equal for square operators."""
    nb_t, nblk_t, ncb_t, rows_pad_t = cfg_t
    rev_perms = [tuple((j, (j + k) % n_dev) for j in range(n_dev))
                 for k in range(1, n_dev)]
    empty_i = jnp.zeros(0, dtype=jnp.int32)

    def local_mv_t(dat, lan, bnd, blo, bl, x_blk, *send_blks):
        xp = jnp.zeros(ncb_t * LANES, x_blk.dtype).at[:Lrow].set(x_blk)
        empty_v = jnp.zeros(0, dtype=dat.dtype)
        y_priv = _bell_matvec_call(dat[0], lan[0], bnd[0], blo[0], bl[0],
                                   xp.reshape(-1, LANES), empty_i,
                                   empty_i, empty_v, nb_t, nblk_t,
                                   interpret, window=1)
        y = y_priv[:Lx]
        off = Lx
        for k, Lk in enumerate(round_lens):
            if Lk == 0:
                continue
            seg = jax.lax.ppermute(y_priv[off:off + Lk], axis,
                                   perm=list(rev_perms[k]))
            off += Lk
            y = y.at[send_blks[k][0]].add(seg)
        return y

    nsend = len(round_lens)
    mapped = shard_map(
        local_mv_t, mesh=mesh,
        in_specs=(P(axis, None, None, None),) * 4 + (P(axis, None),)
        + (P(axis),) + (P(axis, None),) * nsend,
        out_specs=P(axis),
        check_vma=False)

    def mv_t(params, x):
        (dat, lan, bnd, blo, bl), send = params[2], params[1]
        return mapped(dat, lan, bnd, blo, bl, x, *send)

    return mv_t


@functools.lru_cache(maxsize=None)
def _bell_gather_mmT_factory(axis, n_dev, round_lens, cfg_t, Lrow, Lx,
                             mesh, interpret):
    """Transpose block product: per-device BELL SpMM over the
    transposed local block, reversed exchange of (len, K) segments."""
    from ..sparse.bell import _bell_matmat_call, _to_band_major
    nb_t, nblk_t, ncb_t, rows_pad_t = cfg_t
    rev_perms = [tuple((j, (j + k) % n_dev) for j in range(n_dev))
                 for k in range(1, n_dev)]
    empty_i = jnp.zeros(0, dtype=jnp.int32)

    def local_mm_t(dat, lan, bnd, blo, bl, X_blk, *send_blks):
        K = X_blk.shape[1]
        Xp = jnp.zeros((ncb_t * LANES, K), X_blk.dtype).at[
            :Lrow, :].set(X_blk)
        empty_v = jnp.zeros(0, dtype=dat.dtype)
        Y_priv = _bell_matmat_call(dat[0], lan[0], bnd[0], blo[0], bl[0],
                                   _to_band_major(Xp), empty_i, empty_i,
                                   empty_v, Xp, nb_t, nblk_t, int(K),
                                   interpret, window=1)
        Y = Y_priv[:Lx, :]
        off = Lx
        for k, Lk in enumerate(round_lens):
            if Lk == 0:
                continue
            seg = jax.lax.ppermute(Y_priv[off:off + Lk, :], axis,
                                   perm=list(rev_perms[k]))
            off += Lk
            Y = Y.at[send_blks[k][0], :].add(seg)
        return Y

    nsend = len(round_lens)
    mapped = shard_map(
        local_mm_t, mesh=mesh,
        in_specs=(P(axis, None, None, None),) * 4 + (P(axis, None),)
        + (P(axis, None),) + (P(axis, None),) * nsend,
        out_specs=P(axis, None),
        check_vma=False)

    def mm_t(params, X):
        (dat, lan, bnd, blo, bl), send = params[2], params[1]
        return mapped(dat, lan, bnd, blo, bl, X, *send)

    return mm_t


@functools.lru_cache(maxsize=None)
def _bell_gather_ff_factory(axis, n_dev, round_lens, mesh):
    """Compensated matvec for shadowed GatherBell operators: the
    double-f32 product runs over the ELL shadow (params slot 3) through
    the shared scheduled-gather body."""
    from .gather import _gather_ff_mapped
    mapped = _gather_ff_mapped(axis, n_dev, round_lens, mesh)

    def ff(params, xh, xl):
        sd, sc = params[3]
        return mapped(sd, sc, xh, xl, *params[1])

    return ff


class GatherBellOperator(LinearOperator):
    """Row-sharded general-sparsity operator: partition-time ppermute
    gather schedule + per-device BELL Pallas local SpMV.

    Parameters match :class:`GatherEllOperator` (ELL/COO container,
    1-D mesh; rectangular containers shard rows AND columns over the
    same axis); maps column-space vectors (length ``n + self.pad_n``)
    to row-space vectors (length ``m + self.pad``), both sharded with
    ``shard_vector``.  ``nblk`` fixes the per-device step size (uniform
    across devices); ``interpret=None`` auto-selects off-TPU.
    ``with_transpose=True`` additionally packs each device's TRANSPOSED
    local block so ``op.T @ x`` runs the reversed exchange (sharded
    LSQR/LSMR on general systems); ``symmetric=True`` (square only)
    reuses the forward product instead.

    ``verified_shadow=True`` keeps the remapped per-device ELL arrays
    next to the Pallas packings and registers a compensated double-f32
    matvec over them (the kernel slot storage has no such product), so
    ``replace_every``/``refined_solve``/``verify_final`` certificates
    run at full strength on this operator too — at ~8 B/nnz of extra
    HBM.  Off by default; :class:`GatherEllOperator` provides the
    always-compensated alternative.
    """

    def __init__(self, ell, mesh, axis=ROW_AXIS, symmetric=False,
                 nblk=64, interpret=None, with_transpose=False,
                 verified_shadow=False, **kwargs):
        if isinstance(ell, F.COO):
            ell = F.ell_from_coo(ell, device=False)
        m, n = ell.shape
        if symmetric and m != n:
            raise ValueError("symmetric requires a square operator")
        d = mesh.shape[axis]
        mp = pad_to_multiple(m, d)
        np_ = pad_to_multiple(n, d)
        Lrow = mp // d
        Lx = np_ // d
        K = ell.data.shape[1]

        data = np.zeros((mp, K), dtype=np.asarray(ell.data).dtype)
        cols = np.zeros((mp, K), dtype=np.int64)
        data[:m] = np.asarray(ell.data)
        cols[:m] = np.asarray(ell.cols)

        cols_local, sendidx, lens = build_gather_schedule(cols, data,
                                                          d, Lx, Lrow)
        round_lens = tuple(s.shape[1] for s in sendidx)
        width = Lx + sum(round_lens)

        arrs, cfg = _pack_local_blocks(data, cols_local, d, Lrow, width,
                                       nblk)

        if interpret is None:
            interpret = jax.default_backend() != "tpu"

        def ship(arrs):
            shs = [NamedSharding(mesh, P(axis, *(None,) * (a.ndim - 1)))
                   for a in arrs]
            return tuple(jax.device_put(jnp.asarray(a), s)
                         for a, s in zip(arrs, shs))

        dev = ship(arrs)
        sh2 = NamedSharding(mesh, P(axis, None))
        send_s = tuple(jax.device_put(s, sh2) for s in sendidx)

        mv = _bell_gather_mv_factory(axis, d, round_lens, cfg, Lrow,
                                     mesh, bool(interpret),
                                     bool(verified_shadow))
        mm = _bell_gather_mm_factory(axis, d, round_lens, cfg, Lrow,
                                     mesh, bool(interpret))
        if symmetric:
            rmv, rmm, dev_t = mv, mm, None
        elif with_transpose:
            arrs_t, cfg_t = _pack_local_blocks(data, cols_local, d, Lrow,
                                               width, nblk,
                                               transpose=True)
            dev_t = ship(arrs_t)
            rmv = _bell_gather_mvT_factory(axis, d, round_lens, cfg_t,
                                           Lrow, Lx, mesh,
                                           bool(interpret))
            rmm = _bell_gather_mmT_factory(axis, d, round_lens, cfg_t,
                                           Lrow, Lx, mesh,
                                           bool(interpret))
        else:
            rmv, rmm, dev_t = None, None, None

        shadow = None
        if verified_shadow:
            # OPT-IN compensated path (VERDICT r4 #3): the Pallas slot
            # storage has no double-f32 product, so keep the remapped
            # (mp, K) ELL arrays the packer consumed as a SHADOW for
            # verified residual replacements — they ride the same
            # gather schedule through the shared compensated local
            # product (gather._gather_ff_mapped).  Costs ~8 B/nnz of
            # extra HBM next to the kernel's ~5 B/slot stream.
            sh2b = NamedSharding(mesh, P(axis, None))
            shadow = (jax.device_put(jnp.asarray(data), sh2b),
                      jax.device_put(jnp.asarray(cols_local), sh2b))
            from ..solvers.ffmv import register_ff_matvec
            register_ff_matvec(
                mv, _bell_gather_ff_factory(axis, d, round_lens, mesh))

        is_complex = np.issubdtype(data.dtype, np.complexfloating)
        super().__init__(np_, mp, matvec=mv, matvec_transp=rmv,
                         matmat=mm, matmat_transp=rmm,
                         params=(dev, send_s, dev_t, shadow),
                         _takes_params=True, symmetric=symmetric,
                         hermitian=symmetric and not is_complex,
                         dtype=data.dtype, **kwargs)
        self.pad = mp - m
        self.pad_n = np_ - n
        self.mesh = mesh
        self.comm_entries_per_matvec = int(sum(d * Lk
                                               for Lk in round_lens))
        self.comm_entries_true = int(sum(sum(t) for t in lens))
        self.allgather_entries_per_matvec = int(d * (d - 1) * Lx)
        self.slots_per_device = int(np.prod(arrs[0].shape[1:]))

    @property
    def container(self):
        return self._params


_register_as_linop(GatherBellOperator)
