"""BSR (block sparse row) container + Pallas SpMV with scalar prefetch.

The TPU-native general-sparsity compute format (BASELINE: "CSR/COO/BSR
SpMV kernels operating on sharded HBM-resident buffers").  TPUs have no
efficient arbitrary gather (Mosaic supports only single-tile lane
gathers), but they DMA aligned chunks well — so the format is blocks of
``(8, 128)`` (the f32 register tile): each stored block multiplies a
128-long aligned chunk of x into an 8-long chunk of y.

Kernel strategy (``bsr_matvec_pallas``):

  * blocks are grouped by *row groups* of 16 block-rows (= 128 y rows) and
    padded to the max blocks-per-group, giving static shapes;
  * the block column indices ride in scalar memory via
    ``PrefetchScalarGridSpec`` — known before the body runs, so the kernel
    starts the x-chunk DMAs ahead of the compute;
  * x stays in HBM (``memory_space=ANY``); each block's 512-byte x chunk
    is copied into a double-buffered VMEM scratch with
    ``pltpu.make_async_copy`` overlapping the previous block's FMA;
  * accumulation across a group's blocks is branchless: a one-hot
    outer-product FMA into a (16, 8) accumulator (dynamic sublane stores
    are Mosaic-hostile; 128 extra MACs per block are free on the VPU).

Best suited to matrices with clustered nonzeros (FEM, multi-dof nodes,
banded after RCM); for scattered single-entry blocks the 1024-slot padding
dominates and ELL-on-XLA is the better path — ``block_fill`` reports the
achieved density so callers can choose.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import formats as F

__all__ = ["BSR", "bsr_from_coo", "bsr_matvec", "bsr_matvec_pallas",
           "bsr_to_dense", "bsr_operator", "block_fill",
           "BR", "BC", "GROUP"]

BR = 8      # block rows  (f32 sublane tile)
BC = 128    # block cols  (lane tile)
GROUP = 16  # block-rows per kernel grid step (= 128 y rows)


class BSR(NamedTuple):
    """Grouped, padded BSR.

    ``data``: (ngroups, bmax, BR, BC) block values (zero-padded);
    ``block_col``: (ngroups, bmax) int32 column-block index per slot
    (padding slots point at chunk 0 with zero data);
    ``row_in_group``: (ngroups, bmax) int32 in [0, GROUP) — which
    block-row of the group each slot feeds;
    ``shape``: logical (m, n) BEFORE padding; ``nnz``: true nonzeros.
    """
    data: jnp.ndarray
    block_col: jnp.ndarray
    row_in_group: jnp.ndarray
    shape: Tuple[int, int]
    nnz: int


def _reg():
    def flatten(v):
        return (v.data, v.block_col, v.row_in_group), (v.shape, v.nnz)

    def unflatten(aux, children):
        return BSR(*children, aux[0], aux[1])

    jax.tree_util.register_pytree_node(BSR, flatten, unflatten)


_reg()


def bsr_from_coo(coo: F.COO) -> BSR:
    """Pack COO triples into grouped (8, 128) BSR (host-side)."""
    m, n = coo.shape
    rows = np.asarray(coo.row).astype(np.int64)
    cols = np.asarray(coo.col).astype(np.int64)
    vals = np.asarray(coo.data)
    nnz = len(vals)

    mp = (m + BR * GROUP - 1) // (BR * GROUP) * (BR * GROUP)
    npad = (n + BC - 1) // BC * BC
    ngroups = mp // (BR * GROUP)
    nchunks = npad // BC

    brow = rows // BR          # block-row of each nnz
    bcol = cols // BC          # block-col
    group = brow // GROUP
    # Unique (group, brow, bcol) blocks, sorted by group then brow.
    key = (brow * nchunks + bcol)
    uniq, inv = np.unique(key, return_inverse=True)
    u_brow = uniq // nchunks
    u_bcol = uniq % nchunks
    u_group = u_brow // GROUP

    counts = np.bincount(u_group, minlength=ngroups)
    bmax = max(1, int(counts.max()) if len(counts) else 1)

    data = np.zeros((ngroups, bmax, BR, BC), dtype=vals.dtype)
    block_col = np.zeros((ngroups, bmax), dtype=np.int32)
    row_in_group = np.zeros((ngroups, bmax), dtype=np.int32)

    # Slot index of each unique block within its group.
    starts = np.zeros(ngroups + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    slot_of_block = np.arange(len(uniq)) - starts[u_group]

    block_col[u_group, slot_of_block] = u_bcol.astype(np.int32)
    row_in_group[u_group, slot_of_block] = (u_brow % GROUP).astype(np.int32)
    g = u_group[inv]
    s = slot_of_block[inv]
    # add.at: duplicate COO entries accumulate (as in to_dense).
    np.add.at(data, (g, s, rows % BR, cols % BC), vals)

    return BSR(jnp.asarray(data), jnp.asarray(block_col),
               jnp.asarray(row_in_group), (m, n), nnz)


def block_fill(bsr: BSR) -> float:
    """Fraction of stored block slots holding true nonzeros."""
    total_slots = int(np.prod(bsr.data.shape))
    return bsr.nnz / max(total_slots, 1)


def bsr_to_dense(bsr: BSR):
    ngroups, bmax, _, _ = bsr.data.shape
    m, n = bsr.shape
    mp = ngroups * GROUP * BR
    npad = (n + BC - 1) // BC * BC
    d = np.zeros((mp, npad), dtype=bsr.data.dtype)
    data = np.asarray(bsr.data)
    bc = np.asarray(bsr.block_col)
    rg = np.asarray(bsr.row_in_group)
    for g in range(ngroups):
        for j in range(bmax):
            r0 = (g * GROUP + rg[g, j]) * BR
            c0 = bc[g, j] * BC
            d[r0:r0 + BR, c0:c0 + BC] += data[g, j]
    return d[:m, :n]


def bsr_matvec(bsr: BSR, x):
    """XLA reference path: one-hot-free einsum over gathered chunks."""
    m, n = bsr.shape
    npad = (n + BC - 1) // BC * BC
    xp = jnp.pad(x, (0, npad - n))
    chunks = xp.reshape(-1, BC)                       # (nchunks, BC)
    xg = chunks[bsr.block_col]                        # (ngroups, bmax, BC)
    prod = jnp.einsum("gjrc,gjc->gjr", bsr.data, xg)  # (ngroups, bmax, BR)
    ngroups, bmax = bsr.block_col.shape
    y = jnp.zeros((ngroups, GROUP, BR), dtype=prod.dtype)
    gidx = jnp.broadcast_to(jnp.arange(ngroups)[:, None], (ngroups, bmax))
    y = y.at[gidx, bsr.row_in_group].add(prod)
    return y.reshape(-1)[:m]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bsr_matvec_call(data, block_col, row_in_group, x, interpret):
    ngroups, bmax, _, _ = data.shape
    nrowsp = ngroups * GROUP * BR
    nchunks = x.shape[0] // BC
    x2 = x.reshape(nchunks, BC)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec((1, bmax, BR, BC), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec((1, GROUP, BR), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, BC), data.dtype),     # double-buffered chunk
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel2(bc_smem, rg_smem, data_ref, x_hbm, y_ref, scratch, sems):
        g = pl.program_id(0)
        acc = jnp.zeros((GROUP, BR), dtype=data_ref.dtype)

        def dma(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(bc_smem[g, j], 1), :],
                scratch.at[slot], sems.at[slot])

        dma(0, 0).start()

        def body(j, acc):
            slot = j % 2

            @pl.when(j + 1 < bmax)
            def _():
                dma((j + 1) % 2, j + 1).start()

            dma(slot, j).wait()
            xc = scratch[slot, 0]                        # (BC,)
            prod = jnp.sum(data_ref[0, j] * xc[None, :], axis=1)  # (BR,)
            rb = rg_smem[g, j]
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
                      == rb).astype(acc.dtype)
            return acc + onehot * prod[None, :]

        acc = jax.lax.fori_loop(0, bmax, body, acc)
        y_ref[0] = acc

    y = pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((ngroups, GROUP, BR), data.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_col, row_in_group, data, x2)
    return y.reshape(nrowsp)


def bsr_matvec_pallas(bsr: BSR, x, interpret: bool = False):
    """``y = A @ x`` via the scalar-prefetch DMA kernel.

    ``x`` must be padded to the BC multiple (``ceil(n/128)*128``); the
    returned y has the padded row count ``ngroups*GROUP*BR`` — slice to
    ``bsr.shape[0]``.
    """
    return _bsr_matvec_call(bsr.data, bsr.block_col, bsr.row_in_group,
                            x, bool(interpret))


def bsr_operator(source, shape=None, symmetric=False, use_pallas=None):
    """Wrap a matrix as a :class:`~pykrylov_tpu.ops.LinearOperator` whose
    matvec is the BSR kernel.

    ``source`` may be a :class:`BSR`, a COO container, COO triples
    ``(vals, rows, cols, shape)``, or a dense array.  The transpose
    product uses a prebuilt BSR of A^T (runtime sparse transposition is
    hostile to static shapes).  ``use_pallas=None`` auto-selects the
    Pallas DMA kernel on TPU and the XLA einsum path elsewhere.

    The operator acts on the *logical* (m, n) shapes: inputs are padded
    and outputs trimmed internally.
    """
    from ..ops.base import LinearOperator

    if isinstance(source, BSR):
        bsr = source
        coo = None
        if not symmetric:
            raise ValueError("pass COO/dense input for unsymmetric "
                             "operators (the transpose container must be "
                             "built from the raw triples)")
    else:
        if isinstance(source, F.COO):
            coo = source
        elif isinstance(source, tuple) and len(source) == 4:
            vals, rows, cols, shp = source
            coo = F.coo_from_arrays(vals, rows, cols, shp)
        else:
            a = np.asarray(source)
            rr, cc = np.nonzero(a)
            coo = F.coo_from_arrays(a[rr, cc], rr, cc, a.shape)
        bsr = bsr_from_coo(coo)

    m, n = bsr.shape
    bsr_t = None if symmetric else bsr_from_coo(F.transpose_coo(coo))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    use_pallas = bool(use_pallas)

    def _apply(b, x, n_in, n_out):
        npad = (n_in + BC - 1) // BC * BC
        xp = jnp.zeros(npad, dtype=x.dtype).at[:n_in].set(x)
        if use_pallas:
            y = bsr_matvec_pallas(b, xp)
        else:
            y = bsr_matvec(b, xp[:n_in])
            return y
        return y[:n_out]

    def mv(params, x):
        return _apply(params[0], x, n, m)

    def rmv(params, x):
        b = params[0] if symmetric else params[1]
        return _apply(b, x, m, n)

    dtype = bsr.data.dtype
    op = LinearOperator(n, m, matvec=mv, matvec_transp=rmv,
                        params=(bsr, bsr_t), _takes_params=True,
                        symmetric=symmetric,
                        hermitian=symmetric and not np.issubdtype(
                            dtype, np.complexfloating),
                        dtype=dtype)
    op.block_fill = block_fill(bsr)
    return op
