"""Bundled benchmark matrices.

The reference bundles three MatrixMarket files used by its docs/benchmarks
(``/root/reference/examples/1138bus.mtx``, ``jpwh_991.mtx``, ``GD97_b.mtx``
— see BASELINE.md).  This build stores them as compressed ``.npz`` COO
archives under ``data/`` (generated once by ``tools/convert_reference_mtx.py``
from the public Harwell-Boeing/SuiteSparse matrices) and falls back to
parsing a ``.mtx`` file if an archive is missing.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["BUNDLED", "load_bundled", "data_dir"]

BUNDLED = {
    # name: (shape, symmetric, description)
    "1138bus": ((1138, 1138), True,
                "SPD power-system admittance matrix, 2596 stored nnz"),
    "jpwh_991": ((991, 991), False,
                 "nonsymmetric circuit-physics matrix, 6027 nnz"),
    "GD97_b": ((47, 47), True, "weighted graph"),
}


def data_dir():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "data")


def load_bundled(name, dtype=np.float64):
    """Load a bundled matrix as expanded COO triples.

    Returns ``(vals, rows, cols, shape)``.
    """
    if name not in BUNDLED:
        raise KeyError("unknown bundled matrix %r (have %s)"
                       % (name, sorted(BUNDLED)))
    npz = os.path.join(data_dir(), name + ".npz")
    if os.path.exists(npz):
        z = np.load(npz)
        return (z["vals"].astype(dtype), z["rows"], z["cols"],
                tuple(int(v) for v in z["shape"]))
    # Fallback: parse an .mtx next to the data dir or in the reference tree.
    for cand in (os.path.join(data_dir(), name + ".mtx"),
                 "/root/reference/examples/" + name + ".mtx"):
        if os.path.exists(cand):
            from .matrix_market import mm_to_coo
            return mm_to_coo(cand, dtype=dtype)
    raise FileNotFoundError(
        "bundled matrix %r not found; run tools/convert_reference_mtx.py"
        % name)
