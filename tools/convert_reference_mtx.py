#!/usr/bin/env python
"""Convert the reference's bundled MatrixMarket files to .npz COO archives.

The archives keep the *stored* (unexpanded) triples plus the symmetry tag so
loaders can decide on expansion; shape is stored explicitly.  Run once:

    python tools/convert_reference_mtx.py [src_dir]

Default src_dir is /root/reference/examples.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pykrylov_tpu.io.matrix_market import read_matrix_market  # noqa: E402


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples"
    dst = os.path.join(os.path.dirname(__file__), "..", "data")
    os.makedirs(dst, exist_ok=True)
    for name in ("1138bus", "jpwh_991", "GD97_b"):
        path = os.path.join(src, name + ".mtx")
        if not os.path.exists(path):
            print("skip (missing):", path)
            continue
        # Store EXPANDED triples: compute formats want the full pattern.
        vals, rows, cols, shape, info = read_matrix_market(
            path, expand_symmetric=True)
        out = os.path.join(dst, name + ".npz")
        np.savez_compressed(out, vals=vals, rows=rows.astype(np.int32),
                            cols=cols.astype(np.int32),
                            shape=np.asarray(shape, np.int64),
                            symmetry=np.asarray(info.symmetry))
        print("wrote %s  shape=%s nnz(expanded)=%d symmetry=%s"
              % (out, shape, len(vals), info.symmetry))


if __name__ == "__main__":
    main()
