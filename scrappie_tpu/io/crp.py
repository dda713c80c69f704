"""Reader/writer for the reference's `.crp` golden-matrix fixtures.

Format (ref: src/test/scrappie_util.c:22-134): a "nr<TAB>nc" header line
followed by one line per column of tab-separated C99 hex floats ("%a").
We return matrices as [nc, nr] float32 arrays (time-major), matching the
numpy reader in the reference test suite (src/test/crp.py:7-15).
"""

from __future__ import annotations

import numpy as np


def read_crp(filename) -> np.ndarray:
    with open(filename, "r") as fh:
        nr, nc = (int(tok) for tok in fh.readline().split())
        mat = np.zeros((nc, nr), dtype=np.float32)
        for col in range(nc):
            row = [float.fromhex(tok) for tok in fh.readline().split()]
            if len(row) != nr:
                raise ValueError(
                    f"{filename}: column {col} has {len(row)} entries, expected {nr}"
                )
            mat[col] = row
    return mat


def write_crp(filename, mat: np.ndarray) -> None:
    """Write a [nc, nr] array as a .crp file readable by the reference tools."""
    mat = np.asarray(mat, dtype=np.float32)
    nc, nr = mat.shape
    with open(filename, "w") as fh:
        fh.write(f"{nr}\t{nc}\n")
        for col in range(nc):
            fh.write("\t".join(float(v).hex() for v in mat[col]))
            fh.write("\n")
