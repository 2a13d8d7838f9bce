"""COO (triplet) sparse format — assembly-time container.

The reference stack assembles distributed matrices from (i, j, v) triplets via
PartitionedArrays' ``psparse`` (SURVEY.md §2.1 "COO assembly"); this is the
local building block for that path.  COO is a host-friendly format: problems
generators emit COO, we sort/dedup to CSR once, and the device never sees it.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class COO:
    """Host-side triplet matrix. Duplicate (i, j) entries are summed on
    conversion to CSR (finite-element style assembly semantics)."""

    row: np.ndarray  # (nnz,) int
    col: np.ndarray  # (nnz,) int
    val: np.ndarray  # (nnz,) float
    shape: tuple  # (n_rows, n_cols)

    def __post_init__(self):
        self.row = np.asarray(self.row, dtype=np.int64)
        self.col = np.asarray(self.col, dtype=np.int64)
        self.val = np.asarray(self.val)
        if not (self.row.shape == self.col.shape == self.val.shape):
            raise ValueError("row/col/val must have identical shapes")

    @property
    def nnz(self) -> int:
        return int(self.row.size)

    def to_csr(self):
        """Sort by (row, col), sum duplicates, build CSR. Pure numpy."""
        from parallel_amg_tpu.ops.csr import CSR

        n_rows, n_cols = self.shape
        order = np.lexsort((self.col, self.row))
        r, c, v = self.row[order], self.col[order], self.val[order]
        if r.size:
            # collapse duplicates: first occurrence of each (r, c) pair
            first = np.ones(r.size, dtype=bool)
            first[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
            group = np.cumsum(first) - 1
            v_sum = np.zeros(int(group[-1]) + 1, dtype=v.dtype)
            np.add.at(v_sum, group, v)
            r, c, v = r[first], c[first], v_sum
        indptr = np.zeros(n_rows + 1, dtype=np.int64)
        np.add.at(indptr, r + 1, 1)
        indptr = np.cumsum(indptr)
        return CSR.from_numpy(indptr, c, v, (n_rows, n_cols))

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.val.dtype)
        np.add.at(out, (self.row, self.col), self.val)
        return out
