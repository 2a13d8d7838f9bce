"""CSR sparse format — canonical host-side interchange container.

Role in the framework (SURVEY.md §2.2): CSR is where matrices are *built and
analyzed* (assembly, strength, splitting on the host path); the TPU compute
path consumes the fixed-width :class:`~parallel_amg_tpu.ops.ell.ELL` (or BSR)
view derived from CSR.  The reference stack's analog is Julia
``SparseArrays.SparseMatrixCSC`` (SURVEY.md §1 L4).

Host arrays are numpy; conversion helpers hand static-shape padded device
arrays to jit'ed code exactly once per matrix.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CSR:
    """Host-side CSR matrix (numpy arrays, int64 index space)."""

    indptr: np.ndarray  # (n_rows + 1,)
    indices: np.ndarray  # (nnz,) column indices, sorted within each row
    data: np.ndarray  # (nnz,)
    shape: tuple  # (n_rows, n_cols)

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_numpy(cls, indptr, indices, data, shape) -> "CSR":
        return cls(
            indptr=np.asarray(indptr, dtype=np.int64),
            indices=np.asarray(indices, dtype=np.int64),
            data=np.asarray(data),
            shape=tuple(shape),
        )

    @classmethod
    def from_scipy(cls, mat) -> "CSR":
        m = mat.tocsr()
        m.sort_indices()
        return cls.from_numpy(m.indptr, m.indices, m.data, m.shape)

    @classmethod
    def from_dense(cls, dense: np.ndarray) -> "CSR":
        dense = np.asarray(dense)
        rows, cols = np.nonzero(dense)
        from parallel_amg_tpu.ops.coo import COO

        return COO(rows, cols, dense[rows, cols], dense.shape).to_csr()

    @classmethod
    def eye(cls, n: int, dtype=np.float64) -> "CSR":
        return cls.from_numpy(
            np.arange(n + 1), np.arange(n), np.ones(n, dtype=dtype), (n, n)
        )

    # -- basic properties -------------------------------------------------
    @property
    def nnz(self) -> int:
        return int(self.indices.size)

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def row_nnz(self) -> np.ndarray:
        return np.diff(self.indptr)

    @property
    def max_row_nnz(self) -> int:
        return int(self.row_nnz.max()) if self.n_rows else 0

    # -- host ops ---------------------------------------------------------
    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix(
            (self.data, self.indices, self.indptr), shape=self.shape
        )

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.data.dtype)
        for i in range(self.n_rows):
            lo, hi = self.indptr[i], self.indptr[i + 1]
            out[i, self.indices[lo:hi]] += self.data[lo:hi]
        return out

    def diagonal(self) -> np.ndarray:
        """Extract the main diagonal (missing entries → 0)."""
        d = np.zeros(self.n_rows, dtype=self.data.dtype)
        for_rows = np.repeat(np.arange(self.n_rows), self.row_nnz)
        hit = for_rows == self.indices
        d[for_rows[hit]] = self.data[hit]
        return d

    def matvec(self, x: np.ndarray) -> np.ndarray:
        """Host SpMV oracle: y = A @ x (numpy, segment-sum)."""
        rows = np.repeat(np.arange(self.n_rows), self.row_nnz)
        y = np.zeros(self.n_rows, dtype=np.result_type(self.data, x))
        np.add.at(y, rows, self.data * x[self.indices])
        return y

    def transpose(self) -> "CSR":
        """R = Aᵀ in CSR, host-side (counting sort over columns)."""
        rows = np.repeat(np.arange(self.n_rows), self.row_nnz)
        order = np.lexsort((rows, self.indices))
        t_indices = rows[order]
        t_data = self.data[order]
        t_indptr = np.zeros(self.n_cols + 1, dtype=np.int64)
        np.add.at(t_indptr, self.indices + 1, 1)
        t_indptr = np.cumsum(t_indptr)
        return CSR.from_numpy(
            t_indptr, t_indices, t_data, (self.n_cols, self.n_rows)
        )

    def matmat(self, other: "CSR") -> "CSR":
        """Host SpGEMM C = A @ B (scipy backend; used only in the host setup
        path and test oracles — the on-device Galerkin path lives in
        parallel_amg_tpu.amg.spgemm)."""
        return CSR.from_scipy(self.to_scipy() @ other.to_scipy())

    def prune(self, tol: float = 0.0) -> "CSR":
        """Drop stored entries with |a_ij| <= tol."""
        keep = np.abs(self.data) > tol
        new_row_nnz = np.zeros(self.n_rows, dtype=np.int64)
        rows = np.repeat(np.arange(self.n_rows), self.row_nnz)
        np.add.at(new_row_nnz, rows[keep], 1)
        indptr = np.concatenate([[0], np.cumsum(new_row_nnz)])
        return CSR.from_numpy(
            indptr, self.indices[keep], self.data[keep], self.shape
        )

    # -- device view ------------------------------------------------------
    def to_ell(self, width: int | None = None, dtype=None):
        """Fixed-width padded-row (ELL) device view of this matrix.

        Padding entries get col=0 / val=0, which makes SpMV padding-safe
        without masking; `row_nnz` is carried for mask-needing algorithms.
        """
        from parallel_amg_tpu.ops.ell import ELL

        return ELL.from_csr(self, width=width, dtype=dtype)
