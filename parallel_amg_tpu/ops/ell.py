"""ELL (fixed-width padded-row) format — the TPU compute-path sparse view.

Why ELL on TPU (SURVEY.md §7 hard-part 4): CSR's ragged rows force serial
gathers; ELL pads every row to a common width W so the value/column planes
are dense ``(R, W)`` arrays.  SpMV becomes one dense gather + one rowwise
reduction — shapes are static, XLA tiles it onto the VPU, and the Pallas
kernels (ops/pallas) stream the same planes with explicit DMA.

Padding convention: col=0, val=0 (SpMV-safe without masks); ``row_nnz``
carries the true lengths for algorithms that need masks.

Registered as a pytree so it can flow through jit/shard_map/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class ELL:
    """Device-side padded-row sparse matrix.

    Attributes:
      cols: (R, W) int32 — column index of each stored entry (0 for padding).
      vals: (R, W) float — value of each stored entry (0 for padding).
      row_nnz: (R,) int32 — true number of stored entries per row.
      shape: (n_rows, n_cols) static.
    """

    def __init__(self, cols, vals, row_nnz, shape):
        self.cols = cols
        self.vals = vals
        self.row_nnz = row_nnz
        self.shape = tuple(int(s) for s in shape)

    # -- pytree protocol --------------------------------------------------
    def tree_flatten(self):
        return (self.cols, self.vals, self.row_nnz), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        cols, vals, row_nnz = children
        return cls(cols, vals, row_nnz, shape)

    # -- properties -------------------------------------------------------
    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def width(self) -> int:
        return int(self.cols.shape[1])

    @property
    def nnz(self):
        return jnp.sum(self.row_nnz)

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_csr(cls, csr, width: int | None = None, dtype=None) -> "ELL":
        """Build the padded device view from a host CSR (numpy, runs once)."""
        dtype = dtype or jnp.float32
        n_rows, n_cols = csr.shape
        row_nnz = csr.row_nnz
        w = int(width) if width is not None else (int(row_nnz.max()) if n_rows else 1)
        w = max(w, 1)
        if n_rows and int(row_nnz.max()) > w:
            raise ValueError(f"width {w} < max row nnz {int(row_nnz.max())}")
        cols = np.zeros((n_rows, w), dtype=np.int32)
        vals = np.zeros((n_rows, w), dtype=np.float64)
        # scatter CSR entries into the padded planes
        rows = np.repeat(np.arange(n_rows), row_nnz)
        offs = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], row_nnz)
        cols[rows, offs] = csr.indices
        vals[rows, offs] = csr.data
        return cls(
            cols=jnp.asarray(cols),
            vals=jnp.asarray(vals, dtype=dtype),
            row_nnz=jnp.asarray(row_nnz, dtype=jnp.int32),
            shape=(n_rows, n_cols),
        )

    # -- host round-trip (tests) ------------------------------------------
    def to_csr(self):
        from parallel_amg_tpu.ops.coo import COO

        cols = np.asarray(self.cols)
        vals = np.asarray(self.vals)
        row_nnz = np.asarray(self.row_nnz)
        mask = np.arange(self.width)[None, :] < row_nnz[:, None]
        rows = np.broadcast_to(np.arange(self.n_rows)[:, None], cols.shape)
        return COO(rows[mask], cols[mask], vals[mask], self.shape).to_csr()

    # -- device ops -------------------------------------------------------
    def mask(self):
        """(R, W) bool — True where an entry is stored (not padding)."""
        w_iota = jax.lax.broadcasted_iota(jnp.int32, self.cols.shape, 1)
        return w_iota < self.row_nnz[:, None]

    def matvec(self, x):
        """y = A @ x — gather + rowwise reduce; XLA reference path.

        The padding entries contribute vals=0 * x[0] = 0 so no mask needed.
        """
        return jnp.sum(self.vals * jnp.take(x, self.cols, axis=0), axis=1)

    def matmat(self, X):
        """Y = A @ X for dense (n_cols, k) X — multi-RHS SpMM reference."""
        return jnp.einsum(
            "rw,rwk->rk", self.vals, jnp.take(X, self.cols, axis=0)
        )

    def diagonal(self):
        """Main-diagonal extraction (missing entries → 0)."""
        r_iota = jax.lax.broadcasted_iota(jnp.int32, self.cols.shape, 0)
        hit = (self.cols == r_iota) & self.mask()
        return jnp.sum(jnp.where(hit, self.vals, 0.0), axis=1)

    def scale_rows(self, d):
        """diag(d) @ A."""
        return ELL(self.cols, self.vals * d[:, None], self.row_nnz, self.shape)

    def __matmul__(self, x):
        if x.ndim == 1:
            return self.matvec(x)
        return self.matmat(x)
