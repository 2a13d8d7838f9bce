"""DIA (diagonal) sparse format — the structured-stencil fast path.

TPU rationale (SURVEY.md §7 hard-part 4): generic gathers serialize on TPU
(measured ~1 GB/s), but stencil matrices (Poisson 5/7-point, anisotropic FD —
every acceptance config's finest level, BASELINE.json:7-11) are *banded*:
``y = Σ_d diag_d ⊙ shift(x, off_d)``.  Shifted reads are contiguous vector
loads that XLA fuses into a single streaming pass — measured ≥90% of memcpy
speed-of-light on a v5e chip (vs 0.2% for the gather form).

The matvec uses pad + static ``dynamic_slice`` per diagonal; offsets are
static metadata (pytree aux), so jit sees a fixed expression tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class DIA:
    """Diagonal-storage sparse matrix (square).

    Attributes:
      diags: (D, n) float — diags[d, r] = A[r, r + offsets[d]] (0 outside).
      offsets: static tuple of D ints, sorted.
      shape: (n, n) static.
    """

    def __init__(self, diags, offsets, shape):
        self.diags = diags
        self.offsets = tuple(int(o) for o in offsets)
        self.shape = tuple(int(s) for s in shape)

    def tree_flatten(self):
        return (self.diags,), (self.offsets, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, shape = aux
        return cls(children[0], offsets, shape)

    # -- properties -------------------------------------------------------
    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def n_diags(self) -> int:
        return len(self.offsets)

    @property
    def nnz(self):
        return jnp.sum(self.diags != 0)

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_csr(cls, csr, dtype=None, max_diags: int = 64):
        """Build from host CSR; returns None if the matrix has more than
        max_diags distinct diagonals (caller falls back to another format)."""
        dtype = dtype or jnp.float32
        n, m = csr.shape
        if n != m:
            return None
        rows = np.repeat(np.arange(n), csr.row_nnz)
        offs = csr.indices - rows
        uoffs = np.unique(offs)
        if len(uoffs) > max_diags:
            return None
        omap = {int(o): i for i, o in enumerate(uoffs)}
        diags = np.zeros((len(uoffs), n), dtype=np.float64)
        diags[[omap[int(o)] for o in offs], rows] = csr.data
        return cls(
            diags=jnp.asarray(diags, dtype=dtype),
            offsets=tuple(int(o) for o in uoffs),
            shape=(n, m),
        )

    def to_csr(self):
        from parallel_amg_tpu.ops.coo import COO

        n = self.n_rows
        diags = np.asarray(self.diags)
        rs, cs, vs = [], [], []
        for d, off in enumerate(self.offsets):
            r = np.arange(max(0, -off), min(n, n - off))
            keep = diags[d, r] != 0
            rs.append(r[keep])
            cs.append(r[keep] + off)
            vs.append(diags[d, r[keep]])
        return COO(
            np.concatenate(rs), np.concatenate(cs), np.concatenate(vs), self.shape
        ).to_csr()

    # -- device ops -------------------------------------------------------
    def matvec(self, x):
        """y = A @ x via shifted contiguous reads (one fused streaming pass)."""
        n = self.n_rows
        lo = max(0, -min(self.offsets))
        hi = max(0, max(self.offsets))
        xp = jnp.pad(x, (lo, hi))
        y = jnp.zeros_like(x)
        for d, off in enumerate(self.offsets):
            y = y + self.diags[d] * jax.lax.dynamic_slice(xp, (lo + off,), (n,))
        return y

    def matmat(self, X):
        """Y = A @ X for dense (n, k) X — k shifted passes share the diags."""
        n = self.n_rows
        lo = max(0, -min(self.offsets))
        hi = max(0, max(self.offsets))
        Xp = jnp.pad(X, ((lo, hi), (0, 0)))
        Y = jnp.zeros_like(X)
        for d, off in enumerate(self.offsets):
            Y = Y + self.diags[d][:, None] * jax.lax.dynamic_slice(
                Xp, (lo + off, 0), (n, X.shape[1])
            )
        return Y

    def diagonal(self):
        if 0 in self.offsets:
            return self.diags[self.offsets.index(0)]
        return jnp.zeros((self.n_rows,), self.diags.dtype)

    def __matmul__(self, x):
        if x.ndim == 1:
            return self.matvec(x)
        return self.matmat(x)
