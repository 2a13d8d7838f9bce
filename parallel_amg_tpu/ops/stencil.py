"""Stencil (ND-DIA) format — variable-coefficient stencils on regular grids.

The structured-path workhorse (SURVEY.md §7 hard-part 4).  Key measurement
behind the design: composing a 1D-flattened DIA matvec with grid transfers
makes XLA scalarize the fused index arithmetic (~1.6 ms for what should be
~0.1 ms on v5e); keeping every operand in its natural N-D grid layout keeps
all ops vectorizable — matvec is Σ_d W_d ⊙ shift_d(x) with N-D pad +
dynamic_slice, and the whole V-cycle composes at memory speed (~0.03-0.08 ms
per op at 128³).

Vectors on the structured path are N-D grids; the hierarchy converts at the
user API boundary only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class Stencil:
    """Variable-coefficient stencil operator on an N-D grid.

    Attributes:
      weights: (D, *dims) — weights[d, p] multiplies x[p + offsets[d]]
               (zero where the neighbor falls outside the grid).
      offsets: static tuple of D N-D integer tuples.
      dims: static grid shape.
    """

    def __init__(self, weights, offsets, dims):
        self.weights = weights
        self.offsets = tuple(tuple(int(c) for c in o) for o in offsets)
        self.dims = tuple(int(d) for d in dims)

    def tree_flatten(self):
        return (self.weights,), (self.offsets, self.dims)

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, dims = aux
        return cls(children[0], offsets, dims)

    # -- properties -------------------------------------------------------
    @property
    def n(self) -> int:
        return int(np.prod(self.dims))

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def n_points(self) -> int:
        return len(self.offsets)

    @property
    def nnz(self):
        return jnp.sum(self.weights != 0)

    @property
    def n_rows(self) -> int:
        return self.n

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_csr(cls, csr, dims, dtype=None, max_points: int = 160):
        """Build from host CSR given the grid dims (lexicographic order).
        Returns None if the matrix has more than max_points distinct N-D
        offsets (not stencil-structured)."""
        dtype = dtype or jnp.float32
        dims = tuple(int(d) for d in dims)
        n = int(np.prod(dims))
        if csr.shape != (n, n):
            return None
        rows = np.repeat(np.arange(n), csr.row_nnz)
        cols = csr.indices
        rc = np.stack(np.unravel_index(rows, dims), 1)  # (nnz, nd)
        cc = np.stack(np.unravel_index(cols, dims), 1)
        off = cc - rc  # (nnz, nd)
        uoff, inv = np.unique(off, axis=0, return_inverse=True)
        if len(uoff) > max_points:
            return None
        W = np.zeros((len(uoff), n), dtype=np.float64)
        W[inv, rows] = csr.data
        return cls(
            weights=jnp.asarray(W.reshape((len(uoff),) + dims), dtype=dtype),
            offsets=tuple(tuple(int(c) for c in o) for o in uoff),
            dims=dims,
        )

    def to_csr(self):
        from parallel_amg_tpu.ops.coo import COO

        W = np.asarray(self.weights).reshape(self.n_points, -1)
        nd = len(self.dims)
        coords = np.stack(
            np.unravel_index(np.arange(self.n), self.dims), 1
        )  # (n, nd)
        rs, cs, vs = [], [], []
        for d, off in enumerate(self.offsets):
            nbr = coords + np.asarray(off)
            ok = np.all((nbr >= 0) & (nbr < np.asarray(self.dims)), axis=1)
            ok &= W[d] != 0
            rows = np.flatnonzero(ok)
            cols = np.ravel_multi_index(tuple(nbr[ok].T), self.dims)
            rs.append(rows)
            cs.append(cols)
            vs.append(W[d, rows])
        return COO(
            np.concatenate(rs), np.concatenate(cs), np.concatenate(vs),
            (self.n, self.n),
        ).to_csr()

    # -- device ops (N-D in, N-D out) --------------------------------------
    def matvec(self, x):
        """y = A @ x for an N-D grid x of shape dims."""
        pads = [
            (max(0, -min(o[i] for o in self.offsets)),
             max(0, max(o[i] for o in self.offsets)))
            for i in range(len(self.dims))
        ]
        xp = jnp.pad(x, pads)
        y = jnp.zeros_like(x)
        for d, off in enumerate(self.offsets):
            start = tuple(pads[i][0] + off[i] for i in range(len(self.dims)))
            y = y + self.weights[d] * jax.lax.dynamic_slice(xp, start, self.dims)
        return y

    def diagonal(self):
        """Main diagonal as an N-D grid."""
        zero = tuple(0 for _ in self.dims)
        if zero in self.offsets:
            return self.weights[self.offsets.index(zero)]
        return jnp.zeros(self.dims, self.weights.dtype)

    def __matmul__(self, x):
        return self.matvec(x)
