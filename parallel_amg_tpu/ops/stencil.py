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

    def matmat(self, X):
        """Y = A @ X for multi-RHS X of shape (*dims, k) — SpMM: the k
        shifted passes share one padded buffer (BASELINE.json:5 SpMM)."""
        k = X.shape[-1]
        pads = [
            (max(0, -min(o[i] for o in self.offsets)),
             max(0, max(o[i] for o in self.offsets)))
            for i in range(len(self.dims))
        ] + [(0, 0)]
        Xp = jnp.pad(X, pads)
        Y = jnp.zeros_like(X)
        for d, off in enumerate(self.offsets):
            start = tuple(pads[i][0] + off[i] for i in range(len(self.dims)))
            Y = Y + self.weights[d][..., None] * jax.lax.dynamic_slice(
                Xp, start + (0,), self.dims + (k,)
            )
        return Y

    def diagonal(self):
        """Main diagonal as an N-D grid."""
        zero = tuple(0 for _ in self.dims)
        if zero in self.offsets:
            return self.weights[self.offsets.index(zero)]
        return jnp.zeros(self.dims, self.weights.dtype)

    def __matmul__(self, x):
        return self.matvec(x)

    # -- stencil algebra (on-device setup path) ----------------------------
    def shifted_plane(self, d, off):
        """weights[d] translated by `off`: value that row p+off sees from
        plane d of this operator (zeros shifted in at the boundary)."""
        pads = [(max(0, off[i]), max(0, -off[i])) for i in range(len(self.dims))]
        wp = jnp.pad(self.weights[d], pads)
        start = tuple(max(0, -off[i]) for i in range(len(self.dims)))
        return jax.lax.dynamic_slice(wp, start, self.dims)

    def scale_rows(self, s):
        """diag(s) @ A — elementwise row scaling of every plane."""
        return Stencil(self.weights * s[None], self.offsets, self.dims)

    def scale_cols(self, s):
        """A @ diag(s): plane d scales by s shifted by its offset."""
        planes = []
        for d, off in enumerate(self.offsets):
            pads = [(max(0, -off[i]), max(0, off[i]))
                    for i in range(len(self.dims))]
            sp = jnp.pad(s, pads)
            start = tuple(max(0, off[i]) for i in range(len(self.dims)))
            s_shift = jax.lax.dynamic_slice(sp, start, self.dims)
            planes.append(self.weights[d] * s_shift)
        return Stencil(jnp.stack(planes), self.offsets, self.dims)

    def add(self, other, alpha=1.0):
        """A + alpha·B for stencils on the same grid (offset union)."""
        offs = sorted(set(self.offsets) | set(other.offsets))
        planes = []
        for o in offs:
            w = jnp.zeros(self.dims, self.weights.dtype)
            if o in self.offsets:
                w = w + self.weights[self.offsets.index(o)]
            if o in other.offsets:
                w = w + alpha * other.weights[other.offsets.index(o)]
            planes.append(w)
        return Stencil(jnp.stack(planes), tuple(offs), self.dims)

    def matmul(self, other: "Stencil") -> "Stencil":
        """C = A @ B in closed form: C[o1+o2](p) = Σ A[o1](p)·B[o2](p+o1).

        Pure N-D shifts + FMA — the stencil-structured SpGEMM that replaces
        the reference stack's general sparse×sparse in the Galerkin setup
        (SURVEY.md §2.2 SpGEMM, §7 hard-part 1) on regular grids.

        Batched form (compile-time friendly): per A-offset, ALL B planes are
        shifted in one pad+slice, and the offset bucketing is a static
        one-hot matmul (MXU) instead of D_A·D_B separate adds.
        """
        nd = len(self.dims)
        DA = self.n_points
        DB = other.n_points
        out_offs = sorted({
            tuple(o1[i] + o2[i] for i in range(nd))
            for o1 in self.offsets for o2 in other.offsets
        })
        oidx = {o: i for i, o in enumerate(out_offs)}
        n_out = len(out_offs)
        n = int(np.prod(self.dims))
        # pad B once by the max |o1| per axis; per A-offset one STATIC
        # slice (lax.slice with literal bounds — a vmapped dynamic_slice
        # lowered to a gather whose TPU compile took minutes)
        r = [max(abs(o1[i]) for o1 in self.offsets) for i in range(nd)]
        wp = jnp.pad(other.weights,
                     [(0, 0)] + [(r[i], r[i]) for i in range(nd)])
        acc = jnp.zeros((n_out, n), self.weights.dtype)
        for d1, o1 in enumerate(self.offsets):
            start = [0] + [r[i] + o1[i] for i in range(nd)]
            limit = [DB] + [start[1 + i] + self.dims[i] for i in range(nd)]
            shifted = jax.lax.slice(wp, start, limit)
            terms = (self.weights[d1][None] * shifted).reshape(DB, n)
            # bucket ids as a small int constant; the one-hot matrix is
            # built on device (a dense constant at deep levels exceeded the
            # remote-compile request limit)
            ids = np.asarray(
                [oidx[tuple(o1[i] + o2[i] for i in range(nd))]
                 for o2 in other.offsets], np.int32)
            onehot = (jnp.asarray(ids)[None, :]
                      == jnp.arange(n_out)[:, None]).astype(self.weights.dtype)
            acc = acc + onehot @ terms
        return Stencil(acc.reshape((n_out,) + self.dims), tuple(out_offs),
                       self.dims)

    def prune(self, keep_mask):
        """Host-driven plane pruning: keep_mask is a static bool sequence."""
        keep = [d for d, k in enumerate(keep_mask) if k]
        return Stencil(self.weights[jnp.asarray(keep)],
                       tuple(self.offsets[d] for d in keep), self.dims)
