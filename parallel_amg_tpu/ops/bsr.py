"""BSR (block sparse row) format — small dense blocks for multi-DOF nodes.

Mandated alongside CSR/COO (BASELINE.json:5).  Use case: vector PDEs where
each grid node carries `bs` unknowns — the natural AMG unit is then a bs×bs
dense block, and SpMV becomes batched small matmuls (einsum → VPU/MXU)
instead of scalar gathers, amortizing the index traffic by bs².

Layout: block-ELL — per block-row a fixed (padded) number of blocks:
  bcols (RB, WB) int32 block-column ids, vals (RB, WB, bs, bs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class BSR:
    """Block-ELL sparse matrix with square bs×bs blocks."""

    def __init__(self, bcols, vals, brow_nnz, shape, bs):
        self.bcols = bcols      # (RB, WB) int32
        self.vals = vals        # (RB, WB, bs, bs)
        self.brow_nnz = brow_nnz  # (RB,) int32
        self.shape = tuple(int(s) for s in shape)  # element shape (n, m)
        self.bs = int(bs)

    def tree_flatten(self):
        return ((self.bcols, self.vals, self.brow_nnz),
                (self.shape, self.bs))

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, bs = aux
        return cls(*children, shape, bs)

    # -- properties -------------------------------------------------------
    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_block_rows(self) -> int:
        return self.bcols.shape[0]

    @property
    def width(self) -> int:
        return self.bcols.shape[1]

    @property
    def nnz(self):
        return jnp.sum(jnp.any(self.vals != 0, axis=(2, 3))) * self.bs ** 2

    # -- construction -----------------------------------------------------
    @classmethod
    def from_csr(cls, csr, bs: int, dtype=None) -> "BSR":
        """Build from host CSR (rows/cols padded up to bs multiples)."""
        dtype = dtype or jnp.float32
        n, m = csr.shape
        RB = -(-n // bs)
        MB = -(-m // bs)
        rows = np.repeat(np.arange(n), csr.row_nnz)
        cols = csr.indices
        br, bc = rows // bs, cols // bs
        # unique block per (br, bc)
        key = br * MB + bc
        ukey, inv = np.unique(key, return_inverse=True)
        ubr, ubc = ukey // MB, ukey % MB
        blocks = np.zeros((len(ukey), bs, bs))
        np.add.at(blocks, (inv, rows % bs, cols % bs), csr.data)
        counts = np.bincount(ubr, minlength=RB)
        WB = max(int(counts.max()), 1) if len(ukey) else 1
        bcols = np.zeros((RB, WB), np.int32)
        vals = np.zeros((RB, WB, bs, bs))
        slot = np.zeros(RB, np.int64)
        for k in range(len(ukey)):
            r = ubr[k]
            bcols[r, slot[r]] = ubc[k]
            vals[r, slot[r]] = blocks[k]
            slot[r] += 1
        return cls(
            jnp.asarray(bcols), jnp.asarray(vals, dtype=dtype),
            jnp.asarray(counts.astype(np.int32)), (n, m), bs,
        )

    def to_csr(self):
        from parallel_amg_tpu.ops.coo import COO

        bcols = np.asarray(self.bcols)
        vals = np.asarray(self.vals)
        cnt = np.asarray(self.brow_nnz)
        rs, cs, vs = [], [], []
        bs = self.bs
        for r in range(self.n_block_rows):
            for w in range(cnt[r]):
                blk = vals[r, w]
                i, j = np.nonzero(blk)
                rs.append(r * bs + i)
                cs.append(bcols[r, w] * bs + j)
                vs.append(blk[i, j])
        rs = np.concatenate(rs) if rs else np.empty(0, np.int64)
        cs = np.concatenate(cs) if cs else np.empty(0, np.int64)
        vs = np.concatenate(vs) if vs else np.empty(0)
        keep = (rs < self.shape[0]) & (cs < self.shape[1])
        return COO(rs[keep], cs[keep], vs[keep], self.shape).to_csr()

    # -- device ops -------------------------------------------------------
    def matvec(self, x, row_chunk: int | None = None):
        """y = A @ x — batched bs×bs block matmuls, one width slot at a
        time.

        Padding slots hold zero blocks by construction (both builders
        zero-fill), so no mask multiply is needed; the per-slot loop keeps
        the gather temporary at (RB, bs) instead of (RB, WB, bs).

        Above ~8M block rows XLA's scheduler keeps several slots' gather
        temporaries live at once (measured 14.8 GB of HLO temps at 324³×7,
        an OOM next to the 8.6 GB resident operator), so large operators
        process rows in ``lax.map`` chunks — sequential by construction,
        peak ≈ one chunk's gathers + the output.
        """
        bs = self.bs
        MB = -(-self.shape[1] // bs)
        xp = jnp.pad(x, (0, MB * bs - x.shape[0])) if x.shape[0] != MB * bs else x
        xb = xp.reshape(MB, bs)
        RB = self.n_block_rows
        if row_chunk is None and RB > (1 << 23):
            row_chunk = 1 << 21
        if row_chunk and RB > row_chunk:
            # clamped dynamic slices: padding bcols/vals to a chunk
            # multiple would COPY the multi-GB value planes inside the
            # program (measured 17.6 GB > HBM at 324³); the final chunk
            # instead overlaps the previous one and rewrites identical rows
            n_ch = -(-RB // row_chunk)

            def body(i, y):
                i0 = jnp.minimum(i * row_chunk, RB - row_chunk)
                bcc = jax.lax.dynamic_slice_in_dim(self.bcols, i0,
                                                   row_chunk, 0)
                vlc = jax.lax.dynamic_slice_in_dim(self.vals, i0,
                                                   row_chunk, 0)
                yc = jnp.zeros((row_chunk, bs), xp.dtype)
                for w in range(self.width):
                    g = jnp.take(xb, bcc[:, w], axis=0)
                    yc = yc + jnp.einsum("rij,rj->ri", vlc[:, w], g)
                return jax.lax.dynamic_update_slice_in_dim(y, yc, i0, 0)

            y = jax.lax.fori_loop(0, n_ch, body,
                                  jnp.zeros((RB, bs), xp.dtype))
            return y.reshape(-1)[: self.shape[0]]
        y = jnp.zeros((RB, bs), xp.dtype)
        for w in range(self.width):
            g = jnp.take(xb, self.bcols[:, w], axis=0)  # (RB, bs)
            y = y + jnp.einsum("rij,rj->ri", self.vals[:, w], g)
        return y.reshape(-1)[: self.shape[0]]

    def diagonal(self):
        bs = self.bs
        r_iota = jax.lax.broadcasted_iota(jnp.int32, self.bcols.shape, 0)
        hit = self.bcols == r_iota
        dblk = jnp.einsum("rw,rwij->rij", hit.astype(self.vals.dtype),
                          self.vals)
        d = jnp.diagonal(dblk, axis1=1, axis2=2).reshape(-1)
        return d[: self.shape[0]]

    def __matmul__(self, x):
        return self.matvec(x)
