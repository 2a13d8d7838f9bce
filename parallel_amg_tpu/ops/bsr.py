"""BSR (block sparse row) format — small dense blocks for multi-DOF nodes.

Mandated alongside CSR/COO (BASELINE.json:5).  Use case: vector PDEs where
each grid node carries `bs` unknowns — the natural AMG unit is then a bs×bs
dense block, and SpMV becomes batched small matmuls amortizing the index
traffic by bs².

Layout: block-ELL — per block-row a fixed (padded) number of blocks:
  bcols (RB, WB) int32 block-column ids;
  vals: a TUPLE of WB·bs² one-dimensional (RB,) scalar planes, plane
  ``(w·bs + i)·bs + j`` holding entry (i, j) of slot-w blocks.

Why scalar planes instead of a (RB, WB, bs, bs) tensor: any multi-dim value
tensor gets a tiled TPU layout whose sublane padding differs between the
producer and the loop that consumes it, and XLA then RELAYOUTS the whole
operator inside every jitted solver loop — measured at 324³×3 (the 102M-DOF
acceptance probe): an 8.6 GB operator plus its 10.6 GB in-loop relayout copy
OOMed the 16 GB chip twice, for two different tensor layouts.  1-D f32
planes have one canonical layout, the matvec consumes them as pure
elementwise streams, and the same program AOT-compiles to temp=2.0 GB
(scripts/probe_bsr_layout.py).  SpMV per slot is then a gather of x plus
bs² fused multiply-adds — VPU streaming, which is also where 3×3-block
arithmetic lives on TPU (too small for the MXU).
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
        self.vals = tuple(vals)  # WB*bs*bs planes of (RB,) — module doc
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

    def _plane(self, w, i, j):
        return self.vals[(w * self.bs + i) * self.bs + j]

    @property
    def nnz(self):
        bs = self.bs
        total = jnp.zeros((), jnp.int32)
        for w in range(self.width):
            nz = self._plane(w, 0, 0) != 0
            for i in range(bs):
                for j in range(bs):
                    if i or j:
                        nz = nz | (self._plane(w, i, j) != 0)
            total = total + jnp.sum(nz)
        return total * bs ** 2

    @property
    def vals_nbytes(self) -> int:
        return sum(int(v.size) * v.dtype.itemsize for v in self.vals)

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
        vals = np.zeros((WB, bs, bs, RB))
        slot = np.zeros(RB, np.int64)
        for k in range(len(ukey)):
            r = ubr[k]
            bcols[r, slot[r]] = ubc[k]
            vals[slot[r], :, :, r] = blocks[k]
            slot[r] += 1
        return cls(
            jnp.asarray(bcols),
            tuple(jnp.asarray(vals[w, i, j], dtype=dtype)
                  for w in range(WB) for i in range(bs) for j in range(bs)),
            jnp.asarray(counts.astype(np.int32)), (n, m), bs,
        )

    def to_csr(self):
        from parallel_amg_tpu.ops.coo import COO

        bcols = np.asarray(self.bcols)
        vals = np.stack([np.asarray(v) for v in self.vals])
        cnt = np.asarray(self.brow_nnz)
        rs, cs, vs = [], [], []
        bs = self.bs
        for r in range(self.n_block_rows):
            for w in range(cnt[r]):
                blk = vals[w * bs * bs:(w + 1) * bs * bs, r].reshape(bs, bs)
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
        """y = A @ x — per-slot gather + bs² fused multiply-add streams.

        Padding slots hold zero planes by construction (both builders
        zero-fill), so no mask multiply is needed.

        Above ~8M block rows XLA's scheduler keeps several slots' gather
        temporaries live at once, so large operators process rows in
        clamped-dynamic-slice chunks — sequential by construction, peak ≈
        one chunk's gathers + the output (see module doc; the final chunk
        overlaps the previous one and rewrites identical rows).
        """
        bs = self.bs
        MB = -(-self.shape[1] // bs)
        xp = jnp.pad(x, (0, MB * bs - x.shape[0])) if x.shape[0] != MB * bs else x
        xb = xp.reshape(MB, bs)
        RB = self.n_block_rows
        if row_chunk is None and RB > (1 << 23):
            row_chunk = 1 << 21

        def apply_rows(bcc, vlc, nr):
            accs = [jnp.zeros((nr,), xp.dtype) for _ in range(bs)]
            for w in range(self.width):
                g = jnp.take(xb, bcc[:, w], axis=0)  # (nr, bs)
                for i in range(bs):
                    for j in range(bs):
                        accs[i] = accs[i] + vlc[(w * bs + i) * bs + j] * g[:, j]
            return jnp.stack(accs, axis=1)  # (nr, bs)

        if row_chunk and RB > row_chunk:
            n_ch = -(-RB // row_chunk)

            def body(i, y):
                i0 = jnp.minimum(i * row_chunk, RB - row_chunk)
                bcc = jax.lax.dynamic_slice_in_dim(self.bcols, i0,
                                                   row_chunk, 0)
                vlc = [jax.lax.dynamic_slice_in_dim(v, i0, row_chunk, 0)
                       for v in self.vals]
                yc = apply_rows(bcc, vlc, row_chunk)
                return jax.lax.dynamic_update_slice_in_dim(y, yc, i0, 0)

            y = jax.lax.fori_loop(0, n_ch, body,
                                  jnp.zeros((RB, bs), xp.dtype))
            return y.reshape(-1)[: self.shape[0]]
        y = apply_rows(self.bcols, list(self.vals), RB)
        return y.reshape(-1)[: self.shape[0]]

    def diagonal(self):
        bs = self.bs
        r_iota = jnp.arange(self.n_block_rows, dtype=self.bcols.dtype)
        cols = []
        for i in range(bs):
            d = jnp.zeros((self.n_block_rows,), self.vals[0].dtype)
            for w in range(self.width):
                hit = (self.bcols[:, w] == r_iota).astype(d.dtype)
                d = d + hit * self._plane(w, i, i)
            cols.append(d)
        return jnp.stack(cols, axis=1).reshape(-1)[: self.shape[0]]

    def __matmul__(self, x):
        return self.matvec(x)
