"""BTWELL — block tile-windowed ELL: the TPU-native BSR SpMV kernel.

XLA's generic gather of bs-sized x blocks scalarizes on TPU (measured
1.1 Gnnz/s for the einsum block-ELL SpMV at 128³×3 — 100× below bandwidth),
for the same reason the scalar ELL path needed TWELL (ops/twell.py): the
only fast dynamic gather on TPU is Mosaic's within-128-lane shuffle.

BTWELL is TWELL lifted to bs×bs blocks, and is exactly where BSR pays off
on this hardware: ONE stored lane index per block entry drives bs
within-window gathers (one per input component) and bs² FMAs — index
traffic and gather count amortize by bs vs running scalar TWELL on the
expanded matrix, and the value planes stream at full DMA width.

Layout (R=128 block rows per tile, WIN=128 block-column windows):
- idx   (T, wg·slots, R) int8 — in-window lane of each block entry
  (same piece/copy machinery as TWELL, applied to BLOCK rows/cols);
- vals  (T, bs·bs, wg·slots, R) — the dense blocks, component pair
  (c_out, c_in) in plane c_out·bs + c_in;
- x is consumed in component-plane layout (bs, padded_block_cols),
  sublane-replicated ×8 for the lane gather;
- y is produced as (n_tiles, 1, bs·R): component c in lanes [c·R, (c+1)·R).

The grid walks pieces with scalar-prefetched piece tables; each piece does
wg·bs gathers + wg·bs²·slots lane-FMAs into a (bs, wg·slots, R) accumulator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 128    # block rows per tile (lanes)
WIN = 128  # window width (block columns)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_pytree_node_class
class BTWELL:
    """Tile-windowed block-ELL (BSR) matrix with square bs×bs blocks."""

    def __init__(self, coltile, rowtile, first, last, idx, vals, shape,
                 bs, n_tiles, n_pieces, slots, wg):
        self.coltile = coltile  # (T,) int32 window-group per piece
        self.rowtile = rowtile  # (T,) int32 output block-row tile per piece
        self.first = first      # (T,) int32
        self.last = last        # (T,) int32
        self.idx = idx          # (T, wg*slots, R) int8
        self.vals = vals        # (T, bs*bs, wg*slots, R)
        self.shape = tuple(int(s) for s in shape)  # element shape
        self.bs = int(bs)
        self.n_tiles = int(n_tiles)
        self.n_pieces = int(n_pieces)
        self.slots = int(slots)
        self.wg = int(wg)

    def tree_flatten(self):
        return ((self.coltile, self.rowtile, self.first, self.last,
                 self.idx, self.vals),
                (self.shape, self.bs, self.n_tiles, self.n_pieces,
                 self.slots, self.wg))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # -- properties ---------------------------------------------------------
    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_block_rows(self) -> int:
        return -(-self.shape[0] // self.bs)

    @property
    def n_block_cols(self) -> int:
        return -(-self.shape[1] // self.bs)

    @property
    def padded_block_cols(self) -> int:
        return -(-self.n_block_cols // (WIN * self.wg)) * (WIN * self.wg)

    @property
    def nnz(self):
        return jnp.sum(jnp.any(
            self.vals.reshape((self.vals.shape[0], self.bs * self.bs, -1))
            != 0, axis=1)) * self.bs ** 2

    # -- construction --------------------------------------------------------

    # Auto-tune space: (slots per window, windows per group).  Same measured
    # cost model as TWELL; value-plane bytes scale by bs² here, which pushes
    # the optimum toward SMALL capacities on spread-out block patterns
    # (occupancy dominates — a 7-point 3D block stencil touches 3 window
    # groups per row with 1-3 blocks each).
    _TUNE_SPACE = [(s, wg) for s in (1, 2, 4, 8) for wg in (1, 2, 4, 8)]
    _PIECE_OVERHEAD_S = 150e-9
    _EFF_BW = 400e9

    @staticmethod
    def _piece_count(rt, w, lane, slots, wg, n_tiles) -> int:
        g = w // wg
        wi = w % wg
        max_g = int(g.max()) + 1 if len(g) else 1
        key = ((rt * max_g + g) * R + lane) * wg + wi
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        is_first = np.ones(len(key), dtype=bool)
        is_first[1:] = key_s[1:] != key_s[:-1]
        group_start = np.maximum.accumulate(
            np.where(is_first, np.arange(len(key)), 0))
        k = np.empty(len(key), dtype=np.int64)
        k[order] = np.arange(len(key)) - group_start
        copy = k // slots
        pkey = (rt * max_g + g) * (int(copy.max()) + 1) + copy
        n_pieces = len(np.unique(pkey))
        covered = len(np.unique(rt))
        return n_pieces + (n_tiles - covered)

    @classmethod
    def _tune(cls, rt, w, lane, bs, n_tiles):
        best, best_cost = (2, 4), np.inf
        for s_try, wg_try in cls._TUNE_SPACE:
            T_try = cls._piece_count(rt, w, lane, s_try, wg_try, n_tiles)
            plane_bytes = (wg_try * s_try * R * (1 + 4 * bs * bs)
                           + wg_try * WIN * 8 * bs * 4)
            cost = T_try * (cls._PIECE_OVERHEAD_S
                            + plane_bytes / cls._EFF_BW)
            if cost < best_cost:
                best, best_cost = (s_try, wg_try), cost
        return best

    @classmethod
    def from_block_entries(cls, rows, cols, vals, shape, bs, dtype=None,
                           slots=None, wg=None) -> "BTWELL":
        """Vectorized host build from block-entry triplets (runs once).

        rows/cols: (nnzb,) block indices; vals: (nnzb, bs, bs) dense blocks.
        """
        dtype = dtype or jnp.float32
        RB = -(-shape[0] // bs)
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        if not isinstance(vals, tuple):
            vals = np.asarray(vals)
        nnz = len(rows)

        n_tiles = max(-(-RB // R), 1)
        rt = rows // R
        lane = (rows % R).astype(np.int64)
        w = cols // WIN
        lane_in_win = (cols % WIN).astype(np.int64)
        if slots is None or wg is None:
            slots, wg = cls._tune(rt, w, lane, bs, n_tiles)
        g = w // wg
        wi = w % wg

        # occurrence rank within (rt, g, lane, wi) → copy pieces (as TWELL)
        max_g = int(g.max()) + 1 if nnz else 1
        key = ((rt * max_g + g) * R + lane) * wg + wi
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        is_first = np.ones(nnz, dtype=bool)
        is_first[1:] = key_s[1:] != key_s[:-1]
        group_start = np.maximum.accumulate(
            np.where(is_first, np.arange(nnz), 0))
        k = np.empty(nnz, dtype=np.int64)
        k[order] = np.arange(nnz) - group_start
        copy = k // slots
        k_in = k % slots

        max_copy = int(copy.max()) + 1 if nnz else 1
        pkey = (rt * max_g + g) * max_copy + copy
        upkey, pidx = np.unique(pkey, return_inverse=True)
        piece_rt = upkey // (max_g * max_copy)
        piece_g = (upkey // max_copy) % max_g

        have = np.zeros(n_tiles, dtype=bool)
        have[piece_rt] = True
        missing = np.flatnonzero(~have)
        T = len(upkey) + len(missing)
        all_rt = np.concatenate([piece_rt, missing])
        all_g = np.concatenate([piece_g, np.zeros(len(missing), np.int64)])
        porder = np.argsort(all_rt, kind="stable")
        rank = np.empty(T, dtype=np.int64)
        rank[porder] = np.arange(T)
        entry_piece = rank[pidx]

        idx_plane = np.zeros((T, wg * slots, R), dtype=np.int8)
        val_plane = np.zeros((T, bs * bs, wg * slots, R), dtype=np.float32)
        sub = wi * slots + k_in
        idx_plane[entry_piece, sub, lane] = lane_in_win
        if isinstance(vals, tuple):
            # Kronecker entries (scalar values, C): fill per component pair
            # without materializing the (nnzb, bs, bs) block array
            svals, C = vals
            for co in range(bs):
                for ci in range(bs):
                    val_plane[entry_piece, co * bs + ci, sub, lane] = \
                        svals * C[co, ci]
        else:
            for co in range(bs):
                for ci in range(bs):
                    val_plane[entry_piece, co * bs + ci, sub, lane] = \
                        vals[:, co, ci]

        sorted_rt = all_rt[porder]
        first = np.ones(T, dtype=np.int32)
        first[1:] = (sorted_rt[1:] != sorted_rt[:-1]).astype(np.int32)
        last = np.ones(T, dtype=np.int32)
        last[:-1] = first[1:]

        return cls(
            coltile=jnp.asarray(all_g[porder], jnp.int32),
            rowtile=jnp.asarray(sorted_rt, jnp.int32),
            first=jnp.asarray(first),
            last=jnp.asarray(last),
            idx=jnp.asarray(idx_plane),
            vals=jnp.asarray(val_plane, dtype=dtype),
            shape=tuple(int(x) for x in shape),
            bs=bs,
            n_tiles=n_tiles,
            n_pieces=T,
            slots=slots,
            wg=wg,
        )

    @classmethod
    def from_bsr(cls, bsr, dtype=None, slots=None, wg=None) -> "BTWELL":
        """Build from a block-ELL BSR (drops padding and zero blocks)."""
        bs = bsr.bs
        bcols = np.asarray(bsr.bcols)
        bvals = np.asarray(bsr.vals)
        brow_nnz = np.asarray(bsr.brow_nnz)
        RB, WB = bcols.shape
        rows = np.repeat(np.arange(RB), WB)
        cols = bcols.reshape(-1).astype(np.int64)
        # BSR vals are 1-D scalar planes (ops/bsr.py module doc) —
        # reassemble (RB, WB, bs, bs) block order for the entry builder
        vals = bvals.reshape(WB, bs, bs, RB).transpose(3, 0, 1, 2).reshape(
            RB * WB, bs, bs)
        keep = (np.arange(WB)[None, :] < brow_nnz[:, None]).reshape(-1)
        keep &= np.any(vals != 0, axis=(1, 2))
        return cls.from_block_entries(rows[keep], cols[keep], vals[keep],
                                      bsr.shape, bs, dtype=dtype,
                                      slots=slots, wg=wg)

    def to_bsr(self):
        """Host round-trip for tests."""
        from parallel_amg_tpu.ops.bsr import BSR

        idx = np.asarray(self.idx).astype(np.int64)
        vals = np.asarray(self.vals)
        bs = self.bs
        T, _, WS, _ = vals.shape
        nzmask = np.any(vals != 0, axis=1)  # (T, wg*slots, R)
        piece, sub, lane = np.nonzero(nzmask)
        rows = np.asarray(self.rowtile)[piece] * R + lane
        wi = sub // self.slots
        cols = (np.asarray(self.coltile)[piece] * self.wg + wi) * WIN \
            + idx[piece, sub, lane]
        blocks = vals[piece, :, sub, lane].reshape(-1, bs, bs)
        RB = self.n_block_rows
        order = np.argsort(rows, kind="stable")
        rows, cols, blocks = rows[order], cols[order], blocks[order]
        counts = np.bincount(rows, minlength=RB)
        WB = max(int(counts.max()), 1) if len(rows) else 1
        bcols = np.zeros((RB, WB), np.int32)
        bvals = np.zeros((WB, bs, bs, RB))  # scalar planes (ops/bsr.py)
        slot = np.zeros(RB, np.int64)
        for r, c, bl in zip(rows, cols, blocks):
            bcols[r, slot[r]] = c
            bvals[slot[r], :, :, r] = bl
            slot[r] += 1
        return BSR(jnp.asarray(bcols),
                   tuple(jnp.asarray(bvals[w, i, j], self.vals.dtype)
                         for w in range(WB) for i in range(bs)
                         for j in range(bs)),
                   jnp.asarray(counts.astype(np.int32)), self.shape, bs)

    # -- SpMV kernel ----------------------------------------------------------
    def matvec_planes(self, xp):
        """y = A @ x with x in COMPONENT-PLANE layout: xp (bs, n_block_cols).

        Returns (bs, n_block_rows) component planes.
        """
        bs, slots, wg = self.bs, self.slots, self.wg
        npc = self.padded_block_cols
        if xp.shape[1] != npc:
            xp = jnp.pad(xp, ((0, 0), (0, npc - xp.shape[1])))
        # sublane-replicate each component ×8 for the lane gather
        x_rep = jnp.broadcast_to(xp[:, None, :], (bs, 8, npc)
                                 ).reshape(bs * 8, npc)
        T = self.n_pieces

        def kernel(ct_ref, rt_ref, xw_ref, idx_ref, vals_ref, o_ref,
                   acc_ref):
            # first/last piece of a row tile derived from the rowtile table
            # (keeps the scalar-prefetch SMEM footprint to 2 tables — 4 ran
            # out of SMEM at ~80k pieces)
            t = pl.program_id(0)
            nT = pl.num_programs(0)
            rt_prev = rt_ref[jnp.maximum(t - 1, 0)]
            rt_next = rt_ref[jnp.minimum(t + 1, nT - 1)]
            is_first = (t == 0) | (rt_prev != rt_ref[t])
            is_last = (t == nT - 1) | (rt_next != rt_ref[t])

            @pl.when(is_first)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            idx32 = idx_ref[0].astype(jnp.int32)
            for j in range(wg):
                sl = slice(j * slots, (j + 1) * slots)
                idx_j = idx32[sl]
                for ci in range(bs):
                    win = xw_ref[8 * ci:8 * ci + 8, j * WIN:(j + 1) * WIN]
                    gj = jnp.take_along_axis(win[:slots], idx_j, axis=1)
                    for co in range(bs):
                        acc_ref[co, sl, :] += (
                            vals_ref[0, co * bs + ci, sl, :] * gj)

            @pl.when(is_last)
            def _():
                o_ref[...] = jnp.concatenate(
                    [jnp.sum(acc_ref[c], axis=0, keepdims=True)
                     for c in range(bs)], axis=1)[None]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((bs * 8, WIN * wg),
                             lambda t, ct, rt: (0, ct[t]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wg * slots, R), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bs * bs, wg * slots, R),
                             lambda t, *_: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bs * R), lambda t, ct, rt: (rt[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((bs, wg * slots, R), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((self.n_tiles, 1, bs * R),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=_use_interpret(),
        )(self.coltile, self.rowtile,
          x_rep.astype(jnp.float32), self.idx,
          self.vals.astype(jnp.float32))
        # (T, 1, bs·R): component c in lanes [c·R, (c+1)·R) of tile t
        y = out.reshape(self.n_tiles, bs, R)
        y = jnp.swapaxes(y, 0, 1).reshape(bs, self.n_tiles * R)
        return y[:, : self.n_block_rows].astype(xp.dtype)

    def matvec(self, x):
        """y = A @ x for flat node-major x (length n_cols elements)."""
        bs = self.bs
        xb = x.reshape(-1, bs).T  # (bs, n_block_cols)
        y = self.matvec_planes(xb)
        return y.T.reshape(-1)[: self.shape[0]]

    def diagonal(self):
        """Main diagonal (block row == block col, component c)."""
        bs = self.bs
        piece_rows = (self.rowtile[:, None, None] * R
                      + jax.lax.broadcasted_iota(jnp.int32, self.idx.shape, 2))
        wi = (jax.lax.broadcasted_iota(jnp.int32, self.idx.shape, 1)
              // self.slots)
        piece_cols = ((self.coltile[:, None, None] * self.wg + wi) * WIN
                      + self.idx.astype(jnp.int32))
        nz = jnp.any(self.vals != 0, axis=1)
        hit = (piece_rows == piece_cols) & nz  # (T, wg*slots, R)
        dcomp = []
        for c in range(bs):
            contrib = jnp.where(hit, self.vals[:, c * bs + c], 0.0)
            per_piece = jnp.sum(contrib, axis=1)  # (T, R)
            d_tiles = jax.ops.segment_sum(per_piece, self.rowtile,
                                          num_segments=self.n_tiles)
            dcomp.append(d_tiles.reshape(-1)[: self.n_block_rows])
        d = jnp.stack(dcomp, axis=1)  # (RB, bs)
        return d.reshape(-1)[: self.shape[0]]

    def __matmul__(self, x):
        return self.matvec(x)


def btwell_from_kron_stencil(L, C, dtype=None, slots=None, wg=None
                             ) -> BTWELL:
    """BTWELL of A = L ⊗ C straight from the scalar stencil (host build).

    Fetches only L's weight planes (D·n floats) from the device; block
    entries are generated from the static offsets, so no device block-ELL
    intermediate exists (the ≥100M-DOF instances never fit one twice).
    """
    dims = L.dims
    nd = len(dims)
    n = int(np.prod(dims))
    bs = int(np.asarray(C).shape[0])
    C = np.asarray(C, np.float32)
    W = np.asarray(L.weights).reshape(L.n_points, n)
    strides = np.ones(nd, np.int64)
    for i in reversed(range(nd - 1)):
        strides[i] = strides[i + 1] * dims[i + 1]
    coords = np.unravel_index(np.arange(n), dims)
    rows_l, cols_l, vals_l = [], [], []
    for d, off in enumerate(L.offsets):
        ok = W[d] != 0
        for i in range(nd):
            nb = coords[i] + off[i]
            ok &= (nb >= 0) & (nb < dims[i])
        r = np.flatnonzero(ok)
        rows_l.append(r)
        cols_l.append(r + int(np.dot(off, strides)))
        vals_l.append(W[d, r])
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    svals = np.concatenate(vals_l).astype(np.float32)
    return BTWELL.from_block_entries(rows, cols, (svals, C),
                                     (n * bs, n * bs), bs, dtype=dtype,
                                     slots=slots, wg=wg)
