"""TWELL — tile-windowed ELL: the TPU-native *unstructured* SpMV format.

Why it exists (SURVEY.md §7 hard-part 4): XLA's generic gather serializes on
TPU (~0.1 Gnnz/s measured), and Mosaic's hardware dynamic-gather only
shuffles *within a 128-lane tile*.  TWELL restructures an arbitrary sparse
matrix at setup time so the solve-path gather is exactly that primitive:

- rows are grouped into tiles of R=128 (rows live in LANES);
- columns are grouped into 128-wide windows, WG=4 consecutive windows form a
  window-group (the x block a piece loads: (8, 512) of a sublane-replicated
  x — one aligned VMEM slab);
- a **piece** = (row-tile, window-group, copy): for every window w it holds
  up to SLOTS=8 entries per row in sublanes [ (w%WG)·8, (w%WG)·8+8 ), with
  the in-window lane index (c mod 128) as the gather index.  Rows needing
  more than 8 entries in one window overflow into copy pieces.

The Pallas kernel walks pieces (grid = T, scalar-prefetched piece tables),
does WG take_along_axis gathers + FMA into a (32, 128) accumulator, and
writes each row tile once (measured ~16 Gslot/s ≈ 126 GB/s on v5e vs
0.09 Gnnz/s for the XLA gather path — ~180×).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 128       # rows per tile (lane dimension)
WIN = 128     # window width (lanes of x)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# Auto-tune space for (slots per window, windows per group).  Cost model:
# T(s,wg) pieces, each paying fixed issue overhead plus the DMA of its
# value/index planes and x slab (measured v5e numbers).
_TUNE_SPACE = [(s, wg) for s in (2, 4, 8) for wg in (1, 2, 4, 8)]
_PIECE_OVERHEAD_S = 150e-9
_EFF_BW = 400e9  # effective B/s for small-slab DMA


@jax.tree_util.register_pytree_node_class
class TWELL:
    """Tile-windowed ELL matrix (any rectangular sparsity)."""

    def __init__(self, coltile, rowtile, first, last, idx, vals, shape,
                 n_tiles, n_pieces, slots, wg):
        self.coltile = coltile  # (T,) int32 — window-group id per piece
        self.rowtile = rowtile  # (T,) int32 — output row-tile per piece
        self.first = first      # (T,) int32 — 1 on first piece of a row tile
        self.last = last        # (T,) int32 — 1 on last piece of a row tile
        self.idx = idx          # (T, wg*slots, R) int8 — in-window lane ids
        self.vals = vals        # (T, wg*slots, R) float
        self.shape = tuple(int(s) for s in shape)  # logical (n_rows, n_cols)
        self.n_tiles = int(n_tiles)
        self.n_pieces = int(n_pieces)
        self.slots = int(slots)
        self.wg = int(wg)

    def tree_flatten(self):
        return (
            (self.coltile, self.rowtile, self.first, self.last, self.idx,
             self.vals),
            (self.shape, self.n_tiles, self.n_pieces, self.slots, self.wg),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, n_tiles, n_pieces, slots, wg = aux
        return cls(*children, shape, n_tiles, n_pieces, slots, wg)

    # -- properties -------------------------------------------------------
    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def padded_cols(self) -> int:
        return -(-self.n_cols // (WIN * self.wg)) * (WIN * self.wg)

    @property
    def nnz(self):
        return jnp.sum(self.vals != 0)

    @property
    def occupancy(self) -> float:
        """Fraction of slot capacity holding real entries (host diagnostic)."""
        return float(np.asarray(self.nnz)) / self.vals.size

    # -- construction -----------------------------------------------------
    @staticmethod
    def _piece_count(rt, w, lane, slots, wg, n_tiles) -> int:
        """Number of pieces for a given (slots, wg) — cheap, counts only."""
        g = w // wg
        wi = w % wg
        max_g = int(g.max()) + 1 if len(g) else 1
        key = ((rt * max_g + g) * R + lane) * wg + wi
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        is_first = np.ones(len(key), dtype=bool)
        is_first[1:] = key_s[1:] != key_s[:-1]
        group_start = np.maximum.accumulate(
            np.where(is_first, np.arange(len(key)), 0)
        )
        k = np.empty(len(key), dtype=np.int64)
        k[order] = np.arange(len(key)) - group_start
        copy = k // slots
        pkey = (rt * max_g + g) * (int(copy.max()) + 1) + copy
        n_pieces = len(np.unique(pkey))
        covered = len(np.unique(rt))
        return n_pieces + (n_tiles - covered)

    @classmethod
    def from_csr(cls, csr, dtype=None, slots=None, wg=None) -> "TWELL":
        """Vectorized host build (numpy, runs once per matrix).

        When slots/wg are not given, the builder sweeps a small config space
        and picks the (slots, wg) minimizing a measured piece-cost model —
        plane traffic shrinks 4-10x vs a fixed worst-case layout.
        """
        dtype = dtype or jnp.float32
        n_rows, n_cols = csr.shape
        n_tiles = max(-(-n_rows // R), 1)
        nnz = csr.nnz

        rows = np.repeat(np.arange(n_rows), csr.row_nnz)
        cols = csr.indices.astype(np.int64)
        vals = csr.data

        rt = rows // R
        lane = (rows % R).astype(np.int64)
        w = cols // WIN
        lane_in_win = (cols % WIN).astype(np.int64)

        if slots is None or wg is None:
            best, best_cost = (8, 4), np.inf
            for s_try, wg_try in _TUNE_SPACE:
                T_try = cls._piece_count(rt, w, lane, s_try, wg_try, n_tiles)
                plane_bytes = wg_try * s_try * R * 5 + wg_try * WIN * 8 * 4
                cost = T_try * (_PIECE_OVERHEAD_S + plane_bytes / _EFF_BW)
                if cost < best_cost:
                    best, best_cost = (s_try, wg_try), cost
            slots, wg = best

        g = w // wg
        wi = w % wg

        # occurrence rank k within (rt, g, lane, wi)
        max_g = int(g.max()) + 1 if nnz else 1
        key = ((rt * max_g + g) * R + lane) * wg + wi
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        is_first = np.ones(nnz, dtype=bool)
        is_first[1:] = key_s[1:] != key_s[:-1]
        group_start = np.maximum.accumulate(
            np.where(is_first, np.arange(nnz), 0)
        )
        k_s = np.arange(nnz) - group_start
        k = np.empty(nnz, dtype=np.int64)
        k[order] = k_s

        copy = k // slots
        k_in = k % slots

        # piece id per entry: unique (rt, g, copy), sorted by rt then (g, copy)
        max_copy = int(copy.max()) + 1 if nnz else 1
        pkey = (rt * max_g + g) * max_copy + copy
        upkey, pidx = np.unique(pkey, return_inverse=True)
        piece_rt = upkey // (max_g * max_copy)
        piece_g = (upkey // max_copy) % max_g

        # ensure every row tile has at least one piece (dummy, zeros)
        have = np.zeros(n_tiles, dtype=bool)
        have[piece_rt] = True
        missing = np.flatnonzero(~have)
        T = len(upkey) + len(missing)
        all_rt = np.concatenate([piece_rt, missing])
        all_g = np.concatenate([piece_g, np.zeros(len(missing), np.int64)])
        # sort pieces by row tile (stable keeps (g, copy) order within a tile)
        porder = np.argsort(all_rt, kind="stable")
        rank = np.empty(T, dtype=np.int64)
        rank[porder] = np.arange(T)
        entry_piece = rank[pidx]  # final piece index per entry

        idx_plane = np.zeros((T, wg * slots, R), dtype=np.int8)
        val_plane = np.zeros((T, wg * slots, R), dtype=np.float64)
        sub = wi * slots + k_in
        idx_plane[entry_piece, sub, lane] = lane_in_win
        val_plane[entry_piece, sub, lane] = vals

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
            shape=(n_rows, n_cols),
            n_tiles=n_tiles,
            n_pieces=T,
            slots=slots,
            wg=wg,
        )

    def to_csr(self):
        """Host round-trip for tests."""
        from parallel_amg_tpu.ops.coo import COO

        idx = np.asarray(self.idx).astype(np.int64)
        vals = np.asarray(self.vals)
        piece, sub, lane = np.nonzero(vals)
        rows = np.asarray(self.rowtile)[piece] * R + lane
        wi = sub // self.slots
        cols = (np.asarray(self.coltile)[piece] * self.wg + wi) * WIN \
            + idx[piece, sub, lane]
        return COO(rows, cols, vals[piece, sub, lane], self.shape).to_csr()

    # -- SpMV kernel ------------------------------------------------------
    def matvec(self, x):
        """y = A @ x (x logical length n_cols; returns length n_rows)."""
        npc = self.padded_cols
        xp = jnp.pad(x, (0, npc - x.shape[0])) if npc != x.shape[0] else x
        x_rep = jnp.broadcast_to(xp[None, :], (8, npc))
        T = self.n_pieces
        slots, wg = self.slots, self.wg

        def kernel(ct_ref, rt_ref, first_ref, last_ref,
                   xw_ref, idx_ref, vals_ref, o_ref, acc_ref):
            t = pl.program_id(0)

            @pl.when(first_ref[t] == 1)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            idx32 = idx_ref[0].astype(jnp.int32)
            for j in range(wg):
                win = xw_ref[:, j * WIN:(j + 1) * WIN]  # (8, 128)
                g = jnp.take_along_axis(
                    win[:slots], idx32[j * slots:(j + 1) * slots], axis=1
                )
                # value planes may ride as bf16 (halves the dominant plane
                # traffic — docs/VCYCLE_RS.md); upcast in VMEM, not HBM
                acc_ref[j * slots:(j + 1) * slots, :] += (
                    vals_ref[0, j * slots:(j + 1) * slots]
                    .astype(jnp.float32) * g
                )

            @pl.when(last_ref[t] == 1)
            def _():
                o_ref[...] = jnp.sum(acc_ref[...], axis=0, keepdims=True)[None]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((8, WIN * wg), lambda t, ct, rt, f, l: (0, ct[t]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wg * slots, R), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wg * slots, R), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, R), lambda t, ct, rt, f, l: (rt[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((wg * slots, R), jnp.float32)],
        )
        vals_in = (self.vals if self.vals.dtype in (jnp.float32, jnp.bfloat16)
                   else self.vals.astype(jnp.float32))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((self.n_tiles, 1, R), jnp.float32),
            grid_spec=grid_spec,
            interpret=_use_interpret(),
        )(self.coltile, self.rowtile, self.first, self.last,
          x_rep.astype(jnp.float32), self.idx, vals_in)
        y = out.reshape(self.n_tiles * R)[: self.n_rows]
        return y.astype(x.dtype)

    def diagonal(self):
        """Main diagonal via host round-trip free masked reduce."""
        # diag entry of global row r sits in piece p with rowtile[p]=r//R,
        # lane r%R, window col == row. Compute via gather-free mask:
        piece_rows = self.rowtile[:, None, None] * R + jax.lax.broadcasted_iota(
            jnp.int32, self.idx.shape, 2
        )
        wi = (jax.lax.broadcasted_iota(jnp.int32, self.idx.shape, 1)
              // self.slots)
        piece_cols = ((self.coltile[:, None, None] * self.wg + wi) * WIN
                      + self.idx.astype(jnp.int32))
        hit = (piece_rows == piece_cols) & (self.vals != 0)
        contrib = jnp.where(hit, self.vals, 0.0)
        # scatter-free: sum per (piece, lane) then segment over rowtile
        per_piece = jnp.sum(contrib, axis=1)  # (T, R)
        d_tiles = jax.ops.segment_sum(
            per_piece, self.rowtile, num_segments=self.n_tiles
        )
        return d_tiles.reshape(-1)[: self.n_rows]

    def matmat(self, X):
        """Y = A @ X for dense (n_cols, k) X — SpMM as k kernel passes
        (the per-pass x slab is replicated anyway; small k only)."""
        cols = [self.matvec(X[:, j]) for j in range(X.shape[1])]
        return jnp.stack(cols, axis=1)

    def __matmul__(self, x):
        if x.ndim == 1:
            return self.matvec(x)
        return self.matmat(x)
