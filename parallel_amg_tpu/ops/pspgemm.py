"""Pallas two-phase SpGEMM: C = A·B with a windowed-gather numeric phase.

The SpGEMM gap (docs/SPGEMM.md; SURVEY.md §2.2 "written in Pallas";
BASELINE.json:5): the ESC formulations are dominated by XLA's serialized
TPU gather — measured at 1024² setup shapes: the (R, Wa·Wb) expand gather
alone is 191 ms (~1.2 GB/s effective) and the full pairwise ESC 408 ms for
A·P (K=20), 1.64 s for R·A (K=65), against a ~0.4 ms traffic bound.

This module is the two-phase Pallas answer, reusing TWELL's piece geometry
(ops/twell.py) — the within-128-lane hardware shuffle is the only fast
dynamic gather on TPU:

1. SYMBOLIC phase (host, runs once per product operand): ``TWELL.from_csr``
   re-buckets A's entries into (row-tile, column-window, copy) pieces with
   in-window int8 gather indices and value planes.
2. NUMERIC phase (`_gather_rows_call`): a Pallas kernel walks the pieces
   and, for each of B's Wb ELL slots, gathers the referenced B row's
   (column, value) through the in-window shuffle and multiplies by A's
   value — emitting CANDIDATE planes in piece layout.  This is the TWELL
   SpMV kernel with the scalar x replaced by B's 2·Wb component planes and
   the slot-accumulation replaced by per-slot writes.
3. DEDUP phase (`_dedup_call`): candidates reassemble to row-major with one
   static block-scatter + transpose (bandwidth-bound ops — no gather), then
   an O(K²)-per-row VPU kernel merges duplicate columns (the equality-
   matrix method of ell_spgemm_pairwise, without its lax.map/einsum
   overheads); a final XLA cumsum+segment compaction yields the ELL.

Parity: exact same (col, val) sets as ell_spgemm (tests/test_pspgemm.py);
column order is first-occurrence.  Pattern note: explicit zeros drop (the
validity encoding is val != 0), matching PCSR.to_triplets semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.twell import R as TILE_R, TWELL, WIN


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# numeric phase: windowed candidate gather
# ---------------------------------------------------------------------------

def _gather_kernel(ct_ref, rt_ref, bc_ref, bv_ref, idx_ref, av_ref,
                   oc_ref, ov_ref, *, slots, wg, Wb):
    """Per piece: for each B slot m and window j, gather the (col, val) of
    the referenced B rows and multiply by A's value plane."""
    idx32 = idx_ref[0].astype(jnp.int32)  # (wg*slots, 128)
    av = av_ref[0]
    for m in range(Wb):
        for j in range(wg):
            winc = bc_ref[m, :, j * WIN:(j + 1) * WIN]  # (8, 128) int32
            winv = bv_ref[m, :, j * WIN:(j + 1) * WIN]  # (8, 128) f32
            sl = slice(j * slots, (j + 1) * slots)
            gc = jnp.take_along_axis(winc[:slots], idx32[sl], axis=1)
            gv = jnp.take_along_axis(winv[:slots], idx32[sl], axis=1)
            oc_ref[0, m, sl, :] = gc
            ov_ref[0, m, sl, :] = av[sl] * gv


def _gather_rows_call(tw: TWELL, bc_rep, bv_rep):
    """Run the candidate gather over all pieces.

    bc_rep/bv_rep: (Wb, 8, padded_cols) — B's slot components, sublane-
    replicated like TWELL's x.  Returns (oc, ov): (T, Wb, wg*slots, 128).
    """
    T = tw.n_pieces
    slots, wg = tw.slots, tw.wg
    Wb = bc_rep.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((Wb, 8, WIN * wg), lambda t, ct, rt: (0, 0, ct[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wb, 8, WIN * wg), lambda t, ct, rt: (0, 0, ct[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wg * slots, TILE_R), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wg * slots, TILE_R), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Wb, wg * slots, TILE_R), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wb, wg * slots, TILE_R), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        partial(_gather_kernel, slots=slots, wg=wg, Wb=Wb),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, Wb, wg * slots, TILE_R), jnp.int32),
            jax.ShapeDtypeStruct((T, Wb, wg * slots, TILE_R), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(tw.coltile, tw.rowtile, bc_rep, bv_rep, tw.idx,
      tw.vals.astype(jnp.float32))


# ---------------------------------------------------------------------------
# dedup phase: per-row duplicate-column merge on the VPU
# ---------------------------------------------------------------------------

def _dedup_kernel(cc_ref, cv_ref, oc_ref, ov_ref, on_ref, dup_ref,
                  *, K, sent):
    cc = cc_ref[...]  # (TR, K) int32
    cv = cv_ref[...]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, cc.shape, 1)
    valid = cc != sent

    # chunked accumulation: a fully functional K-step carry keeps every
    # unrolled iteration's (TR, K) temporary live on Mosaic's scoped-vmem
    # stack (row_tile·K²·4 B — OOM at K ≳ 128), while a per-step ref RMW
    # pays K full-ref memory passes; 16-step functional chunks flushed to
    # the refs bound the stack AND cut the RMW traffic 16×
    CH = 16
    ov_ref[...] = jnp.zeros(cv.shape, jnp.float32)
    dup_ref[...] = jnp.zeros(cc.shape, jnp.int32)
    for k0 in range(0, K, CH):
        acc = jnp.zeros(cv.shape, jnp.float32)
        dup = jnp.zeros(cc.shape, jnp.int32)
        for k in range(k0, min(k0 + CH, K)):
            ck = cc[:, k:k + 1]
            vk = cv[:, k:k + 1]
            eq = (cc == ck) & valid & (ck != sent)
            acc = acc + jnp.where(eq, vk, 0.0)
            dup = dup | (eq & (col_iota > k)).astype(jnp.int32)
        ov_ref[...] = ov_ref[...] + acc
        dup_ref[...] = dup_ref[...] | dup
    first = valid & (dup_ref[...] == 0)
    oc_ref[...] = jnp.where(first, cc, sent)
    ov_ref[...] = jnp.where(first, ov_ref[...], 0.0)
    on_ref[...] = jnp.sum(first, axis=1, keepdims=True).astype(jnp.int32)


def _dedup_call(cand_cols, cand_vals, sent: int, row_tile: int | None = None):
    sent = int(sent)  # static for the kernel closure
    Rp, K = cand_cols.shape
    if row_tile is None:
        # Mosaic's scoped-vmem stack for the unrolled loop grows ~
        # row_tile·K²·4 B (measured: 26.5 MB at (256, 160); 16.05 MB at
        # (112, 130) — 52 KB past the 16 MB limit); budget ~10 MB
        row_tile = max(min(256, (1_500_000 // max(K * K, 1)) // 8 * 8), 8)
    pad = (-Rp) % row_tile
    if pad:
        cand_cols = jnp.pad(cand_cols, ((0, pad), (0, 0)),
                            constant_values=sent)
        cand_vals = jnp.pad(cand_vals, ((0, pad), (0, 0)))
    grid = (cand_cols.shape[0] // row_tile,)
    oc, ov, on = pl.pallas_call(
        partial(_dedup_kernel, K=K, sent=sent),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((row_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(cand_cols.shape, jnp.int32),
            jax.ShapeDtypeStruct(cand_vals.shape, jnp.float32),
            jax.ShapeDtypeStruct((cand_cols.shape[0], 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((row_tile, K), jnp.int32)],
        interpret=_use_interpret(),
    )(cand_cols, cand_vals)
    return oc[:Rp], ov[:Rp], on[:Rp, 0]


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

class PallasSpgemmPlan:
    """Symbolic-phase artifact for products sharing the left operand A:
    the TWELL piece tables + the static piece→(tile, rank) scatter map."""

    def __init__(self, tw: TWELL, n_cols_A: int):
        self.tw = tw
        self.n_cols_A = n_cols_A
        rt = np.asarray(tw.rowtile)
        # rank of each piece within its row tile (pieces are sorted by rt)
        first = np.r_[0, np.flatnonzero(np.diff(rt)) + 1]
        counts = np.r_[first[1:], len(rt)] - first
        self.prank = jnp.asarray(
            np.arange(len(rt)) - np.repeat(first, counts), jnp.int32)
        self.p_max = int(counts.max())

    @classmethod
    def from_ell(cls, A: ELL, slots=None, wg=None) -> "PallasSpgemmPlan":
        return cls(TWELL.from_csr(A.to_csr(), slots=slots, wg=wg),
                   A.shape[1])


def pallas_spgemm(A, B: ELL, out_width: int | None = None,
                  plan: PallasSpgemmPlan | None = None) -> ELL:
    """C = A @ B with the Pallas windowed-gather + VPU-dedup pipeline.

    A: ELL (or a prebuilt ``plan`` for it — the symbolic phase is host-side
    and reusable across products with the same A).  B: ELL.  One host sync
    for the output width unless given.
    """
    if plan is None:
        plan = PallasSpgemmPlan.from_ell(A)
    tw = plan.tw
    n_rows = tw.n_rows
    n_cols_out = B.shape[1]
    Wb = B.cols.shape[1]
    sent = jnp.int32(n_cols_out)

    # B components, padded to the window grid and sublane-replicated
    npc = tw.padded_cols
    nB = B.cols.shape[0]
    bc = jnp.where(B.mask(), B.cols, sent).astype(jnp.int32)
    bv = jnp.where(B.mask(), B.vals, 0.0).astype(jnp.float32)
    bc = jnp.pad(bc, ((0, npc - nB), (0, 0)), constant_values=sent)
    bv = jnp.pad(bv, ((0, npc - nB), (0, 0)))
    bc_rep = jnp.broadcast_to(bc.T[:, None, :], (Wb, 8, npc))
    bv_rep = jnp.broadcast_to(bv.T[:, None, :], (Wb, 8, npc))

    oc, ov = _gather_rows_call(tw, bc_rep, bv_rep)

    # reassemble piece layout → row-major candidates: one static block
    # scatter + transpose (bandwidth-bound; no gather anywhere)
    T = tw.n_pieces
    slots_wg = tw.wg * tw.slots
    dest = tw.rowtile * plan.p_max + plan.prank  # (T,)
    buf_c = jnp.full((tw.n_tiles * plan.p_max, Wb, slots_wg, TILE_R), sent,
                     jnp.int32).at[dest].set(oc)
    buf_v = jnp.zeros((tw.n_tiles * plan.p_max, Wb, slots_wg, TILE_R),
                      jnp.float32).at[dest].set(ov)
    Kc = plan.p_max * Wb * slots_wg
    cand_c = (buf_c.reshape(tw.n_tiles, Kc, TILE_R)
              .transpose(0, 2, 1).reshape(tw.n_tiles * TILE_R, Kc))
    cand_v = (buf_v.reshape(tw.n_tiles, Kc, TILE_R)
              .transpose(0, 2, 1).reshape(tw.n_tiles * TILE_R, Kc))
    # validity: val==0 candidates (A pads, B pads, window garbage) drop
    cand_c = jnp.where(cand_v != 0, cand_c, sent)

    dc, dv, dn = _dedup_call(cand_c, cand_v, n_cols_out)
    dc, dv, dn = dc[:n_rows], dv[:n_rows], dn[:n_rows]

    if out_width is None:
        out_width = max(int(jnp.max(dn)), 1)  # host sync

    # XLA compaction: rank leaders, scatter to the front (trash slot for
    # overflow — loud via row_nnz vs out_width on the caller side)
    first = dc != sent
    pos = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    pos_c = jnp.where(first & (pos < out_width), pos, out_width)
    Rn = dc.shape[0]
    flat = (jnp.arange(Rn)[:, None] * (out_width + 1) + pos_c).reshape(-1)
    cc = jnp.zeros((Rn * (out_width + 1),), jnp.int32).at[flat].set(
        jnp.where(first, dc, 0).reshape(-1)
    ).reshape(Rn, out_width + 1)[:, :out_width]
    cv = jnp.zeros((Rn * (out_width + 1),), jnp.float32).at[flat].set(
        jnp.where(first, dv, 0.0).reshape(-1)
    ).reshape(Rn, out_width + 1)[:, :out_width]
    nnz = jnp.minimum(dn, out_width)
    return ELL(cc, cv, nnz.astype(jnp.int32), (n_rows, n_cols_out))
