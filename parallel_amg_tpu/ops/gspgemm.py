"""Pallas SpGEMM v2 — rank-plane gather geometry (the round-3 retune).

docs/SPGEMM.md's round-3 postmortem measured the first Pallas SpGEMM
(ops/pspgemm.py) 4.4× SLOWER than the XLA pairwise ESC and isolated the
cause: reusing TWELL's SpMV piece geometry inflates the candidate width to
Kc = p_max·wg·slots·Wb = 128 against a true K = Wa·Wb = 20, so every
downstream stage (piece reassembly, dedup, compaction) works on 6.4×
inflated data.  This module is the prescribed fix — a GATHER-SPECIFIC
piece geometry in which the candidate width is EXACTLY K:

- A **piece** is a (row-tile, column-window) pair — no slots, no copies.
  Within a piece, the entry of row-lane l with ELL rank k sits at plane k
  (rank-plane layout): for each (row, rank) there is exactly one entry and
  one window, so cells never collide and the piece table stores A's nnz at
  its natural (R, Wa) shape re-bucketed by window.
- The kernel walks pieces (sorted by row tile, first/last flags), gathers
  each referenced B row's (column, value) slot components through the
  within-128-lane hardware shuffle — the only fast dynamic gather on TPU —
  and accumulates candidates DIRECTLY into a (Wa·Wb, 128) rank-major
  scratch: plane k·Wb+m holds rank-k × B-slot-m.  Ownership of a
  (plane, lane) cell is exclusive to one piece, so masked adds compose.
- The output is already rank-major per row tile: one XLA transpose yields
  (R, K) candidates — the 0.5 GB piece-reassembly scatter of the v1
  pipeline does not exist here.
- Dedup reuses the VPU equality-matrix kernel of pspgemm at width K
  (K² = 400 at the A·P shape vs 16384 before), then the same cumsum
  compaction at the true output width.

Parity: same (col, val) sets as ell_spgemm / ell_spgemm_pairwise
(tests/test_gspgemm.py); column order is first-occurrence.  Explicit zeros
drop (validity is val != 0), matching the v1 kernel and PCSR.to_triplets.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.pspgemm import _dedup_call

R_TILE = 128
WIN = 128


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_pytree_node_class
class GatherSpgemmPlan:
    """Host-built rank-plane piece tables for a left operand A.

    Reusable across right operands (the Galerkin chain reuses A's plan for
    A·P; R·(AP) builds one for R).  A pytree, so plans flow through jit.
    """

    def __init__(self, coltile, rowtile, first, last, idx, vals, shape,
                 n_tiles, n_pieces, Wa):
        self.coltile = coltile  # (T,) int32 window id per piece
        self.rowtile = rowtile  # (T,) int32 row tile per piece
        self.first = first      # (T,) int32 1 on first piece of a tile
        self.last = last        # (T,) int32 1 on last piece of a tile
        self.idx = idx          # (T, Wa, R_TILE) int8 in-window lane ids
        self.vals = vals        # (T, Wa, R_TILE) f32 A values
        self.shape = tuple(int(s) for s in shape)
        self.n_tiles = int(n_tiles)
        self.n_pieces = int(n_pieces)
        self.Wa = int(Wa)

    def tree_flatten(self):
        return ((self.coltile, self.rowtile, self.first, self.last,
                 self.idx, self.vals),
                (self.shape, self.n_tiles, self.n_pieces, self.Wa))

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, n_tiles, n_pieces, Wa = aux
        return cls(*children, shape, n_tiles, n_pieces, Wa)

    @classmethod
    def from_ell_device(cls, A: ELL) -> "GatherSpgemmPlan":
        """ON-DEVICE plan build — no host pulls of A's planes.

        The numpy builder below pulls the left operand through the remote
        tunnel (~5 s + a device→host pull at the 1024² Galerkin operands —
        the round-4 waiver's stated reason the winning kernel stayed out of
        the production driver).  This build is two jitted programs (a
        piece-count pass, then a scatter pass with static sizes); only the
        piece-count scalar crosses the tunnel.  Piece padding buckets so
        repeated shapes share compiled programs; padded pieces carry
        first=0/last=0 and zero planes (pure no-op FMAs in the kernel).
        """
        n_rows, n_cols = A.shape
        n_tiles = max(-(-n_rows // R_TILE), 1)
        max_w = -(-n_cols // WIN)
        if n_tiles * max_w >= np.iinfo(np.int32).max:
            return cls.from_ell(A)  # int32 piece-key headroom exceeded
        t_real = int(_plan_stats(A.cols, A.vals, A.row_nnz,
                                 n_rows, n_cols, n_tiles))
        t_pad = _plan_bucket(t_real)
        coltile, rowtile, first, last, idx, vals = _plan_build(
            A.cols, A.vals, A.row_nnz, n_rows, n_cols, n_tiles, t_pad)
        return cls(coltile=coltile, rowtile=rowtile, first=first, last=last,
                   idx=idx, vals=vals, shape=(n_rows, n_cols),
                   n_tiles=n_tiles, n_pieces=t_pad, Wa=A.cols.shape[1])

    @classmethod
    def from_ell(cls, A: ELL) -> "GatherSpgemmPlan":
        """Vectorized numpy build (runs once per left operand)."""
        n_rows, n_cols = A.shape
        cols_np = np.asarray(A.cols)
        vals_np = np.asarray(A.vals, np.float64)
        nnz_np = np.asarray(A.row_nnz)
        Wa = cols_np.shape[1]
        n_tiles = max(-(-n_rows // R_TILE), 1)

        mask = np.arange(Wa)[None, :] < nnz_np[:, None]
        mask &= vals_np != 0
        r, k = np.nonzero(mask)
        c = cols_np[r, k]
        v = vals_np[r, k]

        rt = r // R_TILE
        lane = r % R_TILE
        w = c // WIN
        liw = c % WIN

        max_w = -(-n_cols // WIN)
        pkey = rt.astype(np.int64) * max_w + w
        upkey, pidx = np.unique(pkey, return_inverse=True)
        piece_rt = (upkey // max_w).astype(np.int64)
        piece_w = (upkey % max_w).astype(np.int64)

        # every row tile needs >= 1 piece (first/last accumulation flags)
        have = np.zeros(n_tiles, bool)
        have[piece_rt] = True
        missing = np.flatnonzero(~have)
        T = len(upkey) + len(missing)
        all_rt = np.concatenate([piece_rt, missing])
        all_w = np.concatenate([piece_w, np.zeros(len(missing), np.int64)])
        order = np.argsort(all_rt, kind="stable")
        rank_of = np.empty(T, np.int64)
        rank_of[order] = np.arange(T)
        entry_piece = rank_of[pidx]

        idx_plane = np.zeros((T, Wa, R_TILE), np.int8)
        val_plane = np.zeros((T, Wa, R_TILE), np.float64)
        idx_plane[entry_piece, k, lane] = liw
        val_plane[entry_piece, k, lane] = v

        sorted_rt = all_rt[order]
        first = np.ones(T, np.int32)
        first[1:] = (sorted_rt[1:] != sorted_rt[:-1]).astype(np.int32)
        last = np.ones(T, np.int32)
        last[:-1] = first[1:]

        return cls(
            coltile=jnp.asarray(all_w[order], jnp.int32),
            rowtile=jnp.asarray(sorted_rt, jnp.int32),
            first=jnp.asarray(first),
            last=jnp.asarray(last),
            idx=jnp.asarray(idx_plane),
            vals=jnp.asarray(val_plane, jnp.float32),
            shape=(n_rows, n_cols),
            n_tiles=n_tiles,
            n_pieces=T,
            Wa=Wa,
        )


# ---------------------------------------------------------------------------
# on-device plan build (GatherSpgemmPlan.from_ell_device)
# ---------------------------------------------------------------------------

_IMAX32 = np.iinfo(np.int32).max


def _plan_entries(cols, vals, row_nnz, n_rows, n_tiles, max_w):
    """Per-entry (pkey, k, lane, liw, v); plus n_tiles synthetic piece keys
    appended to the KEY STREAM ONLY so every row tile owns ≥1 piece — they
    join piece enumeration but never the plane scatter (a scattered dummy
    could collide with a real rank-0 entry).  Each anchor sits at its
    tile's MINIMUM real window so it MERGES with an existing piece; a
    fixed window-0 anchor minted a junk piece per tile (same fix as
    ops/format_device._tile_anchor_keys)."""
    W = cols.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 1)
    valid = (k < row_nnz[:, None]) & (vals != 0)
    rt = r // R_TILE
    lane = r % R_TILE
    w = cols.astype(jnp.int32) // WIN
    liw = cols.astype(jnp.int32) % WIN
    pkey = jnp.where(valid, rt * max_w + w, _IMAX32).reshape(-1)
    m_w = jax.ops.segment_min(
        jnp.where(valid, w, max_w).reshape(-1), rt.reshape(-1),
        num_segments=n_tiles)
    m_w = jnp.where(m_w >= max_w, 0, m_w)  # empty tile → window 0
    tile_keys = jnp.arange(n_tiles, dtype=jnp.int32) * max_w + m_w
    return (jnp.concatenate([pkey, tile_keys]), k.reshape(-1),
            lane.reshape(-1), liw.reshape(-1), vals.reshape(-1))


@partial(jax.jit, static_argnames=("n_rows", "n_cols", "n_tiles"))
def _plan_stats(cols, vals, row_nnz, n_rows, n_cols, n_tiles):
    max_w = -(-n_cols // WIN)
    pkey, *_ = _plan_entries(cols, vals, row_nnz, n_rows, n_tiles, max_w)
    s = jnp.sort(pkey)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]) & (s < _IMAX32)
    return jnp.sum(is_first)


@partial(jax.jit,
         static_argnames=("n_rows", "n_cols", "n_tiles", "t_pad"))
def _plan_build(cols, vals, row_nnz, n_rows, n_cols, n_tiles, t_pad):
    max_w = -(-n_cols // WIN)
    pkey, k, lane, liw, v = _plan_entries(cols, vals, row_nnz, n_rows,
                                          n_tiles, max_w)
    E = pkey.shape[0]
    E_ent = n_rows * cols.shape[1]
    iota = jnp.arange(E, dtype=jnp.int32)
    s, order = jax.lax.sort((pkey, iota), num_keys=1)
    p_first = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]) & (s < _IMAX32)
    pid_s = jnp.cumsum(p_first.astype(jnp.int32)) - 1
    entry_piece = jnp.full((E,), t_pad, jnp.int32).at[order].set(
        jnp.where(s < _IMAX32, pid_s, t_pad))[:E_ent]

    tgt = jnp.where(p_first, pid_s, t_pad)
    piece_rt = jnp.full((t_pad,), n_tiles - 1, jnp.int32).at[tgt].set(
        s // max_w, mode="drop")
    piece_w = jnp.zeros((t_pad,), jnp.int32).at[tgt].set(
        s % max_w, mode="drop")
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (piece_rt[1:] != piece_rt[:-1]).astype(jnp.int32)])
    last = jnp.concatenate(
        [(piece_rt[1:] != piece_rt[:-1]).astype(jnp.int32),
         jnp.ones((1,), jnp.int32)])

    Wa = cols.shape[1]
    idx_plane = jnp.zeros((t_pad, Wa, R_TILE), jnp.int32).at[
        entry_piece, k, lane].set(liw, mode="drop").astype(jnp.int8)
    val_plane = jnp.zeros((t_pad, Wa, R_TILE), jnp.float32).at[
        entry_piece, k, lane].set(v.astype(jnp.float32), mode="drop")
    return piece_w, piece_rt, first, last, idx_plane, val_plane


def _plan_bucket(t: int) -> int:
    if t <= 256:
        return 256
    step = max(256, 1 << (int(t - 1).bit_length() - 3))
    return -(-t // step) * step


def _gather_kernel(ct_ref, rt_ref,
                   bc_ref, bv_ref, idx_ref, av_ref,
                   oc_ref, ov_ref, accc_ref, accv_ref, *, Wa, Wb, sent):
    # first/last derived from the rowtile table — 2 scalar-prefetch tables
    # instead of 4 (the 4-table layout exceeded the 1 MB SMEM at the L1
    # RS-1024² plan, T=66 679; same fix as BTWELL's kernel)
    t = pl.program_id(0)
    nT = pl.num_programs(0)
    rt_prev = rt_ref[jnp.maximum(t - 1, 0)]
    rt_next = rt_ref[jnp.minimum(t + 1, nT - 1)]
    is_first = (t == 0) | (rt_prev != rt_ref[t])
    is_last = (t == nT - 1) | (rt_next != rt_ref[t])

    @pl.when(is_first)
    def _():
        accc_ref[...] = jnp.full_like(accc_ref, sent)
        accv_ref[...] = jnp.zeros_like(accv_ref)

    idx32 = idx_ref[0].astype(jnp.int32)   # (Wa, R_TILE)
    av = av_ref[0]                         # (Wa, R_TILE)
    own = av != 0
    # acc planes are m-major (plane = m·Wa + k) so each (m, k-group) write
    # is a CONTIGUOUS sublane slice — rank-major would need stride-Wb refs
    for m in range(Wb):
        winc = bc_ref[m]                   # (8, WIN) int32, replicated
        winv = bv_ref[m]
        for k0 in range(0, Wa, 8):
            kk = min(8, Wa - k0)
            gc = jnp.take_along_axis(winc[:kk], idx32[k0:k0 + kk], axis=1)
            gv = jnp.take_along_axis(winv[:kk], idx32[k0:k0 + kk], axis=1)
            o = own[k0:k0 + kk]
            sl = slice(m * Wa + k0, m * Wa + k0 + kk)
            accc_ref[sl, :] = jnp.where(o, gc, accc_ref[sl, :])
            accv_ref[sl, :] = accv_ref[sl, :] + jnp.where(
                o, av[k0:k0 + kk] * gv, 0.0)

    @pl.when(is_last)
    def _():
        oc_ref[...] = accc_ref[...][None]
        ov_ref[...] = accv_ref[...][None]


def gather_candidates(plan: GatherSpgemmPlan, B: ELL):
    """Pallas gather + transpose → (R_padded, K) row-major candidate
    (cols, vals) planes with cols == SENT on invalid slots."""
    n_cols_out = B.shape[1]
    Wa = plan.Wa
    Wb = B.cols.shape[1]
    K = Wa * Wb
    sent = jnp.int32(n_cols_out)
    T = plan.n_pieces

    # B slot components, padded to the window grid over A's COLUMN space
    # (A's column ids address B's rows), sublane-replicated
    npc = -(-plan.shape[1] // WIN) * WIN
    nB = B.cols.shape[0]
    bc = jnp.where(B.mask(), B.cols, sent).astype(jnp.int32)
    bv = jnp.where(B.mask(), B.vals, 0.0).astype(jnp.float32)
    bc = jnp.pad(bc, ((0, npc - nB), (0, 0)), constant_values=sent)
    bv = jnp.pad(bv, ((0, npc - nB), (0, 0)))
    bc_rep = jnp.broadcast_to(bc.T[:, None, :], (Wb, 8, npc))
    bv_rep = jnp.broadcast_to(bv.T[:, None, :], (Wb, 8, npc))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((Wb, 8, WIN), lambda t, ct, rt: (0, 0, ct[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wb, 8, WIN), lambda t, ct, rt: (0, 0, ct[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wa, R_TILE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wa, R_TILE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, R_TILE),
                         lambda t, ct, rt: (rt[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, R_TILE),
                         lambda t, ct, rt: (rt[t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((K, R_TILE), jnp.int32),
                        pltpu.VMEM((K, R_TILE), jnp.float32)],
    )
    oc, ov = pl.pallas_call(
        partial(_gather_kernel, Wa=Wa, Wb=Wb, sent=int(n_cols_out)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((plan.n_tiles, K, R_TILE), jnp.int32),
            jax.ShapeDtypeStruct((plan.n_tiles, K, R_TILE), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(plan.coltile, plan.rowtile, bc_rep, bv_rep, plan.idx, plan.vals)

    # rank-major piece planes → (R, K) row-major candidates: ONE transpose
    cand_c = oc.transpose(0, 2, 1).reshape(plan.n_tiles * R_TILE, K)
    cand_v = ov.transpose(0, 2, 1).reshape(plan.n_tiles * R_TILE, K)
    cand_c = jnp.where(cand_v != 0, cand_c, sent)
    return cand_c, cand_v


def _dedup_compact_kernel(cc_ref, cv_ref, oc_ref, ov_ref, on_ref,
                          dup_ref, acc_ref, *, K, w, sent):
    """Fused duplicate-merge + front-compaction on the VPU.

    The v1 pipeline compacted leaders with an XLA scatter over
    R·(w+1) cells — measured 163 of 200 ms at the 1024² A·P shape (82% of
    the whole product).  Sublane-dimension dynamic scatter does not exist
    in Mosaic, but an unrolled leader-rank selection does: pos = lane
    cumsum of the leader mask, then output slot j = the masked lane-sum of
    candidates with pos == j (exactly one per row) — O(K·w) VPU work per
    row, no scatter anywhere."""
    cc = cc_ref[...]  # (TR, K) int32
    cv = cv_ref[...]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, cc.shape, 1)
    valid = cc != sent

    CH = 16
    acc_ref[...] = jnp.zeros(cv.shape, jnp.float32)
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
        acc_ref[...] = acc_ref[...] + acc
        dup_ref[...] = dup_ref[...] | dup
    first = valid & (dup_ref[...] == 0)
    # leader rank via an inclusive lower-triangular matmul (Mosaic has no
    # lane cumsum): pos[j] = Σ_{k≤j} first[k] − 1, exact in f32 (K < 2²⁴)
    k_i = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    k_j = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri = (k_i <= k_j).astype(jnp.float32)
    pos = jnp.dot(first.astype(jnp.float32), tri,
                  preferred_element_type=jnp.float32).astype(jnp.int32) - 1
    accv = jnp.where(first, acc_ref[...], 0.0)
    accc = jnp.where(first, cc, 0)
    for j in range(w):
        sel = first & (pos == j)
        ov_ref[:, j] = jnp.sum(jnp.where(sel, accv, 0.0), axis=1)
        oc_ref[:, j] = jnp.sum(jnp.where(sel, accc, 0), axis=1)
    on_ref[...] = jnp.sum(first, axis=1, keepdims=True).astype(jnp.int32)


def _dedup_compact_call(cand_cols, cand_vals, sent: int, out_width: int,
                        row_tile: int | None = None):
    sent = int(sent)
    Rp, K = cand_cols.shape
    if row_tile is None:
        row_tile = max(min(256, (1_500_000 // max(K * K, 1)) // 8 * 8), 8)
    pad = (-Rp) % row_tile
    if pad:
        cand_cols = jnp.pad(cand_cols, ((0, pad), (0, 0)),
                            constant_values=sent)
        cand_vals = jnp.pad(cand_vals, ((0, pad), (0, 0)))
    grid = (cand_cols.shape[0] // row_tile,)
    oc, ov, on = pl.pallas_call(
        partial(_dedup_compact_kernel, K=K, w=int(out_width), sent=sent),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((row_tile, out_width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, out_width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cand_cols.shape[0], out_width), jnp.int32),
            jax.ShapeDtypeStruct((cand_cols.shape[0], out_width),
                                 jnp.float32),
            jax.ShapeDtypeStruct((cand_cols.shape[0], 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((row_tile, K), jnp.int32),
                        pltpu.VMEM((row_tile, K), jnp.float32)],
        interpret=_use_interpret(),
    )(cand_cols, cand_vals)
    return oc[:Rp], ov[:Rp], on[:Rp, 0]


def gather_spgemm(A, B: ELL, out_width: int | None = None,
                  plan: GatherSpgemmPlan | None = None,
                  strict: bool = True) -> ELL:
    """C = A @ B with the rank-plane Pallas gather pipeline.

    A: ELL (or a prebuilt ``plan``).  B: ELL.  One host sync for the
    output width unless given (then a second dedup pass compacts — give
    ``out_width`` when known to run the fused single-pass kernel).

    An explicit ``out_width`` smaller than a row's distinct-column count
    would silently DROP that row's trailing entries (nnz = min(dn,
    out_width)); ``strict=True`` (the default, matching
    ``ell_spgemm``/``ell_spgemm_pairwise``) raises instead — eager calls
    only, the check needs a host readback.
    """
    if plan is None:
        plan = (A if isinstance(A, GatherSpgemmPlan)
                else GatherSpgemmPlan.from_ell(A))
    n_rows, _ = plan.shape
    n_cols_out = B.shape[1]
    sent = jnp.int32(n_cols_out)
    explicit_width = out_width is not None
    cand_c, cand_v = gather_candidates(plan, B)

    def _check_width(dn):
        # eager-only (host readback); mirrors ell_spgemm's strict contract
        if (strict and explicit_width
                and not isinstance(dn, jax.core.Tracer)):
            worst = int(jnp.max(dn))
            if worst > out_width:
                raise ValueError(
                    f"gather_spgemm: out_width={out_width} < max distinct "
                    f"columns {worst} — entries would be dropped "
                    "(pass strict=False to clamp)")

    if _use_interpret():
        # CPU/interpret: the fused dedup+compact kernel emulates per grid
        # step and dominates suite time — use the v1 dedup + an XLA
        # cumsum/scatter compaction there (same results; the fused kernel
        # keeps its own small interpret test)
        dc, dv, dn = _dedup_call(cand_c, cand_v, n_cols_out)
        dc, dv, dn = dc[:n_rows], dv[:n_rows], dn[:n_rows]
        if out_width is None:
            out_width = max(int(jnp.max(dn)), 1)  # host sync
        _check_width(dn)
        first = dc != sent
        pos = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
        pos_c = jnp.where(first & (pos < out_width), pos, out_width)
        Rn = dc.shape[0]
        flat = (jnp.arange(Rn)[:, None] * (out_width + 1)
                + pos_c).reshape(-1)
        cc = jnp.zeros((Rn * (out_width + 1),), jnp.int32).at[flat].set(
            jnp.where(first, dc, 0).reshape(-1)
        ).reshape(Rn, out_width + 1)[:, :out_width]
        cv = jnp.zeros((Rn * (out_width + 1),), jnp.float32).at[flat].set(
            jnp.where(first, dv, 0.0).reshape(-1)
        ).reshape(Rn, out_width + 1)[:, :out_width]
        nnz = jnp.minimum(dn, out_width)
        return ELL(cc, cv, nnz.astype(jnp.int32), (n_rows, n_cols_out))

    if out_width is None:
        dn = _dedup_call(cand_c, cand_v, n_cols_out)[2][:n_rows]
        out_width = max(int(jnp.max(dn)), 1)  # host sync

    cc, cv, dn = _dedup_compact_call(cand_c, cand_v, n_cols_out, out_width)
    cc, cv, dn = cc[:n_rows], cv[:n_rows], dn[:n_rows]
    _check_width(dn)
    nnz = jnp.minimum(dn, out_width)
    return ELL(cc, cv, nnz.astype(jnp.int32), (n_rows, n_cols_out))
