"""Distributed ON-DEVICE classical (Ruge-Stüben) AMG setup over PCSR shards.

VERDICT r2 item 3: kill the host-serial distributed algebraic setup.  Every
setup stage of SURVEY.md §3.1's ⟦COMM⟧ rows runs under ``shard_map`` with
ghost exchange over the PCSR halo plan — strength, PMIS splitting, direct +
Jacobi-smoothed interpolation, transpose, and the Galerkin ESC SpGEMM chain.
No global matrix (scipy or otherwise) is materialized anywhere in this call
graph: the input is a PCSR (assemble one with
``passembly_device.pcsr_from_coo_device``), intermediates are per-shard ELL
planes with global column ids, and products are reassembled with the
all_to_all device assembly.

Communication pattern per stage (each a single shard_map program):
- strength: none (rowwise max over the local diag/off planes);
- PMIS: per Luby round, one ghost fetch of states (``consistent``), one
  reverse max-push of candidate weights (``assemble`` with max), and one
  ghost fetch of the updated states for the F-assignment — the same
  exchange structure hypre's parallel PMIS uses;
- interpolation: one ghost fetch of (state, coarse-id) pairs; the TRUE
  distance-two extended+i tier additionally exchanges each halo row's full
  global-column row table and its strong-C (fine-id, coarse-id) table —
  distance-two points are compared by id only, never gathered, so ONE extra
  ghost-row exchange covers the extended stencil (hypre's ext+i comm
  pattern);
- SpGEMM C=A·B: one all_to_all of B's ghost ROWS through A's halo plan
  (the distributed-memory row-fetch formulation), then a local ESC
  sort/dedup, then the triplet reassembly all_to_all.

Coarse-point numbering is shard-padded: shard s's k-th C point gets global
id ``s·mc_pad + k`` (mc_pad = max per-shard C count), so every coarse
partition stays uniform-contiguous and ownership is a shift — the TPU-native
answer to PartitionedArrays' ``own_to_global`` maps (SURVEY.md §2.1).
Unused ids ("holes") carry an identity row, are classified FINE at the next
level (diagonal-only rows are inert), and are excluded from the true-row
diagnostics via ``Level.true_n``.

Deviation from the serial oracle: diagonal-only rows are FINE here (inert
under the smoother) rather than COARSE — identical hierarchies on any
connected problem, but isolated points never reach the coarse grid.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from parallel_amg_tpu.amg.hierarchy import (
    Hierarchy,
    Level,
    coarse_inverse_np,
)
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.parallel.mesh import ROW_AXIS, replicated_sharding
from parallel_amg_tpu.parallel.passembly_device import pcsr_from_coo_device
from parallel_amg_tpu.parallel.pcsr import PCSR

UNDECIDED, FINE, COARSE = 0, 1, 2
_NEG = jnp.float32(-1e30)


# ---------------------------------------------------------------------------
# in-kernel exchange helpers (used INSIDE shard_map bodies; all arguments are
# the per-shard slices: sidx (S, C), rmap (G,), xl (m,))
# ---------------------------------------------------------------------------

def _fetch(sidx, rmap, xl, fill):
    """``consistent!``: ghost values of the local vector → (G,)."""
    buf = xl[sidx]  # (S, C)
    recv = jax.lax.all_to_all(buf, ROW_AXIS, 0, 0, tiled=True)
    flat = jnp.concatenate(
        [recv.reshape(-1), jnp.full((1,), fill, xl.dtype)])
    return flat[rmap]


def _push_max(sidx, rmap, gv, m):
    """``assemble!`` with max-reduce: per-ghost-slot candidates → (m,) owner
    maxima (identity = _NEG)."""
    S, C = sidx.shape
    buf = jnp.full((S * C + 1,), _NEG, gv.dtype).at[rmap].max(gv)
    buf = buf[: S * C].reshape(S, C)
    recv = jax.lax.all_to_all(buf, ROW_AXIS, 0, 0, tiled=True)
    out = jnp.full((m,), _NEG, gv.dtype)
    return out.at[sidx.reshape(-1)].max(recv.reshape(-1))


def _fetch_rows(sidx, rmap, rows_c, rows_v, fill_c):
    """Ghost ROW fetch: exchange whole (W,)-wide rows of a local (m, W)
    col/val table through the halo plan → (G, W) ghost rows."""
    S, C = sidx.shape
    W = rows_c.shape[1]
    bc = rows_c[sidx]  # (S, C, W)
    bv = rows_v[sidx]
    rc = jax.lax.all_to_all(bc, ROW_AXIS, 0, 0, tiled=True)
    rv = jax.lax.all_to_all(bv, ROW_AXIS, 0, 0, tiled=True)
    fc = jnp.concatenate(
        [rc.reshape(S * C, W), jnp.full((1, W), fill_c, rc.dtype)])
    fv = jnp.concatenate(
        [rv.reshape(S * C, W), jnp.zeros((1, W), rv.dtype)])
    return fc[rmap], fv[rmap]


def _fetch_tab(sidx, rmap, tab, fill):
    """Ghost ROW fetch of ONE (m, W) table through the halo plan → (G, W)."""
    S, C = sidx.shape
    W = tab.shape[1]
    b = tab[sidx]  # (S, C, W)
    r = jax.lax.all_to_all(b, ROW_AXIS, 0, 0, tiled=True)
    f = jnp.concatenate(
        [r.reshape(S * C, W), jnp.full((1, W), fill, tab.dtype)])
    return f[rmap]


def _dedup_rows(cand_cols, cand_vals, sentinel):
    """Per-row ESC compress: sort by column, sum duplicate runs, compact to
    the front.  cand_cols: (m, K) int32 with ``sentinel`` marking invalid.
    Returns (cols, vals, row_nnz) at width K (entries past nnz zeroed)."""
    m, K = cand_cols.shape
    order = jnp.argsort(cand_cols, axis=1, stable=True)
    cols_s = jnp.take_along_axis(cand_cols, order, axis=1)
    vals_s = jnp.take_along_axis(cand_vals, order, axis=1)
    vals_s = jnp.where(cols_s < sentinel, vals_s, 0.0)
    is_first = jnp.concatenate(
        [jnp.ones((m, 1), bool), cols_s[:, 1:] != cols_s[:, :-1]], axis=1
    ) & (cols_s < sentinel)
    pos = jnp.cumsum(is_first.astype(jnp.int32), axis=1) - 1
    row_nnz = jnp.where(is_first.any(axis=1), pos[:, -1] + 1, 0)
    flat = (jnp.arange(m)[:, None] * K + jnp.clip(pos, 0, K - 1)).reshape(-1)
    ovals = jax.ops.segment_sum(vals_s.reshape(-1), flat,
                                num_segments=m * K).reshape(m, K)
    ocols = jax.ops.segment_max(
        jnp.where(is_first, cols_s, 0).reshape(-1) * is_first.reshape(-1),
        flat, num_segments=m * K).reshape(m, K)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (m, K), 1)
    pad = w_iota >= row_nnz[:, None]
    return (jnp.where(pad, 0, ocols).astype(jnp.int32),
            jnp.where(pad, 0.0, ovals), row_nnz.astype(jnp.int32))


def _topk_rescale(cols, vals, row_nnz, p_max, sentinel):
    """Keep the p_max largest-|v| entries per row, rescaled to preserve row
    sums (the device analog of oracle truncate_P; matches amg.device_rs)."""
    m, K = cols.shape
    k = min(p_max, K)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (m, K), 1)
    live = w_iota < row_nnz[:, None]
    absv = jnp.where(live, jnp.abs(vals), 0.0)
    topv, topi = jax.lax.top_k(absv, k)
    pv = jnp.take_along_axis(vals, topi, axis=1)
    pc = jnp.take_along_axis(cols, topi, axis=1)
    kept = topv > 0
    total = jnp.sum(jnp.where(live, vals, 0.0), axis=1)
    keptsum = jnp.sum(jnp.where(kept, pv, 0.0), axis=1)
    scale = jnp.where(keptsum != 0,
                      total / jnp.where(keptsum == 0, 1, keptsum), 1.0)
    pv = jnp.where(kept, pv * scale[:, None], 0.0)
    pc = jnp.where(kept, pc, sentinel)
    return pc.astype(jnp.int32), pv, jnp.sum(kept, axis=1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# strength (local — no communication)
# ---------------------------------------------------------------------------

def pcsr_strength(A: PCSR, theta: float):
    """Classical strong-connection masks over the split-block planes:
    (S, m, Wd) diag mask, (S, m, Wo) offdiag mask."""
    r_iota = jax.lax.broadcasted_iota(jnp.int32, A.diag_cols.shape, 1)
    dmask = (A.diag_vals != 0) & (A.diag_cols != r_iota)
    omask = A.off_vals != 0
    da = jnp.where(dmask, jnp.abs(A.diag_vals), 0.0)
    oa = jnp.where(omask, jnp.abs(A.off_vals), 0.0)
    rowmax = jnp.maximum(jnp.max(da, axis=2), jnp.max(oa, axis=2))
    Sd = dmask & (da >= theta * rowmax[..., None]) & (da > 0)
    So = omask & (oa >= theta * rowmax[..., None]) & (oa > 0)
    return Sd, So


# ---------------------------------------------------------------------------
# PMIS splitting (one shard_map; Luby rounds in a while_loop with ghost
# exchanges per round)
# ---------------------------------------------------------------------------

def pcsr_pmis(A: PCSR, Sd, So, seed: int = 0, max_rounds: int = 64):
    """Distributed PMIS C/F split.  Returns a global (S·m,) int32 state
    vector (FINE/COARSE; diagonal-only rows FINE)."""
    S = A.n_shards
    m = A.row_partition.rows_per_shard
    G = A.recv_map.shape[1]
    n_true = A.true_shape[0]

    # random weights: generated over the TRUE index space so the stream is
    # bit-identical to the single-device path (parity tests), padded inert
    w_rand = jax.random.uniform(jax.random.PRNGKey(seed), (n_true,))
    w_rand = jnp.concatenate(
        [w_rand, jnp.zeros((S * m - n_true,), w_rand.dtype)])

    def kernel(dc, oc, sd, so, sidx, rmap, wr):
        dc, oc, sd, so = dc[0], oc[0], sd[0], so[0]
        sidx, rmap = sidx[0], rmap[0]
        me = jax.lax.axis_index(ROW_AXIS)

        # influence |S^T_i|: local in-edges + ghost-slot sums pushed back
        loc = jax.ops.segment_sum(
            sd.astype(jnp.float32).reshape(-1), dc.reshape(-1),
            num_segments=m)
        gsl = jax.ops.segment_sum(
            so.astype(jnp.float32).reshape(-1), oc.reshape(-1),
            num_segments=G)
        Sx, C = sidx.shape
        buf = jnp.zeros((Sx * C + 1,), jnp.float32).at[rmap].add(gsl)
        recv = jax.lax.all_to_all(buf[: Sx * C].reshape(Sx, C),
                                  ROW_AXIS, 0, 0, tiled=True)
        infl = loc + jax.ops.segment_sum(
            recv.reshape(-1), sidx.reshape(-1), num_segments=m)
        w = infl + wr

        live = (me * m + jnp.arange(m)) < n_true
        has_out = jnp.any(sd, axis=1) | jnp.any(so, axis=1)
        has_in = infl > 0
        # diagonal-only rows (incl. padding and coarse-numbering holes) are
        # FINE/inert; connected rows start UNDECIDED
        state0 = jnp.where(live & (has_out | has_in), UNDECIDED, FINE)
        state0 = state0.astype(jnp.int32)

        w_g = _fetch(sidx, rmap, w, fill=_NEG)  # ghost weights (static)

        def round_body(carry):
            state, k, _ = carry
            st_g = _fetch(sidx, rmap, state, fill=jnp.int32(FINE))
            und = state == UNDECIDED
            und_g = st_g == UNDECIDED
            # m1: strongest undecided out-neighbor
            m1d = jnp.max(jnp.where(sd & und[dc], w[dc], _NEG), axis=1)
            m1o = jnp.max(jnp.where(so & und_g[oc], w_g[oc], _NEG), axis=1)
            # m2: strongest undecided in-neighbor (reverse direction)
            wrow = jnp.where(und, w, _NEG)
            m2d = jax.ops.segment_max(
                jnp.where(sd, wrow[:, None], _NEG).reshape(-1),
                dc.reshape(-1), num_segments=m)
            gmax = jax.ops.segment_max(
                jnp.where(so, wrow[:, None], _NEG).reshape(-1),
                oc.reshape(-1), num_segments=G)
            m2o = _push_max(sidx, rmap, gmax, m)
            mx = jnp.maximum(jnp.maximum(m1d, m1o), jnp.maximum(m2d, m2o))
            state = jnp.where(und & (w > mx), COARSE, state)
            # F-assignment against the UPDATED neighbor states
            st_g2 = _fetch(sidx, rmap, state, fill=jnp.int32(FINE))
            dep_c = (jnp.any(sd & (state[dc] == COARSE), axis=1)
                     | jnp.any(so & (st_g2[oc] == COARSE), axis=1))
            state = jnp.where((state == UNDECIDED) & dep_c, FINE, state)
            nund = jax.lax.psum(jnp.sum(state == UNDECIDED), ROW_AXIS)
            return state, k + 1, nund

        n0 = jax.lax.psum(jnp.sum(state0 == UNDECIDED), ROW_AXIS)
        state, _, _ = jax.lax.while_loop(
            lambda c: (c[2] > 0) & (c[1] < max_rounds), round_body,
            (state0, 0, n0))
        return jnp.where(state == UNDECIDED, COARSE, state).astype(jnp.int32)

    spec = P(ROW_AXIS)
    return jax.jit(jax.shard_map(
        kernel, mesh=A.mesh, in_specs=(spec,) * 7, out_specs=spec,
    ))(A.diag_cols, A.off_cols, Sd, So, A.send_idx, A.recv_map, w_rand)


def coarse_numbering(A: PCSR, state):
    """Shard-padded global coarse ids: shard s's k-th C point → s·mc_pad+k.

    Returns (cmap global (S·m,) int32 with -1 on non-C rows, mc_pad,
    nc_true) — one tiny host sync for the per-shard counts."""
    S = A.n_shards
    m = A.row_partition.rows_per_shard
    st = state.reshape(S, m)
    is_c = st == COARSE
    counts = np.asarray(jnp.sum(is_c, axis=1))  # host sync, (S,)
    mc_pad = max(int(counts.max()), 1)
    rank = jnp.cumsum(is_c, axis=1) - 1
    shard_of = jax.lax.broadcasted_iota(jnp.int32, (S, m), 0)
    cmap = jnp.where(is_c, shard_of * mc_pad + rank, -1)
    return cmap.reshape(-1).astype(jnp.int32), mc_pad, int(counts.sum())


# ---------------------------------------------------------------------------
# interpolation (direct + optional Jacobi smoothing), built as per-shard
# global-column planes, then assembled once
# ---------------------------------------------------------------------------

def _interp_kernel(dc, dv, oc, ov, sd, so, sidx, rmap, state, cmap, d_inv,
                   *, m, G, k0, p_max, omega, smooth, n_true, sentinel):
    dc, dv, oc, ov = dc[0], dv[0], oc[0], ov[0]
    sd, so = sd[0], so[0]
    sidx, rmap = sidx[0], rmap[0]
    me = jax.lax.axis_index(ROW_AXIS)

    st_g = _fetch(sidx, rmap, state, fill=jnp.int32(FINE))
    cm_g = _fetch(sidx, rmap, cmap, fill=jnp.int32(-1))

    r_iota = jax.lax.broadcasted_iota(jnp.int32, dc.shape, 0)
    dmask = dv != 0
    omask = ov != 0
    offd_d = dmask & (dc != r_iota)
    a_d = jnp.where(dmask, dv, 0.0)
    a_o = jnp.where(omask, ov, 0.0)
    strong_c_d = sd & (state[dc] == COARSE)
    strong_c_o = so & (st_g[oc] == COARSE)

    neg_d = offd_d & (a_d < 0)
    pos_d = offd_d & (a_d > 0)
    neg_o = omask & (a_o < 0)
    pos_o = omask & (a_o > 0)
    sum_n_neg = (jnp.sum(jnp.where(neg_d, a_d, 0.0), axis=1)
                 + jnp.sum(jnp.where(neg_o, a_o, 0.0), axis=1))
    sum_n_pos = (jnp.sum(jnp.where(pos_d, a_d, 0.0), axis=1)
                 + jnp.sum(jnp.where(pos_o, a_o, 0.0), axis=1))
    sum_c_neg = (jnp.sum(jnp.where(strong_c_d & neg_d, a_d, 0.0), axis=1)
                 + jnp.sum(jnp.where(strong_c_o & neg_o, a_o, 0.0), axis=1))
    sum_c_pos = (jnp.sum(jnp.where(strong_c_d & pos_d, a_d, 0.0), axis=1)
                 + jnp.sum(jnp.where(strong_c_o & pos_o, a_o, 0.0), axis=1))
    diag = jnp.sum(jnp.where(dc == r_iota, a_d, 0.0), axis=1)
    diag = diag + jnp.where(sum_c_pos == 0.0, sum_n_pos, 0.0)
    alpha = jnp.where(sum_c_neg != 0,
                      sum_n_neg / jnp.where(sum_c_neg == 0, 1, sum_c_neg), 0.0)
    beta = jnp.where(sum_c_pos != 0,
                     sum_n_pos / jnp.where(sum_c_pos == 0, 1, sum_c_pos), 0.0)
    coef_d = jnp.where(a_d < 0, alpha[:, None], beta[:, None])
    coef_o = jnp.where(a_o < 0, alpha[:, None], beta[:, None])
    wts_d = jnp.where(strong_c_d, -coef_d * a_d / diag[:, None], 0.0)
    wts_o = jnp.where(strong_c_o, -coef_o * a_o / diag[:, None], 0.0)

    # candidate planes with GLOBAL coarse columns (sentinel = invalid)
    cand_c = jnp.concatenate([
        jnp.where(strong_c_d, cmap[dc], sentinel),
        jnp.where(strong_c_o, cm_g[oc], sentinel)], axis=1)
    cand_c = jnp.where(cand_c < 0, sentinel, cand_c)
    cand_v = jnp.concatenate([wts_d, wts_o], axis=1)

    # direct interpolation at width k0 (2·p_max): top-|w| + row-sum rescale
    Wtot = cand_c.shape[1]
    kk = min(k0, Wtot)
    topv, topi = jax.lax.top_k(jnp.abs(jnp.where(cand_c < sentinel,
                                                 cand_v, 0.0)), kk)
    pv = jnp.take_along_axis(cand_v, topi, axis=1)
    pc = jnp.take_along_axis(cand_c, topi, axis=1)
    kept = topv > 0
    total = jnp.sum(jnp.where(cand_c < sentinel, cand_v, 0.0), axis=1)
    keptsum = jnp.sum(jnp.where(kept, pv, 0.0), axis=1)
    scale = jnp.where(keptsum != 0,
                      total / jnp.where(keptsum == 0, 1, keptsum), 1.0)
    pv = jnp.where(kept, pv * scale[:, None], 0.0)
    pc = jnp.where(kept, pc, sentinel)

    # C rows: identity onto their own coarse id
    is_c = state == COARSE
    ident_c = jnp.concatenate(
        [jnp.where(is_c, cmap, sentinel)[:, None],
         jnp.full((m, kk - 1), sentinel, jnp.int32)], axis=1)
    ident_v = jnp.concatenate(
        [jnp.where(is_c, 1.0, 0.0)[:, None], jnp.zeros((m, kk - 1))],
        axis=1)
    pc = jnp.where(is_c[:, None], ident_c, pc)
    pv = jnp.where(is_c[:, None], ident_v.astype(pv.dtype), pv)

    if smooth:
        # P ← (I − ω D⁻¹A) P over the halo'd P0 rows, then top-p_max
        gpc, gpv = _fetch_rows(sidx, rmap, pc, pv, fill_c=sentinel)
        da_d = -omega * d_inv[:, None] * jnp.where(dmask, dv, 0.0)
        da_o = -omega * d_inv[:, None] * jnp.where(omask, ov, 0.0)
        cd = jnp.where(dmask[..., None], pc[dc], sentinel)
        vd = jnp.where(dmask[..., None], da_d[..., None] * pv[dc], 0.0)
        co = jnp.where(omask[..., None], gpc[oc], sentinel)
        vo = jnp.where(omask[..., None], da_o[..., None] * gpv[oc], 0.0)
        Wd, Wo = dc.shape[1], oc.shape[1]
        cand_c2 = jnp.concatenate(
            [pc, cd.reshape(m, Wd * kk), co.reshape(m, Wo * kk)], axis=1)
        cand_v2 = jnp.concatenate(
            [pv, vd.reshape(m, Wd * kk), vo.reshape(m, Wo * kk)], axis=1)
        cand_v2 = jnp.where(cand_c2 < sentinel, cand_v2, 0.0)
        cols, vals, nnz = _dedup_rows(cand_c2, cand_v2, sentinel)
        pc, pv, row_nnz = _topk_rescale(cols, vals, nnz, p_max, sentinel)
    else:
        row_nnz = jnp.sum(pc < sentinel, axis=1).astype(jnp.int32)

    # triplets (global fine row, global coarse col, w)
    gr = me * m + jnp.arange(m)
    ok = (pc < sentinel) & (pv != 0) & (gr < n_true)[:, None]
    T = pc.shape[1]
    rows = jnp.where(ok, gr[:, None], -1).reshape(-1)
    cols = jnp.where(ok, pc, 0).reshape(-1)
    vals = jnp.where(ok, pv, 0.0).reshape(-1)
    return rows[None], cols[None], vals[None]


def _xi_tables_kernel(dc, dv, oc, ov, sd, so, sidx, rmap, state, cmap,
                      *, m, sent_f):
    """Stage A of distributed extended+i: per-local-row exchangeable tables.

    Emits (all aligned to the [diag planes | off planes] position order):
    - rowc/rowv: full-row table with GLOBAL column ids (sent_f = invalid);
    - sfm: strong-F mask per position;
    - sc_fid/sc_cid: strong-C (global fine id, global coarse id) pairs
      compacted to the row front, plus per-row count;
    - sf_e/sf_a: strong-F (extended local index ∈ [0, m+G), coupling a_ik)
      pairs compacted to the row front, plus per-row count.
    """
    dc, dv, oc, ov = dc[0], dv[0], oc[0], ov[0]
    sd, so = sd[0], so[0]
    sidx, rmap = sidx[0], rmap[0]
    S = sidx.shape[0]
    G = rmap.shape[0]
    me = jax.lax.axis_index(ROW_AXIS)

    # ghost global row ids (same construction as _global_cols_kernel)
    recv = jax.lax.all_to_all(sidx, ROW_AXIS, 0, 0, tiled=True)
    owner_base = (jnp.arange(S) * m)[:, None] + recv
    gids = jnp.concatenate(
        [owner_base.reshape(-1), jnp.full((1,), -1, jnp.int32)])[rmap]

    st_g = _fetch(sidx, rmap, state, fill=jnp.int32(FINE))
    cm_g = _fetch(sidx, rmap, cmap, fill=jnp.int32(-1))

    dmask = dv != 0
    omask = (ov != 0) & (gids[oc] >= 0)
    rowc = jnp.concatenate(
        [jnp.where(dmask, me * m + dc, sent_f),
         jnp.where(omask, gids[oc], sent_f)], axis=1).astype(jnp.int32)
    rowv = jnp.concatenate(
        [jnp.where(dmask, dv, 0.0), jnp.where(omask, ov, 0.0)], axis=1)

    scd = sd & (state[dc] == COARSE)
    sco = so & (st_g[oc] == COARSE)
    sfd = sd & (state[dc] != COARSE)
    sfo = so & (st_g[oc] != COARSE)
    sfm = jnp.concatenate([sfd, sfo], axis=1)

    sc_m = jnp.concatenate([scd, sco], axis=1)
    sc_fid = jnp.where(sc_m, rowc, sent_f)
    sc_cid = jnp.concatenate(
        [jnp.where(scd, cmap[dc], -1), jnp.where(sco, cm_g[oc], -1)],
        axis=1).astype(jnp.int32)
    order = jnp.argsort(jnp.where(sc_m, 0, 1), axis=1, stable=True)
    sc_fid = jnp.take_along_axis(sc_fid, order, axis=1)
    sc_cid = jnp.take_along_axis(sc_cid, order, axis=1)
    c_cnt = jnp.sum(sc_m, axis=1).astype(jnp.int32)

    EXT = jnp.int32(m + G)
    sf_e = jnp.concatenate(
        [jnp.where(sfd, dc, EXT), jnp.where(sfo, m + oc, EXT)],
        axis=1).astype(jnp.int32)
    sf_a = jnp.concatenate(
        [jnp.where(sfd, dv, 0.0), jnp.where(sfo, ov, 0.0)], axis=1)
    order_f = jnp.argsort(jnp.where(sfm, 0, 1), axis=1, stable=True)
    sf_e = jnp.take_along_axis(sf_e, order_f, axis=1)
    sf_a = jnp.take_along_axis(sf_a, order_f, axis=1)
    f_cnt = jnp.sum(sfm, axis=1).astype(jnp.int32)

    return (rowc[None], rowv[None], sfm[None], sc_fid[None], sc_cid[None],
            sf_e[None], sf_a[None], c_cnt[None], f_cnt[None])


def _xi_main_kernel(rowc, rowv, sfm, scf, sccid, sfe, sfa, state, cmap,
                    sidx, rmap,
                    *, m, n_true, sent_f, sent_c, p_max, row_chunk):
    """Stage B of distributed extended+i: ONE extra ghost-row exchange of
    the stage-A tables gives each shard the distance-two data (full rows +
    strong-C tables of its halo rows); the per-row computation is then the
    exact chunked candidate-table algorithm of
    ``amg.device_rs.extended_i_interpolation_device``, with candidates
    carried directly in global COARSE-id space (Ĉ members are C points, so
    every matched fine id has a known coarse id from the chat table)."""
    rowc, rowv, sfm = rowc[0], rowv[0], sfm[0]
    scf, sccid = scf[0], sccid[0]
    sfe, sfa = sfe[0], sfa[0]
    sidx, rmap = sidx[0], rmap[0]
    me = jax.lax.axis_index(ROW_AXIS)
    G = rmap.shape[0]
    W = rowc.shape[1]
    c_max = scf.shape[1]
    f_max = sfe.shape[1]
    EXT = m + G

    # the distance-two exchange: ghost rows' tables through the halo plan
    growc = _fetch_tab(sidx, rmap, rowc, jnp.int32(sent_f))
    growv = _fetch_tab(sidx, rmap, rowv, jnp.float32(0.0))
    gscf = _fetch_tab(sidx, rmap, scf, jnp.int32(sent_f))
    gsccid = _fetch_tab(sidx, rmap, sccid, jnp.int32(-1))

    # extended tables indexed by e ∈ [0, m+G]; row m+G = inert sentinel
    rowc_ext = jnp.concatenate(
        [rowc, growc, jnp.full((1, W), sent_f, jnp.int32)], axis=0)
    rowv_ext = jnp.concatenate(
        [rowv, growv, jnp.zeros((1, W), rowv.dtype)], axis=0)
    scf_ext = jnp.concatenate(
        [scf, gscf, jnp.full((1, c_max), sent_f, jnp.int32)], axis=0)
    sccid_ext = jnp.concatenate(
        [sccid, gsccid, jnp.full((1, c_max), -1, jnp.int32)], axis=0)

    def chunk(args):
        r0, rc, rv, sf_mask, oscf, osccid, osfe, osfa, st, cm = args
        ch = rc.shape[0]
        rid = r0 + jnp.arange(ch)
        gid = me * m + rid

        # Ĉ_i table: own strong-C ∪ strong-C of each strong-F neighbor
        kscf = scf_ext[osfe]            # (ch, f_max, c_max)
        kscc = sccid_ext[osfe]
        chat_f = jnp.concatenate(
            [oscf, kscf.reshape(ch, f_max * c_max)], axis=1)
        chat_c = jnp.concatenate(
            [osccid, kscc.reshape(ch, f_max * c_max)], axis=1)
        chat_valid = chat_f < sent_f

        # own-entry pass
        am = rc < sent_f
        isdiag = rc == gid[:, None]
        match2 = ((rc[:, :, None] == chat_f[:, None, :])
                  & chat_valid[:, None, :])
        cid_own = jnp.max(jnp.where(match2, chat_c[:, None, :], -1), axis=2)
        in_chat = cid_own >= 0  # valid chat members carry cid ≥ 0
        own_num = jnp.where(am & in_chat & ~isdiag, rv, 0.0)
        diag = jnp.sum(jnp.where(isdiag, rv, 0.0), axis=1)
        diag = diag + jnp.sum(
            jnp.where(am & ~isdiag & ~in_chat & ~sf_mask, rv, 0.0), axis=1)

        # strong-F distribution pass
        sfvm = osfe < EXT
        kr_c = rowc_ext[osfe]           # (ch, f_max, W)
        kr_v = rowv_ext[osfe]
        kr_m = kr_c < sent_f
        sign_ok = kr_v * osfa[..., None] > 0
        m_is_i = kr_c == gid[:, None, None]
        match4 = ((kr_c[..., None] == chat_f[:, None, None, :])
                  & chat_valid[:, None, None, :])
        cid4 = jnp.max(
            jnp.where(match4, chat_c[:, None, None, :], -1), axis=3)
        m_in_chat = cid4 >= 0
        dist_m = kr_m & sign_ok & (m_in_chat | m_is_i)
        denom = jnp.sum(jnp.where(dist_m, kr_v, 0.0), axis=2)
        has_d = denom != 0
        share = jnp.where(
            dist_m & has_d[..., None],
            osfa[..., None] * kr_v
            / jnp.where(denom == 0, 1.0, denom)[..., None], 0.0)
        diag = diag + jnp.sum(jnp.where(sfvm & ~has_d, osfa, 0.0), axis=1)
        diag = diag + jnp.sum(jnp.where(m_is_i, share, 0.0), axis=(1, 2))

        # candidates in global coarse-id space, dedup, w = -num/diag
        cand_c = jnp.concatenate(
            [jnp.where(own_num != 0, cid_own, sent_c),
             jnp.where((share != 0) & ~m_is_i, cid4,
                       sent_c).reshape(ch, f_max * W)], axis=1)
        cand_c = jnp.where(cand_c < 0, sent_c, cand_c).astype(jnp.int32)
        cand_v = jnp.concatenate(
            [own_num,
             jnp.where(~m_is_i, share, 0.0).reshape(ch, f_max * W)], axis=1)
        cand_v = jnp.where(cand_c < sent_c, cand_v, 0.0)
        cols, vals, nnz = _dedup_rows(cand_c, cand_v, sent_c)
        safe_diag = jnp.where(diag == 0, 1.0, diag)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1)
        live = w_iota < nnz[:, None]
        wts = jnp.where(live, -vals / safe_diag[:, None], 0.0)
        pc, pv, _ = _topk_rescale(cols, wts, nnz, p_max, sent_c)

        # C rows: identity onto own shard-padded coarse id
        is_c = st == COARSE
        k = pc.shape[1]
        pc = jnp.where(
            is_c[:, None],
            jnp.concatenate(
                [cm[:, None],
                 jnp.full((ch, k - 1), sent_c, jnp.int32)], axis=1), pc)
        pv = jnp.where(
            is_c[:, None],
            jnp.concatenate(
                [jnp.ones((ch, 1), pv.dtype),
                 jnp.zeros((ch, k - 1), pv.dtype)], axis=1), pv)
        return pc, pv

    pad_r = (-m) % row_chunk
    mp = m + pad_r

    def padr(t, fill):
        if not pad_r:
            return t
        return jnp.pad(t, ((0, pad_r),) + ((0, 0),) * (t.ndim - 1),
                       constant_values=fill)

    n_ch = mp // row_chunk
    r0s = jnp.arange(n_ch) * row_chunk

    def resh(t):
        return t.reshape((n_ch, row_chunk) + t.shape[1:])

    pc, pv = jax.lax.map(
        chunk,
        (r0s, resh(padr(rowc, sent_f)), resh(padr(rowv, 0.0)),
         resh(padr(sfm, False)), resh(padr(scf, sent_f)),
         resh(padr(sccid, -1)), resh(padr(sfe, EXT)), resh(padr(sfa, 0.0)),
         resh(padr(state, FINE)), resh(padr(cmap, -1))))
    k = pc.shape[2]
    pc = pc.reshape(mp, k)[:m]
    pv = pv.reshape(mp, k)[:m]

    gr = me * m + jnp.arange(m)
    ok = (pc < sent_c) & (pv != 0) & (gr < n_true)[:, None]
    rows = jnp.where(ok, gr[:, None], -1).reshape(-1)
    cols = jnp.where(ok, pc, 0).reshape(-1)
    vals = jnp.where(ok, pv, 0.0).reshape(-1)
    return rows[None], cols[None], vals[None]


def pcsr_extended_i(A: PCSR, Sd, So, state, cmap, mc_pad: int,
                    config: AMGConfig) -> PCSR:
    """Distributed TRUE distance-two extended+i interpolation → PCSR P.

    Same algorithm as the single-device
    ``amg.device_rs.extended_i_interpolation_device`` (entrywise
    parity-tested); the distance-two reach is ONE extra ghost-row exchange:
    every strong-F neighbor of a local row lies in A's halo, and the
    exchanged tables (each halo row's full global-column row and its
    strong-C (fine id, coarse id) table) carry everything the extended
    stencil needs — distance-two points are only compared by id, never
    gathered.  Two tiny host syncs (table widths)."""
    S = A.n_shards
    m = A.row_partition.rows_per_shard
    G = A.recv_map.shape[1]
    n_true = A.true_shape[0]
    n_coarse = S * mc_pad
    sent_f = int(A.col_partition.n_padded)

    spec = P(ROW_AXIS)
    tabs = jax.jit(jax.shard_map(
        partial(_xi_tables_kernel, m=m, sent_f=jnp.int32(sent_f)),
        mesh=A.mesh, in_specs=(spec,) * 10, out_specs=(spec,) * 9,
    ))(A.diag_cols, A.diag_vals, A.off_cols, A.off_vals, Sd, So,
       A.send_idx, A.recv_map, state, cmap)
    rowc, rowv, sfm, scf, sccid, sfe, sfa, c_cnt, f_cnt = tabs
    c_max = max(int(jnp.max(c_cnt)), 1)  # host sync
    f_max = max(int(jnp.max(f_cnt)), 1)
    scf, sccid = scf[:, :, :c_max], sccid[:, :, :c_max]
    sfe, sfa = sfe[:, :, :f_max], sfa[:, :, :f_max]

    W = rowc.shape[2]
    K = c_max * (1 + f_max)
    # bound the (chunk, f_max, W, K) int32 intermediates at ~64 MB/shard
    row_chunk = max(min(4096, (1 << 24) // max(f_max * W * K, 1)), 64)

    rows, cols, vals = jax.jit(jax.shard_map(
        partial(_xi_main_kernel, m=m, n_true=n_true, sent_f=sent_f,
                sent_c=n_coarse, p_max=config.p_max, row_chunk=row_chunk),
        mesh=A.mesh, in_specs=(spec,) * 11, out_specs=(spec,) * 3,
    ))(rowc, rowv, sfm, scf, sccid, sfe, sfa, state, cmap,
       A.send_idx, A.recv_map)

    return _assemble_grow(
        rows, cols, vals, (n_true, n_coarse), A.mesh,
        rows_per_shard=m, ell_width=config.p_max, off_width=config.p_max,
        pad_identity=False,
        ghost_capacity=max(4 * G * config.p_max, 256))


def pcsr_interpolation(A: PCSR, Sd, So, state, cmap, mc_pad: int,
                       config: AMGConfig):
    """Classical interpolation → PCSR P, three tiers (config.interpolation):
    "extended_i" (TRUE distance-two, the default — ``pcsr_extended_i``),
    "smoothed_direct" (direct + one Jacobi pass), "direct".

    P: rows on A's fine partition, cols on the shard-padded coarse
    numbering (n_cols = S·mc_pad)."""
    if config.interpolation == "extended_i":
        return pcsr_extended_i(A, Sd, So, state, cmap, mc_pad, config)
    S = A.n_shards
    m = A.row_partition.rows_per_shard
    G = A.recv_map.shape[1]
    n_true = A.true_shape[0]
    n_coarse = S * mc_pad
    smooth = config.interpolation != "direct"
    k0 = max(config.p_max * (2 if smooth else 1), 1)

    d = A.diagonal()
    d_inv = jnp.where(d != 0, 1.0 / d, 0.0)

    kern = partial(_interp_kernel, m=m, G=G, k0=k0, p_max=config.p_max,
                   omega=config.jacobi_omega, smooth=smooth, n_true=n_true,
                   sentinel=jnp.int32(n_coarse))
    spec = P(ROW_AXIS)
    rows, cols, vals = jax.jit(jax.shard_map(
        kern, mesh=A.mesh, in_specs=(spec,) * 11, out_specs=(spec,) * 3,
    ))(A.diag_cols, A.diag_vals, A.off_cols, A.off_vals, Sd, So,
       A.send_idx, A.recv_map, state, cmap, d_inv)

    width = config.p_max if smooth else k0
    return _assemble_grow(
        rows, cols, vals, (n_true, n_coarse), A.mesh,
        rows_per_shard=m, ell_width=width, off_width=width,
        pad_identity=False,
        ghost_capacity=max(4 * G * config.p_max, 256))


def _assemble_grow(rows, cols, vals, shape, mesh, *, max_grow: int = 4,
                   **kwargs) -> PCSR:
    """pcsr_from_coo_device with loud-but-handled capacity growth: on a
    counted overflow, double the offending capacity and retry (keeps the
    no-silent-caps rule without hand-tuned constants)."""
    for _ in range(max_grow):
        try:
            return pcsr_from_coo_device(rows, cols, vals, shape, mesh,
                                        **kwargs)
        except ValueError as e:
            msg = str(e)
            if "ghost_capacity" in msg:
                kwargs["ghost_capacity"] = 2 * kwargs.get(
                    "ghost_capacity", 256)
                kwargs.pop("send_capacity", None)
            elif "ell/off_width" in msg:
                kwargs["ell_width"] = 2 * kwargs.get("ell_width", 8)
                kwargs["off_width"] = 2 * kwargs.get("off_width", 8)
            elif "send_capacity" in msg:
                kwargs["send_capacity"] = 2 * kwargs.get(
                    "send_capacity", 256)
            else:
                raise
    return pcsr_from_coo_device(rows, cols, vals, shape, mesh, **kwargs)


# ---------------------------------------------------------------------------
# distributed SpGEMM: C = A @ B via ghost-row fetch + local ESC + reassembly
# ---------------------------------------------------------------------------

def _global_cols_kernel(dc, dv, oc, ov, sidx, rmap, *, mc, sentinel):
    """Per-shard (m, Wd+Wo) col/val table of a PCSR with GLOBAL column ids
    (sentinel = invalid) — the exchangeable row view of B."""
    dc, dv, oc, ov = dc[0], dv[0], oc[0], ov[0]
    sidx, rmap = sidx[0], rmap[0]
    S = sidx.shape[0]
    me = jax.lax.axis_index(ROW_AXIS)
    # ghost gid table via one all_to_all of the send tables (pcsr.to_triplets)
    recv = jax.lax.all_to_all(sidx, ROW_AXIS, 0, 0, tiled=True)
    owner_base = (jnp.arange(S) * mc)[:, None] + recv
    gids = jnp.concatenate(
        [owner_base.reshape(-1), jnp.full((1,), -1, jnp.int32)])[rmap]
    gc_d = jnp.where(dv != 0, me * mc + dc, sentinel)
    gc_o = jnp.where((ov != 0) & (gids[oc] >= 0), gids[oc], sentinel)
    cols = jnp.concatenate([gc_d, gc_o], axis=1)
    vals = jnp.concatenate([jnp.where(dv != 0, dv, 0.0),
                            jnp.where(ov != 0, ov, 0.0)], axis=1)
    return cols[None], vals[None]


def _pcsr_global_cols(B: PCSR, sentinel):
    mc = B.col_partition.rows_per_shard
    spec = P(ROW_AXIS)
    return jax.jit(jax.shard_map(
        partial(_global_cols_kernel, mc=mc, sentinel=sentinel),
        mesh=B.mesh, in_specs=(spec,) * 6, out_specs=(spec,) * 2,
    ))(B.diag_cols, B.diag_vals, B.off_cols, B.off_vals,
       B.send_idx, B.recv_map)


def _spgemm_kernel(dc, dv, oc, ov, sidx, rmap, bc, bv, *, sentinel):
    """Local ESC of C = A·B given B's global-col row table (sharded on A's
    column partition).  Emits dedup'ed (m, K) planes + row_nnz."""
    dc, dv, oc, ov = dc[0], dv[0], oc[0], ov[0]
    sidx, rmap = sidx[0], rmap[0]
    bc, bv = bc[0], bv[0]
    m = dc.shape[0]
    Wb = bc.shape[1]
    gbc, gbv = _fetch_rows(sidx, rmap, bc, bv, fill_c=sentinel)

    dmask = dv != 0
    omask = ov != 0
    cd = jnp.where(dmask[..., None], bc[dc], sentinel)
    vd = jnp.where(dmask[..., None], dv[..., None] * bv[dc], 0.0)
    co = jnp.where(omask[..., None], gbc[oc], sentinel)
    vo = jnp.where(omask[..., None], ov[..., None] * gbv[oc], 0.0)
    Wd, Wo = dc.shape[1], oc.shape[1]
    cand_c = jnp.concatenate(
        [cd.reshape(m, Wd * Wb), co.reshape(m, Wo * Wb)], axis=1)
    cand_v = jnp.concatenate(
        [vd.reshape(m, Wd * Wb), vo.reshape(m, Wo * Wb)], axis=1)
    cand_v = jnp.where(cand_c < sentinel, cand_v, 0.0)
    cols, vals, nnz = _dedup_rows(cand_c, cand_v, sentinel)
    return cols[None], vals[None], nnz[None]


def pcsr_spgemm(A: PCSR, B: PCSR, *, out_true_rows: int | None = None,
                pad_identity: bool = False) -> PCSR:
    """Distributed C = A @ B (ESC; SURVEY.md §3.1 Galerkin ⟦COMM⟧ rows).

    A's column partition must equal B's row partition.  One all_to_all
    fetches the ghost rows of B through A's halo plan; the per-shard ESC
    dedups locally; the compacted triplets reassemble into a PCSR with one
    more all_to_all.  Two small host syncs (output width, overflow check).
    """
    assert A.col_partition.rows_per_shard == B.row_partition.rows_per_shard, (
        "pcsr_spgemm: A's column partition must match B's row partition")
    S = A.n_shards
    m = A.row_partition.rows_per_shard
    n_rows = out_true_rows or A.true_shape[0]
    n_cols = B.true_shape[1]
    sentinel = jnp.int32(B.col_partition.n_padded)

    bc, bv = _pcsr_global_cols(B, sentinel)
    spec = P(ROW_AXIS)
    cols, vals, nnz = jax.jit(jax.shard_map(
        partial(_spgemm_kernel, sentinel=sentinel),
        mesh=A.mesh, in_specs=(spec,) * 8, out_specs=(spec,) * 3,
    ))(A.diag_cols, A.diag_vals, A.off_cols, A.off_vals,
       A.send_idx, A.recv_map, bc, bv)

    width = max(int(jnp.max(nnz)), 1)  # host sync
    cols = cols[:, :, :width]
    vals = vals[:, :, :width]
    shard_of = jax.lax.broadcasted_iota(jnp.int32, (S, m, width), 0)
    row_of = jax.lax.broadcasted_iota(jnp.int32, (S, m, width), 1)
    gr = shard_of * m + row_of
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (S, m, width), 2)
    ok = (w_iota < nnz[..., None]) & (gr < n_rows) & (vals != 0)
    rows_t = jnp.where(ok, gr, -1).reshape(S, m * width)
    cols_t = jnp.where(ok, cols, 0).reshape(S, m * width)
    vals_t = jnp.where(ok, vals, 0.0).reshape(S, m * width)

    mcB = B.col_partition.rows_per_shard
    return _assemble_grow(
        rows_t, cols_t, vals_t, (n_rows, n_cols), A.mesh,
        rows_per_shard=m, ell_width=width, off_width=width,
        pad_identity=pad_identity,
        ghost_capacity=max(2 * mcB, 4 * B.recv_map.shape[1], 256))


def pcsr_transpose(P: PCSR, rows_per_shard: int) -> PCSR:
    """R = Pᵀ on device: triplet recovery + owner-routed reassembly."""
    rows, cols, vals = P.to_triplets()
    n_rows, n_cols = P.true_shape
    # column width of P = row width of R: count on device, one tiny sync
    valid = rows >= 0
    counts = jnp.zeros((P.col_partition.n_padded,), jnp.int32).at[
        jnp.where(valid, cols, 0).reshape(-1)
    ].add(valid.reshape(-1).astype(jnp.int32))
    width = max(int(jnp.max(counts)), 1)
    rT = jnp.where(valid, cols, -1)
    cT = jnp.where(valid, rows, 0)
    return _assemble_grow(
        rT, cT, vals, (n_cols, n_rows), P.mesh,
        rows_per_shard=rows_per_shard, ell_width=width, off_width=width,
        pad_identity=False,
        ghost_capacity=max(4 * P.recv_map.shape[1], 256))


def _ensure_diag(A: PCSR) -> PCSR:
    """Put a unit diagonal on structurally empty rows (coarse-numbering
    holes) so smoothers and Krylov stay well-defined there."""
    empty = (jnp.sum(A.diag_vals != 0, axis=2)
             + jnp.sum(A.off_vals != 0, axis=2)) == 0  # (S, m)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, empty.shape, 1)
    dc = A.diag_cols.at[:, :, 0].set(
        jnp.where(empty, r_iota, A.diag_cols[:, :, 0]))
    dv = A.diag_vals.at[:, :, 0].set(
        jnp.where(empty, 1.0, A.diag_vals[:, :, 0]))
    return PCSR(dc, dv, A.off_cols, A.off_vals, A.send_idx, A.recv_map,
                A.mesh, A.row_partition, A.col_partition, A.true_shape)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _pcsr_lambda_max(A: PCSR, d_inv, iters: int, seed: int = 0):
    n = A.col_partition.n_padded
    x0 = jax.random.uniform(jax.random.PRNGKey(seed), (n,),
                            A.diag_vals.dtype) - 0.5

    @jax.jit
    def run(A, d_inv, x0):
        def body(i, carry):
            x, lam = carry
            y = d_inv * A.matvec(x)
            nrm = jnp.linalg.norm(y)
            lam = jnp.where(nrm > 0, nrm, lam)
            return y / jnp.maximum(nrm, 1e-30), lam

        return jax.lax.fori_loop(
            0, iters, body, (x0, jnp.asarray(1.0, x0.dtype)))[1]

    return 1.1 * run(A, d_inv, x0)


def distributed_rs_setup(A: PCSR, config: AMGConfig, dtype=jnp.float32,
                         seed: int = 0) -> Hierarchy:
    """Fully distributed, fully on-device classical-AMG setup from a PCSR.

    Every level stays row-sharded over the mesh (coarse-level agglomeration
    is available separately via ``PCSR.repartition``); the coarsest operator
    is gathered as triplets (it is ≤ n_coarse_max by construction) into a
    replicated dense pseudo-inverse.  No global sparse matrix exists at any
    point of this call graph.
    """
    assert isinstance(A, PCSR), (
        "distributed_rs_setup takes a PCSR — assemble one with "
        "pcsr_from_coo_device or PCSR.from_csr")
    mesh = A.mesh
    S = mesh.devices.size
    levels: List[Level] = []
    true_n = A.true_shape[0]
    for lvl in range(config.max_levels):
        d = A.diagonal()
        d_inv = jnp.where(d != 0, 1.0 / d, 0.0).astype(dtype)
        lam = jnp.asarray(0.0, dtype)
        if config.smoother == "chebyshev":
            lam = _pcsr_lambda_max(A, d_inv, config.lambda_power_iters,
                                   seed).astype(dtype)
        if true_n <= config.n_coarse_max or lvl == config.max_levels - 1:
            levels.append(Level(A, None, None, d_inv, lam, true_n=true_n))
            break
        Sd, So = pcsr_strength(A, config.theta)
        state = pcsr_pmis(A, Sd, So, seed=seed + lvl)
        cmap, mc_pad, nc_true = coarse_numbering(A, state)
        if nc_true >= true_n or nc_true == 0:
            levels.append(Level(A, None, None, d_inv, lam, true_n=true_n))
            break
        Pm = pcsr_interpolation(A, Sd, So, state, cmap, mc_pad, config)
        R = pcsr_transpose(Pm, rows_per_shard=mc_pad)
        RA = pcsr_spgemm(R, A)
        A_c = pcsr_spgemm(RA, Pm, pad_identity=True)
        A_c = _ensure_diag(A_c)
        levels.append(Level(A, Pm, R, d_inv, lam, true_n=true_n))
        A = A_c
        true_n = nc_true

    # replicated dense coarse pseudo-inverse from gathered triplets
    Ac = levels[-1].A
    rows, cols, vals = Ac.to_triplets()
    r = np.asarray(rows).reshape(-1)
    c = np.asarray(cols).reshape(-1)
    v = np.asarray(vals).reshape(-1)
    n_pad = Ac.row_partition.n_padded
    # build from zeros and scatter the triplets; the unit diagonal goes ONLY
    # on structurally-empty rows (coarse-numbering holes) — starting from
    # np.eye would keep a spurious 1.0 on any real row whose stored diagonal
    # is exactly 0.0, silently changing the coarsest operator (ADVICE r3)
    dense = np.zeros((n_pad, n_pad))
    keep = r >= 0
    np.add.at(dense, (r[keep], c[keep]), v[keep])
    has_entry = np.zeros((n_pad,), bool)
    has_entry[r[keep]] = True
    dense[~has_entry, ~has_entry] = 1.0
    coarse_inv = jax.device_put(
        jnp.asarray(coarse_inverse_np(dense), jnp.float32),
        replicated_sharding(mesh))
    return Hierarchy(levels, coarse_inv, config)
