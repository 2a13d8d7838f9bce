"""On-device classical (Ruge-Stüben) AMG setup — the algebraic path.

Mandated by BASELINE.json:5 ("Setup-phase SpGEMM and coarse/fine splitting
run on-device").  All O(n)/O(nnz) work is jnp over ELL planes:

- classical strength: rowwise max + mask (no comm);
- PMIS splitting: Luby-style independent-set rounds in a ``lax.while_loop``
  over the symmetrized strength graph (the parallel-RS algorithm hypre uses
  — SURVEY.md §2.3), with random weights from the device PRNG;
- interpolation, three tiers (config.interpolation):
  "extended_i" — TRUE distance-two extended+i (chunked candidate-table
  vectorization of the oracle algorithm, entrywise parity-tested);
  "smoothed_direct" — direct + one Jacobi pass P ← (I−ωD⁻¹A)P truncated
  to p_max (the cheap production default for the acceptance scales);
  "direct" — distance-one only;
- Galerkin: R = ell_transpose(P), A_c = (R·A)·P via the ESC ell_spgemm.

The host orchestrates level shapes (one width sync per product) — the same
setup/solve split as the structured path.
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.amg.hierarchy import Hierarchy, Level
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.ell_setup import (
    ell_prune,
    ell_spgemm,
    ell_spgemm_pairwise,
    ell_transpose,
)

UNDECIDED, FINE, COARSE = 0, 1, 2

# which path the most recent device_rs_setup_fused call took —
# "scheduled" (async shape-schedule replay) or "level-serialized";
# reporting tools (bench.py) record it next to setup_s
LAST_SETUP_PATH = "level-serialized"


def classical_strength_mask(A: ELL, theta: float):
    """(R, W) bool strong-connection mask: |a_ij| ≥ θ·max_{k≠i}|a_ik|."""
    r_iota = jax.lax.broadcasted_iota(jnp.int32, A.cols.shape, 0)
    offd = A.mask() & (A.cols != r_iota)
    absa = jnp.where(offd, jnp.abs(A.vals), 0.0)
    rowmax = jnp.max(absa, axis=1)
    return offd & (absa >= theta * rowmax[:, None]) & (absa > 0)


def pmis_split_device(A: ELL, S, seed: int = 0, max_rounds: int = 64):
    """PMIS C/F splitting on device. Returns (n,) int32 of FINE/COARSE.

    The symmetrized local-max test needs, for each i, the max weight over
    undecided j with S[j, i] (the Sᵀ row).  Rather than materializing the
    transpose (a sort+scatter with a data-dependent output width — a host
    sync that would block fusing the whole splitting into one jitted
    program), that max is computed directly with a ``segment_max`` scatter
    over S's entries: exact same set, exact max, jit-safe static shapes.
    """
    n = A.n_rows
    cols = A.cols
    # influence counts |S^T_i| via scatter-sum over columns
    influence = jax.ops.segment_sum(
        S.astype(jnp.float32).reshape(-1), cols.reshape(-1), num_segments=n
    )
    key = jax.random.PRNGKey(seed)
    w = influence + jax.random.uniform(key, (n,))

    # isolated points (no strong connections either way) → COARSE
    has_out = jnp.any(S, axis=1)
    has_in = jax.ops.segment_sum(
        S.astype(jnp.int32).reshape(-1), cols.reshape(-1), num_segments=n
    ) > 0
    state0 = jnp.where(has_out | has_in, UNDECIDED, COARSE).astype(jnp.int32)

    def round_body(carry):
        state, k = carry
        und = state == UNDECIDED
        # max undecided-neighbor weight over S rows
        w_j = jnp.take(w, cols, axis=0)
        und_j = jnp.take(und, cols, axis=0)
        m1 = jnp.max(jnp.where(S & und_j, w_j, -1.0), axis=1)
        # ... and over S^T rows: scatter w[j] into each strong column of an
        # undecided row j, segment_max by column id
        contrib = jnp.where(S & und[:, None], w[:, None], -1.0)
        m2 = jax.ops.segment_max(
            contrib.reshape(-1), cols.reshape(-1), num_segments=n)
        m2 = jnp.maximum(m2, -1.0)  # segment_max default is -inf
        is_max = und & (w > jnp.maximum(m1, m2))
        state = jnp.where(is_max, COARSE, state)
        # undecided points that strongly depend on a COARSE point → FINE
        st_j = jnp.take(state, cols, axis=0)
        dep_c = jnp.any(S & (st_j == COARSE), axis=1)
        state = jnp.where((state == UNDECIDED) & dep_c, FINE, state)
        return state, k + 1

    def cond(carry):
        state, k = carry
        return jnp.any(state == UNDECIDED) & (k < max_rounds)

    state, _ = jax.lax.while_loop(cond, round_body, (state0, 0))
    # safety: anything still undecided becomes COARSE (cannot happen for
    # max_rounds >= O(log n), but keeps the result well-defined)
    return jnp.where(state == UNDECIDED, COARSE, state).astype(jnp.int32)


def direct_interpolation_device(A: ELL, S, state, p_max: int):
    """Classical direct interpolation as a device ELL (width = p_max).

    C rows carry the identity; F rows distribute over strong C neighbors
    with the positive/negative split (matches oracle.direct_interpolation).
    """
    n = A.n_rows
    r_iota = jax.lax.broadcasted_iota(jnp.int32, A.cols.shape, 0)
    offd = A.mask() & (A.cols != r_iota)
    a = jnp.where(A.mask(), A.vals, 0.0)
    st_j = jnp.take(state, A.cols, axis=0)
    strong_c = S & (st_j == COARSE)

    neg = offd & (a < 0)
    pos = offd & (a > 0)
    sum_n_neg = jnp.sum(jnp.where(neg, a, 0.0), axis=1)
    sum_n_pos = jnp.sum(jnp.where(pos, a, 0.0), axis=1)
    sum_c_neg = jnp.sum(jnp.where(strong_c & neg, a, 0.0), axis=1)
    sum_c_pos = jnp.sum(jnp.where(strong_c & pos, a, 0.0), axis=1)
    diag = jnp.sum(jnp.where(A.cols == r_iota, a, 0.0), axis=1)
    diag = diag + jnp.where(sum_c_pos == 0.0, sum_n_pos, 0.0)
    alpha = jnp.where(sum_c_neg != 0, sum_n_neg / jnp.where(sum_c_neg == 0, 1, sum_c_neg), 0.0)
    beta = jnp.where(sum_c_pos != 0, sum_n_pos / jnp.where(sum_c_pos == 0, 1, sum_c_pos), 0.0)
    coef = jnp.where(a < 0, alpha[:, None], beta[:, None])
    wts = jnp.where(strong_c, -coef * a / diag[:, None], 0.0)

    cmap = jnp.cumsum((state == COARSE).astype(jnp.int32)) - 1
    nc = int(cmap[-1]) + 1  # host sync
    pcols_full = jnp.where(strong_c, jnp.take(cmap, A.cols, axis=0), 0)

    # compact strong-C entries to the front of each row, keep top p_max |w|
    k = min(p_max, wts.shape[1])
    topv, topi = jax.lax.top_k(jnp.abs(jnp.where(strong_c, wts, 0.0)), k)
    pv = jnp.take_along_axis(wts, topi, axis=1)
    pc = jnp.take_along_axis(pcols_full, topi, axis=1)
    kept = topv > 0
    # rescale kept weights so row sums are preserved
    total = jnp.sum(wts, axis=1)
    keptsum = jnp.sum(jnp.where(kept, pv, 0.0), axis=1)
    scale = jnp.where(keptsum != 0, total / jnp.where(keptsum == 0, 1, keptsum), 1.0)
    pv = jnp.where(kept, pv * scale[:, None], 0.0)
    pc = jnp.where(kept, pc, 0)
    row_nnz = jnp.sum(kept, axis=1).astype(jnp.int32)

    # overwrite C rows with identity
    is_c = state == COARSE
    pv = jnp.where(is_c[:, None],
                   jnp.concatenate([jnp.ones((n, 1), pv.dtype),
                                    jnp.zeros((n, k - 1), pv.dtype)], axis=1),
                   pv)
    pc = jnp.where(is_c[:, None],
                   jnp.concatenate([cmap[:, None],
                                    jnp.zeros((n, k - 1), jnp.int32)], axis=1),
                   pc)
    row_nnz = jnp.where(is_c, 1, row_nnz)
    return ELL(pc.astype(jnp.int32), pv, row_nnz, (n, nc))


def _compact_masked(cols, vals, mask, w_max: int | None = None):
    """Per-row compaction of masked ELL entries to the front.

    Returns (cols', vals', mask') of width w_max (default: synced max
    count).  Order within a row is preserved (stable)."""
    key = jnp.where(mask, 0, 1)
    order = jnp.argsort(key, axis=1, stable=True)
    cols_s = jnp.take_along_axis(cols, order, axis=1)
    vals_s = jnp.take_along_axis(vals, order, axis=1)
    mask_s = jnp.take_along_axis(mask, order, axis=1)
    if w_max is None:
        w_max = max(int(jnp.max(jnp.sum(mask, axis=1))), 1)  # host sync
    return cols_s[:, :w_max], vals_s[:, :w_max], mask_s[:, :w_max]


def extended_i_interpolation_device(A: ELL, S, state, p_max: int,
                                    row_chunk: int | None = None,
                                    static_widths=None) -> ELL:
    """TRUE distance-two extended+i interpolation on device.

    Exact vectorization of ``oracle.extended_i_interpolation`` (the
    hypre-style PMIS partner): for F-point i the interpolatory set Ĉ_i is
    its strong C-neighbors plus the strong C-neighbors of its strong
    F-neighbors; each strong-F coupling a_ik distributes over
    (Ĉ_i ∪ {i}) ∩ row(k) proportionally to same-sign couplings, the i-share
    and weak couplings lump onto the diagonal, and rows truncate to the
    p_max largest |w| with row-sum rescale.

    Set-membership tests become chunked candidate-table comparisons
    ((chunk, f_max, W, K) bool with K = c_max·(1+f_max)); rows are
    processed in ``lax.map`` chunks sized to bound that intermediate.
    Parity-tested entrywise against the oracle (tests/test_extended_i.py).

    ``static_widths=(c_max, f_max, nc)`` supplies the data-dependent table
    widths and coarse count as host ints so the whole function traces
    inside one jitted program (the fused setup path); ``None`` reads them
    back eagerly (three small host syncs).
    """
    n = A.n_rows
    W = A.cols.shape[1]
    st_j = jnp.take(state, A.cols, axis=0)
    strong_c = S & (st_j == COARSE)
    strong_f = S & (st_j != COARSE)

    if static_widths is not None:
        c_w, f_w, nc = (max(int(v), 1) for v in static_widths)
    else:
        c_w = f_w = None
    CC, _, CCm = _compact_masked(A.cols, A.vals, strong_c, c_w)
    FF, FFa, FFm = _compact_masked(A.cols, A.vals, strong_f, f_w)
    c_max = CC.shape[1]
    f_max = FF.shape[1]
    K = c_max * (1 + f_max)

    cmap = jnp.cumsum((state == COARSE).astype(jnp.int32)) - 1
    if static_widths is None:
        nc = int(cmap[-1]) + 1  # host sync

    if row_chunk is None:
        # bound the (chunk, f_max, W, K) bool at ~64 MB
        row_chunk = max(min(4096, (1 << 26) // max(f_max * W * K, 1)), 64)
    pad_rows = (-n) % row_chunk
    SENT = jnp.int32(n)

    def chunk(args):
        r0, ac, av, am, sc, sf = args
        ch = ac.shape[0]
        rid = r0 + jnp.arange(ch)
        live = rid < n
        # Ĉ_i candidate-id table (global row ids; may contain duplicates)
        ccc = jnp.where(sc, ac, SENT)  # own strong-C cols, width W → compact?
        # own strong-C compacted table for this chunk
        occ = jnp.take(CC, jnp.clip(rid, 0, n - 1), axis=0)
        ocm = jnp.take(CCm, jnp.clip(rid, 0, n - 1), axis=0) & live[:, None]
        fF = jnp.take(FF, jnp.clip(rid, 0, n - 1), axis=0)
        fFa = jnp.take(FFa, jnp.clip(rid, 0, n - 1), axis=0)
        fFm = jnp.take(FFm, jnp.clip(rid, 0, n - 1), axis=0) & live[:, None]
        Ck = jnp.take(CC, fF, axis=0)                  # (ch, f_max, c_max)
        Ckm = jnp.take(CCm, fF, axis=0) & fFm[..., None]
        chat = jnp.concatenate(
            [jnp.where(ocm, occ, SENT),
             jnp.where(Ckm, Ck, SENT).reshape(ch, f_max * c_max)], axis=1)

        # own-entry pass
        isdiag = (ac == rid[:, None]) & am
        in_chat = jnp.any((ac[:, :, None] == chat[:, None, :])
                          & (chat[:, None, :] < SENT), axis=2)
        own_num = jnp.where(am & in_chat & ~isdiag, av, 0.0)
        diag = jnp.sum(jnp.where(isdiag, av, 0.0), axis=1)
        diag = diag + jnp.sum(
            jnp.where(am & ~isdiag & ~in_chat & ~sf, av, 0.0), axis=1)

        # strong-F distribution
        kr_c = jnp.take(A.cols, fF, axis=0)            # (ch, f_max, W)
        kr_v = jnp.take(A.vals, fF, axis=0)
        kr_m = jnp.take(A.mask(), fF, axis=0) & fFm[..., None]
        sign_ok = kr_v * fFa[..., None] > 0
        m_is_i = kr_c == rid[:, None, None]
        m_in_chat = jnp.any(
            (kr_c[..., None] == chat[:, None, None, :])
            & (chat[:, None, None, :] < SENT), axis=3)
        # membership restricted to C points (Ĉ is all-C by construction,
        # but a duplicate id could also be an F point's id — Ĉ ids are C by
        # construction so no extra test needed)
        dist_m = kr_m & sign_ok & (m_in_chat | m_is_i)
        denom = jnp.sum(jnp.where(dist_m, kr_v, 0.0), axis=2)
        has_d = denom != 0
        share = jnp.where(
            dist_m & has_d[..., None],
            fFa[..., None] * kr_v / jnp.where(denom == 0, 1.0,
                                              denom)[..., None], 0.0)
        diag = diag + jnp.sum(jnp.where(fFm & ~has_d, fFa, 0.0), axis=1)
        diag = diag + jnp.sum(jnp.where(m_is_i, share, 0.0), axis=(1, 2))

        cand_c = jnp.concatenate(
            [jnp.where(own_num != 0, ac, SENT),
             jnp.where((share != 0) & ~m_is_i, kr_c,
                       SENT).reshape(ch, f_max * W)], axis=1)
        cand_v = jnp.concatenate(
            [own_num, jnp.where(~m_is_i, share, 0.0).reshape(ch, f_max * W)],
            axis=1)
        cand_v = jnp.where(cand_c < SENT, cand_v, 0.0)

        # dedup by global C id, then w = -num/diag
        Kc = cand_c.shape[1]
        order = jnp.argsort(cand_c, axis=1, stable=True)
        cols_s = jnp.take_along_axis(cand_c, order, axis=1)
        vals_s = jnp.take_along_axis(cand_v, order, axis=1)
        first = jnp.concatenate(
            [jnp.ones((ch, 1), bool), cols_s[:, 1:] != cols_s[:, :-1]],
            axis=1) & (cols_s < SENT)
        pos = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
        flat = (jnp.arange(ch)[:, None] * Kc
                + jnp.clip(pos, 0, Kc - 1)).reshape(-1)
        dsum = jax.ops.segment_sum(vals_s.reshape(-1), flat,
                                   num_segments=ch * Kc).reshape(ch, Kc)
        dcol = jax.ops.segment_max(
            jnp.where(first, cols_s, 0).reshape(-1) * first.reshape(-1),
            flat, num_segments=ch * Kc).reshape(ch, Kc)
        nnz = jnp.where(first.any(axis=1), pos[:, -1] + 1, 0)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (ch, Kc), 1)
        live_slot = w_iota < nnz[:, None]
        safe_diag = jnp.where(diag == 0, 1.0, diag)
        wts = jnp.where(live_slot, -dsum / safe_diag[:, None], 0.0)

        # truncate to p_max (|w| top-k, row-sum rescale) — truncate_P analog
        k = min(p_max, Kc)
        topv, topi = jax.lax.top_k(jnp.abs(wts), k)
        pv = jnp.take_along_axis(wts, topi, axis=1)
        pcg = jnp.take_along_axis(dcol, topi, axis=1)
        kept = topv > 0
        total = jnp.sum(wts, axis=1)
        keptsum = jnp.sum(jnp.where(kept, pv, 0.0), axis=1)
        scale = jnp.where(keptsum != 0,
                          total / jnp.where(keptsum == 0, 1.0, keptsum), 1.0)
        pv = jnp.where(kept, pv * scale[:, None], 0.0)
        pc = jnp.where(kept, jnp.take(cmap, jnp.clip(pcg, 0, n - 1)), 0)

        # C rows: identity onto own coarse id
        is_c = jnp.take(state, jnp.clip(rid, 0, n - 1)) == COARSE
        own_cid = jnp.take(cmap, jnp.clip(rid, 0, n - 1))
        pv = jnp.where(is_c[:, None],
                       jnp.concatenate([jnp.ones((ch, 1), pv.dtype),
                                        jnp.zeros((ch, k - 1), pv.dtype)],
                                       axis=1), pv)
        pc = jnp.where(is_c[:, None],
                       jnp.concatenate([own_cid[:, None],
                                        jnp.zeros((ch, k - 1), jnp.int32)],
                                       axis=1), pc)
        row_nnz = jnp.where(is_c, 1, jnp.sum(kept, axis=1)).astype(jnp.int32)
        return pc.astype(jnp.int32), pv, row_nnz

    ac = jnp.pad(A.cols, ((0, pad_rows), (0, 0)))
    av = jnp.pad(A.vals, ((0, pad_rows), (0, 0)))
    am = jnp.pad(A.mask(), ((0, pad_rows), (0, 0)))
    sc = jnp.pad(strong_c, ((0, pad_rows), (0, 0)))
    sf = jnp.pad(strong_f, ((0, pad_rows), (0, 0)))
    n_ch = (n + pad_rows) // row_chunk
    r0s = jnp.arange(n_ch) * row_chunk
    pc, pv, rn = jax.lax.map(
        chunk,
        (r0s,
         ac.reshape(n_ch, row_chunk, W), av.reshape(n_ch, row_chunk, W),
         am.reshape(n_ch, row_chunk, W), sc.reshape(n_ch, row_chunk, W),
         sf.reshape(n_ch, row_chunk, W)))
    k = pc.shape[2]
    return ELL(pc.reshape(-1, k)[:n], pv.reshape(-1, k)[:n],
               rn.reshape(-1)[:n], (n, nc))


def smooth_interpolation(A: ELL, P: ELL, omega: float, p_max: int) -> ELL:
    """P ← (I − ω D⁻¹A) P, truncated to p_max entries/row (row sums kept).

    The Jacobi interpolation-improvement that recovers most of the
    extended+i quality on PMIS grids with one ESC SpGEMM.
    """
    d = A.diagonal()
    d_inv = jnp.where(d != 0, 1.0 / d, 0.0)
    DA = ELL(A.cols, -omega * d_inv[:, None] * A.vals, A.row_nnz, A.shape)
    AP = ell_spgemm(DA, P)
    # P + AP (aligned add via spgemm with identity is wasteful; do ESC merge)
    n = A.n_rows
    eye = ELL(
        jnp.arange(n, dtype=jnp.int32)[:, None],
        jnp.ones((n, 1), P.vals.dtype),
        jnp.ones((n,), jnp.int32),
        (n, n),
    )
    P2 = ell_spgemm(eye, P)  # re-compacted copy of P (same layout domain)
    merged = _ell_add(P2, AP)
    return _ell_topk(merged, p_max)


def _ell_add(X: ELL, Y: ELL) -> ELL:
    """X + Y for ELLs with identical shape (ESC merge)."""
    n, nc = X.shape
    cols = jnp.concatenate([X.cols, Y.cols], axis=1)
    vals = jnp.concatenate([
        jnp.where(X.mask(), X.vals, 0.0),
        jnp.where(Y.mask(), Y.vals, 0.0),
    ], axis=1)
    valid = jnp.concatenate([X.mask(), Y.mask()], axis=1)
    merged = ELL(jnp.where(valid, cols, 0), jnp.where(valid, vals, 0.0),
                 jnp.sum(valid, axis=1).astype(jnp.int32), (n, nc))
    # route through spgemm-style compaction: sort+dedup
    R, K = merged.cols.shape
    SENT = jnp.int32(nc)
    key = jnp.where(valid, cols, SENT)
    order = jnp.argsort(key, axis=1, stable=True)
    cols_s = jnp.take_along_axis(key, order, axis=1)
    vals_s = jnp.take_along_axis(vals, order, axis=1)
    vals_s = jnp.where(cols_s < SENT, vals_s, 0.0)
    is_first = jnp.concatenate(
        [jnp.ones((R, 1), bool), cols_s[:, 1:] != cols_s[:, :-1]], axis=1
    ) & (cols_s < SENT)
    pos = jnp.cumsum(is_first.astype(jnp.int32), axis=1) - 1
    row_nnz = jnp.where(is_first.any(axis=1), pos[:, -1] + 1, 0)
    width = max(int(jnp.max(row_nnz)), 1)
    pos_c = jnp.clip(pos, 0, width - 1)
    flat = (jnp.arange(R)[:, None] * width + pos_c).reshape(-1)
    ovals = jax.ops.segment_sum(vals_s.reshape(-1), flat,
                                num_segments=R * width).reshape(R, width)
    ocols = jax.ops.segment_max(
        (jnp.where(is_first, cols_s, 0)).reshape(-1) * is_first.reshape(-1),
        flat, num_segments=R * width).reshape(R, width)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (R, width), 1)
    pad = w_iota >= row_nnz[:, None]
    return ELL(jnp.where(pad, 0, ocols).astype(jnp.int32),
               jnp.where(pad, 0.0, ovals),
               row_nnz.astype(jnp.int32), (n, nc))


def _ell_topk(P: ELL, p_max: int) -> ELL:
    """Keep the p_max largest-|v| entries per row, rescaled to preserve
    row sums (device analog of oracle.truncate_P)."""
    k = min(p_max, P.cols.shape[1])
    absv = jnp.where(P.mask(), jnp.abs(P.vals), 0.0)
    topv, topi = jax.lax.top_k(absv, k)
    pv = jnp.take_along_axis(P.vals, topi, axis=1)
    pc = jnp.take_along_axis(P.cols, topi, axis=1)
    kept = topv > 0
    total = jnp.sum(jnp.where(P.mask(), P.vals, 0.0), axis=1)
    keptsum = jnp.sum(jnp.where(kept, pv, 0.0), axis=1)
    scale = jnp.where(keptsum != 0,
                      total / jnp.where(keptsum == 0, 1, keptsum), 1.0)
    pv = jnp.where(kept, pv * scale[:, None], 0.0)
    return ELL(jnp.where(kept, pc, 0).astype(jnp.int32), pv,
               jnp.sum(kept, axis=1).astype(jnp.int32), P.shape)


# ---------------------------------------------------------------------------
# Fused-driver program factories (module-level, lru_cached)
#
# The fused driver used to build its jitted programs as fresh closures on
# every call: each setup re-traced every program even when the shapes were
# identical (an in-process rerun paid the full ~5 s of tracing again), and
# the scheduled fast path below could not share executables with the
# level-serialized path.  Factories keyed on the true statics fix both.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def _plast_prog(n, want_cheb, power_iters, seed):
    @jax.jit
    def p_last(cols, vals, row_nnz):
        A = ELL(cols, vals, row_nnz, (n, n))
        diag = A.diagonal()
        d_inv = jnp.where(diag != 0, 1.0 / diag, 0.0)
        lam = (_ell_lambda_max(A, d_inv, power_iters, seed) if want_cheb
               else jnp.asarray(0.0, vals.dtype))
        return d_inv, lam

    return p_last


@functools.lru_cache(maxsize=256)
def _p1_prog(n, theta, want_cheb, power_iters, seed, seed_lvl):
    @jax.jit
    def p1(cols, vals, row_nnz):
        A = ELL(cols, vals, row_nnz, (n, n))
        diag = A.diagonal()
        d_inv = jnp.where(diag != 0, 1.0 / diag, 0.0)
        lam = (_ell_lambda_max(A, d_inv, power_iters, seed)
               if want_cheb else jnp.asarray(0.0, vals.dtype))
        S = classical_strength_mask(A, theta)
        state = pmis_split_device(A, S, seed=seed_lvl)
        st_j = jnp.take(state, cols, axis=0)
        strong_c = S & (st_j == COARSE)
        strong_f = S & (st_j != COARSE)
        counts = jnp.stack([
            jnp.sum((state == COARSE).astype(jnp.int32)),
            jnp.max(jnp.sum(strong_c.astype(jnp.int32), axis=1)),
            jnp.max(jnp.sum(strong_f.astype(jnp.int32), axis=1)),
        ])
        return d_inv, lam, S, state, counts

    return p1


@functools.lru_cache(maxsize=256)
def _p2_prog(n, nc, c_max, f_max, p_max, use_gather):
    @jax.jit
    def p2(cols, vals, row_nnz, S, state):
        W = cols.shape[1]
        A = ELL(cols, vals, row_nnz, (n, n))
        P = extended_i_interpolation_device(
            A, S, state, p_max, static_widths=(c_max, f_max, nc))
        if use_gather:
            AP = None
        else:
            Kap = W * P.cols.shape[1]
            AP = ell_spgemm_pairwise(A, P, out_width=Kap,
                                     row_chunk=_pairwise_chunk(Kap),
                                     strict=False)
        pm = P.mask()
        t_counts = jax.ops.segment_sum(
            pm.astype(jnp.int32).reshape(-1),
            jnp.where(pm, P.cols, nc).reshape(-1),
            num_segments=nc + 1)[:nc]
        widths = jnp.stack([
            jnp.max(AP.row_nnz) if AP is not None else jnp.int32(0),
            jnp.maximum(jnp.max(t_counts), 1)])
        return P, AP, widths

    return p2


@functools.lru_cache(maxsize=256)
def _p3_prog(n, nc, t_w, K3):
    @jax.jit
    def p3(Pc, Pv, Pn, APc, APv, APn):
        Pe = ELL(Pc, Pv, Pn, (n, nc))
        APe = ELL(APc, APv, APn, (n, nc))
        R = ell_transpose(Pe, out_width=t_w)
        Ac = ell_spgemm_pairwise(R, APe, out_width=K3,
                                 row_chunk=_pairwise_chunk(K3),
                                 strict=False)
        Ac = ell_prune(Ac, tol=0.0, out_width=K3)
        return R, Ac, jnp.maximum(jnp.max(Ac.row_nnz), 1)

    return p3


# ---------------------------------------------------------------------------
# Shape-schedule cache
#
# For a fixed (matrix, config, seed) the per-level static widths the fused
# driver reads back — (nc, c_max, f_max) after P1, (ap_w, t_w) after P2,
# w_c after P3 — are deterministic.  Each readback is a full pipeline
# barrier: Python blocks until the level EXECUTES before it can even trace
# the next program, so a fresh 1024² setup serializes ~19 programs' worth
# of trace + executable-load + execute through a 27 ms-RTT tunnel.
#
# The schedule cache records those few dozen ints (shape metadata only —
# NO numerical data) keyed by a content hash of the matrix.  With a
# schedule, the driver dispatches every level's programs asynchronously
# (tracing level k+1 overlaps executing level k), then fetches the
# recorded counters once at the end and VERIFIES them against the
# schedule; any mismatch discards the run and rebuilds level-by-level, so
# a stale or colliding schedule costs time, never correctness.
# ---------------------------------------------------------------------------


def _schedule_dir() -> str:
    d = os.environ.get("PAT_RS_SCHEDULE_DIR")
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".cache",
                         "parallel_amg_tpu", "rs_schedules")
    return d


def _schedule_load(key: str):
    try:
        with open(os.path.join(_schedule_dir(), key + ".json")) as f:
            sched = json.load(f)
        return sched if isinstance(sched, list) and sched else None
    except (OSError, ValueError):
        return None


def _schedule_save(key: str, sched) -> None:
    try:
        d = _schedule_dir()
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, key + ".tmp")
        with open(tmp, "w") as f:
            json.dump(sched, f)
        os.replace(tmp, os.path.join(d, key + ".json"))
    except OSError:
        pass  # cache is best-effort


def _fingerprint(parts, config: AMGConfig, seed: int) -> str:
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        a = np.ascontiguousarray(p)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    h.update(repr((config.theta, config.p_max, config.n_coarse_max,
                   config.max_levels, config.interpolation,
                   config.smoother, config.lambda_power_iters,
                   seed)).encode())
    return h.hexdigest()


def device_rs_setup(A, config: AMGConfig, dtype=jnp.float32,
                    seed: int = 0, fused: bool | str = "auto") -> Hierarchy:
    """On-device classical-AMG setup from a device ELL (or host CSR).

    ``fused="auto"`` routes the extended+i path through the fused per-level
    driver (:func:`device_rs_setup_fused`) on TPU: ~3 jitted programs per
    level instead of thousands of eager op dispatches — the difference
    between an unmeasurable (>580 s at 256²) and a ~20 s warm fresh setup
    when the device sits behind a ~27 ms-RTT dispatch tunnel (VERDICT r3
    item 4).  On CPU the eager path stays the default: dispatch is cheap
    there and the fused programs' XLA:CPU compiles dominate (128 s at 64²
    vs seconds eager).  ``fused=True/False`` forces either driver.
    """
    from parallel_amg_tpu.ops.csr import CSR

    schedule_key = None
    if isinstance(A, ELL):
        A_ell = A
    else:
        csr = A if isinstance(A, CSR) else CSR.from_scipy(
            A.to_csr().to_scipy() if hasattr(A, "to_csr") else A
        )
        A_ell = ELL.from_csr(csr, dtype=dtype)
        # host data is in hand — fingerprint it for the shape-schedule
        # cache (~100 ms of hashing vs the level-serialized readbacks it
        # saves; ELL device inputs skip the key rather than pull planes
        # back through the tunnel)
        schedule_key = _fingerprint(
            (csr.indptr, csr.indices, csr.data), config, seed)
    if fused == "auto":
        fused = (config.interpolation == "extended_i"
                 and jax.default_backend() == "tpu")
    if fused:
        if config.interpolation != "extended_i":
            raise ValueError("fused RS setup implements extended_i only")
        return device_rs_setup_fused(A_ell, config, seed=seed,
                                     schedule_key=schedule_key)

    import os as _os
    import sys as _sys
    import time as _time

    verbose = _os.environ.get("PAT_SETUP_VERBOSE") == "1"
    _t0 = _time.perf_counter()

    def _log(msg):
        if verbose:
            print(f"[rs-setup +{_time.perf_counter() - _t0:.1f}s] {msg}",
                  file=_sys.stderr, flush=True)

    levels: List[Level] = []
    for lvl in range(config.max_levels):
        n = A_ell.n_rows
        _log(f"level {lvl}: n={n} W={A_ell.cols.shape[1]}")
        diag = A_ell.diagonal()
        d_inv = jnp.where(diag != 0, 1.0 / diag, 0.0)
        lam = jnp.asarray(0.0, dtype)
        if config.smoother == "chebyshev":
            lam = _ell_lambda_max(A_ell, d_inv, config.lambda_power_iters,
                                  seed)
        if n <= config.n_coarse_max or lvl == config.max_levels - 1:
            levels.append(Level(A_ell, None, None, d_inv, lam))
            break
        S = classical_strength_mask(A_ell, config.theta)
        state = pmis_split_device(A_ell, S, seed=seed + lvl)
        _log("  pmis done")
        if config.interpolation == "extended_i":
            P = extended_i_interpolation_device(A_ell, S, state,
                                                config.p_max)
        else:
            P = direct_interpolation_device(A_ell, S, state,
                                            config.p_max * 2)
            if config.interpolation == "smoothed_direct":
                P = smooth_interpolation(A_ell, P, config.jacobi_omega,
                                         config.p_max)
        _log(f"  interp done (nc={P.shape[1]}, Wp={P.cols.shape[1]})")
        if P.shape[1] >= n:
            levels.append(Level(A_ell, None, None, d_inv, lam))
            break
        R = ell_transpose(P)
        _log(f"  transpose done (Wr={R.cols.shape[1]})")
        RA = ell_spgemm(R, A_ell)
        _log(f"  RA done (W={RA.cols.shape[1]})")
        A_c = ell_spgemm(RA, P)
        A_c = ell_prune(A_c, tol=0.0)
        _log(f"  Ac done (W={A_c.cols.shape[1]})")
        levels.append(Level(A_ell, P, R, d_inv, lam))
        A_ell = A_c
    from parallel_amg_tpu.amg.hierarchy import coarse_inverse_np

    coarse_inv = jnp.asarray(
        coarse_inverse_np(np.asarray(
            levels[-1].A.to_csr().to_dense(), np.float64)),
        jnp.float32,
    )
    return Hierarchy(levels, coarse_inv, config)


def _pairwise_chunk(K: int, budget_bytes: int = 1 << 28) -> int:
    """Row-chunk size bounding the (chunk, K, K) dedup intermediates."""
    return max(min(4096, budget_bytes // max(K * K * 5, 1)), 16)


# gather_spgemm pays ~8 extra program dispatches + plan builds per level;
# its 8.7×/5.2× product speedups (docs/SPGEMM.md) amortize that only when
# dispatch is cheap.  Measured A/B at RS-1024² (artifacts/
# rs_setup_engines.json): through the remote-compile tunnel the gather
# path LOSES 6.7 s warm (program-load + dispatch ≫ the ~0.7 s of product
# savings), so auto mode keys on a one-time measured dispatch latency —
# exactly the "pays off when dispatch is local" policy docs/SPGEMM.md
# stated.  262144 rows ≈ the 512² operand where the product win is ~5×.
_GATHER_MIN_ROWS = 262144
_DISPATCH_LOCAL_THRESHOLD_S = 5e-3
_dispatch_local: bool | None = None


def _dispatch_is_local() -> bool:
    """One-time probe: median wall time of a trivial dispatch+fetch.

    ~0.1-1 ms on a locally attached chip; ~30-60 ms through the axon
    remote tunnel (whose remote compiler also reproducibly WEDGES on the
    2^20-row gather-kernel compile — tcp_recvmsg block, 3/3 attempts
    2026-08-21 — so tunnel deployments must not auto-select gather even
    if the latency were acceptable)."""
    global _dispatch_local
    if _dispatch_local is None:
        import time as _t

        ts = []
        x = jnp.zeros((8,), jnp.float32)
        f = jax.jit(lambda v: v + 1.0)
        float(f(x)[0])  # compile outside the timed window
        for _ in range(3):
            t0 = _t.perf_counter()
            float(f(x)[0])
            ts.append(_t.perf_counter() - t0)
        _dispatch_local = sorted(ts)[1] < _DISPATCH_LOCAL_THRESHOLD_S
    return _dispatch_local


def _spgemm_engine(n_rows: int) -> bool:
    """True → rank-plane Pallas gather engine for this level's products."""
    mode = os.environ.get("PAT_RS_SPGEMM", "auto")
    if mode == "gather":
        return True
    if mode == "pairwise":
        return False
    return n_rows >= _GATHER_MIN_ROWS and _dispatch_is_local()


def _rs_finish(levels: List[Level], config: AMGConfig) -> Hierarchy:
    from parallel_amg_tpu.amg.hierarchy import coarse_inverse_np

    coarse_inv = jnp.asarray(
        coarse_inverse_np(np.asarray(
            levels[-1].A.to_csr().to_dense(), np.float64)),
        jnp.float32,
    )
    return Hierarchy(levels, coarse_inv, config)


def _rs_scheduled(A_ell: ELL, config: AMGConfig, seed: int, sched,
                  _log) -> Hierarchy | None:
    """Replay a recorded shape schedule with zero intermediate syncs.

    Dispatches every level's P1/P2/P3 back-to-back (jax dispatch is
    async: tracing level k+1 overlaps executing level k on device), then
    fetches the recorded width counters ONCE at the end and verifies them
    entry-by-entry against the schedule.  Returns None on any mismatch —
    the caller rebuilds level-serialized, so a stale schedule can cost
    time but never correctness.
    """
    want_cheb = config.smoother == "chebyshev"
    levels: List[Level] = []
    checks = []  # (device array, expected tuple)
    for i, e in enumerate(sched):
        n, W = int(e["n"]), int(e["W"])
        if A_ell.n_rows != n or A_ell.cols.shape[1] != W:
            return None
        if e.get("last"):
            if i != len(sched) - 1:
                return None
            d_inv, lam = _plast_prog(
                n, want_cheb, config.lambda_power_iters, seed)(
                A_ell.cols, A_ell.vals, A_ell.row_nnz)
            levels.append(Level(A_ell, None, None, d_inv, lam))
            break
        if e.get("gather"):
            return None  # gather plans need per-level readbacks
        nc, c_max, f_max = int(e["nc"]), int(e["c_max"]), int(e["f_max"])
        ap_w, t_w, w_c = int(e["ap_w"]), int(e["t_w"]), int(e["w_c"])
        if not (0 < nc < n and min(c_max, f_max, ap_w, t_w, w_c) >= 1):
            return None
        d_inv, lam, S, state, counts = _p1_prog(
            n, config.theta, want_cheb, config.lambda_power_iters,
            seed, seed + i)(A_ell.cols, A_ell.vals, A_ell.row_nnz)
        checks.append((counts, (nc, c_max, f_max)))
        P, AP, w2 = _p2_prog(n, nc, c_max, f_max, config.p_max, False)(
            A_ell.cols, A_ell.vals, A_ell.row_nnz, S, state)
        checks.append((w2, (ap_w, t_w)))
        AP = ELL(AP.cols[:, :ap_w], AP.vals[:, :ap_w], AP.row_nnz, AP.shape)
        K3 = t_w * ap_w
        R, Ac, wc_arr = _p3_prog(n, nc, t_w, K3)(
            P.cols, P.vals, P.row_nnz, AP.cols, AP.vals, AP.row_nnz)
        checks.append((wc_arr, (w_c,)))
        levels.append(Level(A_ell, P, R, d_inv, lam))
        A_ell = ELL(Ac.cols[:, :w_c], Ac.vals[:, :w_c], Ac.row_nnz,
                    (nc, nc))
    else:
        return None  # schedule never reached a last level
    _log(f"scheduled dispatch done ({len(levels)} levels); verifying")
    for got_arr, exp in checks:
        got = tuple(int(v) for v in
                    np.asarray(got_arr).reshape(-1)[:len(exp)])
        if got != exp:
            _log(f"schedule VERIFY FAILED: recorded {exp} actual {got}")
            return None
    _log("schedule verified")
    return _rs_finish(levels, config)


def device_rs_setup_fused(A_ell: ELL, config: AMGConfig, seed: int = 0,
                          schedule_key: str | None = None) -> Hierarchy:
    """Fused on-device RS setup: O(1) jitted programs per level.

    The eager driver dispatches thousands of individual XLA ops per level;
    behind the remote-TPU tunnel each dispatch pays ~27 ms RTT, so a fresh
    1024² setup measured 255 s against ~1.5 s of arithmetic (docs/SPGEMM.md).
    This driver traces each level into three programs, separated only by
    the host readbacks that static shapes genuinely require — and when a
    recorded shape schedule exists for (matrix, config, seed)
    (``schedule_key``, see ``_rs_scheduled``), it skips even those:
    every program is dispatched asynchronously and the recorded widths
    are verified against the program outputs once at the end, falling
    back to the level-serialized pass here on any mismatch.  The
    level-serialized readbacks are:

      P1  strength → PMIS → (d⁻¹, λ_max) + counts   → read (nc, c_max, f_max)
      P2  extended+i P (static tables) + A·P at full
          candidate width + transpose/AP widths      → read (ap_w, t_w)
      P3  R = Pᵀ (static t_w) + Galerkin R·(AP) at
          full width + zero-prune + final width      → read w_c

    The Galerkin product associates as R·(A·P) (the eager path computes
    (R·A)·P) — same operator up to f32 reorder; products run at the full
    candidate width, which cannot overflow, so the no-silent-caps contract
    holds without eager strict checks.

    SpGEMM engine dispatch (round-4 verdict item 6 — the measured-winning
    Pallas kernel must be reachable from production): levels with
    n ≥ ``_GATHER_MIN_ROWS`` route both Galerkin products through the
    rank-plane Pallas ``gather_spgemm`` (ops/gspgemm.py — 8.7×/5.2× over
    the pairwise ESC at the real 1024² A·P / R·(AP) operands,
    docs/SPGEMM.md), with its plan built ON DEVICE
    (``GatherSpgemmPlan.from_ell_device``) so no operand crosses the
    tunnel.  Smaller levels keep the single-program pairwise path — the
    gather pipeline costs ~8 extra dispatches/level, which only pays above
    the crossover.  Override with ``PAT_RS_SPGEMM=pairwise|gather|auto``.
    """
    import os as _os
    import sys as _sys
    import time as _time

    verbose = _os.environ.get("PAT_SETUP_VERBOSE") == "1"
    _t0 = _time.perf_counter()

    def _log(msg):
        if verbose:
            print(f"[rs-fused +{_time.perf_counter() - _t0:.1f}s] {msg}",
                  file=_sys.stderr, flush=True)

    global LAST_SETUP_PATH
    LAST_SETUP_PATH = "level-serialized"
    if schedule_key is not None:
        sched = _schedule_load(schedule_key)
        if sched is not None:
            _log(f"shape schedule hit ({len(sched)} levels) — "
                 "async dispatch")
            h = _rs_scheduled(A_ell, config, seed, sched, _log)
            if h is not None:
                LAST_SETUP_PATH = "scheduled"
                return h
            _log("schedule replay failed — rebuilding level-serialized")

    levels: List[Level] = []
    sched_out = []
    want_cheb = config.smoother == "chebyshev"

    for lvl in range(config.max_levels):
        n = A_ell.n_rows
        W = A_ell.cols.shape[1]
        is_last = n <= config.n_coarse_max or lvl == config.max_levels - 1
        _log(f"level {lvl}: n={n} W={W} last={is_last}")

        if is_last:
            d_inv, lam = _plast_prog(
                n, want_cheb, config.lambda_power_iters, seed)(
                A_ell.cols, A_ell.vals, A_ell.row_nnz)
            levels.append(Level(A_ell, None, None, d_inv, lam))
            sched_out.append({"n": n, "W": W, "last": True})
            break

        d_inv, lam, S, state, counts = _p1_prog(
            n, config.theta, want_cheb, config.lambda_power_iters,
            seed, seed + lvl)(A_ell.cols, A_ell.vals, A_ell.row_nnz)
        nc, c_max, f_max = (int(v) for v in np.asarray(counts))
        _log(f"  p1 done (nc={nc} c_max={c_max} f_max={f_max})")
        if nc >= n or nc == 0:
            levels.append(Level(A_ell, None, None, d_inv, lam))
            # the scheduled replay treats this break as a plain last level
            # (_plast_prog recomputes the same d_inv/λ from A alone)
            sched_out.append({"n": n, "W": W, "last": True})
            break

        use_gather = _spgemm_engine(n)
        entry = {"n": n, "W": W, "last": False, "gather": use_gather,
                 "nc": nc, "c_max": c_max, "f_max": f_max}
        sched_out.append(entry)

        P, AP, w2 = _p2_prog(n, nc, c_max, f_max, config.p_max,
                             use_gather)(
            A_ell.cols, A_ell.vals, A_ell.row_nnz, S, state)
        ap_w, t_w = (int(v) for v in np.asarray(w2))
        if use_gather:
            from parallel_amg_tpu.ops.gspgemm import (
                GatherSpgemmPlan,
                gather_spgemm,
            )

            Kap = W * P.cols.shape[1]
            plan_a = GatherSpgemmPlan.from_ell_device(A_ell)
            AP = gather_spgemm(plan_a, P, out_width=Kap, strict=False)
            ap_w = max(int(jnp.max(AP.row_nnz)), 1)
            _log(f"  p2 done (gather A·P: T={plan_a.n_pieces} "
                 f"ap_w={ap_w} t_w={t_w})")
        else:
            _log(f"  p2 done (ap_w={ap_w} t_w={t_w})")
        AP = ELL(AP.cols[:, :ap_w], AP.vals[:, :ap_w], AP.row_nnz, AP.shape)

        K3 = t_w * ap_w

        if use_gather:
            # the transpose is FUSED with the R-plan piece count in one
            # program: a standalone 1M-row ell_transpose program is a
            # reproducible remote-compile wedge on the tunnel (observed
            # rounds 3 and 5; the same op inside a larger program
            # compiles fine), and the plan stats need R anyway
            from parallel_amg_tpu.ops.gspgemm import (
                R_TILE as _GRT,
                _plan_build,
                _plan_bucket,
                _plan_stats,
            )

            n_tiles_r = max(-(-nc // _GRT), 1)

            @jax.jit
            def p3a(Pc, Pv, Pn, n=n, nc=nc, t_w=t_w):
                R = ell_transpose(ELL(Pc, Pv, Pn, (n, nc)),
                                  out_width=t_w)
                t_real = _plan_stats(R.cols, R.vals, R.row_nnz,
                                     nc, n, n_tiles_r)
                return R, t_real

            R, t_real = p3a(P.cols, P.vals, P.row_nnz)
            t_pad_r = _plan_bucket(int(t_real))
            pw, prt, pf, pl_, pidx, pvals = _plan_build(
                R.cols, R.vals, R.row_nnz, nc, n, n_tiles_r, t_pad_r)
            plan_r = GatherSpgemmPlan(
                coltile=pw, rowtile=prt, first=pf, last=pl_,
                idx=pidx, vals=pvals, shape=(nc, n),
                n_tiles=n_tiles_r, n_pieces=t_pad_r,
                Wa=R.cols.shape[1])
            Ac = gather_spgemm(plan_r, AP, out_width=K3, strict=False)

            @jax.jit
            def p3b(Cc, Cv, Cn, nc=nc, K3=K3):
                Ac = ell_prune(ELL(Cc, Cv, Cn, (nc, nc)), tol=0.0,
                               out_width=K3)
                return Ac, jnp.maximum(jnp.max(Ac.row_nnz), 1)

            Ac, w_c = p3b(Ac.cols, Ac.vals, Ac.row_nnz)
            w_c = int(w_c)
            _log(f"  p3 done (gather R·AP: T={plan_r.n_pieces} w_c={w_c})")
        else:
            R, Ac, w_c = _p3_prog(n, nc, t_w, K3)(
                P.cols, P.vals, P.row_nnz,
                AP.cols, AP.vals, AP.row_nnz)
            w_c = int(w_c)
            _log(f"  p3 done (w_c={w_c})")
        entry.update({"ap_w": ap_w, "t_w": t_w, "w_c": w_c})
        levels.append(Level(A_ell, P, R, d_inv, lam))
        A_ell = ELL(Ac.cols[:, :w_c], Ac.vals[:, :w_c], Ac.row_nnz,
                    (nc, nc))

    if schedule_key is not None and sched_out and sched_out[-1].get("last"):
        _schedule_save(schedule_key, sched_out)
    return _rs_finish(levels, config)


def _ell_lambda_max(A: ELL, d_inv, iters: int, seed: int = 0):
    key = jax.random.PRNGKey(seed)
    x0 = jax.random.uniform(key, (A.n_rows,), A.vals.dtype) - 0.5

    def body(i, carry):
        x, lam = carry
        y = d_inv * A.matvec(x)
        nrm = jnp.linalg.norm(y)
        lam = jnp.where(nrm > 0, nrm, lam)
        return y / jnp.maximum(nrm, 1e-30), lam

    _, lam = jax.lax.fori_loop(0, iters, body,
                               (x0, jnp.asarray(1.0, x0.dtype)))
    return 1.1 * lam
