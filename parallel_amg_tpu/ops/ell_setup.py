"""Device ELL setup kernels: transpose and SpGEMM (SURVEY.md §2.2).

These run in the setup phase (once per level), so sort/scatter-based
formulations are acceptable; shapes are resolved dynamically between ops by
the host orchestration (eager dispatch) while each op itself is static.

- ``ell_transpose``: sort entries by column, rank within column via a
  segmented scan, scatter into the transposed planes.
- ``ell_spgemm``: expand-sort-compress (ESC): candidate products
  B.cols[A.cols] (R, Wa·Wb), per-row sort by column, segmented duplicate
  sum, compact to the true output width — the static-shape answer to
  SURVEY.md §7 hard-part 1 (sparse×sparse with data-dependent fill-in).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.ops.ell import ELL


def _rank_within_groups(sorted_keys):
    """For a sorted 1D key array: rank of each element within its run."""
    n = sorted_keys.shape[0]
    idx = jnp.arange(n)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, idx, 0)
    )
    return idx - group_start


# Row-count ceiling for the single-shot transpose: programs containing a
# global sort/scatter over a 2^20-row operand reproducibly WEDGE the
# remote-tunnel XLA compiler (observed rounds 4-5: standalone 1M-row
# ell_transpose 3/3, and this round the fused RS driver's L0 P3 at 1024²
# stalled >25 min while a fresh small program compiled in 1.8 s —
# docs/RS_SETUP.md).  Above the ceiling the transpose runs in row chunks
# inside a fori_loop: same entry ordering (chunks are ascending row
# ranges, stable within), so the output is bitwise identical.
_TRANSPOSE_CHUNK_ROWS = 1 << 19


def ell_transpose(ell: ELL, out_width: int | None = None,
                  row_chunk: int | None = None) -> ELL:
    """Aᵀ in ELL, on device (one host sync for the output width)."""
    R, W = ell.cols.shape
    n_rows, n_cols = ell.shape
    if row_chunk is None:
        row_chunk = _TRANSPOSE_CHUNK_ROWS
    if out_width is None:
        col_counts = jax.ops.segment_sum(
            ell.mask().astype(jnp.int32).reshape(-1),
            ell.cols.reshape(-1), num_segments=n_cols
        )
        out_width = max(int(jnp.max(col_counts)), 1)  # host sync
    if R > row_chunk:
        return _ell_transpose_chunked(ell, out_width, row_chunk)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0).reshape(-1)
    cols = ell.cols.reshape(-1)
    vals = ell.vals.reshape(-1)
    valid = ell.mask().reshape(-1)
    key = jnp.where(valid, cols, n_cols)  # invalid entries sort last
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    rank = _rank_within_groups(key_s)
    # +1 trash row: invalid entries scatter there instead of clobbering (0,0)
    t_cols = jnp.zeros((n_cols + 1, out_width), jnp.int32)
    t_vals = jnp.zeros((n_cols + 1, out_width), ell.vals.dtype)
    ok = key_s < n_cols
    dest_c = jnp.where(ok, key_s, n_cols)
    dest_r = jnp.where(ok, jnp.minimum(rank, out_width - 1), 0)
    src_rows = rows[order]
    src_vals = jnp.where(ok, vals[order], 0.0)
    t_cols = t_cols.at[dest_c, dest_r].set(jnp.where(ok, src_rows, 0))
    t_vals = t_vals.at[dest_c, dest_r].add(src_vals)
    t_cols = t_cols[:n_cols]
    t_vals = t_vals[:n_cols]
    t_nnz = jax.ops.segment_sum(
        valid.astype(jnp.int32), cols, num_segments=n_cols
    )
    return ELL(t_cols, t_vals, t_nnz.astype(jnp.int32), (n_cols, n_rows))


def _compact_width(C: ELL) -> ELL:
    """Slice an over-allocated ELL down to its true max row width (one
    host sync).  Slots past each row's nnz are already zeroed."""
    w = max(int(jnp.max(C.row_nnz)), 1)
    return ELL(C.cols[:, :w], C.vals[:, :w], C.row_nnz, C.shape)


def ell_spgemm(A: ELL, B: ELL, out_width: int | None = None,
               strict: bool = True) -> ELL:
    """C = A @ B in ELL via expand-sort-compress (device; one host sync
    for the output width unless provided).

    Large-R dispatch: XLA's small-axis sort collapses above ~10^5 rows
    (measured 2.7–4× slower than the sort-free pairwise dedup at
    512²–1024²; docs/SPGEMM.md), so when the candidate width K = Wa·Wb is
    modest the pairwise variant runs instead — at width K when out_width is
    unknown (no overflow possible; compacted after one nnz sync), so the
    fast path is reachable from the setup chain's ``out_width=None`` calls.

    Overflow semantics (both variants): with an explicit ``out_width``,
    whole column-runs beyond it are routed to a trash slot — dropped, never
    mis-summed into a surviving slot — and ``strict=True`` (eager calls
    only) raises with the dropped-entry count, matching the
    no-silent-caps rule of passembly_device.  Output column ORDER differs
    between the variants (sorted vs first-occurrence); the (col, val) sets
    are identical.
    """
    R, Wa = A.cols.shape
    Wb = B.cols.shape[1]
    K = Wa * Wb
    # dispatch is TPU-measured (XLA's TPU small-axis sort is the collapse;
    # the CPU sort is fine and the K² expansion is not)
    if R > 16384 and K <= 128 and jax.default_backend() == "tpu":
        if out_width is not None:
            return ell_spgemm_pairwise(A, B, out_width, strict=strict)
        return _compact_width(
            ell_spgemm_pairwise(A, B, K, strict=False))  # K never overflows
    n_cols_out = B.shape[1]
    SENT = jnp.int32(n_cols_out)

    brows_cols = jnp.take(B.cols, A.cols, axis=0)  # (R, Wa, Wb)
    brows_vals = jnp.take(B.vals, A.cols, axis=0)
    brows_mask = jnp.take(B.mask(), A.cols, axis=0)
    cand_vals = (A.vals[:, :, None] * brows_vals).reshape(R, K)
    valid = (A.mask()[:, :, None] & brows_mask).reshape(R, K)
    cand_cols = jnp.where(valid, brows_cols.reshape(R, K), SENT)

    order = jnp.argsort(cand_cols, axis=1, stable=True)
    cols_s = jnp.take_along_axis(cand_cols, order, axis=1)
    vals_s = jnp.take_along_axis(cand_vals, order, axis=1)
    vals_s = jnp.where(cols_s < SENT, vals_s, 0.0)

    is_first = jnp.concatenate(
        [jnp.ones((R, 1), bool), cols_s[:, 1:] != cols_s[:, :-1]], axis=1
    )
    is_first = is_first & (cols_s < SENT)
    pos = jnp.cumsum(is_first.astype(jnp.int32), axis=1) - 1  # (R, K)
    row_nnz = jnp.where(is_first.any(axis=1), pos[:, -1] + 1, 0)
    # strict is an eager-only check (concrete host readback); under tracing
    # (jit/while_loop) it silently degrades to strict=False (ADVICE r3)
    check_overflow = (strict and out_width is not None
                      and not isinstance(row_nnz, jax.core.Tracer))
    if out_width is None:
        out_width = max(int(jnp.max(row_nnz)), 1)  # host sync
    # runs at pos >= out_width go whole to the trash slot (slot out_width):
    # dropped and counted, never summed into a surviving column
    pos_c = jnp.where(pos < out_width, pos, out_width)
    flat_ids = (jnp.arange(R)[:, None] * (out_width + 1) + pos_c).reshape(-1)
    c_vals = jax.ops.segment_sum(
        vals_s.reshape(-1), flat_ids, num_segments=R * (out_width + 1)
    ).reshape(R, out_width + 1)[:, :out_width]
    col_write = jnp.where(is_first, cols_s, 0)
    c_cols = jax.ops.segment_max(
        col_write.reshape(-1) * is_first.reshape(-1),
        flat_ids, num_segments=R * (out_width + 1),
    ).reshape(R, out_width + 1)[:, :out_width]
    if check_overflow:
        dropped = int(jnp.sum(jnp.maximum(row_nnz - out_width, 0)))
        if dropped:
            raise ValueError(
                f"ell_spgemm: out_width={out_width} too small — {dropped} "
                "product entries dropped; raise out_width")
    row_nnz = jnp.minimum(row_nnz, out_width)
    # zero out padding slots
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (R, out_width), 1)
    pad = w_iota >= row_nnz[:, None]
    c_cols = jnp.where(pad, 0, c_cols).astype(jnp.int32)
    c_vals = jnp.where(pad, 0.0, c_vals)
    return ELL(c_cols, c_vals, row_nnz.astype(jnp.int32),
               (R, n_cols_out))


def ell_prune(ell: ELL, tol: float = 0.0, out_width: int | None = None) -> ELL:
    """Drop |v| <= tol entries and re-compact rows (device)."""
    keep = ell.mask() & (jnp.abs(ell.vals) > tol)
    R, W = ell.cols.shape
    key = jnp.where(keep, ell.cols, ell.shape[1])
    order = jnp.argsort(key, axis=1, stable=True)
    cols_s = jnp.take_along_axis(key, order, axis=1)
    vals_s = jnp.take_along_axis(ell.vals, order, axis=1)
    row_nnz = jnp.sum(keep, axis=1).astype(jnp.int32)
    if out_width is None:
        out_width = max(int(jnp.max(row_nnz)), 1)
    cols_o = cols_s[:, :out_width]
    vals_o = vals_s[:, :out_width]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (R, out_width), 1)
    pad = w_iota >= row_nnz[:, None]
    return ELL(
        jnp.where(pad, 0, cols_o).astype(jnp.int32),
        jnp.where(pad, 0.0, vals_o),
        row_nnz,
        ell.shape,
    )


def ell_spgemm_pairwise(A: ELL, B: ELL, out_width: int,
                        row_chunk: int = 4096, strict: bool = True) -> ELL:
    """C = A @ B via sort-free pairwise dedup — the TPU-fast ESC variant.

    The classic ESC's per-row sort is the measured bottleneck on TPU (XLA's
    small-axis sort path collapses above ~10^5 rows: 457 ms for a 262k-row
    5-point square vs ~0.1 ms of traffic — docs/SPGEMM.md).  This variant
    replaces sort+segment-sum with an O(K²)-per-row equality matrix, which
    the VPU eats as dense elementwise work:

        E[k, j]  = cand_cols[k] == cand_cols[j]
        first[j] = no k < j with E[k, j]          (duplicate leader test)
        acc[j]   = Σ_k vals[k] · E[k, j]          (duplicate sum, no sort)

    then compacts leaders to ``out_width`` slots with a cumsum rank.  Rows
    are processed in chunks via ``lax.map`` to bound the (chunk, K, K)
    intermediate.  Same (col, val) set as ``ell_spgemm`` (parity-tested);
    column ORDER is first-occurrence, not sorted.  Leaders beyond
    ``out_width`` land in a trash slot — dropped and counted, and
    ``strict=True`` raises on any drop (eager/setup calls only).
    K = Wa·Wb must be modest (setup products: K ≲ 200 ⇒ K² ≲ 4·10⁴/row).
    """
    R, Wa = A.cols.shape
    Wb = B.cols.shape[1]
    n_cols_out = B.shape[1]
    K = Wa * Wb
    SENT = jnp.int32(n_cols_out)

    pad_rows = (-R) % row_chunk
    a_cols = jnp.pad(A.cols, ((0, pad_rows), (0, 0)))
    a_vals = jnp.pad(A.vals, ((0, pad_rows), (0, 0)))
    a_mask = jnp.pad(A.mask(), ((0, pad_rows), (0, 0)))
    Rp = R + pad_rows

    def chunk(args):
        ac, av, am = args  # (ch, Wa)
        bc = jnp.take(B.cols, ac, axis=0)          # (ch, Wa, Wb)
        bv = jnp.take(B.vals, ac, axis=0)
        bm = jnp.take(B.mask(), ac, axis=0)
        vals = (av[:, :, None] * bv).reshape(-1, K)
        ok = (am[:, :, None] & bm).reshape(-1, K)
        cols = jnp.where(ok, bc.reshape(-1, K), SENT)
        vals = jnp.where(ok, vals, 0.0)
        E = cols[:, :, None] == cols[:, None, :]    # (ch, K, K)
        low = jnp.tril(jnp.ones((K, K), bool), k=-1)
        first = ok & ~jnp.any(E & low[None], axis=1)
        acc = jnp.einsum("rk,rkj->rj", vals, E.astype(vals.dtype))
        pos = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
        row_nnz = jnp.sum(first, axis=1)
        pos_c = jnp.where(first & (pos < out_width), pos, out_width)
        ch = ac.shape[0]
        flat = (jnp.arange(ch)[:, None] * (out_width + 1) + pos_c)
        cc = jnp.zeros((ch * (out_width + 1),), jnp.int32).at[
            flat.reshape(-1)].set(jnp.where(first, cols, 0).reshape(-1))
        cv = jnp.zeros((ch * (out_width + 1),), vals.dtype).at[
            flat.reshape(-1)].set(jnp.where(first, acc, 0.0).reshape(-1))
        cc = cc.reshape(ch, out_width + 1)[:, :out_width]
        cv = cv.reshape(ch, out_width + 1)[:, :out_width]
        return cc, cv, row_nnz.astype(jnp.int32)

    n_ch = Rp // row_chunk
    cc, cv, rn = jax.lax.map(
        chunk,
        (a_cols.reshape(n_ch, row_chunk, Wa),
         a_vals.reshape(n_ch, row_chunk, Wa),
         a_mask.reshape(n_ch, row_chunk, Wa)))
    cc = cc.reshape(Rp, out_width)[:R]
    cv = cv.reshape(Rp, out_width)[:R]
    rn_true = rn.reshape(Rp)[:R]
    if strict and not isinstance(rn_true, jax.core.Tracer):
        # eager-only check; under tracing degrades to strict=False
        dropped = int(jnp.sum(jnp.maximum(rn_true - out_width, 0)))
        if dropped:
            raise ValueError(
                f"ell_spgemm_pairwise: out_width={out_width} too small — "
                f"{dropped} product entries dropped; raise out_width")
    rn = jnp.minimum(rn_true, out_width)
    return ELL(cc, cv, rn, (R, n_cols_out))
