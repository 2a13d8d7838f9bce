"""On-device solve-format conversion: ELL → DIA / TWELL without host pulls.

Why this exists (round-4 verdict, missing #6): the host converter
(`amg.hierarchy.with_best_formats`) pulls every ELL value/column plane
through the remote-TPU tunnel (~10-20 MB/s bulk) and rebuilds layouts in
numpy — measured **90.7 s** at RS-1024², more than the fused setup itself.
Everything it computes is index algebra (sorts, segmented maxima, scatters)
that the TPU does in milliseconds, so this module rebuilds the same two
solve formats fully on device:

- :func:`dia_from_ell` — banded square operators → DIA planes, built by a
  ``lax.scan`` of masked compare-select-reduce passes (no scatter).
- :func:`twell_from_ell` — everything else → TWELL piece planes, the numpy
  pipeline of ``ops.twell.TWELL.from_csr`` re-derived in jnp: lexicographic
  ``lax.sort`` (multi-key int32 — x64 stays off; a single scalar key would
  overflow int32 at 1024² operands), ``lax.cummax`` occurrence ranks, one
  scatter into the piece planes.

Only scalars (diag counts, piece counts) and the ≤192-int offset list cross
the tunnel.  Each builder is two jitted programs per operand shape (a stats
pass that sizes the output, then a build pass with static sizes), so a full
hierarchy converts in a few dozen dispatches.

Layout parity note: the TWELL built here is NOT bit-identical to the numpy
builder (every row tile gets one synthetic zero entry so tile coverage is
static, and piece padding buckets to reuse compiled kernels); the *operator*
is identical — parity is asserted by matvec equality in
tests/test_format_device.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.ops.dia import DIA
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.twell import (
    R,
    TWELL,
    WIN,
    _EFF_BW,
    _PIECE_OVERHEAD_S,
    _TUNE_SPACE,
)

_IMAX = np.iinfo(np.int32).max
_MAX_DIAGS = 192  # same cap as the host converter (hierarchy.with_best_formats)

_WGS = (1, 2, 4, 8)
_SLOTS = (2, 4, 8)


# ---------------------------------------------------------------------------
# shared: flattened entry view of an ELL (+ one dummy entry per row tile)
# ---------------------------------------------------------------------------

def _entries(cols, row_nnz, n_rows):
    """Flat (rows, cols, valid) views of an ELL's (R, W) planes."""
    W = cols.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 0).reshape(-1)
    valid = (jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 1)
             < row_nnz[:, None]).reshape(-1)
    return rows, cols.reshape(-1).astype(jnp.int32), valid


def _tile_anchor_keys(rg_key, rt, valid, n_tiles, max_g):
    """One synthetic (rt, g) piece key per row tile, anchored at the
    tile's MINIMUM real window group so it MERGES with an existing piece
    (a fixed g=0 anchor minted a junk piece for almost every tile —
    measured +30-45% pieces, the round-5 V-cycle regression).  Empty tiles
    anchor at g=0, creating the zero piece the kernel's first/last flags
    require.  These keys join piece ENUMERATION only — never the plane
    scatter."""
    m_g = jax.ops.segment_min(
        jnp.where(valid, rg_key - rt * max_g, max_g), rt,
        num_segments=n_tiles)
    m_g = jnp.where(m_g >= max_g, 0, m_g)  # empty tile → anchor at g=0
    return jnp.arange(n_tiles, dtype=jnp.int32) * max_g + m_g


# ---------------------------------------------------------------------------
# DIA
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_diags",))
def _dia_stats(cols, row_nnz, max_diags=_MAX_DIAGS + 1):
    """(n_diags, first max_diags unique offsets, nnz) of a square ELL."""
    n, W = cols.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, W), 0)
    valid = jax.lax.broadcasted_iota(jnp.int32, (n, W), 1) < row_nnz[:, None]
    off = jnp.where(valid, cols.astype(jnp.int32) - rows, _IMAX).reshape(-1)
    off_s = jnp.sort(off)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), off_s[1:] != off_s[:-1]]) & (off_s < _IMAX)
    n_diags = jnp.sum(is_first)
    slot = jnp.where(is_first, jnp.cumsum(is_first) - 1, max_diags)
    uoffs = jnp.zeros((max_diags,), jnp.int32).at[slot].set(
        off_s, mode="drop")
    return n_diags, uoffs, jnp.sum(valid)


@partial(jax.jit, static_argnames=("offsets",))
def _dia_build(cols, vals, offsets):
    """(D, n) diag planes — scan of compare-select-reduce, scatter-free.

    ELL padding entries (col=0, val=0) contribute exact zeros wherever
    their offset happens to match, so no validity mask is needed.
    """
    n, W = cols.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, W), 0)
    off = cols.astype(jnp.int32) - rows

    def step(_, o):
        return None, jnp.sum(jnp.where(off == o, vals, 0.0), axis=1)

    _, diags = jax.lax.scan(step, None, jnp.asarray(offsets, jnp.int32))
    return diags


def dia_from_ell(ell: ELL, max_diags: int = _MAX_DIAGS):
    """Device-built DIA of a square ELL, or None if > max_diags diagonals.

    Returns (dia, nnz) — nnz is reused by the caller's format policy.
    """
    if ell.n_rows != ell.n_cols:
        return None, None
    n_diags, uoffs, nnz = _dia_stats(ell.cols, ell.row_nnz)
    n_diags = int(n_diags)
    nnz = int(nnz)
    if n_diags > max_diags:
        return None, nnz
    offsets = tuple(int(o) for o in np.asarray(uoffs[:n_diags]))
    diags = _dia_build(ell.cols, ell.vals, offsets)
    return DIA(diags, offsets, ell.shape), nnz


# ---------------------------------------------------------------------------
# TWELL
# ---------------------------------------------------------------------------

def _twell_keys(rows, cols, valid, wg, max_g):
    """Lexicographic key pair: major = (rt, g) fused, minor = (lane, wi)."""
    rt = rows // R
    lane = rows % R
    w = cols // WIN
    liw = cols % WIN
    g = w // wg
    wi = w % wg
    key_rg = jnp.where(valid, rt * max_g + g, _IMAX)
    key_lw = lane * wg + wi
    return key_rg, key_lw, rt, g, wi, lane, liw


@partial(jax.jit, static_argnames=("n_rows", "n_tiles", "n_cols"))
def _twell_stats(cols, row_nnz, n_rows, n_cols, n_tiles):
    """Piece counts for every (slots, wg) config — one sort per wg.

    pieces(rt, g) for slot count s = ceil(M/s) where M is the max
    (lane, wi)-group size within (rt, g), so one sorted pass per wg yields
    the whole slots row via segment maxima.  Empty row tiles add one piece
    each (the kernel's first/last flags need every tile covered) — the
    numpy builder's ``n_tiles - covered`` term.
    """
    rows, cols, valid = _entries(cols, row_nnz, n_rows)
    E = rows.shape[0]
    iota = jnp.arange(E, dtype=jnp.int32)
    rt = rows // R
    has = jax.ops.segment_max(valid.astype(jnp.int32), rt,
                              num_segments=n_tiles)
    n_empty = n_tiles - jnp.sum(jnp.maximum(has, 0))
    counts = {}
    for wg in _WGS:
        max_g = -(-(-(-n_cols // WIN)) // wg)
        key_rg, key_lw, *_ = _twell_keys(rows, cols, valid, wg, max_g)
        rg_s, lw_s = jax.lax.sort((key_rg, key_lw), num_keys=2)
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool),
             (rg_s[1:] != rg_s[:-1]) | (lw_s[1:] != lw_s[:-1])])
        start = jax.lax.cummax(jnp.where(is_first, iota, 0))
        is_last = jnp.concatenate([is_first[1:], jnp.ones((1,), bool)])
        end = jax.lax.cummin(
            jnp.where(is_last, iota, jnp.int32(E - 1))[::-1])[::-1]
        gsize = jnp.where(rg_s < _IMAX, end - start + 1, 0)
        rg_first = jnp.concatenate(
            [jnp.ones((1,), bool), rg_s[1:] != rg_s[:-1]])
        rg_id = jnp.cumsum(rg_first) - 1
        seg_max = jax.ops.segment_max(gsize, rg_id, num_segments=E,
                                      indices_are_sorted=True)
        # empty segments come back as int32 min (the max identity) — clamp
        seg_max = jnp.maximum(seg_max, 0)
        for s in _SLOTS:
            counts[(s, wg)] = jnp.sum(-(-seg_max // s)) + n_empty
    return jnp.asarray([counts[c] for c in _TUNE_SPACE], jnp.int32)


@partial(jax.jit,
         static_argnames=("n_rows", "n_cols", "n_tiles", "slots", "wg",
                          "t_pad"))
def _twell_build(cols, vals, row_nnz, n_rows, n_cols, n_tiles, slots, wg,
                 t_pad):
    rows, cols, valid = _entries(cols, row_nnz, n_rows)
    vals = vals.reshape(-1)
    E = rows.shape[0]
    iota = jnp.arange(E, dtype=jnp.int32)
    max_g = -(-(-(-n_cols // WIN)) // wg)
    key_rg, key_lw, rt, g, wi, lane, liw = _twell_keys(
        rows, cols, valid, wg, max_g)

    # occurrence rank k within (rt, g, lane, wi)
    rg_s, lw_s, order = jax.lax.sort((key_rg, key_lw, iota), num_keys=2)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool),
         (rg_s[1:] != rg_s[:-1]) | (lw_s[1:] != lw_s[:-1])])
    k_s = iota - jax.lax.cummax(jnp.where(is_first, iota, 0))
    k = jnp.zeros((E,), jnp.int32).at[order].set(k_s)

    copy = k // slots
    k_in = k % slots

    # piece enumeration: lexicographic (rt·max_g + g, copy) over the
    # entries PLUS one per-tile anchor key (enumeration only — no scatter)
    anchors = _tile_anchor_keys(key_rg, rt, valid, n_tiles, max_g)
    comb_rg = jnp.concatenate([key_rg, anchors])
    comb_copy = jnp.concatenate([copy, jnp.zeros((n_tiles,), copy.dtype)])
    comb_iota = jnp.arange(E + n_tiles, dtype=jnp.int32)
    rg_p, copy_p, porder = jax.lax.sort((comb_rg, comb_copy, comb_iota),
                                        num_keys=2)
    p_first = jnp.concatenate(
        [jnp.ones((1,), bool),
         (rg_p[1:] != rg_p[:-1]) | (copy_p[1:] != copy_p[:-1])]
    ) & (rg_p < _IMAX)
    pid_s = jnp.cumsum(p_first) - 1  # piece index, sorted = (rt, g, copy) lex
    entry_piece = jnp.full((E + n_tiles,), t_pad, jnp.int32).at[porder].set(
        jnp.where(rg_p < _IMAX, pid_s, t_pad))[:E]
    n_pieces = jnp.sum(p_first)

    # per-piece tables; dummy (padding) pieces: rt = last tile, g = 0 —
    # they extend the final tile's run with zero FMAs and the output write
    # shifts to the final dummy's last=1 slot, so results stay correct
    tgt = jnp.where(p_first, pid_s, t_pad)
    piece_rt = jnp.full((t_pad,), n_tiles - 1, jnp.int32).at[tgt].set(
        rg_p // max_g, mode="drop")
    piece_g = jnp.zeros((t_pad,), jnp.int32).at[tgt].set(
        rg_p % max_g, mode="drop")
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (piece_rt[1:] != piece_rt[:-1]).astype(jnp.int32)])
    last = jnp.concatenate(
        [(piece_rt[1:] != piece_rt[:-1]).astype(jnp.int32),
         jnp.ones((1,), jnp.int32)])

    sub = wi * slots + k_in
    idx_plane = jnp.zeros((t_pad, wg * slots, R), jnp.int32).at[
        entry_piece, sub, lane].set(liw, mode="drop")
    val_plane = jnp.zeros((t_pad, wg * slots, R), jnp.float32).at[
        entry_piece, sub, lane].set(vals.astype(jnp.float32), mode="drop")
    return (piece_rt, piece_g, first, last, idx_plane.astype(jnp.int8),
            val_plane, n_pieces)


def _bucket(t: int) -> int:
    """Round a piece count up so similar shapes share compiled kernels."""
    if t <= 256:
        return 256
    step = max(256, 1 << (int(t - 1).bit_length() - 3))
    return -(-t // step) * step


def twell_from_ell(ell: ELL, dtype=None, slots=None, wg=None) -> TWELL:
    """Device-built TWELL of any ELL; layout chosen by the same cost model
    as the numpy builder (ops/twell.py _TUNE_SPACE sweep)."""
    n_rows, n_cols = ell.shape
    n_tiles = max(-(-n_rows // R), 1)
    # int32 key headroom: rt·max_g + g < 2^31 (multi-key sort keeps the
    # minor key separate, so only the fused (rt, g) major key must fit)
    if n_tiles * -(-(-(-n_cols // WIN)) // _WGS[0]) >= _IMAX:
        raise ValueError(
            f"operand {ell.shape} exceeds the int32 (row-tile, window-group) "
            "key space of the device TWELL builder; use the host builder")
    counts = np.asarray(
        _twell_stats(ell.cols, ell.row_nnz, n_rows, n_cols, n_tiles))
    if slots is None or wg is None:
        best, best_cost = (8, 4), np.inf
        for (s_try, wg_try), T_try in zip(_TUNE_SPACE, counts):
            plane_bytes = wg_try * s_try * R * 5 + wg_try * WIN * 8 * 4
            cost = int(T_try) * (_PIECE_OVERHEAD_S + plane_bytes / _EFF_BW)
            if cost < best_cost:
                best, best_cost = (s_try, wg_try), cost
        slots, wg = best
    t_real = int(counts[_TUNE_SPACE.index((slots, wg))])
    t_pad = _bucket(t_real)
    piece_rt, piece_g, first, last, idx, vals, _ = _twell_build(
        ell.cols, ell.vals, ell.row_nnz, n_rows, n_cols, n_tiles,
        slots, wg, t_pad)
    if dtype is not None and vals.dtype != dtype:
        vals = vals.astype(dtype)
    return TWELL(coltile=piece_g, rowtile=piece_rt, first=first, last=last,
                 idx=idx, vals=vals, shape=(n_rows, n_cols),
                 n_tiles=n_tiles, n_pieces=t_pad, slots=slots, wg=wg)


# ---------------------------------------------------------------------------
# policy (mirrors hierarchy.with_best_formats)
# ---------------------------------------------------------------------------

def best_format_from_ell(T, target_backend: str = "tpu"):
    """Convert one operator with the same policy as the host converter:
    DIA for banded square matrices (fill > 0.15 or ≤32 diagonals), TWELL
    otherwise on TPU targets, unchanged elsewhere."""
    if not isinstance(T, ELL):
        return T
    if T.n_rows == T.n_cols:
        dia, nnz = dia_from_ell(T)
        if dia is not None:
            fill = nnz / max(dia.n_diags * T.n_rows, 1)
            if fill > 0.15 or dia.n_diags <= 32:
                return dia
    if target_backend == "tpu":
        return twell_from_ell(T)
    return T
