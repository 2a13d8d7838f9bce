"""Fully on-device distributed COO→PCSR assembly (SURVEY.md §3.4).

The ``psparse`` analog with *no host-global matrix anywhere*: each shard
contributes a padded block of (row, col, val) triplets — duplicates and
off-owner rows legal (finite-element assembly semantics) — and one
shard_map program routes, deduplicates, and freezes them into the PCSR
own/ghost split-block layout:

    1. owner bucketing      — rank-in-bucket via sort + searchsorted
    2. triplet routing      — one ``lax.all_to_all`` of (S, K, 3) buckets
    3. local sort + dedup   — lexsort by (row, col), run segment-sum
    4. diag/ghost split     — ELL scatter with per-row slot ranks
    5. ghost discovery      — sorted-unique ghost gids per shard
    6. halo-plan build      — recv_map computed *locally* (the j-index an
       owner assigns to a request equals the rank the requester assigned,
       so no second round-trip); send_idx via one ``all_to_all`` of the
       request tables

All shapes are static: capacities (K route, W ell, G ghost, C per-pair
send) are compile-time arguments and every overflow is *counted and
returned*, never silently dropped (the no-silent-caps rule).  Setting a
capacity too small fails loudly in ``pcsr_from_coo_device``.

This replaces the host-numpy delegate in ``assembly.py`` for distributed
use; the host path remains as the correctness oracle.  Reference analog:
PartitionedArrays' ``psparse`` + ``assemble!`` (SURVEY.md §2.1 "COO
assembly" row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from parallel_amg_tpu.parallel.mesh import ROW_AXIS, row_sharding
from parallel_amg_tpu.parallel.partition import Partition
from parallel_amg_tpu.parallel.pcsr import PCSR

_BIG = np.int32(2**31 - 1)


def _rank_in_group(sort_keys, n_groups):
    """Given group ids sorted ascending (invalid = n_groups), return for
    each position its rank within its group."""
    T = sort_keys.shape[0]
    starts = jnp.searchsorted(sort_keys, jnp.arange(n_groups + 1))
    return jnp.arange(T) - starts[jnp.clip(sort_keys, 0, n_groups)]


def _assemble_kernel(r, c, v, *, S, m, mc, n_rows, n_cols, K, Wd, Wo, G, C,
                     pad_identity):
    """Per-shard assembly body (inside shard_map). r/c/v: (1, T)."""
    r, c, v = r[0], c[0], v[0]
    me = jax.lax.axis_index(ROW_AXIS)
    T = r.shape[0]

    # ---- 1+2. route triplets to their row owners -------------------------
    valid = r >= 0
    owner = jnp.where(valid, jnp.minimum(r // m, S - 1), S)
    order = jnp.argsort(owner, stable=True)
    so, sr, sc, sv = owner[order], r[order], c[order], v[order]
    pos = _rank_in_group(so, S)
    in_cap = (so < S) & (pos < K)
    route_overflow = jnp.sum((so < S) & (pos >= K))
    flat = jnp.where(in_cap, so * K + pos, S * K)
    bufr = jnp.full((S * K + 1,), -1, jnp.int32).at[flat].set(sr)[:S * K]
    bufc = jnp.zeros((S * K + 1,), jnp.int32).at[flat].set(sc)[:S * K]
    bufv = jnp.zeros((S * K + 1,), v.dtype).at[flat].set(sv)[:S * K]
    rr = jax.lax.all_to_all(bufr.reshape(S, K), ROW_AXIS, 0, 0,
                            tiled=True).reshape(-1)
    cc = jax.lax.all_to_all(bufc.reshape(S, K), ROW_AXIS, 0, 0,
                            tiled=True).reshape(-1)
    vv = jax.lax.all_to_all(bufv.reshape(S, K), ROW_AXIS, 0, 0,
                            tiled=True).reshape(-1)
    N = S * K

    # ---- 3. sort by (local row, col), sum duplicate runs -----------------
    ok = rr >= 0
    lr = jnp.where(ok, rr - me * m, m)          # invalid rows sort last
    ordl = jnp.lexsort((cc, lr))
    lr, cc, vv, ok = lr[ordl], cc[ordl], vv[ordl], ok[ordl]
    prev_same = (lr == jnp.roll(lr, 1)) & (cc == jnp.roll(cc, 1))
    newrun = ~prev_same.at[0].set(True) | ~ok  # every invalid = own run
    newrun = newrun.at[0].set(True)
    run_id = jnp.cumsum(newrun) - 1
    run_val = jax.ops.segment_sum(jnp.where(ok, vv, 0.0), run_id,
                                  num_segments=N)
    run_lr = jax.ops.segment_max(jnp.where(ok, lr, -1), run_id,
                                 num_segments=N)
    run_cc = jax.ops.segment_max(jnp.where(ok, cc, -1), run_id,
                                 num_segments=N)
    run_ok = run_lr >= 0

    # ---- 4. diag / offdiag split with per-row ELL slots ------------------
    run_idx = jnp.arange(N)
    cown = jnp.minimum(jnp.clip(run_cc, 0) // mc, S - 1)
    isdiag = run_ok & (cown == me)
    isoff = run_ok & ~isdiag
    seg_rows = jnp.where(run_ok, run_lr, m)
    first_of_row = jax.ops.segment_min(run_idx, seg_rows,
                                       num_segments=m + 1)[:m]
    fr = first_of_row[jnp.clip(run_lr, 0, m - 1)]

    def row_slot(flag):
        cs = jnp.cumsum(flag.astype(jnp.int32))
        base = cs[fr] - flag[fr].astype(jnp.int32)
        return cs - 1 - base

    slot_d = row_slot(isdiag)
    slot_o = row_slot(isoff)
    ell_overflow = (jnp.sum(isdiag & (slot_d >= Wd))
                    + jnp.sum(isoff & (slot_o >= Wo)))

    dflat = jnp.where(isdiag & (slot_d < Wd),
                      run_lr * Wd + slot_d, m * Wd)
    dc = jnp.zeros((m * Wd + 1,), jnp.int32).at[dflat].set(
        jnp.clip(run_cc - me * mc, 0))[:m * Wd].reshape(m, Wd)
    dv = jnp.zeros((m * Wd + 1,), v.dtype).at[dflat].set(
        run_val)[:m * Wd].reshape(m, Wd)

    # ---- 5. ghost discovery (sorted unique off-shard cols) ---------------
    gsort = jnp.sort(jnp.where(isoff, run_cc, _BIG))
    gnew = (gsort != jnp.roll(gsort, 1)).at[0].set(True) & (gsort < _BIG)
    grank = jnp.cumsum(gnew) - 1
    n_ghost = jnp.sum(gnew)
    ghost_overflow = jnp.sum(gnew & (grank >= G))
    gflat = jnp.where(gnew & (grank < G), grank, G)
    ghost_gids = jnp.full((G + 1,), _BIG, jnp.int32).at[gflat].set(
        gsort)[:G]
    # ghost slot of every offdiag run
    gslot = jnp.searchsorted(ghost_gids, jnp.clip(run_cc, 0))
    oflat = jnp.where(isoff & (slot_o < Wo),
                      run_lr * Wo + slot_o, m * Wo)
    oc = jnp.zeros((m * Wo + 1,), jnp.int32).at[oflat].set(
        jnp.clip(gslot, 0, G - 1))[:m * Wo].reshape(m, Wo)
    ov = jnp.zeros((m * Wo + 1,), v.dtype).at[oflat].set(
        run_val)[:m * Wo].reshape(m, Wo)

    # ---- 6. halo plan: recv_map locally, send_idx via one all_to_all -----
    karange = jnp.arange(G)
    gvalid = ghost_gids < _BIG
    gown = jnp.minimum(ghost_gids // mc, S - 1)
    first_of_owner = jnp.searchsorted(ghost_gids, jnp.arange(S) * mc)
    orank = karange - first_of_owner[gown]
    send_overflow = jnp.sum(gvalid & (orank >= C))
    recv_map = jnp.where(gvalid & (orank < C),
                         gown * C + orank, S * C).astype(jnp.int32)
    # request table: row o = the local ids I need from owner o, rank order
    qflat = jnp.where(gvalid & (orank < C), gown * C + orank, S * C)
    req = jnp.zeros((S * C + 1,), jnp.int32).at[qflat].set(
        jnp.clip(ghost_gids - gown * mc, 0))[:S * C]
    send_idx = jax.lax.all_to_all(req.reshape(S, C), ROW_AXIS, 0, 0,
                                  tiled=True)  # (S, C): send_idx[me] rows

    # ---- identity padding rows (square operators) ------------------------
    if pad_identity and n_rows == n_cols:
        rows = jnp.arange(m)
        is_pad = (me * m + rows) >= n_rows
        dc = dc.at[:, 0].set(jnp.where(is_pad, rows, dc[:, 0]))
        dv = dv.at[:, 0].set(jnp.where(is_pad, 1.0, dv[:, 0]))

    overflow = jnp.stack([route_overflow, ell_overflow, ghost_overflow,
                          send_overflow])
    return (dc[None], dv[None], oc[None], ov[None],
            send_idx[None], recv_map[None], overflow[None])


def pcsr_from_coo_device(rows, cols, vals, shape, mesh, *,
                         rows_per_shard=None, ell_width=8, off_width=8,
                         route_capacity=None, ghost_capacity=None,
                         send_capacity=None, dtype=jnp.float32,
                         pad_identity=True,
                         check_overflow=True) -> PCSR:
    """Assemble a PCSR from per-shard triplet blocks, entirely on device.

    rows/cols/vals: (S, T) arrays (device-sharded or host), global ids;
    padding entries marked ``rows == -1``.  Duplicates sum; off-owner rows
    are routed to their owners with one all_to_all.

    Capacities are static compile-time knobs; every overflow is counted on
    device and raised here (one scalar readback) — nothing is silently
    truncated.
    """
    n_rows, n_cols = shape
    S = mesh.devices.size
    rows = jnp.asarray(rows, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    vals = jnp.asarray(vals, dtype)
    assert rows.shape[0] == S, f"need (S, T) triplet blocks, S={S}"
    T = rows.shape[1]
    m = rows_per_shard or -(-n_rows // S)
    mc = m if n_rows == n_cols else -(-n_cols // S)
    K = route_capacity or T
    G = ghost_capacity or max(2 * mc, 64)
    C = send_capacity or G

    row_part = Partition(n_rows, S, m)
    col_part = Partition(n_cols, S, mc)

    kern = partial(_assemble_kernel, S=S, m=m, mc=mc, n_rows=n_rows,
                   n_cols=n_cols, K=K, Wd=ell_width, Wo=off_width, G=G,
                   C=C, pad_identity=pad_identity)
    spec = P(ROW_AXIS)
    sh = row_sharding(mesh)
    rows, cols, vals = (jax.device_put(a, sh) for a in (rows, cols, vals))
    dc, dv, oc, ov, sidx, rmap, overflow = jax.jit(
        jax.shard_map(
            kern, mesh=mesh, in_specs=(spec,) * 3, out_specs=(spec,) * 7)
    )(rows, cols, vals)

    if check_overflow:
        of = np.asarray(overflow).sum(axis=0)
        names = ["route_capacity", "ell/off_width", "ghost_capacity",
                 "send_capacity"]
        for name, cnt in zip(names, of):
            if cnt:
                raise ValueError(
                    f"device assembly overflow: {name} too small "
                    f"({int(cnt)} entries dropped) — raise the capacity")

    # Compact the halo plan to the TRUE ghost/send counts.  The requested
    # capacities are compile-time upper bounds; keeping them as the plan
    # size made every downstream exchange pay for the allowance, and worse,
    # setup chains that size the next level's capacity from this level's G
    # compounded geometrically (measured: G 48 → 3072 → 196608 over three
    # RS levels before this fix).  Ghost slots are a per-shard prefix by
    # construction (sorted-unique ranks), so slicing is exact.
    rmap_np = np.asarray(rmap)  # (S, G) — host sync shared with overflow
    valid = rmap_np < S * C
    G_true = max(int(valid.sum(axis=1).max()), 1)
    C_true = (max(int((rmap_np[valid] % C).max()) + 1, 1)
              if valid.any() else 1)
    if G_true < G or C_true < C:
        rmap = jnp.where(
            rmap < S * C, (rmap // C) * C_true + rmap % C,
            S * C_true).astype(jnp.int32)[:, :G_true]
        sidx = sidx[:, :, :C_true]

    return PCSR(diag_cols=dc, diag_vals=dv, off_cols=oc, off_vals=ov,
                send_idx=sidx, recv_map=rmap, mesh=mesh,
                row_partition=row_part, col_partition=col_part,
                true_shape=(n_rows, n_cols))
