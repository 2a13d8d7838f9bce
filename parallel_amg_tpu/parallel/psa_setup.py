"""Distributed ON-DEVICE algebraic smoothed-aggregation setup over PCSR.

VERDICT r3 item 5: the last host-oracle fallback in the distributed setup.
Ports ``amg.device_sa``'s parallel Vanek substitution — distance-2 Luby-MIS
seeding + strongest-connection attachment — under ``shard_map`` with ghost
exchange over the PCSR halo plan, so an irregular 100M-DOF SA problem can be
set up with no host-global matrix anywhere in the call graph.

Communication pattern (each stage one shard_map program):
- SA strength: one ghost fetch of the diagonal (the symmetric
  |a_ij| ≥ θ√(a_ii·a_jj) test needs d_j for halo columns);
- distance-2 MIS: per Luby round, four ghost fetches (candidate weights,
  one-hop maxima, new-seed flags, one-hop reach) — the two-hop neighborhood
  max and reach are each composed from two one-hop exchanges;
- attachment: one ghost fetch of aggregate ids per phase (two phases);
- tentative/smoothed P, Galerkin: the same distributed transpose + ESC
  SpGEMM chain as the classical path (``prs_setup``).

Symmetry assumption: strength and attachment traverse OUT-edges only, which
equals the full adjacency when A's sparsity pattern is symmetric — the SPD
setting SA is defined for (hypre/PyAMG make the same assumption).  The
single-device ``device_sa`` handles asymmetric patterns via an explicit
transpose; here a transpose per Luby round would double the exchange count
for matrices outside SA's domain.

Deviations from the single-device path (both documented level-equivalence,
not entrywise parity — the same contract as PMIS-for-RS):
- diagonal-only rows (coarse-numbering holes, padding, isolated points) do
  not aggregate — they stay inert identity rows, exactly like the
  distributed RS path's FINE classification of such rows;
- aggregate numbering is shard-padded (owner s's k-th seed → s·mc_pad+k),
  so hierarchies differ from ``device_sa`` by aggregate ids/tie-breaks;
  parity is asserted at the convergence level (tests/test_psa_setup.py).
"""

from __future__ import annotations

from typing import List

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from parallel_amg_tpu.amg.hierarchy import Hierarchy, Level
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.parallel.mesh import ROW_AXIS
from parallel_amg_tpu.parallel.pcsr import PCSR
from parallel_amg_tpu.parallel.prs_setup import (
    _NEG,
    _assemble_grow,
    _ensure_diag,
    _fetch,
    _pcsr_lambda_max,
    coarse_numbering,
    pcsr_spgemm,
    pcsr_transpose,
)

FINE, COARSE = 1, 2


# ---------------------------------------------------------------------------
# SA strength (one ghost fetch of the diagonal)
# ---------------------------------------------------------------------------

def pcsr_sa_strength(A: PCSR, theta: float):
    """Symmetric SA strength masks |a_ij| ≥ θ·√(|a_ii·a_jj|) over the
    split-block planes → ((S, m, Wd), (S, m, Wo)) bool."""
    m = A.row_partition.rows_per_shard

    def kernel(dc, dv, oc, ov, sidx, rmap):
        dc, dv, oc, ov = dc[0], dv[0], oc[0], ov[0]
        sidx, rmap = sidx[0], rmap[0]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, dc.shape, 0)
        isdiag = (dc == r_iota) & (dv != 0)
        d = jnp.abs(jnp.sum(jnp.where(isdiag, dv, 0.0), axis=1))
        d_g = jnp.abs(_fetch(sidx, rmap, d, 0.0))
        dmask = (dv != 0) & (dc != r_iota)
        omask = ov != 0
        da = jnp.where(dmask, jnp.abs(dv), 0.0)
        oa = jnp.where(omask, jnp.abs(ov), 0.0)
        th_d = theta * jnp.sqrt(d[:, None] * d[dc])
        th_o = theta * jnp.sqrt(d[:, None] * d_g[oc])
        Sd = dmask & (da >= th_d - 1e-30) & (da > 0)
        So = omask & (oa >= th_o - 1e-30) & (oa > 0)
        return Sd[None], So[None]

    spec = P(ROW_AXIS)
    return jax.jit(jax.shard_map(
        kernel, mesh=A.mesh, in_specs=(spec,) * 6, out_specs=(spec,) * 2,
    ))(A.diag_cols, A.diag_vals, A.off_cols, A.off_vals,
       A.send_idx, A.recv_map)


# ---------------------------------------------------------------------------
# distance-2 MIS seeding (Luby rounds with ghost exchanges)
# ---------------------------------------------------------------------------

def pcsr_mis_seed(A: PCSR, Sd, So, seed: int = 0, max_rounds: int = 64):
    """Distance-2 MIS over the strength graph → global (S·m,) int32 state
    (COARSE on seeds).  Mirrors ``device_sa.mis_aggregate`` phase 0: no two
    seeds within two hops, every strongly-connected node within two hops of
    a seed.  Diagonal-only rows never seed (inert — module docstring)."""
    S = A.n_shards
    m = A.row_partition.rows_per_shard
    n_pad = S * m

    # weights: random PERMUTATION of row ids (int32) — all-distinct by
    # construction, exact integer compares.  f32 uniform weights only carry
    # ~2^24 distinct values, so at multi-million-row scale two nodes within
    # two hops tie and BOTH seed, breaking the distance-2 MIS invariant
    # (round-4 advisor finding).
    w_rand = jax.random.permutation(
        jax.random.PRNGKey(seed), n_pad).astype(jnp.int32)
    _NEGI = jnp.int32(jnp.iinfo(jnp.int32).min + 1)

    def kernel(sd, so, dc, oc, sidx, rmap, wr):
        sd, so, dc, oc = sd[0], so[0], dc[0], oc[0]
        sidx, rmap = sidx[0], rmap[0]

        def nmax(v, v_g):
            md = jnp.max(jnp.where(sd, v[dc], _NEGI), axis=1)
            mo = jnp.max(jnp.where(so, v_g[oc], _NEGI), axis=1)
            return jnp.maximum(md, mo)

        def reach(f, f_g):
            # bool flags ride the exchange as int32 (pred all_to_all is
            # backend-dependent)
            return (jnp.any(sd & (f[dc] > 0), axis=1)
                    | jnp.any(so & (f_g[oc] > 0), axis=1))

        w = wr
        has_strong = jnp.any(sd, axis=1) | jnp.any(so, axis=1)

        def round_body(carry):
            cand, seeds, k, _ = carry
            wc = jnp.where(cand, w, _NEGI)
            wc_g = _fetch(sidx, rmap, wc, _NEGI)
            h = jnp.maximum(wc, nmax(wc, wc_g))
            h_g = _fetch(sidx, rmap, h, _NEGI)
            m2hop = nmax(h, h_g)
            is_max = cand & (m2hop <= w)
            seeds = seeds | is_max
            f = is_max.astype(jnp.int32)
            f_g = _fetch(sidx, rmap, f, jnp.int32(0))
            r1 = reach(f, f_g)
            r1i = r1.astype(jnp.int32)
            r1_g = _fetch(sidx, rmap, r1i, jnp.int32(0))
            cand = cand & ~is_max & ~r1 & ~reach(r1i, r1_g)
            nc = jax.lax.psum(jnp.sum(cand), ROW_AXIS)
            return cand, seeds, k + 1, nc

        cand0 = has_strong
        seed0 = jax.lax.pcast(jnp.zeros((m,), bool), (ROW_AXIS,),
                              to="varying")
        n0 = jax.lax.psum(jnp.sum(cand0), ROW_AXIS)
        cand, seeds, _, _ = jax.lax.while_loop(
            lambda c: (c[3] > 0) & (c[2] < max_rounds), round_body,
            (cand0, seed0, 0, n0))
        seeds = seeds | cand  # safety past max_rounds
        return jnp.where(seeds, COARSE, FINE).astype(jnp.int32)

    spec = P(ROW_AXIS)
    return jax.jit(jax.shard_map(
        kernel, mesh=A.mesh, in_specs=(spec,) * 7, out_specs=spec,
    ))(Sd, So, A.diag_cols, A.off_cols, A.send_idx, A.recv_map, w_rand)


def pcsr_attach(A: PCSR, Sd, So, cmap):
    """Two strongest-connection attachment phases → (agg global (S·m,)
    int32: aggregate id, -1 = strongly-connected but unreached, -2 = inert
    (no strong connections); leftover = global count of -1).  Phase 1
    attaches to seed neighborhoods, phase 2 to any aggregated neighbor —
    identical member sets to ``device_sa.mis_aggregate`` phases 1-2."""
    m = A.row_partition.rows_per_shard

    def kernel(sd, so, dc, dv, oc, ov, sidx, rmap, cm):
        sd, so, dc, dv, oc, ov = (sd[0], so[0], dc[0], dv[0], oc[0], ov[0])
        sidx, rmap, cm = sidx[0], rmap[0], cm[0]
        agg = cm  # seeds carry their id; everyone else -1
        for _ in range(2):
            agg_g = _fetch(sidx, rmap, agg, jnp.int32(-1))
            mem_d = sd & (agg[dc] >= 0)
            mem_o = so & (agg_g[oc] >= 0)
            sc_d = jnp.where(mem_d, jnp.abs(dv), _NEG)
            sc_o = jnp.where(mem_o, jnp.abs(ov), _NEG)
            bd = jnp.max(sc_d, axis=1)
            bo = jnp.max(sc_o, axis=1)
            ad = jnp.take_along_axis(
                agg[dc], jnp.argmax(sc_d, axis=1)[:, None], axis=1)[:, 0]
            ao = jnp.take_along_axis(
                agg_g[oc], jnp.argmax(sc_o, axis=1)[:, None], axis=1)[:, 0]
            best = jnp.where(bd >= bo, ad, ao)
            score = jnp.maximum(bd, bo)
            agg = jnp.where((agg < 0) & (score > _NEG), best, agg)
        has_strong = jnp.any(sd, axis=1) | jnp.any(so, axis=1)
        agg = jnp.where(has_strong | (agg >= 0), agg, -2)
        left = jax.lax.psum(jnp.sum(agg == -1), ROW_AXIS)
        return agg, jnp.full((m,), left, jnp.int32)

    spec = P(ROW_AXIS)
    agg, left = jax.jit(jax.shard_map(
        kernel, mesh=A.mesh, in_specs=(spec,) * 9, out_specs=(spec,) * 2,
    ))(Sd, So, A.diag_cols, A.diag_vals, A.off_cols, A.off_vals,
       A.send_idx, A.recv_map, cmap.reshape(A.n_shards, m))
    return agg.reshape(-1), int(np.asarray(left).reshape(-1)[0])


# ---------------------------------------------------------------------------
# column scaling through the halo plan
# ---------------------------------------------------------------------------

def pcsr_scale_cols(M: PCSR, s) -> PCSR:
    """M · diag(s) for a vector s on M's COLUMN partition (one ghost
    fetch of s through M's halo plan)."""
    mc = M.col_partition.rows_per_shard

    def kernel(dc, dv, oc, ov, sidx, rmap, sl):
        dc, dv, oc, ov = dc[0], dv[0], oc[0], ov[0]
        sidx, rmap, sl = sidx[0], rmap[0], sl[0]
        s_g = _fetch(sidx, rmap, sl, 0.0)
        return (dv * sl[dc])[None], (ov * s_g[oc])[None]

    spec = P(ROW_AXIS)
    dv, ov = jax.jit(jax.shard_map(
        kernel, mesh=M.mesh, in_specs=(spec,) * 7, out_specs=(spec,) * 2,
    ))(M.diag_cols, M.diag_vals, M.off_cols, M.off_vals,
       M.send_idx, M.recv_map, s.reshape(M.n_shards, mc))
    return PCSR(M.diag_cols, dv, M.off_cols, ov, M.send_idx, M.recv_map,
                M.mesh, M.row_partition, M.col_partition, M.true_shape)


def _prolongation_smoother(A: PCSR, d_inv, coef) -> PCSR:
    """S_m = I − coef·D⁻¹A as a PCSR (local transform; the +I lands on the
    stored diagonal slot, which every assembled square PCSR carries — real
    rows store their diagonal, holes/padding carry the identity)."""
    S = A.n_shards
    m = A.row_partition.rows_per_shard
    di = d_inv.reshape(S, m, 1)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, A.diag_cols.shape, 1)
    isdiag = (A.diag_cols == r_iota) & (A.diag_vals != 0)
    dv = jnp.where(A.diag_vals != 0, -coef * di * A.diag_vals, 0.0)
    dv = dv + jnp.where(isdiag, 1.0, 0.0)
    ov = jnp.where(A.off_vals != 0, -coef * di * A.off_vals, 0.0)
    return PCSR(A.diag_cols, dv, A.off_cols, ov, A.send_idx, A.recv_map,
                A.mesh, A.row_partition, A.col_partition, A.true_shape)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def distributed_sa_setup(A: PCSR, config: AMGConfig, dtype=jnp.float32,
                         seed: int = 0) -> Hierarchy:
    """Fully distributed, fully on-device algebraic-SA setup from a PCSR.

    Same level-loop contract as ``distributed_rs_setup``: every level stays
    row-sharded, coarse numbering is shard-padded (holes inert), and the
    coarsest operator gathers as triplets into a replicated dense
    pseudo-inverse.  No global sparse matrix exists in this call graph."""
    assert isinstance(A, PCSR), (
        "distributed_sa_setup takes a PCSR — assemble one with "
        "pcsr_from_coo_device or PCSR.from_csr")
    mesh = A.mesh
    S = mesh.devices.size
    levels: List[Level] = []
    true_n = A.true_shape[0]
    for lvl in range(config.max_levels):
        d = A.diagonal()
        d_inv = jnp.where(d != 0, 1.0 / d, 0.0).astype(dtype)
        lam = _pcsr_lambda_max(A, d_inv, config.lambda_power_iters,
                               seed).astype(dtype)
        if true_n <= config.n_coarse_max or lvl == config.max_levels - 1:
            levels.append(Level(A, None, None, d_inv, lam, true_n=true_n))
            break
        Sd, So = pcsr_sa_strength(A, config.sa_theta)
        state = pcsr_mis_seed(A, Sd, So, seed=seed + lvl)
        for attempt in range(2):
            cmap, mc_pad, nc_true = coarse_numbering(A, state)
            if nc_true == 0:
                break
            agg, leftover = pcsr_attach(A, Sd, So, cmap)
            if leftover == 0:
                break
            # promote unreached strongly-connected nodes (-1) to seeds and
            # renumber — cannot occur on symmetric strength graphs (every
            # node is within two hops of a seed by MIS maximality), so this
            # is a loud one-shot fallback for asymmetric patterns.  The
            # promotion stays on device (elementwise where preserves the
            # row sharding — a host round-trip here would break multi-host
            # deployments, round-4 advisor finding).
            if attempt != 0:
                raise ValueError(
                    f"pcsr_attach: {leftover} rows unreached after "
                    "promotion — asymmetric strength pattern the one-shot "
                    "seed promotion cannot close")
            state = jnp.where(agg == -1, COARSE, state).astype(jnp.int32)
        if nc_true >= true_n or nc_true == 0:
            levels.append(Level(A, None, None, d_inv, lam, true_n=true_n))
            break

        # tentative T from (row, aggregate) triplets, then unit-norm columns
        m = A.row_partition.rows_per_shard
        n_coarse = S * mc_pad
        gr = jnp.arange(S * m, dtype=jnp.int32)
        ok = agg >= 0
        T = _assemble_grow(
            jnp.where(ok, gr, -1).reshape(S, m),
            jnp.where(ok, agg, 0).reshape(S, m),
            jnp.where(ok, 1.0, 0.0).astype(dtype).reshape(S, m),
            (A.true_shape[0], n_coarse), mesh,
            rows_per_shard=m, ell_width=1, off_width=1,
            pad_identity=False,
            ghost_capacity=max(4 * A.recv_map.shape[1], 256))
        R0 = pcsr_transpose(T, rows_per_shard=mc_pad)
        counts = R0.matvec(jnp.ones((S * m,), dtype))
        inv_sqrt = jnp.where(counts > 0, 1.0 / jnp.sqrt(
            jnp.maximum(counts, 1.0)), 0.0)
        T_s = pcsr_scale_cols(T, inv_sqrt)

        # P = (I − (ω/λ) D⁻¹A) T_s, R = Pᵀ, Galerkin
        coef = config.sa_omega / jnp.maximum(lam, 1e-30)
        S_m = _prolongation_smoother(A, d_inv, coef)
        Pm = pcsr_spgemm(S_m, T_s)
        R = pcsr_transpose(Pm, rows_per_shard=mc_pad)
        RA = pcsr_spgemm(R, A)
        A_c = pcsr_spgemm(RA, Pm, pad_identity=True)
        A_c = _ensure_diag(A_c)
        levels.append(Level(A, Pm, R, d_inv, lam, true_n=true_n))
        A = A_c
        true_n = nc_true

    # replicated dense coarse pseudo-inverse from gathered triplets (same
    # zero-based scatter + hole-identity rule as distributed_rs_setup)
    from parallel_amg_tpu.amg.hierarchy import coarse_inverse_np
    from parallel_amg_tpu.parallel.mesh import replicated_sharding

    Ac = levels[-1].A
    rows, cols, vals = Ac.to_triplets()
    r = np.asarray(rows).reshape(-1)
    c = np.asarray(cols).reshape(-1)
    v = np.asarray(vals).reshape(-1)
    n_pad = Ac.row_partition.n_padded
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
