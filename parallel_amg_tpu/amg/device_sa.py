"""On-device ALGEBRAIC smoothed-aggregation setup (the Vanek-greedy path).

Closes the round-2 gap "greedy/Vanek SA aggregation on device" (SURVEY.md
§2.3 "Aggregation (SA)" row): the structured block path covers regular
grids; this module aggregates arbitrary sparsity on device.

The oracle's sequential greedy sweep (oracle/serial_amg.py
greedy_aggregation) is inherently serial, so the device algorithm uses the
standard parallel substitution — Luby-round maximal-independent-set seeding
plus a strongest-connection attachment sweep (the same MIS-seeding PyAMG's
parallel standard aggregation and the SA literature use):

1. MIS over the symmetrized strength graph (random-weight Luby rounds in a
   ``lax.while_loop``): seeds are pairwise non-adjacent and every node is a
   seed or adjacent to one; numerically isolated nodes become singleton
   seeds automatically (no neighbors ⇒ always local maxima).
2. Every non-seed joins the strongest-connected (max |a_ij|) neighboring
   seed's aggregate.
3. Tentative T (width-1 ELL, unit-norm columns), smoothed
   P = (I − (ω/λ_max) D⁻¹A)·T via the ESC SpGEMM, R = Pᵀ, Galerkin RAP —
   the same device kernel chain as the classical path (amg/device_rs.py).

Aggregates differ from the serial greedy ones (different tie-breaking), so
parity with the oracle is at the CONVERGENCE level (PCG iteration band,
complexity bounds), not aggregate-by-aggregate — the same equivalence the
PMIS-for-RS substitution relies on (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.amg.device_rs import _ell_add, _ell_lambda_max
from parallel_amg_tpu.amg.hierarchy import Hierarchy, Level
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.ell_setup import ell_prune, ell_spgemm, ell_transpose

_NEG = jnp.float32(-1e30)


def sa_strength_mask(A: ELL, theta: float):
    """Symmetric SA strength: |a_ij| ≥ θ·sqrt(|a_ii·a_jj|), no diagonal."""
    r_iota = jax.lax.broadcasted_iota(jnp.int32, A.cols.shape, 0)
    offd = A.mask() & (A.cols != r_iota)
    absa = jnp.where(offd, jnp.abs(A.vals), 0.0)
    d = jnp.abs(A.diagonal())
    dj = jnp.take(d, A.cols, axis=0)
    thresh = theta * jnp.sqrt(d[:, None] * dj)
    return offd & (absa >= thresh - 1e-30) & (absa > 0)


def mis_aggregate(A: ELL, S, seed: int = 0, max_rounds: int = 64):
    """Parallel Vanek aggregation: distance-2 MIS seeds + two attach passes.

    Seeds form a maximal independent set at DISTANCE 2 (no two seeds within
    two hops — the parallel equivalent of Vanek's "whole neighborhood
    untouched" pass-1 condition), so phase-1 aggregates are the disjoint
    closed neighborhoods of the seeds; phase 2 attaches the distance-2
    leftovers to their strongest-connected aggregated neighbor; phase 3
    makes singletons of anything unreachable.  Returns (agg ids (n,) int32
    ≥ 0, n_aggregates) with one tiny host sync for the count."""
    n = A.n_rows
    cols = A.cols
    S_ell = ELL(cols, S.astype(jnp.float32), A.row_nnz, (n, n))
    St = ell_transpose(S_ell)
    St_mask = St.mask() & (St.vals != 0)

    def nmax(v):
        """Per-node max of v over adjacent nodes (both edge directions)."""
        out = jnp.max(jnp.where(S, jnp.take(v, cols, axis=0), _NEG), axis=1)
        inn = jnp.max(jnp.where(St_mask, jnp.take(v, St.cols, axis=0),
                                _NEG), axis=1)
        return jnp.maximum(out, inn)

    def reach(f):
        """Any adjacent node in bool set f (both edge directions)."""
        return (jnp.any(S & jnp.take(f, cols, axis=0), axis=1)
                | jnp.any(St_mask & jnp.take(f, St.cols, axis=0), axis=1))

    w = jax.random.uniform(jax.random.PRNGKey(seed), (n,))

    def round_body(carry):
        cand, seed_flag, k = carry
        wc = jnp.where(cand, w, _NEG)
        # closed two-hop candidate max: M_i ≥ w_i via the back edge, so
        # M_i == w_i (unique floats) ⇔ i maximizes its 2-hop neighborhood
        m2hop = nmax(jnp.maximum(wc, nmax(wc)))
        is_max = cand & (m2hop <= w)
        seed_flag = seed_flag | is_max
        # everything within two hops of a new seed loses seed-candidacy
        r1 = reach(is_max)
        cand = cand & ~is_max & ~r1 & ~reach(r1)
        return cand, seed_flag, k + 1

    cand0 = jnp.ones((n,), bool)
    seed0 = jnp.zeros((n,), bool)
    cand, seeds, _ = jax.lax.while_loop(
        lambda c: jnp.any(c[0]) & (c[2] < max_rounds), round_body,
        (cand0, seed0, 0))
    seeds = seeds | cand  # safety: leftovers past max_rounds seed themselves

    agg_of_seed = jnp.cumsum(seeds.astype(jnp.int32)) - 1
    nc = int(agg_of_seed[-1]) + 1  # host sync

    At = ell_transpose(ELL(cols, jnp.where(S, A.vals, 0.0), A.row_nnz,
                           (n, n)))
    At_mask = At.mask() & (At.vals != 0)

    def attach(member, agg_now):
        """Strongest-|a_ij| neighbor inside ``member``; returns its agg id
        and the best score (both directions)."""
        mj = jnp.take(member, cols, axis=0)
        score_out = jnp.where(S & mj, jnp.abs(A.vals), _NEG)
        best_out = jnp.max(score_out, axis=1)
        arg_out = jnp.argmax(score_out, axis=1)
        agg_out = jnp.take(agg_now, cols, axis=0)[jnp.arange(n), arg_out]
        mtj = jnp.take(member, At.cols, axis=0)
        score_in = jnp.where(At_mask & mtj, jnp.abs(At.vals), _NEG)
        best_in = jnp.max(score_in, axis=1)
        arg_in = jnp.argmax(score_in, axis=1)
        agg_in = jnp.take(agg_now, At.cols, axis=0)[jnp.arange(n), arg_in]
        return (jnp.where(best_out >= best_in, agg_out, agg_in),
                jnp.maximum(best_out, best_in))

    # phase 1: seed neighborhoods (disjoint by the distance-2 property)
    agg = jnp.where(seeds, agg_of_seed, -1)
    a1, s1 = attach(seeds, agg)
    agg = jnp.where((agg < 0) & (s1 > _NEG), a1, agg)
    # phase 2: strongest aggregated neighbor for the distance-2 leftovers
    a2, s2 = attach(agg >= 0, agg)
    agg = jnp.where((agg < 0) & (s2 > _NEG), a2, agg)
    # phase 3: singletons for anything still unassigned
    rest = agg < 0
    extra = jnp.cumsum(rest.astype(jnp.int32)) - 1
    n_extra = int(jnp.sum(rest))  # host sync
    agg = jnp.where(rest, nc + extra, agg)
    return agg.astype(jnp.int32), nc + n_extra


def device_sa_setup(A, config: AMGConfig, dtype=jnp.float32,
                    seed: int = 0) -> Hierarchy:
    """On-device algebraic SA setup from a device ELL (or host CSR)."""
    from parallel_amg_tpu.ops.csr import CSR

    assert config.coarsening == "sa", "device_sa_setup is the SA path"
    if isinstance(A, ELL):
        A_ell = A
    else:
        csr = A if isinstance(A, CSR) else CSR.from_scipy(
            A.to_csr().to_scipy() if hasattr(A, "to_csr") else A)
        A_ell = ELL.from_csr(csr, dtype=dtype)

    levels: List[Level] = []
    for lvl in range(config.max_levels):
        n = A_ell.n_rows
        diag = A_ell.diagonal()
        d_inv = jnp.where(diag != 0, 1.0 / diag, 0.0)
        lam = _ell_lambda_max(A_ell, d_inv, config.lambda_power_iters, seed)
        if n <= config.n_coarse_max or lvl == config.max_levels - 1:
            levels.append(Level(A_ell, None, None, d_inv, lam))
            break
        S = sa_strength_mask(A_ell, config.sa_theta)
        agg, nc = mis_aggregate(A_ell, S, seed=seed + lvl)
        if nc >= n:
            levels.append(Level(A_ell, None, None, d_inv, lam))
            break
        counts = jax.ops.segment_sum(jnp.ones((n,), dtype), agg,
                                     num_segments=nc)
        # tentative T: width-1 ELL with unit-norm columns
        T = ELL(agg[:, None],
                (1.0 / jnp.sqrt(jnp.maximum(counts, 1.0)))[agg][:, None],
                jnp.ones((n,), jnp.int32), (n, nc))
        # P = (I − (ω/λ) D⁻¹A) T  — one ESC product + aligned add
        coef = config.sa_omega / jnp.maximum(lam, 1e-30)
        DA = ELL(A_ell.cols, -coef * d_inv[:, None] * A_ell.vals,
                 A_ell.row_nnz, A_ell.shape)
        P = _ell_add(ell_spgemm(DA, T), T)
        R = ell_transpose(P)
        RA = ell_spgemm(R, A_ell)
        A_c = ell_spgemm(RA, P)
        if config.coarse_drop_tol > 0:
            A_c = _ell_sparsify_lumped(A_c, config.coarse_drop_tol)
        A_c = ell_prune(A_c, tol=0.0)
        levels.append(Level(A_ell, P, R, d_inv, lam))
        A_ell = A_c

    from parallel_amg_tpu.amg.hierarchy import coarse_inverse_np

    coarse_inv = jnp.asarray(
        coarse_inverse_np(np.asarray(
            levels[-1].A.to_csr().to_dense(), np.float64)),
        jnp.float32)
    return Hierarchy(levels, coarse_inv, config)


def _ell_sparsify_lumped(A: ELL, tol: float) -> ELL:
    """Drop |a_ij| < tol·max_k≠i|a_ik|, lump dropped mass onto the diagonal
    and symmetrize — the device analog of oracle sparsify_lumped."""
    n = A.n_rows
    r_iota = jax.lax.broadcasted_iota(jnp.int32, A.cols.shape, 0)
    offd = A.mask() & (A.cols != r_iota)
    absa = jnp.where(offd, jnp.abs(A.vals), 0.0)
    rowmax = jnp.max(absa, axis=1)
    drop = offd & (absa < tol * rowmax[:, None])
    lump = jnp.sum(jnp.where(drop, A.vals, 0.0), axis=1)
    vals = jnp.where(drop, 0.0, A.vals)
    isdiag = A.mask() & (A.cols == r_iota)
    vals = vals + jnp.where(isdiag, lump[:, None], 0.0)
    kept = ELL(A.cols, vals, A.row_nnz, A.shape)
    kept = ell_prune(kept, tol=0.0)
    # symmetrize: 0.5 (A + Aᵀ) keeps the coarse solve SPD-safe
    ktT = ell_transpose(kept)
    half = ELL(kept.cols, 0.5 * kept.vals, kept.row_nnz, kept.shape)
    halfT = ELL(ktT.cols, 0.5 * ktT.vals, ktT.row_nnz, ktT.shape)
    return _ell_add(half, halfT)
