"""Serial float64 numpy/scipy AMG: classical Ruge-Stüben (PMIS) and smoothed
aggregation, with weighted-Jacobi/Chebyshev smoothing, V/W-cycles and PCG.

This is the golden oracle (SURVEY.md §4.2, §4.5): a from-scratch serial
implementation of the same algorithms the TPU framework implements on device.
It intentionally shares no code with the JAX path.  Algorithms follow the
textbook forms (Ruge-Stüben via parallel-friendly PMIS splitting + direct
interpolation; Vanek-style aggregation + smoothed prolongator) so the device
hierarchy can be compared structurally as well as by convergence.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np
import scipy.linalg
import scipy.sparse as sp

from parallel_amg_tpu.config import AMGConfig


# ---------------------------------------------------------------------------
# Strength of connection
# ---------------------------------------------------------------------------

def classical_strength(A: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """Classical strength: keep a_ij (j≠i) with |a_ij| >= θ·max_{k≠i}|a_ik|.

    Returns a boolean-pattern CSR S (data all ones) with no diagonal.
    """
    A = A.tocsr()
    n = A.shape[0]
    coo = A.tocoo()
    offd = coo.row != coo.col
    r, c, v = coo.row[offd], coo.col[offd], np.abs(coo.data[offd])
    row_max = np.zeros(n)
    np.maximum.at(row_max, r, v)
    keep = v >= theta * row_max[r] - 1e-300
    keep &= v > 0
    S = sp.csr_matrix((np.ones(keep.sum()), (r[keep], c[keep])), shape=A.shape)
    return S


def sa_strength(A: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """Symmetric SA strength: |a_ij| >= θ·sqrt(|a_ii·a_jj|), no diagonal."""
    A = A.tocsr()
    d = np.abs(A.diagonal())
    coo = A.tocoo()
    offd = coo.row != coo.col
    r, c, v = coo.row[offd], coo.col[offd], np.abs(coo.data[offd])
    keep = v >= theta * np.sqrt(d[r] * d[c]) - 1e-300
    keep &= v > 0
    S = sp.csr_matrix((np.ones(keep.sum()), (r[keep], c[keep])), shape=A.shape)
    return S


# ---------------------------------------------------------------------------
# PMIS coarse/fine splitting (serial implementation of the parallel algorithm)
# ---------------------------------------------------------------------------

UNDECIDED, FINE, COARSE = 0, 1, 2


def _rowwise_max(csr: sp.csr_matrix, per_col: np.ndarray,
                 empty: float = -1.0) -> np.ndarray:
    """max_j∈row(i) per_col[j] for each row (``empty`` for empty rows) —
    one reduceat over the nonempty-row segment starts (bulk, no node loop)."""
    out = np.full(csr.shape[0], empty)
    nonempty = np.diff(csr.indptr) > 0
    if csr.nnz:
        out[nonempty] = np.maximum.reduceat(
            per_col[csr.indices], csr.indptr[:-1][nonempty])
    return out


def pmis_split(S: sp.csr_matrix, seed: int = 0) -> np.ndarray:
    """PMIS splitting on strength graph S. Returns array of FINE/COARSE.

    Measure w_i = |S^T column i| + rand[0,1); iterate: undecided local maxima
    of w over the undecided strong neighborhood become C; undecided points
    strongly depending on a new C point become F (so every F point has at
    least one strong C neighbor — required by direct interpolation).

    Fully vectorized (rowwise-max reduceat + SpMV indicator products) so the
    f64 oracle runs at the acceptance scales (1024² = 1M rows in ~seconds;
    the former per-node Python loops were O(n·rounds) interpreted).
    """
    n = S.shape[0]
    rng = np.random.default_rng(seed)
    # number of points i influences = in-degree in S = column counts
    influence = np.asarray(S.sum(axis=0)).ravel()
    w = influence + rng.random(n)
    state = np.full(n, UNDECIDED, dtype=np.int8)
    # symmetrized neighbor graph for the local-max test
    G = (S + S.T).tocsr()
    # isolated points (no strong connections at all): make them COARSE —
    # they carry their value to the coarse grid via identity interpolation.
    iso = np.asarray(G.getnnz(axis=1)).ravel() == 0
    state[iso] = COARSE
    for _ in range(n + 1):
        und = state == UNDECIDED
        if not und.any():
            break
        # local max among undecided neighbors (synchronous round)
        w_und = np.where(und, w, -np.inf)
        nbr_max = _rowwise_max(G, w_und, empty=-np.inf)
        state[und & (w > nbr_max)] = COARSE
        # F assignment: undecided with a strong C neighbor (dependence: S row)
        has_c = (S @ (state == COARSE).astype(np.float64)) > 0
        state[(state == UNDECIDED) & has_c] = FINE
    assert (state != UNDECIDED).all(), "PMIS did not terminate"
    return state


# ---------------------------------------------------------------------------
# Classical interpolation: direct (distance-one) and extended+i (distance-two)
# ---------------------------------------------------------------------------

def truncate_P(P: sp.csr_matrix, p_max: int) -> sp.csr_matrix:
    """Keep the p_max largest-|w| entries per row, rescaled so row sums are
    preserved (constant-vector preservation).  Bounds operator complexity and
    gives interpolation a static maximum row width for the device ELL view.

    Vectorized: one global sort by (row, -|w|) + rank-within-row mask."""
    P = P.tocsr()
    n = P.shape[0]
    row_nnz = np.diff(P.indptr)
    if not P.nnz or row_nnz.max() <= p_max:
        return P
    rows = np.repeat(np.arange(n), row_nnz)
    # stable sort by |w| descending within each row
    order = np.lexsort((-np.abs(P.data), rows))
    rows_s, cols_s, vals_s = rows[order], P.indices[order], P.data[order]
    rank = np.arange(P.nnz) - np.repeat(P.indptr[:-1], row_nnz)
    keep = rank < p_max
    # rescale kept weights so the row sums are preserved
    total = np.zeros(n)
    np.add.at(total, rows, P.data)
    kept_sum = np.zeros(n)
    np.add.at(kept_sum, rows_s[keep], vals_s[keep])
    scale = np.where(kept_sum != 0, total / np.where(kept_sum == 0, 1.0,
                                                     kept_sum), 1.0)
    return sp.csr_matrix(
        (vals_s[keep] * scale[rows_s[keep]], (rows_s[keep], cols_s[keep])),
        shape=P.shape)


def extended_i_interpolation(
    A: sp.csr_matrix, S: sp.csr_matrix, state: np.ndarray, p_max: int = 4
) -> sp.csr_matrix:
    """Distance-two "extended+i" interpolation, fully vectorized.

    Same algorithm as :func:`_extended_i_loop` (the row-loop reference it is
    parity-tested against), recast as sparse matrix algebra so it runs at
    the 1024² acceptance scale in seconds instead of minutes:

    - Ĉ pattern     = pattern(S_C + S_F @ S_C)          (two spgemms)
    - denominators  = ((Ĉ + I) @ A±ᵀ) ⊙ S_F             (per (i,k) pair)
    - distribution  = (B± @ A±) ⊙ Ĉ,  B±[i,k] = a_ik/denom±[i,k]
    - i-shares      = row-sums of B± ⊙ A±ᵀ
    """
    n = A.shape[0]
    is_c = state == COARSE
    cmap = -np.ones(n, dtype=np.int64)
    cmap[is_c] = np.arange(int(is_c.sum()))

    A = A.tocsr()
    S = S.tocsr().astype(np.float64)
    S.data[:] = 1.0
    # strong C / strong F patterns (0/1 indicator matrices)
    Sc = S.multiply(is_c[None, :]).tocsr()
    Sf = (S - Sc).tocsr()
    Sc.eliminate_zeros()
    Sf.eliminate_zeros()

    # Ĉ pattern (n×n indicator, columns are C points)
    chat = (Sc + Sf @ Sc).tocsr()
    chat.data[:] = 1.0

    diag_a = A.diagonal()
    offd = A - sp.diags(diag_a)
    offd.eliminate_zeros()
    A_pos = offd.maximum(0).tocsr()
    A_neg = (-((-offd).maximum(0))).tocsr()

    # per-(i,k) denominators over m ∈ Ĉ_i ∪ {i}, same sign as a_ik
    chat_i = (chat + sp.identity(n)).tocsr()
    chat_i.data[:] = 1.0
    den_pos = (chat_i @ A_pos.T).multiply(Sf).tocsr()
    den_neg = (chat_i @ A_neg.T).multiply(Sf).tocsr()

    # strong-F couplings a_ik, split by sign
    aF = A.multiply(Sf).tocsr()
    aF_pos = aF.maximum(0).tocsr()
    aF_neg = (-((-aF).maximum(0))).tocsr()

    def ratio(num, den):
        """Elementwise num/den on num's pattern; zero-denominator entries
        drop out and their numerators return as per-row lumps."""
        out = num.copy().tocsr()
        den = den.tocsr()
        r, c = out.nonzero()
        if len(r) == 0:
            return out, np.zeros(n)
        sel = den[r, c]
        dv = (np.ravel(sel.toarray()) if sp.issparse(sel)
              else np.ravel(np.asarray(sel)))
        v = out.data.copy()
        out.data = np.where(dv != 0, v / np.where(dv == 0, 1.0, dv), 0.0)
        lump = np.zeros(n)
        np.add.at(lump, r[dv == 0], v[dv == 0])
        out.eliminate_zeros()
        return out, lump

    B_pos, lump_pos = ratio(aF_pos, den_pos)
    B_neg, lump_neg = ratio(aF_neg, den_neg)

    # numerators: own Ĉ entries + distributed shares landing on Ĉ columns
    num = A.multiply(chat.astype(bool)).tocsr()
    num = num + (B_pos @ A_pos).multiply(chat).tocsr() \
              + (B_neg @ A_neg).multiply(chat).tocsr()

    # diagonal: a_ii + weak lumping + zero-denominator lumps + i-shares.
    # weak = offdiag entries neither in Ĉ nor strong-F (the two are
    # disjoint: Ĉ ⊆ C, strong-F ⊆ F)
    in_chat = A.multiply(chat.astype(bool)).tocsr()
    weak = offd - in_chat - aF
    diag = (diag_a + np.asarray(weak.sum(axis=1)).ravel()
            + lump_pos + lump_neg
            + np.asarray(B_pos.multiply(A_pos.T).sum(axis=1)).ravel()
            + np.asarray(B_neg.multiply(A_neg.T).sum(axis=1)).ravel())

    safe = np.where(diag == 0, 1.0, diag)
    coo = num.tocoo()
    frow = ~is_c[coo.row]
    rows = coo.row[frow]
    cols = coo.col[frow]
    vals = -coo.data[frow] / safe[rows]
    # C rows: identity
    crows = np.flatnonzero(is_c)
    P = sp.csr_matrix(
        (np.concatenate([vals, np.ones(len(crows))]),
         (np.concatenate([rows, crows]),
          np.concatenate([cmap[cols], cmap[crows]]))),
        shape=(n, int(is_c.sum())))
    P.sum_duplicates()
    P.eliminate_zeros()
    return truncate_P(P.tocsr(), p_max)


def _extended_i_loop(
    A: sp.csr_matrix, S: sp.csr_matrix, state: np.ndarray, p_max: int = 4
) -> sp.csr_matrix:
    """Row-loop reference implementation of extended+i (the original
    formulation; kept as the parity oracle for the vectorized version and
    the device kernel — too slow beyond ~10⁵ rows).

    For F-point i the interpolatory set Ĉ_i is C_i plus the strong C-points
    of i's strong F-neighbors.  Each strong F-neighbor k's connection a_ik is
    distributed over Ĉ_i ∪ {i} proportionally to k's same-sign couplings;
    the m = i share and all weak couplings lump onto the diagonal.
    """
    A = A.tocsr()
    n = A.shape[0]
    cmap = -np.ones(n, dtype=np.int64)
    coarse = np.flatnonzero(state == COARSE)
    cmap[coarse] = np.arange(coarse.size)
    S = S.tocsr()
    rows, cols, vals = [], [], []
    for i in range(n):
        if state[i] == COARSE:
            rows.append(i)
            cols.append(cmap[i])
            vals.append(1.0)
            continue
        a_cols = A.indices[A.indptr[i] : A.indptr[i + 1]]
        a_vals = A.data[A.indptr[i] : A.indptr[i + 1]]
        s_i = set(S.indices[S.indptr[i] : S.indptr[i + 1]])
        Fi = [j for j in s_i if state[j] != COARSE and j != i]
        Chat = {j for j in s_i if state[j] == COARSE}
        for k in Fi:
            s_k = S.indices[S.indptr[k] : S.indptr[k + 1]]
            Chat |= {m for m in s_k if state[m] == COARSE}
        num = {j: 0.0 for j in Chat}
        diag = 0.0
        for j, a in zip(a_cols, a_vals):
            if j == i:
                diag += a
            elif j in Chat:
                num[j] += a
            elif j in s_i and state[j] != COARSE:
                pass  # strong F — distributed below
            else:
                diag += a  # weak lumping
        for k, aik in zip(a_cols, a_vals):
            if k == i or k not in s_i or state[k] == COARSE:
                continue
            ak_cols = A.indices[A.indptr[k] : A.indptr[k + 1]]
            ak_vals = A.data[A.indptr[k] : A.indptr[k + 1]]
            denom = 0.0
            dist = []
            for m, akm in zip(ak_cols, ak_vals):
                if (m in Chat or m == i) and akm * aik > 0:
                    denom += akm
                    dist.append((m, akm))
            if denom == 0.0:
                diag += aik
            else:
                for m, akm in dist:
                    if m == i:
                        diag += aik * akm / denom
                    else:
                        num[m] += aik * akm / denom
        for j in sorted(Chat):
            w = -num[j] / diag
            if w != 0.0:
                rows.append(i)
                cols.append(cmap[j])
                vals.append(w)
    P = sp.csr_matrix((vals, (rows, cols)), shape=(n, coarse.size))
    return truncate_P(P, p_max)


def direct_interpolation(
    A: sp.csr_matrix, S: sp.csr_matrix, state: np.ndarray
) -> sp.csr_matrix:
    """Classical direct interpolation with positive/negative splitting.

    For F-point i with strong coarse neighbors C_i:
      w_ij = -(α_i·a_ij)/a_ii for a_ij<0,  -(β_i·a_ij)/a_ii for a_ij>0
      α_i = Σ_{k∈N_i, a<0} a_ik / Σ_{j∈C_i, a<0} a_ij   (β analogous)
    C-points interpolate identically.
    """
    A = A.tocsr()
    n = A.shape[0]
    cmap = -np.ones(n, dtype=np.int64)
    coarse = np.flatnonzero(state == COARSE)
    cmap[coarse] = np.arange(coarse.size)
    nc = coarse.size

    # vectorized over the COO triplets (no node loop): per-row neg/pos sums
    # over all neighbors and over strong-C neighbors, then one weight per
    # strong-C entry
    coo = A.tocoo()
    r, c, v = coo.row, coo.col, coo.data
    offd = r != c
    # strong mask per A-entry: entry (r,c) is strong iff (r,c) ∈ S —
    # joint (row·n + col) key membership test, one global sorted isin
    S_coo = S.tocoo()
    a_key = r.astype(np.int64) * n + c
    s_key = S_coo.row.astype(np.int64) * n + S_coo.col
    strong_entry = np.isin(a_key, s_key)
    is_c_col = state[c] == COARSE
    strong_c = offd & strong_entry & is_c_col

    neg, pos = offd & (v < 0), offd & (v > 0)
    sum_n_neg = np.zeros(n); np.add.at(sum_n_neg, r[neg], v[neg])
    sum_n_pos = np.zeros(n); np.add.at(sum_n_pos, r[pos], v[pos])
    sum_c_neg = np.zeros(n); np.add.at(sum_c_neg, r[strong_c & neg],
                                       v[strong_c & neg])
    sum_c_pos = np.zeros(n); np.add.at(sum_c_pos, r[strong_c & pos],
                                       v[strong_c & pos])
    diag = A.diagonal().astype(np.float64)

    fine = state != COARSE
    has_sc = np.zeros(n, dtype=bool)
    has_sc[r[strong_c]] = True
    if not has_sc[fine].all():
        bad = int(np.flatnonzero(fine & ~has_sc)[0])
        raise RuntimeError(
            f"F-point {bad} has no strong coarse neighbor (bad splitting)")

    # positive weak connections with no positive strong C to absorb them:
    # lump onto the diagonal (standard fix)
    diag = diag + np.where(sum_c_pos == 0.0, sum_n_pos, 0.0)
    alpha = np.where(sum_c_neg != 0, sum_n_neg / np.where(sum_c_neg == 0,
                                                          1.0, sum_c_neg), 0.0)
    beta = np.where(sum_c_pos != 0, sum_n_pos / np.where(sum_c_pos == 0,
                                                         1.0, sum_c_pos), 0.0)
    sel = strong_c & fine[r]
    coef = np.where(v[sel] < 0, alpha[r[sel]], beta[r[sel]])
    w = -coef * v[sel] / diag[r[sel]]
    nz = w != 0.0
    rows = np.concatenate([coarse, r[sel][nz]])
    cols = np.concatenate([cmap[coarse], cmap[c[sel][nz]]])
    vals = np.concatenate([np.ones(coarse.size), w[nz]])
    P = sp.csr_matrix((vals, (rows, cols)), shape=(n, nc))
    return P


# ---------------------------------------------------------------------------
# Smoothed aggregation
# ---------------------------------------------------------------------------

def smoothed_direct_interpolation(
    A: sp.csr_matrix, S: sp.csr_matrix, state: np.ndarray,
    omega: float, p_max: int
) -> sp.csr_matrix:
    """Direct interpolation + one Jacobi improvement pass
    P ← (I − ω D⁻¹A)·P_direct, truncated to p_max (row sums preserved) —
    the serial reference of the device "smoothed_direct" path
    (amg/device_rs.py smooth_interpolation)."""
    P = direct_interpolation(A, S, state)
    d = A.diagonal()
    d_inv = np.where(d != 0, 1.0 / d, 0.0)
    P = P - omega * (sp.diags(d_inv) @ A @ P)
    return truncate_P(P.tocsr(), p_max)


def greedy_aggregation(S: sp.csr_matrix) -> np.ndarray:
    """Vanek-style greedy aggregation on strength graph S.

    Returns agg id per node (>=0). Three passes: seed aggregates over
    untouched neighborhoods, attach leftovers to a neighboring aggregate,
    then singleton aggregates for anything remaining.
    """
    n = S.shape[0]
    G = (S + S.T).tocsr()
    agg = -np.ones(n, dtype=np.int64)
    next_agg = 0
    indptr, indices = G.indptr, G.indices
    # pass 1
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        if (agg[nbrs] >= 0).any():
            continue
        agg[i] = next_agg
        agg[nbrs] = next_agg
        next_agg += 1
    # pass 2: attach to a neighboring aggregate
    unassigned = np.flatnonzero(agg < 0)
    attach = agg.copy()
    for i in unassigned:
        nbrs = indices[indptr[i] : indptr[i + 1]]
        assigned = nbrs[agg[nbrs] >= 0]
        if assigned.size:
            attach[i] = agg[assigned[0]]
    agg = attach
    # pass 3: singletons
    for i in np.flatnonzero(agg < 0):
        agg[i] = next_agg
        next_agg += 1
    return agg


def block_aggregation(dims, block: int) -> tuple:
    """Structured aggregation: aggregates are `block`-edge grid cubes.

    Returns (agg ids per node, coarse dims).  On a regular grid this keeps
    every Galerkin coarse operator banded (DIA on device) — the TPU fast
    path; it is standard aggregation-AMG with a geometric aggregate choice.
    """
    dims = tuple(int(d) for d in dims)
    cdims = tuple(-(-d // block) for d in dims)
    coords = np.unravel_index(np.arange(int(np.prod(dims))), dims)
    bcoords = [c // block for c in coords]
    agg = np.ravel_multi_index(bcoords, cdims)
    return agg.astype(np.int64), cdims


def tentative_prolongator(agg: np.ndarray) -> sp.csr_matrix:
    """Piecewise-constant tentative P with unit-norm columns (B = 1s)."""
    n = agg.size
    nc = int(agg.max()) + 1
    counts = np.bincount(agg, minlength=nc).astype(np.float64)
    vals = 1.0 / np.sqrt(counts[agg])
    return sp.csr_matrix((vals, (np.arange(n), agg)), shape=(n, nc))


def sparsify_lumped(A: sp.csr_matrix, tol: float) -> sp.csr_matrix:
    """Drop |a_ij| < tol·max_k|a_ik| (j≠i), lumping dropped mass onto the
    diagonal so row sums are preserved (non-Galerkin sparsification — keeps
    the near-nullspace action of the operator while bounding stencil
    growth; cf. PAPERS.md row 4)."""
    if tol <= 0:
        return A
    A = A.tocsr()
    n = A.shape[0]
    coo = A.tocoo()
    offd = coo.row != coo.col
    absv = np.abs(coo.data)
    row_max = np.zeros(n)
    np.maximum.at(row_max, coo.row[offd], absv[offd])
    drop = offd & (absv < tol * row_max[coo.row])
    lump = np.zeros(n)
    np.add.at(lump, coo.row[drop], coo.data[drop])
    keep = ~drop
    out = sp.csr_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=A.shape
    )
    out = out + sp.diags(lump)
    out.sum_duplicates()
    # row-based drops break symmetry; symmetrize so near-singular coarse
    # operators keep SPD-ness for the Cholesky coarse solve
    out = 0.5 * (out + out.T)
    return out.tocsr()


def estimate_lambda_max(A: sp.csr_matrix, d_inv: np.ndarray, iters: int,
                        seed: int = 0) -> float:
    """Power iteration for λ_max(D⁻¹A), with 1.1 safety factor."""
    rng = np.random.default_rng(seed)
    x = rng.random(A.shape[0]) - 0.5
    lam = 1.0
    for _ in range(iters):
        x = d_inv * (A @ x)
        nrm = np.linalg.norm(x)
        if nrm == 0:
            break
        lam = nrm
        x /= nrm
    return 1.1 * lam


def smoothed_prolongator(
    A: sp.csr_matrix, T: sp.csr_matrix, omega: float, lam_max: float
) -> sp.csr_matrix:
    """P = (I − (ω/λ_max) D⁻¹A) T."""
    d = A.diagonal()
    d_inv = np.where(d != 0, 1.0 / d, 0.0)
    DA = sp.diags(d_inv) @ A
    return (sp.identity(A.shape[0]) - (omega / lam_max) * DA) @ T


# ---------------------------------------------------------------------------
# Hierarchy
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class OracleLevel:
    A: sp.csr_matrix
    P: Optional[sp.csr_matrix]  # None on the coarsest level
    R: Optional[sp.csr_matrix]
    d_inv: np.ndarray
    lam_max: float  # λ_max(D⁻¹A) (Chebyshev); 0 if unused
    state: Optional[np.ndarray] = None  # C/F states (rs only)
    # structured-aggregation metadata (aggregate="block" levels only):
    dims: Optional[tuple] = None   # fine grid dims of this level
    cdims: Optional[tuple] = None  # coarse grid dims after aggregation
    agg_scale: Optional[np.ndarray] = None  # 1/sqrt(|aggregate|) per coarse id


@dataclasses.dataclass
class OracleHierarchy:
    levels: List[OracleLevel]
    coarse_lu: tuple  # scipy.linalg.lu_factor of the coarsest dense A
    config: AMGConfig

    @property
    def grid_complexity(self) -> float:
        return sum(l.A.shape[0] for l in self.levels) / self.levels[0].A.shape[0]

    @property
    def operator_complexity(self) -> float:
        return sum(l.A.nnz for l in self.levels) / self.levels[0].A.nnz


def oracle_setup(A, config: AMGConfig = AMGConfig(), seed: int = 0,
                 dims=None) -> OracleHierarchy:
    """Build the AMG hierarchy (RS-PMIS or SA per config.coarsening).

    dims: optional grid dimensions of the row space — enables the
    structured aggregate="block" SA path (kept per level while valid).
    """
    if not sp.issparse(A):
        A = sp.csr_matrix(A)
    A = A.tocsr().astype(np.float64)
    levels: List[OracleLevel] = []
    for lvl in range(config.max_levels):
        n = A.shape[0]
        d = A.diagonal()
        d_inv = np.where(d != 0, 1.0 / d, 0.0)
        lam = (
            estimate_lambda_max(A, d_inv, config.lambda_power_iters, seed)
            if (config.smoother == "chebyshev" or config.coarsening == "sa")
            else 0.0
        )
        if n <= config.n_coarse_max or lvl == config.max_levels - 1:
            levels.append(OracleLevel(A, None, None, d_inv, lam))
            break
        lvl_dims = lvl_cdims = agg_scale = None
        if config.coarsening == "rs":
            S = classical_strength(A, config.theta)
            state = pmis_split(S, seed=seed + lvl)
            if config.interpolation == "extended_i":
                P = extended_i_interpolation(A, S, state, config.p_max)
            elif config.interpolation == "smoothed_direct":
                P = smoothed_direct_interpolation(
                    A, S, state, config.jacobi_omega, config.p_max)
            else:
                P = direct_interpolation(A, S, state)
        else:
            state = None
            if config.aggregate == "block" and dims is not None:
                agg, cdims = block_aggregation(dims, config.block_size)
                lvl_dims, lvl_cdims = tuple(dims), tuple(cdims)
                counts = np.bincount(agg, minlength=int(np.prod(cdims)))
                agg_scale = 1.0 / np.sqrt(np.maximum(counts, 1))
                dims = cdims  # next level's fine dims
            else:
                S = sa_strength(A, config.sa_theta)
                agg = greedy_aggregation(S)
                dims = None
            T = tentative_prolongator(agg)
            P = smoothed_prolongator(A, T, config.sa_omega, lam)
        if P.shape[1] >= n:  # no coarsening progress — stop
            levels.append(OracleLevel(A, None, None, d_inv, lam))
            break
        R = P.T.tocsr()
        levels.append(OracleLevel(A, P.tocsr(), R, d_inv, lam, state,
                                  lvl_dims, lvl_cdims, agg_scale))
        A = (R @ A @ P).tocsr()
        A.sum_duplicates()
        A.eliminate_zeros()
        if config.coarsening == "sa" and config.aggregate == "block" \
                and lvl_dims is not None:
            A = sparsify_lumped(A, config.coarse_drop_tol)
    coarse_lu = scipy.linalg.lu_factor(levels[-1].A.toarray())
    return OracleHierarchy(levels, coarse_lu, config)


# ---------------------------------------------------------------------------
# Smoothers & cycles
# ---------------------------------------------------------------------------

def jacobi(level: OracleLevel, x, b, omega: float, sweeps: int):
    for _ in range(sweeps):
        x = x + omega * level.d_inv * (b - level.A @ x)
    return x


def chebyshev(level: OracleLevel, x, b, degree: int, lower: float):
    """Chebyshev smoothing on [λ_max/lower, λ_max] of D⁻¹A (3-term form)."""
    lmax = level.lam_max
    lmin = lmax / lower
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    d = level.d_inv * (b - level.A @ x) / theta
    x = x + d
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * (
            level.d_inv * (b - level.A @ x)
        )
        x = x + d
        rho = rho_new
    return x


def _smooth(h: OracleHierarchy, lvl: int, x, b, sweeps: int):
    level = h.levels[lvl]
    if h.config.smoother == "chebyshev":
        for _ in range(sweeps):
            x = chebyshev(level, x, b, h.config.cheb_degree, h.config.cheb_lower_bound)
        return x
    return jacobi(level, x, b, h.config.jacobi_omega, sweeps)


def oracle_vcycle(h: OracleHierarchy, x, b, lvl: int = 0, gamma: int | None = None):
    """One multigrid cycle (γ=1: V, γ=2: W) at level lvl."""
    if gamma is None:
        gamma = 1 if h.config.cycle == "V" else 2
    if lvl == len(h.levels) - 1:
        return scipy.linalg.lu_solve(h.coarse_lu, b)
    level = h.levels[lvl]
    x = _smooth(h, lvl, x, b, h.config.nu_pre)
    r = b - level.A @ x
    bc = level.R @ r
    xc = np.zeros_like(bc)
    for _ in range(gamma):
        xc = oracle_vcycle(h, xc, bc, lvl + 1, gamma)
    x = x + level.P @ xc
    x = _smooth(h, lvl, x, b, h.config.nu_post)
    return x


def oracle_solve(h: OracleHierarchy, b, tol: float = 1e-8, maxiter: int = 100):
    """Standalone cycling to ||r|| <= tol·||b||; returns (x, residual_history)."""
    x = np.zeros_like(b)
    nb = np.linalg.norm(b)
    hist = []
    for _ in range(maxiter):
        x = oracle_vcycle(h, x, b)
        r = np.linalg.norm(b - h.levels[0].A @ x)
        hist.append(r)
        if r <= tol * nb:
            break
    return x, np.array(hist)


def oracle_pcg(A, b, h: OracleHierarchy, tol: float = 1e-8, maxiter: int = 500):
    """AMG-preconditioned CG; returns (x, iters, residual_history)."""
    if not sp.issparse(A):
        A = sp.csr_matrix(A)
    x = np.zeros_like(b)
    r = b - A @ x
    nb = np.linalg.norm(b)
    z = oracle_vcycle(h, np.zeros_like(r), r)
    p = z.copy()
    rz = r @ z
    hist = [np.linalg.norm(r)]
    for k in range(maxiter):
        q = A @ p
        alpha = rz / (p @ q)
        x = x + alpha * p
        r = r - alpha * q
        rn = np.linalg.norm(r)
        hist.append(rn)
        if rn <= tol * nb:
            return x, k + 1, np.array(hist)
        z = oracle_vcycle(h, np.zeros_like(r), r)
        rz_new = r @ z
        beta = rz_new / rz
        p = z + beta * p
        rz = rz_new
    return x, maxiter, np.array(hist)
