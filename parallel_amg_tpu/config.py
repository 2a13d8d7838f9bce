"""Frozen, hashable config dataclasses (SURVEY.md §5 "Config / flag system").

These are jit-static: pass them as static args or close over them.  All fields
are plain Python scalars/strings so the dataclasses hash and compare by value.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class AMGConfig:
    """AMG setup-phase configuration.

    Mirrors the knobs of classical AMG implementations (Ruge-Stüben /
    smoothed aggregation); the reference's stack exposes the same knobs
    through AlgebraicMultigrid.jl-style APIs (SURVEY.md §2.3).
    """

    # Coarsening: "rs" = classical Ruge-Stüben (PMIS-parallel splitting),
    # "sa" = smoothed aggregation.
    coarsening: str = "rs"
    # Strength-of-connection threshold θ: classical |a_ij| >= θ max_k|a_ik|.
    theta: float = 0.25
    # SA symmetric strength threshold: |a_ij| >= θ_sa·sqrt(|a_ii·a_jj|).
    # 0.0 keeps every connection (the standard SA default — the classical θ
    # scale does not transfer: e.g. 3D Poisson off-diagonals fail θ=0.25).
    sa_theta: float = 0.0
    # Maximum hierarchy depth (static for jit; unused levels are absent,
    # the hierarchy is a plain Python list so depth is static per-setup).
    max_levels: int = 12
    # Stop coarsening once a level has at most this many rows.
    n_coarse_max: int = 512
    # Smoothed-aggregation prolongator damping ω in P=(I-ω D⁻¹A)T.
    sa_omega: float = 4.0 / 3.0
    # SA aggregation scheme: "greedy" (algebraic, Vanek-style) or "block"
    # (structured: aggregates = regular grid blocks when the problem carries
    # grid dims — keeps every coarse operator banded/DIA, the TPU fast path).
    aggregate: str = "greedy"
    # Grid-block edge length for aggregate="block" (e.g. 3 → 3×3(×3)).
    block_size: int = 3
    # Galerkin-operator sparsification (block-SA path): drop coarse-level
    # entries with |a_ij| < tol·max_j|a_ij| and lump them onto the diagonal
    # (row sums preserved).  Bounds stencil growth across levels — the
    # communication/traffic-reduction technique of PAPERS.md row 4.
    # 0.0 disables.
    coarse_drop_tol: float = 0.02
    # Sparsification applied to the intermediate stencil products (A·S,
    # Sᵀ·A·S) during on-device structured setup: the triple product's
    # intermediate offset sets grow combinatorially (measured 1485 planes at
    # a level whose final operator needs 81) while the trimmed tails are
    # O(c²) smoothing residue.  Same lumped-drop rule as coarse_drop_tol.
    setup_intermediate_tol: float = 5e-3
    # Jacobi damping weight.
    jacobi_omega: float = 2.0 / 3.0
    # Smoother: "jacobi" | "chebyshev"
    smoother: str = "jacobi"
    # Chebyshev polynomial degree.
    cheb_degree: int = 3
    # Chebyshev smoothing interval is [lambda_max/cheb_lower_bound, lambda_max].
    cheb_lower_bound: float = 30.0
    # Pre/post smoothing sweeps.
    nu_pre: int = 1
    nu_post: int = 1
    # Cycle type: "V" | "W"
    cycle: str = "V"
    # RS interpolation:
    #   "extended_i"      — TRUE distance-two extended+i (De Sterck/Yang,
    #                       hypre's PMIS partner) — oracle AND device;
    #   "smoothed_direct" — direct interpolation + one Jacobi improvement
    #                       pass, truncated to p_max (cheaper setup;
    #                       recovers most of the ext+i quality on PMIS
    #                       grids — measured in BASELINE.md);
    #   "direct"          — classical distance-one only.
    interpolation: str = "extended_i"
    # Truncate interpolation rows to this many largest-|w| entries
    # (rescaled to preserve row sums); bounds operator complexity and fixes
    # the static ELL width of P on device.
    p_max: int = 4
    # Power-iteration steps for lambda_max estimation (Chebyshev / SA).
    lambda_power_iters: int = 15
    # Keep Galerkin triple products on device when True (Phase-3 on-device
    # setup); False = host (numpy) setup path.
    on_device_setup: bool = False
    # Distributed (PCSR) hierarchies: levels with at most this many rows are
    # agglomerated — replicated onto every device and solved redundantly
    # (identical compute per shard, zero collectives below the boundary)
    # instead of staying row-sharded where each tiny matvec pays an
    # all-to-all latency.  The coarse-grid re-partitioning of
    # SURVEY.md §2.1/§2.5 taken to its TPU-native endpoint.  0 disables.
    agglomerate_n: int = 2048
    # Structured triple-product engine:
    #   "dense"    — materialize the full-grid Sᵀ(A S) planes (fastest
    #                compile; memory ~ D_M·n);
    #   "bucketed" — transfer-first exact Galerkin: intermediates carry only
    #                the coarse-offset planes (3^d at b=3) on the fine grid;
    #   "slab"     — the dense pipeline in axis-0 slabs (for huge n with
    #                thin stencils, e.g. the ≥100M-DOF fine level);
    #   "auto"     — pick by estimated intermediate bytes vs the budget.
    setup_product_path: str = "auto"
    # Intermediate-memory budget steering "auto" and sizing slabs.
    setup_chunk_budget_mb: int = 2048
    # Distributed halo-exchange mode for sharded stencil SpMV:
    #   "xla"          — ppermute + boundary-correction formulation; XLA's
    #                    scheduler is *free* to overlap comm with compute;
    #   "pallas_async" — guaranteed overlap: Pallas make_async_remote_copy
    #                    RDMA kernel (start DMA → interior stencil → wait →
    #                    boundary corrections; parallel/phalo_async.py).
    halo_mode: str = "xla"

    def __post_init__(self):
        if self.coarsening not in ("rs", "sa"):
            raise ValueError(f"coarsening must be 'rs'|'sa', got {self.coarsening}")
        if self.smoother not in ("jacobi", "chebyshev"):
            raise ValueError(f"smoother must be 'jacobi'|'chebyshev', got {self.smoother}")
        if self.cycle not in ("V", "W"):
            raise ValueError(f"cycle must be 'V'|'W', got {self.cycle}")
        if self.interpolation not in ("extended_i", "smoothed_direct",
                                      "direct"):
            raise ValueError(
                "interpolation must be extended_i|smoothed_direct|direct, "
                f"got {self.interpolation}")
        if self.halo_mode not in ("xla", "pallas_async"):
            raise ValueError(
                f"halo_mode must be xla|pallas_async, got {self.halo_mode}")
        if self.setup_product_path not in ("auto", "dense", "bucketed",
                                           "slab"):
            raise ValueError(
                "setup_product_path must be auto|dense|bucketed|slab, got "
                f"{self.setup_product_path}")


@dataclasses.dataclass(frozen=True)
class SolveConfig:
    """Outer-solver configuration (standalone cycles or preconditioned CG)."""

    tol: float = 1e-8
    maxiter: int = 200
    # Record the residual history inside the solve loop (adds one psum per
    # iteration which the solver needs anyway for the stopping test).
    record_history: bool = True


DEFAULT_AMG = AMGConfig()
DEFAULT_SOLVE = SolveConfig()
