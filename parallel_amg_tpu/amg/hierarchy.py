"""AMG hierarchy: per-level operator pytrees + setup driver.

The hierarchy is the static backbone of the jitted solve path: a Python list
of :class:`Level` pytrees (so depth and all array shapes are fixed at trace
time) plus a replicated dense Cholesky factor for the coarsest level
(SURVEY.md §2.3 "Hierarchy builder", "Coarse solve").
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.ell import ELL


@jax.tree_util.register_pytree_node_class
class Level:
    """One multigrid level: A (and transfer ops to the next-coarser level).

    ``P``/``R`` are ``None`` on the coarsest level.  ``lam_max`` is the
    λ_max(D⁻¹A) estimate used by Chebyshev smoothing (0.0 when unused) —
    a traced scalar so re-setup does not retrigger compilation.
    """

    def __init__(self, A: ELL, P: Optional[ELL], R: Optional[ELL],
                 d_inv, lam_max):
        self.A = A
        self.P = P
        self.R = R
        self.d_inv = d_inv
        self.lam_max = lam_max

    def tree_flatten(self):
        return (self.A, self.P, self.R, self.d_inv, self.lam_max), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n(self) -> int:
        return self.A.n_rows


@jax.tree_util.register_pytree_node_class
class Hierarchy:
    """Full AMG hierarchy. A pytree; ``config`` is static aux data."""

    def __init__(self, levels: List[Level], coarse_chol, config: AMGConfig):
        self.levels = levels
        # Cholesky factor (lower) of the dense coarsest-level matrix.
        self.coarse_chol = coarse_chol
        self.config = config

    def tree_flatten(self):
        return (self.levels, self.coarse_chol), self.config

    @classmethod
    def tree_unflatten(cls, config, children):
        levels, coarse_chol = children
        return cls(levels, coarse_chol, config)

    @property
    def n_levels(self) -> int:
        return len(self.levels)

    def complexity(self):
        """(grid_complexity, operator_complexity) — host-side diagnostics."""
        rows = [l.A.n_rows for l in self.levels]
        nnz = [int(np.asarray(l.A.nnz)) for l in self.levels]
        return sum(rows) / rows[0], sum(nnz) / nnz[0]


# ---------------------------------------------------------------------------
# Setup driver
# ---------------------------------------------------------------------------

def setup(A, config: AMGConfig = AMGConfig(), dtype=jnp.float32,
          seed: int = 0) -> Hierarchy:
    """Build an AMG hierarchy from a host CSR (or COO/scipy) matrix.

    Backend selection per ``config.on_device_setup``:
    - False → host numpy setup (oracle algorithms), frozen to device arrays.
    - True  → on-device jnp setup (amg.device_setup).
    """
    if config.on_device_setup:
        from parallel_amg_tpu.amg.device_setup import device_setup

        return device_setup(A, config, dtype=dtype, seed=seed)
    return host_setup(A, config, dtype=dtype, seed=seed)


def host_setup(A, config: AMGConfig, dtype=jnp.float32, seed: int = 0) -> Hierarchy:
    """Host (numpy, float64) setup → static-shape device hierarchy.

    Runs the serial reference algorithms (oracle module) and converts each
    level's operators to padded ELL device arrays.  Cited against the
    reference design's setup/solve split (SURVEY.md §1 L5/L6).
    """
    from parallel_amg_tpu.oracle.serial_amg import oracle_setup

    if isinstance(A, CSR):
        A_sp = A.to_scipy()
    elif hasattr(A, "to_csr"):  # COO
        A_sp = A.to_csr().to_scipy()
    else:
        A_sp = A  # assume scipy sparse / dense
    oh = oracle_setup(A_sp, config, seed=seed)

    levels: List[Level] = []
    for ol in oh.levels:
        A_ell = ELL.from_csr(CSR.from_scipy(ol.A), dtype=dtype)
        P_ell = R_ell = None
        if ol.P is not None:
            P_ell = ELL.from_csr(CSR.from_scipy(ol.P), dtype=dtype)
            R_ell = ELL.from_csr(CSR.from_scipy(ol.R), dtype=dtype)
        levels.append(
            Level(
                A=A_ell,
                P=P_ell,
                R=R_ell,
                d_inv=jnp.asarray(ol.d_inv, dtype=dtype),
                lam_max=jnp.asarray(ol.lam_max, dtype=dtype),
            )
        )
    coarse_dense = jnp.asarray(oh.levels[-1].A.toarray(), dtype=jnp.float32)
    # SPD coarse matrix → Cholesky. Solve in f32 even when the cycle runs in
    # a lower precision (the coarse level is tiny).
    coarse_chol = jnp.linalg.cholesky(coarse_dense)
    return Hierarchy(levels, coarse_chol, config)
