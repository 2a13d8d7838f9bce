"""Top-level solver entry points: the user-facing API of the framework.

Mirrors the reference stack's outermost surface (``ruge_stuben(A)`` /
``smoothed_aggregation(A)`` → solver, ``cg!(x, A, b; Pl=ml)`` — SURVEY.md §1
L5-L7) in idiomatic JAX: setup once on host/device, then a single jitted
solve program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from parallel_amg_tpu.amg.cycle import vcycle
from parallel_amg_tpu.amg.hierarchy import Hierarchy, setup  # re-export
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.krylov.cg import cg, CGResult
from parallel_amg_tpu.krylov.gmres import fgmres, GMRESResult


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def amg_pcg(A, hierarchy: Hierarchy, b, tol: float = 1e-8,
            maxiter: int = 500) -> CGResult:
    """AMG-preconditioned CG: the acceptance-config solver (BASELINE.json:8).

    A and hierarchy are pytree arguments (no matrix constants baked into the
    compiled program); the preconditioner is one multigrid cycle per CG
    iteration.
    """
    def M(r):
        return vcycle(hierarchy, jnp.zeros_like(r), r)

    return cg(A.matvec, b, M=M, tol=tol, maxiter=maxiter)


@partial(jax.jit, static_argnames=("tol", "restart", "max_restarts"))
def amg_fgmres(A, hierarchy: Hierarchy, b, tol: float = 1e-8,
               restart: int = 30, max_restarts: int = 50) -> GMRESResult:
    """AMG-preconditioned flexible GMRES (non-symmetric operators)."""
    def M(r):
        return vcycle(hierarchy, jnp.zeros_like(r), r)

    return fgmres(A.matvec, b, M=M, tol=tol, restart=restart,
                  max_restarts=max_restarts)
