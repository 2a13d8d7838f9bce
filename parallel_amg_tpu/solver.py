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
    iteration.  On the structured (stencil) path the whole CG runs in N-D
    grid layout — conversion happens once at entry/exit.

    Pass A=None to solve with the hierarchy's own fine operator — at large
    n this matters: a separate A argument is a second multi-GB device
    buffer in the compiled program even when it's the same array (observed
    2×3.08 GB at 110M DOF).  A non-None A supports mixed precision (f32
    operator with a lower-precision hierarchy).
    """
    from parallel_amg_tpu.amg.cycle import _cycle

    if A is None:
        A = hierarchy.levels[0].A
    gamma = 1 if hierarchy.config.cycle == "V" else 2
    bg = hierarchy.to_grid(b)

    def M(r):
        return _cycle(hierarchy, 0, jnp.zeros_like(r), r, gamma)

    res = cg(A.matvec, bg, M=M, tol=tol, maxiter=maxiter)
    return res._replace(x=res.x.reshape(b.shape))


@partial(jax.jit, static_argnames=("tol", "maxiter", "gamma"))
def _pcg_mp(A, hierarchy: Hierarchy, bg, tol: float, maxiter: int,
            gamma: int) -> CGResult:
    from parallel_amg_tpu.amg.cycle import _cycle

    pdtype = hierarchy.levels[0].d_inv.dtype

    def M(r):
        z = _cycle(hierarchy, 0, jnp.zeros(r.shape, pdtype),
                   r.astype(pdtype), gamma)
        return z.astype(r.dtype)

    return cg(A.matvec, bg, M=M, tol=tol, maxiter=maxiter)


def amg_pcg_mp(A, hierarchy: Hierarchy, b, tol: float = 1e-8,
               maxiter: int = 500) -> CGResult:
    """Mixed-precision AMG-PCG to the spec tolerance 1e-8 (BASELINE.json:5).

    Krylov vectors, dot products and the A·p application run in f64 (XLA:TPU
    emulates f64 elementwise ops; only the O(n) Krylov work pays it), while
    the preconditioner is the f32/bf16 V-cycle unchanged — the V-cycle is a
    preconditioner, so its precision only shifts the iteration count by the
    usual mixed-precision noise (measured ±1 vs the f64 oracle).

    Pure-f32 PCG *cannot* honestly report 1e-8: its recursive residual keeps
    shrinking below the stagnated true residual (~1e-6..1e-7 relative at the
    acceptance scales).  Verified: tests/test_precision.py checks the TRUE
    residual of the returned iterate against the f64 oracle count.

    ``A`` must be an XLA-backend operator (Stencil/ELL/DIA/PCSR — anything
    whose matvec is jnp ops; the Pallas FlatDIA kernel is f32-only).  The
    mixed `with_spmv_backend` hierarchy keeps the fine level on the XLA
    path, so ``A=None`` (use the hierarchy's fine operator) works there.
    """
    from parallel_amg_tpu.amg.hierarchy import with_spmv_backend
    from parallel_amg_tpu.utils.precision import x64_scope

    # Pallas kernels cannot trace under the x64 flag (int-promotion
    # recursion in the kernel's loop arithmetic) and are f32-only anyway:
    # run the preconditioner on the XLA engine here.  Iteration counts are
    # engine-independent; only the per-cycle time differs.
    hierarchy = with_spmv_backend(hierarchy, "xla")
    with x64_scope():
        if A is None:
            A = hierarchy.levels[0].A
        gamma = 1 if hierarchy.config.cycle == "V" else 2
        bg = hierarchy.to_grid(jnp.asarray(b, jnp.float64))
        res = _pcg_mp(A, hierarchy, bg, tol, maxiter, gamma)
        return res._replace(x=res.x.reshape(b.shape))


@partial(jax.jit, static_argnames=("tol", "restart", "max_restarts"))
def amg_fgmres(A, hierarchy: Hierarchy, b, tol: float = 1e-8,
               restart: int = 30, max_restarts: int = 50) -> GMRESResult:
    """AMG-preconditioned flexible GMRES (non-symmetric operators).

    GMRES stacks basis vectors, so it runs in flat 1D layout; the stencil
    path pays one reshape per operator application here (CG is the
    structured flagship)."""
    dims = hierarchy.grid_dims

    if dims is None:
        A_mv = A.matvec

        def M(r):
            return vcycle(hierarchy, jnp.zeros_like(r), r)
    else:
        def A_mv(v):
            return A.matvec(v.reshape(dims)).reshape(-1)

        def M(r):
            return vcycle(hierarchy, jnp.zeros_like(r), r)

    return fgmres(A_mv, b, M=M, tol=tol, restart=restart,
                  max_restarts=max_restarts)
