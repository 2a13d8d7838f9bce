"""Preconditioned conjugate gradient — a traceable ``lax.while_loop`` program.

SURVEY.md §3.3: the outer Krylov driver.  ``cg`` is a pure traceable function
over callables (like ``jax.scipy.sparse.linalg.cg``): callers jit it with
their operator pytrees as arguments — see ``parallel_amg_tpu.solver.amg_pcg``
for the canonical jitted AMG-PCG entry point.  Dot products are plain jnp
reductions, which become ``psum`` collectives when traced inside shard_map
over sharded operands.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array  # number of iterations performed
    residual_history: jax.Array  # (maxiter+1,), inf-padded past `iters`
    converged: jax.Array


def cg(A_matvec: Callable, b, M: Optional[Callable] = None, tol: float = 1e-8,
       maxiter: int = 500) -> CGResult:
    """AMG-preconditioned CG to relative residual `tol` (BASELINE.json:5,8).

    Args:
      A_matvec: callable y = A @ x.
      b: right-hand side (any sharding; reductions follow the operands).
      M: preconditioner callable z = M(r) — e.g. one V-cycle. None=identity.
      tol, maxiter: static stopping parameters.
    """
    precond = M if M is not None else (lambda r: r)
    dtype = b.dtype
    nb = jnp.linalg.norm(b)
    target = tol * nb

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    hist0 = jnp.full((maxiter + 1,), jnp.inf, dtype=dtype)
    hist0 = hist0.at[0].set(nb)

    def cond(carry):
        x, r, p, rz, k, r_norm, hist = carry
        return (r_norm > target) & (k < maxiter)

    def body(carry):
        x, r, p, rz, k, _, hist = carry
        q = A_matvec(p)
        alpha = rz / jnp.vdot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        r_norm = jnp.linalg.norm(r)
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        hist = hist.at[k + 1].set(r_norm)
        return x, r, p, rz_new, k + 1, r_norm, hist

    x, r, p, rz, k, r_norm, hist = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, 0, nb, hist0)
    )
    return CGResult(x=x, iters=k, residual_history=hist, converged=r_norm <= target)
