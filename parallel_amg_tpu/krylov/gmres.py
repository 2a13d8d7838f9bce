"""Flexible GMRES(m) — restarted, AMG-preconditionable, fully traceable.

Complements CG for the non-symmetric / variable-preconditioner cases the
reference stack covers via IterativeSolvers.jl (SURVEY.md §1 L7).  Flexible
variant (Saad): the preconditioned vectors Z_j are stored so M may change
between iterations (e.g. a nonstationary AMG cycle).

Each restart cycle runs a fixed m Arnoldi steps (static shapes; happy
breakdown handled by zero-padding) and solves the small least-squares problem
with dense QR on device; convergence is checked at restart boundaries inside
one ``lax.while_loop``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GMRESResult(NamedTuple):
    x: jax.Array
    iters: jax.Array  # restart cycles executed
    residual_norm: jax.Array
    converged: jax.Array


def fgmres(A_matvec: Callable, b, M: Optional[Callable] = None,
           tol: float = 1e-8, restart: int = 30,
           max_restarts: int = 50) -> GMRESResult:
    """Right-preconditioned flexible GMRES(restart)."""
    precond = M if M is not None else (lambda r: r)
    n = b.shape[0]
    dtype = b.dtype
    m = int(restart)
    nb = jnp.linalg.norm(b)
    target = tol * nb
    eps_breakdown = jnp.asarray(1e-30, dtype)

    def arnoldi_cycle(x):
        r = b - A_matvec(x)
        beta = jnp.linalg.norm(r)
        # guard: if beta == 0 the basis is zeros and y solves to 0
        v0 = jnp.where(beta > eps_breakdown, 1.0 / jnp.maximum(beta, eps_breakdown), 0.0) * r
        V0 = jnp.zeros((m + 1, n), dtype).at[0].set(v0)
        Z0 = jnp.zeros((m, n), dtype)
        H0 = jnp.zeros((m + 1, m), dtype)

        def step(j, carry):
            V, Z, H = carry
            z = precond(V[j])
            w = A_matvec(z)
            # modified Gram-Schmidt against basis rows 0..j (mask the rest)
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h = (V @ w) * mask
            w = w - V.T @ h
            # re-orthogonalization pass (cheap, improves f32 stability)
            h2 = (V @ w) * mask
            w = w - V.T @ h2
            h = h + h2
            hn = jnp.linalg.norm(w)
            vnext = jnp.where(hn > eps_breakdown, 1.0 / jnp.maximum(hn, eps_breakdown), 0.0) * w
            V = V.at[j + 1].set(vnext)
            Z = Z.at[j].set(z)
            H = H.at[:, j].set(h.at[j + 1].set(hn))
            return V, Z, H

        V, Z, H = jax.lax.fori_loop(0, m, step, (V0, Z0, H0))
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        # small dense least squares via QR (m+1 × m)
        Q, R = jnp.linalg.qr(H, mode="reduced")
        y = jax.scipy.linalg.solve_triangular(
            R + eps_breakdown * jnp.eye(m, dtype=dtype), Q.T @ g, lower=False
        )
        return x + Z.T @ y

    def cond(carry):
        x, k, r_norm = carry
        return (r_norm > target) & (k < max_restarts)

    def body(carry):
        x, k, _ = carry
        x = arnoldi_cycle(x)
        r_norm = jnp.linalg.norm(b - A_matvec(x))
        return x, k + 1, r_norm

    x0 = jnp.zeros_like(b)
    x, k, r_norm = jax.lax.while_loop(cond, body, (x0, 0, nb))
    return GMRESResult(x=x, iters=k, residual_norm=r_norm, converged=r_norm <= target)
