"""Multigrid cycles — fully jitted, unrolled over the static hierarchy.

The V/W-cycle recursion (SURVEY.md §3.2) is a Python recursion over the
hierarchy's level list; because the list length and every operator shape are
static, one ``jax.jit`` of :func:`vcycle` traces the whole cycle into a
single XLA program — no host round-trips between levels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from parallel_amg_tpu.amg import smoothers


def coarse_solve(hierarchy, b):
    """Dense Cholesky solve on the coarsest level (replicated)."""
    L = hierarchy.coarse_chol
    b32 = b.astype(L.dtype)
    y = jax.scipy.linalg.solve_triangular(L, b32, lower=True)
    x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return x.astype(b.dtype)


def _cycle(hierarchy, lvl: int, x, b, gamma: int):
    cfg = hierarchy.config
    if lvl == hierarchy.n_levels - 1:
        return coarse_solve(hierarchy, b)
    level = hierarchy.levels[lvl]
    x = smoothers.smooth(level, x, b, cfg, cfg.nu_pre)
    r = b - level.A.matvec(x)
    bc = level.R.matvec(r)
    xc = jnp.zeros(level.P.shape[1], dtype=b.dtype)
    for _ in range(gamma):
        xc = _cycle(hierarchy, lvl + 1, xc, bc, gamma)
    x = x + level.P.matvec(xc)
    x = smoothers.smooth(level, x, b, cfg, cfg.nu_post)
    return x


def vcycle(hierarchy, x, b):
    """One multigrid cycle (V or W per config) starting from iterate x."""
    gamma = 1 if hierarchy.config.cycle == "V" else 2
    return _cycle(hierarchy, 0, x, b, gamma)


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def solve(hierarchy, b, tol: float = 1e-8, maxiter: int = 100):
    """Standalone multigrid: cycle until ||r|| ≤ tol·||b|| or maxiter.

    Runs as one jitted ``lax.while_loop``; returns (x, residual_history,
    n_cycles) with the history padded to ``maxiter`` (inf past the end).
    """
    nb = jnp.linalg.norm(b)
    target = tol * nb

    def cond(carry):
        x, r_norm, k, hist = carry
        return (r_norm > target) & (k < maxiter)

    def body(carry):
        x, _, k, hist = carry
        x = vcycle(hierarchy, x, b)
        r_norm = jnp.linalg.norm(b - hierarchy.levels[0].A.matvec(x))
        hist = hist.at[k].set(r_norm)
        return x, r_norm, k + 1, hist

    x0 = jnp.zeros_like(b)
    hist0 = jnp.full((maxiter,), jnp.inf, dtype=b.dtype)
    x, r_norm, k, hist = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(jnp.inf, b.dtype), 0, hist0)
    )
    return x, hist, k
