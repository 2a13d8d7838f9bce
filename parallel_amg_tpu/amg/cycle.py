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
    """Dense coarse solve: one matmul with the precomputed M⁻¹ (replicated).

    b may be an N-D grid on the structured path — flattened for the dense
    apply (tiny level; the relayout is negligible here).  M⁻¹ is the eigh
    pseudo-inverse (hierarchy.coarse_inverse): robust to slightly indefinite
    coarse operators and MXU-friendly, unlike sequential triangular solves.
    """
    Minv = hierarchy.coarse_inv
    b32 = b.reshape(-1).astype(Minv.dtype)
    x = Minv @ b32
    return x.astype(b.dtype).reshape(b.shape)


def _zeros_coarse(P, dtype):
    if hasattr(P, "zeros_coarse"):
        return P.zeros_coarse(dtype)
    return jnp.zeros((P.shape[1],), dtype)


def _cycle(hierarchy, lvl: int, x, b, gamma: int):
    cfg = hierarchy.config
    if lvl == hierarchy.n_levels - 1:
        return coarse_solve(hierarchy, b)
    level = hierarchy.levels[lvl]
    x = smoothers.smooth(level, x, b, cfg, cfg.nu_pre)
    r = b - level.A.matvec(x)
    bc = _apply_transfer(level.R, level, r)
    xc = _zeros_coarse(level.P, b.dtype)
    for _ in range(gamma):
        xc = _cycle(hierarchy, lvl + 1, xc, bc, gamma)
    x = x + _apply_transfer(level.P, level, xc)
    x = smoothers.smooth(level, x, b, cfg, cfg.nu_post)
    return x


def _apply_transfer(T, level, v):
    """Apply P/R; linked block transfers borrow the level's operator so the
    hierarchy pytree carries the fine operator exactly once."""
    if getattr(T, "linked", False):
        return T.matvec_linked(level.A, level.d_inv, v)
    return T.matvec(v)


def vcycle(hierarchy, x, b):
    """One multigrid cycle (V or W per config) starting from iterate x.

    Accepts user-facing 1D vectors or internal-layout grids; the result
    matches the input layout.
    """
    gamma = 1 if hierarchy.config.cycle == "V" else 2
    xg = hierarchy.to_grid(x)
    bg = hierarchy.to_grid(b)
    out = _cycle(hierarchy, 0, xg, bg, gamma)
    return out.reshape(x.shape)


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def solve(hierarchy, b, tol: float = 1e-8, maxiter: int = 100):
    """Standalone multigrid: cycle until ||r|| ≤ tol·||b|| or maxiter.

    Runs as one jitted ``lax.while_loop``; returns (x, residual_history,
    n_cycles) with the history padded to ``maxiter`` (inf past the end).
    """
    nb = jnp.linalg.norm(b)
    target = tol * nb
    bg = hierarchy.to_grid(b)
    gamma = 1 if hierarchy.config.cycle == "V" else 2

    def cond(carry):
        x, r_norm, k, hist = carry
        return (r_norm > target) & (k < maxiter)

    def body(carry):
        x, _, k, hist = carry
        x = _cycle(hierarchy, 0, x, bg, gamma)
        r_norm = jnp.linalg.norm(bg - hierarchy.levels[0].A.matvec(x))
        hist = hist.at[k].set(r_norm)
        return x, r_norm, k + 1, hist

    x0 = jnp.zeros_like(bg)
    hist0 = jnp.full((maxiter,), jnp.inf, dtype=b.dtype)
    x, r_norm, k, hist = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(jnp.inf, b.dtype), 0, hist0)
    )
    return x.reshape(b.shape), hist, k
