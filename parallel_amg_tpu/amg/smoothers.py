"""Parallel smoothers: weighted Jacobi and Chebyshev (SURVEY.md §2.4).

Sequential Gauss-Seidel does not exist on TPU (no efficient sequential row
sweeps); polynomial smoothers are the standard parallel replacement — see
PAPERS.md rows 1 and 5 for the parallel-AMG smoother literature.  Both
smoothers are pure jnp over the level's ELL operator, so XLA fuses the
residual/axpy chains around the SpMV gathers.
"""

from __future__ import annotations

import jax.numpy as jnp

from parallel_amg_tpu.config import AMGConfig


def jacobi(level, x, b, omega: float, sweeps: int):
    """x ← x + ω D⁻¹ (b − A x), `sweeps` times."""
    for _ in range(sweeps):
        x = x + omega * level.d_inv * (b - level.A.matvec(x))
    return x


def chebyshev(level, x, b, degree: int, lower_bound: float):
    """Chebyshev polynomial smoothing on [λ_max/lower_bound, λ_max] of D⁻¹A.

    Classic three-term recurrence; degree k costs k SpMVs and needs only the
    λ_max estimate stored on the level at setup.
    """
    lmax = level.lam_max
    lmin = lmax / lower_bound
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    d = level.d_inv * (b - level.A.matvec(x)) / theta
    x = x + d
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * (
            level.d_inv * (b - level.A.matvec(x))
        )
        x = x + d
        rho = rho_new
    return x


def smooth(level, x, b, config: AMGConfig, sweeps: int):
    """Dispatch on config.smoother (static under jit)."""
    if config.smoother == "chebyshev":
        for _ in range(sweeps):
            x = chebyshev(level, x, b, config.cheb_degree, config.cheb_lower_bound)
        return x
    return jacobi(level, x, b, config.jacobi_omega, sweeps)
