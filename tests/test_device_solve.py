"""Device (jitted) AMG solve path vs. the serial oracle.

Checks (SURVEY.md §4.2, §4.5): the jitted V-cycle on the frozen device
hierarchy reproduces the oracle's per-cycle residuals to f32 tolerance, and
AMG-PCG iteration counts match the oracle's within ±2 on the acceptance
problems.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.oracle import oracle_setup, oracle_solve, oracle_pcg
from parallel_amg_tpu.problems import poisson2d, poisson3d, anisotropic2d


def _sp(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


def test_vcycle_matches_oracle_poisson64x64():
    """Acceptance config #1 (BASELINE.json:7): 64×64 2D Poisson, V(1,1),
    weighted Jacobi, single device."""
    A = _sp(poisson2d(64))
    cfg = AMGConfig(coarsening="rs", smoother="jacobi", n_coarse_max=64)
    oh = oracle_setup(A, cfg)
    h = pat.setup(A, cfg)
    b = np.random.default_rng(0).normal(size=A.shape[0])

    # same hierarchy structure
    assert len(h.levels) == len(oh.levels)
    for dl, ol in zip(h.levels, oh.levels):
        assert dl.A.shape == ol.A.shape

    # one cycle from zero: compare iterates directly (f32 vs f64)
    x_dev = pat.vcycle(h, jnp.zeros(A.shape[0], jnp.float32),
                       jnp.asarray(b, jnp.float32))
    x_orc = np.zeros(A.shape[0])
    from parallel_amg_tpu.oracle import oracle_vcycle
    x_orc = oracle_vcycle(oh, x_orc, b)
    rel = np.linalg.norm(np.asarray(x_dev) - x_orc) / np.linalg.norm(x_orc)
    assert rel < 1e-4, f"one-cycle iterate mismatch: rel={rel}"

    # standalone solve converges with healthy factor (f32 floor ~1e-6 rel)
    x, hist, k = pat.solve(h, jnp.asarray(b, jnp.float32), tol=1e-5, maxiter=60)
    hist = np.asarray(hist)[: int(k)]
    factors = hist[1:] / hist[:-1]
    assert np.median(factors) < 0.5
    assert hist[-1] <= 1e-5 * np.linalg.norm(b)


@pytest.mark.parametrize("coarsening,smoother", [
    ("rs", "jacobi"),
    ("rs", "chebyshev"),
    ("sa", "chebyshev"),
])
def test_pcg_iters_match_oracle(coarsening, smoother):
    A = _sp(poisson2d(32))
    cfg = AMGConfig(coarsening=coarsening, smoother=smoother, n_coarse_max=64)
    oh = oracle_setup(A, cfg)
    h = pat.setup(A, cfg)
    b = np.random.default_rng(1).normal(size=A.shape[0])
    # f32 device solve to 1e-6 (f32 dot-product floor); oracle to the same tol
    _, oracle_iters, _ = oracle_pcg(A, b, oh, tol=1e-6)
    A_ell = h.levels[0].A
    res = pat.amg_pcg(A_ell, h, jnp.asarray(b, jnp.float32), tol=1e-6, maxiter=100)
    assert bool(res.converged)
    assert abs(int(res.iters) - oracle_iters) <= 2, (
        f"device {int(res.iters)} vs oracle {oracle_iters}"
    )
    # true residual agrees
    x = np.asarray(res.x, dtype=np.float64)
    assert np.linalg.norm(b - A @ x) <= 5e-6 * np.linalg.norm(b)


def test_pcg_anisotropic_chebyshev():
    """Acceptance config #4 (BASELINE.json:10) at reduced scale."""
    A = _sp(anisotropic2d(64, epsilon=1e-3))
    cfg = AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=64)
    h = pat.setup(A, cfg)
    b = np.random.default_rng(2).normal(size=A.shape[0])
    res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                      tol=1e-6, maxiter=60)
    assert bool(res.converged)
    assert int(res.iters) <= 25


def test_pcg_poisson3d_sa():
    """Acceptance config #3 (BASELINE.json:9) at reduced scale, 1 device."""
    A = _sp(poisson3d(16))
    cfg = AMGConfig(coarsening="sa", smoother="chebyshev", n_coarse_max=64)
    h = pat.setup(A, cfg)
    b = np.random.default_rng(3).normal(size=A.shape[0])
    res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                      tol=1e-6, maxiter=60)
    assert bool(res.converged)
    assert int(res.iters) <= 25


def test_wcycle_device():
    A = _sp(poisson2d(32))
    cfg = AMGConfig(coarsening="rs", cycle="W", n_coarse_max=32)
    h = pat.setup(A, cfg)
    b = np.random.default_rng(4).normal(size=A.shape[0])
    x, hist, k = pat.solve(h, jnp.asarray(b, jnp.float32), tol=1e-5, maxiter=40)
    assert np.asarray(hist)[int(k) - 1] <= 1e-5 * np.linalg.norm(b)


def test_fgmres_with_amg():
    A = _sp(poisson2d(32))
    cfg = AMGConfig(coarsening="rs", n_coarse_max=64)
    h = pat.setup(A, cfg)
    b = np.random.default_rng(5).normal(size=A.shape[0])
    res = pat.amg_fgmres(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                         tol=1e-5, restart=20, max_restarts=10)
    assert bool(res.converged)
    x = np.asarray(res.x, dtype=np.float64)
    assert np.linalg.norm(b - A @ x) <= 5e-5 * np.linalg.norm(b)
