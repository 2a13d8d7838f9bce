"""Sanity tests for the serial AMG oracle itself (it must be trustworthy
before it can referee the device path): splitting/interpolation invariants
and textbook convergence rates on the acceptance problems."""

import numpy as np
import scipy.sparse as sp
import pytest

from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.oracle import (
    oracle_setup,
    oracle_solve,
    oracle_pcg,
)
from parallel_amg_tpu.oracle.serial_amg import (
    COARSE,
    FINE,
    classical_strength,
    pmis_split,
    greedy_aggregation,
)
from parallel_amg_tpu.problems import poisson2d, poisson3d, anisotropic2d


def _sp(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


def test_classical_strength_poisson():
    A = _sp(poisson2d(8))
    S = classical_strength(A, 0.25)
    # Poisson: all off-diagonals equal → all strong; no diagonal.
    assert S.nnz == A.nnz - A.shape[0]
    assert S.diagonal().sum() == 0


def test_classical_strength_anisotropic():
    A = _sp(anisotropic2d(8, epsilon=1e-3))
    S = classical_strength(A, 0.25)
    # only x-direction neighbors (weight 1) are strong vs eps=1e-3
    ny = 8
    coo = S.tocoo()
    assert np.all(np.abs(coo.row - coo.col) == ny)


def test_pmis_invariants():
    A = _sp(poisson2d(16))
    S = classical_strength(A, 0.25)
    state = pmis_split(S)
    assert set(np.unique(state)) <= {FINE, COARSE}
    # every F point has a strong C neighbor
    for i in np.flatnonzero(state == FINE):
        nbrs = S.indices[S.indptr[i] : S.indptr[i + 1]]
        assert (state[nbrs] == COARSE).any()
    # no two adjacent C points that are strongly connected both ways (MIS-ish
    # property is approximate for PMIS; at least check coarsening happened)
    frac = (state == COARSE).mean()
    assert 0.1 < frac < 0.75


def test_aggregation_covers_all():
    A = _sp(poisson2d(12))
    from parallel_amg_tpu.oracle.serial_amg import sa_strength

    agg = greedy_aggregation(sa_strength(A, 0.0))
    assert (agg >= 0).all()
    n_agg = agg.max() + 1
    assert n_agg < A.shape[0] / 2


@pytest.mark.parametrize("coarsening,smoother,band", [
    ("rs", "jacobi", 0.50),
    ("rs", "chebyshev", 0.40),
    # SA + single damped-Jacobi sweep is a weak pairing (no SGS on TPU);
    # Chebyshev is the production smoother — the Jacobi row just guards
    # against regressions.
    ("sa", "jacobi", 0.65),
    ("sa", "chebyshev", 0.45),
])
def test_vcycle_convergence_poisson2d(coarsening, smoother, band):
    A = _sp(poisson2d(32))
    cfg = AMGConfig(coarsening=coarsening, smoother=smoother, n_coarse_max=64)
    h = oracle_setup(A, cfg)
    assert len(h.levels) >= 2
    assert h.operator_complexity < 3.0
    rng = np.random.default_rng(0)
    b = rng.normal(size=A.shape[0])
    x, hist = oracle_solve(h, b, tol=1e-8, maxiter=60)
    # healthy AMG: residual reduction factor well below 1
    factors = hist[1:] / hist[:-1]
    assert np.median(factors) < band, f"median factor {np.median(factors)}"
    assert hist[-1] <= 1e-8 * np.linalg.norm(b)


def test_rs_extended_i_scalable():
    """The V-cycle factor must not degrade with grid size (the property that
    motivates extended+i over direct interpolation on PMIS grids)."""
    factors = []
    for nx in (32, 64):
        A = _sp(poisson2d(nx))
        h = oracle_setup(A, AMGConfig(coarsening="rs", n_coarse_max=64))
        b = np.random.default_rng(0).normal(size=A.shape[0])
        _, hist = oracle_solve(h, b, tol=1e-8, maxiter=60)
        factors.append(np.median(hist[1:] / hist[:-1]))
    assert factors[1] < factors[0] + 0.08, factors


def test_vcycle_convergence_poisson3d_sa():
    A = _sp(poisson3d(12))
    cfg = AMGConfig(coarsening="sa", smoother="chebyshev", n_coarse_max=64)
    h = oracle_setup(A, cfg)
    rng = np.random.default_rng(0)
    b = rng.normal(size=A.shape[0])
    x, hist = oracle_solve(h, b, tol=1e-8, maxiter=60)
    factors = hist[1:] / hist[:-1]
    assert np.median(factors) < 0.45
    assert hist[-1] <= 1e-8 * np.linalg.norm(b)


def test_pcg_poisson2d_rs():
    A = _sp(poisson2d(32))
    cfg = AMGConfig(coarsening="rs", n_coarse_max=64)
    h = oracle_setup(A, cfg)
    rng = np.random.default_rng(1)
    b = rng.normal(size=A.shape[0])
    x, iters, hist = oracle_pcg(A, b, h, tol=1e-8)
    assert iters <= 20, f"PCG took {iters} iterations"
    np.testing.assert_allclose(A @ x, b, atol=2e-7 * np.linalg.norm(b))


def test_chebyshev_smoother_anisotropic():
    A = _sp(anisotropic2d(24, epsilon=1e-3))
    cfg = AMGConfig(
        coarsening="rs", smoother="chebyshev", cheb_degree=3, n_coarse_max=32
    )
    h = oracle_setup(A, cfg)
    rng = np.random.default_rng(2)
    b = rng.normal(size=A.shape[0])
    x, iters, hist = oracle_pcg(A, b, h, tol=1e-8)
    assert iters <= 30, f"PCG took {iters} iterations"


def test_wcycle_at_least_as_good_as_v():
    A = _sp(poisson2d(32))
    bv = np.random.default_rng(3).normal(size=A.shape[0])
    hv = oracle_setup(A, AMGConfig(cycle="V", n_coarse_max=64))
    hw = oracle_setup(A, AMGConfig(cycle="W", n_coarse_max=64))
    _, hist_v = oracle_solve(hv, bv, maxiter=30)
    _, hist_w = oracle_solve(hw, bv, maxiter=30)
    assert len(hist_w) <= len(hist_v) + 1
