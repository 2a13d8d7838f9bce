"""Distributed W-cycle and FGMRES on the 8-device mesh (VERDICT r2 item 9:
the round-1 coverage leftovers — these solvers previously ran only
single-device).  Parity: the same hierarchy algorithms on the sharded PCSR
containers must reproduce the single-device convergence behavior."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.parallel import make_row_mesh, pvector, to_global
from parallel_amg_tpu.parallel.psetup import distributed_setup
from parallel_amg_tpu.problems import poisson2d


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_row_mesh(8)


@pytest.fixture(scope="module")
def prob():
    coo = poisson2d(24)
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


def test_wcycle_distributed_parity(mesh8, prob):
    """W-cycle over an 8-shard PCSR hierarchy: same per-cycle residual
    contraction as the single-device hierarchy built from the same oracle
    levels (reduction-order tolerance only)."""
    cfg = AMGConfig(coarsening="rs", cycle="W", n_coarse_max=32,
                    agglomerate_n=0)
    n = prob.shape[0]
    bh = np.random.default_rng(0).normal(size=n)

    h_d = distributed_setup(prob, cfg, mesh8)
    part = h_d.levels[0].A.row_partition
    b_d = pvector(bh, part, mesh8)
    x_d, hist_d, k_d = pat.solve(h_d, b_d, tol=1e-6, maxiter=30)

    h_s = pat.setup(prob, cfg)
    x_s, hist_s, k_s = pat.solve(h_s, jnp.asarray(bh, jnp.float32),
                                 tol=1e-6, maxiter=30)

    assert abs(int(k_d) - int(k_s)) <= 1
    rel_d = (np.linalg.norm(bh - prob @ to_global(x_d, part).astype(float))
             / np.linalg.norm(bh))
    assert rel_d < 5e-6
    # residual histories track each other (same cycle, same operators)
    hd = np.asarray(hist_d)[: int(k_d)]
    hs = np.asarray(hist_s)[: int(k_s)]
    m = min(len(hd), len(hs))
    np.testing.assert_allclose(hd[:m], hs[:m], rtol=0.5)


def test_fgmres_distributed(mesh8, prob):
    """AMG-preconditioned FGMRES with the full Arnoldi loop running over
    sharded vectors (psum dots under the hood)."""
    cfg = AMGConfig(coarsening="rs", n_coarse_max=32, agglomerate_n=0)
    n = prob.shape[0]
    bh = np.random.default_rng(1).normal(size=n)

    h_d = distributed_setup(prob, cfg, mesh8)
    part = h_d.levels[0].A.row_partition
    b_d = pvector(bh, part, mesh8)
    res = pat.amg_fgmres(h_d.levels[0].A, h_d, b_d, tol=1e-6,
                         restart=20, max_restarts=10)
    assert bool(res.converged)
    x = to_global(res.x, part).astype(np.float64)
    assert np.linalg.norm(bh - prob @ x) <= 5e-5 * np.linalg.norm(bh)


def test_wcycle_on_device_rs_distributed(mesh8, prob):
    """W-cycle over the fully on-device distributed RS hierarchy (the
    round-3 setup path) — no oracle anywhere."""
    cfg = AMGConfig(coarsening="rs", cycle="W", smoother="chebyshev",
                    n_coarse_max=40, on_device_setup=True)
    n = prob.shape[0]
    bh = np.random.default_rng(2).normal(size=n)
    h = distributed_setup(prob, cfg, mesh8)
    part = h.levels[0].A.row_partition
    b = pvector(bh, part, mesh8)
    res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=60)
    assert bool(res.converged)
    x = to_global(res.x, part).astype(np.float64)
    assert np.linalg.norm(bh - prob @ x) <= 5e-5 * np.linalg.norm(bh)
