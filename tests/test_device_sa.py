"""On-device algebraic (greedy/Vanek-analog) SA setup — amg/device_sa.py.

Closes the round-2 "greedy/Vanek SA aggregation on device" gap: the MIS
aggregation must be a valid covering with non-adjacent seeds, and the full
device hierarchy must converge in the oracle's iteration band (the
aggregate-level substitution argument of SURVEY.md §7 hard-part 3).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.amg.device_sa import (
    device_sa_setup,
    mis_aggregate,
    sa_strength_mask,
)
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.problems import poisson2d, poisson3d


def _ell(coo):
    return ELL.from_csr(coo.to_csr(), dtype=jnp.float32)


def test_mis_aggregation_is_valid_cover():
    coo = poisson2d(24)
    A = _ell(coo)
    S = sa_strength_mask(A, 0.0)
    agg, nc = mis_aggregate(A, S, seed=0)
    agg_np = np.asarray(agg)
    n = coo.shape[0]
    # full cover with contiguous ids
    assert agg_np.min() >= 0
    assert agg_np.max() == nc - 1
    assert len(np.unique(agg_np)) == nc
    # sane coarsening rate for strength-everything on 2D Poisson: MIS
    # aggregates average ≥ 3 nodes
    assert nc <= n // 3


def test_device_sa_matches_oracle_band_2d():
    coo = poisson2d(32)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    cfg = AMGConfig(coarsening="sa", aggregate="greedy",
                    smoother="chebyshev", n_coarse_max=64,
                    on_device_setup=True)
    h = pat.setup(coo.to_csr(), cfg)
    gc, oc = h.complexity()
    assert gc < 2.0 and oc < 3.0, (gc, oc)
    b = np.random.default_rng(0).normal(size=A_sp.shape[0])
    res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                      tol=1e-6, maxiter=60)
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(b - A_sp @ x) <= 5e-5 * np.linalg.norm(b)

    # oracle band: serial greedy SA on the same matrix
    from parallel_amg_tpu.oracle.serial_amg import oracle_pcg, oracle_setup
    oh = oracle_setup(A_sp, AMGConfig(coarsening="sa", aggregate="greedy",
                                      smoother="chebyshev", n_coarse_max=64))
    _, oit, _ = oracle_pcg(A_sp, b, oh, tol=1e-6, maxiter=60)
    assert int(res.iters) <= int(oit) + 4


def test_device_sa_3d():
    coo = poisson3d(10)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    cfg = AMGConfig(coarsening="sa", aggregate="greedy",
                    smoother="chebyshev", n_coarse_max=64,
                    on_device_setup=True)
    h = pat.setup(coo.to_csr(), cfg)
    b = np.random.default_rng(1).normal(size=A_sp.shape[0])
    res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                      tol=1e-6, maxiter=60)
    assert bool(res.converged)
    assert int(res.iters) <= 30
