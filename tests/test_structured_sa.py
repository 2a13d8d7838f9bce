"""Structured block-SA path: all-DIA hierarchy + reshape transfers.

The TPU flagship configuration (gather-free V-cycle).  Checks device
numerics against the oracle's explicit sparse P/R and end-to-end PCG.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.amg.transfers import BlockProlongator, BlockRestrictor
from parallel_amg_tpu.ops.stencil import Stencil
from parallel_amg_tpu.oracle import oracle_setup, oracle_vcycle, oracle_pcg
from parallel_amg_tpu.problems import poisson2d, poisson3d


def _sp(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


CFG = AMGConfig(coarsening="sa", aggregate="block", block_size=2,
                smoother="chebyshev", n_coarse_max=64)


def test_structured_hierarchy_is_stencil():
    A = _sp(poisson2d(32))
    h = pat.setup(A, CFG, dims=(32, 32))
    assert len(h.levels) >= 3
    for lvl in h.levels:
        assert isinstance(lvl.A, Stencil), type(lvl.A)
    for lvl in h.levels[:-1]:
        assert isinstance(lvl.P, BlockProlongator)
        assert isinstance(lvl.R, BlockRestrictor)


def test_block_transfers_match_oracle_P(rng):
    """Reshape-based P/R must equal the oracle's explicit sparse P/R."""
    A = _sp(poisson2d(20))
    oh = oracle_setup(A, CFG, dims=(20, 20))
    h = pat.setup(A, CFG, dims=(20, 20))
    ol, dl = oh.levels[0], h.levels[0]
    xc = rng.normal(size=ol.P.shape[1]).astype(np.float32)
    got = np.asarray(dl.P.matvec_linked(
        dl.A, dl.d_inv, jnp.asarray(xc).reshape(dl.P.cdims)))
    np.testing.assert_allclose(got.reshape(-1), ol.P @ xc, rtol=2e-4,
                               atol=2e-5)
    r = rng.normal(size=ol.A.shape[0]).astype(np.float32)
    got = np.asarray(dl.R.matvec_linked(
        dl.A, dl.d_inv, jnp.asarray(r).reshape(dl.R.dims)))
    np.testing.assert_allclose(got.reshape(-1), ol.R @ r, rtol=2e-4,
                               atol=2e-5)


def test_block_transfers_3d(rng):
    A = _sp(poisson3d(9))
    cfg = AMGConfig(coarsening="sa", aggregate="block", block_size=3,
                    smoother="chebyshev", n_coarse_max=8)
    oh = oracle_setup(A, cfg, dims=(9, 9, 9))
    h = pat.setup(A, cfg, dims=(9, 9, 9))
    ol, dl = oh.levels[0], h.levels[0]
    xc = rng.normal(size=ol.P.shape[1]).astype(np.float32)
    got = np.asarray(dl.P.matvec_linked(
        dl.A, dl.d_inv, jnp.asarray(xc).reshape(dl.P.cdims)))
    np.testing.assert_allclose(got.reshape(-1), ol.P @ xc, rtol=2e-4,
                               atol=2e-5)
    r = rng.normal(size=ol.A.shape[0]).astype(np.float32)
    got = np.asarray(dl.R.matvec_linked(
        dl.A, dl.d_inv, jnp.asarray(r).reshape(dl.R.dims)))
    np.testing.assert_allclose(got.reshape(-1), ol.R @ r, rtol=2e-4,
                               atol=2e-5)


def test_structured_vcycle_matches_oracle(rng):
    A = _sp(poisson2d(32))
    oh = oracle_setup(A, CFG, dims=(32, 32))
    h = pat.setup(A, CFG, dims=(32, 32))
    b = rng.normal(size=A.shape[0])
    x_dev = pat.vcycle(h, jnp.zeros(A.shape[0], jnp.float32),
                       jnp.asarray(b, jnp.float32))
    x_orc = oracle_vcycle(oh, np.zeros(A.shape[0]), b)
    rel = np.linalg.norm(np.asarray(x_dev) - x_orc) / np.linalg.norm(x_orc)
    assert rel < 1e-3, rel  # f32 device vs f64 oracle across a deep cycle


def test_structured_pcg_3d(rng):
    """Acceptance config #3 shape (3D Poisson SA) on the structured path."""
    A = _sp(poisson3d(16))
    cfg = AMGConfig(coarsening="sa", aggregate="block", block_size=2,
                    smoother="chebyshev", n_coarse_max=64)
    oh = oracle_setup(A, cfg, dims=(16, 16, 16))
    h = pat.setup(A, cfg, dims=(16, 16, 16))
    b = rng.normal(size=A.shape[0])
    _, oracle_iters, _ = oracle_pcg(A, b, oh, tol=1e-6)
    res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                      tol=1e-6, maxiter=60)
    assert bool(res.converged)
    assert abs(int(res.iters) - oracle_iters) <= 2
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(b - A @ x) <= 5e-6 * np.linalg.norm(b)
