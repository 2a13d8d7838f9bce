"""Distributed on-device algebraic SA setup (parallel/psa_setup.py) —
VERDICT r3 item 5's done-criteria:

1. 8-shard SA hierarchy converges on 2D/3D Poisson with NO host-global
   matrix in the setup call graph (serial oracle + PCSR host round-trip
   monkeypatch-forbidden during setup);
2. convergence-band parity vs the single-device ``device_sa_setup`` (the
   same level-equivalence contract as PMIS-for-RS — aggregates differ by
   tie-breaking/numbering, iteration counts must not);
3. aggregation invariants: every strongly-connected row aggregates, seeds
   are pairwise distance->2, aggregate count is sane.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.parallel import make_row_mesh, pvector, to_global
from parallel_amg_tpu.parallel.pcsr import PCSR
from parallel_amg_tpu.parallel import psa_setup as psa
from parallel_amg_tpu.problems import poisson2d, poisson3d


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_row_mesh(8)


def _cfg(**kw):
    kw.setdefault("coarsening", "sa")
    kw.setdefault("smoother", "chebyshev")
    kw.setdefault("n_coarse_max", 40)
    kw.setdefault("on_device_setup", True)
    kw.setdefault("coarse_drop_tol", 0.0)
    return AMGConfig(**kw)


def _scipy(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


def test_aggregation_invariants(mesh8):
    """Seeds distance->2 apart; every strongly-connected row aggregated;
    aggregate ids point at real seeds."""
    A_sp = _scipy(poisson2d(16))
    A_p = PCSR.from_csr(A_sp, mesh8)
    Sd, So = psa.pcsr_sa_strength(A_p, 0.0)
    state = psa.pcsr_mis_seed(A_p, Sd, So, seed=0)
    cmap, mc_pad, nc = psa.coarse_numbering(A_p, state)
    agg, leftover = psa.pcsr_attach(A_p, Sd, So, cmap)
    assert leftover == 0
    agg_h = np.asarray(agg)
    st = np.asarray(state)
    n = A_sp.shape[0]
    m = A_p.row_partition.rows_per_shard
    # padding rows are inert (-2); real rows all aggregated (Poisson rows
    # all have strong connections at theta=0)
    assert np.all(agg_h[:n][st[:n] == psa.COARSE] >= 0)
    assert np.all(agg_h[:n] >= 0)
    assert np.all(agg_h[n:] == -2)
    # seeds: pairwise graph distance > 2 (distance-2 MIS invariant)
    seeds = np.flatnonzero(st[:n] == psa.COARSE)
    Adj = (abs(A_sp) > 0).astype(np.int8)
    Adj.setdiag(0)
    Adj.eliminate_zeros()
    two_hop = (Adj + Adj @ Adj).tocsr()
    sub = two_hop[seeds][:, seeds].tolil()
    sub.setdiag(0)
    assert sub.count_nonzero() == 0, "two seeds within distance 2"
    # every aggregate id maps back to a seed's id
    seed_ids = set(np.asarray(cmap)[seeds].tolist())
    assert set(agg_h[:n].tolist()) <= seed_ids
    assert nc == len(seeds)
    assert mc_pad >= 1


def test_distributed_sa_pcg_no_host_matrix(mesh8, monkeypatch):
    """End-to-end distributed_setup(SA, on_device): converges, all-PCSR
    levels, no host-global matrix during setup, iteration band vs the
    single-device device_sa_setup."""
    from parallel_amg_tpu.amg.device_sa import device_sa_setup
    from parallel_amg_tpu.oracle import serial_amg
    from parallel_amg_tpu.parallel.psetup import distributed_setup

    A_sp = _scipy(poisson2d(24))
    n = A_sp.shape[0]
    cfg = _cfg()

    def _boom(*a, **k):
        raise AssertionError("host-serial path reached during distributed "
                             "on-device SA setup")

    monkeypatch.setattr(serial_amg, "oracle_setup", _boom)
    monkeypatch.setattr(PCSR, "to_csr", _boom)
    h = distributed_setup(A_sp, cfg, mesh8)
    monkeypatch.undo()

    assert len(h.levels) >= 2
    assert all(isinstance(l.A, PCSR) for l in h.levels)
    part = h.levels[0].A.row_partition
    bh = np.random.default_rng(0).normal(size=n)
    b = pvector(bh, part, mesh8)
    res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=60)
    x = to_global(res.x, part)
    rel = (np.linalg.norm(bh - A_sp @ x.astype(np.float64))
           / np.linalg.norm(bh))
    assert bool(res.converged)
    assert rel < 5e-6

    # convergence band vs the single-device MIS-aggregation path
    h_s = device_sa_setup(ELL.from_csr(CSR.from_scipy(A_sp),
                                       dtype=jnp.float32), cfg)
    res_s = pat.amg_pcg(h_s.levels[0].A, h_s, jnp.asarray(bh, jnp.float32),
                        tol=1e-6, maxiter=60)
    assert bool(res_s.converged)
    assert abs(int(res.iters) - int(res_s.iters)) <= 3


def test_distributed_sa_3d(mesh8):
    """3D Poisson (acceptance config #3's algebraic analog): 8-shard SA
    hierarchy converges in the oracle band."""
    from parallel_amg_tpu.parallel.psa_setup import distributed_sa_setup

    A_sp = _scipy(poisson3d(12))
    n = A_sp.shape[0]
    cfg = _cfg(n_coarse_max=64)
    A_p = PCSR.from_csr(A_sp, mesh8)
    h = distributed_sa_setup(A_p, cfg)
    assert len(h.levels) >= 2
    part = h.levels[0].A.row_partition
    bh = np.random.default_rng(1).normal(size=n)
    b = pvector(bh, part, mesh8)
    res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=60)
    assert bool(res.converged)
    x = to_global(res.x, part)
    rel = (np.linalg.norm(bh - A_sp @ x.astype(np.float64))
           / np.linalg.norm(bh))
    assert rel < 5e-6
    # complexity sanity on true rows
    gc, oc = h.complexity()
    assert gc < 2.5 and oc < 3.5
