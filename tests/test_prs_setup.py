"""Distributed on-device RS setup (parallel/prs_setup.py) — VERDICT r2
item 3's done-criteria:

1. 8-shard hierarchy parity vs the single-device ``device_rs_setup``
   algorithms on 2D Poisson (PMIS states bit-equal; interpolation and the
   Galerkin RAP equal through matvec under the coarse-id remapping);
2. PCG iteration parity;
3. NO host-global sparse matrix in the setup call graph (the serial oracle
   and the PCSR→CSR host round-trip are monkeypatch-forbidden during setup).
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
from parallel_amg_tpu.parallel import prs_setup as prs
from parallel_amg_tpu.problems import poisson2d


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_row_mesh(8)


@pytest.fixture(scope="module")
def prob16():
    coo = poisson2d(16)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    return A_sp


def test_pmis_state_parity(mesh8, prob16):
    """Distributed PMIS must produce the bit-identical C/F split of the
    single-device kernel (same weights, same synchronous rounds)."""
    from parallel_amg_tpu.amg.device_rs import (
        classical_strength_mask,
        pmis_split_device,
    )

    A_sp = prob16
    n = A_sp.shape[0]
    A_p = PCSR.from_csr(A_sp, mesh8)
    Sd, So = prs.pcsr_strength(A_p, 0.25)
    state_d = np.asarray(prs.pcsr_pmis(A_p, Sd, So, seed=0))[:n]

    A_ell = ELL.from_csr(CSR.from_scipy(A_sp), dtype=jnp.float32)
    S1 = classical_strength_mask(A_ell, 0.25)
    state_s = np.asarray(pmis_split_device(A_ell, S1, seed=0))

    np.testing.assert_array_equal(state_d, state_s)


def test_interp_and_rap_parity(mesh8, prob16):
    """One full level: distributed P and RAP equal the single-device
    ELL-kernel results through matvec, under the coarse-id remapping
    (shard-padded ids ↔ serial cumsum ids).  p_max=8 keeps every candidate
    (no top-k tie ambiguity between candidate orders)."""
    from parallel_amg_tpu.amg.device_rs import (
        classical_strength_mask,
        direct_interpolation_device,
        pmis_split_device,
        smooth_interpolation,
    )
    from parallel_amg_tpu.ops.ell_setup import ell_spgemm, ell_transpose

    A_sp = prob16
    n = A_sp.shape[0]
    # this test pins the smoothed-direct tier (the extended_i tier has its
    # own entrywise test below)
    cfg = AMGConfig(coarsening="rs", p_max=8, on_device_setup=True,
                    interpolation="smoothed_direct")

    # distributed level
    A_p = PCSR.from_csr(A_sp, mesh8)
    Sd, So = prs.pcsr_strength(A_p, cfg.theta)
    state = prs.pcsr_pmis(A_p, Sd, So, seed=0)
    cmap, mc_pad, nc = prs.coarse_numbering(A_p, state)
    P_d = prs.pcsr_interpolation(A_p, Sd, So, state, cmap, mc_pad, cfg)
    R_d = prs.pcsr_transpose(P_d, rows_per_shard=mc_pad)
    Ac_d = prs._ensure_diag(
        prs.pcsr_spgemm(prs.pcsr_spgemm(R_d, A_p), P_d, pad_identity=True))

    # single-device level (identical algorithms)
    A_ell = ELL.from_csr(CSR.from_scipy(A_sp), dtype=jnp.float32)
    S1 = classical_strength_mask(A_ell, cfg.theta)
    st1 = pmis_split_device(A_ell, S1, seed=0)
    P_s = direct_interpolation_device(A_ell, S1, st1, cfg.p_max * 2)
    P_s = smooth_interpolation(A_ell, P_s, cfg.jacobi_omega, cfg.p_max)
    R_s = ell_transpose(P_s)
    Ac_s = ell_spgemm(ell_spgemm(R_s, A_ell), P_s)
    nc_s = P_s.shape[1]
    assert nc == nc_s

    # coarse-id remapping: dist id -> serial id on the shared C set
    st_np = np.asarray(state)[:n]
    cmap_np = np.asarray(cmap)[:n]
    c_pts = np.flatnonzero(st_np == prs.COARSE)
    serial_cid = np.cumsum(st_np == prs.COARSE) - 1
    dist_of_serial = np.zeros(nc_s, np.int64)
    dist_of_serial[serial_cid[c_pts]] = cmap_np[c_pts]

    rng = np.random.default_rng(1)
    xc_s = rng.standard_normal(nc_s).astype(np.float32)
    xc_d = np.zeros((P_d.col_partition.n_padded,), np.float32)
    xc_d[dist_of_serial] = xc_s

    # P through matvec
    y_d = np.asarray(P_d @ jnp.asarray(xc_d))[:n]
    y_s = np.asarray(P_s.matvec(jnp.asarray(xc_s)))[:n]
    np.testing.assert_allclose(y_d, y_s, rtol=2e-5, atol=2e-5)

    # RAP through matvec (compare on the mapped coarse ids)
    z_d = np.asarray(Ac_d @ jnp.asarray(xc_d))[dist_of_serial]
    z_s = np.asarray(Ac_s.matvec(jnp.asarray(xc_s)))[:nc_s]
    np.testing.assert_allclose(z_d, z_s, rtol=2e-4, atol=2e-4)


def test_extended_i_entrywise_parity(mesh8):
    """Distributed TRUE distance-two extended+i (pcsr_extended_i) must be
    ENTRYWISE equal to the single-device algorithm under the coarse-id
    remapping (p_max large enough that no truncation happens, so candidate
    ordering cannot change the kept set)."""
    from parallel_amg_tpu.amg.device_rs import (
        classical_strength_mask,
        extended_i_interpolation_device,
        pmis_split_device,
    )

    coo = poisson2d(24)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    n = A_sp.shape[0]
    cfg = AMGConfig(coarsening="rs", p_max=16, on_device_setup=True,
                    interpolation="extended_i")

    A_p = PCSR.from_csr(A_sp, mesh8)
    Sd, So = prs.pcsr_strength(A_p, cfg.theta)
    state = prs.pcsr_pmis(A_p, Sd, So, seed=0)
    cmap, mc_pad, nc = prs.coarse_numbering(A_p, state)
    P_d = prs.pcsr_extended_i(A_p, Sd, So, state, cmap, mc_pad, cfg)

    A_ell = ELL.from_csr(CSR.from_scipy(A_sp), dtype=jnp.float32)
    S1 = classical_strength_mask(A_ell, cfg.theta)
    st1 = pmis_split_device(A_ell, S1, seed=0)
    P_s = extended_i_interpolation_device(A_ell, S1, st1, cfg.p_max)
    nc_s = P_s.shape[1]
    assert nc == nc_s

    # coarse-id remapping (shard-padded ids ↔ serial cumsum ids)
    st_np = np.asarray(state)[:n]
    cmap_np = np.asarray(cmap)[:n]
    c_pts = np.flatnonzero(st_np == prs.COARSE)
    serial_cid = np.cumsum(st_np == prs.COARSE) - 1
    serial_of_dist = -np.ones(P_d.col_partition.n_padded, np.int64)
    serial_of_dist[cmap_np[c_pts]] = serial_cid[c_pts]

    Pd_r, Pd_c, Pd_v = (np.asarray(t) for t in P_d.to_triplets())
    keep = Pd_r.reshape(-1) >= 0
    r, c, v = (t.reshape(-1)[keep] for t in (Pd_r, Pd_c, Pd_v))
    dense_d = np.zeros((n, nc_s))
    np.add.at(dense_d, (r, serial_of_dist[c]), v)
    cs, vs = np.asarray(P_s.cols), np.asarray(P_s.vals)
    mask_s = np.asarray(P_s.mask())
    dense_s = np.zeros((n, nc_s))
    ri = np.repeat(np.arange(n), cs.shape[1]).reshape(cs.shape)
    np.add.at(dense_s, (ri[mask_s], cs[mask_s]), vs[mask_s])
    np.testing.assert_allclose(dense_d, dense_s, rtol=1e-5, atol=1e-5)


def test_distributed_extended_i_pcg_parity(mesh8):
    """End-to-end distributed RS setup with the DEFAULT extended+i tier:
    PCG iteration count equals the single-device ext+i hierarchy's (±1) —
    the distributed path no longer downgrades to smoothed-direct
    (VERDICT r3 missing #2)."""
    from parallel_amg_tpu.amg.device_rs import device_rs_setup

    coo = poisson2d(24)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    n = A_sp.shape[0]
    cfg = AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=40,
                    on_device_setup=True, interpolation="extended_i")

    A_p = PCSR.from_csr(A_sp, mesh8)
    h_d = prs.distributed_rs_setup(A_p, cfg)
    part = h_d.levels[0].A.row_partition
    bh = np.random.default_rng(0).normal(size=n)
    b = pvector(bh, part, mesh8)
    res_d = pat.amg_pcg(h_d.levels[0].A, h_d, b, tol=1e-6, maxiter=60)
    x = to_global(res_d.x, part)
    rel = (np.linalg.norm(bh - A_sp @ x.astype(np.float64))
           / np.linalg.norm(bh))
    assert bool(res_d.converged)
    assert rel < 5e-6

    A_ell = ELL.from_csr(CSR.from_scipy(A_sp), dtype=jnp.float32)
    h_s = device_rs_setup(A_ell, cfg)
    res_s = pat.amg_pcg(h_s.levels[0].A, h_s, jnp.asarray(bh, jnp.float32),
                        tol=1e-6, maxiter=60)
    assert abs(int(res_d.iters) - int(res_s.iters)) <= 1


def test_distributed_rs_pcg_no_host_matrix(mesh8, prob16, monkeypatch):
    """End-to-end: distributed_setup(RS, on_device) + PCG converges with the
    oracle AND the PCSR host round-trip forbidden during setup."""
    from parallel_amg_tpu.oracle import serial_amg
    from parallel_amg_tpu.parallel.psetup import distributed_setup

    A_sp = prob16
    n = A_sp.shape[0]
    cfg = AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=40,
                    on_device_setup=True)

    def _boom(*a, **k):
        raise AssertionError("host-serial path reached during distributed "
                             "on-device RS setup")

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

    # iteration parity vs the f64 serial oracle on the SAME matrix
    from parallel_amg_tpu.oracle.serial_amg import oracle_pcg, oracle_setup
    oh = oracle_setup(A_sp, cfg)
    _, oit, _ = oracle_pcg(A_sp, bh, oh, tol=1e-6, maxiter=60)
    assert int(res.iters) <= int(oit) + 3
