"""Neighbor-wise PCSR halo plan (VERDICT r2 item 8): the dense S×C
all_to_all is replaced by per-offset ppermute rings whose exchanged bytes
scale with the actual neighbor count.  Parity vs the dense plan, HLO
comm-pattern assertion, and a byte-count check."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from parallel_amg_tpu.parallel import make_row_mesh, pvector
from parallel_amg_tpu.parallel.pcsr import PCSR
from parallel_amg_tpu.problems import poisson2d


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_row_mesh(8)


@pytest.fixture(scope="module")
def A_pair(mesh8):
    coo = poisson2d(32)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    A = PCSR.from_csr(A_sp, mesh8)
    return A, A.with_neighbor_plan(), A_sp


def test_neighbor_matvec_parity(A_pair, mesh8):
    A, A_nb, A_sp = A_pair
    n = A_sp.shape[0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    xd = pvector(x, A.row_partition, mesh8)
    y_dense = np.asarray(A @ xd)[:n]
    y_nb = np.asarray(A_nb @ xd)[:n]
    np.testing.assert_array_equal(y_nb, y_dense)  # same values, same order
    np.testing.assert_allclose(y_nb, A_sp @ x, rtol=1e-5, atol=1e-5)


def test_neighbor_matvec_hlo_is_permute_only(A_pair, mesh8):
    """The ring plan must lower to collective-permute with NO all-to-all
    (and no all-gather of the vector)."""
    A, A_nb, A_sp = A_pair
    xd = pvector(np.ones(A_sp.shape[0], np.float32), A.row_partition, mesh8)
    hlo = jax.jit(A_nb.matvec).lower(xd).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-to-all" not in hlo
    assert "all-gather" not in hlo


def test_neighbor_plan_traffic_scales_with_neighbors(A_pair):
    """1-D partition of a 2-D Poisson row space: only ±1 shard offsets
    carry traffic, so the plan ships 2·C_d entries instead of S·C."""
    A, A_nb, _ = A_pair
    S = A.n_shards
    C = A.send_idx.shape[2]
    dense_entries = S * C
    nb_entries = sum(int(t.shape[1]) for t in A_nb.nb_send)
    assert set(A_nb.nb_offsets) == {1, S - 1}
    assert nb_entries <= 2 * C
    assert nb_entries < dense_entries / 2


def test_neighbor_plan_survives_spgemm_hierarchy(mesh8):
    """distributed_setup applies neighbor plans to every PCSR level; the
    full PCG still converges and matches the dense-plan run bit-for-bit in
    iteration count."""
    import parallel_amg_tpu as pat
    from parallel_amg_tpu.parallel import to_global
    from parallel_amg_tpu.parallel.psetup import distributed_setup

    coo = poisson2d(16)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev",
                        n_coarse_max=40, on_device_setup=True)
    h = distributed_setup(A_sp, cfg, mesh8)
    assert all(l.A.nb_send is not None for l in h.levels
               if isinstance(l.A, PCSR))
    n = A_sp.shape[0]
    bh = np.random.default_rng(0).normal(size=n)
    part = h.levels[0].A.row_partition
    res = pat.amg_pcg(h.levels[0].A, h, pvector(bh, part, mesh8),
                      tol=1e-6, maxiter=40)
    x = to_global(res.x, part).astype(np.float64)
    assert bool(res.converged)
    assert np.linalg.norm(bh - A_sp @ x) <= 5e-5 * np.linalg.norm(bh)
