"""Distributed assembly, consistent/assemble exchange, repartitioning."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.parallel import PCSR, make_row_mesh, pvector, to_global
from parallel_amg_tpu.parallel.assembly import pcsr_from_coo
from parallel_amg_tpu.problems import poisson2d


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_row_mesh(8)


def test_pcsr_from_coo_duplicates_and_offowner(mesh8, rng):
    """FE-style assembly: duplicates sum; entries land at owning rows."""
    n = 67
    nnz = 400
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz)
    # add explicit duplicates
    rows = np.concatenate([rows, rows[:50]])
    cols = np.concatenate([cols, cols[:50]])
    vals = np.concatenate([vals, vals[:50]])
    dense = np.zeros((n, n))
    np.add.at(dense, (rows, cols), vals)
    dense += np.eye(n)
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    vals = np.concatenate([vals, np.ones(n)])

    Ap = pcsr_from_coo(rows, cols, vals, (n, n), mesh8)
    x = rng.normal(size=n)
    xd = pvector(x, Ap.row_partition, mesh8)
    y = to_global(Ap.matvec(xd), Ap.row_partition)
    np.testing.assert_allclose(y, dense @ x, rtol=2e-4, atol=2e-5)


def test_consistent_returns_ghost_values(mesh8, rng):
    A = poisson2d(16).to_csr()
    Ap = PCSR.from_csr(A, mesh8)
    x = rng.normal(size=A.n_rows)
    xd = pvector(x, Ap.row_partition, mesh8)
    ghosts = np.asarray(Ap.consistent(xd))  # (S, G)
    # reconstruct expected ghost values from the plan
    S = Ap.n_shards
    C = Ap.send_idx.shape[2]
    mc = Ap.col_partition.rows_per_shard
    sidx = np.asarray(Ap.send_idx)
    rmap = np.asarray(Ap.recv_map)
    xpad = np.concatenate([x, np.zeros(Ap.col_partition.n_padded - len(x))])
    for s in range(S):
        for g, pos in enumerate(rmap[s]):
            if pos < S * C:
                o, j = divmod(int(pos), C)
                gid = o * mc + sidx[o, s, j]
                np.testing.assert_allclose(
                    ghosts[s, g], xpad[gid], rtol=1e-6, atol=1e-7
                )


def test_assemble_owner_reduce(mesh8, rng):
    """assemble(consistent-style ghost contributions) must equal the dense
    owner-sum: y[gid] = Σ_s ghost_contrib_s[gid]."""
    A = poisson2d(16).to_csr()
    Ap = PCSR.from_csr(A, mesh8)
    S = Ap.n_shards
    G = Ap.recv_map.shape[1]
    contrib = rng.normal(size=(S, G))
    # zero out padding ghost slots (recv_map points at trash there)
    C = Ap.send_idx.shape[2]
    rmap = np.asarray(Ap.recv_map)
    contrib[rmap >= S * C] = 0.0
    mc = Ap.col_partition.rows_per_shard
    sidx = np.asarray(Ap.send_idx)
    expected = np.zeros(Ap.col_partition.n_padded)
    for s in range(S):
        for g, pos in enumerate(rmap[s]):
            if pos < S * C:
                o, j = divmod(int(pos), C)
                expected[o * mc + sidx[o, s, j]] += contrib[s, g]
    gd = jax.device_put(
        jnp.asarray(contrib, jnp.float32),
        jax.sharding.NamedSharding(Ap.mesh, jax.sharding.PartitionSpec("rows")),
    )
    got = np.asarray(Ap.assemble(gd))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_to_csr_roundtrip_and_repartition(mesh8, rng):
    A = poisson2d(12).to_csr()
    Ap = PCSR.from_csr(A, mesh8)
    back = Ap.to_csr()
    np.testing.assert_allclose(back.to_dense(), A.to_dense(), rtol=1e-5,
                               atol=1e-6)
    # repartition to fewer shards, numerics unchanged
    mesh4 = make_row_mesh(4)
    Ap4 = Ap.repartition(mesh4)
    x = rng.normal(size=A.n_rows)
    y8 = to_global(Ap.matvec(pvector(x, Ap.row_partition, mesh8)),
                   Ap.row_partition)
    y4 = to_global(Ap4.matvec(pvector(x, Ap4.row_partition, mesh4)),
                   Ap4.row_partition)
    np.testing.assert_allclose(y4, y8, rtol=2e-4, atol=2e-5)
