"""Distributed-layer tests on the virtual 8-device CPU mesh (SURVEY.md §4.3).

The core invariant: partitioning must not change numerics beyond
reduction-order tolerance — the same program on 1 shard and 8 shards (and
vs. the serial oracle) agrees.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.parallel import PCSR, make_row_mesh, pvector, to_global
from parallel_amg_tpu.parallel.psetup import distributed_setup
from parallel_amg_tpu.parallel.partition import uniform_row_partition
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.problems import poisson2d, poisson3d


def _scipy(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


def _random_csr(rng, n, m, density=0.05):
    mat = sp.random(n, m, density=density, random_state=np.random.RandomState(7),
                    format="csr")
    mat.data[:] = rng.normal(size=mat.nnz)
    return mat


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_row_mesh(8)


def test_pcsr_matvec_poisson(mesh8, rng):
    A = _scipy(poisson2d(16))
    Ap = PCSR.from_csr(CSR.from_scipy(A), mesh8)
    part = Ap.row_partition
    x = rng.normal(size=A.shape[0])
    xd = pvector(x, part, mesh8)
    y = to_global(Ap.matvec(xd), part)
    np.testing.assert_allclose(y, A @ x, rtol=2e-5, atol=1e-5)


def test_pcsr_matvec_random_unstructured(mesh8, rng):
    """Arbitrary sparsity → every shard needs ghosts from many owners."""
    A = _random_csr(rng, 203, 203)
    A = A + sp.identity(203)  # ensure nonempty rows
    Ap = PCSR.from_csr(CSR.from_scipy(A.tocsr()), mesh8)
    x = rng.normal(size=203)
    xd = pvector(x, Ap.row_partition, mesh8)
    y = to_global(Ap.matvec(xd), Ap.row_partition)
    np.testing.assert_allclose(y, A @ x, rtol=2e-4, atol=2e-5)


def test_pcsr_matvec_rectangular(mesh8, rng):
    """Transfer-operator shapes: (fine × coarse) with distinct partitions."""
    A = _random_csr(rng, 150, 61, density=0.08)
    col_part = uniform_row_partition(61, 8)
    Ap = PCSR.from_csr(CSR.from_scipy(A.tocsr()), mesh8,
                       col_partition=col_part, pad_identity=False)
    x = rng.normal(size=61)
    xd = pvector(x, col_part, mesh8)
    y = to_global(Ap.matvec(xd), Ap.row_partition)
    np.testing.assert_allclose(y, A @ x, rtol=2e-4, atol=2e-5)


def test_pcsr_diagonal(mesh8, rng):
    A = _scipy(poisson2d(12))
    Ap = PCSR.from_csr(CSR.from_scipy(A), mesh8)
    d = to_global(Ap.diagonal(), Ap.row_partition)
    np.testing.assert_allclose(d, A.diagonal(), rtol=1e-6)


def test_shard_invariance_1_vs_8(rng):
    """Same program, different mesh size ⇒ same answer (the with_debug
    equality test, SURVEY.md §4.3)."""
    A = _scipy(poisson2d(16))
    x = rng.normal(size=A.shape[0])
    outs = []
    for S in (1, 8):
        mesh = make_row_mesh(S)
        Ap = PCSR.from_csr(CSR.from_scipy(A), mesh)
        xd = pvector(x, Ap.row_partition, mesh)
        outs.append(to_global(Ap.matvec(xd), Ap.row_partition))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=1e-5)


def test_distributed_vcycle_matches_single(mesh8, rng):
    A = _scipy(poisson2d(32))
    cfg = AMGConfig(coarsening="rs", n_coarse_max=64)
    h1 = pat.setup(A, cfg)  # single-device ELL
    h8 = distributed_setup(A, cfg, mesh8)
    b = rng.normal(size=A.shape[0])

    x1 = pat.vcycle(h1, jnp.zeros(A.shape[0], jnp.float32),
                    jnp.asarray(b, jnp.float32))
    part = h8.levels[0].A.row_partition
    bd = pvector(b, part, mesh8)
    x8 = pat.vcycle(h8, jnp.zeros_like(bd), bd)
    np.testing.assert_allclose(
        to_global(x8, part), np.asarray(x1), rtol=5e-4, atol=5e-5
    )


def test_distributed_pcg_poisson3d(mesh8, rng):
    """Acceptance config #3 (BASELINE.json:9) shape: 3D Poisson, SA,
    row-partitioned with halo exchange (reduced scale on the CPU mesh)."""
    A = _scipy(poisson3d(12))
    cfg = AMGConfig(coarsening="sa", smoother="chebyshev", n_coarse_max=64)
    h = distributed_setup(A, cfg, mesh8)
    part = h.levels[0].A.row_partition
    b = rng.normal(size=A.shape[0])
    bd = pvector(b, part, mesh8)
    res = pat.amg_pcg(h.levels[0].A, h, bd, tol=1e-6, maxiter=60)
    assert bool(res.converged)
    x = to_global(res.x, part).astype(np.float64)
    assert np.linalg.norm(b - A @ x) <= 5e-6 * np.linalg.norm(b)
    # iteration count matches the single-device path
    h1 = pat.setup(A, cfg)
    res1 = pat.amg_pcg(h1.levels[0].A, h1, jnp.asarray(b, jnp.float32),
                       tol=1e-6, maxiter=60)
    assert abs(int(res.iters) - int(res1.iters)) <= 2


def test_spmv_hlo_has_no_full_allgather(mesh8):
    """Comm-pattern check (SURVEY.md §4.4): distributed SpMV lowers to
    all-to-all (halo exchange), not an all-gather of the whole vector."""
    A = _scipy(poisson2d(16))
    Ap = PCSR.from_csr(CSR.from_scipy(A), mesh8)
    xd = pvector(np.ones(A.shape[0]), Ap.row_partition, mesh8)
    hlo = jax.jit(Ap.matvec).lower(xd).compile().as_text()
    assert "all-to-all" in hlo, "expected halo all-to-all in compiled SpMV"
    n_pad = Ap.row_partition.n_padded
    # no full-vector gather: all-gather of shape f32[n_pad] must not appear
    assert f"all-gather(f32[{n_pad}]" not in hlo


def test_agglomerated_coarse_levels(mesh8, rng):
    """Coarse-level agglomeration (SURVEY.md §2.1 repartitioner): levels at
    or below agglomerate_n are replicated and solved redundantly.  The
    answer must match the fully-sharded hierarchy, and the compiled cycle
    must carry strictly fewer collectives."""
    from parallel_amg_tpu.parallel.psetup import ReshardedTransfer

    A = _scipy(poisson2d(24))
    base = dict(coarsening="rs", n_coarse_max=32)
    h_shard = distributed_setup(A, AMGConfig(agglomerate_n=0, **base), mesh8)
    h_aggl = distributed_setup(A, AMGConfig(agglomerate_n=256, **base), mesh8)
    assert all(isinstance(l.A, PCSR) for l in h_shard.levels)
    kinds = [isinstance(l.A, PCSR) for l in h_aggl.levels]
    assert kinds[0] and not kinds[-1], kinds
    boundary = kinds.index(False) - 1
    assert isinstance(h_aggl.levels[boundary].P, ReshardedTransfer)

    b = rng.normal(size=A.shape[0])
    part = h_shard.levels[0].A.row_partition
    bd = pvector(b, part, mesh8)
    cycle = jax.jit(pat.vcycle)
    x_s = to_global(cycle(h_shard, jnp.zeros_like(bd), bd), part)
    x_a = to_global(cycle(h_aggl, jnp.zeros_like(bd), bd), part)
    np.testing.assert_allclose(x_a, x_s, rtol=5e-4, atol=5e-5)

    def n_collectives(h):
        hlo = cycle.lower(h, jnp.zeros_like(bd), bd).compile().as_text()
        return sum(hlo.count(op) for op in ("all-to-all", "all-gather",
                                            "collective-permute"))

    assert n_collectives(h_aggl) < n_collectives(h_shard)

    res = pat.amg_pcg(h_aggl.levels[0].A, h_aggl, bd, tol=1e-6, maxiter=60)
    assert bool(res.converged)
    x = to_global(res.x, part).astype(np.float64)
    assert np.linalg.norm(b - A @ x) <= 5e-6 * np.linalg.norm(b)
