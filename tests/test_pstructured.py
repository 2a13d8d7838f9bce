"""Distributed structured-SA path on the 8-device CPU mesh.

Invariants: sharded stencil matvec equals the host oracle; the distributed
V-cycle/PCG matches the single-device structured path (partitioning must not
change numerics, SURVEY.md §4.3); transfers are shard-local (no collectives
besides the A-matvec halo and the reduction psum).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.parallel import make_row_mesh
from parallel_amg_tpu.parallel.pstructured import (
    structured_distributed_setup,
    distribute_grid,
    collect_grid,
)
from parallel_amg_tpu.parallel.pstencil import ShardedStencil
from parallel_amg_tpu.problems import poisson2d, poisson3d


def _sp(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


CFG = AMGConfig(coarsening="sa", aggregate="block", block_size=2,
                smoother="chebyshev", n_coarse_max=64)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_row_mesh(8)


def test_sharded_stencil_matvec(mesh8, rng):
    dims = (20, 20, 20)
    A = _sp(poisson3d(*dims))
    h = structured_distributed_setup(A, CFG, mesh8, dims)
    A0 = h.levels[0].A
    assert isinstance(A0, ShardedStencil)
    x = rng.normal(size=A.shape[0])
    xd = distribute_grid(x, dims, h, mesh8)
    y = collect_grid(A0.matvec(xd), dims)
    np.testing.assert_allclose(y, A @ x, rtol=2e-5, atol=2e-5)


def test_sharded_stencil_halo2(mesh8, rng):
    """Coarse-level stencils have |offset₀| up to 2 — the halo exchange must
    handle multi-plane ghosts."""
    dims = (24, 24)
    A = _sp(poisson2d(*dims))
    h = structured_distributed_setup(A, CFG, mesh8, dims)
    lvl = h.levels[1]
    assert lvl.A.halo >= 2
    n1 = int(np.prod([d for d in lvl.A.dims]))
    # compare against the serial oracle's level-1 operator
    from parallel_amg_tpu.oracle import oracle_setup
    oh = oracle_setup(A, CFG, dims=dims)
    A1 = oh.levels[1].A
    tdims = oh.levels[0].cdims
    x = rng.normal(size=A1.shape[0])
    xd = distribute_grid(x, tdims, _FakeH(lvl.A), mesh8)
    y = collect_grid(lvl.A.matvec(xd), tdims)
    np.testing.assert_allclose(y, A1 @ x, rtol=2e-4, atol=2e-5)


class _FakeH:
    def __init__(self, A):
        self.levels = [type("L", (), {"A": A})()]


def test_distributed_structured_vcycle_matches_single(mesh8, rng):
    dims = (16, 16, 16)
    A = _sp(poisson3d(*dims))
    h1 = pat.setup(A, CFG, dims=dims)
    h8 = structured_distributed_setup(A, CFG, mesh8, dims)
    b = rng.normal(size=A.shape[0])
    # jit the whole cycle: eager op-by-op dispatch on the 8-device CPU mesh
    # compiles every collective micro-program separately (~18 min for this
    # test); one jitted program compiles in seconds.
    cycle = jax.jit(pat.vcycle)
    x1 = cycle(h1, jnp.zeros(A.shape[0], jnp.float32),
               jnp.asarray(b, jnp.float32))
    bd = distribute_grid(b, dims, h8, mesh8)
    x8 = cycle(h8, jnp.zeros_like(bd), bd)
    np.testing.assert_allclose(
        collect_grid(x8, dims), np.asarray(x1), rtol=5e-4, atol=5e-5
    )


def test_distributed_structured_pcg(mesh8, rng):
    dims = (16, 16, 16)
    A = _sp(poisson3d(*dims))
    h = structured_distributed_setup(A, CFG, mesh8, dims)
    b = rng.normal(size=A.shape[0])
    bd = distribute_grid(b, dims, h, mesh8)
    res = pat.amg_pcg(h.levels[0].A, h, bd, tol=1e-6, maxiter=60)
    assert bool(res.converged)
    x = collect_grid(res.x, dims).astype(np.float64)
    assert np.linalg.norm(b - A @ x) <= 5e-6 * np.linalg.norm(b)
    # parity with single-device structured path
    h1 = pat.setup(A, CFG, dims=dims)
    res1 = pat.amg_pcg(h1.levels[0].A, h1, jnp.asarray(b, jnp.float32),
                       tol=1e-6, maxiter=60)
    assert abs(int(res.iters) - int(res1.iters)) <= 2


def test_sharded_spmv_hlo_uses_ppermute(mesh8):
    dims = (16, 16, 16)
    A = _sp(poisson3d(*dims))
    h = structured_distributed_setup(A, CFG, mesh8, dims)
    A0 = h.levels[0].A
    xd = distribute_grid(np.ones(A.shape[0]), dims, h, mesh8)
    hlo = jax.jit(A0.matvec).lower(xd).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo
