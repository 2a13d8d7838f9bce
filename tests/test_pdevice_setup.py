"""Fully on-device DISTRIBUTED structured setup (parallel/pdevice_setup.py)
on the virtual CPU mesh.

The core invariant (SURVEY.md §4.3): running the setup-phase Galerkin
products under shard_map with ppermute halos must not change the numerics —
the sharded coarse operators equal the single-device on-device setup's
operators on the true grid, and the resulting solver matches the
single-device hierarchy's convergence.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.amg.device_setup import device_structured_setup
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.parallel import make_row_mesh
from parallel_amg_tpu.parallel.pdevice_setup import (
    anisotropic_stencil_sharded,
    plan_sharded_levels,
    poisson_stencil_sharded,
    sharded_device_setup,
)
from parallel_amg_tpu.parallel.pstencil import ShardedStencil
from parallel_amg_tpu.parallel.pstructured import collect_grid, distribute_grid
from parallel_amg_tpu.problems import poisson2d, poisson3d
from parallel_amg_tpu.problems.stencil_problems import poisson_stencil

CFG = AMGConfig(coarsening="sa", aggregate="block", block_size=3,
                smoother="chebyshev", n_coarse_max=64, agglomerate_n=256,
                on_device_setup=True)


def _sp(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


def _stencil_to_dense(A, true_dims):
    """Sharded (or plain) stencil → dense on the true grid (host)."""
    from parallel_amg_tpu.ops.stencil import Stencil

    W = np.asarray(A.weights)[:, : true_dims[0]]
    st = Stencil(jnp.asarray(W), A.offsets, tuple(true_dims))
    return np.asarray(st.to_csr().to_dense())


@pytest.fixture(scope="module")
def mesh4():
    assert jax.device_count() >= 4
    return make_row_mesh(4)


def test_sharded_generator_matches_host(mesh4, rng):
    dims = (24, 10, 9)
    A, true_dims = poisson_stencil_sharded(dims, mesh4, CFG)
    assert isinstance(A, ShardedStencil)
    D = _stencil_to_dense(A, true_dims)
    ref = _sp(poisson3d(*dims)).toarray()
    np.testing.assert_allclose(D, ref, atol=1e-6)


def test_sharded_setup_operator_parity(mesh4):
    """Every sharded level's operator equals the single-device on-device
    setup's operator on the true grid (same config, same seed)."""
    dims = (24, 10, 9)
    A, true_dims = poisson_stencil_sharded(dims, mesh4, CFG)
    h = sharded_device_setup(A, CFG, true_dims=true_dims)
    h_ref = device_structured_setup(poisson_stencil(dims), CFG)
    assert h.n_levels == h_ref.n_levels
    cur = tuple(dims)
    for i, (l, lr) in enumerate(zip(h.levels, h_ref.levels)):
        D = _stencil_to_dense(l.A, cur)
        Dr = _stencil_to_dense(lr.A, cur)
        scale = max(np.abs(Dr).max(), 1e-30)
        # λ_max estimates differ slightly between the padded/true power
        # iterations → coef differs by O(1e-3); operators match to that
        np.testing.assert_allclose(D / scale, Dr / scale, atol=5e-3,
                                   err_msg=f"level {i} operator mismatch")
        cur = tuple(-(-d // CFG.block_size) for d in cur)


def test_sharded_setup_straddling_blocks(mesh4):
    """d0 not divisible by the block keeps exactness: aggregates straddle
    the true/padding boundary and must include only true cells."""
    dims = (20, 7, 6)
    A, true_dims = poisson_stencil_sharded(dims, mesh4, CFG)
    h = sharded_device_setup(A, CFG, true_dims=true_dims)
    h_ref = device_structured_setup(poisson_stencil(dims), CFG)
    D = _stencil_to_dense(h.levels[1].A, tuple(-(-d // 3) for d in dims))
    Dr = _stencil_to_dense(h_ref.levels[1].A, tuple(-(-d // 3) for d in dims))
    scale = max(np.abs(Dr).max(), 1e-30)
    np.testing.assert_allclose(D / scale, Dr / scale, atol=5e-3)


def test_sharded_setup_pcg_parity(mesh4, rng):
    """End-to-end: distributed on-device setup + PCG matches the
    single-device hierarchy's iteration count and solution."""
    dims = (24, 12, 10)
    A_sp = _sp(poisson3d(*dims))
    b = rng.normal(size=A_sp.shape[0])

    A, true_dims = poisson_stencil_sharded(dims, mesh4, CFG)
    h = sharded_device_setup(A, CFG, true_dims=true_dims)
    bd = distribute_grid(b, dims, h, mesh4)
    res = pat.amg_pcg(h.levels[0].A, h, bd, tol=1e-8, maxiter=60)
    x = collect_grid(res.x, dims).astype(np.float64)
    assert bool(res.converged)
    rnorm = np.linalg.norm(b - A_sp @ x) / np.linalg.norm(b)
    assert rnorm < 1e-6

    h_ref = device_structured_setup(poisson_stencil(dims), CFG)
    bref = jnp.asarray(b, jnp.float32)
    res_ref = pat.amg_pcg(h_ref.levels[0].A, h_ref, bref, tol=1e-8,
                          maxiter=60)
    assert abs(int(res.iters) - int(res_ref.iters)) <= 2


def test_sharded_setup_shard_count_invariance(rng):
    """1-shard vs 4-shard runs produce the same iterate after one cycle."""
    dims = (24, 8, 8)
    b = rng.normal(size=int(np.prod(dims)))
    outs = []
    for S in (1, 4):
        mesh = make_row_mesh(S)
        A, true_dims = poisson_stencil_sharded(dims, mesh, CFG)
        h = sharded_device_setup(A, CFG, true_dims=true_dims)
        bd = distribute_grid(b, dims, h, mesh)
        x = pat.vcycle(h, jnp.zeros_like(bd), bd)
        outs.append(collect_grid(x, dims))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-6)


def test_sharded_anisotropic(mesh4, rng):
    dims = (48, 20)
    eps = 1e-3
    A, true_dims = anisotropic_stencil_sharded(dims, mesh4, CFG,
                                               epsilon=eps)
    h = sharded_device_setup(A, CFG, true_dims=true_dims)
    from parallel_amg_tpu.problems import anisotropic2d

    A_sp = _sp(anisotropic2d(*dims, epsilon=eps))
    b = rng.normal(size=A_sp.shape[0])
    bd = distribute_grid(b, dims, h, mesh4)
    res = pat.amg_pcg(h.levels[0].A, h, bd, tol=1e-8, maxiter=80)
    assert bool(res.converged)
    x = collect_grid(res.x, dims).astype(np.float64)
    # ε=1e-3 anisotropy: the f32 PCG recurrence bottoms out near 1e-5 true
    # residual — the f32 floor, not a convergence failure
    assert np.linalg.norm(b - A_sp @ x) / np.linalg.norm(b) < 1e-4


def test_plan_sharded_levels_alignment():
    cfg = CFG
    L, d0p = plan_sharded_levels((468, 468, 468), cfg, 8)
    assert d0p % (8 * cfg.block_size ** L) == 0
    assert d0p >= 468 and (d0p / 468 - 1.0) <= 0.2
