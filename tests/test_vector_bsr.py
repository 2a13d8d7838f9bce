"""Vector (multi-DOF) BSR workload — format exactness + solve integration.

The BSR acceptance surface (BASELINE.json:5,11): block-ELL storage with
batched-block SpMV actually carrying a solve, not just unit tests.  Checks:
exact SpMV parity against the scipy Kronecker matrix, Galerkin Kronecker
closure of the coarse levels, BSR-vs-BlockStencil format independence of the
iteration count, and 1e-8 honesty on the vector problem.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.amg.vector import setup_vector_kron
from parallel_amg_tpu.ops.bstencil import (
    BlockStencil,
    bsr_from_kron_stencil,
)
from parallel_amg_tpu.problems.elasticity import (
    coupled_laplacian,
    coupled_laplacian_scipy,
    coupling_matrix,
)

CFG = pat.AMGConfig(coarsening="sa", aggregate="block", block_size=3,
                    smoother="chebyshev", n_coarse_max=48,
                    on_device_setup=True)


def test_bsr_kron_matvec_exact(rng):
    dims, bs, gamma = (7, 6, 5), 3, 0.3
    L, C = coupled_laplacian(dims, bs, gamma)
    A_sp = coupled_laplacian_scipy(dims, bs, gamma)
    bsr = bsr_from_kron_stencil(L, C)
    x = rng.normal(size=A_sp.shape[1])
    y = np.asarray(bsr.matvec(jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(y, A_sp @ x, rtol=2e-5, atol=1e-5)
    # diagonal parity too
    np.testing.assert_allclose(np.asarray(bsr.diagonal()),
                               A_sp.diagonal(), rtol=1e-6)


def test_blockstencil_matvec_exact(rng):
    dims, bs, gamma = (6, 9), 3, 0.4
    L, C = coupled_laplacian(dims, bs, gamma)
    A_sp = coupled_laplacian_scipy(dims, bs, gamma)
    B = BlockStencil(L.weights, L.offsets, L.dims, jnp.asarray(C, jnp.float32))
    x = rng.normal(size=A_sp.shape[1])
    y = np.asarray(B.matvec(jnp.asarray(x, jnp.float32).reshape(B.dims)))
    np.testing.assert_allclose(y.reshape(-1), A_sp @ x, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(B.diagonal()).reshape(-1), A_sp.diagonal(), rtol=1e-6)


def test_vector_hierarchy_kron_closure():
    """Coarse level of the vector hierarchy == kron(scalar coarse, C)."""
    dims, bs, gamma = (12, 12), 3, 0.3
    L, C = coupled_laplacian(dims, bs, gamma)
    h_s = pat.setup(L, CFG)
    h_v = setup_vector_kron(L, C, CFG)
    assert len(h_v.levels) == len(h_s.levels)
    import scipy.sparse as sp

    A1s = h_s.levels[1].A.to_csr().to_scipy()
    A1v = h_v.levels[1].A.to_csr().to_scipy()
    ref = sp.kron(A1s, coupling_matrix(bs, gamma)).tocsr()
    d = abs(A1v - ref)
    assert (d.max() if d.nnz else 0.0) < 1e-5


def test_btwell_parity_random_blocks(rng):
    """BTWELL (Pallas block-TWELL) vs scipy on a random block matrix."""
    import scipy.sparse as sp

    from parallel_amg_tpu.ops.bsr import BSR
    from parallel_amg_tpu.ops.btwell import BTWELL
    from parallel_amg_tpu.ops.csr import CSR

    RB, bs = 50, 3
    pat_m = sp.random(RB, RB, density=0.15, random_state=2, format="csr")
    pat_m = pat_m + sp.identity(RB)
    pat_m.data[:] = 1.0
    K = sp.kron(pat_m, np.ones((bs, bs))).tocsr()
    K.data = rng.normal(size=K.nnz)
    bt = BTWELL.from_bsr(BSR.from_csr(CSR.from_scipy(K), bs))
    x = rng.normal(size=RB * bs)
    y = np.asarray(bt.matvec(jnp.asarray(x, jnp.float32)))
    ref = K @ x
    np.testing.assert_allclose(y, ref, rtol=3e-5,
                               atol=3e-6 * np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(bt.diagonal()), K.diagonal(),
                               rtol=1e-6, atol=1e-7)
    # storage round-trip
    d = abs(bt.to_bsr().to_csr().to_scipy() - K)
    assert (d.max() if d.nnz else 0.0) < 1e-6


def test_btwell_kron_parity(rng):
    from parallel_amg_tpu.ops.btwell import btwell_from_kron_stencil

    dims, bs, gamma = (9, 7, 6), 3, 0.3
    L, C = coupled_laplacian(dims, bs, gamma)
    A_sp = coupled_laplacian_scipy(dims, bs, gamma)
    bt = btwell_from_kron_stencil(L, C)
    x = rng.normal(size=A_sp.shape[1])
    y = np.asarray(bt.matvec(jnp.asarray(x, jnp.float32)))
    ref = A_sp @ x
    np.testing.assert_allclose(y, ref, rtol=3e-5,
                               atol=3e-6 * np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(bt.diagonal()), A_sp.diagonal(),
                               rtol=1e-6)


@pytest.mark.parametrize("fine_format", ["bsr", "btwell", "bstencil"])
def test_vector_pcg_converges(fine_format, rng):
    dims, bs, gamma = (15, 15, 15), 3, 0.3
    L, C = coupled_laplacian(dims, bs, gamma)
    h = setup_vector_kron(L, C, CFG, fine_format=fine_format)
    gc, oc = h.complexity()
    assert gc < 2.5 and oc < 2.5
    n = h.levels[0].A.n_rows
    b = jnp.asarray(rng.normal(size=n), jnp.float32)
    res = pat.amg_pcg(None, h, b, tol=1e-6, maxiter=60)
    assert bool(res.converged) and int(res.iters) <= 25
    # true residual against the scipy Kronecker matrix
    A_sp = coupled_laplacian_scipy(dims, bs, gamma)
    x = np.asarray(res.x, np.float64)
    rel = np.linalg.norm(np.asarray(b, np.float64) - A_sp @ x) \
        / np.linalg.norm(np.asarray(b))
    assert rel < 5e-6


def test_vector_format_independent_iters(rng):
    """BSR and BlockStencil fine levels define the SAME operator — the PCG
    iteration count must match exactly."""
    dims, bs, gamma = (12, 12), 3, 0.3
    L, C = coupled_laplacian(dims, bs, gamma)
    b = jnp.asarray(rng.normal(size=int(np.prod(dims)) * bs), jnp.float32)
    iters = []
    for fmt in ("bsr", "bstencil"):
        h = setup_vector_kron(L, C, CFG, fine_format=fmt)
        res = pat.amg_pcg(None, h, b, tol=1e-6, maxiter=60)
        assert bool(res.converged)
        iters.append(int(res.iters))
    assert iters[0] == iters[1]


def test_vector_mp_1e8(rng):
    dims, bs, gamma = (12, 12), 3, 0.3
    L, C = coupled_laplacian(dims, bs, gamma)
    h = setup_vector_kron(L, C, CFG, fine_format="bstencil")
    A_sp = coupled_laplacian_scipy(dims, bs, gamma)
    b = rng.normal(size=A_sp.shape[0])
    res = pat.amg_pcg_mp(None, h, b, tol=1e-8, maxiter=100)
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    rel = np.linalg.norm(b - A_sp @ x) / np.linalg.norm(b)
    assert rel <= 2e-8
