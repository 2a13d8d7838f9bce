"""On-device structured setup vs the host (oracle) setup.

The device pipeline (stencil products + residue-class pooled Galerkin +
device power iteration) must reproduce the host hierarchy: same structure,
matching weight planes, matching convergence.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.amg.device_setup import device_structured_setup
from parallel_amg_tpu.ops.stencil import Stencil
from parallel_amg_tpu.problems import poisson2d, poisson3d
from parallel_amg_tpu.problems.stencil_problems import (
    poisson_stencil,
    anisotropic_stencil,
)
from parallel_amg_tpu.problems.anisotropic import anisotropic2d


def _sp(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


CFG = AMGConfig(coarsening="sa", aggregate="block", block_size=2,
                smoother="chebyshev", n_coarse_max=64, on_device_setup=True)


def test_stencil_generators_match_coo():
    for dims, coo, gen in [
        ((12, 12), poisson2d(12), poisson_stencil((12, 12))),
        ((7, 8, 9), poisson3d(7, 8, 9), poisson_stencil((7, 8, 9))),
        ((10, 11), anisotropic2d(10, 11, epsilon=1e-3),
         anisotropic_stencil((10, 11), epsilon=1e-3)),
    ]:
        np.testing.assert_allclose(
            gen.to_csr().to_dense(), coo.to_dense(), rtol=1e-6, atol=1e-7
        )


def test_stencil_matmul_matches_csr(rng):
    a = poisson_stencil((9, 10))
    s = Stencil(jnp.asarray(rng.normal(size=a.weights.shape), jnp.float32)
                * (a.weights != 0), a.offsets, a.dims)
    c = a.matmul(s)
    ref = a.to_csr().to_scipy() @ s.to_csr().to_scipy()
    np.testing.assert_allclose(
        c.to_csr().to_dense(), ref.toarray(), rtol=1e-4, atol=1e-5
    )


def test_device_galerkin_matches_oracle_exactly(rng):
    """Pin the smoothing coefficient → the device Galerkin product
    (stencil matmuls + residue-class pooled reduction) must equal the
    oracle's explicit Pᵀ A P to f32 accuracy."""
    import scipy.sparse as sps
    from parallel_amg_tpu.amg.device_setup import (
        galerkin_block, smoothing_operator, smoothing_operator_T,
    )
    from parallel_amg_tpu.amg.transfers import downsample_sum_nd
    from parallel_amg_tpu.oracle.serial_amg import (
        block_aggregation, tentative_prolongator, smoothed_prolongator,
    )

    dims = (18, 14)
    b = 2
    coef = 0.71  # arbitrary fixed ω/λ
    A_sp = _sp(poisson2d(*dims))

    # oracle explicit path
    agg, cdims = block_aggregation(dims, b)
    T = tentative_prolongator(agg)
    P = smoothed_prolongator(A_sp, T, omega=coef, lam_max=1.0)
    A_c_ref = (P.T @ A_sp @ P).toarray()

    # device stencil path
    st = poisson_stencil(dims)
    diag = st.diagonal()
    d_inv = 1.0 / diag
    S = smoothing_operator(st, d_inv, coef)
    St = smoothing_operator_T(st, d_inv, coef)
    M = St.matmul(st.matmul(S))
    counts = downsample_sum_nd(jnp.ones(dims, jnp.float32), cdims, b)
    scale = 1.0 / jnp.sqrt(jnp.maximum(counts, 1.0))
    A_c = galerkin_block(M, cdims, b, scale)
    np.testing.assert_allclose(
        A_c.to_csr().to_dense(), A_c_ref, rtol=2e-4, atol=2e-5
    )


def test_device_setup_close_to_host_2d(rng):
    """End-to-end device vs host hierarchies agree up to the λ-estimate
    difference (independent RNG streams; Poisson's tiny spectral gap means
    power iteration only agrees to ~1%)."""
    dims = (24, 24)
    A = _sp(poisson2d(*dims))
    cfg_host = AMGConfig(**{**CFG.__dict__, "on_device_setup": False})
    hh = pat.setup(A, cfg_host, dims=dims)
    hd = pat.setup(poisson_stencil(dims), CFG)
    assert len(hd.levels) == len(hh.levels)
    for lh, ld in zip(hh.levels, hd.levels):
        assert isinstance(ld.A, Stencil)
        np.testing.assert_allclose(
            float(ld.lam_max), float(lh.lam_max), rtol=0.05
        )
        np.testing.assert_allclose(
            ld.A.to_csr().to_dense(), lh.A.to_csr().to_dense(),
            rtol=0.2, atol=5e-3,
        )


def test_device_setup_pcg_3d(rng):
    # small dims: the 3D level-step jit compiles thousands of slice ops on
    # the CPU test backend; real-scale timing is the bench's job
    dims = (10, 10, 10)
    cfg = AMGConfig(**{**CFG.__dict__, "n_coarse_max": 150})
    st = poisson_stencil(dims)
    h = pat.setup(st, cfg)
    A = _sp(poisson3d(*dims))
    b = rng.normal(size=A.shape[0])
    res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                      tol=1e-6, maxiter=60)
    assert bool(res.converged)
    x = np.asarray(res.x).reshape(-1).astype(np.float64)
    assert np.linalg.norm(b - A @ x) <= 5e-6 * np.linalg.norm(b)
    # parity with the host-setup structured path
    cfg_host = AMGConfig(**{**cfg.__dict__, "on_device_setup": False})
    hh = pat.setup(A, cfg_host, dims=dims)
    res_h = pat.amg_pcg(hh.levels[0].A, hh, jnp.asarray(b, jnp.float32),
                        tol=1e-6, maxiter=60)
    assert abs(int(res.iters) - int(res_h.iters)) <= 2


def test_device_setup_anisotropic(rng):
    dims = (32, 32)
    st = anisotropic_stencil(dims, epsilon=1e-3)
    h = pat.setup(st, CFG)
    A = _sp(anisotropic2d(*dims, epsilon=1e-3))
    b = rng.normal(size=A.shape[0])
    res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                      tol=1e-6, maxiter=80)
    assert bool(res.converged)


def test_stencil_matmat(rng):
    st = poisson_stencil((8, 9))
    X = rng.normal(size=(8, 9, 3)).astype(np.float32)
    Y = np.asarray(st.matmat(jnp.asarray(X)))
    A = st.to_csr().to_dense()
    for k in range(3):
        np.testing.assert_allclose(
            Y[..., k].reshape(-1), A @ X[..., k].reshape(-1),
            rtol=1e-4, atol=1e-5,
        )
