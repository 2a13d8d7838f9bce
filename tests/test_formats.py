"""Unit tests for COO/CSR/ELL containers against dense numpy oracles."""

import numpy as np
import pytest

from parallel_amg_tpu.ops import COO, CSR
from parallel_amg_tpu.problems import poisson2d, poisson3d, anisotropic2d


def random_coo(rng, n, m, nnz):
    return COO(
        rng.integers(0, n, nnz), rng.integers(0, m, nnz), rng.normal(size=nnz), (n, m)
    )


def test_coo_to_csr_sums_duplicates(rng):
    coo = random_coo(rng, 13, 9, 120)
    dense = coo.to_dense()
    csr = coo.to_csr()
    np.testing.assert_allclose(csr.to_dense(), dense, rtol=1e-14)
    # indices sorted within rows
    for i in range(csr.n_rows):
        row = csr.indices[csr.indptr[i] : csr.indptr[i + 1]]
        assert (np.diff(row) > 0).all()


def test_csr_matvec_transpose_diag(rng):
    coo = random_coo(rng, 17, 17, 150)
    csr = coo.to_csr()
    dense = coo.to_dense()
    x = rng.normal(size=17)
    np.testing.assert_allclose(csr.matvec(x), dense @ x, rtol=1e-12)
    np.testing.assert_allclose(csr.transpose().to_dense(), dense.T, rtol=1e-14)
    np.testing.assert_allclose(csr.diagonal(), np.diag(dense), rtol=1e-14)


def test_csr_matmat(rng):
    a = random_coo(rng, 11, 7, 40).to_csr()
    b = random_coo(rng, 7, 13, 40).to_csr()
    np.testing.assert_allclose(
        a.matmat(b).to_dense(), a.to_dense() @ b.to_dense(), rtol=1e-12, atol=1e-14
    )


def test_ell_roundtrip_and_matvec(rng):
    coo = random_coo(rng, 19, 19, 140)
    csr = coo.to_csr()
    ell = csr.to_ell()
    # roundtrip through float32 device arrays
    np.testing.assert_allclose(
        ell.to_csr().to_dense(), csr.to_dense(), rtol=1e-6, atol=1e-7
    )
    x = rng.normal(size=19).astype(np.float32)
    y = np.asarray(ell.matvec(x))
    np.testing.assert_allclose(y, csr.to_dense() @ x, rtol=1e-4, atol=1e-5)
    # explicit wider padding must not change results
    ell_w = csr.to_ell(width=csr.max_row_nnz + 3)
    np.testing.assert_allclose(np.asarray(ell_w.matvec(x)), y, rtol=1e-6)


def test_ell_matmat_diag(rng):
    coo = random_coo(rng, 12, 12, 70)
    csr = coo.to_csr()
    ell = csr.to_ell()
    X = rng.normal(size=(12, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ell.matmat(X)), csr.to_dense() @ X, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ell.diagonal()), csr.diagonal(), rtol=1e-6, atol=1e-7
    )


def test_poisson2d_structure():
    A = poisson2d(4).to_csr()
    dense = A.to_dense()
    np.testing.assert_allclose(dense, dense.T)
    assert (np.diag(dense) == 4.0).all()
    # row sums: zero interior, positive at boundary (Dirichlet)
    assert (dense.sum(1) >= 0).all()
    # interior point has 4 neighbors
    assert A.row_nnz.max() == 5
    # SPD check
    w = np.linalg.eigvalsh(dense)
    assert w.min() > 0


def test_poisson3d_structure():
    A = poisson3d(3).to_csr()
    dense = A.to_dense()
    np.testing.assert_allclose(dense, dense.T)
    assert (np.diag(dense) == 6.0).all()
    assert A.row_nnz.max() == 7
    assert np.linalg.eigvalsh(dense).min() > 0


def test_poisson_rowrange_matches_global():
    full = poisson2d(5).to_csr()
    part = poisson2d(5, row_range=(7, 19)).to_csr()
    np.testing.assert_allclose(part.to_dense()[7:19], full.to_dense()[7:19])


def test_anisotropic_structure():
    eps = 1e-3
    A = anisotropic2d(4, epsilon=eps).to_csr()
    dense = A.to_dense()
    np.testing.assert_allclose(dense, dense.T)
    np.testing.assert_allclose(np.diag(dense), 2 + 2 * eps)
    assert np.linalg.eigvalsh(dense).min() > 0
