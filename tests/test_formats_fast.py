"""DIA and TWELL (the TPU fast-path formats) vs CSR oracles.

TWELL's Pallas kernel runs in interpret mode on the CPU test mesh
(SURVEY.md §4.1); its compiled-mode numerics are covered by the TPU bench.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.dia import DIA
from parallel_amg_tpu.ops.twell import TWELL
from parallel_amg_tpu.problems import poisson2d, poisson3d, anisotropic2d
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.oracle import oracle_setup


def _csr(coo):
    return coo.to_csr()


# ---------------------------------------------------------------------------
# DIA
# ---------------------------------------------------------------------------

def test_dia_roundtrip_poisson2d():
    A = _csr(poisson2d(16))
    d = DIA.from_csr(A)
    assert d is not None and d.n_diags == 5
    np.testing.assert_allclose(d.to_csr().to_dense(), A.to_dense(), rtol=1e-6)


def test_dia_matvec_matches_csr(rng):
    for coo in (poisson2d(16), poisson3d(8), anisotropic2d(12, epsilon=1e-3)):
        A = _csr(coo)
        d = DIA.from_csr(A)
        assert d is not None
        x = rng.normal(size=A.n_rows).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(d.matvec(jnp.asarray(x))), A.to_dense() @ x,
            rtol=1e-4, atol=1e-5,
        )


def test_dia_matmat_and_diagonal(rng):
    A = _csr(poisson2d(10))
    d = DIA.from_csr(A)
    X = rng.normal(size=(A.n_rows, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(d.matmat(jnp.asarray(X))), A.to_dense() @ X, rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(d.diagonal()), A.diagonal(), rtol=1e-6)


def test_dia_rejects_scattered_matrix(rng):
    m = sp.random(300, 300, density=0.02, random_state=np.random.RandomState(3),
                  format="csr")
    csr = CSR.from_scipy(m + sp.identity(300))
    assert DIA.from_csr(csr, max_diags=64) is None


# ---------------------------------------------------------------------------
# TWELL
# ---------------------------------------------------------------------------

def test_twell_roundtrip_random(rng):
    m = sp.random(300, 260, density=0.03, random_state=np.random.RandomState(5),
                  format="csr")
    m.data[:] = rng.normal(size=m.nnz)
    csr = CSR.from_scipy(m)
    tw = TWELL.from_csr(csr)
    np.testing.assert_allclose(
        tw.to_csr().to_dense(), csr.to_dense(), rtol=1e-6, atol=1e-7
    )


def test_twell_matvec_random(rng):
    m = sp.random(500, 500, density=0.02, random_state=np.random.RandomState(6),
                  format="csr")
    m = (m + sp.identity(500)).tocsr()
    csr = CSR.from_scipy(m)
    tw = TWELL.from_csr(csr)
    x = rng.normal(size=500).astype(np.float32)
    y = np.asarray(tw.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, m @ x, rtol=2e-4, atol=2e-5)


def test_twell_matvec_rectangular(rng):
    m = sp.random(330, 97, density=0.05, random_state=np.random.RandomState(8),
                  format="csr")
    m.data[:] = rng.normal(size=m.nnz)
    csr = CSR.from_scipy(m)
    tw = TWELL.from_csr(csr)
    x = rng.normal(size=97).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(tw.matvec(jnp.asarray(x))), m @ x, rtol=2e-4, atol=2e-5
    )


def test_twell_slot_overflow(rng):
    """A row with many entries inside one 128-window must spill into copy
    pieces and still produce the right product."""
    n = 140
    row = np.zeros(n); row[:40] = rng.normal(size=40)  # 40 entries in window 0
    dense = np.eye(n) + np.outer(np.eye(n)[:, 3], row)
    csr = CSR.from_dense(dense)
    tw = TWELL.from_csr(csr)
    x = rng.normal(size=n).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(tw.matvec(jnp.asarray(x))), dense @ x.astype(np.float64),
        rtol=2e-4, atol=2e-5,
    )


def test_twell_on_amg_coarse_level():
    """The production use: a PMIS/ext+i Galerkin coarse operator."""
    A0 = poisson2d(48).to_csr().to_scipy()
    h = oracle_setup(A0, AMGConfig(coarsening="rs", n_coarse_max=128))
    A1 = h.levels[1].A.tocsr()
    csr = CSR.from_scipy(A1)
    tw = TWELL.from_csr(csr)
    x = np.random.default_rng(0).normal(size=A1.shape[0]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(tw.matvec(jnp.asarray(x))), A1 @ x, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tw.diagonal()), A1.diagonal(), rtol=1e-5, atol=1e-6
    )


def test_ell_spgemm_pairwise_parity():
    """Sort-free pairwise ESC == sort ESC == scipy (docs/SPGEMM.md)."""
    import scipy.sparse as sp
    import jax.numpy as jnp
    from parallel_amg_tpu.ops.csr import CSR
    from parallel_amg_tpu.ops.ell import ELL
    from parallel_amg_tpu.ops.ell_setup import ell_spgemm, ell_spgemm_pairwise
    from parallel_amg_tpu.problems import poisson2d

    coo = poisson2d(48)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    A = ELL.from_csr(CSR.from_scipy(A_sp), dtype=jnp.float32)
    C1 = ell_spgemm(A, A, out_width=16)
    C2 = ell_spgemm_pairwise(A, A, out_width=16, row_chunk=512)

    def to_sp(C):
        R, W = C.cols.shape
        m = sp.csr_matrix(
            (np.asarray(C.vals).ravel(),
             (np.repeat(np.arange(R), W), np.asarray(C.cols).ravel())),
            shape=A_sp.shape)
        m.sum_duplicates()
        return m

    ref = (A_sp @ A_sp).astype(np.float32)
    assert abs(to_sp(C1) - to_sp(C2)).max() < 1e-4
    assert abs(to_sp(C2) - ref).max() < 1e-3


def test_ell_spgemm_overflow_is_loud():
    """ADVICE r2 medium: a too-small out_width must raise (strict) or drop
    whole runs to a trash slot (non-strict) — never mis-sum overflow into a
    surviving column — identically in both ESC variants."""
    import pytest
    import scipy.sparse as sp
    import jax.numpy as jnp
    from parallel_amg_tpu.ops.csr import CSR
    from parallel_amg_tpu.ops.ell import ELL
    from parallel_amg_tpu.ops.ell_setup import ell_spgemm, ell_spgemm_pairwise
    from parallel_amg_tpu.problems import poisson2d

    coo = poisson2d(16)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    A = ELL.from_csr(CSR.from_scipy(A_sp), dtype=jnp.float32)
    # A² rows have up to 13 entries; out_width=4 must overflow
    with pytest.raises(ValueError, match="out_width"):
        ell_spgemm(A, A, out_width=4)
    with pytest.raises(ValueError, match="out_width"):
        ell_spgemm_pairwise(A, A, out_width=4, row_chunk=64)

    # non-strict: every surviving (col, val) must be EXACT vs the full
    # product (dropping must not corrupt kept slots)
    ref = (A_sp @ A_sp).tocsr().astype(np.float32)
    for C in (ell_spgemm(A, A, out_width=4, strict=False),
              ell_spgemm_pairwise(A, A, out_width=4, row_chunk=64,
                                  strict=False)):
        cols = np.asarray(C.cols)
        vals = np.asarray(C.vals)
        nnz = np.asarray(C.row_nnz)
        for r in range(C.shape[0]):
            for k in range(int(nnz[r])):
                assert abs(vals[r, k] - ref[r, cols[r, k]]) < 1e-4
