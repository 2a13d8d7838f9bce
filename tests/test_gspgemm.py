"""Rank-plane Pallas SpGEMM (ops/gspgemm.py) parity tests — interpret
machine on the CPU suite, compiled on TPU.  Same contract as the v1 kernel
(tests/test_pspgemm.py): exact (col, val) sets vs scipy on square and
rectangular Galerkin-chain products; explicit zeros drop."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.gspgemm import GatherSpgemmPlan, gather_spgemm
from parallel_amg_tpu.problems import poisson2d


def _ell(A_sp):
    return ELL.from_csr(CSR.from_scipy(A_sp.tocsr()), dtype=jnp.float32)


def _check(C, ref):
    ref = ref.tocsr()
    ref.eliminate_zeros()
    got = C.to_csr().to_scipy()
    d = abs(got - ref)
    assert got.nnz == ref.nnz
    assert (d.max() if d.nnz else 0.0) < 1e-5


def test_square_poisson_product():
    coo = poisson2d(16)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    _check(gather_spgemm(_ell(A_sp), _ell(A_sp)), A_sp @ A_sp)


def test_rectangular_galerkin_shapes():
    coo = poisson2d(16)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    n = A_sp.shape[0]
    nc = 70
    P_sp = (sp.random(n, nc, density=0.02, random_state=1, format="csr")
            + sp.eye(n, nc) * 0.5).tocsr()
    AP = gather_spgemm(_ell(A_sp), _ell(P_sp))
    _check(AP, A_sp @ P_sp)
    R_sp = P_sp.T.tocsr()
    _check(gather_spgemm(_ell(R_sp), AP), R_sp @ (A_sp @ P_sp))


def test_plan_reuse_and_random():
    rng = np.random.default_rng(3)
    A_sp = sp.random(300, 300, density=0.03, random_state=4, format="csr")
    A_sp.setdiag(1.0)
    A_sp = A_sp.tocsr()
    plan = GatherSpgemmPlan.from_ell(_ell(A_sp))
    B1 = sp.random(300, 200, density=0.05, random_state=5, format="csr")
    B2 = sp.random(300, 40, density=0.1, random_state=6, format="csr")
    _check(gather_spgemm(None, _ell(B1), plan=plan), A_sp @ B1)
    _check(gather_spgemm(None, _ell(B2), plan=plan), A_sp @ B2)


def test_explicit_out_width_and_wide_rows():
    """Wa > 8 exercises the kernel's 8-plane gather groups."""
    rng = np.random.default_rng(7)
    A_sp = sp.random(256, 512, density=0.05, random_state=7, format="csr")
    B_sp = sp.random(512, 128, density=0.05, random_state=8, format="csr")
    A = _ell(A_sp)
    assert A.cols.shape[1] > 8
    ref = (A_sp @ B_sp).tocsr()
    ref.eliminate_zeros()
    w = int(np.diff(ref.indptr).max())
    _check(gather_spgemm(A, _ell(B_sp), out_width=w), ref)


def test_dedup_compact_kernel_interpret():
    """Direct interpret-mode logic test of the fused dedup+compaction
    kernel (the TPU path — gather_spgemm routes CPU through the XLA
    compaction for suite speed): duplicate columns merge, leaders compact
    front-first, counts exact, overflow rows clamp."""
    import jax.numpy as jnp

    from parallel_amg_tpu.ops.gspgemm import _dedup_compact_call

    sent = 100
    cand_c = jnp.asarray([
        [3, 7, 3, sent, 9, 7],
        [5, sent, sent, 5, 5, 5],
        [sent] * 6,
        [1, 2, 3, 4, 5, 6],
    ], jnp.int32)
    cand_v = jnp.asarray([
        [1.0, 2.0, 10.0, 0.0, 4.0, 20.0],
        [1.0, 0.0, 0.0, 1.0, 1.0, 1.0],
        [0.0] * 6,
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    ], jnp.float32)
    cc, cv, dn = _dedup_compact_call(cand_c, cand_v, sent, out_width=3)
    assert dn.tolist() == [3, 1, 0, 6]  # true counts (row 3 overflows)
    assert cc[0].tolist() == [3, 7, 9]
    np.testing.assert_allclose(np.asarray(cv[0]), [11.0, 22.0, 4.0])
    assert cc[1].tolist()[0] == 5 and float(cv[1][0]) == 4.0
    assert float(cv[2].sum()) == 0.0
    assert cc[3].tolist() == [1, 2, 3]  # first 3 leaders kept, rest dropped


def test_device_plan_matches_host_products():
    """GatherSpgemmPlan.from_ell_device: same products as the numpy plan
    (layout may differ — piece padding, synthetic tile keys; the operator
    contract is product equality)."""
    rng = np.random.default_rng(11)
    coo = poisson2d(20)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    n = A_sp.shape[0]
    nc = 97
    P_sp = (sp.random(n, nc, density=0.03, random_state=4, format="csr")
            + sp.eye(n, nc) * 0.5).tocsr()
    P_sp.data = rng.normal(size=P_sp.nnz)
    A = _ell(A_sp)
    plan_d = GatherSpgemmPlan.from_ell_device(A)
    AP = gather_spgemm(plan_d, _ell(P_sp))
    _check(AP, A_sp @ P_sp)
    # rows with no entries (empty tiles in a >128-row operand)
    lil = A_sp.tolil()
    lil[0, :] = 0
    lil[n - 1, :] = 0
    A2 = lil.tocsr()
    A2.eliminate_zeros()
    plan2 = GatherSpgemmPlan.from_ell_device(_ell(A2))
    _check(gather_spgemm(plan2, _ell(P_sp)), A2 @ P_sp)


def test_strict_width_raises():
    coo = poisson2d(12)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    A2 = (A_sp @ A_sp).tocsr()  # rows with up to 13 distinct columns
    wmax = int(np.diff(A2.indptr).max())
    with pytest.raises(ValueError, match="out_width"):
        gather_spgemm(_ell(A_sp), _ell(A_sp), out_width=wmax - 2)
    # strict=False clamps silently (documented)
    C = gather_spgemm(_ell(A_sp), _ell(A_sp), out_width=wmax - 2,
                      strict=False)
    assert int(np.asarray(C.row_nnz).max()) == wmax - 2
