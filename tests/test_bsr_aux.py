"""BSR format + aux-subsystem tests (roofline models, metrics,
determinism-as-race-detection — SURVEY.md §5)."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.bsr import BSR
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.problems import poisson2d
from parallel_amg_tpu.utils.metrics import (
    RunRecord,
    hierarchy_summary,
    residual_history,
)
from parallel_amg_tpu.utils.roofline import report, spmv_bytes


def _scipy(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


def test_bsr_roundtrip_and_matvec(rng):
    m = sp.random(50, 50, density=0.06, random_state=np.random.RandomState(4),
                  format="csr") + sp.identity(50)
    m = m.tocsr()
    m.data[:] = rng.normal(size=m.nnz)
    for bs in (2, 3, 4):
        b = BSR.from_csr(CSR.from_scipy(m), bs=bs)
        np.testing.assert_allclose(
            b.to_csr().to_dense(), m.toarray(), rtol=1e-5, atol=1e-6
        )
        x = rng.normal(size=50).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(b.matvec(jnp.asarray(x))), m @ x, rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(b.diagonal()), m.diagonal(), rtol=1e-5, atol=1e-6
        )


def test_bsr_block_structured(rng):
    """A genuinely 2x2-block matrix (vector PDE pattern)."""
    n_nodes = 20
    A = sp.random(n_nodes, n_nodes, density=0.2,
                  random_state=np.random.RandomState(5)).toarray()
    A = A + np.eye(n_nodes)
    blocks = rng.normal(size=(n_nodes, n_nodes, 2, 2))
    dense = np.zeros((2 * n_nodes, 2 * n_nodes))
    for i in range(n_nodes):
        for j in range(n_nodes):
            if A[i, j] != 0:
                dense[2*i:2*i+2, 2*j:2*j+2] = blocks[i, j]
    b = BSR.from_csr(CSR.from_dense(dense), bs=2)
    assert b.width <= (A != 0).sum(1).max()
    x = rng.normal(size=2 * n_nodes).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(b.matvec(jnp.asarray(x))), dense @ x, rtol=2e-4, atol=2e-5
    )


def test_roofline_models():
    A = poisson2d(16).to_csr()
    for op in (A.to_ell(), BSR.from_csr(A, 2)):
        assert spmv_bytes(op) > 0
        r = report(op, time_s=1e-3, sol_gbps=654.0)
        assert r.achieved_gbps > 0
        assert "GB/s" in r.row()


def test_metrics_record(tmp_path):
    rec = RunRecord(name="t", n=10, config={"a": 1}, iters=3,
                    residuals=[1.0, 0.1])
    p = tmp_path / "runs.jsonl"
    rec.save(str(p))
    assert "\"iters\": 3" in p.read_text()
    h = np.array([3.0, 1.0, np.inf, np.inf])
    np.testing.assert_allclose(residual_history(h), [3.0, 1.0])


def test_determinism_same_seed_same_history(rng):
    """The practical race detector (SURVEY.md §5): identical seeds must give
    bitwise-identical residual histories."""
    A = _scipy(poisson2d(24))
    cfg = AMGConfig(coarsening="sa", aggregate="block", block_size=2,
                    smoother="chebyshev", n_coarse_max=64)
    b = rng.normal(size=A.shape[0])
    outs = []
    for _ in range(2):
        h = pat.setup(A, cfg, dims=(24, 24))
        res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                          tol=1e-6, maxiter=50)
        outs.append(np.asarray(res.residual_history))
    np.testing.assert_array_equal(outs[0], outs[1])
    summary = hierarchy_summary(h)
    assert summary[0]["format"] == "Stencil"
