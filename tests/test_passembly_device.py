"""On-device distributed COO→PCSR assembly (parallel/passembly_device.py).

VERDICT item 5: build PCSR from per-shard triplet blocks with all_to_all
routing — no host-global CSR anywhere — and match the host-built PCSR
bit-for-bit through matvec and reconstruction.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from parallel_amg_tpu.parallel import make_row_mesh
from parallel_amg_tpu.parallel.pcsr import PCSR
from parallel_amg_tpu.parallel.passembly_device import pcsr_from_coo_device
from parallel_amg_tpu.problems import poisson2d


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_row_mesh(8)


def _triplet_blocks(nx, S, scramble=False, duplicate=False, seed=0):
    """Per-shard triplet blocks for 2D Poisson; optionally scrambled across
    shards (off-owner routing) and with duplicates split in two."""
    coo = poisson2d(nx)
    n = coo.shape[0]
    r = np.asarray(coo.row, np.int64)
    c = np.asarray(coo.col, np.int64)
    v = np.asarray(coo.val, np.float64)
    if duplicate:
        r = np.concatenate([r, r])
        c = np.concatenate([c, c])
        v = np.concatenate([0.25 * v, 0.75 * v])
    rng = np.random.default_rng(seed)
    if scramble:
        which = rng.integers(0, S, size=len(r))  # arbitrary home shards
    else:
        m = -(-n // S)
        which = np.minimum(r // m, S - 1)  # owner-local triplets
    T = int(np.max(np.bincount(which, minlength=S)))
    rows = np.full((S, T), -1, np.int64)
    cols = np.zeros((S, T), np.int64)
    vals = np.zeros((S, T), np.float64)
    for s in range(S):
        sel = which == s
        k = int(sel.sum())
        rows[s, :k], cols[s, :k], vals[s, :k] = r[sel], c[sel], v[sel]
    return rows, cols, vals, coo


def _assert_same_operator(A_dev, A_host, n):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(A_host.shape[1]), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(A_dev @ x), np.asarray(A_host @ x), rtol=1e-6, atol=1e-6)
    # reconstruction equality (verification only — the op itself never
    # touches the host)
    d = (A_dev.to_csr().to_scipy() - A_host.to_csr().to_scipy())
    assert abs(d).max() < 1e-6


@pytest.mark.parametrize("scramble,duplicate", [
    (False, False), (True, False), (True, True)])
def test_device_assembly_matches_host(mesh8, scramble, duplicate):
    nx, S = 32, 8
    rows, cols, vals, coo = _triplet_blocks(nx, S, scramble, duplicate)
    A_dev = pcsr_from_coo_device(
        rows, cols, vals, coo.shape, mesh8,
        ell_width=5, off_width=2, ghost_capacity=64)
    A_host = PCSR.from_csr(coo.to_csr(), mesh8)
    _assert_same_operator(A_dev, A_host, coo.shape[0])


def test_overflow_is_loud(mesh8):
    rows, cols, vals, coo = _triplet_blocks(16, 8)
    with pytest.raises(ValueError, match="overflow"):
        pcsr_from_coo_device(rows, cols, vals, coo.shape, mesh8,
                             ell_width=2, off_width=1, ghost_capacity=64)


def test_bigger_problem_spmv(mesh8):
    """2M-ish row scale check stays in CI range: 128² here; the 8-shard
    2M-row build is exercised by scripts/ (too slow for CPU CI)."""
    nx, S = 128, 8
    rows, cols, vals, coo = _triplet_blocks(nx, S)
    A_dev = pcsr_from_coo_device(
        rows, cols, vals, coo.shape, mesh8,
        ell_width=5, off_width=2, ghost_capacity=2 * nx)
    A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(coo.shape[0]).astype(np.float32)
    xp = jnp.zeros((A_dev.shape[1],), jnp.float32).at[:coo.shape[0]].set(x)
    y = np.asarray(A_dev @ xp)[:coo.shape[0]]
    np.testing.assert_allclose(y, A_sp @ x, rtol=2e-5, atol=2e-5)


def test_cross_mesh_shrink_no_host(mesh8, monkeypatch):
    """VERDICT r2 item 7: shrink a matrix to a 4-of-8 sub-mesh without the
    to_csr host round-trip — triplets reshard with one device_put and
    reassemble on the target mesh; parity through matvec."""
    nx, S = 32, 8
    rows, cols, vals, coo = _triplet_blocks(nx, S)
    A = pcsr_from_coo_device(rows, cols, vals, coo.shape, mesh8,
                             ell_width=5, off_width=2, ghost_capacity=64)
    mesh4 = make_row_mesh(4)

    def _boom(self):
        raise AssertionError("repartition must not round-trip via to_csr")

    monkeypatch.setattr(PCSR, "to_csr", _boom)
    B = A.repartition(mesh4, ghost_capacity=256)
    monkeypatch.undo()
    assert B.mesh is mesh4
    assert B.n_shards == 4
    n = coo.shape[0]
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    xa = jnp.zeros((A.shape[1],), jnp.float32).at[:n].set(x)
    xb = jnp.zeros((B.shape[1],), jnp.float32).at[:n].set(x)
    np.testing.assert_allclose(
        np.asarray(B @ xb)[:n], np.asarray(A @ xa)[:n],
        rtol=1e-5, atol=1e-5)


def test_repartition_rejects_unsupported_combo(mesh8):
    rows, cols, vals, coo = _triplet_blocks(16, 8)
    A = pcsr_from_coo_device(rows, cols, vals, coo.shape, mesh8,
                             ell_width=5, off_width=2, ghost_capacity=64)
    from parallel_amg_tpu.parallel.partition import uniform_row_partition
    cp = uniform_row_partition(coo.shape[1], 8)
    with pytest.raises(ValueError, match="col_partition"):
        A.repartition(mesh8, col_partition=cp, rows_per_shard=64)


def test_device_repartition_no_host(mesh8, monkeypatch):
    """Same-mesh repartition runs on device: to_triplets + all_to_all
    reassembly, with to_csr (the host round-trip) forbidden during the op."""
    nx, S = 32, 8
    rows, cols, vals, coo = _triplet_blocks(nx, S)
    A = pcsr_from_coo_device(rows, cols, vals, coo.shape, mesh8,
                             ell_width=5, off_width=2, ghost_capacity=64)
    m_new = A.row_partition.rows_per_shard + 16  # re-align ownership

    def _boom(self):
        raise AssertionError("repartition must not round-trip via to_csr")

    monkeypatch.setattr(PCSR, "to_csr", _boom)
    B = A.repartition(mesh8, rows_per_shard=m_new)
    monkeypatch.undo()
    assert B.row_partition.rows_per_shard == m_new
    n = coo.shape[0]
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    xa = jnp.zeros((A.shape[1],), jnp.float32).at[:n].set(x)
    xb = jnp.zeros((B.shape[1],), jnp.float32).at[:n].set(x)
    np.testing.assert_allclose(
        np.asarray(B @ xb)[:n], np.asarray(A @ xa)[:n],
        rtol=1e-5, atol=1e-5)
