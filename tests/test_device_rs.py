"""On-device classical (RS) setup vs the serial oracle.

Strategy: exact component tests where the algorithms are deterministic
(strength, direct interpolation on an injected splitting, transpose, ESC
SpGEMM), invariant tests for the randomized PMIS, and end-to-end
convergence for the full device pipeline.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import parallel_amg_tpu as pat
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.amg.device_rs import (
    COARSE,
    FINE,
    classical_strength_mask,
    device_rs_setup,
    direct_interpolation_device,
    pmis_split_device,
)
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.ell_setup import ell_spgemm, ell_transpose
from parallel_amg_tpu.oracle.serial_amg import (
    classical_strength,
    direct_interpolation,
    pmis_split,
)
from parallel_amg_tpu.problems import poisson2d, anisotropic2d


def _scipy(coo):
    return sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)


def _ell(A_sp):
    return ELL.from_csr(CSR.from_scipy(A_sp.tocsr()))


def test_ell_transpose_matches(rng):
    m = sp.random(87, 61, density=0.08, random_state=np.random.RandomState(1),
                  format="csr")
    m.data[:] = rng.normal(size=m.nnz)
    t = ell_transpose(_ell(m))
    np.testing.assert_allclose(
        t.to_csr().to_dense(), m.T.toarray(), rtol=1e-5, atol=1e-6
    )


def test_ell_spgemm_matches(rng):
    a = sp.random(40, 31, density=0.15, random_state=np.random.RandomState(2),
                  format="csr")
    b = sp.random(31, 52, density=0.15, random_state=np.random.RandomState(3),
                  format="csr")
    a.data[:] = rng.normal(size=a.nnz)
    b.data[:] = rng.normal(size=b.nnz)
    c = ell_spgemm(_ell(a), _ell(b))
    np.testing.assert_allclose(
        c.to_csr().to_dense(), (a @ b).toarray(), rtol=1e-4, atol=1e-5
    )


def test_strength_mask_matches_oracle():
    A = _scipy(anisotropic2d(10, epsilon=1e-3))
    ell = _ell(A)
    S_dev = np.asarray(classical_strength_mask(ell, 0.25))
    S_orc = classical_strength(A, 0.25)
    # collect device (row, col) strong pairs
    rows = np.repeat(np.arange(ell.n_rows), ell.cols.shape[1]).reshape(
        S_dev.shape)
    got = {(int(r), int(c)) for r, c, s in
           zip(rows.ravel(), np.asarray(ell.cols).ravel(), S_dev.ravel()) if s}
    coo = S_orc.tocoo()
    want = set(zip(coo.row.tolist(), coo.col.tolist()))
    assert got == want


def test_pmis_device_invariants():
    A = _scipy(poisson2d(16))
    ell = _ell(A)
    S = classical_strength_mask(ell, 0.25)
    state = np.asarray(pmis_split_device(ell, S, seed=0))
    assert set(np.unique(state)) <= {FINE, COARSE}
    frac = (state == COARSE).mean()
    assert 0.1 < frac < 0.75
    # every F point has a strong C neighbor
    Sm = np.asarray(S)
    cols = np.asarray(ell.cols)
    for i in np.flatnonzero(state == FINE):
        nbrs = cols[i][Sm[i]]
        assert (state[nbrs] == COARSE).any(), f"F point {i} isolated"


def test_direct_interpolation_matches_oracle_on_same_split(rng):
    """Inject the oracle's PMIS state → device P must equal oracle P."""
    A = _scipy(poisson2d(12))
    S_orc = classical_strength(A, 0.25)
    state = pmis_split(S_orc, seed=0)
    ell = _ell(A)
    S_dev = classical_strength_mask(ell, 0.25)
    P_dev = direct_interpolation_device(
        ell, S_dev, jnp.asarray(state.astype(np.int32)), p_max=8
    )
    P_orc = direct_interpolation(A, S_orc, state)
    np.testing.assert_allclose(
        P_dev.to_csr().to_dense(), P_orc.toarray(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("interp", ["direct", "smoothed_direct"])
def test_device_rs_pcg_poisson(interp, rng):
    A = _scipy(poisson2d(32))
    cfg = AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=64,
                    interpolation=interp)
    h = device_rs_setup(_ell(A), cfg)
    assert len(h.levels) >= 2
    b = rng.normal(size=A.shape[0])
    res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                      tol=1e-6, maxiter=80)
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(b - A @ x) <= 5e-6 * np.linalg.norm(b)
    limit = 20 if interp != "direct" else 40
    assert int(res.iters) <= limit, int(res.iters)


def test_device_rs_anisotropic(rng):
    A = _scipy(anisotropic2d(32, epsilon=1e-3))
    cfg = AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=64)
    h = device_rs_setup(_ell(A), cfg)
    b = rng.normal(size=A.shape[0])
    res = pat.amg_pcg(h.levels[0].A, h, jnp.asarray(b, jnp.float32),
                      tol=1e-6, maxiter=80)
    assert bool(res.converged)
    assert int(res.iters) <= 30


def test_fused_driver_gather_engine_parity(rng, monkeypatch):
    """device_rs_setup_fused with the Pallas gather SpGEMM engine forced
    (PAT_RS_SPGEMM=gather) builds the same hierarchy as the pairwise ESC
    path — same level shapes, roundoff-level operator diffs, identical PCG
    iteration count (round-4 verdict item 6: the winning kernel must be a
    production path, not a bench-only artifact)."""
    from parallel_amg_tpu.amg.device_rs import device_rs_setup_fused

    A = _scipy(poisson2d(48))
    cfg = AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=64,
                    interpolation="extended_i")
    monkeypatch.setenv("PAT_RS_SPGEMM", "gather")
    hg = device_rs_setup_fused(_ell(A), cfg)
    monkeypatch.setenv("PAT_RS_SPGEMM", "pairwise")
    hp = device_rs_setup_fused(_ell(A), cfg)
    assert [l.A.n_rows for l in hg.levels] == [l.A.n_rows for l in hp.levels]
    for lg, lp in zip(hg.levels, hp.levels):
        d = abs(lg.A.to_csr().to_scipy() - lp.A.to_csr().to_scipy())
        assert (d.max() if d.nnz else 0.0) < 1e-5
    b = rng.normal(size=A.shape[0])
    rg = pat.amg_pcg(None, hg, jnp.asarray(b, jnp.float32), tol=1e-6,
                     maxiter=50)
    rp = pat.amg_pcg(None, hp, jnp.asarray(b, jnp.float32), tol=1e-6,
                     maxiter=50)
    assert bool(rg.converged) and int(rg.iters) == int(rp.iters)


def test_fused_shape_schedule_roundtrip(tmp_path, monkeypatch):
    """The fused driver's shape-schedule cache: a first build records the
    per-level static widths; a replay dispatches every program with no
    intermediate sync and must produce a BITWISE-identical hierarchy; a
    corrupted schedule must fail verification and fall back to the
    level-serialized rebuild (still bitwise identical) — stale schedules
    may cost time, never correctness."""
    import json

    monkeypatch.setenv("PAT_RS_SCHEDULE_DIR", str(tmp_path))
    csr = poisson2d(32).to_csr()
    cfg = AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=64,
                    interpolation="extended_i", on_device_setup=True)

    def _identical(ha, hb):
        assert [l.A.n_rows for l in ha.levels] == \
               [l.A.n_rows for l in hb.levels]
        for la, lb in zip(ha.levels, hb.levels):
            np.testing.assert_array_equal(np.asarray(la.A.cols),
                                          np.asarray(lb.A.cols))
            np.testing.assert_array_equal(np.asarray(la.A.vals),
                                          np.asarray(lb.A.vals))
            if la.P is not None:
                np.testing.assert_array_equal(np.asarray(la.P.vals),
                                              np.asarray(lb.P.vals))

    h1 = device_rs_setup(csr, cfg, fused=True)
    files = list(tmp_path.glob("*.json"))
    assert len(files) == 1, "schedule not recorded"
    sched = json.loads(files[0].read_text())
    assert sched[-1]["last"] and not sched[0]["last"]

    h2 = device_rs_setup(csr, cfg, fused=True)  # scheduled replay
    _identical(h1, h2)

    sched[0]["nc"] += 1  # corrupt: verification must reject it
    files[0].write_text(json.dumps(sched))
    h3 = device_rs_setup(csr, cfg, fused=True)
    _identical(h1, h3)

    b = np.random.default_rng(0).normal(size=csr.shape[0])
    res = pat.amg_pcg(None, h2, jnp.asarray(b, jnp.float32), tol=1e-6,
                      maxiter=50)
    assert bool(res.converged) and int(res.iters) <= 12
