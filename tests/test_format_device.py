"""On-device ELL→DIA/TWELL conversion (ops/format_device.py) vs the host
converter and scipy oracles.

The device TWELL layout is NOT bit-identical to the numpy builder (synthetic
per-tile dummy entries, bucketed piece padding) — parity is OPERATOR
equality: matvec results match scipy on the same matrix.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.dia import DIA
from parallel_amg_tpu.ops.ell import ELL
from parallel_amg_tpu.ops.format_device import (
    best_format_from_ell,
    dia_from_ell,
    twell_from_ell,
)
from parallel_amg_tpu.ops.twell import TWELL


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _rand_csr(rng, n, m, density=0.02, banded=False):
    if banded:
        offs = [-n // 3, -1, 0, 1, n // 3]
        A = sp.diags([rng.normal(size=n - abs(o)) for o in offs], offs,
                     shape=(n, m), format="csr")
    else:
        A = sp.random(n, m, density=density, random_state=3, format="csr")
        A.data = rng.normal(size=A.nnz)
    return A.tocsr()


def test_dia_device_matches_host(rng):
    A = _rand_csr(rng, 300, 300, banded=True)
    ell = ELL.from_csr(CSR.from_scipy(A))
    dia, nnz = dia_from_ell(ell)
    assert dia is not None
    host = DIA.from_csr(CSR.from_scipy(A), max_diags=192)
    assert dia.offsets == host.offsets
    np.testing.assert_allclose(np.asarray(dia.diags),
                               np.asarray(host.diags), rtol=1e-6)
    assert nnz == A.nnz


def test_dia_device_rejects_unbanded(rng):
    A = _rand_csr(rng, 400, 400, density=0.05)
    ell = ELL.from_csr(CSR.from_scipy(A))
    dia, nnz = dia_from_ell(ell)
    assert dia is None  # hundreds of distinct offsets
    assert nnz == A.nnz


def test_dia_device_sums_duplicates(rng):
    # two ELL entries on the same (row, col) must sum, matching CSR semantics
    cols = jnp.asarray([[0, 1, 1], [1, 0, 0]], jnp.int32)
    vals = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 0.0, 0.0]], jnp.float32)
    ell = ELL(cols, vals, jnp.asarray([3, 1], jnp.int32), (2, 2))
    dia, _ = dia_from_ell(ell)
    assert dia is not None
    dense = np.zeros((2, 2))
    dense[0, 0] = 1.0
    dense[0, 1] = 2.0 + 3.0
    dense[1, 1] = 4.0
    x = np.asarray([1.5, -2.0])
    np.testing.assert_allclose(np.asarray(dia.matvec(jnp.asarray(x, jnp.float32))),
                               dense @ x, rtol=1e-6)


@pytest.mark.parametrize("shape,density", [((257, 257), 0.03),
                                           ((500, 130), 0.05),
                                           ((130, 500), 0.05),
                                           ((1000, 260), 0.02)])
def test_twell_device_matvec_parity(rng, shape, density):
    A = _rand_csr(rng, shape[0], shape[1], density=density)
    ell = ELL.from_csr(CSR.from_scipy(A))
    tw = twell_from_ell(ell)
    x = rng.normal(size=shape[1])
    y = np.asarray(tw.matvec(jnp.asarray(x, jnp.float32)))
    ref = A @ x
    np.testing.assert_allclose(y, ref, rtol=3e-5,
                               atol=3e-6 * max(np.abs(ref).max(), 1.0))
    # diagonal path exercises the (piece, sub, lane) decode
    if shape[0] == shape[1]:
        np.testing.assert_allclose(np.asarray(tw.diagonal()),
                                   A.diagonal(), rtol=1e-5, atol=1e-6)


def test_twell_device_matches_host_cost_choice(rng):
    """Device and host builders pick the same (slots, wg) on a typical
    coarse-level operand (same cost model, counts within dummy slack)."""
    A = _rand_csr(rng, 600, 600, density=0.02)
    ell = ELL.from_csr(CSR.from_scipy(A))
    tw_dev = twell_from_ell(ell)
    tw_host = TWELL.from_csr(CSR.from_scipy(A))
    assert (tw_dev.slots, tw_dev.wg) == (tw_host.slots, tw_host.wg)
    x = rng.normal(size=600)
    np.testing.assert_allclose(
        np.asarray(tw_dev.matvec(jnp.asarray(x, jnp.float32))),
        np.asarray(tw_host.matvec(jnp.asarray(x, jnp.float32))),
        rtol=3e-5, atol=1e-5)


def test_twell_device_empty_rows(rng):
    """Rows with zero entries (padded tiles) must still produce correct
    zeros — exercises the synthetic dummy-entry path."""
    A = sp.random(300, 300, density=0.02, random_state=5, format="csr")
    A.data = rng.normal(size=A.nnz)
    lil = A.tolil()
    lil[0, :] = 0      # empty first row
    lil[299, :] = 0    # empty last row
    A = lil.tocsr()
    A.eliminate_zeros()
    ell = ELL.from_csr(CSR.from_scipy(A))
    tw = twell_from_ell(ell)
    x = rng.normal(size=300)
    y = np.asarray(tw.matvec(jnp.asarray(x, jnp.float32)))
    ref = A @ x
    np.testing.assert_allclose(y, ref, rtol=3e-5, atol=1e-5)
    assert y[0] == 0 and y[299] == 0


def test_best_format_policy_matches_host(rng):
    from parallel_amg_tpu.amg.hierarchy import with_best_formats

    banded = ELL.from_csr(CSR.from_scipy(_rand_csr(rng, 300, 300,
                                                   banded=True)))
    scattered = ELL.from_csr(CSR.from_scipy(_rand_csr(rng, 300, 300,
                                                      density=0.05)))
    rect = ELL.from_csr(CSR.from_scipy(_rand_csr(rng, 300, 100,
                                                 density=0.05)))
    assert isinstance(best_format_from_ell(banded), DIA)
    assert isinstance(best_format_from_ell(scattered), TWELL)
    assert isinstance(best_format_from_ell(rect), TWELL)


def test_hierarchy_device_conversion_parity(rng):
    """with_best_formats(h, device=True) produces a hierarchy whose V-cycle
    matches the host-converted one."""
    import parallel_amg_tpu as pat
    from parallel_amg_tpu.amg.hierarchy import with_best_formats
    from parallel_amg_tpu.problems import poisson2d

    cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev",
                        n_coarse_max=64, on_device_setup=True,
                        interpolation="extended_i")
    h = pat.setup(poisson2d(48).to_csr(), cfg)
    h_host = with_best_formats(h, "tpu")
    h_dev = with_best_formats(h, "tpu", device=True)
    assert len(h_host.levels) == len(h_dev.levels)
    b = jnp.asarray(rng.normal(size=h.levels[0].A.n_rows), jnp.float32)
    y_host = np.asarray(pat.vcycle(h_host, jnp.zeros_like(b), b))
    y_dev = np.asarray(pat.vcycle(h_dev, jnp.zeros_like(b), b))
    np.testing.assert_allclose(y_dev, y_host, rtol=1e-4,
                               atol=1e-5 * max(np.abs(y_host).max(), 1.0))
