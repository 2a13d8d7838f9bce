"""Native C++ setup builder vs. the numpy reference path (SURVEY.md §2.7).

The ctypes-loaded builder (parallel_amg_tpu/native) must reproduce the
numpy ``PCSR.from_csr`` partition bit-for-bit — same ELL widths, same
ghost ordering, same halo plan — on structured and random matrices,
including rectangular transfer operators and ragged last shards.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from parallel_amg_tpu import native
from parallel_amg_tpu.parallel import make_row_mesh
from parallel_amg_tpu.parallel.pcsr import PCSR
from parallel_amg_tpu.problems import poisson2d


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native builder unavailable (no g++)")


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_row_mesh(8)


def _numpy_build(csr, mesh, **kw):
    import os
    os.environ["PARALLEL_AMG_NO_NATIVE"] = "1"
    native._tried, native._lib = True, None
    try:
        return PCSR.from_csr(csr, mesh, **kw)
    finally:
        del os.environ["PARALLEL_AMG_NO_NATIVE"]
        native._tried = False


def _assert_same(a, b):
    for f in ("diag_cols", "diag_vals", "off_cols", "off_vals",
              "send_idx", "recv_map"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)
    assert a.true_shape == b.true_shape


def test_native_matches_numpy_poisson(mesh8):
    coo = poisson2d(37, 41)  # 1517 rows — ragged last shard
    A = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    _assert_same(PCSR.from_csr(A, mesh8), _numpy_build(A, mesh8))


def test_native_matches_numpy_random(mesh8, rng):
    A = sp.random(301, 301, density=0.03, random_state=7, format="csr")
    A = (A + sp.eye(301)).tocsr()
    _assert_same(PCSR.from_csr(A, mesh8), _numpy_build(A, mesh8))


def test_native_matches_numpy_rectangular(mesh8):
    # transfer-operator shape: tall P with zero pad rows
    P = sp.random(240, 61, density=0.05, random_state=3, format="csr")
    a = PCSR.from_csr(P, mesh8, pad_identity=False)
    b = _numpy_build(P, mesh8, pad_identity=False)
    _assert_same(a, b)


def test_native_matvec_matches_scipy(mesh8, rng):
    coo = poisson2d(40, 40)
    A = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
    Ap = PCSR.from_csr(A, mesh8)
    x = rng.normal(size=Ap.shape[1])
    x[A.shape[1]:] = 0.0
    import jax.numpy as jnp
    y = np.asarray(Ap @ jnp.asarray(x, jnp.float32))[: A.shape[0]]
    np.testing.assert_allclose(y, A @ x[: A.shape[1]], rtol=2e-5, atol=2e-5)
