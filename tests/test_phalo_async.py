"""Guaranteed-overlap Pallas remote-DMA halo SpMV (parallel/phalo_async.py).

VERDICT item 1: the async path must (a) match the ppermute path on the
8-device mesh, (b) survive the interpret machine's race detector (the
practical sanitizer for DMA-overlap kernels, SURVEY.md §5), and (c) be
partition-invariant vs the unsharded oracle.  Overlap itself is enforced by
kernel structure (DMA start → interior compute → semaphore wait), which the
parity tests exercise end-to-end through the simulated DMA engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

from parallel_amg_tpu.parallel import make_row_mesh
from parallel_amg_tpu.parallel.pstencil import ShardedStencil
from parallel_amg_tpu.parallel.phalo_async import async_halo_matvec
from parallel_amg_tpu.problems.stencil_problems import poisson_stencil
from parallel_amg_tpu.ops.stencil import Stencil


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_row_mesh(8)


def _sharded_x(A, seed=0):
    rng = np.random.default_rng(seed)
    return jax.device_put(
        jnp.asarray(rng.standard_normal(A.dims), jnp.float32),
        NamedSharding(A.mesh, P("rows")))


@pytest.mark.parametrize("dims", [(32, 32), (16, 8, 8)])
def test_async_matches_ppermute(mesh8, dims):
    A = ShardedStencil.from_stencil(poisson_stencil(dims), mesh8)
    x = _sharded_x(A)
    y_xla = np.asarray(A.matvec(x))
    y_async = np.asarray(async_halo_matvec(A, x, interpret=True))
    np.testing.assert_array_equal(y_async, y_xla)


def test_halo_mode_dispatch(mesh8):
    """halo_mode='pallas_async' routes matvec through the DMA kernel and
    auto-selects the interpret machine on the CPU mesh."""
    A = ShardedStencil.from_stencil(poisson_stencil((24, 16)), mesh8)
    x = _sharded_x(A, seed=1)
    y_ref = np.asarray(A.matvec(x))
    y = np.asarray(A.with_halo_mode("pallas_async").matvec(x))
    np.testing.assert_array_equal(y, y_ref)


def test_race_detector_clean(mesh8):
    """The interpret machine's vector-clock race detector must pass: the
    semaphore protocol fully orders remote writes vs halo reads."""
    A = ShardedStencil.from_stencil(poisson_stencil((16, 16)), mesh8)
    x = _sharded_x(A, seed=2)
    y = async_halo_matvec(
        A, x,
        interpret=pltpu.InterpretParams(
            dma_execution_mode="on_wait", detect_races=True))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(A.matvec(x)))


def test_reach2_stencil(mesh8):
    """Halo depth h=2 (|offset0|=2, e.g. a squared operator) exchanges two
    planes per side; exercises the multi-plane DMA and corrections."""
    st = poisson_stencil((32, 8))
    st2 = st.matmul(st)  # A^2: 13-point, reach 2
    A = ShardedStencil.from_stencil(st2, mesh8)
    assert A.halo == 2
    x = _sharded_x(A, seed=3)
    np.testing.assert_allclose(  # different correction-sum order: fp noise
        np.asarray(async_halo_matvec(A, x, interpret=True)),
        np.asarray(A.matvec(x)), rtol=1e-5, atol=1e-5)


def test_partition_invariance_vs_oracle(mesh8):
    """8-shard async SpMV equals the single-device host stencil oracle."""
    st = poisson_stencil((32, 16))
    A = ShardedStencil.from_stencil(st, mesh8)
    rng = np.random.default_rng(4)
    xh = rng.standard_normal(st.dims).astype(np.float32)
    y_oracle = np.asarray(st.matvec(jnp.asarray(xh)))
    x = jax.device_put(jnp.asarray(xh), NamedSharding(mesh8, P("rows")))
    y = np.asarray(async_halo_matvec(A, x, interpret=True))
    np.testing.assert_allclose(y, y_oracle, rtol=1e-6, atol=1e-6)
