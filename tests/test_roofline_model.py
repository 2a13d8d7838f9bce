"""Collective-traffic model regression tests (utils/roofline.py).

VERDICT r2 item 2: ``cycle_collective_volume`` crashed on the shipping
flagship config — a ``with_spmv_backend(h, "mixed")`` hierarchy whose fat
coarse levels are FlatDIA with flat int offsets (``'int' object is not
subscriptable``).  These tests pin the model on exactly that shape.
"""

import numpy as np
import pytest

import parallel_amg_tpu as pat
from parallel_amg_tpu.amg.hierarchy import with_spmv_backend
from parallel_amg_tpu.problems.stencil_problems import poisson_stencil
from parallel_amg_tpu.utils.roofline import (
    _axis0_reach,
    cycle_collective_volume,
)


@pytest.fixture(scope="module")
def h_sa3d():
    cfg = pat.AMGConfig(coarsening="sa", aggregate="block", block_size=3,
                        smoother="chebyshev", n_coarse_max=64,
                        on_device_setup=True)
    return pat.setup(poisson_stencil((27, 27, 27)), cfg)


def _assert_model_ok(model, n_shards):
    assert model["n_shards"] == n_shards
    assert isinstance(model["per_shard_cycle_bytes"], (int, np.integer))
    assert model["levels"], "model must report per-level rows"
    for row in model["levels"]:
        assert "error" not in row
        assert row["halo_bytes_per_matvec"] >= 0


def test_collective_model_stencil(h_sa3d):
    _assert_model_ok(cycle_collective_volume(h_sa3d, 8), 8)


@pytest.mark.parametrize("backend", ["pallas", "mixed"])
def test_collective_model_swapped_backends(h_sa3d, backend):
    """The exact shape that crashed BENCH_r02: FlatDIA levels after a
    backend swap.  (On the CPU mesh "mixed" keeps XLA levels, so "pallas"
    is the parametrization that actually produces FlatDIA here.)"""
    hm = with_spmv_backend(h_sa3d, backend)
    model = cycle_collective_volume(hm, 8)
    _assert_model_ok(model, 8)
    # the traffic model is engine-independent: byte counts must match the
    # pre-swap stencil hierarchy exactly
    base = cycle_collective_volume(h_sa3d, 8)
    assert model["per_shard_cycle_bytes"] == base["per_shard_cycle_bytes"]


def test_axis0_reach_flat_offsets():
    """FlatDIA-style flat offsets recover the N-D axis-0 reach."""

    class Fake:
        dims = (64, 32, 32)
        offsets = (-1024, -32, -1, 0, 1, 32, 1024)  # 7-point, stride0=1024
        nd_offsets = None

    assert _axis0_reach(Fake()) == 1

    class Fake2:
        dims = (64, 32, 32)
        # 2-reach axis-0 planes with in-plane components
        offsets = (-2048 - 33, -1024, 0, 1024 + 1, 2048 + 33)
        nd_offsets = None

    assert _axis0_reach(Fake2()) == 2
