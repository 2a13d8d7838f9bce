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


def test_latency_model_terms(h_sa3d):
    """cycle_latency_model: bytes axis matches cycle_collective_volume;
    latency terms scale with message counts and stated constants."""
    from parallel_amg_tpu.utils.roofline import (
        cycle_latency_model,
        scaling_projection,
    )

    m = cycle_latency_model(h_sa3d, 8)
    base = cycle_collective_volume(h_sa3d, 8)
    assert m["per_shard_cycle_bytes"] == base["per_shard_cycle_bytes"]
    assert m["halo_messages_per_cycle"] == sum(
        lv["matvecs_per_cycle"] for lv in base["levels"]
        if not lv["replicated"])
    c = m["constants"]
    assert m["t_halo_latency_s"] == (
        m["halo_messages_per_cycle"] * c["collective_latency_s"])
    assert m["t_halo_bw_s"] > 0 and m["t_boundary_allgather_s"] > 0
    rows = scaling_projection(h_sa3d, 1e-3, [8, 32])
    assert [r["n_shards"] for r in rows] == [8, 32]
    for r in rows:
        assert 0 < r["projected_efficiency"] <= 1
    # strong-scaling: compute shrinks with N, comm latency does not
    assert rows[1]["t_compute_s"] < rows[0]["t_compute_s"]


def test_halo_bytes_match_hlo():
    """The model's halo-bytes-per-matvec axis equals the actual
    collective-permute traffic XLA emits for a sharded stencil matvec on
    the 8-device mesh (VERDICT r3 item 8 'validate the bytes axis against
    HLO')."""
    import re

    import jax
    import jax.numpy as jnp

    from parallel_amg_tpu.parallel import make_row_mesh
    from parallel_amg_tpu.parallel.mesh import row_sharding
    from parallel_amg_tpu.parallel.pstencil import ShardedStencil
    from parallel_amg_tpu.utils.roofline import _axis0_reach

    assert jax.device_count() >= 8
    mesh = make_row_mesh(8)
    st = poisson_stencil((32, 16, 16))
    A = ShardedStencil.from_stencil(st, mesh)
    x = jax.device_put(jnp.ones((32, 16, 16), jnp.float32),
                       row_sharding(mesh))
    hlo = jax.jit(A.matvec).lower(x).compile().as_text()
    moved = 0
    for m_ in re.finditer(
            r"= f32\[([0-9,]+)\][^\n]*collective-permute\(", hlo):
        dims = [int(d) for d in m_.group(1).split(",")]
        moved += int(np.prod(dims)) * 4
    h = _axis0_reach(st)
    plane = 16 * 16
    model = 2 * h * plane * 4
    assert moved == model, (moved, model)


def test_weak_scaling_projection_modes(h_sa3d):
    """Weak mode: constant per-shard compute, halo bytes constant in N,
    efficiency monotone-decreasing only through latency/allgather terms;
    extrapolated rows label themselves."""
    from parallel_amg_tpu.utils.roofline import weak_scaling_projection

    rows = weak_scaling_projection(h_sa3d, 1e-3, [8, 32, 64])
    assert [r["n_shards"] for r in rows] == [8, 32, 64]
    for r in rows:
        assert r["mode"] == "weak" and not r["extrapolated"]
        assert r["t_compute_s"] == 1e-3  # constant per-shard load
        assert 0 < r["projected_efficiency"] <= 1
        assert r["constants"]["ici_gbps"] > 0
    # halo bandwidth term must not grow with N (shard boundary is constant)
    assert rows[2]["t_halo_bw_s"] <= rows[0]["t_halo_bw_s"] * 1.5
    ex = weak_scaling_projection(h_sa3d, 1e-3, [8],
                                 scale_rows_to=13_000_000)[0]
    assert ex["extrapolated"] and ex["per_shard_rows"] == 13_000_000
    # larger shards amortize comm: efficiency must not drop
    assert ex["projected_efficiency"] >= rows[0]["projected_efficiency"]
