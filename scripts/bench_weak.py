"""Weak-scaling proxy stage — run as a CLEAN SUBPROCESS by bench.py.

1→8-shard weak-scaling nnz/s on an 8-virtual-device CPU mesh — the
single-chip proxy for the ≥70% 1→N-host target (BASELINE.json:5).  Fixed
per-shard slab, growing global grid; the sharded-stencil SpMV pays one
ppermute halo per step.  Prints ONE JSON line on stdout.

Runs isolated because mixing the virtual CPU mesh into the TPU-tunnel
bench process wedges later TPU stages (see bench.py note).
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(per_shard=(16, 96, 96)):
    from parallel_amg_tpu.parallel.mesh import ROW_AXIS
    from parallel_amg_tpu.parallel.pstencil import ShardedStencil, _halo_planes
    from parallel_amg_tpu.problems.stencil_problems import poisson_stencil

    def timeit(f, *args):
        jax.block_until_ready(f(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 10)
        return best

    cpus = jax.devices("cpu")
    rates = {}
    halo_fraction = None
    for k in (1, 2, 4, 8):
        mesh = jax.sharding.Mesh(np.array(cpus[:k]), ("rows",))
        dims = (per_shard[0] * k,) + tuple(per_shard[1:])
        A = ShardedStencil.from_stencil(poisson_stencil(dims), mesh)
        x = jax.device_put(jnp.ones(A.dims, jnp.float32),
                           NamedSharding(mesh, P("rows")))
        t = timeit(jax.jit(A.matvec), x)
        rates[k] = 7 * int(np.prod(dims)) / t / 1e9
        print(f"  weak-scaling {k} shards: {rates[k]:.2f} Gnnz/s",
              file=sys.stderr, flush=True)
        if k == 8:
            # comm-fraction proxy: halo exchange alone vs full matvec.
            # Virtual shards share physical cores, so the raw per-shard
            # table under-reports scaling; the comm fraction is the
            # core-count-independent signal (efficiency >= 1 - fraction
            # with overlap disabled; the overlap paths hide part of it).
            def halo_only(xg):
                def kern(xl):
                    lh, rh = _halo_planes(xl, A.halo)
                    return lh + rh
                return jax.shard_map(
                    kern, mesh=mesh,
                    in_specs=P(ROW_AXIS), out_specs=P(ROW_AXIS))(xg)

            t_halo = timeit(jax.jit(halo_only), x)
            halo_fraction = t_halo / t
    # bound the projection model's per-collective latency constant with a
    # measurement (round-4 verdict weak #7: the 2 µs ICI figure was
    # folklore).  A minimal 4-byte-per-shard ppermute on the 8-CPU mesh is
    # an UPPER bound only — virtual shards hop through host threads, real
    # ICI is faster — but it sanity-checks the model's latency axis: the
    # projection stays above target even at this ceiling.
    mesh8 = jax.sharding.Mesh(np.array(cpus[:8]), ("rows",))
    tiny = jax.device_put(jnp.zeros((8, 1), jnp.float32),
                          NamedSharding(mesh8, P("rows")))

    def ring(xg):
        def kern(xl):
            return jax.lax.ppermute(
                xl, "rows", [(i, (i + 1) % 8) for i in range(8)])
        return jax.shard_map(kern, mesh=mesh8,
                             in_specs=P("rows"), out_specs=P("rows"))(xg)

    t_perm = timeit(jax.jit(ring), tiny)
    out = {"per_shard": list(per_shard),
           "gnnz_s": {str(k): round(v, 3) for k, v in rates.items()},
           "efficiency_1_to_8_raw": round(rates[8] / (8 * rates[1]), 3),
           "halo_fraction_8shard": round(halo_fraction, 4),
           "efficiency_proxy": round(1 - halo_fraction, 4),
           "collective_latency_upper_bound_s": t_perm,
           "collective_latency_note": (
               "minimal 8-way ring ppermute wall time on the VIRTUAL CPU "
               "mesh — an upper bound on the projection model's 2 µs ICI "
               "constant (host-thread hops, not ICI)"),
           "note": ("virtual CPU mesh: shards share physical cores, so "
                    "the raw table is a lower bound; halo_fraction is the "
                    "transferable comm-overhead signal")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
