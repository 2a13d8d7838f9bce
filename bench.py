"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: SpMV effective bandwidth on 3D Poisson (the BW-bound hot op,
BASELINE.json:2,5), with vs_baseline = fraction of the measured memcpy
speed-of-light on this chip (target ≥ 0.80 per BASELINE.json:5).

Timing methodology: the TPU here sits behind a high-latency tunnel
(~27 ms round trip) and ``block_until_ready`` does not synchronize, so every
measurement chains k on-device iterations inside one jitted ``fori_loop``
and reports the marginal time (t(k2)-t(k1))/(k2-k1), synchronized by
fetching a scalar output.

Details (per-op GB/s, nnz/s, V-cycle time, CG iters) go to stderr and
bench_details.json.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def marginal_time(step, x0, k1=4, k2=16, reps=3):
    """Median marginal per-iteration wall time of x ← step(x) on device.

    step must be shape-preserving.  Chains k iterations in one jitted
    fori_loop; sync via scalar fetch (tunnel-latency safe).
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames="k")
    def run(x, k):
        out = jax.lax.fori_loop(0, k, lambda i, a: step(a), x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf.ravel()[:1])

    def once(k):
        return float(run(x0, k))

    once(k1), once(k2)  # compile both variants
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        once(k1)
        t1 = time.perf_counter()
        once(k2)
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return float(np.median(ts))


def measure_memcpy_bw(n_bytes=1 << 30):
    """Speed-of-light proxy: marginal bandwidth of a read+write pass."""
    import jax.numpy as jnp

    n = n_bytes // 4
    x = jnp.ones((n,), jnp.float32)
    t = marginal_time(lambda a: a * 1.0000001 + 1e-9, x)
    return 2 * n * 4 / t


def bench_spmv(nx=128):
    import jax.numpy as jnp

    from parallel_amg_tpu.problems import poisson3d

    log(f"building 3D Poisson {nx}^3 ...")
    A = poisson3d(nx).to_csr()
    n, nnz = A.n_rows, A.nnz
    ell = A.to_ell()
    x = jnp.ones((n,), jnp.float32)
    # normalized iteration keeps values bounded; the scale fuses into the op
    t = marginal_time(lambda v: ell.matvec(v) * 0.083333, x)
    w = ell.width
    bytes_moved = n * w * 8 + n * 8  # ELL planes + x read + y write
    return {
        "n": n,
        "nnz": nnz,
        "width": w,
        "time_s": t,
        "gbps": bytes_moved / t / 1e9,
        "gnnz_s": nnz / t / 1e9,
    }


def bench_amg(nx=96):
    """V-cycle + PCG on 2D Poisson nx² (RS) — host setup, device solve."""
    import jax.numpy as jnp

    import parallel_amg_tpu as pat
    from parallel_amg_tpu.problems import poisson2d

    log(f"AMG setup 2D Poisson {nx}^2 ...")
    t0 = time.perf_counter()
    cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=256)
    h = pat.setup(poisson2d(nx).to_csr().to_scipy(), cfg)
    setup_s = time.perf_counter() - t0
    n = h.levels[0].A.n_rows
    b = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)
    t_cycle = marginal_time(lambda x: pat.vcycle(h, x, b), jnp.zeros_like(b))
    res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=100)
    iters = int(res.iters)
    return {
        "n": n,
        "setup_s": setup_s,
        "vcycle_s": t_cycle,
        "cg_iters_1e-6": iters,
        "converged": bool(res.converged),
    }


def main():
    import jax

    dev = jax.devices()[0]
    log("device:", dev, "platform:", dev.platform)

    sol_bw = measure_memcpy_bw()
    log(f"memcpy speed-of-light: {sol_bw/1e9:.1f} GB/s")

    spmv = bench_spmv()
    log("spmv:", json.dumps(spmv))

    amg = bench_amg()
    log("amg:", json.dumps(amg))

    details = {"sol_gbps": sol_bw / 1e9, "spmv": spmv, "amg": amg,
               "device": str(dev)}
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

    headline = {
        "metric": "spmv_bandwidth_3d_poisson_128",
        "value": round(spmv["gbps"], 2),
        "unit": "GB/s",
        # fraction of measured speed-of-light (target ≥ 0.8)
        "vs_baseline": round(spmv["gbps"] / (sol_bw / 1e9), 4),
    }
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
