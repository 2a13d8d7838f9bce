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
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def marginal_time(step, x0, *args, min_window_s=0.05, reps=3):
    """Median marginal per-iteration wall time of x <- step(x, *args).

    Chains k iterations in one jitted fori_loop (operands as jit ARGS, never
    closure constants - a captured hierarchy would upload gigabytes through
    the remote-compile tunnel).  k is chosen adaptively so the measured
    (k2-k1) window is >= min_window_s, dominating the ~1-2 ms tunnel jitter.
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames="k")
    def run(x, args, k):
        out = jax.lax.fori_loop(0, k, lambda i, a: step(a, *args), x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf.ravel()[:1])

    def once(k):
        return float(run(x0, args, k))

    # rough rate estimate
    once(2)
    t0 = time.perf_counter(); once(2)
    t_round = time.perf_counter() - t0
    once(8)
    t0 = time.perf_counter(); once(8)
    per = max((time.perf_counter() - t0 - t_round) / 6, 1e-6)
    k1 = 8
    k2 = k1 + min(int(min_window_s / per) + 8, 4096)
    once(k2)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); once(k1)
        t1 = time.perf_counter(); once(k2)
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
    """Fine-level SpMV in the selected device format (DIA for the stencil)."""
    import jax.numpy as jnp

    from parallel_amg_tpu.problems import poisson3d
    from parallel_amg_tpu.ops.select import best_format

    log(f"building 3D Poisson {nx}^3 ...")
    A = poisson3d(nx).to_csr()
    n, nnz = A.n_rows, A.nnz
    op = best_format(A)
    x = jnp.ones((n,), jnp.float32)
    # normalized iteration keeps values bounded; the scale fuses into the op
    t = marginal_time(lambda v, o: o.matvec(v) * 0.083333, x, op)
    d = getattr(op, "n_diags", 8)
    bytes_moved = d * n * 4 + 2 * n * 4  # stored planes + x + y
    return {
        "n": n,
        "nnz": nnz,
        "format": type(op).__name__,
        "time_s": t,
        "gbps": bytes_moved / t / 1e9,
        "gnnz_s": nnz / t / 1e9,
    }


def bench_amg(nx=128):
    """Acceptance config #3 at scale: 3D Poisson nx^3, structured block-SA,
    Chebyshev smoothing (BASELINE.json:9) - host setup, jitted device solve."""
    import numpy as np
    import jax.numpy as jnp

    import parallel_amg_tpu as pat
    from parallel_amg_tpu.problems import poisson3d

    log(f"AMG setup 3D Poisson {nx}^3 (structured SA) ...")
    t0 = time.perf_counter()
    cfg = pat.AMGConfig(coarsening="sa", aggregate="block", block_size=2,
                        smoother="chebyshev", n_coarse_max=512)
    h = pat.setup(poisson3d(nx).to_csr(), cfg, dims=(nx, nx, nx))
    setup_s = time.perf_counter() - t0
    n = h.levels[0].A.n_rows
    log(f"  levels: {[l.A.shape[0] for l in h.levels]} "
        f"formats: {[type(l.A).__name__ for l in h.levels]} "
        f"setup {setup_s:.1f}s")
    # grid-native RHS: the structured path runs N-D end-to-end
    b = jnp.asarray(np.random.default_rng(0).normal(size=n),
                    jnp.float32).reshape(h.grid_dims or (n,))
    t_cycle = marginal_time(lambda x, hh, bb: pat.vcycle(hh, x, bb),
                            jnp.zeros_like(b), h, b)
    res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=100)
    nnz = sum(int(np.asarray(l.A.nnz)) for l in h.levels)
    return {
        "n": n,
        "setup_s": setup_s,
        "vcycle_s": t_cycle,
        "vcycle_gnnz_s": nnz / t_cycle / 1e9,
        "cg_iters_1e-6": int(res.iters),
        "converged": bool(res.converged),
    }


def bench_amg_rs(nx=96):
    """Acceptance config #2 shape: 2D Poisson, RS + ext+i, PCG (small scale -
    the RS host setup is the serial oracle; on-device setup lands later)."""
    import numpy as np
    import jax.numpy as jnp

    import parallel_amg_tpu as pat
    from parallel_amg_tpu.problems import poisson2d

    log(f"AMG setup 2D Poisson {nx}^2 (RS) ...")
    t0 = time.perf_counter()
    cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=256)
    h = pat.setup(poisson2d(nx).to_csr(), cfg)
    setup_s = time.perf_counter() - t0
    n = h.levels[0].A.n_rows
    b = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)
    t_cycle = marginal_time(lambda x, hh, bb: pat.vcycle(hh, x, bb),
                            jnp.zeros_like(b), h, b)
    res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=100)
    return {
        "n": n,
        "setup_s": setup_s,
        "vcycle_s": t_cycle,
        "cg_iters_1e-6": int(res.iters),
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
    log("amg_sa3d:", json.dumps(amg))

    amg_rs = bench_amg_rs()
    log("amg_rs2d:", json.dumps(amg_rs))

    details = {"sol_gbps": sol_bw / 1e9, "spmv": spmv, "amg_sa3d": amg,
               "amg_rs2d": amg_rs, "device": str(dev)}
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
