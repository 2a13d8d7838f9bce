"""Probe: fresh fused on-device RS setup timing on the current backend.

Usage: python scripts/probe_rs_fused.py NX [--solve]
Writes one line: setup seconds + level sizes (+ PCG iters with --solve).
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
import parallel_amg_tpu as pat
from parallel_amg_tpu.problems import poisson2d

nx = int(sys.argv[1])
cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=256,
                    on_device_setup=True, interpolation="extended_i")
csr = poisson2d(nx).to_csr()
runs = 2 if "--twice" in sys.argv else 1
for run in range(runs):
    t0 = time.perf_counter()
    h = pat.setup(csr, cfg)
    jax.block_until_ready(h.coarse_inv)
    dt = time.perf_counter() - t0
    print(f"RS {nx}^2 fused fresh setup (run {run + 1}): {dt:.1f}s levels "
          f"{[l.A.n_rows for l in h.levels]} widths "
          f"{[l.A.cols.shape[1] for l in h.levels]}", flush=True)
if "--solve" in sys.argv:
    n = nx * nx
    b = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)
    res = pat.amg_pcg(None, h, b, tol=1e-6, maxiter=100)
    print(f"PCG iters {int(res.iters)} converged {bool(res.converged)}",
          flush=True)
