"""Fused RS setup: pairwise-ESC vs Pallas gather_spgemm engine, end-to-end.

The round-4 verdict (item 6) required one committed artifact where
ops/gspgemm.py executes INSIDE device_rs_setup_fused and the setup beats
the pairwise-ESC build of the same hierarchy.  Each engine runs in a fresh
subprocess (PAT_RS_SPGEMM=pairwise|gather) twice: run 1 may pay compiles,
run 2 is the warm number.  Writes artifacts/rs_setup_engines.json.

Usage: python scripts/bench_rs_engines.py [nx]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
import parallel_amg_tpu as pat
from parallel_amg_tpu.problems import poisson2d

nx = int(sys.argv[1])
cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=256,
                    on_device_setup=True, interpolation="extended_i")
csr = poisson2d(nx).to_csr()
times = []
for run in range(2):
    t0 = time.perf_counter()
    h = pat.setup(csr, cfg)
    jax.block_until_ready(h.coarse_inv)
    times.append(round(time.perf_counter() - t0, 2))
b = jnp.asarray(np.random.default_rng(0).normal(size=nx * nx), jnp.float32)
res = pat.amg_pcg(None, h, b, tol=1e-6, maxiter=100)
import json
print(json.dumps({
    "engine": os.environ.get("PAT_RS_SPGEMM"),
    "nx": nx,
    "setup_s_run1": times[0],
    "setup_s_run2_warm": times[1],
    "levels": [l.A.n_rows for l in h.levels],
    "pcg_iters_1e-6": int(res.iters),
    "converged": bool(res.converged),
}), flush=True)
"""


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rows = []
    # "auto" = the production policy (gather on [2^18, 2^19)-row levels);
    # PAT_RS_SPGEMM=gather forced at EVERY level wedges the remote
    # compiler on the 2^20-row kernel (see device_rs._GATHER_MAX_ROWS)
    for engine in ("pairwise", "auto"):
        env = dict(os.environ)
        env["PAT_RS_SPGEMM"] = engine
        t0 = time.perf_counter()
        proc = subprocess.run([sys.executable, "-c", CHILD, str(nx)],
                              env=env, capture_output=True, text=True,
                              timeout=3600)
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode != 0:
            rows.append({"engine": engine, "nx": nx,
                         "error": proc.stderr[-300:]})
            continue
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "rs_setup_engines.json")
    existing = []
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    with open(out, "w") as f:
        json.dump(existing + rows, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
