"""At-scale distributed RS proof on the 8-shard virtual CPU mesh
(VERDICT r3 item 6: the distributed setup was only ever exercised at 256
rows — run it at 128²–512², record hierarchy quality vs single-device).

Writes ONE JSON line per size and a combined artifact to
artifacts/distributed_rs_cpu8.json:
  levels (true rows), grid/operator complexity (true rows), distributed
  PCG iters vs single-device iters, setup wall seconds, and the implicit
  overflow certificate (assembly raises loudly on any ghost/width/send
  overflow, so completion means every counter was zero).

Usage: python scripts/bench_distributed.py [--sizes 128,256,512] [--sa]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np


def main():
    sizes = [128, 256, 512]
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(s) for s in a.split("=")[1].split(",")]
    sa_mode = "--sa" in sys.argv

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    jax.config.update("jax_platforms", "cpu")
    import parallel_amg_tpu as pat
    from parallel_amg_tpu.config import AMGConfig
    from parallel_amg_tpu.parallel import make_row_mesh, pvector, to_global
    from parallel_amg_tpu.parallel.pcsr import PCSR
    from parallel_amg_tpu.parallel.psetup import distributed_setup
    from parallel_amg_tpu.problems import poisson2d

    assert jax.device_count() >= 8, "need the 8-device virtual CPU mesh"
    mesh = make_row_mesh(8)
    results = []
    for nx in sizes:
        coo = poisson2d(nx)
        A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
        n = A_sp.shape[0]
        if sa_mode:
            cfg = AMGConfig(coarsening="sa", smoother="chebyshev",
                            n_coarse_max=256, on_device_setup=True,
                            coarse_drop_tol=0.0)
        else:
            cfg = AMGConfig(coarsening="rs", smoother="chebyshev",
                            n_coarse_max=256, on_device_setup=True,
                            interpolation="extended_i")
        t0 = time.perf_counter()
        h = distributed_setup(A_sp, cfg, mesh)
        setup_s = time.perf_counter() - t0
        setup_warm_s = None
        if "--split" in sys.argv:
            # trace/compile vs execute split (round-4 verdict weak #8: the
            # CPU-mesh wall times were unsplit, leaving the real-chip
            # distributed setup cost unknown).  A second in-process run
            # reuses every jitted program, so run 2 ≈ pure execution and
            # run1 − run2 ≈ trace+compile.
            t0 = time.perf_counter()
            h = distributed_setup(A_sp, cfg, mesh)
            setup_warm_s = time.perf_counter() - t0
        gc, oc = h.complexity()
        part = h.levels[0].A.row_partition
        bh = np.random.default_rng(0).normal(size=n)
        b = pvector(bh, part, mesh)
        res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=100)
        x = to_global(res.x, part)
        rel = float(np.linalg.norm(bh - A_sp @ x.astype(np.float64))
                    / np.linalg.norm(bh))

        # single-device reference hierarchy on the same matrix
        h_s = pat.setup(coo.to_csr(), cfg)
        res_s = pat.amg_pcg(None, h_s, jnp.asarray(bh, jnp.float32),
                            tol=1e-6, maxiter=100)
        gc_s, oc_s = h_s.complexity()

        row = {
            "nx": nx, "n": n, "shards": 8,
            "coarsening": cfg.coarsening,
            "levels_true": [l.n for l in h.levels],
            "grid_complexity": round(gc, 3),
            "operator_complexity": round(oc, 3),
            "setup_s": round(setup_s, 1),
            "setup_warm_s": (round(setup_warm_s, 1)
                             if setup_warm_s is not None else None),
            "setup_compile_s_est": (round(setup_s - setup_warm_s, 1)
                                    if setup_warm_s is not None else None),
            "pcg_iters": int(res.iters),
            "converged": bool(res.converged),
            "true_residual_rel": rel,
            "single_device_iters": int(res_s.iters),
            "single_device_complexity": [round(gc_s, 3), round(oc_s, 3)],
            "overflow_counters_zero": True,  # assembly raises otherwise
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    name = "distributed_sa_cpu8.json" if sa_mode else "distributed_rs_cpu8.json"
    path = os.path.join(out_dir, name)
    # merge by nx — a --sizes 1024 run must not clobber the 128-512 rows
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            for row in json.load(f):
                merged[row["nx"]] = row
    for row in results:
        merged[row["nx"]] = row
    with open(path, "w") as f:
        json.dump([merged[k] for k in sorted(merged)], f, indent=2)
    print(f"wrote artifacts/{name}", flush=True)


if __name__ == "__main__":
    main()
