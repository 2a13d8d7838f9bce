"""Probe: single-chip on-device structured setup + PCG at >=100M DOF."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PAT_SETUP_VERBOSE", "1")

import numpy as np

def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 468
    import jax, jax.numpy as jnp
    import parallel_amg_tpu as pat
    from bench import CACHE_DIR, marginal_time
    from parallel_amg_tpu.problems.stencil_problems import poisson_stencil
    from parallel_amg_tpu.amg.hierarchy import with_spmv_backend

    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE_DIR, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("device:", jax.devices()[0], flush=True)

    cfg = pat.AMGConfig(coarsening="sa", aggregate="block", block_size=3,
                        smoother="chebyshev", n_coarse_max=512,
                        on_device_setup=True)
    t0 = time.perf_counter()
    A = poisson_stencil((nx, nx, nx))
    h = pat.setup(A, cfg)
    jax.block_until_ready(h.coarse_inv)
    print(f"setup {nx}^3 = {nx**3/1e6:.1f}M DOF: {time.perf_counter()-t0:.1f}s",
          flush=True)
    print("levels:", [l.A.n_rows for l in h.levels],
          "points:", [l.A.n_points for l in h.levels], flush=True)
    h = with_spmv_backend(h, "mixed")
    b = jnp.ones(h.grid_dims, jnp.float32)
    t_cyc = marginal_time(lambda x, hh, bb: pat.vcycle(hh, x, bb),
                          jnp.zeros_like(b), h, b)
    print(f"vcycle: {t_cyc*1e3:.2f} ms", flush=True)
    t0 = time.perf_counter()
    res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=60)
    print(f"pcg: iters={int(res.iters)} converged={bool(res.converged)} "
          f"{time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
