import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import parallel_amg_tpu as pat
from parallel_amg_tpu.problems import poisson2d
nx = int(sys.argv[1])
cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev", n_coarse_max=256,
                    on_device_setup=True, interpolation="extended_i")
t0 = time.perf_counter()
h = pat.setup(poisson2d(nx).to_csr(), cfg)
jax.block_until_ready(h.coarse_inv)
print(f"RS {nx}^2 TPU fresh setup: {time.perf_counter()-t0:.1f}s levels "
      f"{[l.A.n_rows for l in h.levels]}")
