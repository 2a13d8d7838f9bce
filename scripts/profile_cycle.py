"""Per-component V-cycle profiler (dev tool).

Times every constituent op of one V(1,1)-cycle at a given scale on the
current default device using bench.py's marginal-time methodology, to show
where cycle time goes vs the SpMV roofline (SURVEY.md §5 tracing/profiling).

Usage: python scripts/profile_cycle.py [nx] [--fresh]
       python scripts/profile_cycle.py --rs [nx]   RS 1024² (config #2)
           per-level breakdown of the DIA/TWELL solve hierarchy
           (VERDICT r3 item 7: explain where the 41 ms V-cycle goes) —
           emits a vcycle_breakdown JSON line as the last stdout line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main_rs():
    """Per-level breakdown of the RS solve hierarchy (DIA/TWELL formats)."""
    import json

    args = [a for a in sys.argv[1:] if a != "--rs"]
    nx = int(args[0]) if args else 1024
    import jax
    import jax.numpy as jnp

    import parallel_amg_tpu as pat
    from bench import CACHE_DIR, marginal_time, _rs_cache_path
    from parallel_amg_tpu.amg import smoothers
    from parallel_amg_tpu.amg.cycle import coarse_solve, _apply_transfer
    from parallel_amg_tpu.amg.hierarchy import with_best_formats
    from parallel_amg_tpu.problems import poisson2d
    from parallel_amg_tpu.utils.checkpoint import load_hierarchy, save_hierarchy

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE_DIR, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev",
                        n_coarse_max=256, on_device_setup=True,
                        interpolation="extended_i")
    cache = _rs_cache_path(nx)
    if os.path.exists(cache):
        h0 = load_hierarchy(cache)
    else:
        h0 = pat.setup(poisson2d(nx).to_csr(), cfg)
        save_hierarchy(cache, h0)
    h = with_best_formats(h0, "tpu", device=True)

    import numpy as np
    rows = []
    print("levels:", [l.A.n_rows for l in h.levels],
          "formats:", [type(l.A).__name__ for l in h.levels], flush=True)

    def t(label, step, x0, *args):
        dt = marginal_time(step, x0, *args)
        print(f"{label:36s} {dt*1e6:10.1f} us", flush=True)
        return dt

    total = 0.0
    for i, lvl in enumerate(h.levels):
        A = lvl.A
        x = jnp.ones((A.n_rows,), jnp.float32)
        b = x * 0.5
        row = {"level": i, "n": A.n_rows, "format": type(A).__name__,
               "nnz": int(np.asarray(A.nnz))}
        row["matvec_us"] = 1e6 * t(
            f"L{i} matvec ({type(A).__name__})",
            lambda v, a: a.matvec(v) * 1.0001, x, A)
        dt = t(f"L{i} smooth x1 (cheb{cfg.cheb_degree})",
               lambda v, l, bb: smoothers.smooth(l, v, bb, cfg, 1), x, lvl, b)
        row["smooth_us"] = 1e6 * dt
        total += 2 * dt
        if lvl.P is not None:
            dt = t(f"L{i} resid+restrict+prolong",
                   lambda v, l: v * 0.999 + _apply_transfer(
                       l.P, l, _apply_transfer(
                           l.R, l, b - l.A.matvec(v))) * 1e-3, x, lvl)
            row["transfer_us"] = 1e6 * dt
            total += dt
        rows.append(row)
    dt = t("coarse solve", lambda v, hh: coarse_solve(hh, v) * 1.0001,
           jnp.ones((h.levels[-1].A.n_rows,), jnp.float32), h)
    total += dt
    print(f"{'sum of parts':36s} {total*1e6:10.1f} us", flush=True)
    b = jnp.asarray(np.random.default_rng(0).normal(
        size=h.levels[0].A.n_rows), jnp.float32)
    t_full = t("full vcycle", lambda v, hh, bb: pat.vcycle(hh, v, bb),
               jnp.zeros_like(b), h, b)
    print(json.dumps({"vcycle_breakdown": rows,
                      "coarse_solve_us": 1e6 * dt,
                      "sum_of_parts_us": 1e6 * total,
                      "full_vcycle_us": 1e6 * t_full}), flush=True)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import jax
    import jax.numpy as jnp

    import parallel_amg_tpu as pat
    from bench import CACHE_DIR, marginal_time
    from parallel_amg_tpu.amg import smoothers
    from parallel_amg_tpu.amg.cycle import coarse_solve, _apply_transfer
    from parallel_amg_tpu.problems.stencil_problems import poisson_stencil
    from parallel_amg_tpu.utils.checkpoint import load_hierarchy, save_hierarchy

    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE_DIR, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    cfg = pat.AMGConfig(coarsening="sa", aggregate="block", block_size=3,
                        smoother="chebyshev", n_coarse_max=512,
                        on_device_setup=True)
    cache = os.path.join(
        CACHE_DIR, f"h_sa3d_{nx}_b{cfg.block_size}_d{cfg.coarse_drop_tol}.pkl")
    if os.path.exists(cache) and "--fresh" not in sys.argv:
        h = load_hierarchy(cache)
    else:
        h = pat.setup(poisson_stencil((nx, nx, nx)), cfg)
        jax.block_until_ready(h.coarse_inv)
        os.makedirs(CACHE_DIR, exist_ok=True)
        save_hierarchy(cache, h)

    print("levels:", [l.A.n_rows for l in h.levels],
          "points:", [getattr(l.A, "n_points", None) for l in h.levels])

    def t(label, step, x0, *args):
        dt = marginal_time(step, x0, *args)
        print(f"{label:34s} {dt*1e6:10.1f} us")
        return dt

    total = 0.0
    for i, lvl in enumerate(h.levels):
        A = lvl.A
        x = jnp.ones(getattr(A, "dims", (A.n_rows,)), jnp.float32)
        t(f"L{i} matvec (D={A.n_points})", lambda v, a: a.matvec(v) * 1.0001,
          x, A)
    for i, lvl in enumerate(h.levels):
        A = lvl.A
        x = jnp.ones(getattr(A, "dims", (A.n_rows,)), jnp.float32)
        b = x * 0.5
        dt = t(f"L{i} smooth x1 (cheb{cfg.cheb_degree})",
               lambda v, l, bb: smoothers.smooth(l, v, bb, cfg, 1), x, lvl, b)
        total += 2 * dt
        if lvl.P is not None:
            # fine-shape carry: residual → restrict → prolong → correct
            # (times both transfer directions plus the residual matvec)
            dt = t(f"L{i} resid+restrict+prolong",
                   lambda v, l: v * 0.999 + _apply_transfer(
                       l.P, l, _apply_transfer(
                           l.R, l, b - l.A.matvec(v))) * 1e-3, x, lvl)
            total += dt
    dt = t("coarse solve", lambda v, hh: coarse_solve(hh, v) * 1.0001,
           jnp.ones(getattr(h.levels[-1].A, "dims",
                            (h.levels[-1].A.n_rows,)), jnp.float32), h)
    total += dt
    print(f"{'sum of parts':34s} {total*1e6:10.1f} us")

    b = jnp.asarray(np.random.default_rng(0).normal(
        size=h.levels[0].A.n_rows), jnp.float32).reshape(h.grid_dims)
    t("full vcycle", lambda v, hh, bb: pat.vcycle(hh, v, bb),
      jnp.zeros_like(b), h, b)


if __name__ == "__main__":
    if "--rs" in sys.argv:
        main_rs()
    else:
        main()
