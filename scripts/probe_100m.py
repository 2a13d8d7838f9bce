"""Probe: single-chip on-device structured setup + PCG at >=100M DOF.

Modes:
  python scripts/probe_100m.py [nx]         scalar 3D Poisson (default 468^3)
  python scripts/probe_100m.py --bsr [nx]   BSR config (BASELINE.json:11):
      3-DOF coupled vector Laplacian at nx^3 nodes (default 324^3 =
      102M DOF), fine level STORED and APPLIED as block-ELL BSR in the
      Krylov layer; the V-cycle preconditioner runs on the Kronecker
      hierarchy (the measured structured fast path — see bench_bsr).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PAT_SETUP_VERBOSE", "1")

import numpy as np


def main():
    args = [a for a in sys.argv[1:]]
    bsr_mode = "--bsr" in args
    bf16 = "--bf16" in args
    args = [a for a in args if a not in ("--bsr", "--bf16")]
    nx = int(args[0]) if args else (324 if bsr_mode else 468)
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

    if bsr_mode:
        from parallel_amg_tpu.amg.vector import setup_vector_kron
        from parallel_amg_tpu.ops.bstencil import (
            BSRGridOperator, bsr_from_kron_stencil)
        from parallel_amg_tpu.problems.elasticity import coupled_laplacian

        dims, bs = (nx, nx, nx), 3
        n = nx ** 3 * bs
        print(f"BSR probe: {nx}^3 nodes x {bs} DOF = {n/1e6:.1f}M DOF",
              flush=True)
        t0 = time.perf_counter()
        L, C = coupled_laplacian(dims, bs, 0.3)
        h = setup_vector_kron(L, C, cfg, fine_format="bstencil")
        jax.block_until_ready(h.coarse_inv)
        print(f"setup: {time.perf_counter()-t0:.1f}s  levels:",
              [l.A.n_rows for l in h.levels], flush=True)
        t0 = time.perf_counter()
        # --bf16: store the fine-level BSR value planes in bfloat16 (f32
        # CG vectors / f32 preconditioner).  The f32 operator compile-OOMs
        # by 1.33 GB against the 15.75 GB usable HBM (log in
        # artifacts/probe_100m_bsr.log), and a failed in-process compile
        # leaves the tunnel worker crash-prone, so the precision choice is
        # a fresh-process flag, not a fallback.
        bsr = bsr_from_kron_stencil(
            L, C, dtype=jnp.bfloat16 if bf16 else jnp.float32)
        A = BSRGridOperator(bsr, dims)
        jax.block_until_ready(bsr.vals)
        print(f"BSR fine-level build: {time.perf_counter()-t0:.1f}s "
              f"(vals {bsr.vals_nbytes/1e9:.1f} GB, "
              f"{'bf16' if bf16 else 'f32'})", flush=True)
        # PCG first — the load-bearing claim (config #5's single-chip
        # analog: fine level stored AND applied as BSR at ≥100M DOF); the
        # SpMV timing loop runs last because long chained programs at this
        # memory pressure have crashed the tunnel worker twice
        # HOST-ORCHESTRATED PCG: one jitted CG step per iteration.  The
        # fully-fused amg_pcg while-loop program reproducibly CRASHES the
        # axon tunnel worker at this scale (4 attempts across f32/bf16 and
        # fresh processes — single-step programs run fine, the multi-second
        # fused loop kills the worker), so the probe drives the loop from
        # host: ~6 dispatches/iter × 27 ms tunnel RTT ≈ 2 s overhead
        # against a ~60 s solve.  Local deployments keep the fused loop.
        b = jnp.ones(A.dims, jnp.float32)
        t0 = time.perf_counter()

        # operator/hierarchy ride as jit ARGUMENTS — closure capture embeds
        # their arrays as program constants and the tunnel rejects the
        # multi-GB compile request (HTTP 413)
        @jax.jit
        def cg_init(hh, bb):
            z = pat.vcycle(hh, jnp.zeros_like(bb), bb)
            rz = jnp.vdot(bb.ravel(), z.ravel())
            return z, rz, jnp.linalg.norm(bb.ravel())

        @jax.jit
        def cg_step(op, hh, x, r, p, rz):
            q = op.matvec(p)
            alpha = rz / jnp.vdot(p.ravel(), q.ravel())
            x = x + alpha * p
            r = r - alpha * q
            z = pat.vcycle(hh, jnp.zeros_like(r), r)
            rz_new = jnp.vdot(r.ravel(), z.ravel())
            p = z + (rz_new / rz) * p
            return x, r, p, rz_new, jnp.linalg.norm(r.ravel())

        p0, rz, bnorm = cg_init(h, b)
        bnorm = float(bnorm)
        x, r, p = jnp.zeros_like(b), b, p0
        iters, converged = 0, False
        for it in range(60):
            x, r, p, rz, rnorm = cg_step(A, h, x, r, p, rz)
            iters = it + 1
            if float(rnorm) / bnorm < 1e-6:
                converged = True
                break
        print(f"pcg (A applied as BSR {'bf16' if bf16 else 'f32'}, "
              f"host-orchestrated steps): iters={iters} "
              f"converged={converged} "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        xg = jnp.ones(A.dims, jnp.float32)
        nnzs = 7 * bs * bs * nx ** 3  # upper bound (boundary blocks zero)
        try:
            # short window: a long chained-matvec program at this scale has
            # crashed the tunnel worker ("kernel fault") — and at ~100 ms
            # per pass, dispatch noise is negligible anyway
            t_mv = marginal_time(lambda v, o: o.matvec(v) * 0.1, xg, A,
                                 min_window_s=0.01, reps=2)
            print(f"BSR SpMV: {t_mv*1e3:.1f} ms  "
                  f"(~{nnzs/t_mv/1e9:.1f} Gnnz/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"BSR SpMV timing failed ({e!s:.200})", flush=True)
        return

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
