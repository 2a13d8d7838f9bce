"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: fine-level SpMV throughput (Gnnz/s) on 3D Poisson 128³ in the
flagship Stencil (ND-DIA) format, vs_baseline = achieved fraction of the
memcpy-derived speed-of-light rate for this operator's traffic
(BASELINE.json:5 target: ≥ 0.80).

Also measured (stderr + bench_details.json): V-cycle time and CG iteration
count for the structured block-SA solver at 128³ (acceptance config #3
scale) with ON-DEVICE setup, and the RS path on 2D Poisson (config #2
shape).

Timing methodology: the TPU sits behind a ~27 ms round-trip tunnel and
``block_until_ready`` does not synchronize, so every measurement chains k
on-device iterations inside one jitted ``fori_loop`` (operands as jit args —
closure capture would upload the hierarchy as constants) and reports the
marginal time between two window sizes, synchronized by a scalar fetch.

Setup caching: the on-device setup is compile-bound through the remote
tunnel, so the hierarchy is checkpointed to disk (utils/checkpoint.py) and
reused across bench runs; setup_s reports the fresh-build time when it runs.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

# NOTE: the weak-scaling stage needs 8 virtual CPU devices, but mixing the
# CPU mesh into the TPU-tunnel process reproducibly WEDGED the subsequent
# RS setup stage (observed across rounds 2-3: identical standalone TPU-only
# runs finish in ~380 s while the mixed-backend bench process stalls with
# ~0 CPU for 20+ min).  The stage therefore runs in a clean subprocess
# (bench_weak_scaling below); this process stays TPU-only.

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def with_retry(fn, *args, attempts=3, label="stage", **kwargs):
    """Retry a bench stage on transient tunnel/compile transport failures.

    The TPU sits behind a remote-compile tunnel that occasionally drops the
    connection mid-compile (UNAVAILABLE / broken pipe); the compile cache
    makes a retry cheap, so retry rather than lose the whole bench run.
    """
    for i in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — last attempt re-raises
            transient = any(s in str(e) for s in (
                "UNAVAILABLE", "Broken pipe", "transport",
                "DEADLINE_EXCEEDED", "Connection reset"))
            if i == attempts - 1 or not transient:
                raise
            log(f"{label}: transient failure ({e!s:.200}); "
                f"retry {i + 1}/{attempts - 1}")
            time.sleep(5.0 * (i + 1))


def marginal_time(step, x0, *args, min_window_s=0.05, reps=3):
    """Median marginal per-iteration wall time of x <- step(x, *args)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames="k")
    def run(x, args, k):
        out = jax.lax.fori_loop(0, k, lambda i, a: step(a, *args), x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf.ravel()[:1])

    def once(k):
        return float(run(x0, args, k))

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


def measure_memcpy_bw(n_bytes=1 << 30, reps=3):
    """Speed-of-light proxy: best observed bandwidth of a read+write pass.

    Max over repetitions: the SoL denominator must be the best the chip can
    do, not a tunnel-noise sample (observed 514-746 GB/s run-to-run swings
    with a single measurement).
    """
    import jax.numpy as jnp

    n = n_bytes // 4
    x = jnp.ones((n,), jnp.float32)
    t = min(marginal_time(lambda a: a * 1.0000001 + 1e-9, x)
            for _ in range(reps))
    return 2 * n * 4 / t


def bench_spmv(nx=128):
    """Headline: fine-level stencil SpMV at nx³ (the BW-bound hot op)."""
    import jax.numpy as jnp

    from parallel_amg_tpu.problems.stencil_problems import poisson_stencil

    st = poisson_stencil((nx, nx, nx))
    n = st.n
    nnz = int(np.asarray(st.nnz))
    x = jnp.ones((nx, nx, nx), jnp.float32)
    t = marginal_time(lambda v, op: op.matvec(v) * 0.0833, x, st)
    bytes_moved = st.n_points * n * 4 + 2 * n * 4  # planes + x + y
    return {
        "n": n,
        "nnz": nnz,
        "format": "Stencil",
        "n_points": st.n_points,
        "time_s": t,
        "gbps": bytes_moved / t / 1e9,
        "gnnz_s": nnz / t / 1e9,
    }


def bench_amg(nx=128):
    """Acceptance config #3 at scale: 3D Poisson nx³, structured block-SA,
    Chebyshev, ON-DEVICE setup (BASELINE.json:9) — hierarchy disk-cached."""
    import jax
    import jax.numpy as jnp

    import parallel_amg_tpu as pat
    from parallel_amg_tpu.amg.hierarchy import with_spmv_backend
    from parallel_amg_tpu.problems.stencil_problems import poisson_stencil
    from parallel_amg_tpu.utils.checkpoint import load_hierarchy, save_hierarchy

    os.makedirs(CACHE_DIR, exist_ok=True)
    # block_size=3: 3x-per-axis aggregation closes the coarse stencil
    # (~27 points at every level vs unbounded growth at 2) — near-identical
    # PCG iteration counts with far cheaper setup and coarse levels.
    cfg = pat.AMGConfig(coarsening="sa", aggregate="block", block_size=3,
                        smoother="chebyshev", n_coarse_max=512,
                        on_device_setup=True)
    cache = os.path.join(
        CACHE_DIR, f"h_sa3d_{nx}_b{cfg.block_size}_d{cfg.coarse_drop_tol}.pkl")
    setup_s = None
    if os.path.exists(cache):
        log(f"loading cached hierarchy {cache}")
        h = load_hierarchy(cache)
    else:
        log(f"on-device AMG setup 3D Poisson {nx}^3 (structured SA) ...")
        t0 = time.perf_counter()
        h = pat.setup(poisson_stencil((nx, nx, nx)), cfg)
        jax.block_until_ready(h.coarse_inv)
        setup_s = time.perf_counter() - t0
        save_hierarchy(cache, h)
    # per-level SpMV engine: XLA N-D stencil on the thin fine level, Pallas
    # FlatDIA stream on the fat coarse stencils (2.1× cycle speedup)
    h = with_spmv_backend(h, "mixed")
    n = h.levels[0].A.n_rows
    log(f"  levels: {[l.A.n_rows for l in h.levels]} "
        f"points: {[l.A.n_points for l in h.levels]}")
    b = jnp.asarray(np.random.default_rng(0).normal(size=n),
                    jnp.float32).reshape(h.grid_dims)
    t_cycle = marginal_time(lambda x, hh, bb: pat.vcycle(hh, x, bb),
                            jnp.zeros_like(b), h, b)
    res = pat.amg_pcg(h.levels[0].A, h, b, tol=1e-6, maxiter=100)
    nnz = sum(int(np.asarray(l.A.nnz)) for l in h.levels)

    from parallel_amg_tpu.utils.roofline import (
        cycle_latency_model,
        scaling_projection,
        weak_scaling_projection,
    )
    try:
        collective_model = cycle_latency_model(h, 8)
        scaling_model = scaling_projection(h, t_cycle, [8, 32, 64])
        # the spec's ≥0.70 target names the ≥100M-DOF configuration =
        # CONSTANT per-chip load (weak scaling): project at the measured
        # 128³-per-shard load and extrapolated to ~13M rows/chip
        weak_model = weak_scaling_projection(h, t_cycle, [8, 32, 64])
        weak_model_13m = weak_scaling_projection(
            h, t_cycle, [8, 32, 64], scale_rows_to=13_000_000)
    except Exception as e:  # noqa: BLE001
        collective_model = {"error": f"{e!s:.200}"}
        scaling_model = None
        weak_model = weak_model_13m = None

    # true 1e-8 on the flagship scale (f64 Krylov over the f32 V-cycle)
    cg8 = None
    try:
        res8 = pat.amg_pcg_mp(
            None, h,
            np.random.default_rng(0).normal(size=n).reshape(h.grid_dims),
            tol=1e-8, maxiter=200)
        cg8 = int(res8.iters)
    except Exception as e:  # noqa: BLE001
        log(f"  mp 1e-8 FAILED: {e!s:.300}")

    # bf16 weight planes (mixed precision: f32 vectors/operator, bf16
    # hierarchy) — cast the same hierarchy, no setup rerun
    def cast16(x):
        return x.astype(jnp.bfloat16) if (hasattr(x, "dtype")
                                          and x.dtype == jnp.float32) else x
    h16 = jax.tree_util.tree_map(cast16, h)
    h16 = type(h)(h16.levels, h.coarse_inv, h.config)
    t_cycle16 = marginal_time(lambda x, hh, bb: pat.vcycle(hh, x, bb),
                              jnp.zeros_like(b), h16, b)
    res16 = pat.amg_pcg(h.levels[0].A, h16, b, tol=1e-6, maxiter=100)
    return {
        "n": n,
        "setup_s": setup_s,
        "vcycle_s": t_cycle,
        "vcycle_gnnz_s": nnz / t_cycle / 1e9,
        "cg_iters_1e-6": int(res.iters),
        "converged": bool(res.converged),
        "vcycle_bf16_s": t_cycle16,
        "cg_iters_bf16_precond": int(res16.iters),
        "cg_iters_1e-8": cg8,
        # static per-shard ICI traffic model for an 8-way row-sharded run
        # (scaling-efficiency proxy, VERDICT item 9) — now with latency
        # terms and the N=8/32/64 projection (VERDICT r3 item 8)
        "collective_model_8shard": collective_model,
        "scaling_projection": scaling_model,
        "scaling_projection_weak": weak_model,
        "scaling_projection_weak_13m_per_chip": weak_model_13m,
    }


def bench_bsr(nx=128, bs=3):
    """BSR workload (BASELINE.json:5,11 "BSR blocks"): the 3-DOF coupled
    vector Laplacian at nx³ nodes.  Measures every BSR SpMV engine —
    the general Pallas block-TWELL kernel, the einsum block-ELL reference,
    the structured BlockStencil Kronecker path — and runs AMG-PCG on the
    vector system with the fine level applied as stored BSR."""
    import jax
    import jax.numpy as jnp

    import parallel_amg_tpu as pat
    from parallel_amg_tpu.amg.vector import setup_vector_kron
    from parallel_amg_tpu.ops.bstencil import (
        BlockStencil,
        bsr_from_kron_stencil,
        BSRGridOperator,
    )
    from parallel_amg_tpu.problems.elasticity import coupled_laplacian
    from parallel_amg_tpu.utils.checkpoint import load_pytree, save_pytree

    os.makedirs(CACHE_DIR, exist_ok=True)
    dims = (nx, nx, nx)
    L, C = coupled_laplacian(dims, bs, 0.3)
    n_nodes = int(np.prod(dims))
    n = n_nodes * bs
    out = {"n": n, "bs": bs, "nodes": n_nodes}

    # -- BTWELL (general Pallas BSR kernel); host build is minutes — cached
    from parallel_amg_tpu.ops.btwell import btwell_from_kron_stencil

    cache = os.path.join(CACHE_DIR, f"btwell_{nx}_b{bs}.pkl")
    if os.path.exists(cache):
        bt = load_pytree(cache)
    else:
        bt = btwell_from_kron_stencil(L, C)
        save_pytree(cache, bt)
    nnz = int(np.asarray(bt.nnz))
    out["nnz"] = nnz
    xp = jnp.ones((bs, n_nodes), jnp.float32)
    t_bt = marginal_time(lambda v, o: o.matvec_planes(v) * 0.1, xp, bt)
    out["btwell_spmv_s"] = t_bt
    out["btwell_gnnz_s"] = nnz / t_bt / 1e9
    out["btwell_occupancy"] = nnz / bs ** 2 / (bt.vals.size / bs ** 2)

    # -- einsum block-ELL (the reference formulation)
    bsr = bsr_from_kron_stencil(L, C)
    x1 = jnp.ones((n,), jnp.float32)
    t_e = marginal_time(lambda v, o: o.matvec(v) * 0.1, x1, bsr)
    out["bsr_einsum_spmv_s"] = t_e
    out["bsr_einsum_gnnz_s"] = nnz / t_e / 1e9

    # -- structured Kronecker path (the production recommendation)
    B = BlockStencil(L.weights, L.offsets, L.dims, jnp.asarray(C, jnp.float32))
    xg = jnp.ones(dims + (bs,), jnp.float32)
    t_b = marginal_time(lambda v, o: o.matvec(v) * 0.1, xg, B)
    out["bstencil_spmv_s"] = t_b
    out["bstencil_gnnz_s"] = nnz / t_b / 1e9

    # -- AMG-PCG with the fine level applied as stored BSR
    cfg = pat.AMGConfig(coarsening="sa", aggregate="block", block_size=3,
                        smoother="chebyshev", n_coarse_max=512,
                        on_device_setup=True)
    h = setup_vector_kron(L, C, cfg, fine_format="bstencil")
    A_bsr = BSRGridOperator(bsr, dims)
    b = jnp.asarray(np.random.default_rng(0).normal(size=n),
                    jnp.float32)
    res = pat.amg_pcg(A_bsr, h, b, tol=1e-6, maxiter=100)
    out["cg_iters_1e-6"] = int(res.iters)
    out["converged"] = bool(res.converged)
    gc, oc = h.complexity()
    out["grid_complexity"] = gc
    out["operator_complexity"] = oc
    return out


def bench_amg_rs(nx=1024, degraded=False):
    """Acceptance config #2 at its stated scale: 2D Poisson 1024², classical
    RS (PMIS + ext+i), ON-DEVICE setup, PCG — with f64-oracle iteration
    parity on the SAME matrix and a true-1e-8 mixed-precision count
    (BASELINE.json:8; VERDICT round-1 items 3,4,6).  The hierarchy is
    disk-cached exactly like the SA stage (VERDICT r2 item 1b)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import parallel_amg_tpu as pat
    from parallel_amg_tpu.problems import poisson2d
    from parallel_amg_tpu.utils.checkpoint import load_hierarchy, save_hierarchy

    os.makedirs(CACHE_DIR, exist_ok=True)
    coo = poisson2d(nx)
    # TRUE distance-two extended+i: the only interpolation whose quality
    # holds at this scale (oracle at 1024²: ext+i 7 iters to 1e-6 vs 69 for
    # Jacobi-smoothed direct and 32 for direct — PMIS grids need
    # distance-two interpolation, the reason hypre pairs them).
    cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev",
                        n_coarse_max=256, on_device_setup=True,
                        interpolation="extended_i")
    cache = _rs_cache_path(nx)
    # The fresh on-device setup is MEASURED every run (VERDICT r3 items
    # 1b/4): the fused per-level driver (amg/device_rs.py
    # device_rs_setup_fused) replaces the per-op tunnel dispatch that made
    # this unmeasurable — 65 s warm-compile-cache / ~315 s cold at 1024² on
    # the tunnel TPU.  With a recorded SHAPE SCHEDULE (a few dozen ints of
    # level-width metadata, ~/.cache/parallel_amg_tpu — NO numerical data;
    # every FLOP still executes fresh and the recorded widths are verified
    # against the run's own counters) the driver dispatches all per-level
    # programs asynchronously instead of serializing on width readbacks.
    # setup_s therefore reports schedule-warm time once the schedule
    # exists; first-contact time is the level-serialized number above.
    # The pickle cache remains only as input to the solve-format
    # conversion below.
    log(f"on-device RS setup 2D Poisson {nx}^2 (fused driver) ...")
    t0 = time.perf_counter()
    h = pat.setup(coo.to_csr(), cfg)
    # the setup ends by pulling the coarse operator to host for the dense
    # pseudo-inverse, so the pipeline is synchronized at return
    jax.block_until_ready(h.coarse_inv)
    setup_s = time.perf_counter() - t0
    from parallel_amg_tpu.amg import device_rs as _drs
    setup_path = _drs.LAST_SETUP_PATH
    log(f"  fresh setup_s={setup_s:.1f} ({setup_path})")
    save_hierarchy(cache, h)
    n = h.levels[0].A.n_rows
    log(f"  setup {setup_s}s levels {[l.A.n_rows for l in h.levels]}")
    # solve-path formats: the algebraic setup computes in padded ELL
    # planes, but ELL matvec on TPU pays XLA's serialized gather — convert
    # A/P/R to DIA (banded) / TWELL (Pallas gather kernel) for the solve.
    # The ELL hierarchy stays for the f64 mixed-precision path (TWELL is
    # f32-only).  Conversion runs ON DEVICE (ops/format_device.py) and is
    # re-derived from THIS run's h every time — the host converter pulled
    # every plane through the tunnel (90.7 s in round 4) and reusing a
    # prior run's cached conversion could describe a previous code
    # revision's hierarchy (round-4 advisor finding).
    from parallel_amg_tpu.amg.hierarchy import with_best_formats

    t0 = time.perf_counter()
    h_fast = with_best_formats(h, "tpu", device=True)
    jax.block_until_ready(h_fast.levels[0].A.diags
                          if hasattr(h_fast.levels[0].A, "diags")
                          else h_fast.levels[0].A.vals)
    conversion_s = time.perf_counter() - t0
    log(f"  solve-format conversion {conversion_s:.1f}s (on device)")
    b64 = np.random.default_rng(0).normal(size=n)
    b = jnp.asarray(b64, jnp.float32)
    t_cycle = marginal_time(lambda x, hh, bb: pat.vcycle(hh, x, bb),
                            jnp.zeros_like(b), h_fast, b)
    res = pat.amg_pcg(None, h_fast, b, tol=1e-6, maxiter=100)
    # bf16 value planes (docs/VCYCLE_RS.md lever 2): the cycle is TWELL
    # plane-traffic-bound at 0.02-0.13 occupancy, so halving plane bytes
    # is the one format-level lever left; the TWELL kernel upcasts in VMEM
    out = {
        "n": n,
        "nx": nx,
        "degraded": degraded,
        "setup_s": setup_s,
        "setup_path": setup_path,
        "conversion_s": conversion_s,
        "vcycle_s": t_cycle,
        "cg_iters_1e-6": int(res.iters),
        "converged": bool(res.converged),
    }
    try:
        def cast16(x):
            return (x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x)
        h16 = jax.tree_util.tree_map(cast16, h_fast)
        h16 = type(h_fast)(h16.levels, h_fast.coarse_inv, h_fast.config)
        out["vcycle_bf16_s"] = marginal_time(
            lambda x, hh, bb: pat.vcycle(hh, x, bb),
            jnp.zeros_like(b), h16, b)
        res16 = pat.amg_pcg(None, h16, b, tol=1e-6, maxiter=100)
        out["cg_iters_bf16_precond"] = int(res16.iters)
    except Exception as e:  # noqa: BLE001
        log(f"  bf16 vcycle FAILED: {e!s:.300}")
    try:
        gc, oc = h.complexity()
        out["grid_complexity"] = round(gc, 3)
        out["operator_complexity"] = round(oc, 3)
    except Exception:  # noqa: BLE001
        pass
    try:  # true 1e-8: f64 Krylov vectors over the f32 V-cycle
        res8 = pat.amg_pcg_mp(None, h, b64, tol=1e-8, maxiter=200)
        out["cg_iters_1e-8"] = int(res8.iters)
    except Exception as e:  # noqa: BLE001
        log(f"  mp 1e-8 FAILED: {e!s:.300}")
    try:  # f64 serial oracle on the SAME matrix, SAME algorithm (ext+i)
        from parallel_amg_tpu.oracle.serial_amg import oracle_pcg, oracle_setup
        A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
        t0 = time.perf_counter()
        oh = oracle_setup(A_sp, cfg)
        out["oracle_setup_s"] = time.perf_counter() - t0
        _, oracle_iters, _ = oracle_pcg(A_sp, b64, oh, tol=1e-8, maxiter=200)
        out["oracle_iters_1e-8"] = int(oracle_iters)
    except Exception as e:  # noqa: BLE001
        log(f"  oracle FAILED: {e!s:.300}")
    return out


def bench_anisotropic(nx=1024, epsilon=1e-3):
    """Acceptance config #4 at scale: 2D anisotropic diffusion (ε=1e-3),
    classical strength filtering + Chebyshev smoothing (BASELINE.json:10).
    Same RS/ext+i pipeline as config #2; the weak y-coupling must be dropped
    by strength-of-connection or coarsening quality collapses (VERDICT r3
    weak #8: coverage previously stopped at 32²)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import parallel_amg_tpu as pat
    from parallel_amg_tpu.problems.anisotropic import anisotropic2d
    from parallel_amg_tpu.utils.checkpoint import load_hierarchy, save_hierarchy

    os.makedirs(CACHE_DIR, exist_ok=True)
    coo = anisotropic2d(nx, epsilon=epsilon)
    cfg = pat.AMGConfig(coarsening="rs", smoother="chebyshev",
                        n_coarse_max=256, on_device_setup=True,
                        interpolation="extended_i")
    cache = os.path.join(CACHE_DIR, f"h_aniso2d_{nx}_e{epsilon:g}.pkl")
    setup_s = None
    if os.path.exists(cache):
        log(f"loading cached anisotropic hierarchy {cache}")
        h = load_hierarchy(cache)
    else:
        log(f"on-device RS setup anisotropic {nx}^2 eps={epsilon:g} ...")
        t0 = time.perf_counter()
        h = pat.setup(coo.to_csr(), cfg)
        jax.block_until_ready(h.coarse_inv)
        setup_s = time.perf_counter() - t0
        save_hierarchy(cache, h)
    n = h.levels[0].A.n_rows
    log(f"  setup {setup_s}s levels {[l.A.n_rows for l in h.levels]}")
    from parallel_amg_tpu.amg.hierarchy import with_best_formats

    # HOST conversion here: the anisotropic hierarchy has 8 semi-coarsened
    # levels = ~24 operand shapes, and the device converter's fresh compile
    # wave through the remote tunnel blew the 600 s stage cap twice even
    # with a cached hierarchy (round-5 rehearsal).  The device converter's
    # evidence row is the RS stage (measured every run); this stage's job
    # is config #4's convergence numbers, and at ≤512² the host build is a
    # deterministic ~25 s.
    t0 = time.perf_counter()
    h_fast = with_best_formats(h, "tpu")
    log(f"  solve-format conversion {time.perf_counter() - t0:.1f}s (host)")
    b64 = np.random.default_rng(0).normal(size=n)
    b = jnp.asarray(b64, jnp.float32)
    t_cycle = marginal_time(lambda x, hh, bb: pat.vcycle(hh, x, bb),
                            jnp.zeros_like(b), h_fast, b)
    res = pat.amg_pcg(None, h_fast, b, tol=1e-6, maxiter=150)
    out = {
        "n": n,
        "nx": nx,
        "epsilon": epsilon,
        "setup_s": setup_s,
        "vcycle_s": t_cycle,
        "cg_iters_1e-6": int(res.iters),
        "converged": bool(res.converged),
    }
    try:
        gc, oc = h.complexity()
        out["grid_complexity"] = round(gc, 3)
        out["operator_complexity"] = round(oc, 3)
    except Exception:  # noqa: BLE001
        pass
    try:
        res8 = pat.amg_pcg_mp(None, h, b64, tol=1e-8, maxiter=300)
        out["cg_iters_1e-8"] = int(res8.iters)
    except Exception as e:  # noqa: BLE001
        log(f"  mp 1e-8 FAILED: {e!s:.300}")
    try:
        from parallel_amg_tpu.oracle.serial_amg import oracle_pcg, oracle_setup
        A_sp = sp.csr_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape)
        t0 = time.perf_counter()
        oh = oracle_setup(A_sp, cfg)
        out["oracle_setup_s"] = time.perf_counter() - t0
        _, oracle_iters, _ = oracle_pcg(A_sp, b64, oh, tol=1e-8, maxiter=300)
        out["oracle_iters_1e-8"] = int(oracle_iters)
    except Exception as e:  # noqa: BLE001
        log(f"  oracle FAILED: {e!s:.300}")
    return out


def bench_weak_scaling():
    """1→8-shard weak-scaling proxy, in a CLEAN CPU-only subprocess
    (scripts/bench_weak.py) — mixing the virtual CPU mesh into this
    TPU-tunnel process reproducibly wedged the following RS stage."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "scripts", "bench_weak.py")],
        env=env, capture_output=True, text=True, timeout=600)
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        raise RuntimeError(
            f"weak-scaling child rc={proc.returncode}: "
            f"{proc.stderr[-300:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _rs_cache_path(nx: int) -> str:
    return os.path.join(CACHE_DIR, f"h_rs2d_{nx}_ncm256_xi.pkl")


_T0 = time.perf_counter()
# The driver runs bench.py under a wall-clock timeout (round 2 died at
# rc=124 with the RS-1024² stage mid-flight and everything after it lost).
# Budget all stages against a deadline: expensive stages degrade to a
# smaller scale — a number at reduced scale beats a timeout — and the
# headline prints the moment the SpMV stage lands.
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _remaining() -> float:
    return _BUDGET_S - (time.perf_counter() - _T0)


def _stage_entry(stage: str, nx: int | None = None):
    """Child-process entry: run ONE stage and print its JSON result as the
    last stdout line.  Each stage gets a fresh runtime because a stage
    sequence inside one TPU-tunnel process reproducibly wedges (observed
    rounds 2-3: the RS stage hangs at ~0 CPU after the SA stage's
    mixed-precision pass, while identical fresh-process runs complete)."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE_DIR, "xla"))
    # Cache every executable that takes ≥1 s to compile.  (A threshold-0
    # cache once flooded the dir with thousands of tiny EAGER-op entries
    # whose hits each pay a slow tunnel RPC — but the eager setup path is
    # gone; the fused drivers emit ~21 programs per setup, and at the old
    # 5 s threshold the 1-4 s small-level programs recompiled in EVERY
    # fresh bench process, ~10 s/run of avoidable compiles.)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    log("stage", stage, "device:", dev, "platform:", dev.platform)
    if stage == "core":
        sol_bw = with_retry(measure_memcpy_bw, label="memcpy")
        log(f"memcpy speed-of-light: {sol_bw/1e9:.1f} GB/s")
        spmv = with_retry(bench_spmv, label="spmv")
        out = {"sol_gbps": sol_bw / 1e9, "spmv": spmv}
    elif stage == "amg_sa3d":
        out = bench_amg()
    elif stage == "amg_rs2d":
        out = bench_amg_rs(nx=nx, degraded=nx != 1024)
    elif stage == "bsr":
        out = bench_bsr()
    elif stage == "anisotropic":
        out = bench_anisotropic(nx=nx or 1024)
    else:
        raise SystemExit(f"unknown stage {stage}")
    print(json.dumps(out), flush=True)


def _spawn_stage(stage: str, timeout_s: float, nx: int | None = None):
    """Run a stage in a fresh subprocess with a hard timeout."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--stage", stage]
    if nx is not None:
        cmd += ["--nx", str(nx)]
    log(f"[{stage}] spawning (timeout {timeout_s:.0f}s)")
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        sys.stderr.write((e.stderr or b"").decode("utf-8", "replace")[-4000:]
                         if isinstance(e.stderr, bytes)
                         else (e.stderr or "")[-4000:])
        raise
    sys.stderr.write(proc.stderr[-8000:])
    if proc.returncode != 0:
        raise RuntimeError(f"{stage} child rc={proc.returncode}: "
                           f"{proc.stderr[-300:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main():
    import subprocess

    details = {"budget_s": _BUDGET_S}

    def flush_details():
        details["elapsed_s"] = round(time.perf_counter() - _T0, 1)
        with open("bench_details.json", "w") as f:
            json.dump(details, f, indent=2)

    def stage(name, min_budget_s, cap_s, nx=None, retries=1,
              nx_fallbacks=()):
        """Subprocess stage with budget floor, hard timeout, one retry
        (a fresh process heals transient tunnel wedges).

        nx_fallbacks: scales to DEGRADE to on each retry — a number at
        reduced scale beats a timeout.  Round 4 reran anisotropic-1024²
        into an 85 s budget and recorded nothing; the retry must shrink
        the problem, not just the clock.
        """
        if _remaining() < min_budget_s:
            log(f"{name}: SKIPPED ({_remaining():.0f}s left < "
                f"{min_budget_s}s floor)")
            details[name] = {"skipped": True,
                            "remaining_s": round(_remaining(), 1)}
            flush_details()
            return None
        timeout_s = max(min(cap_s, _remaining() - 30), 60)
        fallbacks = list(nx_fallbacks)
        for attempt in range(retries + 1):
            try:
                details[name] = _spawn_stage(name, timeout_s, nx=nx)
                log(f"{name}:", json.dumps(details[name]))
                flush_details()
                return details[name]
            except subprocess.TimeoutExpired:
                log(f"{name}: TIMED OUT after {timeout_s:.0f}s "
                    f"(attempt {attempt + 1}, nx={nx})")
                details[name] = {"timeout_s": timeout_s, "nx": nx}
            except Exception as e:  # noqa: BLE001
                log(f"{name} FAILED: {e!s:.500}")
                details[name] = {"error": f"{e!s:.300}", "nx": nx}
            flush_details()
            if fallbacks and nx is not None:
                nx = fallbacks.pop(0)
                log(f"{name}: degrading to nx={nx} for the retry")
            timeout_s = max(min(cap_s, _remaining() - 30), 60)
            if _remaining() < min_budget_s:
                break
        return None

    headline = None
    core = stage("core", 90, 600)
    if core:
        sol_bw = core["sol_gbps"] * 1e9
        spmv = core["spmv"]
        # headline FIRST (stdout) — later stages only append to the details
        # file; a failure or timeout after this point cannot lose it.  It is
        # ALSO re-printed as the very last stdout line of main() because the
        # driver parses the LAST line (rounds 2-3 recorded parsed: null).
        bytes_per_nnz = (spmv["n_points"] * spmv["n"] * 4
                         + 2 * spmv["n"] * 4) / spmv["nnz"]
        sol_gnnz = core["sol_gbps"] / bytes_per_nnz
        headline = json.dumps({
            "metric": "spmv_gnnz_per_s_3d_poisson_128_stencil",
            "value": round(spmv["gnnz_s"], 2),
            "unit": "Gnnz/s",
            "vs_baseline": round(spmv["gnnz_s"] / sol_gnnz, 4),
        })
        print(headline, flush=True)

    # cheap-first order: weak-scaling is a CPU subprocess; SA is
    # hierarchy-cached; RS degrades by scale; BSR runs last.
    try:
        details["weak_scaling"] = bench_weak_scaling()
        log("weak_scaling:", json.dumps(details["weak_scaling"]))
    except Exception as e:  # noqa: BLE001
        log(f"weak_scaling FAILED: {e!s:.500}")
        details["weak_scaling"] = {"error": f"{e!s:.300}"}
    flush_details()

    stage("amg_sa3d", 120, 900)

    # RS scale selection: the fused setup is measured fresh every run
    # (65 s warm / ~315 s cold XLA cache at 1024²); degrade only when the
    # remaining budget cannot cover a cold run + solves.
    nx = 1024 if _remaining() > 500 else (512 if _remaining() > 250 else 256)
    stage("amg_rs2d", 60, 900, nx=nx, nx_fallbacks=(512, 256))

    stage("bsr", 120, 900)

    # anisotropic config #4: run the LARGEST pre-seeded scale (the setup is
    # cache-able exactly like RS/SA; scripts/ pre-seeds 512²/1024² outside
    # the driver window); a fresh-cold 1024² is ~2 compile-bound minutes per
    # level through the tunnel and provably does not fit 600 s (round 4
    # timed out twice) — start fresh runs at 512² and degrade on retry.
    nx_a = next((s for s in (1024, 512, 256) if os.path.exists(
        os.path.join(CACHE_DIR, f"h_aniso2d_{s}_e0.001.pkl"))), None)
    if nx_a is None:
        nx_a = 512 if _remaining() > 400 else 256
    stage("anisotropic", 60, 600, nx=nx_a, nx_fallbacks=(512, 256, 128))
    log(f"bench complete in {time.perf_counter() - _T0:.0f}s")
    if headline is not None:
        # The driver parses the LAST stdout line as the machine-readable
        # headline — keep this print final, after every stage.
        print(headline, flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None)
    ap.add_argument("--nx", type=int, default=None)
    a = ap.parse_args()
    if a.stage:
        _stage_entry(a.stage, nx=a.nx)
    else:
        main()
