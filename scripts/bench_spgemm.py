"""SpGEMM engine shootout at the 1024² RS Galerkin shapes (docs/SPGEMM.md).

Builds the REAL level-0 operands (5-pt A, true extended+i P via the fused
setup programs) and times, per engine:
  - ell_spgemm_pairwise (the XLA sort-free ESC, the round-3 production pick)
  - gather_spgemm       (the rank-plane Pallas pipeline, round-4)
at both Galerkin products A·P and R·(AP).  Prints one JSON line last.

Usage: python scripts/bench_spgemm.py [nx] [--phase=ap|rap|all]

The tunnel reproducibly wedges on the first compile issued after a long
marginal-timing run inside one process (three hangs at the same spot), so
the A·P and R·AP phases run in fresh processes; --phase selects one.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    phase = "all"
    for a in sys.argv[1:]:
        if a.startswith("--phase="):
            phase = a.split("=")[1]
    nx = int(args[0]) if args else 1024
    import jax
    import jax.numpy as jnp

    from bench import CACHE_DIR, marginal_time
    import parallel_amg_tpu as pat
    from parallel_amg_tpu.amg.device_rs import (
        classical_strength_mask,
        extended_i_interpolation_device,
        pmis_split_device,
    )
    from parallel_amg_tpu.ops.ell import ELL
    from parallel_amg_tpu.ops.ell_setup import (
        ell_spgemm_pairwise,
        ell_transpose,
    )
    from parallel_amg_tpu.ops.gspgemm import GatherSpgemmPlan, gather_spgemm
    from parallel_amg_tpu.problems import poisson2d

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE_DIR, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    A = ELL.from_csr(poisson2d(nx).to_csr(), dtype=jnp.float32)
    n = A.n_rows

    @jax.jit
    def mk_split(cols, vals, row_nnz):
        Ae = ELL(cols, vals, row_nnz, (n, n))
        S = classical_strength_mask(Ae, 0.25)
        state = pmis_split_device(Ae, S, seed=0)
        nc = jnp.sum((state == 2).astype(jnp.int32))
        return S, state, nc

    S, state, nc = mk_split(A.cols, A.vals, A.row_nnz)
    nc = int(nc)
    P = extended_i_interpolation_device(A, S, state, 4,
                                        static_widths=(4, 4, nc))
    out = {"nx": nx, "n": n, "nc": nc,
           "Wa": A.cols.shape[1], "Wp": P.cols.shape[1]}
    print(f"operands: A {A.shape} W={A.cols.shape[1]}, "
          f"P {P.shape} W={P.cols.shape[1]}", flush=True)

    def fetch_time(label, fn, *args):
        t = marginal_time(fn, *args)
        print(f"{label:34s} {t*1e3:9.2f} ms", flush=True)
        return t

    # ---- A·P -----------------------------------------------------------
    Kap = A.cols.shape[1] * P.cols.shape[1]
    AP_ref = ell_spgemm_pairwise(A, P, out_width=Kap, strict=False)
    w_ap = max(int(jnp.max(AP_ref.row_nnz)), 1)
    out["w_ap"] = w_ap

    t0 = time.perf_counter()
    planA = GatherSpgemmPlan.from_ell(A)
    out["planA_build_s"] = time.perf_counter() - t0
    print(f"plan(A): {out['planA_build_s']:.1f}s "
          f"T={planA.n_pieces} tiles={planA.n_tiles}", flush=True)

    # parity (loud) — host pulls of 1M-row ELLs take minutes through the
    # tunnel, so full entrywise parity runs at probe scales only; at the
    # flagship scale a cheap on-device checksum comparison stands in.
    # COMPILE-ORDER CONSTRAINT: any fresh XLA compile issued after the
    # first pallas_call of the session reproducibly wedges the tunnel
    # (four hangs at the same site, fresh processes included), so the rap
    # phase defers ALL gather/pallas work until its pure-XLA compiles
    # (transpose, pairwise reference + timing) are done.
    if phase == "rap":
        pass
    elif (C_g := gather_spgemm(A, P, out_width=w_ap, plan=planA)) and \
            nx <= 256:
        d = abs(AP_ref.to_csr().to_scipy() - C_g.to_csr().to_scipy())
        assert (d.max() if d.nnz else 0.0) < 1e-4, "A·P parity FAILED"
        print("A·P parity ok", flush=True)
    else:
        s_ref = float(jnp.sum(jnp.abs(AP_ref.vals)))
        s_got = float(jnp.sum(jnp.abs(C_g.vals)))
        n_ref = int(jnp.sum(AP_ref.row_nnz))
        n_got = int(jnp.sum(C_g.row_nnz))
        assert n_ref == n_got and abs(s_ref - s_got) < 1e-3 * abs(s_ref), (
            "A·P checksum mismatch", s_ref, s_got, n_ref, n_got)
        print(f"A·P checksum ok (nnz {n_got}, sum|v| {s_got:.6g})",
              flush=True)

    if phase in ("ap", "all"):
        out["ap_pairwise_s"] = fetch_time(
            "A·P pairwise ESC",
            lambda x, a, b: ell_spgemm_pairwise(
                ELL(a.cols, a.vals * (1 + x * 1e-9), a.row_nnz, a.shape), b,
                out_width=w_ap, strict=False).vals[0, 0],
            jnp.float32(0), A, P)
        out["ap_gather_s"] = fetch_time(
            "A·P Pallas gather",
            lambda x, pl_, b: gather_spgemm(
                None, ELL(b.cols, b.vals * (1 + x * 1e-9), b.row_nnz,
                          b.shape),
                out_width=w_ap, plan=pl_).vals[0, 0],
            jnp.float32(0), planA, P)
        # stage breakdown of the gather pipeline (where does the time go?)
        from parallel_amg_tpu.ops.gspgemm import gather_candidates
        from parallel_amg_tpu.ops.pspgemm import _dedup_call

        out["ap_stage_candidates_s"] = fetch_time(
            "  … candidates (kernel+transpose)",
            lambda x, pl_, b: gather_candidates(
                pl_, ELL(b.cols, b.vals * (1 + x * 1e-9), b.row_nnz,
                         b.shape))[1][0, 0],
            jnp.float32(0), planA, P)
        out["ap_speedup"] = out["ap_pairwise_s"] / out["ap_gather_s"]
    if phase == "ap":
        print(json.dumps(out), flush=True)
        return

    # ---- R·(AP) --------------------------------------------------------
    AP = ELL(AP_ref.cols[:, :w_ap], AP_ref.vals[:, :w_ap], AP_ref.row_nnz,
             AP_ref.shape)
    print("transposing P ...", flush=True)
    # eager ell_transpose dispatches ~20 separate programs through the
    # tunnel (minutes) and a jitted width pre-pass reproducibly WEDGES the
    # tunnel at this point in the session — count columns on host instead
    # (one ~16 MB pull)
    Pc_h = np.asarray(P.cols)
    Pm_h = (np.arange(Pc_h.shape[1])[None, :]
            < np.asarray(P.row_nnz)[:, None])
    t_w = max(int(np.bincount(Pc_h[Pm_h], minlength=P.shape[1]).max()), 1)
    print(f"t_w={t_w} (host)", flush=True)

    # host transpose from the already-pulled P (the jitted ell_transpose
    # compile is the one program the tunnel reproducibly wedges on at the
    # 1M×4 shape; the host build is seconds and numerically identical)
    Pv_h = np.asarray(P.vals)
    rT = Pc_h[Pm_h]
    cT = np.broadcast_to(np.arange(Pc_h.shape[0])[:, None],
                         Pc_h.shape)[Pm_h]
    vT = Pv_h[Pm_h]
    import scipy.sparse as _sp
    R_sp = _sp.csr_matrix((vT, (rT, cT)), shape=(P.shape[1], P.shape[0]))
    from parallel_amg_tpu.ops.csr import CSR as _CSR
    R = ELL.from_csr(_CSR.from_scipy(R_sp), dtype=jnp.float32)
    Kc = R.cols.shape[1] * w_ap
    print(f"R ready (W={R.cols.shape[1]}, Kc={Kc}); pairwise ref ...",
          flush=True)

    @jax.jit
    def pw_ref(Rc, Rv, Rn, Bc, Bv, Bn):
        return ell_spgemm_pairwise(
            ELL(Rc, Rv, Rn, R.shape), ELL(Bc, Bv, Bn, AP.shape),
            out_width=Kc, strict=False)

    Ac_ref = pw_ref(R.cols, R.vals, R.row_nnz, AP.cols, AP.vals, AP.row_nnz)
    w_c = max(int(jnp.max(Ac_ref.row_nnz)), 1)
    print(f"pairwise ref done (w_c={w_c})", flush=True)
    out["Wr"] = R.cols.shape[1]
    out["w_c"] = w_c

    # pairwise TIMING first (its wrapper is the last pure-XLA compile),
    # then every pallas-flavored step
    out["rap_pairwise_s"] = fetch_time(
        "R·AP pairwise ESC",
        lambda x, a, b: ell_spgemm_pairwise(
            ELL(a.cols, a.vals * (1 + x * 1e-9), a.row_nnz, a.shape), b,
            out_width=w_c, strict=False).vals[0, 0], jnp.float32(0), R, AP)

    t0 = time.perf_counter()
    planR = GatherSpgemmPlan.from_ell(R)
    out["planR_build_s"] = time.perf_counter() - t0
    C2 = gather_spgemm(None, AP, out_width=w_c, plan=planR)
    if nx <= 256:
        d2 = abs(Ac_ref.to_csr().to_scipy() - C2.to_csr().to_scipy())
        assert (d2.max() if d2.nnz else 0.0) < 1e-4, "R·AP parity FAILED"
        print("R·AP parity ok", flush=True)
    else:
        s_ref = float(jnp.sum(jnp.abs(Ac_ref.vals)))
        s_got = float(jnp.sum(jnp.abs(C2.vals)))
        n_ref = int(jnp.sum(Ac_ref.row_nnz))
        n_got = int(jnp.sum(C2.row_nnz))
        assert n_ref == n_got and abs(s_ref - s_got) < 1e-3 * abs(s_ref), (
            "R·AP checksum mismatch", s_ref, s_got, n_ref, n_got)
        print(f"R·AP checksum ok (nnz {n_got})", flush=True)

    out["rap_gather_s"] = fetch_time(
        "R·AP Pallas gather",
        lambda x, pl_, b: gather_spgemm(
            None, ELL(b.cols, b.vals * (1 + x * 1e-9), b.row_nnz, b.shape),
            out_width=w_c, plan=pl_).vals[0, 0],
        jnp.float32(0), planR, AP)

    out["rap_speedup"] = out["rap_pairwise_s"] / out["rap_gather_s"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
