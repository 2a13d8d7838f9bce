"""On-device AMG setup — structured block-SA path (SURVEY.md §7 Phase 3).

The spec mandates setup-phase SpGEMM and coarsening on device
(BASELINE.json:5).  On regular grids the whole setup pipeline reduces to
stencil algebra, executed as N-D array ops on the accelerator:

- tentative aggregation: pure index arithmetic (block partition) — its only
  data artifact is the aggregate-size normalization, computed by sum-pooling
  a ones-field;
- prolongator smoothing S = I − (ω/λ)D⁻¹A: plane scaling + identity add;
- Galerkin product A_c = Tᵀ (S A S) T: two closed-form stencil products
  (ops/stencil.py matmul) followed by a residue-class pooled reduction —
  for each fine offset o and block residue rp, positions p ≡ rp contribute
  to the single coarse offset floor((rp+o)/b), so the reduction is b^d
  strided slices + adds per plane (no gathers, no sparse SpGEMM);
- λ_max(D⁻¹A): device power iteration;
- sparsification with diagonal lumping, then host-side pruning of all-zero
  planes (one tiny sync per level).

The host only orchestrates shapes; every O(n) operation runs on device.
"""

from __future__ import annotations

import itertools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from parallel_amg_tpu.amg.hierarchy import Hierarchy, Level
from parallel_amg_tpu.amg.transfers import (
    BlockProlongator,
    BlockRestrictor,
    downsample_sum_nd,
)
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.stencil import Stencil


def _shift_field(f, s, dims):
    """field[p + s] with zero fill outside the grid."""
    pads = [(max(0, -s[i]), max(0, s[i])) for i in range(len(dims))]
    fp = jnp.pad(f, pads)
    start = tuple(max(0, s[i]) for i in range(len(dims)))
    return jax.lax.dynamic_slice(fp, start, dims)


def power_iteration_lambda_max(A: Stencil, d_inv, iters: int, seed: int = 0):
    """λ_max(D⁻¹A) estimate on device (1.1 safety factor, as the oracle)."""
    key = jax.random.PRNGKey(seed)
    x0 = jax.random.uniform(key, A.dims, A.weights.dtype) - 0.5

    def body(i, carry):
        x, lam = carry
        y = d_inv * A.matvec(x)
        nrm = jnp.linalg.norm(y)
        lam = jnp.where(nrm > 0, nrm, lam)
        x = y / jnp.maximum(nrm, 1e-30)
        return x, lam

    _, lam = jax.lax.fori_loop(0, iters, body, (x0, jnp.asarray(1.0, x0.dtype)))
    return 1.1 * lam


def smoothing_operator(A: Stencil, d_inv, coef) -> Stencil:
    """S = I − coef·D⁻¹A as a stencil (the prolongator smoother)."""
    planes = -coef * d_inv[None] * A.weights
    S = Stencil(planes, A.offsets, A.dims)
    eye = Stencil(jnp.ones((1,) + A.dims, A.weights.dtype),
                  (tuple(0 for _ in A.dims),), A.dims)
    return eye.add(S)


def smoothing_operator_T(A: Stencil, d_inv, coef) -> Stencil:
    """Sᵀ = I − coef·A·D⁻¹ (A symmetric) — the restriction-side factor."""
    SA = A.scale_cols(d_inv)
    S = Stencil(-coef * SA.weights, SA.offsets, SA.dims)
    eye = Stencil(jnp.ones((1,) + A.dims, A.weights.dtype),
                  (tuple(0 for _ in A.dims),), A.dims)
    return eye.add(S)


def galerkin_block(M: Stencil, cdims, block: int, scale) -> Stencil:
    """A_c = Tᵀ M T for normalized block-injection T (scale = 1/√|agg|).

    Residue-class pooled reduction, batched for compile time: per block
    residue rp ONE strided slice extracts all D planes at once, and the
    fine-offset → coarse-offset bucketing (O = floor((rp+o)/b) per axis) is
    a static one-hot matmul.  b^d slices + b^d matmuls total.
    """
    nd = len(M.dims)
    b = block
    D = M.n_points
    fpad = tuple(cdims[i] * b for i in range(nd))
    Wp = jnp.pad(
        M.weights,
        [(0, 0)] + [(0, fpad[i] - M.dims[i]) for i in range(nd)],
    )
    out_offs = sorted({
        tuple((rp[i] + o[i]) // b for i in range(nd))
        for o in M.offsets
        for rp in itertools.product(range(b), repeat=nd)
    })
    oidx = {o: i for i, o in enumerate(out_offs)}
    n_out = len(out_offs)
    nc = int(np.prod(cdims))
    acc = jnp.zeros((n_out, nc), M.weights.dtype)
    for rp in itertools.product(range(b), repeat=nd):
        piece = jax.lax.slice(
            Wp, (0,) + rp, (D,) + fpad, (1,) + (b,) * nd
        ).reshape(D, nc)
        ids = np.asarray(
            [oidx[tuple((rp[i] + o[i]) // b for i in range(nd))]
             for o in M.offsets], np.int32)
        onehot = (jnp.asarray(ids)[None, :]
                  == jnp.arange(n_out)[:, None]).astype(M.weights.dtype)
        acc = acc + onehot @ piece
    planes = acc.reshape((n_out,) + tuple(cdims))
    # tentative normalization: row and (offset-shifted) column scales —
    # static slices of one padded buffer (vmapped dynamic_slice lowers to a
    # gather whose TPU compile is pathologically slow)
    r = [max(max(abs(o[i]) for o in out_offs), 0) for i in range(nd)]
    scale_p = jnp.pad(scale, [(r[i], r[i]) for i in range(nd)])
    col_scales = jnp.stack([
        jax.lax.slice(
            scale_p,
            [r[i] + o[i] for i in range(nd)],
            [r[i] + o[i] + cdims[i] for i in range(nd)],
        )
        for o in out_offs
    ])
    planes = planes * scale[None] * col_scales
    return Stencil(planes, tuple(out_offs), cdims)


def symmetrize_stencil(A: Stencil) -> Stencil:
    """(A + Aᵀ)/2 for a stencil with a symmetric offset set.

    Row-based drop rules (sparsify) can break symmetry by f32-level
    amounts; near-singular coarse operators then lose SPD-ness and the
    Cholesky coarse solve NaNs.  Aᵀ plane: Aᵀ[p, p+o] = A[p+o, p]
    = w₋ₒ(p+o)."""
    nd = len(A.dims)
    offs = sorted({o for o in A.offsets}
                  | {tuple(-c for c in o) for o in A.offsets})
    planes = []
    for o in offs:
        w = jnp.zeros(A.dims, A.weights.dtype)
        if o in A.offsets:
            w = w + A.weights[A.offsets.index(o)]
        no = tuple(-c for c in o)
        if no in A.offsets:
            # w_{-o} evaluated at p+o (zero outside)
            d = A.offsets.index(no)
            pads = [(max(0, -o[i]), max(0, o[i])) for i in range(nd)]
            wp = jnp.pad(A.weights[d], pads)
            start = tuple(max(0, o[i]) for i in range(nd))
            w = w + jax.lax.dynamic_slice(wp, start, A.dims)
        planes.append(0.5 * w)
    return Stencil(jnp.stack(planes), tuple(offs), A.dims)


def sparsify_stencil(A: Stencil, tol: float) -> Stencil:
    """Drop |w| < tol·rowmax off-diagonal entries, lump onto the diagonal
    (device analog of oracle.sparsify_lumped)."""
    if tol <= 0:
        return A
    zero = tuple(0 for _ in A.dims)
    d_idx = A.offsets.index(zero)
    offd = jnp.ones((A.n_points,), bool).at[d_idx].set(False)
    absw = jnp.abs(A.weights)
    rowmax = jnp.max(jnp.where(offd[:, None].reshape((-1,) + (1,) * len(A.dims)),
                               absw, 0.0), axis=0)
    drop = (absw < tol * rowmax[None]) & offd.reshape((-1,) + (1,) * len(A.dims))
    lump = jnp.sum(jnp.where(drop, A.weights, 0.0), axis=0)
    W = jnp.where(drop, 0.0, A.weights)
    W = W.at[d_idx].add(lump)
    return Stencil(W, A.offsets, A.dims)


def _prune_zero_planes(A: Stencil) -> Stencil:
    """Drop all-zero offset planes (host sync of a tiny norm vector)."""
    norms = np.asarray(jnp.sum(jnp.abs(A.weights), axis=tuple(
        range(1, 1 + len(A.dims)))))
    keep = norms > 0
    zero = tuple(0 for _ in A.dims)
    keep[A.offsets.index(zero)] = True  # always keep the diagonal
    if keep.all():
        return A
    return A.prune(keep.tolist())


from functools import partial

# Piecewise jits: one XLA program per setup stage.  Empirically (v5e via
# remote compile) each stage compiles in seconds while a monolithic
# level-step program hit a superlinear compile-time blowup (>1h at 128³).
_jit_dinv = jax.jit(
    lambda A: jnp.where(A.diagonal() != 0, 1.0 / A.diagonal(), 0.0)
)
_jit_power = jax.jit(power_iteration_lambda_max, static_argnames=("iters",
                                                                  "seed"))
_jit_smooth = jax.jit(smoothing_operator)
_jit_smooth_T = jax.jit(smoothing_operator_T)
_jit_matmul = jax.jit(lambda a, b: a.matmul(b))


@partial(jax.jit, static_argnames=("cdims", "block"))
def _jit_scale(dims_ones, cdims, block):
    counts = downsample_sum_nd(dims_ones, cdims, block)
    return 1.0 / jnp.sqrt(jnp.maximum(counts, 1.0))


_jit_galerkin = jax.jit(galerkin_block, static_argnames=("cdims", "block"))


_jit_sparsify = jax.jit(sparsify_stencil, static_argnames=("tol",))


@partial(jax.jit, static_argnames=("tol",))
def _jit_sparsify_sym(A, tol):
    # for SYMMETRIC operators only (M = S^T A S, A_c): re-symmetrize after
    # the row-based drop; intermediates like A*S are asymmetric and must
    # NOT be symmetrized
    return symmetrize_stencil(sparsify_stencil(A, tol))


def device_structured_setup(A: Stencil, config: AMGConfig,
                            dtype=jnp.float32, seed: int = 0) -> Hierarchy:
    """All-device block-SA setup from a fine-level Stencil operator.

    The host loop only decides shapes and prunes zero planes (one tiny sync
    per level); all O(n) work runs in a handful of jitted stages per level.
    """
    assert config.coarsening == "sa" and config.aggregate == "block", (
        "device_structured_setup implements the structured block-SA path; "
        "use host_setup for the algebraic configurations"
    )
    import os
    import time as _time
    verbose = os.environ.get("PAT_SETUP_VERBOSE") == "1"

    def _log(msg):
        if verbose:
            import sys
            print(f"[setup +{_time.perf_counter()-_t0:.1f}s] {msg}",
                  file=sys.stderr, flush=True)

    _t0 = _time.perf_counter()
    b = config.block_size
    A = Stencil(A.weights.astype(dtype), A.offsets, A.dims)
    levels: List[Level] = []
    for lvl in range(config.max_levels):
        _log(f"level {lvl}: n={A.n} points={A.n_points}")
        d_inv = _jit_dinv(A)
        lam = _jit_power(A, d_inv, iters=config.lambda_power_iters, seed=seed)
        if A.n <= config.n_coarse_max or lvl == config.max_levels - 1:
            levels.append(Level(A, None, None, d_inv, lam))
            break
        dims = A.dims
        cdims = tuple(-(-d // b) for d in dims)
        scale = _jit_scale(jnp.ones(dims, dtype), cdims, b)
        coef = config.sa_omega / jnp.maximum(lam, 1e-30)
        S = _jit_smooth(A, d_inv, coef)
        St = _jit_smooth_T(A, d_inv, coef)
        _log("  products...")
        it = config.setup_intermediate_tol
        AS = _jit_matmul(A, S)
        AS = _prune_zero_planes(_jit_sparsify(AS, it))
        jax.block_until_ready(AS.weights)
        _log(f"  A@S done ({AS.n_points} points)")
        M = _jit_matmul(St, AS)
        M = _prune_zero_planes(_jit_sparsify_sym(M, it))
        jax.block_until_ready(M.weights)
        _log(f"  St@AS done ({M.n_points} points)")
        A_c = _jit_galerkin(M, cdims, b, scale)
        jax.block_until_ready(A_c.weights)
        _log(f"  galerkin done ({A_c.n_points} points)")
        A_c = _prune_zero_planes(
            _jit_sparsify_sym(A_c, config.coarse_drop_tol))
        _log(f"  sparsified -> {A_c.n_points} points")
        P_dev = BlockProlongator(A, d_inv, scale, coef, dims, cdims, b)
        R_dev = BlockRestrictor(A, d_inv, scale, coef, dims, cdims, b)
        levels.append(Level(A, P_dev, R_dev, d_inv, lam))
        A = A_c
    # dense coarse solve operator (tiny — assembled via host round-trip);
    # eigh pseudo-inverse: repeated sparsification can push the coarse
    # spectrum genuinely negative (observed −4%·λ_max at 128³) where a
    # ridge + Cholesky NaNs
    _log("coarse factorization...")
    from parallel_amg_tpu.amg.hierarchy import coarse_inverse_np

    coarse_inv = jnp.asarray(
        coarse_inverse_np(np.asarray(
            levels[-1].A.to_csr().to_dense(), np.float64)),
        jnp.float32,
    )
    _log("done")
    return Hierarchy(levels, coarse_inv, config)
