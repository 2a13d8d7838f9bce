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
from functools import partial
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


def galerkin_out_offsets(offsets, block: int):
    """Static coarse offset set of Tᵀ M T given M's fine offsets."""
    nd = len(offsets[0])
    return sorted({
        tuple((rp[i] + o[i]) // block for i in range(nd))
        for o in offsets
        for rp in itertools.product(range(block), repeat=nd)
    })


def galerkin_block(M: Stencil, cdims, block: int, scale,
                   scale_halo0: int = 0) -> Stencil:
    """A_c = Tᵀ M T for normalized block-injection T (scale = 1/√|agg|).

    Residue-class pooled reduction, batched for compile time: per block
    residue rp ONE strided slice extracts all D planes at once, and the
    fine-offset → coarse-offset bucketing (O = floor((rp+o)/b) per axis) is
    a static one-hot matmul.  b^d slices + b^d matmuls total.

    scale_halo0 > 0 means ``scale`` already carries that many halo rows on
    BOTH ends of axis 0 (slab-chunked setup: coarse columns just outside the
    slab have real normalization, not the zero a local pad would give).
    """
    nd = len(M.dims)
    b = block
    D = M.n_points
    fpad = tuple(cdims[i] * b for i in range(nd))
    Wp = jnp.pad(
        M.weights,
        [(0, 0)] + [(0, fpad[i] - M.dims[i]) for i in range(nd)],
    )
    out_offs = galerkin_out_offsets(M.offsets, b)
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
    if scale_halo0:
        assert scale_halo0 >= r[0], "slab scale halo too small"
        scale_int = jax.lax.slice(
            scale, (scale_halo0,) + (0,) * (nd - 1),
            (scale_halo0 + cdims[0],) + tuple(cdims[1:]))
        scale_p = jnp.pad(scale, [(0, 0)]
                          + [(r[i], r[i]) for i in range(1, nd)])
        r0 = scale_halo0
    else:
        scale_int = scale
        scale_p = jnp.pad(scale, [(r[i], r[i]) for i in range(nd)])
        r0 = r[0]
    col_scales = jnp.stack([
        jax.lax.slice(
            scale_p,
            [r0 + o[0]] + [r[i] + o[i] for i in range(1, nd)],
            [r0 + o[0] + cdims[0]]
            + [r[i] + o[i] + cdims[i] for i in range(1, nd)],
        )
        for o in out_offs
    ])
    planes = planes * scale_int[None] * col_scales
    return Stencil(planes, tuple(out_offs), cdims)


def _slab_coarse_operator(W_ext, d_ext, scale_ext, coef, ca, *,
                          offsets, dims_slab, cdims_slab, block, halo,
                          rc, it, mask=None):
    """One axis-0 slab of the Galerkin triple product (jitted once; the
    slab start ``ca`` is a traced arg so every interior slab reuses the
    same executable).

    W_ext/d_ext are the fine operator/diag-inverse padded by ``halo`` rows
    on both ends of axis 0 (and to a whole number of slabs); scale_ext is
    the coarse normalization padded by ``rc`` rows both ends.  Returns the
    slab's coarse planes — exact, because every shift that could touch a
    slab edge stays inside the halo (halo = 2·reach of Sᵀ(A S)).

    ``mask`` (optional, in slab coordinates: shape broadcastable to
    ``dims_slab``) zeroes the rows of M = sym(Sᵀ A S) belonging to
    axis-0 PADDING of a sharded grid before the pooled Galerkin reduction
    — the tentative prolongator then aggregates only true fine cells
    (the distributed setup path, parallel/pdevice_setup.py).  M has no
    true↔padding coupling (padding carries an identity diagonal), so
    masking rows alone reproduces the masked-Tᵀ·M·masked-T product
    exactly.
    """
    nd = len(dims_slab)
    b = block
    D = len(offsets)
    fa = ca * b  # fine-row slab start == padded-coords window start
    Ws = jax.lax.dynamic_slice(
        W_ext, (0, fa) + (0,) * (nd - 1), (D,) + dims_slab)
    ds = jax.lax.dynamic_slice(
        d_ext, (fa,) + (0,) * (nd - 1), dims_slab)
    A_s = Stencil(Ws, offsets, dims_slab)
    S = smoothing_operator(A_s, ds, coef)
    St = smoothing_operator_T(A_s, ds, coef)
    AS = sparsify_stencil(A_s.matmul(S), it)
    M = symmetrize_stencil(sparsify_stencil(St.matmul(AS), it))
    if mask is not None:
        M = Stencil(M.weights * mask[None], M.offsets, M.dims)
    # crop the halo: the galerkin reduction only reads fine rows
    # [halo, halo + cc·b) which are exact
    inner = (cdims_slab[0] * b,) + dims_slab[1:]
    Mc = Stencil(
        jax.lax.slice(
            M.weights, (0, halo) + (0,) * (nd - 1),
            (M.n_points, halo + inner[0]) + dims_slab[1:]),
        M.offsets, inner)
    ssl = jax.lax.dynamic_slice(
        scale_ext, (ca,) + (0,) * (nd - 1),
        (cdims_slab[0] + 2 * rc,) + cdims_slab[1:])
    return galerkin_block(Mc, cdims_slab, b, ssl, scale_halo0=rc).weights


def product_offsets(offsets, nd: int):
    """Static fine-offset set of sym(Sᵀ(A S)) given A's offsets.

    Single source of truth for the triple-product offset algebra — the
    distributed setup (parallel/pdevice_setup.py) sizes its halos from the
    same function so the two paths cannot drift.
    """
    s_offs = sorted(set(offsets) | {tuple(0 for _ in range(nd))})
    as_offs = sorted({tuple(a[i] + s[i] for i in range(nd))
                      for a in offsets for s in s_offs})
    m_offs = sorted({tuple(a[i] + s[i] for i in range(nd))
                     for a in s_offs for s in as_offs})
    return sorted(set(m_offs) | {tuple(-c for c in o) for o in m_offs})


def triple_product_offsets(A: Stencil):
    """Static fine-offset set of sym(Sᵀ(A S)) — sizes the dense path."""
    return product_offsets(A.offsets, len(A.dims))


# Dense-path intermediates above this size risk XLA's memory-pressure
# remat/layout spiral (observed: plane-minor layouts padding size-1 lane
# dims 128×, 47 GB padded from 878 MB unpadded at 4M rows).
_DENSE_SAFE_BYTES = 256 * 2**20


def select_product_path(A: Stencil, config) -> str:
    """Resolve setup_product_path="auto" by estimated intermediate bytes."""
    if config.setup_product_path != "auto":
        return config.setup_product_path
    budget = config.setup_chunk_budget_mb * 2**20
    bpe = A.weights.dtype.itemsize
    dense_bytes = 2 * len(triple_product_offsets(A)) * A.n * bpe
    if dense_bytes <= min(budget, _DENSE_SAFE_BYTES):
        return "dense"
    nd = len(A.dims)
    rA = tuple(max(abs(o[i]) for o in A.offsets) for i in range(nd))
    box3 = _cum_box(tuple(3 * r for r in rA), config.block_size)
    n_planes = int(np.prod([h - l + 1 for l, h in box3]))
    if 3 * n_planes * A.n * bpe <= budget:
        return "bucketed"
    return "slab"


def chunked_coarse_operator(A: Stencil, d_inv, coef, cdims, block: int,
                            scale, it: float, budget_bytes: int) -> Stencil:
    """A_c = Tᵀ Sᵀ A S T computed in axis-0 slabs.

    The unchunked path materializes the ~D_M-plane intermediate Sᵀ(A S) on
    the full fine grid (≈25 GB at 110M DOF) — far over HBM.  Slabbing along
    axis 0 bounds the intermediate to one slab + halo at a time while
    producing bitwise-meaningfully identical coarse operators (each slab's
    halo covers every shift any stage applies).
    """
    nd = len(A.dims)
    b = block
    # static offset algebra: S/Sᵀ offsets = A ∪ {0}; M = Sᵀ·A·S sums
    s_offs = sorted(set(A.offsets) | {tuple(0 for _ in range(nd))})
    as_offs = sorted({tuple(a[i] + s[i] for i in range(nd))
                      for a in A.offsets for s in s_offs})
    m_offs = sorted({tuple(a[i] + s[i] for i in range(nd))
                     for a in s_offs for s in as_offs})
    sym_offs = sorted(set(m_offs) | {tuple(-c for c in o) for o in m_offs})
    r_m0 = max(abs(o[0]) for o in sym_offs)
    halo = 2 * r_m0
    rc = max(abs(o[0]) for o in galerkin_out_offsets(sym_offs, b))
    n_m = len(sym_offs)
    # slab sizing: n_m planes on (cc·b + 2·halo) rows within budget
    row_bytes = int(np.prod(A.dims[1:])) * 4 * n_m
    cc = max(1, (budget_bytes // row_bytes - 2 * halo) // b)
    cc = min(cc, cdims[0])
    n_slabs = -(-cdims[0] // cc)
    # pad fine axis 0: halo front, halo + slab-remainder back
    f0_pad = n_slabs * cc * b
    W_ext = jnp.pad(A.weights, [(0, 0), (halo, halo + f0_pad - A.dims[0])]
                    + [(0, 0)] * (nd - 1))
    d_ext = jnp.pad(d_inv, [(halo, halo + f0_pad - A.dims[0])]
                    + [(0, 0)] * (nd - 1))
    scale_ext = jnp.pad(scale, [(rc, rc + n_slabs * cc - cdims[0])]
                        + [(0, 0)] * (nd - 1))
    dims_slab = (cc * b + 2 * halo,) + A.dims[1:]
    cdims_slab = (cc,) + tuple(cdims[1:])
    slab = partial(
        _jit_slab, offsets=A.offsets, dims_slab=dims_slab,
        cdims_slab=cdims_slab, block=b, halo=halo, rc=rc, it=it)
    parts = []
    for i in range(n_slabs):
        parts.append(slab(W_ext, d_ext, scale_ext, coef,
                          jnp.asarray(i * cc, jnp.int32)))
    planes = jnp.concatenate(parts, axis=1)[:, : cdims[0]]
    out_offs = galerkin_out_offsets(sym_offs, b)
    return Stencil(planes, tuple(out_offs), tuple(cdims))


# ---------------------------------------------------------------------------
# Bucketed ("transfer-first") exact Galerkin — A_c = Tᵀ Sᵀ A S T where every
# intermediate is indexed by COARSE offset O rather than fine offset, so the
# plane count stays at the final operator's (3^d at b=3) instead of growing
# combinatorially (343 fine planes for a 27-point level — the dense path's
# full-grid materialization OOMs there at ≥4M rows).
#
# Representation: X[O](p) = value the fine row p contributes toward coarse
# column B(p)+O, stored as an array of shape box_shape + dims whose leading
# nd axes index O within a static per-axis offset box.
# ---------------------------------------------------------------------------


def _delta_support(off, b: int):
    """Static support of δ(p) = (p%b + off)//b, per axis then product."""
    axes = [sorted({(r + off[i]) // b for r in range(b)})
            for i in range(len(off))]
    return list(itertools.product(*axes))


def _residue_mask(dims, off, delta, b: int, dtype):
    """Indicator of δ_off(p) == delta — a static periodic iota pattern
    (fused by XLA; never materialized standalone)."""
    m = None
    for i in range(len(dims)):
        r = jax.lax.broadcasted_iota(jnp.int32, dims, i) % b
        c = ((r + off[i]) // b) == delta[i]
        m = c if m is None else (m & c)
    return m.astype(dtype)


def _shift_planes(X, off, dims):
    """X[..., p+off] over the trailing grid axes, zero outside the grid."""
    lead = X.ndim - len(dims)
    pads = [(0, 0)] * lead + [(max(0, -off[i]), max(0, off[i]))
                              for i in range(len(dims))]
    Xp = jnp.pad(X, pads)
    start = (0,) * lead + tuple(max(0, off[i]) for i in range(len(dims)))
    return jax.lax.slice(Xp, start,
                         tuple(s + st for s, st in zip(X.shape, start)))


def _cum_box(reach, b: int):
    """True coarse-offset range per axis after total fine shift ≤ reach:
    O = (r + shift)//b with r ∈ [0,b), |shift| ≤ reach (telescoped — the
    naive per-stage δ sum overestimates)."""
    return tuple((-(reach[i]) // b if reach[i] else 0,
                  (b - 1 + reach[i]) // b) for i in range(len(reach)))


def _bucket_stage(factors, offsets, X, box_in, box_out, b: int, dims):
    """Y[O](p) = Σ_off factor_off(p) · X[O − δ_off(p)](p + off).

    Writes landing outside box_out are structurally zero (telescoping of
    block indices) and are dropped by the slice intersection.
    """
    nd = len(dims)
    out_shape = tuple(h - l + 1 for l, h in box_out)
    Y = jnp.zeros(out_shape + tuple(dims), X.dtype)
    for off, fac in zip(offsets, factors):
        Xs = _shift_planes(X, off, dims)
        for delta in _delta_support(off, b):
            tgt, src = [], []
            ok = True
            for i in range(nd):
                lo = max(box_out[i][0], box_in[i][0] + delta[i])
                hi = min(box_out[i][1], box_in[i][1] + delta[i])
                if lo > hi:
                    ok = False
                    break
                tgt.append(slice(lo - box_out[i][0],
                                 hi - box_out[i][0] + 1))
                src.append(slice(lo - delta[i] - box_in[i][0],
                                 hi - delta[i] - box_in[i][0] + 1))
            if not ok:
                continue
            fm = fac * _residue_mask(dims, off, delta, b, X.dtype)
            Y = Y.at[tuple(tgt)].add(
                jnp.expand_dims(fm, tuple(range(nd))) * Xs[tuple(src)])
    return Y


def bucketed_coarse_operator(A: Stencil, d_inv, coef, cdims, block: int,
                             scale) -> Stencil:
    """Exact A_c = Tᵀ Sᵀ A S T with coarse-offset-bucketed intermediates.

    Three bucket stages (S·T seed, A·, Sᵀ·) each keep box_shape·n values —
    e.g. 27·n at b=3 — regardless of the fine stencil's width, then one
    sum-pool reduces rows to the coarse grid.  No intermediate
    sparsification: the plane count cannot grow, so none is needed (the
    result is the EXACT Galerkin operator of the smoothed transfers).
    """
    nd = len(A.dims)
    b = block
    dims = A.dims
    rA = tuple(max(abs(o[i]) for o in A.offsets) for i in range(nd))
    zero = tuple(0 for _ in range(nd))
    box0 = tuple((0, 0) for _ in range(nd))
    box1 = _cum_box(rA, b)                                   # after S·T
    box2 = _cum_box(tuple(2 * r for r in rA), b)             # after A·
    box3 = _cum_box(tuple(3 * r for r in rA), b)             # after Sᵀ·
    dt = A.weights.dtype

    # stage factors (offsets all = A.offsets; 0 must be present)
    d_idx = A.offsets.index(zero)
    s_planes = [-coef * d_inv * A.weights[d]
                for d in range(A.n_points)]
    s_planes[d_idx] = s_planes[d_idx] + 1.0
    st_planes = [-coef * A.weights[d]
                 * _shift_field(d_inv, A.offsets[d], dims)
                 for d in range(A.n_points)]
    st_planes[d_idx] = st_planes[d_idx] + 1.0

    X0 = jnp.ones((1,) * nd + tuple(dims), dt)
    ST = _bucket_stage(s_planes, A.offsets, X0, box0, box1, b, dims)
    AST = _bucket_stage(list(A.weights), A.offsets, ST, box1, box2, b, dims)
    N = _bucket_stage(st_planes, A.offsets, AST, box2, box3, b, dims)

    # row-side Tᵀ: per-plane sum pool to the coarse grid
    pool = jax.lax.reduce_window(
        jnp.pad(N, [(0, 0)] * nd
                + [(0, cdims[i] * b - dims[i]) for i in range(nd)]),
        jnp.zeros((), dt), jax.lax.add,
        (1,) * nd + (b,) * nd, (1,) * nd + (b,) * nd, "VALID",
    )
    out_offs = sorted(itertools.product(
        *[range(box3[i][0], box3[i][1] + 1) for i in range(nd)]))
    nc_planes = pool.reshape((len(out_offs),) + tuple(cdims))
    # tentative normalization (same pattern as galerkin_block)
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
    planes = nc_planes * scale[None] * col_scales
    return Stencil(planes, tuple(out_offs), tuple(cdims))


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


def zero_plane_keep_mask(weights, offsets, nd: int):
    """Host bool mask of offset planes to keep (diagonal always kept).

    One tiny host sync of a norm-per-plane vector; shared between the
    single-device and sharded prune paths.
    """
    norms = np.asarray(jnp.sum(jnp.abs(weights),
                               axis=tuple(range(1, 1 + nd))))
    keep = norms > 0
    keep[offsets.index(tuple(0 for _ in range(nd)))] = True
    return keep


def _prune_zero_planes(A: Stencil) -> Stencil:
    """Drop all-zero offset planes (host sync of a tiny norm vector)."""
    keep = zero_plane_keep_mask(A.weights, A.offsets, len(A.dims))
    if keep.all():
        return A
    return A.prune(keep.tolist())


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


_jit_galerkin = jax.jit(galerkin_block,
                        static_argnames=("cdims", "block", "scale_halo0"))
_jit_slab = jax.jit(
    _slab_coarse_operator,
    static_argnames=("offsets", "dims_slab", "cdims_slab", "block", "halo",
                     "rc", "it"),
)
_jit_bucketed = jax.jit(bucketed_coarse_operator,
                        static_argnames=("cdims", "block"))


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
        it = config.setup_intermediate_tol
        path = select_product_path(A, config)
        _log(f"  products ({path})...")
        if path == "slab":
            # axis-0-slab dense triple product: the full-grid intermediate
            # planes would exceed HBM at this n (BASELINE.json:11 scale)
            A_c = chunked_coarse_operator(
                A, d_inv, coef, cdims, b, scale, it,
                config.setup_chunk_budget_mb * 2**20)
            jax.block_until_ready(A_c.weights)
            _log(f"  slab galerkin done ({A_c.n_points} points)")
        elif path == "bucketed":
            A_c = _jit_bucketed(A, d_inv, coef, cdims, b, scale)
            jax.block_until_ready(A_c.weights)
            _log(f"  bucketed galerkin done ({A_c.n_points} points)")
        else:
            S = _jit_smooth(A, d_inv, coef)
            St = _jit_smooth_T(A, d_inv, coef)
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
        # linked transfers: borrow the level's A/d_inv at apply time so the
        # hierarchy pytree holds the operator once (3× arg copies at 110M
        # DOF otherwise)
        P_dev = BlockProlongator(None, None, scale, coef, dims, cdims, b)
        R_dev = BlockRestrictor(None, None, scale, coef, dims, cdims, b)
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
