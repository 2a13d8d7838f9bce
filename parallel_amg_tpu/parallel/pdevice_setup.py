"""Fully ON-DEVICE distributed structured block-SA setup — no host matrix.

This is the setup path for the ≥100M-DOF multi-chip configs
(BASELINE.json:11): the fine operator is born on the accelerators as
row-sharded stencil planes (``poisson_stencil_sharded``), and every level's
Galerkin triple product runs inside ``shard_map`` — each shard computes its
axis-0 slab of the coarse operator from halo-extended local planes
(two ``ppermute`` exchanges per level, the ghost-row pattern of the
reference stack's ``consistent!`` applied to the SETUP phase, SURVEY.md
§3.1 ⟦COMM⟧ rows).  No global matrix ever exists on any host.

Level layout (same as parallel/pstructured.py): grid axis 0 is padded so
every shard owns a whole number of aggregation blocks at every sharded
level; padding rows carry identity diagonals and are masked out of the
tentative aggregates, so they stay exactly zero through the solve.  Once a
coarse level is small enough (``config.agglomerate_n``) or its slab can no
longer split evenly, the (tiny) operator is gathered and the remaining
levels are built replicated with the single-device engine and solved
redundantly on every shard — the coarse-grid agglomeration/re-partitioning
of SURVEY.md §2.1/§2.5.

The slab Galerkin kernel is shared with the single-chip ≥100M path
(amg/device_setup.py `_slab_coarse_operator`): the distributed setting just
sources the slab halos from neighbor shards via ``ppermute`` instead of a
`dynamic_slice` of a resident global array.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from parallel_amg_tpu.amg.device_setup import (
    _jit_dinv,
    _jit_power,
    _slab_coarse_operator,
    device_structured_setup,
    galerkin_out_offsets,
    product_offsets,
    sparsify_stencil,
    symmetrize_stencil,
    zero_plane_keep_mask,
)
from parallel_amg_tpu.amg.hierarchy import Hierarchy, Level
from parallel_amg_tpu.amg.transfers import downsample_sum_nd
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.stencil import Stencil
from parallel_amg_tpu.parallel.mesh import ROW_AXIS, replicated_sharding
from parallel_amg_tpu.parallel.pstencil import ShardedStencil
from parallel_amg_tpu.parallel.pstructured import (
    SBlockProlongator,
    SBlockRestrictor,
)


# ---------------------------------------------------------------------------
# halo exchange of k planes along an arbitrary array axis (inside shard_map)
# ---------------------------------------------------------------------------

def _halo_concat(x, h: int, axis: int):
    """Concatenate h neighbor planes on both ends of ``axis`` (zero planes
    at the domain boundary).  Must run inside shard_map over ROW_AXIS."""
    def take(sl):
        return x[(slice(None),) * axis + (sl,)]

    if h == 0:
        return x
    S = jax.lax.axis_size(ROW_AXIS)
    if S == 1:
        z = jnp.zeros_like(take(slice(0, h)))
        return jnp.concatenate([z, x, z], axis=axis)
    idx = jax.lax.axis_index(ROW_AXIS)
    left = jax.lax.ppermute(take(slice(-h, None)), ROW_AXIS,
                            [(i, i + 1) for i in range(S - 1)])
    left = jnp.where(idx == 0, 0.0, left)
    right = jax.lax.ppermute(take(slice(0, h)), ROW_AXIS,
                             [(i + 1, i) for i in range(S - 1)])
    right = jnp.where(idx == S - 1, 0.0, right)
    return jnp.concatenate([left, x, right], axis=axis)


# ---------------------------------------------------------------------------
# static offset algebra — shared with the single-device engine so the halo
# sizing of the two paths cannot drift (amg/device_setup.product_offsets)
# ---------------------------------------------------------------------------

_product_offsets = product_offsets


# ---------------------------------------------------------------------------
# sharded level step: Galerkin product under shard_map
# ---------------------------------------------------------------------------

def sharded_coarse_operator(A: ShardedStencil, d_inv, coef, scale, cdims,
                            block: int, it: float,
                            true_d0: int) -> ShardedStencil:
    """A_c = Tmᵀ sym(Sᵀ A S) Tm with Tm = block injection masked to the
    true axis-0 extent; each shard produces its own coarse slab."""
    mesh = A.mesh
    nd = len(A.dims)
    b = block
    S_n = mesh.devices.size
    assert A.dims[0] % S_n == 0, (
        f"axis-0 extent {A.dims[0]} must be divisible by the shard count "
        f"{S_n} (pad the grid — see plan_sharded_levels)")
    m0 = A.dims[0] // S_n
    sym_offs = _product_offsets(A.offsets, nd)
    halo = 2 * max(abs(o[0]) for o in sym_offs)
    out_offs = galerkin_out_offsets(sym_offs, b)
    rc = max(abs(o[0]) for o in out_offs)
    assert m0 % b == 0, (
        f"shard slab ({m0} planes) must hold whole blocks of {b}")
    assert halo <= m0, (
        f"setup halo ({halo} planes) exceeds the shard slab ({m0} planes); "
        f"agglomerate earlier (raise config.agglomerate_n)")
    dims_slab = (m0 + 2 * halo,) + A.dims[1:]
    cdims_slab = (m0 // b,) + tuple(cdims[1:])
    offsets = A.offsets

    def kernel(W, d, sc, cf):
        W_ext = _halo_concat(W, halo, 1)
        d_ext = _halo_concat(d, halo, 0)
        sc_ext = _halo_concat(sc, rc, 0)
        g0 = jax.lax.axis_index(ROW_AXIS) * m0 - halo
        gi = g0 + jax.lax.iota(jnp.int32, m0 + 2 * halo)
        mask = ((gi >= 0) & (gi < true_d0)).astype(W.dtype)
        mask = mask.reshape((-1,) + (1,) * (nd - 1))
        return _slab_coarse_operator(
            W_ext, d_ext, sc_ext, cf, jnp.asarray(0, jnp.int32),
            offsets=offsets, dims_slab=dims_slab, cdims_slab=cdims_slab,
            block=b, halo=halo, rc=rc, it=it, mask=mask)

    Wc = jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS), P()),
        out_specs=P(None, ROW_AXIS),
    ))(A.weights, d_inv, scale, coef)
    return ShardedStencil(Wc, tuple(out_offs), tuple(cdims), mesh)


def _sharded_sparsify_sym(A: ShardedStencil, tol: float) -> ShardedStencil:
    """Row-relative drop + lump, then symmetrize — on a sharded stencil.
    Symmetrization pairs W[o](p) with W[-o](p+o), so it needs a 1-reach
    halo of the SPARSIFIED planes (sparsify itself is row-local)."""
    mesh = A.mesh
    nd = len(A.dims)
    offs = sorted(set(A.offsets) | {tuple(-c for c in o) for o in A.offsets})
    h = max(max(abs(o[0]) for o in offs), 0)
    m0 = A.dims[0] // mesh.devices.size
    dims_ext = (m0 + 2 * h,) + A.dims[1:]

    def kernel(W):
        W_ext = _halo_concat(W, h, 1)
        st = Stencil(W_ext, A.offsets, dims_ext)
        st = symmetrize_stencil(sparsify_stencil(st, tol))
        return jax.lax.slice(
            st.weights, (0, h) + (0,) * (nd - 1),
            (st.n_points, h + m0) + dims_ext[1:])

    Wc = jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, ROW_AXIS),), out_specs=P(None, ROW_AXIS),
    ))(A.weights)
    return ShardedStencil(Wc, tuple(offs), A.dims, mesh)


def _sharded_prune(A: ShardedStencil) -> ShardedStencil:
    """Drop globally all-zero offset planes (one tiny host sync)."""
    keep = zero_plane_keep_mask(A.weights, A.offsets, len(A.dims))
    if keep.all():
        return A
    idx = jnp.asarray(np.where(keep)[0])
    W = jnp.take(A.weights, idx, axis=0)
    offs = tuple(o for o, k in zip(A.offsets, keep) if k)
    return ShardedStencil(W, offs, A.dims, A.mesh)


def _fix_pad_diag(A: ShardedStencil, counts) -> ShardedStencil:
    """Identity diagonal on coarse rows whose aggregate holds zero true
    fine cells (pure axis-0 padding blocks)."""
    di = A.offsets.index(tuple(0 for _ in A.dims))
    Wd = jnp.where(counts > 0, A.weights[di], jnp.ones((), A.weights.dtype))
    return ShardedStencil(A.weights.at[di].set(Wd), A.offsets, A.dims,
                          A.mesh)


def _sharded_counts(pdims, true_d0, cdims, block, mesh, dtype):
    """Per-coarse-block count of TRUE fine cells (sharded sum-pool of the
    axis-0 true mask) — both the aggregate normalization and the padding
    detector."""
    nd = len(pdims)
    m0 = pdims[0] // mesh.devices.size
    local_cdims = (cdims[0] // mesh.devices.size,) + tuple(cdims[1:])

    def kernel():
        g0 = jax.lax.axis_index(ROW_AXIS) * m0
        gi = g0 + jax.lax.iota(jnp.int32, m0)
        mask = (gi < true_d0).astype(dtype)
        field = jnp.broadcast_to(
            mask.reshape((-1,) + (1,) * (nd - 1)), (m0,) + tuple(pdims[1:]))
        return downsample_sum_nd(field, local_cdims, block)

    return jax.jit(jax.shard_map(
        kernel, mesh=mesh, in_specs=(), out_specs=P(ROW_AXIS),
    ))()


# ---------------------------------------------------------------------------
# agglomeration-boundary transfers (sharded padded fine ↔ replicated true
# coarse) — the re-partition step of SURVEY.md §2.1
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class SBoundaryProlongator:
    """P across the agglomeration boundary: replicated true-dims coarse
    grid → sharded padded fine grid (zero-pad axis 0, reshard, SBlock P)."""

    def __init__(self, inner: SBlockProlongator, true_cdims):
        self.inner = inner
        self.true_cdims = tuple(int(d) for d in true_cdims)

    def tree_flatten(self):
        return (self.inner,), (self.true_cdims,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def linked(self) -> bool:
        return self.inner.linked

    @property
    def shape(self):
        return (self.inner.shape[0], int(np.prod(self.true_cdims)))

    def zeros_coarse(self, dtype):
        return jnp.zeros(self.true_cdims, dtype)

    def matvec(self, xc):
        return self.matvec_linked(self.inner.A, self.inner.d_inv, xc)

    def matvec_linked(self, A, d_inv, xc):
        pc = self.inner.cdims
        pad = [(0, pc[i] - self.true_cdims[i]) for i in range(len(pc))]
        xp = jnp.pad(xc, pad)
        xp = jax.lax.with_sharding_constraint(
            xp, jax.sharding.NamedSharding(self.inner.mesh, P(ROW_AXIS)))
        return self.inner.matvec_linked(A, d_inv, xp)


@jax.tree_util.register_pytree_node_class
class SBoundaryRestrictor:
    """R across the agglomeration boundary: sharded padded fine residual →
    replicated true-dims coarse rhs (SBlock R, crop, all-gather)."""

    def __init__(self, inner: SBlockRestrictor, true_cdims):
        self.inner = inner
        self.true_cdims = tuple(int(d) for d in true_cdims)

    def tree_flatten(self):
        return (self.inner,), (self.true_cdims,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def linked(self) -> bool:
        return self.inner.linked

    @property
    def shape(self):
        return (int(np.prod(self.true_cdims)), self.inner.shape[1])

    def matvec(self, r):
        return self.matvec_linked(self.inner.A, self.inner.d_inv, r)

    def matvec_linked(self, A, d_inv, r):
        y = self.inner.matvec_linked(A, d_inv, r)
        y = y[tuple(slice(0, t) for t in self.true_cdims)]
        return jax.lax.with_sharding_constraint(
            y, replicated_sharding(self.inner.mesh))


# ---------------------------------------------------------------------------
# device-born sharded problem generators
# ---------------------------------------------------------------------------

def setup_halo_schedule(n_levels: int, block: int, reach0: int = 1):
    """Per-level axis-0 setup halo (planes) from the static offset algebra.

    The slab Galerkin kernel needs halo_l = 2·(axis-0 reach of sym(SᵀAS))
    = 6·r_l planes at level l, and the coarse operator's reach follows the
    Galerkin pooling: r_{l+1} = (b−1+3·r_l)//b (matches
    ``product_offsets`` + ``galerkin_out_offsets`` for a reach-r operator;
    constant 1 at b=3, growing at b=2).
    """
    halos, r = [], reach0
    for _ in range(n_levels):
        halos.append(6 * r)
        r = (block - 1 + 3 * r) // block
    return halos


def plan_sharded_levels(dims, config: AMGConfig, n_shards: int,
                        max_pad_frac: float = 0.2, reach0: int = 1):
    """(n_sharded_levels, padded axis-0 extent) for a grid of ``dims``.

    Keeps a level sharded while it is larger than ``config.agglomerate_n``,
    subject to: whole blocks per shard at every sharded level, slab ≥ the
    setup halo at that level (derived from the triple-product offset
    algebra — ``setup_halo_schedule``), and axis-0 padding ≤ ``max_pad_frac``.
    """
    b = config.block_size
    thresh = max(config.agglomerate_n, config.n_coarse_max)
    # levels that are big enough to be worth sharding
    L, cur = 0, tuple(dims)
    while L < config.max_levels - 1:
        nxt = tuple(-(-d // b) for d in cur)
        if int(np.prod(nxt)) <= thresh:
            break
        L += 1
        cur = nxt
    L = max(L, 1)
    # every sharded level's slab must hold that level's setup halo, and the
    # alignment padding must stay bounded
    while L > 1:
        align = n_shards * b ** L
        d0p = -(-dims[0] // align) * align
        halos = setup_halo_schedule(L, b, reach0)
        slabs_ok = all(
            d0p // (n_shards * b ** l) >= halos[l] for l in range(L))
        if (d0p / dims[0] - 1.0) <= max_pad_frac and slabs_ok:
            break
        L -= 1
    align = n_shards * b ** L
    d0p = -(-dims[0] // align) * align
    return L, d0p


def _sharded_stencil_nd(dims, d0p, mesh, axis_weights, diag_val,
                        dtype=jnp.float32) -> ShardedStencil:
    """Variable-free (2·nd+1)-point operator born sharded: −w_a along each
    axis where the neighbor exists in the TRUE grid, identity diagonal on
    axis-0 padding rows.  One jitted program; never materialized on host."""
    nd = len(dims)
    pdims = (int(d0p),) + tuple(int(d) for d in dims[1:])
    offsets = [tuple(0 for _ in range(nd))]
    for axis in range(nd):
        for sgn in (-1, 1):
            offsets.append(tuple(sgn if i == axis else 0
                                 for i in range(nd)))
    order = sorted(range(len(offsets)), key=lambda i: offsets[i])
    sharding = jax.sharding.NamedSharding(mesh, P(None, ROW_AXIS))

    def gen():
        i0 = jax.lax.broadcasted_iota(jnp.int32, pdims, 0)
        in_true = i0 < dims[0]
        planes = [jnp.where(in_true, jnp.asarray(diag_val, dtype),
                            jnp.ones((), dtype))]
        for axis in range(nd):
            w = axis_weights[axis]
            for sgn in (-1, 1):
                if axis == 0:
                    ok = (i0 > 0) & in_true if sgn < 0 else i0 < dims[0] - 1
                else:
                    ia = jax.lax.broadcasted_iota(jnp.int32, pdims, axis)
                    ok = (ia > 0) if sgn < 0 else (ia < dims[axis] - 1)
                    ok = ok & in_true
                planes.append(jnp.where(ok, jnp.asarray(-w, dtype),
                                        jnp.zeros((), dtype)))
        W = jnp.stack([planes[i] for i in order])
        return jax.lax.with_sharding_constraint(W, sharding)

    W = jax.jit(gen)()
    return ShardedStencil(W, tuple(offsets[i] for i in order), pdims, mesh)


def poisson_stencil_sharded(dims, mesh, config: AMGConfig,
                            dtype=jnp.float32):
    """N-D Dirichlet Laplacian born row-sharded over ``mesh``; returns
    (ShardedStencil on the padded grid, true dims).  Matches
    problems.poisson2d/3d exactly on the true grid."""
    L, d0p = plan_sharded_levels(dims, config, mesh.devices.size)
    nd = len(dims)
    A = _sharded_stencil_nd(dims, d0p, mesh, [1.0] * nd, 2.0 * nd, dtype)
    return A, tuple(int(d) for d in dims)


def anisotropic_stencil_sharded(dims, mesh, config: AMGConfig,
                                epsilon: float = 1e-3, dtype=jnp.float32):
    """2D anisotropic −u_xx − ε u_yy born row-sharded (matches
    problems.anisotropic2d on the true grid)."""
    assert len(dims) == 2
    L, d0p = plan_sharded_levels(dims, config, mesh.devices.size)
    A = _sharded_stencil_nd(dims, d0p, mesh, [1.0, epsilon],
                            2.0 + 2.0 * epsilon, dtype)
    return A, tuple(int(d) for d in dims)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _replicate_tree(x, mesh):
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep) if hasattr(a, "dtype") else a, x)


def sharded_device_setup(A, config: AMGConfig, mesh=None, true_dims=None,
                         dtype=jnp.float32, seed: int = 0) -> Hierarchy:
    """Distributed, fully on-device structured block-SA setup.

    ``A``: a :class:`ShardedStencil` (device-born via
    ``poisson_stencil_sharded`` — ``true_dims`` required), or a host
    :class:`~parallel_amg_tpu.ops.stencil.Stencil` to be padded+sharded
    here (small problems / tests).

    Per level: d⁻¹ and λ_max(D⁻¹A) on the sharded operator, then the slab
    Galerkin kernel under shard_map; once the next level would be smaller
    than ``config.agglomerate_n`` (or its slab can no longer split evenly)
    the operator is gathered (it is tiny by then) and the remaining levels
    are built replicated with the single-device engine.
    """
    assert config.coarsening == "sa" and config.aggregate == "block", (
        "sharded_device_setup implements the structured block-SA path")
    b = config.block_size
    if not isinstance(A, ShardedStencil):
        if hasattr(A, "weights"):
            st = A
        else:
            st = Stencil.from_csr(A if hasattr(A, "indptr")
                                  else A.to_csr(), true_dims, dtype=dtype)
        assert mesh is not None, "mesh required for a host-built operator"
        true_dims = tuple(st.dims)
        L, d0p = plan_sharded_levels(st.dims, config, mesh.devices.size)
        # re-pad axis 0 to the setup alignment (identity pad planes)
        W = np.asarray(st.weights)
        Wp = np.pad(W, [(0, 0), (0, d0p - st.dims[0])]
                    + [(0, 0)] * (len(st.dims) - 1))
        zero = tuple(0 for _ in st.dims)
        if zero in st.offsets:
            Wp[st.offsets.index(zero), st.dims[0]:] = 1.0
        pdims = (d0p,) + st.dims[1:]
        Wd = jax.device_put(
            jnp.asarray(Wp, dtype),
            jax.sharding.NamedSharding(mesh, P(None, ROW_AXIS)))
        A = ShardedStencil(Wd, st.offsets, pdims, mesh)
    else:
        assert true_dims is not None, (
            "true_dims required for a device-born ShardedStencil")
        mesh = A.mesh
    S_n = mesh.devices.size
    thresh = max(config.agglomerate_n, config.n_coarse_max)

    levels: List[Level] = []
    true_d = tuple(int(d) for d in true_dims)
    while len(levels) < config.max_levels - 1:
        d_inv = _jit_dinv(A)
        lam = _jit_power(A, d_inv, iters=config.lambda_power_iters,
                         seed=seed)
        m0 = A.dims[0] // S_n
        sym_offs = _product_offsets(A.offsets, len(A.dims))
        halo = 2 * max(abs(o[0]) for o in sym_offs)
        nxt_true = tuple(-(-t // b) for t in true_d)
        can_shard = (A.dims[0] % S_n == 0 and m0 % b == 0 and halo <= m0
                     and (A.dims[0] // b) % S_n == 0)
        if int(np.prod(true_d)) <= thresh or not can_shard:
            break
        cdims = (A.dims[0] // b,) + tuple(-(-d // b) for d in A.dims[1:])
        counts = _sharded_counts(A.dims, true_d[0], cdims, b, mesh, dtype)
        scale = 1.0 / jnp.sqrt(jnp.maximum(counts, 1.0))
        coef = config.sa_omega / jnp.maximum(lam, 1e-30)
        A_c = sharded_coarse_operator(
            A, d_inv, coef, scale, cdims, b,
            config.setup_intermediate_tol, true_d[0])
        A_c = _fix_pad_diag(A_c, counts)
        if config.coarse_drop_tol > 0:
            A_c = _sharded_sparsify_sym(A_c, config.coarse_drop_tol)
            A_c = _fix_pad_diag(A_c, counts)
        A_c = _sharded_prune(A_c)
        P_dev = SBlockProlongator(None, None, scale, coef, A.dims, cdims,
                                  b, mesh, true_d0=true_d[0])
        R_dev = SBlockRestrictor(None, None, scale, coef, A.dims, cdims,
                                 b, mesh)
        levels.append(Level(A, P_dev, R_dev, d_inv, lam,
                            true_n=int(np.prod(true_d))))
        A = A_c
        true_d = nxt_true

    # gather the (tiny) remaining operator; build the replicated tail with
    # the single-device engine and solve it redundantly on every shard
    W_host = np.asarray(A.weights)[:, : true_d[0]]
    A_rep = Stencil(jnp.asarray(W_host, dtype), A.offsets,
                    (true_d[0],) + tuple(A.dims[1:]))
    tail = device_structured_setup(A_rep, config, dtype=dtype, seed=seed)
    tail_levels = [_replicate_tree(l, mesh) for l in tail.levels]
    coarse_inv = _replicate_tree(tail.coarse_inv, mesh)

    if levels:
        last = levels[-1]
        levels[-1] = Level(
            last.A,
            SBoundaryProlongator(last.P, true_d),
            SBoundaryRestrictor(last.R, true_d),
            last.d_inv, last.lam_max, true_n=last.true_n)
    from parallel_amg_tpu.parallel.pstencil import apply_halo_mode

    return Hierarchy(apply_halo_mode(levels, config.halo_mode) + tail_levels,
                     coarse_inv, config)
