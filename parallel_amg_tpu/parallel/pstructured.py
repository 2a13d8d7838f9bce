"""Distributed structured-SA hierarchy: sharded stencils + local transfers.

Layout strategy (the TPU-native replacement for the reference's ghost-map
machinery on structured problems): the grid's axis 0 is padded to
S·b^(L-1)·k before sharding, so every shard owns a whole number of
aggregation blocks at *every* level.  Consequences:

- A-matvec needs only an h-plane halo exchange (two ppermutes,
  parallel/pstencil.py);
- P/R (block upsample / sum-pool) are entirely shard-local — zero
  communication in the transfer operators;
- dots/norms psum automatically over the sharded axis.

Padding planes carry identity diagonals (A), d_inv = 1, aggregate scale = 0,
and zero RHS — numerically inert through the whole cycle.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from parallel_amg_tpu.amg.hierarchy import Hierarchy, Level
from parallel_amg_tpu.amg.transfers import downsample_sum_nd, upsample_nd
from parallel_amg_tpu.config import AMGConfig
from parallel_amg_tpu.ops.csr import CSR
from parallel_amg_tpu.ops.stencil import Stencil
from parallel_amg_tpu.parallel.mesh import ROW_AXIS, replicated_sharding
from parallel_amg_tpu.parallel.pstencil import ShardedStencil


def _grid_sharding(mesh):
    return jax.sharding.NamedSharding(mesh, P(ROW_AXIS))


@jax.tree_util.register_pytree_node_class
class SBlockProlongator:
    """Sharded P @ xc = (I − coef·D⁻¹A) upsample(xc · scale); all-local
    upsample (axis-0 blocks are shard-aligned), halo only inside A.matvec.

    Pass A=None/d_inv=None for a LINKED transfer that borrows the level's
    operator at apply time (amg/cycle.py `_apply_transfer`) so the
    hierarchy pytree holds the fine operator exactly once.

    ``true_d0`` (optional): true (unpadded) axis-0 extent of the fine grid.
    When set, the tentative upsample is masked to the true rows, keeping
    axis-0 padding cells exactly zero through the whole cycle — required by
    the on-device distributed setup (parallel/pdevice_setup.py), whose
    coarse Galerkin operators aggregate only true fine cells.
    """

    def __init__(self, A, d_inv, scale, coef, dims, cdims, block, mesh,
                 true_d0=None):
        self.A = A
        self.d_inv = d_inv
        self.scale = scale
        self.coef = coef
        self.dims = tuple(dims)     # padded fine dims
        self.cdims = tuple(cdims)   # padded coarse dims
        self.block = int(block)
        self.mesh = mesh
        self.true_d0 = None if true_d0 is None else int(true_d0)

    def tree_flatten(self):
        return ((self.A, self.d_inv, self.scale, self.coef),
                (self.dims, self.cdims, self.block, self.mesh,
                 self.true_d0))

    @classmethod
    def tree_unflatten(cls, aux, children):
        A, d_inv, scale, coef = children
        return cls(A, d_inv, scale, coef, *aux)

    @property
    def linked(self) -> bool:
        return self.A is None

    @property
    def shape(self):
        return (int(np.prod(self.dims)), int(np.prod(self.cdims)))

    def zeros_coarse(self, dtype):
        return jax.lax.with_sharding_constraint(
            jnp.zeros(self.cdims, dtype), _grid_sharding(self.mesh)
        )

    def matvec(self, xc):
        return self.matvec_linked(self.A, self.d_inv, xc)

    def matvec_linked(self, A, d_inv, xc):
        block, dims, true_d0 = self.block, self.dims, self.true_d0
        local_fine = (dims[0] // self.mesh.devices.size,) + dims[1:]

        def up_local(xl, sl):
            t = upsample_nd(xl * sl, local_fine, block)
            if true_d0 is not None:
                g0 = jax.lax.axis_index(ROW_AXIS) * local_fine[0]
                gi = g0 + jax.lax.iota(jnp.int32, local_fine[0])
                mask = (gi < true_d0).astype(t.dtype)
                t = t * mask.reshape((-1,) + (1,) * (len(dims) - 1))
            return t

        t = jax.shard_map(
            up_local, mesh=self.mesh,
            in_specs=(P(ROW_AXIS), P(ROW_AXIS)),
            out_specs=P(ROW_AXIS),
        )(xc, self.scale)
        return t - self.coef * (d_inv * A.matvec(t))


@jax.tree_util.register_pytree_node_class
class SBlockRestrictor:
    """Sharded R @ r = scale · downsample(r − coef·A(D⁻¹ r)).

    Supports the same linked (A=None) mode as :class:`SBlockProlongator`.
    No true-extent mask is needed on the restriction side: with zero RHS
    and zero iterates on padding rows (the prolongator's mask invariant)
    the residual is identically zero there.
    """

    def __init__(self, A, d_inv, scale, coef, dims, cdims, block, mesh,
                 true_d0=None):
        self.A = A
        self.d_inv = d_inv
        self.scale = scale
        self.coef = coef
        self.dims = tuple(dims)
        self.cdims = tuple(cdims)
        self.block = int(block)
        self.mesh = mesh
        self.true_d0 = None if true_d0 is None else int(true_d0)

    def tree_flatten(self):
        return ((self.A, self.d_inv, self.scale, self.coef),
                (self.dims, self.cdims, self.block, self.mesh,
                 self.true_d0))

    @classmethod
    def tree_unflatten(cls, aux, children):
        A, d_inv, scale, coef = children
        return cls(A, d_inv, scale, coef, *aux)

    @property
    def linked(self) -> bool:
        return self.A is None

    @property
    def shape(self):
        return (int(np.prod(self.cdims)), int(np.prod(self.dims)))

    def matvec(self, r):
        return self.matvec_linked(self.A, self.d_inv, r)

    def matvec_linked(self, A, d_inv, r):
        block, cdims = self.block, self.cdims
        local_coarse = (cdims[0] // self.mesh.devices.size,) + cdims[1:]

        s = r - self.coef * A.matvec(d_inv * r)

        def down_local(sl, scl):
            return scl * downsample_sum_nd(sl, local_coarse, block)

        return jax.shard_map(
            down_local, mesh=self.mesh,
            in_specs=(P(ROW_AXIS), P(ROW_AXIS)),
            out_specs=P(ROW_AXIS),
        )(s, self.scale)


def _pad_axis0(arr, d0p, fill=0.0):
    """Pad a numpy array's axis 0 to d0p with a constant."""
    pad = [(0, d0p - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


def structured_distributed_setup(A, config: AMGConfig, mesh, dims,
                                 dtype=jnp.float32, seed: int = 0) -> Hierarchy:
    """Host setup → sharded all-stencil hierarchy over the 'rows' mesh."""
    from parallel_amg_tpu.oracle.serial_amg import oracle_setup

    if isinstance(A, CSR):
        A_sp = A.to_scipy()
    elif hasattr(A, "to_csr"):
        A_sp = A.to_csr().to_scipy()
    else:
        A_sp = A
    assert config.coarsening == "sa" and config.aggregate == "block", (
        "structured_distributed_setup requires the block-SA configuration"
    )
    oh = oracle_setup(A_sp, config, seed=seed, dims=dims)
    S = mesh.devices.size
    b = config.block_size
    # number of levels whose grids must be block+shard aligned
    L = len(oh.levels)
    align = S * b ** (L - 1)
    d0 = dims[0]
    d0p0 = -(-d0 // align) * align

    # per-level padded dims
    level_dims: List[tuple] = []
    cur = (d0p0,) + tuple(dims[1:])
    true_cur = tuple(dims)
    for i, ol in enumerate(oh.levels):
        level_dims.append(cur)
        if ol.cdims is not None:
            cur = (cur[0] // b,) + tuple(ol.cdims[1:])
            true_cur = ol.cdims

    levels: List[Level] = []
    grid_sh = _grid_sharding(mesh)
    n_levels = len(oh.levels)
    for i, ol in enumerate(oh.levels):
        if i >= n_levels:
            break
        pdims = level_dims[i]
        csr = CSR.from_scipy(ol.A)
        st = Stencil.from_csr(csr, _true_dims(oh, i, dims), dtype=dtype,
                              max_points=512)
        assert st is not None, f"level {i} operator is not stencil-structured"
        # pad axis 0 of every weight plane; identity diag on pad planes
        W = np.asarray(jnp.zeros(0)) if False else np.asarray(st.weights)
        Wp = np.stack([_pad_axis0(W[d], pdims[0]) for d in range(W.shape[0])])
        zero_off = tuple(0 for _ in pdims)
        if zero_off in st.offsets:
            Wp[st.offsets.index(zero_off), st.dims[0]:] = 1.0
        weights = jax.device_put(
            jnp.asarray(Wp, dtype=dtype),
            jax.sharding.NamedSharding(mesh, P(None, ROW_AXIS)),
        )
        A_dev = ShardedStencil(weights, st.offsets, pdims, mesh)

        d_inv_nd = _pad_axis0(
            np.asarray(ol.d_inv).reshape(st.dims), pdims[0], fill=1.0
        )
        d_inv = jax.device_put(jnp.asarray(d_inv_nd, dtype=dtype), grid_sh)
        lam = jnp.asarray(ol.lam_max, dtype=dtype)
        P_dev = R_dev = None
        if ol.P is not None and i + 1 < len(oh.levels):
            pcdims = level_dims[i + 1]
            scale_nd = _pad_axis0(
                np.asarray(ol.agg_scale).reshape(ol.cdims), pcdims[0], fill=0.0
            )
            scale = jax.device_put(jnp.asarray(scale_nd, dtype=dtype), grid_sh)
            coef = jnp.asarray(config.sa_omega / max(ol.lam_max, 1e-30), dtype)
            P_dev = SBlockProlongator(A_dev, d_inv, scale, coef, pdims,
                                      pcdims, b, mesh)
            R_dev = SBlockRestrictor(A_dev, d_inv, scale, coef, pdims,
                                     pcdims, b, mesh)
        levels.append(Level(A=A_dev, P=P_dev, R=R_dev, d_inv=d_inv,
                            lam_max=lam,
                            true_n=int(np.prod(_true_dims(oh, i, dims)))))

    # replicated dense coarse factor over the padded coarse grid
    cdims_pad = level_dims[-1]
    n_pad = int(np.prod(cdims_pad))
    coarse_true = oh.levels[-1].A.toarray()
    tdims = _true_dims(oh, len(oh.levels) - 1, dims)
    dense = np.eye(n_pad)
    # embed the true coarse operator at the padded index positions
    tidx = _embed_indices(tdims, cdims_pad)
    dense[np.ix_(tidx, tidx)] = coarse_true
    from parallel_amg_tpu.amg.hierarchy import coarse_inverse_np

    coarse_inv = jax.device_put(
        jnp.asarray(coarse_inverse_np(dense), jnp.float32),
        replicated_sharding(mesh))
    from parallel_amg_tpu.parallel.pstencil import apply_halo_mode

    return Hierarchy(apply_halo_mode(levels, config.halo_mode),
                     coarse_inv, config)


def _true_dims(oh, i, dims0):
    """True (unpadded) grid dims of level i."""
    cur = tuple(dims0)
    for j, ol in enumerate(oh.levels):
        if j == i:
            return cur
        cur = tuple(ol.cdims) if ol.cdims is not None else cur
    return cur


def _embed_indices(true_dims, padded_dims):
    """Flat padded-grid indices of the true-grid points (lexicographic)."""
    coords = np.stack(
        np.unravel_index(np.arange(int(np.prod(true_dims))), true_dims), 1
    )
    return np.ravel_multi_index(tuple(coords.T), padded_dims)


def distribute_grid(v, true_dims, hierarchy: Hierarchy, mesh,
                    dtype=jnp.float32):
    """Host (n,) vector → padded, sharded N-D grid for the solve path."""
    pdims = hierarchy.levels[0].A.dims
    g = np.zeros(pdims, dtype=np.float64)
    g[tuple(slice(0, d) for d in true_dims)] = np.asarray(v).reshape(true_dims)
    return jax.device_put(jnp.asarray(g, dtype=dtype), _grid_sharding(mesh))


def collect_grid(x, true_dims) -> np.ndarray:
    """Sharded padded grid → host (n,) vector (strips padding)."""
    g = np.asarray(x)
    return g[tuple(slice(0, d) for d in true_dims)].reshape(-1)
