"""Sharded stencil operators — the distributed structured fast path.

Domain decomposition along grid axis 0 over the 1D "rows" mesh: each shard
owns a contiguous slab of m0 grid planes.  SpMV needs only the h boundary
planes of each neighbor (h = max |offset₀| — the ghost/halo surface,
SURVEY.md §2.5 "halo exchange"), exchanged with two ``lax.ppermute`` shifts
inside the shard_map kernel; the interior stencil compute is local pad +
N-D dynamic slices, identical to ops/stencil.py.

Transfers stay *entirely local*: the grid is padded so every shard owns a
whole number of aggregation blocks, making block-repeat upsampling and
sum-pool downsampling shard-local (no communication in P/R at all — the
reference stack's ghost exchange for transfer operators disappears by
layout choice).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from parallel_amg_tpu.parallel.mesh import ROW_AXIS, row_sharding


def _halo_planes(xl, h):
    """Fetch the h top planes of the left neighbor and the h bottom planes
    of the right neighbor along axis 0 (zero planes at the domain boundary).

    xl: (m0, *rest) local slab inside shard_map.  Returns a pair of
    (h, *rest) arrays (left_halo, right_halo).
    """
    S = jax.lax.axis_size(ROW_AXIS)
    idx = jax.lax.axis_index(ROW_AXIS)
    if S == 1:
        zeros = jnp.zeros((h,) + xl.shape[1:], xl.dtype)
        return zeros, zeros
    # my top h planes -> right neighbor's left halo
    left_halo = jax.lax.ppermute(
        xl[-h:], ROW_AXIS, [(i, i + 1) for i in range(S - 1)]
    )
    left_halo = jnp.where(idx == 0, 0.0, left_halo)
    # my bottom h planes -> left neighbor's right halo
    right_halo = jax.lax.ppermute(
        xl[:h], ROW_AXIS, [(i + 1, i) for i in range(S - 1)]
    )
    right_halo = jnp.where(idx == S - 1, 0.0, right_halo)
    return left_halo, right_halo


def _halo_exchange(xl, h):
    """(m0+2h, *rest) slab with neighbor halos concatenated on axis 0."""
    left_halo, right_halo = _halo_planes(xl, h)
    return jnp.concatenate([left_halo, xl, right_halo], axis=0)


def apply_halo_mode(levels, mode: str):
    """Re-tag every ShardedStencil level operator with ``mode``.

    This is how ``AMGConfig.halo_mode`` reaches the solve path: the
    distributed setup drivers call it on the finished level list, so a
    config-requested ``pallas_async`` actually changes the SpMV engine
    (async_halo_matvec falls back to the XLA path per level when the slab
    is too small to overlap — see phalo_async.py).
    """
    if mode == "xla":
        return levels
    from parallel_amg_tpu.amg.hierarchy import Level

    out = []
    for l in levels:
        A = (l.A.with_halo_mode(mode) if isinstance(l.A, ShardedStencil)
             else l.A)
        out.append(Level(A, l.P, l.R, l.d_inv, l.lam_max, true_n=l.true_n))
    return out


@jax.tree_util.register_pytree_node_class
class ShardedStencil:
    """Stencil operator on a grid sharded along axis 0.

    weights: (D, d0p, *rest) with d0p = S·m0 (padded), sharded on axis 1.
    Padding planes carry an identity diagonal so smoothers stay inert there.
    """

    def __init__(self, weights, offsets, dims, mesh, halo_mode="xla"):
        self.weights = weights
        self.offsets = tuple(tuple(int(c) for c in o) for o in offsets)
        self.dims = tuple(int(d) for d in dims)  # padded global dims
        self.mesh = mesh
        # "xla" = ppermute + scheduler-permitted overlap (default);
        # "pallas_async" = guaranteed-overlap Pallas remote-DMA kernel
        # (parallel/phalo_async.py).
        self.halo_mode = halo_mode

    def tree_flatten(self):
        return (self.weights,), (self.offsets, self.dims, self.mesh,
                                 self.halo_mode)

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, dims, mesh, halo_mode = aux
        return cls(children[0], offsets, dims, mesh, halo_mode)

    def with_halo_mode(self, mode: str) -> "ShardedStencil":
        return ShardedStencil(self.weights, self.offsets, self.dims,
                              self.mesh, mode)

    # -- properties -------------------------------------------------------
    @property
    def n(self) -> int:
        return int(np.prod(self.dims))

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def n_rows(self) -> int:
        return self.n

    @property
    def nnz(self):
        return jnp.sum(self.weights != 0)

    @property
    def halo(self) -> int:
        return max(max(abs(o[0]) for o in self.offsets), 0)

    # -- construction -----------------------------------------------------
    @classmethod
    def from_stencil(cls, st, mesh, dtype=None):
        """Shard a host-built Stencil: pad axis 0 to S·m0 (identity planes),
        shard the weight planes."""
        S = mesh.devices.size
        d0 = st.dims[0]
        m0 = -(-d0 // S)
        d0p = S * m0
        W = np.asarray(st.weights)
        pad = [(0, 0), (0, d0p - d0)] + [(0, 0)] * (len(st.dims) - 1)
        Wp = np.pad(W, pad)
        zero_off = tuple(0 for _ in st.dims)
        if zero_off in st.offsets:
            d_idx = st.offsets.index(zero_off)
            Wp[d_idx, d0:] = 1.0  # identity diagonal on padding planes
        dims = (d0p,) + st.dims[1:]
        sharding = jax.sharding.NamedSharding(mesh, P(None, ROW_AXIS))
        weights = jax.device_put(
            jnp.asarray(Wp, dtype=dtype or st.weights.dtype), sharding
        )
        return cls(weights, st.offsets, dims, mesh)

    # -- distributed matvec ------------------------------------------------
    def matvec(self, x):
        """y = A @ x for a globally-sharded N-D grid x (axis 0 on 'rows').

        Comm/compute overlap (SURVEY.md §2.5, BASELINE.json:5 "halo exchange
        overlapped with on-diagonal compute"): the interior contribution is
        computed from the local slab alone (zero halo), and only O(h·surface)
        boundary-row corrections depend on the ``ppermute`` results — so
        XLA's latency-hiding scheduler is free to run the halo exchange
        concurrently with the bulk SpMV, instead of serializing exchange →
        compute as a concatenated-halo formulation would.

        With ``halo_mode="pallas_async"`` the overlap is *enforced* instead
        of permitted: the Pallas remote-DMA kernel in phalo_async.py.
        """
        if self.halo_mode == "pallas_async":
            from parallel_amg_tpu.parallel.phalo_async import async_halo_matvec
            return async_halo_matvec(self, x)
        h = self.halo
        offsets = self.offsets
        dims = self.dims
        nd = len(dims)

        def kernel(W, xl):
            m0 = xl.shape[0]
            if h:
                left_halo, right_halo = _halo_planes(xl, h)  # comm starts
            # zero-pad every axis (incl. axis 0: interior-only contribution)
            pads = [(h, h)] + [
                (max(0, -min(o[i] for o in offsets)),
                 max(0, max(o[i] for o in offsets)))
                for i in range(1, nd)
            ]
            xp = jnp.pad(xl, pads)
            y = jnp.zeros_like(xl)
            local = xl.shape
            rest = tuple(local[1:])
            for d, off in enumerate(offsets):
                start = (h + off[0],) + tuple(
                    pads[i][0] + off[i] for i in range(1, nd)
                )
                y = y + W[d] * jax.lax.dynamic_slice(xp, start, local)
            if not h:
                return y
            # boundary corrections — the only consumers of the halo planes
            lp = jnp.pad(left_halo, [(0, 0)] + pads[1:])
            rp = jnp.pad(right_halo, [(0, 0)] + pads[1:])
            for d, off in enumerate(offsets):
                o0 = off[0]
                if o0 == 0:
                    continue
                sub = tuple(
                    slice(pads[i][0] + off[i],
                          pads[i][0] + off[i] + rest[i - 1])
                    for i in range(1, nd)
                )
                if o0 < 0:
                    # rows i < -o0 read left-halo plane h + o0 + i
                    L = -o0
                    src = lp[(slice(h + o0, h),) + sub]
                    y = y.at[:L].add(W[d][:L] * src)
                else:
                    # rows i >= m0 - o0 read right-halo plane i + o0 - m0
                    src = rp[(slice(0, o0),) + sub]
                    y = y.at[m0 - o0:].add(W[d][m0 - o0:] * src)
            return y

        return jax.shard_map(
            kernel,
            mesh=self.mesh,
            in_specs=(P(None, ROW_AXIS), P(ROW_AXIS)),
            out_specs=P(ROW_AXIS),
        )(self.weights, x)

    def diagonal(self):
        zero = tuple(0 for _ in self.dims)
        if zero in self.offsets:
            return self.weights[self.offsets.index(zero)]
        return jnp.zeros(self.dims, self.weights.dtype)

    def __matmul__(self, x):
        return self.matvec(x)
